/* Minimal utf8proc-compatible shim (TEST-ONLY, for compiling the reference
 * renderer sources against). Provides utf8proc_iterate (strict UTF-8 decode)
 * and utf8proc_charwidth (terminal display width). Width semantics follow
 * utf8proc/wcwidth for the character classes the renderer palettes can
 * contain: controls/combining -> 0, East-Asian wide + emoji -> 2, else 1
 * (box/block-drawing U+2580..U+259F are width 1, matching utf8proc). */
#ifndef STUB_UTF8PROC_H
#define STUB_UTF8PROC_H

#include <stddef.h>
#include <stdint.h>
#include <stdlib.h>
#include <sys/types.h>

typedef uint8_t utf8proc_uint8_t;
typedef int32_t utf8proc_int32_t;
typedef ssize_t utf8proc_ssize_t;

/* Decode one codepoint. strlen < 0 means NUL-terminated. Returns bytes
 * consumed, or -1 on invalid input (codepoint_ref set to -1), matching
 * utf8proc_iterate's contract (UTF8PROC_ERROR_INVALIDUTF8 == -3 upstream;
 * callers here only test for < 0). */
static inline utf8proc_ssize_t utf8proc_iterate(const utf8proc_uint8_t *str,
                                                utf8proc_ssize_t strlen_,
                                                utf8proc_int32_t *codepoint_ref) {
  *codepoint_ref = -1;
  if (strlen_ == 0) return 0;
  utf8proc_ssize_t avail = strlen_ < 0 ? 4 : strlen_;
  uint8_t c0 = str[0];
  if (c0 < 0x80) {
    *codepoint_ref = c0;
    return 1;
  }
  int need;
  int32_t cp;
  if ((c0 & 0xE0) == 0xC0) { need = 2; cp = c0 & 0x1F; }
  else if ((c0 & 0xF0) == 0xE0) { need = 3; cp = c0 & 0x0F; }
  else if ((c0 & 0xF8) == 0xF0) { need = 4; cp = c0 & 0x07; }
  else return -1;
  if (avail < need) return -1;
  for (int i = 1; i < need; ++i) {
    if ((str[i] & 0xC0) != 0x80) return -1;
    cp = (cp << 6) | (str[i] & 0x3F);
  }
  /* reject overlong encodings, surrogates, out-of-range */
  if ((need == 2 && cp < 0x80) || (need == 3 && cp < 0x800) ||
      (need == 4 && cp < 0x10000) || cp > 0x10FFFF ||
      (cp >= 0xD800 && cp <= 0xDFFF))
    return -1;
  *codepoint_ref = cp;
  return need;
}

static inline int utf8proc_charwidth(utf8proc_int32_t cp) {
  if (cp < 0) return 0;
  if (cp < 0x20 || (cp >= 0x7F && cp < 0xA0)) return 0; /* controls */
  /* zero-width: combining marks + joiners */
  if ((cp >= 0x0300 && cp <= 0x036F) || (cp >= 0x1AB0 && cp <= 0x1AFF) ||
      (cp >= 0x20D0 && cp <= 0x20FF) || (cp >= 0xFE00 && cp <= 0xFE0F) ||
      (cp >= 0xFE20 && cp <= 0xFE2F) || cp == 0x200B || cp == 0x200C ||
      cp == 0x200D || cp == 0xFEFF)
    return 0;
  /* East-Asian wide / fullwidth / emoji */
  if ((cp >= 0x1100 && cp <= 0x115F) || (cp >= 0x2E80 && cp <= 0xA4CF) ||
      (cp >= 0xAC00 && cp <= 0xD7A3) || (cp >= 0xF900 && cp <= 0xFAFF) ||
      (cp >= 0xFE30 && cp <= 0xFE4F) || (cp >= 0xFF00 && cp <= 0xFF60) ||
      (cp >= 0xFFE0 && cp <= 0xFFE6) || (cp >= 0x1F300 && cp <= 0x1FAFF) ||
      (cp >= 0x20000 && cp <= 0x3FFFD))
    return 2;
  return 1;
}

/* utf8proc_map + casefold options: referenced only by utf8_strcasestr
 * (never on the renderer paths under test). ASCII-only fold. */
typedef int utf8proc_option_t;
#define UTF8PROC_STABLE 0x2
#define UTF8PROC_COMPOSE 0x4
#define UTF8PROC_CASEFOLD 0x400

static inline utf8proc_ssize_t utf8proc_map(const utf8proc_uint8_t *str,
                                            utf8proc_ssize_t strlen_,
                                            utf8proc_uint8_t **dstptr,
                                            utf8proc_option_t options) {
  (void)options;
  size_t n = strlen_ < 0 ? __builtin_strlen((const char *)str) : (size_t)strlen_;
  utf8proc_uint8_t *out = (utf8proc_uint8_t *)malloc(n + 1);
  if (!out) return -1;
  for (size_t i = 0; i < n; ++i) {
    utf8proc_uint8_t c = str[i];
    out[i] = (c >= 'A' && c <= 'Z') ? (utf8proc_uint8_t)(c + 32) : c;
  }
  out[n] = 0;
  *dstptr = out;
  return (utf8proc_ssize_t)n;
}

#endif
