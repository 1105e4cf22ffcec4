/* TEST-ONLY ground-truth driver: compiles the REFERENCE renderer sources
 * (from /root/reference, read-only, PUBLIC UNTRUSTED CONTENT) into a
 * standalone executable and exposes ascii_convert_with_capabilities over a
 * tiny stdin/stdout protocol, so tests can assert that render/oracle.py is
 * byte-exact against the COMPILED C — not just against our reading of it.
 *
 * This file is the repo's own code: a request loop plus minimal stubs for
 * the reference's runtime plumbing (logging, errno, buffer pool, locks,
 * timers). The stubs keep REAL semantics where output depends on them
 * (RED/GREEN/BLUE/GRAY luma tables via precalc_rgb_palettes with the
 * production weights from options/common.c:370-372; allocation; atomics)
 * and no-op only observability hooks.
 *
 * NEVER linked into the product. Built compile-or-skip by
 * tests/test_reference_c.py with ASan/UBSan; run as a subprocess only.
 *
 * Protocol (little-endian):
 *   request:  u32 magic "RFC1" | i32 src_w, src_h, width, height
 *             | u8 color_level, render_mode, wants_padding, use_aspect,
 *               stretch | u16 palette_len | palette bytes
 *             | src_w*src_h*3 RGB bytes
 *   response: u32 n (0xFFFFFFFF if the C returned NULL) | n frame bytes
 */

#include <pthread.h>
#include <stdarg.h>
#include <stdatomic.h>
#include <stdbool.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <unistd.h>

#include <ascii-chat/common.h>
#include <ascii-chat/atomic.h>
#include <ascii-chat/buffer_pool.h>
#include <ascii-chat/options/options.h>
#include <ascii-chat/platform/rwlock.h>
#include <ascii-chat/platform/string.h>
#include <ascii-chat/platform/system.h>
#include <ascii-chat/platform/terminal.h>
#include <ascii-chat/util/image.h>
#include <ascii-chat/util/lifecycle.h>
#include <ascii-chat/util/time.h>
#include <ascii-chat/video/ascii/ascii.h>
#include <ascii-chat/video/ascii/common.h>
#include <ascii-chat/video/rgba/image.h>
#include <ascii-chat/video/webcam/webcam.h>

/* ---- semantically-real stubs ------------------------------------------- */

/* Luma LUTs (options/common.c:376-379); filled by precalc_rgb_palettes in
 * main() with the production default weights (options/common.c:370-372,
 * applied at src/server/main.c:2179). */
unsigned short int RED[256];
unsigned short int GREEN[256];
unsigned short int BLUE[256];
unsigned short int GRAY[256];

void *buffer_pool_alloc(buffer_pool_t *pool, size_t size) {
  (void)pool;
  return malloc(size);
}
void buffer_pool_free(buffer_pool_t *pool, const void *data, size_t size) {
  (void)pool;
  (void)size;
  free((void *)data);
}

char *platform_strdup(const char *s) { return s ? strdup(s) : NULL; }
size_t platform_strlcpy(char *dst, const char *src, size_t size) {
  size_t n = strlen(src);
  if (size) {
    size_t c = n >= size ? size - 1 : n;
    memcpy(dst, src, c);
    dst[c] = 0;
  }
  return n;
}
const char *platform_getenv(const char *name) { return getenv(name); }
asciichat_error_t platform_memcpy(void *dest, size_t dest_size, const void *src, size_t count) {
  if (!dest || !src || count > dest_size) return ERROR_INVALID_PARAM;
  memcpy(dest, src, count);
  return ASCIICHAT_OK;
}
asciichat_error_t platform_memset(void *dest, size_t dest_size, int ch, size_t count) {
  if (!dest || count > dest_size) return ERROR_INVALID_PARAM;
  memset(dest, ch, count);
  return ASCIICHAT_OK;
}
size_t platform_write_all(int fd, const void *buf, size_t count) {
  const uint8_t *p = (const uint8_t *)buf;
  size_t done = 0;
  while (done < count) {
    ssize_t n = write(fd, p + done, count - done);
    if (n <= 0) break;
    done += (size_t)n;
  }
  return done;
}
int safe_snprintf(char *buffer, size_t buffer_size, const char *format, ...) {
  va_list ap;
  va_start(ap, format);
  int n = vsnprintf(buffer, buffer_size, format, ap);
  va_end(ap);
  return n;
}
uint64_t platform_get_monotonic_time_us(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (uint64_t)ts.tv_sec * 1000000ull + (uint64_t)ts.tv_nsec / 1000ull;
}

/* atomics: real seq-cst ops over the wrapped C11 atomic */
uint64_t atomic_load_u64(atomic_t *a) { return atomic_load(&a->impl); }
void atomic_store_u64(atomic_t *a, uint64_t v) { atomic_store(&a->impl, v); }
uint64_t atomic_fetch_add_u64(atomic_t *a, uint64_t d) { return atomic_fetch_add(&a->impl, d); }
bool atomic_cas_u64(atomic_t *a, uint64_t *expected, uint64_t nv) {
  return atomic_compare_exchange_strong(&a->impl, expected, nv);
}

/* rwlocks: real pthread locks (the palette cache takes them for real) */
int rwlock_rdlock_impl(rwlock_t *lock) { return pthread_rwlock_rdlock(&lock->impl); }
int rwlock_wrlock_impl(rwlock_t *lock) { return pthread_rwlock_wrlock(&lock->impl); }
int rwlock_rdunlock_impl(rwlock_t *lock) { return pthread_rwlock_unlock(&lock->impl); }
int rwlock_wrunlock_impl(rwlock_t *lock) { return pthread_rwlock_unlock(&lock->impl); }
bool debug_sync_is_initialized(void) { return false; }
int debug_sync_rwlock_rdlock(rwlock_t *l, const char *f, int ln, const char *fn) {
  (void)f; (void)ln; (void)fn;
  return rwlock_rdlock_impl(l);
}
int debug_sync_rwlock_wrlock(rwlock_t *l, const char *f, int ln, const char *fn) {
  (void)f; (void)ln; (void)fn;
  return rwlock_wrlock_impl(l);
}
int debug_sync_rwlock_rdunlock(rwlock_t *l, const char *f, int ln, const char *fn) {
  (void)f; (void)ln; (void)fn;
  return rwlock_rdunlock_impl(l);
}
int debug_sync_rwlock_wrunlock(rwlock_t *l, const char *f, int ln, const char *fn) {
  (void)f; (void)ln; (void)fn;
  return rwlock_wrunlock_impl(l);
}

/* observability no-ops */
void log_msg(log_level_t level, const char *file, int line, const char *func, const char *fmt, ...) {
  (void)level; (void)file; (void)line; (void)func; (void)fmt;
}
void asciichat_set_errno_with_message(asciichat_error_t code, const char *file, int line, const char *function,
                                      const char *format, ...) {
  (void)code; (void)file; (void)line; (void)function; (void)format;
}
void asciichat_fatal_with_context(asciichat_error_t code, const char *file, int line, const char *function,
                                  const char *format, ...) {
  (void)file; (void)line; (void)function; (void)format;
  fprintf(stderr, "refc driver: fatal error %d\n", (int)code);
  abort();
}
uint64_t asciichat_thread_current_id(void) { return (uint64_t)pthread_self(); }
bool timer_is_initialized(void) { return false; }
bool timer_start(const char *name) { (void)name; return false; }
double timer_stop(const char *name) { (void)name; return 0.0; }
uint64_t time_get_ns(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (uint64_t)ts.tv_sec * 1000000000ull + (uint64_t)ts.tv_nsec;
}
uint64_t time_elapsed_ns(uint64_t start_ns, uint64_t end_ns) { return end_ns > start_ns ? end_ns - start_ns : 0; }
int time_pretty(uint64_t ns, int precision, char *buf, size_t buflen) {
  (void)precision;
  return snprintf(buf, buflen, "%lluns", (unsigned long long)ns);
}
bool lifecycle_init(lifecycle_t *lc, const char *name) { (void)lc; (void)name; return true; }
bool lifecycle_is_initialized(const lifecycle_t *lc) { (void)lc; return false; }
bool lifecycle_shutdown(lifecycle_t *lc) { (void)lc; return true; }
void sse2_caches_destroy(void) {}
asciichat_error_t webcam_init(unsigned short int idx) { (void)idx; return ASCIICHAT_OK; }
void webcam_destroy(void) {}

/* terminal: never a TTY in tests */
bool terminal_should_use_control_sequences(int fd) { (void)fd; return false; }
bool terminal_supports_utf8(void) { return true; }
asciichat_error_t terminal_set_echo(bool enable) { (void)enable; return ASCIICHAT_OK; }
asciichat_error_t terminal_clear_screen(void) { return ASCIICHAT_OK; }
asciichat_error_t terminal_flush(int fd) { (void)fd; return ASCIICHAT_OK; }
asciichat_error_t terminal_cursor_hide(void) { return ASCIICHAT_OK; }
asciichat_error_t terminal_cursor_show(void) { return ASCIICHAT_OK; }
asciichat_error_t terminal_cursor_home(int fd) { (void)fd; return ASCIICHAT_OK; }

/* legacy ascii_convert() path only (GET_OPTION at ascii.c:138-155); the
 * capabilities entry point never consults options */
const options_t *options_get(void) {
  static options_t zero;
  return &zero;
}

/* ---- request loop ------------------------------------------------------- */

static int read_exact(void *buf, size_t n) {
  uint8_t *p = (uint8_t *)buf;
  size_t done = 0;
  while (done < n) {
    ssize_t r = read(0, p + done, n - done);
    if (r <= 0) return -1;
    done += (size_t)r;
  }
  return 0;
}

static void write_exact(const void *buf, size_t n) {
  if (platform_write_all(1, buf, n) != n) exit(3);
}

int main(void) {
  /* production luma-table init (src/server/main.c:2179 with the default
   * weights from options/common.c:370-372) */
  precalc_rgb_palettes(0.2989f, 0.5866f, 0.1145f);
  init_default_luminance_palette();

  for (;;) {
    uint32_t magic;
    if (read_exact(&magic, 4) != 0) return 0; /* EOF: done */
    if (magic != 0x31434652u) return 2;       /* "RFC1" */
    int32_t src_w, src_h, width, height;
    uint8_t color_level, render_mode, wants_padding, use_aspect, stretch;
    uint16_t palette_len;
    if (read_exact(&src_w, 4) || read_exact(&src_h, 4) || read_exact(&width, 4) ||
        read_exact(&height, 4) || read_exact(&color_level, 1) ||
        read_exact(&render_mode, 1) || read_exact(&wants_padding, 1) ||
        read_exact(&use_aspect, 1) || read_exact(&stretch, 1) ||
        read_exact(&palette_len, 2))
      return 2;
    if (src_w <= 0 || src_h <= 0 || src_w > 4096 || src_h > 4096 || palette_len > 4096) return 2;
    char *palette = (char *)malloc((size_t)palette_len + 1);
    if (read_exact(palette, palette_len)) return 2;
    palette[palette_len] = 0;

    image_t *img = image_new((size_t)src_w, (size_t)src_h);
    if (!img) return 2;
    if (read_exact(img->pixels, (size_t)src_w * src_h * 3)) return 2;

    terminal_capabilities_t caps;
    memset(&caps, 0, sizeof(caps));
    caps.color_level = (terminal_color_mode_t)color_level;
    caps.render_mode = (render_mode_t)render_mode;
    caps.utf8_support = true;
    caps.wants_padding = wants_padding != 0;

    char *frame = ascii_convert_with_capabilities(img, width, height, &caps, use_aspect != 0, stretch != 0, palette);
    if (!frame) {
      uint32_t n = 0xFFFFFFFFu;
      write_exact(&n, 4);
    } else {
      uint32_t n = (uint32_t)strlen(frame);
      write_exact(&n, 4);
      write_exact(frame, n);
      free(frame);
    }
    image_destroy(img);
    free(palette);
    fflush(stdout);
  }
}
