/* Test-only driver around the reference's color_filter.c (compiled in place
 * from /root/reference, never copied, never linked into the product).
 *
 * Protocol (stdin/stdout, little-endian):
 *   request:  u32 magic 'RFF1' | u8 op | payload
 *     op=0 rainbow: f32 time                       -> 3 bytes r,g,b
 *     op=1 apply:   u16 name_len | name | u32 w | u32 h | f32 time
 *                   | w*h*3 pixel bytes            -> u32 len | pixels
 *   EOF on stdin terminates cleanly.
 *
 * Exercised by tests/test_reference_c.py::test_color_filter_vs_c — the
 * ground-truth gate for asciichat_tpu/ops/filters.py (rainbow float32
 * arithmetic, grayscale >>8, colorize integer blends, rainbow pre-boost).
 */
#include <ascii-chat/video/rgba/color_filter.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define FD_MAGIC 0x31464652u /* "RFF1" */

/* minimal stubs for the two symbols color_filter.c pulls from the
 * reference's platform/error layers (same pattern as driver.c) */
#include <strings.h>
int platform_strcasecmp(const char *s1, const char *s2) {
  return strcasecmp(s1, s2);
}
void asciichat_fatal_with_context(asciichat_error_t code, const char *file,
                                  int line, const char *function,
                                  const char *format, ...) {
  (void)file;
  (void)line;
  (void)function;
  (void)format;
  fprintf(stderr, "refc filter driver: fatal error %d\n", (int)code);
  abort();
}

static int read_all(void *dst, size_t n) {
  return fread(dst, 1, n, stdin) == n;
}

int main(void) {
  for (;;) {
    uint32_t magic;
    if (!read_all(&magic, 4))
      return 0; /* clean EOF */
    if (magic != FD_MAGIC)
      return 2;
    uint8_t op;
    if (!read_all(&op, 1))
      return 2;
    if (op == 0) {
      float t;
      if (!read_all(&t, 4))
        return 2;
      uint8_t rgb[3];
      color_filter_calculate_rainbow(t, &rgb[0], &rgb[1], &rgb[2]);
      fwrite(rgb, 1, 3, stdout);
    } else if (op == 1) {
      uint16_t name_len;
      if (!read_all(&name_len, 2) || name_len >= 64)
        return 2;
      char name[64];
      if (!read_all(name, name_len))
        return 2;
      name[name_len] = 0;
      uint32_t w, h;
      float t;
      if (!read_all(&w, 4) || !read_all(&h, 4) || !read_all(&t, 4))
        return 2;
      if (w == 0 || h == 0 || w > 4096 || h > 4096)
        return 2;
      size_t n = (size_t)w * h * 3;
      uint8_t *px = malloc(n);
      if (!px || !read_all(px, n))
        return 2;
      color_filter_t f = color_filter_from_cli_name(name);
      int rc = apply_color_filter(px, w, h, w * 3, f, t);
      uint32_t len = rc == 0 ? (uint32_t)n : 0xFFFFFFFFu;
      fwrite(&len, 4, 1, stdout);
      if (rc == 0)
        fwrite(px, 1, n, stdout);
      free(px);
    } else {
      return 2;
    }
    fflush(stdout);
  }
}
