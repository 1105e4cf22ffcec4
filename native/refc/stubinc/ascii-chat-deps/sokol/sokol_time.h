/* compile stub with faithful semantics: monotonic ns ticks */
#ifndef STUB_SOKOL_TIME_H
#define STUB_SOKOL_TIME_H
#include <stdint.h>
#include <time.h>
#if defined(__cplusplus)
extern "C" {
#endif
static inline void stm_setup(void) {}
static inline uint64_t stm_now(void) {
  struct timespec ts; clock_gettime(CLOCK_MONOTONIC, &ts);
  return (uint64_t)ts.tv_sec * 1000000000ull + (uint64_t)ts.tv_nsec;
}
static inline uint64_t stm_diff(uint64_t a, uint64_t b) { return a > b ? a - b : 0; }
static inline uint64_t stm_since(uint64_t t) { return stm_diff(stm_now(), t); }
static inline uint64_t stm_laptime(uint64_t *t) { uint64_t n = stm_now(), d = *t ? stm_diff(n, *t) : 0; *t = n; return d; }
static inline double stm_sec(uint64_t t) { return (double)t / 1e9; }
static inline double stm_ms(uint64_t t) { return (double)t / 1e6; }
static inline double stm_us(uint64_t t) { return (double)t / 1e3; }
static inline double stm_ns(uint64_t t) { return (double)t; }
#if defined(__cplusplus)
}
#endif
#endif
