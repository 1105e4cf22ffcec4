// Sanitizer harness: exercises the native pieces under ASan/UBSan — the
// counterpart of the reference's sanitizer CI builds (tests/CMakeLists.txt
// sanitizer configs). Compiled with -fsanitize=address,undefined and run by
// tests/test_runtime_native.py; any overflow/UAF/UB aborts the run.
//
// Build: g++ -O1 -g -fsanitize=address,undefined -o sanitize_harness \
//          sanitize_harness.cpp emitter.o? — simplest: #include the sources.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

// Pull the implementation translation units in directly so the harness is a
// single self-contained sanitizer binary (no .so preload games with ASan).
#include "emitter.cpp"
#include "argon2.cpp"
#include "ringbuffer.cpp"
#include "runtime.cpp"
#include "sodium.cpp"

static uint8_t r255(uint32_t& s) {
  s = s * 1664525u + 1013904223u;
  return (uint8_t)(s >> 24);
}

int main() {
  uint32_t seed = 42;

  // --- emitter: every mode over random records, several shapes ----------
  for (int trial = 0; trial < 8; ++trial) {
    int B = 2, H = 5 + (trial % 3) * 20, W = 7 + (trial % 5) * 39;
    int pad_w = trial % 3, pad_h = trial % 2;
    size_t cells = (size_t)B * H * W;
    uint8_t* rgb = (uint8_t*)malloc(cells * 3);
    uint8_t* luma = (uint8_t*)malloc(cells);
    uint8_t* keys = (uint8_t*)malloc(cells);
    uint8_t* flag = (uint8_t*)malloc(cells);
    for (size_t i = 0; i < cells * 3; ++i) rgb[i] = r255(seed);
    for (size_t i = 0; i < cells; ++i) {
      luma[i] = r255(seed);
      keys[i] = r255(seed) & 63;
      flag[i] = r255(seed) & 1;
    }
    uint8_t glyphs64[64 * 5], glyphs256[256 * 5], ramp[64];
    for (int i = 0; i < 64; ++i) {
      glyphs64[i * 5] = 1;
      glyphs64[i * 5 + 1] = (uint8_t)(' ' + (i % 90));
      ramp[i] = (uint8_t)(i & 63);
    }
    for (int i = 0; i < 256; ++i) {
      glyphs256[i * 5] = 1;
      glyphs256[i * 5 + 1] = (uint8_t)(' ' + (i % 90));
    }
    // EXACT per-mode strides (render/emitter.py::_worst_case_stride): each
    // run's output buffer is malloc'd to the Python formula, so ASan
    // validates the slack math the production wrapper relies on
    auto stride_for = [&](int per_cell) {
      return (int64_t)H * W * per_cell + (int64_t)H * (8 + pad_w) + pad_h + 8;
    };
    int64_t lens[8];
    auto run_mode = [&](int per_cell, auto&& fn) {
      int64_t stride = stride_for(per_cell);
      uint8_t* out = (uint8_t*)malloc((size_t)B * stride);
      fn(out, stride);
      for (int b = 0; b < B; ++b)
        if (lens[b] > stride) {
          fprintf(stderr, "emitted length exceeds stride\n");
          exit(1);
        }
      free(out);
    };
    run_mode(4, [&](uint8_t* o, int64_t st) {
      ac_emit_mono(keys, B, H, W, glyphs64, pad_w, pad_h, o, st, lens, 2);
    });
    run_mode(23, [&](uint8_t* o, int64_t st) {
      ac_emit_truecolor_fg(rgb, luma, B, H, W, glyphs256, pad_w, pad_h, o, st,
                           lens, 2);
    });
    run_mode(15, [&](uint8_t* o, int64_t st) {
      ac_emit_indexed(luma, luma, B, H, W, 0, glyphs256, pad_w, pad_h, o, st,
                      lens, 1);
    });
    run_mode(10, [&](uint8_t* o, int64_t st) {
      ac_emit_indexed(keys, keys, B, H, W, 1, glyphs256, pad_w, pad_h, o, st,
                      lens, 1);
    });
    run_mode(10, [&](uint8_t* o, int64_t st) {
      ac_emit_16_dithered(rgb, luma, B, H, W, 0, ramp, glyphs256, pad_w, pad_h,
                          o, st, lens, 1);
    });
    run_mode(16, [&](uint8_t* o, int64_t st) {
      ac_emit_16_dithered(rgb, luma, B, H, W, 1, ramp, glyphs256, pad_w, pad_h,
                          o, st, lens, 1);
    });
    int R = H;  // treat as half-block rows
    run_mode(41, [&](uint8_t* o, int64_t st) {
      ac_emit_halfblock_truecolor(rgb, rgb, B, R, W, pad_w, pad_h, o, st,
                                  lens, 2);
    });
    run_mode(25, [&](uint8_t* o, int64_t st) {
      ac_emit_halfblock_indexed(luma, keys, flag, B, R, W, 0, pad_w, pad_h, o,
                                st, lens, 1);
    });
    run_mode(15, [&](uint8_t* o, int64_t st) {
      ac_emit_halfblock_indexed(luma, keys, flag, B, R, W, 1, pad_w, pad_h, o,
                                st, lens, 1);
    });
    run_mode(7, [&](uint8_t* o, int64_t st) {
      ac_emit_halfblock_mono(rgb, rgb, B, R, W, pad_w, pad_h, o, st, lens, 1);
    });
    free(rgb);
    free(luma);
    free(keys);
    free(flag);
  }

  // --- argon2id + blake2b ------------------------------------------------
  uint8_t tag[64];
  ac_blake2b(tag, 64, (const uint8_t*)"abc", 3);
  int rc = ac_argon2id((const uint8_t*)"pw", 2, (const uint8_t*)"0123456789abcdef",
                       16, 2, 64, 2, nullptr, 0, nullptr, 0, tag, 32);
  if (rc != 0) {
    fprintf(stderr, "argon2 failed\n");
    return 1;
  }

  // --- secretbox roundtrip across sizes ----------------------------------
  uint8_t key[32], nonce[24];
  for (int i = 0; i < 32; ++i) key[i] = r255(seed);
  for (int i = 0; i < 24; ++i) nonce[i] = r255(seed);
  for (int n : {0, 1, 31, 32, 33, 63, 64, 65, 1000}) {
    uint8_t* msg = (uint8_t*)malloc(n ? n : 1);
    for (int i = 0; i < n; ++i) msg[i] = r255(seed);
    uint8_t* boxed = (uint8_t*)malloc(16 + n);
    ac_secretbox_easy(boxed, msg, n, nonce, key);
    uint8_t* open_buf = (uint8_t*)malloc(n ? n : 1);
    if (ac_secretbox_open_easy(open_buf, boxed, 16 + n, nonce, key) != 0 ||
        (n && memcmp(open_buf, msg, n) != 0)) {
      fprintf(stderr, "secretbox roundtrip failed at n=%d\n", n);
      return 1;
    }
    free(msg);
    free(boxed);
    free(open_buf);
  }

  // --- crc + ring buffer ---------------------------------------------------
  uint8_t data[257];
  for (int i = 0; i < 257; ++i) data[i] = r255(seed);
  (void)ac_crc32c((const char*)data, 257);  // NOLINT

  puts("sanitize harness OK");
  return 0;
}
