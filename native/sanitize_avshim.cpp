// ASan/UBSan harness for the libavcodec shim — the piece where a real heap
// bug lived (sws SIMD overwrote an unpadded output buffer). Exercises the
// H.265 encode/decode pair, the container recorder with an audio track, and
// the media demux path over a file the harness itself produces.
//
// Build: g++ -O1 -g -fsanitize=address,undefined -o sanitize_avshim \
//          sanitize_avshim.cpp -lavcodec -lavformat -lavutil -lswscale

#include "avshim.cpp"

#include <cstdio>
#include <cstdlib>
#include <cstring>

static uint8_t r255(uint32_t& s) {
  s = s * 1664525u + 1013904223u;
  return (uint8_t)(s >> 24);
}

int main() {
  uint32_t seed = 7;
  const int W = 66, H = 50;  // deliberately not multiples of 16

  // --- encoder -> decoder roundtrip --------------------------------------
  void* enc = ac_h265_enc_open(W, H, 30, 30, 5);
  void* dec = ac_h265_dec_open(W, H);
  if (!enc || !dec) {
    fprintf(stderr, "no HEVC codec available\n");
    return 77;  // skip marker
  }
  uint8_t* rgb = (uint8_t*)malloc((size_t)W * H * 3);
  uint8_t* out = (uint8_t*)malloc(1 << 20);
  uint8_t* frames_out = (uint8_t*)malloc((size_t)W * H * 3 * 8);
  long decoded = 0;
  for (int i = 0; i < 12; ++i) {
    for (size_t j = 0; j < (size_t)W * H * 3; ++j) rgb[j] = r255(seed);
    long n = ac_h265_enc_frame(enc, rgb, out, 1 << 20);
    if (n < 0) return 1;
    long at = 0;
    while (at + 4 <= n) {
      uint32_t plen;
      memcpy(&plen, out + at, 4);
      long fr = ac_h265_dec_packet(dec, out + at + 4, plen, frames_out,
                                   (long)W * H * 3 * 8);
      if (fr < 0) return 1;
      decoded += fr;
      at += 4 + plen;
    }
  }
  ac_h265_enc_close(enc);
  ac_h265_dec_close(dec);
  if (decoded < 8) {
    fprintf(stderr, "too few frames decoded (%ld)\n", decoded);
    return 1;
  }

  // --- encoder overflow/drain protocol ------------------------------------
  // A too-small caller buffer must return -(written+2) with the packet kept
  // pending (never dropped), and ac_h265_enc_drain must recover the stream
  // byte-for-byte: the drained records must decode like the normal path.
  enc = ac_h265_enc_open(W, H, 30, 30, 5);
  dec = ac_h265_dec_open(W, H);
  if (!enc || !dec) return 1;
  {
    long redecoded = 0;
    uint8_t tiny[48];
    for (int i = 0; i < 12; ++i) {
      for (size_t j = 0; j < (size_t)W * H * 3; ++j) rgb[j] = r255(seed);
      long n = ac_h265_enc_frame(enc, rgb, tiny, (long)sizeof(tiny));
      if (n == -1) return 1;
      long total = n >= 0 ? n : -n - 2;
      memcpy(out, tiny, total);
      while (n < -1) {  // pending packet inside the shim: drain into the tail
        n = ac_h265_enc_drain(enc, out + total, (1 << 20) - total);
        if (n == -1) return 1;
        total += n >= 0 ? n : -n - 2;
      }
      long at = 0;
      while (at + 4 <= total) {
        uint32_t plen;
        memcpy(&plen, out + at, 4);
        long fr = ac_h265_dec_packet(dec, out + at + 4, plen, frames_out,
                                     (long)W * H * 3 * 8);
        if (fr < 0) return 1;
        redecoded += fr;
        at += 4 + plen;
      }
      if (at != total) {
        fprintf(stderr, "drained records misframed (%ld != %ld)\n", at, total);
        return 1;
      }
    }
    if (redecoded < 8) {
      fprintf(stderr, "overflow path decoded too few frames (%ld)\n", redecoded);
      return 1;
    }
  }
  ac_h265_enc_close(enc);
  ac_h265_dec_close(dec);

  // --- recorder with audio -> media demux back ---------------------------
  const char* path = "/tmp/sanitize_avshim.mp4";
  void* rec = ac_rec_open(path, W, H, 30, 30, 48000);
  if (!rec) return 1;
  float audio[1600];
  for (int i = 0; i < 10; ++i) {
    for (size_t j = 0; j < (size_t)W * H * 3; ++j) rgb[j] = r255(seed);
    if (ac_rec_frame(rec, rgb) != 0) return 1;
    for (int k = 0; k < 1600; ++k) audio[k] = (float)(r255(seed) - 128) / 512.0f;
    if (ac_rec_audio(rec, audio, 1600) != 0) return 1;
  }
  if (ac_rec_close(rec) != 0) return 1;

  void* media = ac_media_open(path);
  if (!media) return 1;
  if (ac_media_width(media) != W || ac_media_height(media) != H) return 1;
  long n = 0;
  while (ac_media_read_frame(media, rgb) == 1) n++;
  if (ac_media_rewind(media) == 0) {
    // a couple more after rewind
    for (int i = 0; i < 2 && ac_media_read_frame(media, rgb) == 1; ++i) n++;
  }
  ac_media_close(media);
  remove(path);
  if (n < 10) {
    fprintf(stderr, "media demux read %ld frames\n", n);
    return 1;
  }

  free(rgb);
  free(out);
  free(frames_out);
  puts("sanitize avshim OK");
  return 0;
}
