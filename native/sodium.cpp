// NaCl-compatible secretbox: XSalsa20 stream cipher + Poly1305 one-time MAC.
//
// Own implementation from the public specifications (Bernstein's Salsa20 spec
// and the NaCl secretbox construction; Poly1305 per RFC 8439 §2.5). Matches
// libsodium's crypto_secretbox_easy/open_easy wire format used by the
// reference (lib/crypto/crypto.c:500,557): out = MAC(16) || ciphertext, with
// the 24-byte nonce carried separately (prepended by the caller).
//
// secretbox(key k[32], nonce n[24], m):
//   subkey  = HSalsa20(k, n[0:16])
//   stream  = Salsa20(subkey, n[16:24])            (64-byte blocks)
//   rs      = stream[0:32]                          (Poly1305 r||s key)
//   c       = m XOR stream[32:]
//   tag     = Poly1305(rs, c)
//
// Build: g++ -O3 -shared -fPIC -o libsodium_ac.so sodium.cpp

#include <cstdint>
#include <cstring>

namespace {

inline uint32_t rotl32(uint32_t v, int n) { return (v << n) | (v >> (32 - n)); }
inline uint32_t load32(const uint8_t* p) {
  return (uint32_t)p[0] | (uint32_t)p[1] << 8 | (uint32_t)p[2] << 16 |
         (uint32_t)p[3] << 24;
}
inline void store32(uint8_t* p, uint32_t v) {
  p[0] = (uint8_t)v;
  p[1] = (uint8_t)(v >> 8);
  p[2] = (uint8_t)(v >> 16);
  p[3] = (uint8_t)(v >> 24);
}

const uint8_t SIGMA[16] = {'e', 'x', 'p', 'a', 'n', 'd', ' ', '3',
                           '2', '-', 'b', 'y', 't', 'e', ' ', 'k'};

void salsa20_rounds(uint32_t x[16]) {
  for (int i = 0; i < 20; i += 2) {
    // column round
    x[4] ^= rotl32(x[0] + x[12], 7);
    x[8] ^= rotl32(x[4] + x[0], 9);
    x[12] ^= rotl32(x[8] + x[4], 13);
    x[0] ^= rotl32(x[12] + x[8], 18);
    x[9] ^= rotl32(x[5] + x[1], 7);
    x[13] ^= rotl32(x[9] + x[5], 9);
    x[1] ^= rotl32(x[13] + x[9], 13);
    x[5] ^= rotl32(x[1] + x[13], 18);
    x[14] ^= rotl32(x[10] + x[6], 7);
    x[2] ^= rotl32(x[14] + x[10], 9);
    x[6] ^= rotl32(x[2] + x[14], 13);
    x[10] ^= rotl32(x[6] + x[2], 18);
    x[3] ^= rotl32(x[15] + x[11], 7);
    x[7] ^= rotl32(x[3] + x[15], 9);
    x[11] ^= rotl32(x[7] + x[3], 13);
    x[15] ^= rotl32(x[11] + x[7], 18);
    // row round
    x[1] ^= rotl32(x[0] + x[3], 7);
    x[2] ^= rotl32(x[1] + x[0], 9);
    x[3] ^= rotl32(x[2] + x[1], 13);
    x[0] ^= rotl32(x[3] + x[2], 18);
    x[6] ^= rotl32(x[5] + x[4], 7);
    x[7] ^= rotl32(x[6] + x[5], 9);
    x[4] ^= rotl32(x[7] + x[6], 13);
    x[5] ^= rotl32(x[4] + x[7], 18);
    x[11] ^= rotl32(x[10] + x[9], 7);
    x[8] ^= rotl32(x[11] + x[10], 9);
    x[9] ^= rotl32(x[8] + x[11], 13);
    x[10] ^= rotl32(x[9] + x[8], 18);
    x[12] ^= rotl32(x[15] + x[14], 7);
    x[13] ^= rotl32(x[12] + x[15], 9);
    x[14] ^= rotl32(x[13] + x[12], 13);
    x[15] ^= rotl32(x[14] + x[13], 18);
  }
}

// Salsa20 block function: 64-byte keystream block from key, 8B nonce, counter.
// memset through a volatile function pointer so the wipe of dead stack
// buffers survives -O3 dead-store elimination. Guarded: sanitize_harness.cpp
// includes this file and argon2.cpp into one translation unit. Defined
// ABOVE the cipher cores: they wipe their own locals (see below).
#ifndef AC_SECURE_MEMZERO_DEFINED
#define AC_SECURE_MEMZERO_DEFINED
void* (*const volatile memset_v)(void*, int, size_t) = memset;
inline void secure_memzero(void* p, size_t n) { memset_v(p, 0, n); }
#endif

void salsa20_block(uint8_t out[64], const uint8_t key[32], const uint8_t nonce[8],
                   uint64_t counter) {
  uint32_t in[16], x[16];
  in[0] = load32(SIGMA);
  in[1] = load32(key);
  in[2] = load32(key + 4);
  in[3] = load32(key + 8);
  in[4] = load32(key + 12);
  in[5] = load32(SIGMA + 4);
  in[6] = load32(nonce);
  in[7] = load32(nonce + 4);
  in[8] = (uint32_t)counter;
  in[9] = (uint32_t)(counter >> 32);
  in[10] = load32(SIGMA + 8);
  in[11] = load32(key + 16);
  in[12] = load32(key + 20);
  in[13] = load32(key + 24);
  in[14] = load32(key + 28);
  in[15] = load32(SIGMA + 12);
  memcpy(x, in, sizeof(x));
  salsa20_rounds(x);
  for (int i = 0; i < 16; ++i) store32(out + 4 * i, x[i] + in[i]);
  // the callers wipe THEIR key buffers (ac_secretbox_*:306-309), but this
  // frame held verbatim subkey words (in[1..4], in[11..14]) and the raw
  // keystream (x) — leaving them in dead stack memory defeats that wipe
  secure_memzero(in, sizeof(in));
  secure_memzero(x, sizeof(x));
}

// HSalsa20: 32-byte subkey from key + 16-byte nonce (no feedforward; outputs
// words 0,5,10,15,6,7,8,9).
void hsalsa20(uint8_t out[32], const uint8_t key[32], const uint8_t n[16]) {
  uint32_t x[16];
  x[0] = load32(SIGMA);
  x[1] = load32(key);
  x[2] = load32(key + 4);
  x[3] = load32(key + 8);
  x[4] = load32(key + 12);
  x[5] = load32(SIGMA + 4);
  x[6] = load32(n);
  x[7] = load32(n + 4);
  x[8] = load32(n + 8);
  x[9] = load32(n + 12);
  x[10] = load32(SIGMA + 8);
  x[11] = load32(key + 16);
  x[12] = load32(key + 20);
  x[13] = load32(key + 24);
  x[14] = load32(key + 28);
  x[15] = load32(SIGMA + 12);
  salsa20_rounds(x);
  store32(out, x[0]);
  store32(out + 4, x[5]);
  store32(out + 8, x[10]);
  store32(out + 12, x[15]);
  store32(out + 16, x[6]);
  store32(out + 20, x[7]);
  store32(out + 24, x[8]);
  store32(out + 28, x[9]);
  secure_memzero(x, sizeof(x));  // held the outer key words verbatim
}

// Salsa20 keystream XOR under an already-derived subkey, starting at block
// `block0`. Taking the subkey (instead of re-running HSalsa20 on the outer
// key) halves the per-packet key-setup cost: the secretbox entry points
// already derived it for the Poly1305 key block.
void salsa20_xor(uint8_t* out, const uint8_t* in, size_t len,
                 const uint8_t subkey[32], const uint8_t n8[8],
                 uint64_t block0) {
  uint8_t block[64];
  uint64_t counter = block0;
  size_t off = 0;
  while (off < len) {
    salsa20_block(block, subkey, n8, counter++);
    size_t n = len - off < 64 ? len - off : 64;
    for (size_t i = 0; i < n; ++i) out[off + i] = in[off + i] ^ block[i];
    off += n;
  }
  secure_memzero(block, sizeof(block));
}

// Poly1305 (RFC 8439 §2.5), 64-bit limb implementation.
struct Poly1305 {
  uint64_t r0, r1, r2;
  uint64_t h0, h1, h2;
  uint64_t pad0, pad1;

  void init(const uint8_t key[32]) {
    uint64_t t0, t1;
    memcpy(&t0, key, 8);
    memcpy(&t1, key + 8, 8);
    // clamp r, split into 44/44/42-bit limbs
    r0 = t0 & 0xFFC0FFFFFFF;
    r1 = ((t0 >> 44) | (t1 << 20)) & 0xFFFFFC0FFFF;
    r2 = (t1 >> 24) & 0x00FFFFFFC0F;
    h0 = h1 = h2 = 0;
    memcpy(&pad0, key + 16, 8);
    memcpy(&pad1, key + 24, 8);
  }

  void blocks(const uint8_t* m, size_t len, uint64_t hibit) {
    const uint64_t r0_ = r0, r1_ = r1, r2_ = r2;
    const uint64_t s1 = r1_ * 20, s2 = r2_ * 20;
    while (len >= 16) {
      uint64_t t0, t1;
      memcpy(&t0, m, 8);
      memcpy(&t1, m + 8, 8);
      h0 += t0 & 0xFFFFFFFFFFF;
      h1 += ((t0 >> 44) | (t1 << 20)) & 0xFFFFFFFFFFF;
      h2 += ((t1 >> 24) & 0x3FFFFFFFFFF) | hibit;

      unsigned __int128 d0 = (unsigned __int128)h0 * r0_ +
                             (unsigned __int128)h1 * s2 +
                             (unsigned __int128)h2 * s1;
      unsigned __int128 d1 = (unsigned __int128)h0 * r1_ +
                             (unsigned __int128)h1 * r0_ +
                             (unsigned __int128)h2 * s2;
      unsigned __int128 d2 = (unsigned __int128)h0 * r2_ +
                             (unsigned __int128)h1 * r1_ +
                             (unsigned __int128)h2 * r0_;

      uint64_t c = (uint64_t)(d0 >> 44);
      h0 = (uint64_t)d0 & 0xFFFFFFFFFFF;
      d1 += c;
      c = (uint64_t)(d1 >> 44);
      h1 = (uint64_t)d1 & 0xFFFFFFFFFFF;
      d2 += c;
      c = (uint64_t)(d2 >> 42);
      h2 = (uint64_t)d2 & 0x3FFFFFFFFFF;
      h0 += c * 5;
      c = h0 >> 44;
      h0 &= 0xFFFFFFFFFFF;
      h1 += c;

      m += 16;
      len -= 16;
    }
  }

  void finish(const uint8_t* m, size_t len, uint8_t tag[16]) {
    size_t full = len & ~(size_t)15;
    if (full) blocks(m, full, (uint64_t)1 << 40);
    if (len > full) {
      uint8_t last[16] = {0};
      memcpy(last, m + full, len - full);
      last[len - full] = 1;
      blocks(last, 16, 0);
    }
    // full carry + final reduction mod 2^130-5
    uint64_t c = h1 >> 44;
    h1 &= 0xFFFFFFFFFFF;
    h2 += c;
    c = h2 >> 42;
    h2 &= 0x3FFFFFFFFFF;
    h0 += c * 5;
    c = h0 >> 44;
    h0 &= 0xFFFFFFFFFFF;
    h1 += c;
    c = h1 >> 44;
    h1 &= 0xFFFFFFFFFFF;
    h2 += c;

    uint64_t g0 = h0 + 5;
    c = g0 >> 44;
    g0 &= 0xFFFFFFFFFFF;
    uint64_t g1 = h1 + c;
    c = g1 >> 44;
    g1 &= 0xFFFFFFFFFFF;
    uint64_t g2 = h2 + c - ((uint64_t)1 << 42);
    uint64_t mask = (g2 >> 63) - 1;  // all-ones if g2 >= 0 (h >= p)
    h0 = (h0 & ~mask) | (g0 & mask);
    h1 = (h1 & ~mask) | (g1 & mask);
    h2 = (h2 & ~mask) | (g2 & mask);

    // h += pad (mod 2^128)
    uint64_t lo = h0 | (h1 << 44);
    uint64_t hi = (h1 >> 20) | (h2 << 24);
    unsigned __int128 acc = ((unsigned __int128)hi << 64 | lo) +
                            ((unsigned __int128)pad1 << 64 | pad0);
    lo = (uint64_t)acc;
    hi = (uint64_t)(acc >> 64);
    memcpy(tag, &lo, 8);
    memcpy(tag + 8, &hi, 8);
  }
};

void poly1305_mac(uint8_t tag[16], const uint8_t* m, size_t len,
                  const uint8_t key[32]) {
  Poly1305 p;
  p.init(key);
  p.finish(m, len, tag);
  secure_memzero(&p, sizeof(p));  // r/s are one-time key material
}

}  // namespace

extern "C" {

void ac_hsalsa20(uint8_t out[32], const uint8_t key[32], const uint8_t n[16]) {
  hsalsa20(out, key, n);
}

void ac_salsa20_block(uint8_t out[64], const uint8_t key[32],
                      const uint8_t nonce[8], uint64_t counter) {
  salsa20_block(out, key, nonce, counter);
}

void ac_poly1305(uint8_t tag[16], const uint8_t* m, uint64_t len,
                 const uint8_t key[32]) {
  poly1305_mac(tag, m, (size_t)len, key);
}

// out = tag(16) || ciphertext(len). Returns 0.
int ac_secretbox_easy(uint8_t* out, const uint8_t* m, uint64_t len,
                      const uint8_t nonce[24], const uint8_t key[32]) {
  uint8_t subkey[32];
  hsalsa20(subkey, key, nonce);
  uint8_t block0[64];
  salsa20_block(block0, subkey, nonce + 16, 0);
  uint8_t* c = out + 16;
  // first 32 keystream bytes are the Poly1305 key; bytes 32..63 encrypt m[0:32]
  size_t head = len < 32 ? (size_t)len : 32;
  for (size_t i = 0; i < head; ++i) c[i] = m[i] ^ block0[32 + i];
  if (len > 32)
    salsa20_xor(c + 32, m + 32, (size_t)len - 32, subkey, nonce + 16, 1);
  poly1305_mac(out, c, (size_t)len, block0);
  // subkey decrypts the whole stream for this nonce prefix, block0 holds
  // the Poly1305 key + keystream — neither may linger in dead stack memory
  secure_memzero(subkey, sizeof(subkey));
  secure_memzero(block0, sizeof(block0));
  return 0;
}

// in = tag(16) || ciphertext. Returns 0 on success, -1 on MAC failure.
int ac_secretbox_open_easy(uint8_t* out, const uint8_t* in, uint64_t in_len,
                           const uint8_t nonce[24], const uint8_t key[32]) {
  if (in_len < 16) return -1;
  uint64_t clen = in_len - 16;
  uint8_t subkey[32];
  hsalsa20(subkey, key, nonce);
  uint8_t block0[64];
  salsa20_block(block0, subkey, nonce + 16, 0);
  uint8_t tag[16];
  poly1305_mac(tag, in + 16, (size_t)clen, block0);
  uint8_t diff = 0;
  for (int i = 0; i < 16; ++i) diff |= tag[i] ^ in[i];
  int rc = 0;
  if (diff) {
    rc = -1;
  } else {
    const uint8_t* c = in + 16;
    size_t head = clen < 32 ? (size_t)clen : 32;
    for (size_t i = 0; i < head; ++i) out[i] = c[i] ^ block0[32 + i];
    if (clen > 32)
      salsa20_xor(out + 32, c + 32, (size_t)clen - 32, subkey, nonce + 16, 1);
  }
  secure_memzero(subkey, sizeof(subkey));
  secure_memzero(block0, sizeof(block0));
  return rc;
}

}  // extern "C"
