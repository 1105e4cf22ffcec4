// Native host-runtime primitives: CRC32C, frame ring buffer helpers.
//
// CRC32-C (Castagnoli) matches the reference's checksum exactly
// (lib/network/crc32.c:171-189: poly 0x1EDC6F41 reflected 0x82F63B78,
// init 0xFFFFFFFF, final inversion; hardware SSE4.2/ARM64 CRC32C when
// available). Used for ACIP packet integrity (packet.c:303).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libruntime.so runtime.cpp

#include <cstddef>
#include <cstdint>

#if defined(__SSE4_2__)
#include <nmmintrin.h>
#endif
#if defined(__aarch64__) && defined(__ARM_FEATURE_CRC32)
#include <arm_acle.h>
#endif

namespace {

// Slice-by-8 tables for the software path.
uint32_t CRC_TABLE[8][256];

struct InitCrc {
  InitCrc() {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t crc = i;
      for (int j = 0; j < 8; ++j)
        crc = (crc & 1) ? (crc >> 1) ^ 0x82F63B78u : crc >> 1;
      CRC_TABLE[0][i] = crc;
    }
    for (uint32_t i = 0; i < 256; ++i)
      for (int k = 1; k < 8; ++k)
        CRC_TABLE[k][i] =
            (CRC_TABLE[k - 1][i] >> 8) ^ CRC_TABLE[0][CRC_TABLE[k - 1][i] & 0xFF];
  }
};
InitCrc g_init_crc;

inline uint32_t crc32c_sw(uint32_t crc, const uint8_t* p, size_t len) {
  while (len >= 8) {
    uint64_t word;
    __builtin_memcpy(&word, p, 8);
    word ^= (uint64_t)crc;
    crc = CRC_TABLE[7][word & 0xFF] ^ CRC_TABLE[6][(word >> 8) & 0xFF] ^
          CRC_TABLE[5][(word >> 16) & 0xFF] ^ CRC_TABLE[4][(word >> 24) & 0xFF] ^
          CRC_TABLE[3][(word >> 32) & 0xFF] ^ CRC_TABLE[2][(word >> 40) & 0xFF] ^
          CRC_TABLE[1][(word >> 48) & 0xFF] ^ CRC_TABLE[0][(word >> 56) & 0xFF];
    p += 8;
    len -= 8;
  }
  while (len--) crc = (crc >> 8) ^ CRC_TABLE[0][(crc ^ *p++) & 0xFF];
  return crc;
}

}  // namespace

extern "C" {

uint32_t ac_crc32c(const void* data, size_t len) {
  const uint8_t* p = (const uint8_t*)data;
  uint32_t crc = 0xFFFFFFFFu;
#if defined(__SSE4_2__)
  while (len >= 8) {
    uint64_t word;
    __builtin_memcpy(&word, p, 8);
    crc = (uint32_t)_mm_crc32_u64(crc, word);
    p += 8;
    len -= 8;
  }
  while (len--) crc = _mm_crc32_u8(crc, *p++);
#elif defined(__aarch64__) && defined(__ARM_FEATURE_CRC32)
  while (len >= 8) {
    uint64_t word;
    __builtin_memcpy(&word, p, 8);
    crc = __crc32cd(crc, word);
    p += 8;
    len -= 8;
  }
  while (len--) crc = __crc32cb(crc, *p++);
#else
  crc = crc32c_sw(crc, p, len);
#endif
  return ~crc;
}

}  // extern "C"
