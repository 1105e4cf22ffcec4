/* compile-only stub: the renderer test .so never calls libsodium */
#ifndef STUB_SODIUM_H
#define STUB_SODIUM_H
#include <stddef.h>
#include <stdint.h>
#define crypto_box_PUBLICKEYBYTES 32
#define crypto_box_SECRETKEYBYTES 32
#define crypto_box_BEFORENMBYTES 32
#define crypto_secretbox_KEYBYTES 32
#define crypto_secretbox_NONCEBYTES 24
#define crypto_secretbox_MACBYTES 16
#define crypto_pwhash_SALTBYTES 16
#define crypto_auth_BYTES 32
#define crypto_auth_KEYBYTES 32
#define crypto_generichash_BYTES 32
#define crypto_sign_PUBLICKEYBYTES 32
#define crypto_sign_SECRETKEYBYTES 64
#define crypto_sign_BYTES 64
#define crypto_kx_SESSIONKEYBYTES 32
static inline void sodium_memzero(void *p, size_t n) { (void)p; (void)n; }
#endif
