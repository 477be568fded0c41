// BLAKE-512 (original BLAKE, SHA-3 finalist) — native host hashing.
//
// The reference derives keys and deterministic nonces with the Rust
// `blake-hash` crate (/root/reference/src/lib.rs:226-237); in this
// framework host-side hashing feeds the TPU batch-sign pipeline (one
// digest per message), so it is implemented natively with a batch entry
// point. Python binding via ctypes (babyjubjub_tpu/utils/blake512.py).
//
// Build: make -C babyjubjub_tpu/native

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

constexpr uint64_t IV[8] = {
    0x6A09E667F3BCC908ULL, 0xBB67AE8584CAA73BULL,
    0x3C6EF372FE94F82BULL, 0xA54FF53A5F1D36F1ULL,
    0x510E527FADE682D1ULL, 0x9B05688C2B3E6C1FULL,
    0x1F83D9ABFB41BD6BULL, 0x5BE0CD19137E2179ULL};

constexpr uint64_t CST[16] = {
    0x243F6A8885A308D3ULL, 0x13198A2E03707344ULL,
    0xA4093822299F31D0ULL, 0x082EFA98EC4E6C89ULL,
    0x452821E638D01377ULL, 0xBE5466CF34E90C6CULL,
    0xC0AC29B7C97C50DDULL, 0x3F84D5B5B5470917ULL,
    0x9216D5D98979FB1BULL, 0xD1310BA698DFB5ACULL,
    0x2FFD72DBD01ADFB7ULL, 0xB8E1AFED6A267E96ULL,
    0xBA7C9045F12C7F99ULL, 0x24A19947B3916CF7ULL,
    0x0801F2E2858EFC16ULL, 0x636920D871574E69ULL};

constexpr uint8_t SIGMA[10][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0}};

inline uint64_t rotr64(uint64_t x, int n) {
  return (x >> n) | (x << (64 - n));
}

inline uint64_t load_be64(const uint8_t* p) {
  uint64_t v = 0;
  for (int i = 0; i < 8; ++i) v = (v << 8) | p[i];
  return v;
}

inline void store_be64(uint8_t* p, uint64_t v) {
  for (int i = 7; i >= 0; --i) {
    p[i] = static_cast<uint8_t>(v & 0xFF);
    v >>= 8;
  }
}

void compress(uint64_t h[8], const uint8_t block[128], uint64_t t_lo,
              uint64_t t_hi) {
  uint64_t m[16];
  for (int i = 0; i < 16; ++i) m[i] = load_be64(block + 8 * i);
  uint64_t v[16];
  std::memcpy(v, h, sizeof(uint64_t) * 8);
  v[8] = CST[0];
  v[9] = CST[1];
  v[10] = CST[2];
  v[11] = CST[3];
  v[12] = CST[4] ^ t_lo;
  v[13] = CST[5] ^ t_lo;
  v[14] = CST[6] ^ t_hi;
  v[15] = CST[7] ^ t_hi;

#define G(a, b, c, d, i)                                   \
  do {                                                     \
    v[a] += v[b] + (m[sig[2 * (i)]] ^ CST[sig[2 * (i) + 1]]); \
    v[d] = rotr64(v[d] ^ v[a], 32);                        \
    v[c] += v[d];                                          \
    v[b] = rotr64(v[b] ^ v[c], 25);                        \
    v[a] += v[b] + (m[sig[2 * (i) + 1]] ^ CST[sig[2 * (i)]]); \
    v[d] = rotr64(v[d] ^ v[a], 16);                        \
    v[c] += v[d];                                          \
    v[b] = rotr64(v[b] ^ v[c], 11);                        \
  } while (0)

  for (int r = 0; r < 16; ++r) {
    const uint8_t* sig = SIGMA[r % 10];
    G(0, 4, 8, 12, 0);
    G(1, 5, 9, 13, 1);
    G(2, 6, 10, 14, 2);
    G(3, 7, 11, 15, 3);
    G(0, 5, 10, 15, 4);
    G(1, 6, 11, 12, 5);
    G(2, 7, 8, 13, 6);
    G(3, 4, 9, 14, 7);
  }
#undef G

  for (int i = 0; i < 8; ++i) h[i] ^= v[i] ^ v[i + 8];
}

void blake512(const uint8_t* data, size_t len, uint8_t out[64]) {
  uint64_t h[8];
  std::memcpy(h, IV, sizeof(h));
  const unsigned __int128 ell = static_cast<unsigned __int128>(len) * 8;

  size_t n_full = len / 128;
  for (size_t i = 0; i < n_full; ++i) {
    unsigned __int128 t = static_cast<unsigned __int128>(1024) * (i + 1);
    compress(h, data + 128 * i, static_cast<uint64_t>(t),
             static_cast<uint64_t>(t >> 64));
  }

  const uint8_t* rest = data + 128 * n_full;
  size_t rest_len = len - 128 * n_full;

  uint8_t pad[256];
  std::memset(pad, 0, sizeof(pad));
  std::memcpy(pad, rest, rest_len);
  size_t plen = rest_len;
  if (rest_len == 111) {
    pad[plen++] = 0x81;
  } else {
    pad[plen++] = 0x80;
    while (plen % 128 != 111) ++plen;  // zeros already memset
    pad[plen++] = 0x01;
  }
  // 16-byte big-endian bit length
  unsigned __int128 e = ell;
  for (int i = 15; i >= 0; --i) {
    pad[plen + i] = static_cast<uint8_t>(e & 0xFF);
    e >>= 8;
  }
  plen += 16;

  for (size_t off = 0, bi = 0; off < plen; off += 128, ++bi) {
    uint64_t t_lo = 0, t_hi = 0;
    if (bi == 0 && rest_len > 0) {
      unsigned __int128 t =
          static_cast<unsigned __int128>(1024) * n_full + rest_len * 8;
      t_lo = static_cast<uint64_t>(t);
      t_hi = static_cast<uint64_t>(t >> 64);
    }
    compress(h, pad + off, t_lo, t_hi);
  }

  for (int i = 0; i < 8; ++i) store_be64(out + 8 * i, h[i]);
}

}  // namespace

extern "C" {

void blake512_digest(const char* data, size_t len, char* out) {
  blake512(reinterpret_cast<const uint8_t*>(data), len,
           reinterpret_cast<uint8_t*>(out));
}

// n messages of equal length `len`, concatenated; out: n * 64 bytes.
void blake512_batch(const char* data, size_t len, size_t n, char* out) {
  for (size_t i = 0; i < n; ++i) {
    blake512(reinterpret_cast<const uint8_t*>(data) + i * len, len,
             reinterpret_cast<uint8_t*>(out) + i * 64);
  }
}

}  // extern "C"
