// Native host-side runtime ops for gnark-crypto-tpu.
//
// The reference keeps all host/protocol glue in compiled Go (big.Int pools,
// marshal.go codecs, utils/unsafe raw dumps); the TPU build's host runtime is
// Python, whose per-element big-int loops dominate setup/serialization for
// 2^20+ element batches.  This library is the compiled equivalent: batched
// 16-bit-limb codecs and Montgomery conversion, called via ctypes.
//
// Layout contract: batches are AoS uint32 arrays shaped (n, nl) — each
// element's limbs contiguous, little-endian 16-bit limbs in uint32 slots
// (the transpose of the device SoA layout; callers transpose with numpy).
//
// Reference parity: CIOS Montgomery product per ecc/bn254/fr/element_purego.go
// (the "purego" codepath), 16-bit-limb variant; byte codecs mirror
// Element.Bytes/SetBytes big-endian convention (ecc/bn254/fp/element.go:862).

#include <cstdint>
#include <cstring>

namespace {

// One CIOS Montgomery product: out = a*b*R^-1 mod q, R = 2^(16*nl).
// a, b, out: nl little-endian 16-bit limbs (uint32 slots).  t is scratch of
// nl+2 uint64.  Inputs must be < q; output < q.
inline void cios_one(const uint32_t* a, const uint32_t* b, uint32_t* out,
                     const uint32_t* q, uint64_t qinv, int nl, uint64_t* t) {
  for (int j = 0; j < nl + 2; ++j) t[j] = 0;
  for (int i = 0; i < nl; ++i) {
    const uint64_t ai = a[i];
    uint64_t carry = 0;
    for (int j = 0; j < nl; ++j) {
      const uint64_t v = t[j] + ai * b[j] + carry;
      t[j] = v & 0xffffu;
      carry = v >> 16;
    }
    uint64_t v = t[nl] + carry;
    t[nl] = v & 0xffffu;
    t[nl + 1] += v >> 16;

    const uint64_t m = (t[0] * qinv) & 0xffffu;
    carry = (t[0] + m * q[0]) >> 16;
    for (int j = 1; j < nl; ++j) {
      const uint64_t w = t[j] + m * q[j] + carry;
      t[j - 1] = w & 0xffffu;
      carry = w >> 16;
    }
    v = t[nl] + carry;
    t[nl - 1] = v & 0xffffu;
    t[nl] = t[nl + 1] + (v >> 16);
    t[nl + 1] = 0;
  }
  // conditional subtraction: t < 2q here, subtract q if t >= q
  uint64_t borrow = 0;
  uint64_t d[64];
  for (int j = 0; j < nl; ++j) {
    const uint64_t v = t[j] - q[j] - borrow;
    d[j] = v & 0xffffu;
    borrow = (v >> 63) & 1u;  // borrow iff wrapped negative
  }
  const bool use_sub = (t[nl] != 0) || (borrow == 0);
  for (int j = 0; j < nl; ++j)
    out[j] = static_cast<uint32_t>(use_sub ? d[j] : t[j]);
}

}  // namespace

extern "C" {

// Batched Montgomery product.  a: (n, nl); b: (n, nl) if b_stride else (nl,)
// broadcast; out: (n, nl).  qinv = -q^-1 mod 2^16.
void gct_mont_mul_batch(const uint32_t* a, const uint32_t* b, uint32_t* out,
                        const uint32_t* q, uint32_t qinv, int nl, long long n,
                        int b_stride) {
  uint64_t t[64 + 2];
  for (long long e = 0; e < n; ++e) {
    const uint32_t* be = b_stride ? (b + (size_t)e * nl) : b;
    cios_one(a + (size_t)e * nl, be, out + (size_t)e * nl, q,
             (uint64_t)qinv, nl, t);
  }
}

// Big-endian fixed-width bytes -> little-endian 16-bit limbs.
// src: (n, nbytes) bytes; dst: (n, nl) uint32.  nbytes <= 2*nl.
void gct_bytes_to_limbs(const uint8_t* src, uint32_t* dst, int nbytes, int nl,
                        long long n) {
  for (long long e = 0; e < n; ++e) {
    const uint8_t* s = src + (size_t)e * nbytes;
    uint32_t* d = dst + (size_t)e * nl;
    for (int j = 0; j < nl; ++j) d[j] = 0;
    for (int k = 0; k < nbytes; ++k) {
      // byte k (big-endian) contributes at bit offset 8*(nbytes-1-k)
      const int bit = 8 * (nbytes - 1 - k);
      const int limb = bit >> 4;
      const int sh = bit & 15;
      d[limb] |= (uint32_t)s[k] << sh;
    }
    for (int j = 0; j < nl; ++j) d[j] &= 0xffffu;
  }
}

// Little-endian 16-bit limbs -> big-endian fixed-width bytes.
void gct_limbs_to_bytes(const uint32_t* src, uint8_t* dst, int nbytes, int nl,
                        long long n) {
  for (long long e = 0; e < n; ++e) {
    const uint32_t* s = src + (size_t)e * nl;
    uint8_t* d = dst + (size_t)e * nbytes;
    for (int k = 0; k < nbytes; ++k) {
      const int bit = 8 * (nbytes - 1 - k);
      const int limb = bit >> 4;
      const int sh = bit & 15;
      d[k] = (uint8_t)((limb < nl ? s[limb] : 0) >> sh);
    }
  }
}

// Batched canonical comparison a >= q (subgroup/marshal validation helper).
// a: (n, nl); out: (n,) uint8 (1 if a >= q).
void gct_geq_q_batch(const uint32_t* a, uint8_t* out, const uint32_t* q,
                     int nl, long long n) {
  for (long long e = 0; e < n; ++e) {
    const uint32_t* ae = a + (size_t)e * nl;
    int geq = 1;  // equal counts as >=
    for (int j = nl - 1; j >= 0; --j) {
      if (ae[j] > q[j]) { geq = 1; break; }
      if (ae[j] < q[j]) { geq = 0; break; }
    }
    out[e] = (uint8_t)geq;
  }
}

}  // extern "C"
