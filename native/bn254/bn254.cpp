// BN254 G1 Pippenger MSM over 4x64-bit Montgomery limbs — the host MSM
// engine behind fields/bn254.msm_jac (SNARK-wrapper commitments; the
// BASELINE "BN254 MSM pts/s" metric). Replaces the python-int jacobian
// Pippenger for large inputs; on the tunneled single-chip setup the
// device MSM kernels (ops/msm.py) are dispatch-bound, so the host native
// path is the production single-host engine and ops/msm.py remains the
// pod-sharded composition.
//
// Field constants (modulus, R^2, -p^{-1} mod 2^64) are installed at
// runtime from fields/bn254.py so constant provenance stays in Python.
// All arithmetic is branch-poor CIOS Montgomery; points are Jacobian
// with Z == 0 as infinity; the curve has a = 0 (BN254).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 bn254.cpp -o libbn254.so
// (auto-built by fields/bn254_native.py).

#include <cstdint>
#include <cstring>
#include <vector>

using u32 = uint32_t;
using u64 = uint64_t;
using u128 = unsigned __int128;

namespace {

struct Fq {
  u64 l[4];
};

Fq P_, R2_, ONE_;  // ONE_ = R mod p (Montgomery 1)
u64 INV_;

inline bool is_zero(const Fq &a) {
  return !(a.l[0] | a.l[1] | a.l[2] | a.l[3]);
}

inline int cmp(const Fq &a, const Fq &b) {
  for (int i = 3; i >= 0; i--) {
    if (a.l[i] < b.l[i]) return -1;
    if (a.l[i] > b.l[i]) return 1;
  }
  return 0;
}

inline void sub_p(Fq &a) {
  u128 bw = 0;
  for (int i = 0; i < 4; i++) {
    u128 t = (u128)a.l[i] - P_.l[i] - (u64)bw;
    a.l[i] = (u64)t;
    bw = (t >> 64) & 1;
  }
}

inline void f_add(Fq &r, const Fq &a, const Fq &b) {
  u128 c = 0;
  for (int i = 0; i < 4; i++) {
    u128 t = (u128)a.l[i] + b.l[i] + (u64)c;
    r.l[i] = (u64)t;
    c = t >> 64;
  }
  if (c || cmp(r, P_) >= 0) sub_p(r);
}

inline void f_sub(Fq &r, const Fq &a, const Fq &b) {
  u128 bw = 0;
  for (int i = 0; i < 4; i++) {
    u128 t = (u128)a.l[i] - b.l[i] - (u64)bw;
    r.l[i] = (u64)t;
    bw = (t >> 64) & 1;
  }
  if (bw) {
    u128 c = 0;
    for (int i = 0; i < 4; i++) {
      u128 t = (u128)r.l[i] + P_.l[i] + (u64)c;
      r.l[i] = (u64)t;
      c = t >> 64;
    }
  }
}

inline void f_dbl(Fq &r, const Fq &a) { f_add(r, a, a); }

// CIOS Montgomery multiplication: r = a*b*R^{-1} mod p.
void f_mul(Fq &r, const Fq &a, const Fq &b) {
  u64 t[5] = {0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++) {
    u128 c = 0;
    for (int j = 0; j < 4; j++) {
      u128 x = (u128)a.l[j] * b.l[i] + t[j] + (u64)c;
      t[j] = (u64)x;
      c = x >> 64;
    }
    u128 x = (u128)t[4] + (u64)c;
    u64 t4 = (u64)x;
    u64 t5 = (u64)(x >> 64);

    u64 m = t[0] * INV_;
    c = ((u128)m * P_.l[0] + t[0]) >> 64;
    for (int j = 1; j < 4; j++) {
      u128 x2 = (u128)m * P_.l[j] + t[j] + (u64)c;
      t[j - 1] = (u64)x2;
      c = x2 >> 64;
    }
    x = (u128)t4 + (u64)c;
    t[3] = (u64)x;
    t[4] = t5 + (u64)(x >> 64);
  }
  std::memcpy(r.l, t, 32);
  if (t[4] || cmp(r, P_) >= 0) sub_p(r);
}

inline void f_sqr(Fq &r, const Fq &a) { f_mul(r, a, a); }

struct Pt {
  Fq x, y, z;  // Jacobian; infinity iff z == 0
};

inline void pt_set_inf(Pt &p) { std::memset(&p, 0, sizeof(p)); }

void pt_dbl(Pt &r, const Pt &p) {
  if (is_zero(p.z)) {
    r = p;
    return;
  }
  Fq A, B, C, D, E, F, t, t2;
  f_sqr(A, p.x);
  f_sqr(B, p.y);
  f_sqr(C, B);
  f_add(t, p.x, B);
  f_sqr(t, t);
  f_sub(t, t, A);
  f_sub(t, t, C);
  f_dbl(D, t);
  f_add(E, A, A);
  f_add(E, E, A);
  f_sqr(F, E);
  f_dbl(t, D);
  f_sub(r.x, F, t);
  f_sub(t, D, r.x);
  f_mul(t, E, t);
  f_dbl(t2, C);
  f_dbl(t2, t2);
  f_dbl(t2, t2);  // 8C
  f_sub(r.y, t, t2);
  f_mul(t, p.y, p.z);
  f_dbl(r.z, t);
}

void pt_add(Pt &r, const Pt &p, const Pt &q) {
  if (is_zero(p.z)) {
    r = q;
    return;
  }
  if (is_zero(q.z)) {
    r = p;
    return;
  }
  Fq z1z1, z2z2, u1, u2, s1, s2, h, i, j, rr, v, t;
  f_sqr(z1z1, p.z);
  f_sqr(z2z2, q.z);
  f_mul(u1, p.x, z2z2);
  f_mul(u2, q.x, z1z1);
  f_mul(s1, p.y, q.z);
  f_mul(s1, s1, z2z2);
  f_mul(s2, q.y, p.z);
  f_mul(s2, s2, z1z1);
  f_sub(h, u2, u1);
  f_sub(rr, s2, s1);
  if (is_zero(h)) {
    if (is_zero(rr)) {
      pt_dbl(r, p);
      return;
    }
    pt_set_inf(r);
    return;
  }
  f_dbl(rr, rr);  // r = 2*(s2-s1)
  f_dbl(t, h);
  f_sqr(i, t);            // i = (2h)^2
  f_mul(j, h, i);         // j = h*i
  f_mul(v, u1, i);        // v = u1*i
  f_sqr(r.x, rr);
  f_sub(r.x, r.x, j);
  f_sub(r.x, r.x, v);
  f_sub(r.x, r.x, v);     // x3 = r^2 - j - 2v
  f_sub(t, v, r.x);
  f_mul(t, rr, t);
  f_mul(s1, s1, j);
  f_dbl(s1, s1);
  f_sub(r.y, t, s1);      // y3 = r*(v-x3) - 2*s1*j
  f_add(t, p.z, q.z);
  f_sqr(t, t);
  f_sub(t, t, z1z1);
  f_sub(t, t, z2z2);
  f_mul(r.z, t, h);       // z3 = ((z1+z2)^2 - z1z1 - z2z2)*h
}

}  // namespace

extern "C" {

int bn254_init(const u64 *p, const u64 *r2, const u64 *one, u64 inv) {
  std::memcpy(P_.l, p, 32);
  std::memcpy(R2_.l, r2, 32);
  std::memcpy(ONE_.l, one, 32);
  INV_ = inv;
  return 0;
}

// Pippenger MSM. affine: 2*4*n u64 limbs (x, y canonical; the pair
// (0, 0) encodes infinity). scalars: 32*n bytes LE. out: canonical
// Jacobian (x, y, z) 3*4 u64.
int bn254_msm(const u64 *affine, const uint8_t *scalars, u64 n, u32 c,
              u64 *out) {
  if (!n || c < 1 || c > 16) return -1;
  // Montgomery-convert points once
  std::vector<Pt> pts(n);
  for (u64 i = 0; i < n; i++) {
    Fq x, y;
    std::memcpy(x.l, affine + 8 * i, 32);
    std::memcpy(y.l, affine + 8 * i + 4, 32);
    if (is_zero(x) && is_zero(y)) {
      pt_set_inf(pts[i]);
      continue;
    }
    f_mul(pts[i].x, x, R2_);
    f_mul(pts[i].y, y, R2_);
    pts[i].z = ONE_;
  }
  // top scalar bit -> number of windows
  int top_bit = 0;
  for (u64 i = 0; i < n; i++)
    for (int b = 255; b > top_bit; b--)
      if ((scalars[32 * i + b / 8] >> (b % 8)) & 1) {
        top_bit = b;
        break;
      }
  int n_windows = top_bit / c + 1;

  auto digit = [&](u64 i, int w) -> u32 {
    int lo = w * (int)c;
    u32 v = 0;
    for (u32 b = 0; b < c; b++) {
      int bit = lo + (int)b;
      if (bit > 255) break;
      v |= (u32)((scalars[32 * i + bit / 8] >> (bit % 8)) & 1) << b;
    }
    return v;
  };

  u32 n_buckets = (1u << c) - 1;
  std::vector<Pt> buckets(n_buckets);
  Pt acc;
  pt_set_inf(acc);
  for (int w = n_windows - 1; w >= 0; w--) {
    for (u32 b = 0; b < c; b++) {
      Pt t;
      pt_dbl(t, acc);
      acc = t;
    }
    for (u32 b = 0; b < n_buckets; b++) pt_set_inf(buckets[b]);
    for (u64 i = 0; i < n; i++) {
      u32 d = digit(i, w);
      if (d) {
        Pt t;
        pt_add(t, buckets[d - 1], pts[i]);
        buckets[d - 1] = t;
      }
    }
    Pt run, sum, t;
    pt_set_inf(run);
    pt_set_inf(sum);
    for (int b = (int)n_buckets - 1; b >= 0; b--) {
      pt_add(t, run, buckets[b]);
      run = t;
      pt_add(t, sum, run);
      sum = t;
    }
    pt_add(t, acc, sum);
    acc = t;
  }
  // Montgomery -> canonical
  Fq one_c;
  std::memset(&one_c, 0, sizeof(one_c));
  one_c.l[0] = 1;
  Fq xo, yo, zo;
  f_mul(xo, acc.x, one_c);
  f_mul(yo, acc.y, one_c);
  f_mul(zo, acc.z, one_c);
  std::memcpy(out, xo.l, 32);
  std::memcpy(out + 4, yo.l, 32);
  std::memcpy(out + 8, zo.l, 32);
  return 0;
}

}  // extern "C"
