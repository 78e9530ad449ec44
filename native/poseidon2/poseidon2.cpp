// Batch Poseidon2 permutation over BabyBear (Montgomery form) — the host
// hashing hot path (Merkle commits, duplex challenger, path verification).
//
// Bit-identical to zkvm_prover_tpu/ops/poseidon2.py::permute_np: same
// round structure (4 external + n_int internal + 4 external, initial
// external linear layer), same M4-circulant external layer, same
// I + diag(v) internal layer, same x^7 s-box, operating on uint32
// Montgomery residues. Round constants and the diagonal are INSTALLED at
// runtime from the Python table (`p2_init`) so constant provenance stays
// in one place (ops/poseidon2.py, incl. the load_constants override hook
// for Plonky3 parity — ROADMAP "Bit-parity debts").
//
// The TPU path (ops/poseidon2.py::permute, jax) is unchanged: this file
// only replaces the per-call-overhead-bound numpy fallback that runs on
// the host when device dispatch would be slower (tunneled setups, the
// challenger's single-row duplex, per-query Merkle path walks).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 poseidon2.cpp -o libposeidon2.so
// (auto-built by ops/p2_native.py, mirroring vm/executor.py).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

uint32_t P_ = 0, NP_ = 0;

struct Cfg {
  uint32_t width = 0, n_int = 0;
  std::vector<uint32_t> ext_rc;  // ROUNDS_F x width, row-major
  std::vector<uint32_t> int_rc;  // n_int
  std::vector<uint32_t> diag;    // width
};

Cfg cfgs[2];  // [0] width 16, [1] width 24

inline Cfg *cfg_for(uint32_t width) {
  if (width == 16 && cfgs[0].width == 16) return &cfgs[0];
  if (width == 24 && cfgs[1].width == 24) return &cfgs[1];
  return nullptr;
}

inline uint32_t mont_mul(uint32_t a, uint32_t b) {
  uint64_t t = (uint64_t)a * b;
  uint32_t m = (uint32_t)t * NP_;
  uint64_t u = (t + (uint64_t)m * P_) >> 32;
  if (u >= P_) u -= P_;
  return (uint32_t)u;
}

inline uint32_t add_p(uint32_t a, uint32_t b) {
  uint32_t s = a + b;  // a, b < P < 2^31: no uint32 overflow
  if (s >= P_) s -= P_;
  return s;
}

inline uint32_t sbox7(uint32_t v) {
  uint32_t v2 = mont_mul(v, v);
  uint32_t v4 = mont_mul(v2, v2);
  return mont_mul(mont_mul(v4, v2), v);
}

template <int W>
inline void ext_lin(uint32_t *v) {
  for (int g = 0; g < W; g += 4) {
    uint32_t a = v[g], b = v[g + 1], c = v[g + 2], d = v[g + 3];
    uint32_t t01 = add_p(a, b);
    uint32_t t23 = add_p(c, d);
    uint32_t t0123 = add_p(t01, t23);
    uint32_t t01123 = add_p(t0123, b);
    uint32_t t01233 = add_p(t0123, d);
    v[g + 3] = add_p(t01233, add_p(a, a));
    v[g + 1] = add_p(t01123, add_p(c, c));
    v[g] = add_p(t01123, t01);
    v[g + 2] = add_p(t01233, t23);
  }
  uint32_t acc[4] = {0, 0, 0, 0};
  for (int g = 0; g < W; g += 4)
    for (int k = 0; k < 4; k++) acc[k] = add_p(acc[k], v[g + k]);
  for (int g = 0; g < W; g += 4)
    for (int k = 0; k < 4; k++) v[g + k] = add_p(v[g + k], acc[k]);
}

template <int W>
inline void int_lin(uint32_t *v, const uint32_t *diag) {
  uint32_t acc = v[0];
  for (int i = 1; i < W; i++) acc = add_p(acc, v[i]);
  for (int i = 0; i < W; i++) v[i] = add_p(acc, mont_mul(diag[i], v[i]));
}

template <int W>
void permute_one(uint32_t *x, const Cfg &c) {
  const uint32_t *erc = c.ext_rc.data();
  const uint32_t *irc = c.int_rc.data();
  const uint32_t *diag = c.diag.data();
  ext_lin<W>(x);
  for (int r = 0; r < 4; r++) {
    const uint32_t *rc = erc + r * W;
    for (int i = 0; i < W; i++) x[i] = sbox7(add_p(x[i], rc[i]));
    ext_lin<W>(x);
  }
  for (uint32_t r = 0; r < c.n_int; r++) {
    x[0] = sbox7(add_p(x[0], irc[r]));
    int_lin<W>(x, diag);
  }
  for (int r = 4; r < 8; r++) {
    const uint32_t *rc = erc + r * W;
    for (int i = 0; i < W; i++) x[i] = sbox7(add_p(x[i], rc[i]));
    ext_lin<W>(x);
  }
}

template <int W>
void permute_range(uint32_t *states, uint64_t lo, uint64_t hi,
                   const Cfg &c) {
  for (uint64_t i = lo; i < hi; i++) permute_one<W>(states + i * W, c);
}

// Work-gated variant: `muls_per_item` approximates per-item cost so
// thread spawn (~50us) only happens when the total work warrants it.
template <typename F>
void parallel_work(uint64_t n, uint64_t muls_per_item, F f) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw < 2 || n < 2 || n * muls_per_item < (1u << 17)) {
    f(0, n);
    return;
  }
  unsigned nt = hw < 8 ? hw : 8;
  if (nt > n) nt = (unsigned)n;
  std::vector<std::thread> ts;
  uint64_t chunk = (n + nt - 1) / nt;
  for (unsigned t = 0; t < nt; t++) {
    uint64_t lo = t * chunk, hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    ts.emplace_back([=] { f(lo, hi); });
  }
  for (auto &t : ts) t.join();
}

template <typename F>
void parallel_rows(uint64_t n, F f) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw < 2 || n < (1u << 12)) {
    f(0, n);
    return;
  }
  unsigned nt = hw < 8 ? hw : 8;
  std::vector<std::thread> ts;
  uint64_t chunk = (n + nt - 1) / nt;
  for (unsigned t = 0; t < nt; t++) {
    uint64_t lo = t * chunk, hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    ts.emplace_back([=] { f(lo, hi); });
  }
  for (auto &t : ts) t.join();
}

}  // namespace

extern "C" {

// Install field parameters + round constants for one width (Montgomery
// form). ext_rc: n_ext x width row-major (n_ext must be 8).
int p2_init(uint32_t p, uint32_t np, uint32_t width, const uint32_t *ext_rc,
            uint32_t n_ext, const uint32_t *int_rc, uint32_t n_int,
            const uint32_t *diag) {
  if (n_ext != 8 || (width != 16 && width != 24)) return -1;
  P_ = p;
  NP_ = np;
  Cfg &c = cfgs[width == 16 ? 0 : 1];
  c.width = width;
  c.n_int = n_int;
  c.ext_rc.assign(ext_rc, ext_rc + (size_t)n_ext * width);
  c.int_rc.assign(int_rc, int_rc + n_int);
  c.diag.assign(diag, diag + width);
  return 0;
}

// In-place batch permutation of n states, each `width` lanes.
int p2_permute(uint32_t width, uint64_t n, uint32_t *states) {
  Cfg *c = cfg_for(width);
  if (!c) return -1;
  if (width == 16)
    parallel_rows(n, [&](uint64_t lo, uint64_t hi) {
      permute_range<16>(states, lo, hi, *c);
    });
  else
    parallel_rows(n, [&](uint64_t lo, uint64_t hi) {
      permute_range<24>(states, lo, hi, *c);
    });
  return 0;
}

// Sponge row hashing: mat is (s, cols) row-major; out is (s, digest).
// Absorbs `rate`-lane blocks (zero padded) into a width-16 state —
// matches ops/poseidon2.py::hash_rows_np.
int p2_hash_rows(uint64_t s, uint64_t cols, uint32_t rate, uint32_t digest,
                 const uint32_t *mat, uint32_t *out) {
  Cfg *c = cfg_for(16);
  if (!c || rate > 16 || digest > 16) return -1;
  uint64_t n_blocks = cols ? (cols + rate - 1) / rate : 1;
  parallel_rows(s, [&](uint64_t lo, uint64_t hi) {
    uint32_t st[16];
    for (uint64_t i = lo; i < hi; i++) {
      std::memset(st, 0, sizeof(st));
      const uint32_t *row = mat + i * cols;
      for (uint64_t b = 0; b < n_blocks; b++) {
        for (uint32_t k = 0; k < rate; k++) {
          uint64_t col = b * rate + k;
          st[k] = col < cols ? row[col] : 0;
        }
        permute_one<16>(st, *c);
      }
      std::memcpy(out + i * digest, st, digest * sizeof(uint32_t));
    }
  });
  return 0;
}

// 2-to-1 compression: out[i] = permute(l[i] || r[i])[:digest].
int p2_compress(uint64_t n, uint32_t digest, const uint32_t *l,
                const uint32_t *r, uint32_t *out) {
  Cfg *c = cfg_for(16);
  if (!c || digest > 8) return -1;
  parallel_rows(n, [&](uint64_t lo, uint64_t hi) {
    uint32_t st[16];
    for (uint64_t i = lo; i < hi; i++) {
      std::memcpy(st, l + i * 8, 8 * sizeof(uint32_t));
      std::memcpy(st + 8, r + i * 8, 8 * sizeof(uint32_t));
      permute_one<16>(st, *c);
      std::memcpy(out + i * digest, st, digest * sizeof(uint32_t));
    }
  });
  return 0;
}

// ---------------------------------------------------------------------
// BabyBear batch field kernels (share P_/NP_ with the hash kernel) —
// the host prover's ext4/base hot loops (DEEP combination, logUp
// fingerprints, FRI folds). One fused pass per element vs numpy's ~8
// temporaries per Montgomery multiply.
// ---------------------------------------------------------------------

int bb_init(uint32_t p, uint32_t np) {
  P_ = p;
  NP_ = np;
  return 0;
}

// elementwise Montgomery product of two same-length arrays
int bb_mul_arrays(uint64_t n, const uint32_t *a, const uint32_t *b,
                  uint32_t *out) {
  if (!P_) return -1;
  parallel_work(n, 1, [&](uint64_t lo, uint64_t hi) {
    for (uint64_t i = lo; i < hi; i++) out[i] = mont_mul(a[i], b[i]);
  });
  return 0;
}

inline uint32_t sub_p(uint32_t a, uint32_t b) {
  return a >= b ? a - b : a + P_ - b;
}

// Staged radix-2 NTT butterflies over an (n, cols) row-major matrix,
// in-place — the host twin of ops/ntt.py::_dif/_dit (bit-identical: the
// caller passes the SAME Montgomery stage-twiddle tables, flattened so
// stage s (h = 2^(s-1)) starts at offset h-1). dit=0: natural-order in,
// bit-reversed out (new_lo = lo+hi, new_hi = (lo-hi)*w). dit=1:
// bit-reversed in, natural out (t = hi*w, lo+t, lo-t).
int bb_ntt(uint32_t dit, uint64_t n, uint64_t cols, uint32_t log_n,
           const uint32_t *tw, uint32_t *data) {
  if (!P_ || n != (1ull << log_n)) return -1;
  for (uint32_t si = 0; si < log_n; si++) {
    uint32_t s = dit ? si + 1 : log_n - si;
    uint64_t h = 1ull << (s - 1);
    const uint32_t *tws = tw + (h - 1);
    uint64_t n_bf = n / 2;
    auto stage = [&](uint64_t lo_t, uint64_t hi_t) {
      for (uint64_t t = lo_t; t < hi_t; t++) {
        uint64_t b = t / h, j = t % h;
        uint32_t *prow = data + (b * 2 * h + j) * cols;
        uint32_t *qrow = prow + h * cols;
        uint32_t w = tws[j];
        if (dit) {
          for (uint64_t c = 0; c < cols; c++) {
            uint32_t tv = mont_mul(qrow[c], w);
            uint32_t l = prow[c];
            prow[c] = add_p(l, tv);
            qrow[c] = sub_p(l, tv);
          }
        } else {
          for (uint64_t c = 0; c < cols; c++) {
            uint32_t l = prow[c], r = qrow[c];
            prow[c] = add_p(l, r);
            qrow[c] = mont_mul(sub_p(l, r), w);
          }
        }
      }
    };
    unsigned hw = std::thread::hardware_concurrency();
    if (n_bf * cols >= (1u << 15) && hw >= 2 && n_bf >= 2 * hw) {
      // gate on total WORK, not row count (parallel_rows' row threshold
      // would leave wide-but-short stages serial)
      unsigned nt = hw < 8 ? hw : 8;
      std::vector<std::thread> ts;
      uint64_t chunk = (n_bf + nt - 1) / nt;
      for (unsigned t = 0; t < nt; t++) {
        uint64_t lo = t * chunk, hi = lo + chunk < n_bf ? lo + chunk : n_bf;
        if (lo >= hi) break;
        ts.emplace_back([=, &stage] { stage(lo, hi); });
      }
      for (auto &th : ts) th.join();
    } else {
      stage(0, n_bf);
    }
  }
  return 0;
}

// elementwise Montgomery product by one broadcast scalar
int bb_mul_scalar(uint64_t n, const uint32_t *a, uint32_t s, uint32_t *out) {
  if (!P_) return -1;
  parallel_work(n, 1, [&](uint64_t lo, uint64_t hi) {
    for (uint64_t i = lo; i < hi; i++) out[i] = mont_mul(a[i], s);
  });
  return 0;
}

// Broadcast products over an (rows, cols) row-major matrix. These cover
// the prover's numpy-broadcast hot patterns that the same-shape kernel
// above can't take: per-row scaling (coset LDE twiddle scale, logUp
// column-times-multiplicity), per-column scaling, and outer products
// (base column times ext power ladder in logUp fingerprints).

// out[i,j] = a[i,j] * b[i]
int bb_mul_rows(uint64_t rows, uint64_t cols, const uint32_t *a,
                const uint32_t *b, uint32_t *out) {
  if (!P_) return -1;
  parallel_work(rows, cols, [&](uint64_t lo, uint64_t hi) {
    for (uint64_t i = lo; i < hi; i++) {
      uint32_t s = b[i];
      const uint32_t *arow = a + i * cols;
      uint32_t *orow = out + i * cols;
      for (uint64_t j = 0; j < cols; j++) orow[j] = mont_mul(arow[j], s);
    }
  });
  return 0;
}

// out[i,j] = a[i,j] * b[j]
int bb_mul_cols(uint64_t rows, uint64_t cols, const uint32_t *a,
                const uint32_t *b, uint32_t *out) {
  if (!P_) return -1;
  parallel_work(rows, cols, [&](uint64_t lo, uint64_t hi) {
    for (uint64_t i = lo; i < hi; i++) {
      const uint32_t *arow = a + i * cols;
      uint32_t *orow = out + i * cols;
      for (uint64_t j = 0; j < cols; j++)
        orow[j] = mont_mul(arow[j], b[j]);
    }
  });
  return 0;
}

// out[i,j] = a[i] * b[j]
int bb_mul_outer(uint64_t rows, uint64_t cols, const uint32_t *a,
                 const uint32_t *b, uint32_t *out) {
  if (!P_) return -1;
  parallel_work(rows, cols, [&](uint64_t lo, uint64_t hi) {
    for (uint64_t i = lo; i < hi; i++) {
      uint32_t s = a[i];
      uint32_t *orow = out + i * cols;
      for (uint64_t j = 0; j < cols; j++) orow[j] = mont_mul(s, b[j]);
    }
  });
  return 0;
}

// Exact modular matmul of Montgomery operands, Montgomery result:
// out[i,j] = (sum_k a[i,k] * b[k,j]) * R^{-1} mod p — the native twin of
// fields/babybear.py::mont_matmul_np (DEEP batch combination, OOD poly
// evaluation; ncols is 4 on both call sites). Row products accumulate
// exactly in unsigned __int128 (each term < 2^62, k <= 2^21 => < 2^83),
// one 128-bit reduction + one REDC per output element.
int bb_mont_matmul(uint64_t m, uint64_t k, uint64_t ncols, const uint32_t *a,
                   const uint32_t *b, uint32_t *out) {
  if (!P_ || ncols == 0 || ncols > 64 || k > (1ull << 21)) return -1;
  unsigned hw = std::thread::hardware_concurrency();
  uint64_t work = m * k * ncols;
  unsigned nt = (hw < 2 || m < 2 || work < (1u << 15)) ? 1
                : (hw < 8 ? hw : 8);
  if (nt > m) nt = (unsigned)m;
  auto rows_fn = [&](uint64_t lo, uint64_t hi) {
    unsigned __int128 acc[64];
    for (uint64_t i = lo; i < hi; i++) {
      for (uint64_t j = 0; j < ncols; j++) acc[j] = 0;
      const uint32_t *arow = a + i * k;
      for (uint64_t kk = 0; kk < k; kk++) {
        uint64_t av = arow[kk];
        const uint32_t *brow = b + kk * ncols;
        for (uint64_t j = 0; j < ncols; j++) acc[j] += av * brow[j];
      }
      uint32_t *orow = out + i * ncols;
      for (uint64_t j = 0; j < ncols; j++) {
        uint32_t t = (uint32_t)(uint64_t)(acc[j] % P_);
        orow[j] = mont_mul(t, 1u);  // strip one R: R^2*x -> R*x
      }
    }
  };
  if (nt <= 1) {
    rows_fn(0, m);
  } else {
    std::vector<std::thread> ts;
    uint64_t chunk = (m + nt - 1) / nt;
    for (unsigned t = 0; t < nt; t++) {
      uint64_t lo = t * chunk, hi = lo + chunk < m ? lo + chunk : m;
      if (lo >= hi) break;
      ts.emplace_back([=, &rows_fn] { rows_fn(lo, hi); });
    }
    for (auto &th : ts) th.join();
  }
  return 0;
}

// quartic-extension product modulo x^4 - w (w Montgomery), (n, 4) lanes
int ext4_mul_arrays(uint64_t n, const uint32_t *a, const uint32_t *b,
                    uint32_t w, uint32_t *out) {
  if (!P_) return -1;
  parallel_work(n, 12, [&](uint64_t lo, uint64_t hi) {
    for (uint64_t i = lo; i < hi; i++) {
      const uint32_t *x = a + 4 * i;
      const uint32_t *y = b + 4 * i;
      uint32_t *o = out + 4 * i;
      uint32_t c0 = add_p(mont_mul(x[0], y[0]),
                          mont_mul(w, add_p(add_p(mont_mul(x[1], y[3]),
                                                  mont_mul(x[2], y[2])),
                                            mont_mul(x[3], y[1]))));
      uint32_t c1 = add_p(add_p(mont_mul(x[0], y[1]),
                                mont_mul(x[1], y[0])),
                          mont_mul(w, add_p(mont_mul(x[2], y[3]),
                                            mont_mul(x[3], y[2]))));
      uint32_t c2 = add_p(add_p(mont_mul(x[0], y[2]),
                                mont_mul(x[1], y[1])),
                          add_p(mont_mul(x[2], y[0]),
                                mont_mul(w, mont_mul(x[3], y[3]))));
      uint32_t c3 = add_p(add_p(mont_mul(x[0], y[3]),
                                mont_mul(x[1], y[2])),
                          add_p(mont_mul(x[2], y[1]),
                                mont_mul(x[3], y[0])));
      o[0] = c0;
      o[1] = c1;
      o[2] = c2;
      o[3] = c3;
    }
  });
  return 0;
}

}  // extern "C"
