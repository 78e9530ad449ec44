// rv32im.cpp — RV32IM interpreter with execution-record emission.
//
// TPU-native replacement for the reference's VM executor layer (openvm-circuit
// RISC-V executor + metered execution, used at
// /root/reference/crates/prover/src/utils/vm.rs:13-48). Execution and trace
// generation are host-side by design (SURVEY.md §2.2: "trace gen is
// sequential & branchy — not a TPU kernel"); this library executes guest
// programs and emits flat per-cycle records that the Python side converts
// into AIR trace matrices for TPU proving.
//
// Exposed as a C API consumed via ctypes (no pybind11 in the image).
//
// Machine model:
//   - RV32IM (no CSR/fence/ecall beyond the syscalls below)
//   - byte-addressable little-endian memory, sparse 4 KiB pages
//   - syscalls via ECALL, a7 selects:
//       0 = HALT (a0 = exit code)
//       1 = HINT_READ: read next hint byte stream word into a0 (from the
//           host-provided hint buffer; the openvm hint-stream analog)
//       2 = REVEAL: public_values[a1] = a0 (indexed, openvm reveal analog)
//       3 = KECCAK256: digest of mem[a0 .. a0+a1) written to mem[a2 .. a2+32)
//           (the openvm keccak extension analog; proven by KeccakVmAir +
//           KeccakfAir on the AIR side)
//       4 = MODOP: mem[a0..+32) = mem[a1..+32) (op) mem[a2..+32) mod M,
//           a3 = op*16 + modulus index (op: 0 mul, 1 add, 2 sub; moduli =
//           BigIntModMulAir.SUPPORTED_MODULI — the openvm modular/bigint
//           extension analog)
//       5 = EC_ADD: mem[a0..+64) = affine P+Q for mem[a1..+64), mem[a2..+64),
//           a3 = base-field modulus index (openvm ecc extension analog;
//           distinct-x adds only — x1 == x2 traps)
//       6 = SHA256: digest of mem[a0 .. a0+a1) written to mem[a2 .. a2+32)
//           (the openvm sha256 extension analog; proven by Sha256Air)
//       7 = EC_DOUBLE: mem[a0..+64) = affine 2*P for mem[a1..+64), a3 =
//           base-field modulus index (a = 0 curves only: P-256 rejected;
//           y == 0 traps — proven by EcDoubleVmAir + EcDoubleAir)
//   - segmentation: execution stops after `max_cycles` with state
//     PAUSED so the host can snapshot boundary state (continuations).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint32_t PAGE_BITS = 12;
constexpr uint32_t PAGE_SIZE = 1u << PAGE_BITS;

struct ExecRecord {
  uint32_t pc;
  uint32_t instr;
  uint32_t rs1_val;
  uint32_t rs2_val;
  uint32_t rd_val;   // value written to rd (0 if none)
  uint32_t mem_addr; // effective address for loads/stores (else 0)
  uint32_t mem_val;  // value loaded/stored (else 0)
};

struct Machine {
  uint32_t regs[32] = {0};
  uint32_t pc = 0;
  std::unordered_map<uint32_t, std::vector<uint8_t>> pages;
  std::vector<ExecRecord> records;
  // Continuations support: first-touch old values of word-aligned addresses
  // accessed since the last vm_begin_segment (openvm persistent-memory
  // boundary analog; SURVEY.md §2.3 "segment parallelism").
  std::unordered_map<uint32_t, uint32_t> touched;
  std::vector<uint32_t> touched_order;
  bool track_touched = false;
  std::vector<uint32_t> public_values;
  std::vector<uint8_t> hints;
  size_t hint_pos = 0;
  uint64_t cycles = 0;
  int state = 0; // 0 running, 1 halted, 2 paused, 3 trapped
  uint32_t exit_code = 0;
  bool record_trace = true;

  uint8_t *page(uint32_t addr) {
    auto &p = pages[addr >> PAGE_BITS];
    if (p.empty()) p.resize(PAGE_SIZE, 0);
    return p.data();
  }
  uint8_t load8(uint32_t a) { return page(a)[a & (PAGE_SIZE - 1)]; }
  void store8(uint32_t a, uint8_t v) { page(a)[a & (PAGE_SIZE - 1)] = v; }
  uint32_t load32(uint32_t a) {
    if ((a & (PAGE_SIZE - 1)) <= PAGE_SIZE - 4) {
      uint8_t *p = page(a);
      uint32_t off = a & (PAGE_SIZE - 1);
      uint32_t v;
      std::memcpy(&v, p + off, 4);
      return v;
    }
    return load8(a) | (load8(a + 1) << 8) | (load8(a + 2) << 16) |
           ((uint32_t)load8(a + 3) << 24);
  }
  uint16_t load16(uint32_t a) {
    return load8(a) | ((uint16_t)load8(a + 1) << 8);
  }
  void store32(uint32_t a, uint32_t v) {
    for (int i = 0; i < 4; i++) store8(a + i, (v >> (8 * i)) & 0xff);
  }
  void store16(uint32_t a, uint16_t v) {
    store8(a, v & 0xff);
    store8(a + 1, v >> 8);
  }
  // Record the pre-segment value of the word(s) covering [a, a+size).
  void touch(uint32_t a, uint32_t size) {
    if (!track_touched) return;
    uint32_t first = a & ~3u, last = (a + size - 1) & ~3u;
    for (uint32_t w = first;; w += 4) {
      if (touched.emplace(w, load32(w)).second) touched_order.push_back(w);
      if (w == last) break;
    }
  }
};

inline int32_t sext(uint32_t v, int bits) {
  int shift = 32 - bits;
  return ((int32_t)(v << shift)) >> shift;
}

// ---- keccak-256 (Ethereum padding 0x01...0x80), for the a7=3 syscall ----
constexpr uint64_t KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};
constexpr int KECCAK_ROT[5][5] = {{0, 36, 3, 41, 18},
                                  {1, 44, 10, 45, 2},
                                  {62, 6, 43, 15, 61},
                                  {28, 55, 25, 21, 56},
                                  {27, 20, 39, 8, 14}};

inline uint64_t rotl64(uint64_t v, int n) {
  return n ? ((v << n) | (v >> (64 - n))) : v;
}

void keccak_f1600(uint64_t a[25]) {
  for (int r = 0; r < 24; r++) {
    uint64_t c[5], d[5], b[25];
    for (int x = 0; x < 5; x++)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; x++)
      d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
    for (int i = 0; i < 25; i++) a[i] ^= d[i % 5];
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl64(a[x + 5 * y],
                                                  KECCAK_ROT[x][y]);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        a[x + 5 * y] =
            b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
    a[0] ^= KECCAK_RC[r];
  }
}

void keccak256(const uint8_t *msg, size_t len, uint8_t out[32]) {
  constexpr size_t RATE = 136;
  uint64_t state[25] = {0};
  size_t nblocks = len / RATE + 1;
  for (size_t blk = 0; blk < nblocks; blk++) {
    uint8_t block[RATE] = {0};
    size_t off = blk * RATE;
    size_t take = (off < len) ? ((len - off < RATE) ? len - off : RATE) : 0;
    std::memcpy(block, msg + off, take);
    if (blk == nblocks - 1) {
      block[take] ^= 0x01;
      block[RATE - 1] ^= 0x80;
    }
    for (size_t i = 0; i < RATE; i++)
      state[i / 8] ^= ((uint64_t)block[i]) << (8 * (i % 8));
    keccak_f1600(state);
  }
  for (int i = 0; i < 32; i++) out[i] = (state[i / 8] >> (8 * (i % 8))) & 0xff;
}

// ---- 256-bit modular arithmetic, for the a7=4/5 syscalls ----------------
// Operands are 8 x uint32 little-endian limbs (guest memory layout). The
// AIR-side analogs are BigIntModMulAir / EcAddAir (models/bigint_air.py,
// models/ec_air.py); this emulator mirrors openvm's intrinsic behavior
// (reference: crates/circuits/chunk-circuit/openvm.toml modular/ecc
// extensions).

struct U256 {
  uint32_t w[8] = {0};
};

int u256_cmp(const U256 &a, const U256 &b) {
  for (int i = 7; i >= 0; i--) {
    if (a.w[i] != b.w[i]) return a.w[i] < b.w[i] ? -1 : 1;
  }
  return 0;
}

bool u256_is_zero(const U256 &a) {
  for (int i = 0; i < 8; i++)
    if (a.w[i]) return false;
  return true;
}

// a += b, returns carry-out
uint32_t u256_add(U256 &a, const U256 &b) {
  uint64_t c = 0;
  for (int i = 0; i < 8; i++) {
    c += (uint64_t)a.w[i] + b.w[i];
    a.w[i] = (uint32_t)c;
    c >>= 32;
  }
  return (uint32_t)c;
}

// a -= b, returns borrow-out
uint32_t u256_sub(U256 &a, const U256 &b) {
  int64_t c = 0;
  for (int i = 0; i < 8; i++) {
    c += (int64_t)a.w[i] - b.w[i];
    a.w[i] = (uint32_t)c;
    c >>= 32;
  }
  return (uint32_t)(-c);
}

// 512-bit product, little-endian 16 limbs
void u256_mul(const U256 &a, const U256 &b, uint32_t out[16]) {
  std::memset(out, 0, 16 * sizeof(uint32_t));
  for (int i = 0; i < 8; i++) {
    uint64_t carry = 0;
    for (int j = 0; j < 8; j++) {
      uint64_t t = (uint64_t)a.w[i] * b.w[j] + out[i + j] + carry;
      out[i + j] = (uint32_t)t;
      carry = t >> 32;
    }
    out[i + 8] = (uint32_t)carry;
  }
}

// wide (nw limbs) mod m via binary shift-subtract; m != 0
U256 uwide_mod(const uint32_t *wide, int nw, const U256 &m) {
  U256 r;
  for (int bit = nw * 32 - 1; bit >= 0; bit--) {
    // r = (r << 1) | bit
    uint32_t carry = 0;
    for (int i = 0; i < 8; i++) {
      uint32_t nc = r.w[i] >> 31;
      r.w[i] = (r.w[i] << 1) | carry;
      carry = nc;
    }
    r.w[0] |= (wide[bit / 32] >> (bit % 32)) & 1;
    if (carry || u256_cmp(r, m) >= 0) u256_sub(r, m);
  }
  return r;
}

U256 u256_modmul(const U256 &a, const U256 &b, const U256 &m) {
  uint32_t wide[16];
  u256_mul(a, b, wide);
  return uwide_mod(wide, 16, m);
}

U256 u256_modadd(const U256 &a, const U256 &b, const U256 &m) {
  U256 r = a;
  uint32_t carry = u256_add(r, b);
  if (carry || u256_cmp(r, m) >= 0) u256_sub(r, m);
  return r;
}

U256 u256_modsub(const U256 &a, const U256 &b, const U256 &m) {
  U256 r = a;
  if (u256_sub(r, b)) u256_add(r, m);  // borrow: wrap by +m
  return r;
}

// modular inverse via extended binary GCD (m odd prime, a != 0 mod m)
U256 u256_modinv(const U256 &a0, const U256 &m) {
  U256 u = a0, v = m, x1, x2;
  x1.w[0] = 1;
  auto halve = [&m](U256 &x) {
    uint32_t carry = 0;
    if (x.w[0] & 1) carry = u256_add(x, m);
    for (int i = 0; i < 8; i++) {
      uint32_t hi = (i < 7 ? x.w[i + 1] : carry) & 1;
      x.w[i] = (x.w[i] >> 1) | (hi << 31);
    }
  };
  while (!u256_is_zero(u) && !u256_is_zero(v)) {
    while (!(u.w[0] & 1) && !u256_is_zero(u)) {
      for (int i = 0; i < 8; i++)
        u.w[i] = (u.w[i] >> 1) | ((i < 7 ? u.w[i + 1] : 0) & 1) << 31;
      halve(x1);
    }
    while (!(v.w[0] & 1) && !u256_is_zero(v)) {
      for (int i = 0; i < 8; i++)
        v.w[i] = (v.w[i] >> 1) | ((i < 7 ? v.w[i + 1] : 0) & 1) << 31;
      halve(x2);
    }
    if (u256_cmp(u, v) >= 0) {
      u256_sub(u, v);
      if (u256_sub(x1, x2)) u256_add(x1, m);
    } else {
      u256_sub(v, u);
      if (u256_sub(x2, x1)) u256_add(x2, m);
    }
  }
  return u256_is_zero(u) ? x2 : x1;
}

// The six supported moduli (BigIntModMulAir.SUPPORTED_MODULI order):
// BN254 Fq/Fr, secp256k1 Fp/Fn, P-256 Fp/Fn — big-endian byte strings.
constexpr uint8_t SUPPORTED_MODULI_BE[6][32] = {
    {0x30, 0x64, 0x4e, 0x72, 0xe1, 0x31, 0xa0, 0x29, 0xb8, 0x50, 0x45,
     0xb6, 0x81, 0x81, 0x58, 0x5d, 0x97, 0x81, 0x6a, 0x91, 0x68, 0x71,
     0xca, 0x8d, 0x3c, 0x20, 0x8c, 0x16, 0xd8, 0x7c, 0xfd, 0x47},
    {0x30, 0x64, 0x4e, 0x72, 0xe1, 0x31, 0xa0, 0x29, 0xb8, 0x50, 0x45,
     0xb6, 0x81, 0x81, 0x58, 0x5d, 0x28, 0x33, 0xe8, 0x48, 0x79, 0xb9,
     0x70, 0x91, 0x43, 0xe1, 0xf5, 0x93, 0xf0, 0x00, 0x00, 0x01},
    {0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
     0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
     0xff, 0xff, 0xff, 0xff, 0xff, 0xfe, 0xff, 0xff, 0xfc, 0x2f},
    {0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
     0xff, 0xff, 0xff, 0xff, 0xfe, 0xba, 0xae, 0xdc, 0xe6, 0xaf, 0x48,
     0xa0, 0x3b, 0xbf, 0xd2, 0x5e, 0x8c, 0xd0, 0x36, 0x41, 0x41},
    {0xff, 0xff, 0xff, 0xff, 0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00,
     0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0xff,
     0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff},
    {0xff, 0xff, 0xff, 0xff, 0x00, 0x00, 0x00, 0x00, 0xff, 0xff, 0xff,
     0xff, 0xff, 0xff, 0xff, 0xff, 0xbc, 0xe6, 0xfa, 0xad, 0xa7, 0x17,
     0x9e, 0x84, 0xf3, 0xb9, 0xca, 0xc2, 0xfc, 0x63, 0x25, 0x51},
};

U256 modulus_by_index(uint32_t idx) {
  U256 m;
  const uint8_t *be = SUPPORTED_MODULI_BE[idx % 6];
  for (int i = 0; i < 32; i++) m.w[(31 - i) / 4] |= ((uint32_t)be[i]) << (8 * ((31 - i) % 4));
  return m;
}

// ---- SHA-256 compression, for the a7=6 syscall --------------------------
constexpr uint32_t SHA256_K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

inline uint32_t rotr32(uint32_t v, int n) { return (v >> n) | (v << (32 - n)); }

void sha256_compress(uint32_t h[8], const uint8_t block[64]) {
  uint32_t w[64];
  for (int i = 0; i < 16; i++)
    w[i] = ((uint32_t)block[4 * i] << 24) | ((uint32_t)block[4 * i + 1] << 16) |
           ((uint32_t)block[4 * i + 2] << 8) | block[4 * i + 3];
  for (int i = 16; i < 64; i++) {
    uint32_t s0 = rotr32(w[i - 15], 7) ^ rotr32(w[i - 15], 18) ^ (w[i - 15] >> 3);
    uint32_t s1 = rotr32(w[i - 2], 17) ^ rotr32(w[i - 2], 19) ^ (w[i - 2] >> 10);
    w[i] = w[i - 16] + s0 + w[i - 7] + s1;
  }
  uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4], f = h[5],
           g = h[6], hh = h[7];
  for (int i = 0; i < 64; i++) {
    uint32_t S1 = rotr32(e, 6) ^ rotr32(e, 11) ^ rotr32(e, 25);
    uint32_t ch = (e & f) ^ (~e & g);
    uint32_t t1 = hh + S1 + ch + SHA256_K[i] + w[i];
    uint32_t S0 = rotr32(a, 2) ^ rotr32(a, 13) ^ rotr32(a, 22);
    uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
    uint32_t t2 = S0 + maj;
    hh = g; g = f; f = e; e = d + t1; d = c; c = b; b = a; a = t1 + t2;
  }
  h[0] += a; h[1] += b; h[2] += c; h[3] += d;
  h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
}

void sha256(const uint8_t *msg, size_t len, uint8_t out[32]) {
  uint32_t h[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                   0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
  uint64_t bitlen = (uint64_t)len * 8;
  size_t full = len / 64;
  for (size_t i = 0; i < full; i++) sha256_compress(h, msg + 64 * i);
  uint8_t last[128] = {0};
  size_t rem = len - full * 64;
  std::memcpy(last, msg + full * 64, rem);
  last[rem] = 0x80;
  size_t total = (rem + 9 <= 64) ? 64 : 128;
  for (int i = 0; i < 8; i++)
    last[total - 1 - i] = (bitlen >> (8 * i)) & 0xff;
  sha256_compress(h, last);
  if (total == 128) sha256_compress(h, last + 64);
  for (int i = 0; i < 8; i++)
    for (int j = 0; j < 4; j++) out[4 * i + j] = (h[i] >> (24 - 8 * j)) & 0xff;
}

// Execute one instruction; returns false if execution should stop.
bool step(Machine &m) {
  uint32_t instr = m.load32(m.pc);
  uint32_t opcode = instr & 0x7f;
  uint32_t rd = (instr >> 7) & 0x1f;
  uint32_t funct3 = (instr >> 12) & 0x7;
  uint32_t rs1 = (instr >> 15) & 0x1f;
  uint32_t rs2 = (instr >> 20) & 0x1f;
  uint32_t funct7 = (instr >> 25) & 0x7f;

  uint32_t a = m.regs[rs1];
  uint32_t b = m.regs[rs2];
  uint32_t next_pc = m.pc + 4;
  uint32_t rd_val = 0;
  bool write_rd = false;
  uint32_t mem_addr = 0, mem_val = 0;

  switch (opcode) {
    case 0x37: // LUI
      rd_val = instr & 0xfffff000u;
      write_rd = true;
      break;
    case 0x17: // AUIPC
      rd_val = m.pc + (instr & 0xfffff000u);
      write_rd = true;
      break;
    case 0x6f: { // JAL
      int32_t imm = (int32_t)(((instr >> 31) << 20) |
                              (((instr >> 12) & 0xff) << 12) |
                              (((instr >> 20) & 1) << 11) |
                              (((instr >> 21) & 0x3ff) << 1));
      imm = sext((uint32_t)imm, 21);
      rd_val = next_pc;
      write_rd = true;
      next_pc = m.pc + imm;
      break;
    }
    case 0x67: { // JALR
      int32_t imm = sext(instr >> 20, 12);
      rd_val = next_pc;
      write_rd = true;
      next_pc = (a + imm) & ~1u;
      break;
    }
    case 0x63: { // branches
      int32_t imm = (int32_t)(((instr >> 31) << 12) |
                              (((instr >> 7) & 1) << 11) |
                              (((instr >> 25) & 0x3f) << 5) |
                              (((instr >> 8) & 0xf) << 1));
      imm = sext((uint32_t)imm, 13);
      bool take = false;
      switch (funct3) {
        case 0: take = a == b; break;
        case 1: take = a != b; break;
        case 4: take = (int32_t)a < (int32_t)b; break;
        case 5: take = (int32_t)a >= (int32_t)b; break;
        case 6: take = a < b; break;
        case 7: take = a >= b; break;
        default: m.state = 3; return false;
      }
      if (take) next_pc = m.pc + imm;
      break;
    }
    case 0x03: { // loads
      int32_t imm = sext(instr >> 20, 12);
      mem_addr = a + imm;
      m.touch(mem_addr, funct3 == 2 ? 4 : (funct3 == 1 || funct3 == 5) ? 2 : 1);
      switch (funct3) {
        case 0: mem_val = (uint32_t)(int32_t)(int8_t)m.load8(mem_addr); break;
        case 1: mem_val = (uint32_t)(int32_t)(int16_t)m.load16(mem_addr); break;
        case 2: mem_val = m.load32(mem_addr); break;
        case 4: mem_val = m.load8(mem_addr); break;
        case 5: mem_val = m.load16(mem_addr); break;
        default: m.state = 3; return false;
      }
      rd_val = mem_val;
      write_rd = true;
      break;
    }
    case 0x23: { // stores
      int32_t imm = sext(((instr >> 25) << 5) | ((instr >> 7) & 0x1f), 12);
      mem_addr = a + imm;
      mem_val = b;
      m.touch(mem_addr, funct3 == 2 ? 4 : funct3 == 1 ? 2 : 1);
      switch (funct3) {
        case 0: m.store8(mem_addr, b & 0xff); break;
        case 1: m.store16(mem_addr, b & 0xffff); break;
        case 2: m.store32(mem_addr, b); break;
        default: m.state = 3; return false;
      }
      break;
    }
    case 0x13: { // OP-IMM
      int32_t imm = sext(instr >> 20, 12);
      uint32_t shamt = (instr >> 20) & 0x1f;
      switch (funct3) {
        case 0: rd_val = a + imm; break;
        case 2: rd_val = (int32_t)a < imm; break;
        case 3: rd_val = a < (uint32_t)imm; break;
        case 4: rd_val = a ^ imm; break;
        case 6: rd_val = a | imm; break;
        case 7: rd_val = a & imm; break;
        case 1: rd_val = a << shamt; break;
        case 5:
          rd_val = (funct7 & 0x20) ? (uint32_t)((int32_t)a >> shamt)
                                   : (a >> shamt);
          break;
        default: m.state = 3; return false;
      }
      write_rd = true;
      break;
    }
    case 0x33: { // OP
      if (funct7 == 1) { // RV32M
        switch (funct3) {
          case 0: rd_val = a * b; break;
          case 1: rd_val = (uint32_t)(((int64_t)(int32_t)a * (int64_t)(int32_t)b) >> 32); break;
          case 2: rd_val = (uint32_t)(((int64_t)(int32_t)a * (uint64_t)b) >> 32); break;
          case 3: rd_val = (uint32_t)(((uint64_t)a * (uint64_t)b) >> 32); break;
          case 4: // DIV
            rd_val = b == 0 ? 0xffffffffu
                     : (a == 0x80000000u && b == 0xffffffffu)
                         ? 0x80000000u
                         : (uint32_t)((int32_t)a / (int32_t)b);
            break;
          case 5: rd_val = b == 0 ? 0xffffffffu : a / b; break;
          case 6: // REM
            rd_val = b == 0 ? a
                     : (a == 0x80000000u && b == 0xffffffffu)
                         ? 0
                         : (uint32_t)((int32_t)a % (int32_t)b);
            break;
          case 7: rd_val = b == 0 ? a : a % b; break;
        }
      } else {
        switch (funct3) {
          case 0: rd_val = (funct7 & 0x20) ? a - b : a + b; break;
          case 1: rd_val = a << (b & 0x1f); break;
          case 2: rd_val = (int32_t)a < (int32_t)b; break;
          case 3: rd_val = a < b; break;
          case 4: rd_val = a ^ b; break;
          case 5:
            rd_val = (funct7 & 0x20) ? (uint32_t)((int32_t)a >> (b & 0x1f))
                                     : (a >> (b & 0x1f));
            break;
          case 6: rd_val = a | b; break;
          case 7: rd_val = a & b; break;
        }
      }
      write_rd = true;
      break;
    }
    case 0x73: { // ECALL — syscalls
      uint32_t a7 = m.regs[17];
      uint32_t a0 = m.regs[10];
      if (a7 == 0) { // HALT
        m.state = 1;
        m.exit_code = a0;
      } else if (a7 == 1) { // HINT_READ word
        uint32_t v = 0;
        for (int i = 0; i < 4 && m.hint_pos < m.hints.size(); i++)
          v |= ((uint32_t)m.hints[m.hint_pos++]) << (8 * i);
        rd_val = v;
        rd = 10; // write into a0
        write_rd = true;
      } else if (a7 == 2) { // REVEAL: public_values[a1] = a0
        uint32_t idx = m.regs[11];
        if (idx >= m.public_values.size())
          m.public_values.resize(idx + 1, 0);
        m.public_values[idx] = a0;
      } else if (a7 == 3) { // KECCAK256(mem[a0..a0+a1)) -> mem[a2..a2+32)
        uint32_t ptr = a0, len = m.regs[11], out_ptr = m.regs[12];
        std::vector<uint8_t> msg(len);
        if (len) m.touch(ptr, len);
        for (uint32_t i = 0; i < len; i++) msg[i] = m.load8(ptr + i);
        uint8_t digest[32];
        keccak256(msg.data(), len, digest);
        m.touch(out_ptr, 32);
        for (int i = 0; i < 32; i++) m.store8(out_ptr + i, digest[i]);
      } else if (a7 == 4) { // MODOP: mem[a0..+32) = x (op) y mod M[sel]
        // a1 = x ptr, a2 = y ptr, a3 = sel = op*16 + modulus_idx
        // (op: 0 mul, 1 add, 2 sub) — proven by ModularVmAir+BigIntModMulAir
        uint32_t rd_ptr = a0, xp = m.regs[11], yp = m.regs[12];
        uint32_t sel = m.regs[13];
        // trap on out-of-range selectors (modulus idx 0..5, op 0..3):
        // silently wrapping would diverge from fill_modop_row's asserts
        if ((sel & 15) >= 6 || (sel >> 4) > 3) { m.state = 3; return false; }
        U256 x, y;
        m.touch(xp, 32); m.touch(yp, 32);
        for (int i = 0; i < 8; i++) x.w[i] = m.load32(xp + 4 * i);
        for (int i = 0; i < 8; i++) y.w[i] = m.load32(yp + 4 * i);
        U256 mod = modulus_by_index(sel & 15);
        uint32_t op = sel >> 4;
        U256 r;
        if (op == 3) { // MODDIV: trap on y == 0 (mod m)
          U256 one{}; one.w[0] = 1;
          U256 yr = u256_modmul(y, one, mod); // full reduction
          if (u256_is_zero(yr)) { m.state = 3; return false; }
          r = u256_modmul(x, u256_modinv(yr, mod), mod);
        } else {
          r = op == 0   ? u256_modmul(x, y, mod)
              : op == 1 ? u256_modadd(x, y, mod)
                        : u256_modsub(x, y, mod);
        }
        m.touch(rd_ptr, 32);
        for (int i = 0; i < 8; i++) m.store32(rd_ptr + 4 * i, r.w[i]);
      } else if (a7 == 5) { // EC_ADD: mem[a0..+64) = P + Q (affine, x1!=x2)
        // a1 = P ptr (x||y, 8+8 words), a2 = Q ptr, a3 = base-field
        // modulus idx — proven by EcVmAir+EcAddAir (chord law; traps on
        // x1 == x2, matching the AIR's distinct-x-only soundness domain)
        uint32_t rd_ptr = a0, pp = m.regs[11], qp = m.regs[12];
        uint32_t sel = m.regs[13];
        if ((sel & 15) >= 6) { m.state = 3; return false; }
        U256 x1, y1, x2, y2;
        m.touch(pp, 64); m.touch(qp, 64);
        for (int i = 0; i < 8; i++) x1.w[i] = m.load32(pp + 4 * i);
        for (int i = 0; i < 8; i++) y1.w[i] = m.load32(pp + 32 + 4 * i);
        for (int i = 0; i < 8; i++) x2.w[i] = m.load32(qp + 4 * i);
        for (int i = 0; i < 8; i++) y2.w[i] = m.load32(qp + 32 + 4 * i);
        U256 mod = modulus_by_index(sel & 15);
        U256 dx = u256_modsub(x2, x1, mod);
        if (u256_is_zero(dx)) { m.state = 3; return false; }
        U256 lam = u256_modmul(u256_modsub(y2, y1, mod),
                               u256_modinv(dx, mod), mod);
        U256 x3 = u256_modsub(u256_modsub(u256_modmul(lam, lam, mod),
                                          x1, mod), x2, mod);
        U256 y3 = u256_modsub(u256_modmul(lam, u256_modsub(x1, x3, mod), mod),
                              y1, mod);
        m.touch(rd_ptr, 64);
        for (int i = 0; i < 8; i++) m.store32(rd_ptr + 4 * i, x3.w[i]);
        for (int i = 0; i < 8; i++) m.store32(rd_ptr + 32 + 4 * i, y3.w[i]);
      } else if (a7 == 9) { // FP2: mem[a0..+64) = x (op) y in Fp[u]/(u^2+1)
        // a1 = x ptr (c0||c1, 16 words), a2 = y ptr, a3 = op*16 + mod idx
        // (op: 0 mul, 1 add, 2 sub) — proven by Fp2VmAir+BigIntModMulAir
        uint32_t rd_ptr = a0, xp = m.regs[11], yp = m.regs[12];
        uint32_t sel = m.regs[13];
        if ((sel & 15) >= 6 || (sel >> 4) > 2) { m.state = 3; return false; }
        U256 x0, x1, y0, y1;
        m.touch(xp, 64); m.touch(yp, 64);
        for (int i = 0; i < 8; i++) x0.w[i] = m.load32(xp + 4 * i);
        for (int i = 0; i < 8; i++) x1.w[i] = m.load32(xp + 32 + 4 * i);
        for (int i = 0; i < 8; i++) y0.w[i] = m.load32(yp + 4 * i);
        for (int i = 0; i < 8; i++) y1.w[i] = m.load32(yp + 32 + 4 * i);
        U256 mod = modulus_by_index(sel & 15);
        uint32_t op = sel >> 4;
        U256 r0, r1;
        if (op == 0) { // (x0 + x1 u)(y0 + y1 u), u^2 = -1
          r0 = u256_modsub(u256_modmul(x0, y0, mod),
                           u256_modmul(x1, y1, mod), mod);
          r1 = u256_modadd(u256_modmul(x0, y1, mod),
                           u256_modmul(x1, y0, mod), mod);
        } else if (op == 1) {
          r0 = u256_modadd(x0, y0, mod);
          r1 = u256_modadd(x1, y1, mod);
        } else {
          r0 = u256_modsub(x0, y0, mod);
          r1 = u256_modsub(x1, y1, mod);
        }
        m.touch(rd_ptr, 64);
        for (int i = 0; i < 8; i++) m.store32(rd_ptr + 4 * i, r0.w[i]);
        for (int i = 0; i < 8; i++) m.store32(rd_ptr + 32 + 4 * i, r1.w[i]);
      } else if (a7 == 8) { // DEFER: bind mem[a0..+64) (vk dig || pi dig)
        // to the deferral accumulator — no output; DeferralVmAir proves
        // the sponge absorption (deferred child verification is
        // discharged by a separate aggregation proof, host/prover.py)
        m.touch(a0, 64);
        for (int i = 0; i < 16; i++) (void)m.load32(a0 + 4 * i);
      } else if (a7 == 7) { // EC_DOUBLE: mem[a0..+64) = 2*P (a=0 tangent)
        // a1 = P ptr (x||y), a3 = base-field modulus idx (not P-256) —
        // proven by EcDoubleVmAir+EcDoubleAir; traps on y == 0
        uint32_t rd_ptr = a0, pp = m.regs[11];
        uint32_t sel = m.regs[13];
        if ((sel & 15) >= 6) { m.state = 3; return false; }
        if ((sel & 15) == 4) { m.state = 3; return false; } // P-256: a != 0
        U256 x1, y1;
        m.touch(pp, 64);
        for (int i = 0; i < 8; i++) x1.w[i] = m.load32(pp + 4 * i);
        for (int i = 0; i < 8; i++) y1.w[i] = m.load32(pp + 32 + 4 * i);
        U256 mod = modulus_by_index(sel & 15);
        U256 two_y = u256_modadd(y1, y1, mod);
        if (u256_is_zero(two_y)) { m.state = 3; return false; }
        U256 x1sq = u256_modmul(x1, x1, mod);
        U256 num = u256_modadd(u256_modadd(x1sq, x1sq, mod), x1sq, mod);
        U256 lam = u256_modmul(num, u256_modinv(two_y, mod), mod);
        U256 x3 = u256_modsub(u256_modsub(u256_modmul(lam, lam, mod),
                                          x1, mod), x1, mod);
        U256 y3 = u256_modsub(u256_modmul(lam, u256_modsub(x1, x3, mod), mod),
                              y1, mod);
        m.touch(rd_ptr, 64);
        for (int i = 0; i < 8; i++) m.store32(rd_ptr + 4 * i, x3.w[i]);
        for (int i = 0; i < 8; i++) m.store32(rd_ptr + 32 + 4 * i, y3.w[i]);
      } else if (a7 == 6) { // SHA256(mem[a0..a0+a1)) -> mem[a2..a2+32)
        uint32_t ptr = a0, len = m.regs[11], out_ptr = m.regs[12];
        std::vector<uint8_t> msg(len);
        if (len) m.touch(ptr, len);
        for (uint32_t i = 0; i < len; i++) msg[i] = m.load8(ptr + i);
        uint8_t digest[32];
        sha256(msg.data(), len, digest);
        m.touch(out_ptr, 32);
        for (int i = 0; i < 32; i++) m.store8(out_ptr + i, digest[i]);
      } else {
        m.state = 3;
        return false;
      }
      break;
    }
    case 0x0f: // FENCE — nop
      break;
    default:
      m.state = 3;
      return false;
  }

  if (write_rd && rd != 0) m.regs[rd] = rd_val;

  if (m.record_trace) {
    ExecRecord r;
    r.pc = m.pc;
    r.instr = instr;
    r.rs1_val = a;
    r.rs2_val = b;
    r.rd_val = (write_rd && rd != 0) ? rd_val : 0;
    r.mem_addr = mem_addr;
    r.mem_val = mem_val;
    m.records.push_back(r);
  }

  m.pc = next_pc;
  m.cycles++;
  return m.state == 0;
}

}  // namespace

extern "C" {

Machine *vm_create() { return new Machine(); }
void vm_destroy(Machine *m) { delete m; }

void vm_set_record_trace(Machine *m, int on) { m->record_trace = on != 0; }

void vm_load_program(Machine *m, uint32_t addr, const uint8_t *data,
                     uint64_t len) {
  for (uint64_t i = 0; i < len; i++) m->store8(addr + (uint32_t)i, data[i]);
}

void vm_set_pc(Machine *m, uint32_t pc) { m->pc = pc; }
void vm_set_reg(Machine *m, uint32_t idx, uint32_t val) {
  if (idx > 0 && idx < 32) m->regs[idx] = val;
}
uint32_t vm_get_reg(Machine *m, uint32_t idx) {
  return idx < 32 ? m->regs[idx] : 0;
}
uint32_t vm_get_pc(Machine *m) { return m->pc; }

void vm_set_hints(Machine *m, const uint8_t *data, uint64_t len) {
  m->hints.assign(data, data + len);
  m->hint_pos = 0;
}

// Run until halt/trap or cycle budget; returns state
// (0 running/paused-at-budget, 1 halted, 3 trapped).
int vm_run(Machine *m, uint64_t max_cycles) {
  uint64_t start = m->cycles;
  while (m->state == 0 && (m->cycles - start) < max_cycles) {
    if (!step(*m)) break;
  }
  if (m->state == 0) m->state = 2;  // paused (segment boundary)
  int s = m->state;
  if (s == 2) m->state = 0;  // resumable
  return s;
}

uint64_t vm_cycles(const Machine *m) { return m->cycles; }
uint32_t vm_exit_code(const Machine *m) { return m->exit_code; }

uint64_t vm_num_records(const Machine *m) { return m->records.size(); }
// Copy records as a flat uint32 array [n][7].
void vm_copy_records(const Machine *m, uint32_t *out) {
  for (size_t i = 0; i < m->records.size(); i++) {
    const ExecRecord &r = m->records[i];
    out[i * 7 + 0] = r.pc;
    out[i * 7 + 1] = r.instr;
    out[i * 7 + 2] = r.rs1_val;
    out[i * 7 + 3] = r.rs2_val;
    out[i * 7 + 4] = r.rd_val;
    out[i * 7 + 5] = r.mem_addr;
    out[i * 7 + 6] = r.mem_val;
  }
}
void vm_clear_records(Machine *m) { m->records.clear(); }

// -- continuations: segment boundary state ---------------------------------
void vm_begin_segment(Machine *m) {
  m->records.clear();
  m->touched.clear();
  m->touched_order.clear();
  m->track_touched = true;
}
uint64_t vm_num_touched(const Machine *m) { return m->touched_order.size(); }
// out: triples (word_addr, old_val, new_val) in first-touch order.
void vm_copy_touched(Machine *m, uint32_t *out) {
  for (size_t i = 0; i < m->touched_order.size(); i++) {
    uint32_t a = m->touched_order[i];
    out[3 * i] = a;
    out[3 * i + 1] = m->touched.at(a);
    out[3 * i + 2] = m->load32(a);
  }
}

uint64_t vm_num_public_values(const Machine *m) {
  return m->public_values.size();
}
void vm_copy_public_values(const Machine *m, uint32_t *out) {
  for (size_t i = 0; i < m->public_values.size(); i++)
    out[i] = m->public_values[i];
}

uint32_t vm_load_mem32(Machine *m, uint32_t addr) { return m->load32(addr); }
void vm_store_mem32(Machine *m, uint32_t addr, uint32_t val) {
  m->store32(addr, val);
}

}  // extern "C"
