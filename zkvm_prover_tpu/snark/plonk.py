"""PLONK over BN254 with KZG commitments — the wrapper proof system.

The TPU-native analog of the reference's halo2 outer layer
(crates/prover/src/prover/mod.rs:419-432 gen_proof_evm; the halo2
C::Scalar = bn256::Fr circuit behind EvmProof). Independent implementation
of the standard PLONK protocol (Gabizon-Williamson-Ciobotaru) with two
deliberate shape choices:

- *Fully-opened* variant: instead of the paper's linearization polynomial,
  every committed polynomial (wires, permutation, quotient splits) plus the
  verifier-key polynomials (selectors, sigmas) is opened at the evaluation
  point and the verifier checks the quotient identity numerically. Slightly
  larger proofs, materially simpler verifier — which must also run as
  generated EVM bytecode (verifier_contract.py).
- Keccak-256 Fiat-Shamir transcript, so the EVM verifier replays it with
  the native SHA3 opcode.

No zero-knowledge blinding: the wrapper witness (the root STARK proof
envelope) is public, so the SNARK layer provides succinctness + on-chain
verifiability, not hiding — blinding polynomials are a straightforward
extension if hiding is ever needed.

Gate equation:  q_L a + q_R b + q_O c + q_M ab + q_C + PI = 0
Copy constraints: standard 3-column permutation argument over
(H, k1 H, k2 H) with k1 = 5 (the Fr generator, never in the 2-adic
subgroup), k2 = 5^2.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from ..fields import bn254 as bn
from ..ops.keccak import keccak256
from . import fr
from .fr import R

K1 = fr.GENERATOR
K2 = fr.GENERATOR * fr.GENERATOR % R


# ---------------------------------------------------------------------------
# circuit builder
# ---------------------------------------------------------------------------

@dataclass
class Gate:
    ql: int
    qr: int
    qo: int
    qm: int
    qc: int
    a: int  # variable ids
    b: int
    c: int


class CircuitBuilder:
    """Gate list + wiring. Variables are witness-table indices; copy
    constraints come from reusing a variable id across gate slots."""

    def __init__(self) -> None:
        self.gates: List[Gate] = []
        self.n_vars = 0
        self.witness: List[int] = []
        self.public_rows: List[int] = []  # gate rows holding public inputs
        # Row 0 always pins the shared zero variable, so public inputs land
        # on rows 1..n_public — the fixed layout the verifier (and the
        # generated EVM verifier) computes Lagrange values for.
        self._zero_var = self.var(0)
        self.raw_gate(1, 0, 0, 0, 0, self._zero_var, self._zero_var,
                      self._zero_var)

    # -- variables ---------------------------------------------------------
    def var(self, value: int = 0) -> int:
        self.witness.append(value % R)
        self.n_vars += 1
        return self.n_vars - 1

    def set(self, v: int, value: int) -> None:
        self.witness[v] = value % R

    def val(self, v: int) -> int:
        return self.witness[v]

    # -- gates -------------------------------------------------------------
    def raw_gate(self, ql, qr, qo, qm, qc, a, b, c) -> int:
        self.gates.append(Gate(ql % R, qr % R, qo % R, qm % R, qc % R,
                               a, b, c))
        return len(self.gates) - 1

    def public_input(self, v: int) -> None:
        """Expose variable v as the next public input. Must be called
        before any non-public gate so instances occupy rows
        1..n_public (asserted in setup())."""
        row = self.raw_gate(1, 0, 0, 0, 0, v, self._zero(), self._zero())
        self.public_rows.append(row)

    def _zero(self) -> int:
        return self._zero_var

    def constant(self, value: int) -> int:
        v = self.var(value)
        # 1*v + (-value) = 0
        self.raw_gate(1, 0, 0, 0, -value, v, self._zero(), self._zero())
        return v

    def add(self, x: int, y: int) -> int:
        out = self.var((self.val(x) + self.val(y)) % R)
        self.raw_gate(1, 1, -1, 0, 0, x, y, out)
        return out

    def sub(self, x: int, y: int) -> int:
        out = self.var((self.val(x) - self.val(y)) % R)
        self.raw_gate(1, -1, -1, 0, 0, x, y, out)
        return out

    def mul(self, x: int, y: int) -> int:
        out = self.var(self.val(x) * self.val(y) % R)
        self.raw_gate(0, 0, -1, 1, 0, x, y, out)
        return out

    def mul_add(self, x: int, y: int, z: int) -> int:
        """x*y + z in one gate: q_M·a·b + q_O·c with c wired twice is not
        expressible in 3 wires, so spend two gates (mul then add)."""
        t = self.mul(x, y)
        return self.add(t, z)

    def linear(self, terms: Sequence[Tuple[int, int]], const: int = 0) -> int:
        """sum(coeff * var) + const, folded left through add gates:
        each gate computes acc = k_a*a + k_b*b (+qc)."""
        assert terms
        if len(terms) == 1:
            (k, x) = terms[0]
            out = self.var((k * self.val(x) + const) % R)
            self.raw_gate(k, 0, -1, 0, const, x, self._zero(), out)
            return out
        (k0, x0), (k1, x1) = terms[0], terms[1]
        acc_val = (k0 * self.val(x0) + k1 * self.val(x1) + const) % R
        acc = self.var(acc_val)
        self.raw_gate(k0, k1, -1, 0, const, x0, x1, acc)
        for (k, x) in terms[2:]:
            nxt = self.var((self.val(acc) + k * self.val(x)) % R)
            self.raw_gate(1, k, -1, 0, 0, acc, x, nxt)
            acc = nxt
        return acc

    def add_const(self, x: int, k: int) -> int:
        out = self.var((self.val(x) + k) % R)
        self.raw_gate(1, 0, -1, 0, k, x, self._zero(), out)
        return out

    def mul_const(self, x: int, k: int) -> int:
        out = self.var(self.val(x) * k % R)
        self.raw_gate(k, 0, -1, 0, 0, x, self._zero(), out)
        return out

    def assert_eq(self, x: int, y: int) -> None:
        self.raw_gate(1, -1, 0, 0, 0, x, y, self._zero())

    def assert_zero(self, x: int) -> None:
        self.raw_gate(1, 0, 0, 0, 0, x, self._zero(), self._zero())

    def assert_bool(self, x: int) -> None:
        # x^2 - x = 0
        self.raw_gate(-1, 0, 0, 1, 0, x, x, self._zero())

    # -- checking ----------------------------------------------------------
    def check(self) -> List[int]:
        """Rows whose gate equation fails (public rows use the PI value)."""
        bad = []
        pub = {row: self.witness[self.gates[row].a]
               for row in self.public_rows}
        for i, g in enumerate(self.gates):
            a, b, c = (self.witness[g.a], self.witness[g.b],
                       self.witness[g.c])
            pi = -pub[i] if i in pub else 0
            v = (g.ql * a + g.qr * b + g.qo * c + g.qm * a * b + g.qc
                 + pi) % R
            if v != 0:
                bad.append(i)
        return bad

    def public_values(self) -> List[int]:
        return [self.witness[self.gates[row].a] for row in self.public_rows]


# ---------------------------------------------------------------------------
# keys
# ---------------------------------------------------------------------------

@dataclass
class PlonkVk:
    log_n: int
    n_public: int
    q_comms: List[bn.G1]       # [qL, qR, qO, qM, qC]
    sigma_comms: List[bn.G1]   # [S1, S2, S3]
    tau_g2: bn.G2pt

    def digest(self) -> bytes:
        h = b""
        for c in self.q_comms + self.sigma_comms:
            h += _g1_bytes(c)
        h += self.log_n.to_bytes(4, "big") + self.n_public.to_bytes(4, "big")
        return keccak256(h)


@dataclass
class PlonkPk:
    vk: PlonkVk
    q_polys: List[List[int]]
    sigma_polys: List[List[int]]
    sigma_maps: List[List[int]]  # permutation images as field elements
    srs: bn.KzgSrs


@dataclass
class PlonkProof:
    comms: Dict[str, bn.G1]    # a b c z t_lo t_mid t_hi w_zeta w_zeta_omega
    evals: Dict[str, int]      # a b c ql qr qo qm qc s1 s2 s3 z t_lo t_mid
    # t_hi at zeta; z_omega at omega*zeta

    def to_bytes(self) -> bytes:
        out = b""
        for k in _COMM_ORDER:
            out += _g1_bytes(self.comms[k])
        for k in _EVAL_ORDER:
            out += self.evals[k].to_bytes(32, "big")
        return out

    @classmethod
    def from_bytes(cls, raw: bytes) -> "PlonkProof":
        comms = {}
        off = 0
        for k in _COMM_ORDER:
            comms[k] = _g1_from_bytes(raw[off : off + 64])
            off += 64
        evals = {}
        for k in _EVAL_ORDER:
            evals[k] = int.from_bytes(raw[off : off + 32], "big")
            off += 32
        return cls(comms, evals)


_COMM_ORDER = ["a", "b", "c", "z", "t_lo", "t_mid", "t_hi",
               "w_zeta", "w_zeta_omega"]
_EVAL_ORDER = ["a", "b", "c", "ql", "qr", "qo", "qm", "qc",
               "s1", "s2", "s3", "z", "t_lo", "t_mid", "t_hi", "z_omega"]
# polynomials opened at zeta, in batch order (z_omega is the lone
# omega*zeta opening)
_ZETA_OPEN_ORDER = _EVAL_ORDER[:-1]


def _g1_bytes(p: bn.G1) -> bytes:
    if p is None:
        return b"\x00" * 64
    return p[0].to_bytes(32, "big") + p[1].to_bytes(32, "big")


def _g1_from_bytes(raw: bytes) -> bn.G1:
    x = int.from_bytes(raw[:32], "big")
    y = int.from_bytes(raw[32:64], "big")
    if x == 0 and y == 0:
        return None
    assert bn.g1_is_on_curve((x, y)), "point not on curve"
    return (x, y)


# ---------------------------------------------------------------------------
# transcript (keccak-256; byte-compatible with the EVM verifier)
# ---------------------------------------------------------------------------

class Transcript:
    def __init__(self, init: bytes = b"plonk-bn254") -> None:
        self.state = keccak256(init)

    def absorb(self, data: bytes) -> None:
        self.state = keccak256(self.state + data)

    def absorb_point(self, p: bn.G1) -> None:
        self.absorb(_g1_bytes(p))

    def absorb_fr(self, x: int) -> None:
        self.absorb(int(x % R).to_bytes(32, "big"))

    def challenge(self) -> int:
        self.state = keccak256(self.state + b"\x01")
        return int.from_bytes(self.state, "big") % R


# ---------------------------------------------------------------------------
# setup
# ---------------------------------------------------------------------------

def setup(circuit: CircuitBuilder, srs: bn.KzgSrs) -> PlonkPk:
    # fixed instance layout contract (see CircuitBuilder.__init__)
    assert circuit.public_rows == list(
        range(1, len(circuit.public_rows) + 1)
    ), "public_input() must be called before any other gate"
    n_gates = len(circuit.gates)
    log_n = max(2, (n_gates - 1).bit_length())
    n = 1 << log_n
    assert len(srs.g1_powers) >= n + 8, "SRS too small for circuit"

    ql = [g.ql for g in circuit.gates] + [0] * (n - n_gates)
    qr = [g.qr for g in circuit.gates] + [0] * (n - n_gates)
    qo = [g.qo for g in circuit.gates] + [0] * (n - n_gates)
    qm = [g.qm for g in circuit.gates] + [0] * (n - n_gates)
    qc = [g.qc for g in circuit.gates] + [0] * (n - n_gates)

    # permutation over 3n slots: slots sharing a variable form a cycle
    var_slots: Dict[int, List[int]] = {}
    for i, g in enumerate(circuit.gates):
        var_slots.setdefault(g.a, []).append(i)
        var_slots.setdefault(g.b, []).append(n + i)
        var_slots.setdefault(g.c, []).append(2 * n + i)
    perm = list(range(3 * n))
    for slots in var_slots.values():
        for j, s in enumerate(slots):
            perm[s] = slots[(j + 1) % len(slots)]

    omega = fr.root_of_unity(log_n)
    id_tags = []
    w = 1
    for _ in range(n):
        id_tags.append(w)
        w = w * omega % R
    id_tags += [K1 * t % R for t in id_tags[:n]]
    id_tags += [K2 * t % R for t in id_tags[:n]]

    sigma_vals = [id_tags[perm[s]] for s in range(3 * n)]
    sigma_polys = [
        fr.ntt(sigma_vals[c * n : (c + 1) * n], log_n, inverse=True)
        for c in range(3)
    ]
    q_polys = [fr.ntt(col, log_n, inverse=True)
               for col in (ql, qr, qo, qm, qc)]

    vk = PlonkVk(
        log_n=log_n,
        n_public=len(circuit.public_rows),
        q_comms=[bn.kzg_commit(srs, p) for p in q_polys],
        sigma_comms=[bn.kzg_commit(srs, p) for p in sigma_polys],
        tau_g2=srs.tau_g2,
    )
    return PlonkPk(vk=vk, q_polys=q_polys, sigma_polys=sigma_polys,
                   sigma_maps=[sigma_vals[c * n : (c + 1) * n]
                               for c in range(3)],
                   srs=srs)


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------

def prove(pk: PlonkPk, circuit: CircuitBuilder) -> PlonkProof:
    vk = pk.vk
    log_n = vk.log_n
    n = 1 << log_n
    n_gates = len(circuit.gates)
    omega = fr.root_of_unity(log_n)
    srs = pk.srs

    public = circuit.public_values()
    assert len(public) == vk.n_public
    assert len(circuit.public_rows) == len(public)
    assert circuit.check() == [], "witness does not satisfy circuit"

    wa = [circuit.witness[g.a] for g in circuit.gates] + [0] * (n - n_gates)
    wb = [circuit.witness[g.b] for g in circuit.gates] + [0] * (n - n_gates)
    wc = [circuit.witness[g.c] for g in circuit.gates] + [0] * (n - n_gates)

    # PI polynomial: -x_i at each public row
    pi_vals = [0] * n
    for x, row in zip(public, circuit.public_rows):
        pi_vals[row] = (-x) % R

    ts = Transcript()
    ts.absorb(vk.digest())
    for x in public:
        ts.absorb_fr(x)

    a_poly = fr.ntt(wa, log_n, inverse=True)
    b_poly = fr.ntt(wb, log_n, inverse=True)
    c_poly = fr.ntt(wc, log_n, inverse=True)
    comm_a = bn.kzg_commit(srs, a_poly)
    comm_b = bn.kzg_commit(srs, b_poly)
    comm_c = bn.kzg_commit(srs, c_poly)
    ts.absorb_point(comm_a)
    ts.absorb_point(comm_b)
    ts.absorb_point(comm_c)

    beta = ts.challenge()
    gamma = ts.challenge()

    # permutation accumulator z over H
    id_a = 1
    z_vals = [1]
    sm = pk.sigma_maps
    num_acc = den_acc = 1
    w = 1
    for i in range(n - 1):
        num = ((wa[i] + beta * w + gamma)
               * (wb[i] + beta * K1 * w + gamma)
               * (wc[i] + beta * K2 * w + gamma)) % R
        den = ((wa[i] + beta * sm[0][i] + gamma)
               * (wb[i] + beta * sm[1][i] + gamma)
               * (wc[i] + beta * sm[2][i] + gamma)) % R
        num_acc = num_acc * num % R
        den_acc = den_acc * den % R
        z_vals.append(num_acc * pow(den_acc, R - 2, R) % R)
        w = w * omega % R
    z_poly = fr.ntt(z_vals, log_n, inverse=True)
    comm_z = bn.kzg_commit(srs, z_poly)
    ts.absorb_point(comm_z)
    alpha = ts.challenge()

    # quotient on a 4n coset
    log_m = log_n + 2
    shift = fr.GENERATOR
    ev = lambda p: fr.evals_on_coset(p, log_m, shift)
    A, B, C = ev(a_poly), ev(b_poly), ev(c_poly)
    QL, QR, QO, QM, QC = (ev(p) for p in pk.q_polys)
    S1, S2, S3 = (ev(p) for p in pk.sigma_polys)
    Z = ev(z_poly)
    PI = ev(fr.ntt(pi_vals, log_n, inverse=True))
    m = 1 << log_m
    # domain points of the coset
    omega_m = fr.root_of_unity(log_m)
    xs = []
    x = shift
    for _ in range(m):
        xs.append(x)
        x = x * omega_m % R
    # z(omega X): the coset uses omega_m^4 = omega, so rotate by 4
    Zw = Z[4:] + Z[:4]
    # L1 on the coset: (x^n - 1) / (n (x - 1))
    t_evals = []
    n_inv = pow(n, R - 2, R)
    for j in range(m):
        xj = xs[j]
        zh = (pow(xj, n, R) - 1) % R
        l1 = zh * n_inv % R * pow(xj - 1, R - 2, R) % R
        gate = (QL[j] * A[j] + QR[j] * B[j] + QO[j] * C[j]
                + QM[j] * A[j] % R * B[j] + QC[j] + PI[j]) % R
        p1 = (Z[j]
              * ((A[j] + beta * xj + gamma) % R) % R
              * ((B[j] + beta * K1 % R * xj + gamma) % R) % R
              * ((C[j] + beta * K2 % R * xj + gamma) % R)) % R
        p2 = (Zw[j]
              * ((A[j] + beta * S1[j] + gamma) % R) % R
              * ((B[j] + beta * S2[j] + gamma) % R) % R
              * ((C[j] + beta * S3[j] + gamma) % R)) % R
        p3 = (Z[j] - 1) * l1 % R
        full = (gate + alpha * ((p1 - p2) % R) + alpha * alpha % R * p3) % R
        t_evals.append(full * pow(zh, R - 2, R) % R)
    t_poly = fr.coeffs_from_coset(t_evals, log_m, shift)
    # degree sanity: t has degree <= 3n-1 (no blinding)
    for c in t_poly[3 * n :]:
        assert c == 0, "quotient degree overflow — constraint system bug"
    t_lo, t_mid, t_hi = t_poly[:n], t_poly[n : 2 * n], t_poly[2 * n : 3 * n]
    comm_tlo = bn.kzg_commit(srs, t_lo)
    comm_tmid = bn.kzg_commit(srs, t_mid)
    comm_thi = bn.kzg_commit(srs, t_hi)
    ts.absorb_point(comm_tlo)
    ts.absorb_point(comm_tmid)
    ts.absorb_point(comm_thi)

    zeta = ts.challenge()

    polys = {
        "a": a_poly, "b": b_poly, "c": c_poly,
        "ql": pk.q_polys[0], "qr": pk.q_polys[1], "qo": pk.q_polys[2],
        "qm": pk.q_polys[3], "qc": pk.q_polys[4],
        "s1": pk.sigma_polys[0], "s2": pk.sigma_polys[1],
        "s3": pk.sigma_polys[2],
        "z": z_poly, "t_lo": t_lo, "t_mid": t_mid, "t_hi": t_hi,
    }
    evals = {k: fr.poly_eval(p, zeta) for k, p in polys.items()}
    evals["z_omega"] = fr.poly_eval(z_poly, zeta * omega % R)
    for k in _EVAL_ORDER:
        ts.absorb_fr(evals[k])

    v = ts.challenge()

    # batched opening at zeta
    combined: List[int] = []
    vc = 1
    for k in _ZETA_OPEN_ORDER:
        combined = fr.poly_add(combined, fr.poly_scale(polys[k], vc))
        vc = vc * v % R
    comb_eval = fr.poly_eval(combined, zeta)
    w_zeta_poly = fr.divide_by_linear(
        fr.poly_sub(combined, [comb_eval]), zeta
    )
    comm_w_zeta = bn.kzg_commit(srs, w_zeta_poly)
    # opening of z at omega*zeta
    w_zw_poly = fr.divide_by_linear(
        fr.poly_sub(z_poly, [evals["z_omega"]]), zeta * omega % R
    )
    comm_w_zw = bn.kzg_commit(srs, w_zw_poly)

    return PlonkProof(
        comms={
            "a": comm_a, "b": comm_b, "c": comm_c, "z": comm_z,
            "t_lo": comm_tlo, "t_mid": comm_tmid, "t_hi": comm_thi,
            "w_zeta": comm_w_zeta, "w_zeta_omega": comm_w_zw,
        },
        evals=evals,
    )


# ---------------------------------------------------------------------------
# verifier
# ---------------------------------------------------------------------------

def verify(vk: PlonkVk, proof: PlonkProof, public: Sequence[int]) -> bool:
    try:
        return _verify(vk, proof, public)
    except Exception:
        return False


def _verify(vk: PlonkVk, proof: PlonkProof, public: Sequence[int]) -> bool:
    if len(public) != vk.n_public:
        return False
    n = 1 << vk.log_n
    omega = fr.root_of_unity(vk.log_n)
    e = proof.evals

    ts = Transcript()
    ts.absorb(vk.digest())
    for x in public:
        ts.absorb_fr(x)
    ts.absorb_point(proof.comms["a"])
    ts.absorb_point(proof.comms["b"])
    ts.absorb_point(proof.comms["c"])
    beta = ts.challenge()
    gamma = ts.challenge()
    ts.absorb_point(proof.comms["z"])
    alpha = ts.challenge()
    ts.absorb_point(proof.comms["t_lo"])
    ts.absorb_point(proof.comms["t_mid"])
    ts.absorb_point(proof.comms["t_hi"])
    zeta = ts.challenge()
    for k in _EVAL_ORDER:
        ts.absorb_fr(e[k])
    v = ts.challenge()
    ts.absorb_point(proof.comms["w_zeta"])
    ts.absorb_point(proof.comms["w_zeta_omega"])
    u = ts.challenge()

    zh = fr.vanishing_eval(vk.log_n, zeta)
    if zh == 0:
        return False
    n_inv = pow(n, R - 2, R)
    l1 = zh * n_inv % R * pow((zeta - 1) % R, R - 2, R) % R

    # PI(zeta) = sum -x_i * L_row(zeta); public rows are fixed by the
    # circuit layout. The wrapper circuit places public inputs on rows
    # 1..n_public (row 0 pins the zero variable), which the vk commits to
    # via the selector/sigma commitments; recompute lagrange values there.
    pi_eval = 0
    w = omega  # row 1
    for x in public:
        li = zh * n_inv % R * w % R * pow((zeta - w) % R, R - 2, R) % R
        pi_eval = (pi_eval - x * li) % R
        w = w * omega % R

    gate = (e["ql"] * e["a"] + e["qr"] * e["b"] + e["qo"] * e["c"]
            + e["qm"] * e["a"] % R * e["b"] + e["qc"] + pi_eval) % R
    p1 = (e["z"]
          * ((e["a"] + beta * zeta + gamma) % R) % R
          * ((e["b"] + beta * K1 % R * zeta + gamma) % R) % R
          * ((e["c"] + beta * K2 % R * zeta + gamma) % R)) % R
    p2 = (e["z_omega"]
          * ((e["a"] + beta * e["s1"] + gamma) % R) % R
          * ((e["b"] + beta * e["s2"] + gamma) % R) % R
          * ((e["c"] + beta * e["s3"] + gamma) % R)) % R
    p3 = (e["z"] - 1) * l1 % R
    lhs = (gate + alpha * ((p1 - p2) % R) + alpha * alpha % R * p3) % R
    zn = pow(zeta, n, R)
    t_eval = (e["t_lo"] + zn * e["t_mid"] + zn * zn % R * e["t_hi"]) % R
    if lhs != t_eval * zh % R:
        return False

    # batched KZG check
    comm_map = {
        "a": proof.comms["a"], "b": proof.comms["b"], "c": proof.comms["c"],
        "ql": vk.q_comms[0], "qr": vk.q_comms[1], "qo": vk.q_comms[2],
        "qm": vk.q_comms[3], "qc": vk.q_comms[4],
        "s1": vk.sigma_comms[0], "s2": vk.sigma_comms[1],
        "s3": vk.sigma_comms[2],
        "z": proof.comms["z"], "t_lo": proof.comms["t_lo"],
        "t_mid": proof.comms["t_mid"], "t_hi": proof.comms["t_hi"],
    }
    pts: List[bn.G1] = []
    scs: List[int] = []
    vc = 1
    y_comb = 0
    for k in _ZETA_OPEN_ORDER:
        pts.append(comm_map[k])
        scs.append(vc)
        y_comb = (y_comb + vc * e[k]) % R
        vc = vc * v % R
    # F = sum v^i C_i + u * C_z ; Y = y_comb + u * z_omega
    # check e(W_z + u W_zw, [tau]2) == e(zeta W_z + u omega zeta W_zw
    #                                    + F - [Y] G1, G2)
    f_pts = pts + [proof.comms["z"]]
    f_scs = scs + [u]
    y_total = (y_comb + u * e["z_omega"]) % R

    w_z = proof.comms["w_zeta"]
    w_zw = proof.comms["w_zeta_omega"]
    lhs_pt = bn.msm_jac([w_z, w_zw], [1, u])
    rhs_pt = bn.msm_jac(
        f_pts + [w_z, w_zw, bn.G1_GEN],
        f_scs + [zeta, u * (zeta * omega % R) % R, (-y_total) % R],
    )
    return bn.pairing_check([
        (vk.tau_g2, lhs_pt),
        (bn.g2_neg(bn.G2_GEN), rhs_pt),
    ])


def _powers(base: int, count: int) -> List[int]:
    out = []
    acc = 1
    for _ in range(count):
        out.append(acc)
        acc = acc * base % R
    return out
