"""Machine-proof (de)serialization: a deterministic, versioned binary codec.

Plays the role of the reference's bincode `Proof::encode_to_vec` +
base64-wrapped JSON schema (crates/types/src/proof.rs:52-67,
crates/prover/src/utils/mod.rs io helpers). Encoding: JSON with base64 numpy
payloads, zlib-compressed.
"""

from __future__ import annotations

import base64
import json
import zlib
from typing import Any

import numpy as np

from ..stark import fri, machine, merkle

CODEC_VERSION = 3


def _enc_arr(a) -> dict:
    a = np.asarray(a)
    return {
        "__nd__": base64.b64encode(a.tobytes()).decode(),
        "dtype": str(a.dtype),
        "shape": list(a.shape),
    }


def _dec_arr(d) -> np.ndarray:
    buf = base64.b64decode(d["__nd__"])
    return np.frombuffer(buf, dtype=np.dtype(d["dtype"])).reshape(d["shape"]).copy()


def _enc_opening(o: merkle.Opening) -> dict:
    return {
        "index": o.index,
        "rows": [_enc_arr(r) for r in o.rows],
        "siblings": [_enc_arr(s) for s in o.siblings],
    }


def _dec_opening(d) -> merkle.Opening:
    return merkle.Opening(
        index=int(d["index"]),
        rows=[_dec_arr(r) for r in d["rows"]],
        siblings=[_dec_arr(s) for s in d["siblings"]],
    )


def _enc_fri(p: fri.FriProof) -> dict:
    return {
        "commitments": [_enc_arr(c) for c in p.commitments],
        "final_poly": _enc_arr(p.final_poly),
        "pow_witness": int(p.pow_witness),
        "query_indices": [int(q) for q in p.query_indices],
        "rounds": [
            [[_enc_opening(a), _enc_opening(b)] for (a, b) in r.openings]
            for r in p.rounds
        ],
    }


def _dec_fri(d) -> fri.FriProof:
    return fri.FriProof(
        commitments=[_dec_arr(c) for c in d["commitments"]],
        final_poly=_dec_arr(d["final_poly"]),
        pow_witness=int(d["pow_witness"]),
        query_indices=[int(q) for q in d["query_indices"]],
        rounds=[
            fri.FriRoundProof(
                openings=[(_dec_opening(a), _dec_opening(b)) for a, b in r]
            )
            for r in d["rounds"]
        ],
    )


def machine_proof_to_dict(p: machine.MachineProof) -> dict:
    return {
        "codec_version": CODEC_VERSION,
        "meta": [[ln, w, list(pvs)] for (ln, w, pvs) in p.meta],
        "trace_roots": {str(k): _enc_arr(v) for k, v in p.trace_roots.items()},
        "quotient_roots": {
            str(k): _enc_arr(v) for k, v in p.quotient_roots.items()
        },
        "perm_roots": {str(k): _enc_arr(v) for k, v in p.perm_roots.items()},
        "pre_roots": {str(k): _enc_arr(v) for k, v in p.pre_roots.items()},
        "claimed_sums": [
            None if cs is None else _enc_arr(cs) for cs in p.claimed_sums
        ],
        "opened": [
            {
                "trace_zeta": _enc_arr(ov.trace_zeta),
                "trace_zeta_next": _enc_arr(ov.trace_zeta_next),
                "quotient": _enc_arr(ov.quotient),
                "perm_zeta": (
                    None if ov.perm_zeta is None else _enc_arr(ov.perm_zeta)
                ),
                "perm_zeta_next": (
                    None
                    if ov.perm_zeta_next is None
                    else _enc_arr(ov.perm_zeta_next)
                ),
                "pre_zeta": (
                    None if ov.pre_zeta is None else _enc_arr(ov.pre_zeta)
                ),
                "pre_zeta_next": (
                    None
                    if ov.pre_zeta_next is None
                    else _enc_arr(ov.pre_zeta_next)
                ),
            }
            for ov in p.opened
        ],
        "fri": _enc_fri(p.fri_proof),
        "query_openings": {
            str(lm): {
                str(pos): {
                    "trace": _enc_opening(qo.trace),
                    "quotient": _enc_opening(qo.quotient),
                    "perm": None if qo.perm is None else _enc_opening(qo.perm),
                    "pre": None if qo.pre is None else _enc_opening(qo.pre),
                }
                for pos, qo in d.items()
            }
            for lm, d in p.query_openings.items()
        },
        # NOTE: p.stat (wall-clock phase timings) deliberately stays
        # in-memory only: embedding it would make proof bytes
        # non-reproducible across runs/workers (the envelope's
        # StarkProofStat carries observability data instead).
    }


def machine_proof_from_dict(d) -> machine.MachineProof:
    assert d.get("codec_version") == CODEC_VERSION
    return machine.MachineProof(
        meta=[(int(ln), int(w), [int(v) for v in pvs]) for ln, w, pvs in d["meta"]],
        trace_roots={int(k): _dec_arr(v) for k, v in d["trace_roots"].items()},
        quotient_roots={
            int(k): _dec_arr(v) for k, v in d["quotient_roots"].items()
        },
        perm_roots={int(k): _dec_arr(v) for k, v in d["perm_roots"].items()},
        pre_roots={
            int(k): _dec_arr(v) for k, v in d.get("pre_roots", {}).items()
        },
        claimed_sums=[
            None if cs is None else _dec_arr(cs) for cs in d["claimed_sums"]
        ],
        opened=[
            machine.OpenedValues(
                trace_zeta=_dec_arr(ov["trace_zeta"]),
                trace_zeta_next=_dec_arr(ov["trace_zeta_next"]),
                quotient=_dec_arr(ov["quotient"]),
                perm_zeta=(
                    None
                    if ov.get("perm_zeta") is None
                    else _dec_arr(ov["perm_zeta"])
                ),
                perm_zeta_next=(
                    None
                    if ov.get("perm_zeta_next") is None
                    else _dec_arr(ov["perm_zeta_next"])
                ),
                pre_zeta=(
                    None
                    if ov.get("pre_zeta") is None
                    else _dec_arr(ov["pre_zeta"])
                ),
                pre_zeta_next=(
                    None
                    if ov.get("pre_zeta_next") is None
                    else _dec_arr(ov["pre_zeta_next"])
                ),
            )
            for ov in d["opened"]
        ],
        fri_proof=_dec_fri(d["fri"]),
        query_openings={
            int(lm): {
                int(pos): machine.QueryOpening(
                    trace=_dec_opening(qo["trace"]),
                    quotient=_dec_opening(qo["quotient"]),
                    perm=(
                        None
                        if qo.get("perm") is None
                        else _dec_opening(qo["perm"])
                    ),
                    pre=(
                        None
                        if qo.get("pre") is None
                        else _dec_opening(qo["pre"])
                    ),
                )
                for pos, qo in dd.items()
            }
            for lm, dd in d["query_openings"].items()
        },
        stat=dict(d.get("stat", {})),
    )


def encode_machine_proof(p: machine.MachineProof) -> bytes:
    raw = json.dumps(machine_proof_to_dict(p), sort_keys=True).encode()
    return zlib.compress(raw, level=6)


def decode_machine_proof(b: bytes) -> machine.MachineProof:
    return machine_proof_from_dict(json.loads(zlib.decompress(b)))
