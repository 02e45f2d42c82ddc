"""Proof serialization + post-deserialization validation.

TPU-native equivalent of the reference's serde-everything proofs with
`BatchStarkProof::validate()` (`circuit-prover/src/batch_stark_prover.rs:
610-670`; SURVEY.md §5 checkpoint/resume): recursion state is exactly
(proof bytes, prover data), so proofs must round-trip through a stable
binary format and be shape-checked on the way in.

Format: a tiny self-describing tagged tree — ints, u32 ndarrays
(shape + raw little-endian data), lists, tuples, None — enough for every
proof dataclass without pickling code objects.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from ..stark.batch import BatchProof, InstanceShape
from ..stark.fri_pcs import FriProof, QueryProof

_T_INT = 0
_T_ARR = 1
_T_LIST = 2
_T_TUPLE = 3
_T_NONE = 4


def _pack(obj, out: bytearray):
    if obj is None:
        out.append(_T_NONE)
    elif isinstance(obj, (int, np.integer)):
        out.append(_T_INT)
        out += struct.pack("<q", int(obj))
    elif isinstance(obj, np.ndarray):
        arr = np.ascontiguousarray(obj, dtype=np.uint32)
        out.append(_T_ARR)
        out.append(arr.ndim)
        for s in arr.shape:
            out += struct.pack("<I", s)
        out += arr.tobytes()
    elif isinstance(obj, (list, tuple)):
        out.append(_T_LIST if isinstance(obj, list) else _T_TUPLE)
        out += struct.pack("<I", len(obj))
        for x in obj:
            _pack(x, out)
    else:
        raise TypeError(f"unserializable {type(obj)}")


def _unpack(buf: memoryview, pos: int):
    tag = buf[pos]
    pos += 1
    if tag == _T_NONE:
        return None, pos
    if tag == _T_INT:
        (v,) = struct.unpack_from("<q", buf, pos)
        return int(v), pos + 8
    if tag == _T_ARR:
        ndim = buf[pos]
        pos += 1
        shape = []
        for _ in range(ndim):
            (s,) = struct.unpack_from("<I", buf, pos)
            shape.append(s)
            pos += 4
        count = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(buf, dtype="<u4", count=count, offset=pos).reshape(
            shape
        )
        return arr.copy(), pos + 4 * count
    if tag in (_T_LIST, _T_TUPLE):
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        items = []
        for _ in range(n):
            v, pos = _unpack(buf, pos)
            items.append(v)
        return (items if tag == _T_LIST else tuple(items)), pos
    raise ValueError(f"bad tag {tag}")


def _shape_tree(s: InstanceShape):
    return [
        s.log_n,
        s.width_main,
        s.width_prep,
        s.num_publics,
        s.num_perm_cols,
        s.log_quotient_degree,
    ]


def batch_proof_to_bytes(proof: BatchProof) -> bytes:
    tree = [
        [_shape_tree(s) for s in proof.shapes],
        np.asarray(proof.trace_commit),
        None if proof.perm_commit is None else np.asarray(proof.perm_commit),
        np.asarray(proof.quotient_commit),
        [[np.asarray(a), np.asarray(b)] for a, b in proof.trace_openings],
        [[i, np.asarray(a), np.asarray(b)] for i, a, b in proof.prep_openings],
        [[i, np.asarray(a), np.asarray(b)] for i, a, b in proof.perm_openings],
        [[np.asarray(c) for c in chunks] for chunks in proof.quotient_chunks],
        [[i, np.asarray(t)] for i, t in proof.lookup_terminals],
        [[int(x) for x in ps] for ps in proof.publics],
        [
            [np.asarray(d) for d in proof.fri.commit_digests],
            [int(w) for w in proof.fri.commit_pow_witnesses],
            np.asarray(proof.fri.final_coeffs),
            int(proof.fri.pow_witness),
            [
                [
                    [
                        [[np.asarray(r) for r in rows], [np.asarray(s) for s in sibs]]
                        for rows, sibs in qp.input_openings
                    ],
                    [
                        [np.asarray(row), [np.asarray(s) for s in sibs]]
                        for row, sibs in qp.commit_steps
                    ],
                ]
                for qp in proof.fri.query_proofs
            ],
        ],
        None
        if proof.prep_commitment is None
        else np.asarray(proof.prep_commitment),
        None
        if proof.random_commit is None
        else np.asarray(proof.random_commit),
        None
        if proof.random_opening is None
        else np.asarray(proof.random_opening),
    ]
    out = bytearray(b"P3TB\x03")
    _pack(tree, out)
    return bytes(out)


def batch_proof_from_bytes(data: bytes) -> BatchProof:
    assert data[:5] == b"P3TB\x03", "bad proof magic/version"
    tree, _pos = _unpack(memoryview(data), 5)
    (
        shapes_t,
        trace_commit,
        perm_commit,
        quotient_commit,
        trace_o,
        prep_o,
        perm_o,
        q_chunks,
        terminals,
        publics,
        fri_t,
        prep_commitment,
        random_commit,
        random_opening,
    ) = tree
    shapes = [InstanceShape(*s) for s in shapes_t]
    fri = FriProof(
        commit_digests=fri_t[0],
        commit_pow_witnesses=fri_t[1],
        final_coeffs=fri_t[2],
        pow_witness=fri_t[3],
        query_proofs=[
            QueryProof(
                input_openings=[(rows, sibs) for rows, sibs in q[0]],
                commit_steps=[(row, sibs) for row, sibs in q[1]],
            )
            for q in fri_t[4]
        ],
    )
    proof = BatchProof(
        shapes=shapes,
        trace_commit=trace_commit,
        perm_commit=perm_commit,
        quotient_commit=quotient_commit,
        trace_openings=[(a, b) for a, b in trace_o],
        prep_openings=[(i, a, b) for i, a, b in prep_o],
        perm_openings=[(i, a, b) for i, a, b in perm_o],
        quotient_chunks=q_chunks,
        lookup_terminals=[(i, t) for i, t in terminals],
        publics=publics,
        fri=fri,
        prep_commitment=prep_commitment,
        random_commit=random_commit,
        random_opening=random_opening,
    )
    validate_batch_proof(proof)
    return proof


def validate_batch_proof(proof: BatchProof, config=None):
    """Structural shape checks before any use (reference `validate()`,
    `circuit-prover/src/batch_stark_prover.rs:670`).

    Without `config` only self-consistency is checked (the extension
    degree is inferred from the proof).  With a StarkConfig, the checks
    bind to the verifier's own parameters: d == E.D, final_coeffs shape
    == (2^log_final_poly_len, E.D) with canonical values < P, digest
    widths, and prep/perm opening shapes.
    """
    d = None
    if config is not None:
        d = config.ext.D
    for i, (a, b) in enumerate(proof.trace_openings):
        s = proof.shapes[i]
        a, b = np.asarray(a), np.asarray(b)
        if d is None:
            d = a.shape[1]
        for arr in (a, b):
            if arr.shape != (s.width_main, d):
                raise ValueError(f"trace opening {i} shape {arr.shape}")
    for i, s in enumerate(proof.shapes):
        chunks = proof.quotient_chunks[i]
        if len(chunks) != 1 << s.log_quotient_degree:
            raise ValueError(f"instance {i}: wrong quotient chunk count")
        for c in chunks:
            if np.asarray(c).shape != (d, d):
                raise ValueError(f"instance {i}: chunk shape")
    shape_by_idx = {i: s for i, s in enumerate(proof.shapes)}
    for i, a, b in proof.prep_openings:
        s = shape_by_idx.get(i)
        if s is None:
            raise ValueError(f"prep opening for unknown instance {i}")
        for arr in (np.asarray(a), np.asarray(b)):
            if arr.shape != (s.width_prep, d):
                raise ValueError(f"prep opening {i} shape {arr.shape}")
    for i, a, b in proof.perm_openings:
        s = shape_by_idx.get(i)
        if s is None:
            raise ValueError(f"perm opening for unknown instance {i}")
        for arr in (np.asarray(a), np.asarray(b)):
            if arr.shape != (s.num_perm_cols * d, d):
                raise ValueError(f"perm opening {i} shape {arr.shape}")
    commits = [proof.trace_commit, proof.quotient_commit] + list(
        proof.fri.commit_digests
    )
    if proof.perm_commit is not None:
        commits.append(proof.perm_commit)
    if proof.prep_commitment is not None:
        commits.append(proof.prep_commitment)
    if (proof.random_commit is None) != (proof.random_opening is None):
        raise ValueError("random round commitment/opening must come together")
    if proof.random_commit is not None:
        commits.append(proof.random_commit)
        ro = np.asarray(proof.random_opening)
        if ro.shape != (2 * d, d):
            raise ValueError(f"random opening shape {ro.shape}")
    max_cap = 1 << getattr(config.pcs, "cap_height", 0) if config else None
    for arr in commits:
        n = np.asarray(arr).shape
        if len(n) != 1 or n[0] % 8 or not (e := n[0] // 8) or e & (e - 1):
            raise ValueError("bad commitment shape")
        if max_cap is not None and e > max_cap:
            raise ValueError("commitment cap exceeds config cap_height")
    fc = np.asarray(proof.fri.final_coeffs)
    p_bound = config.field.P if config is not None else (1 << 31)
    if np.any(fc >= p_bound):
        raise ValueError("final coeffs out of field range")
    if config is not None:
        P = config.pcs.params
        if fc.shape != (1 << P.log_final_poly_len, d):
            raise ValueError(
                f"final poly shape {fc.shape}, expected "
                f"({1 << P.log_final_poly_len}, {d})"
            )
        if len(proof.fri.query_proofs) != P.num_queries:
            raise ValueError("wrong number of query proofs")
    return True


# ---------------------------------------------------------------------------
# uni-stark proof serde
# ---------------------------------------------------------------------------


def _fri_tree(fri) -> list:
    return [
        [np.asarray(d) for d in fri.commit_digests],
        [int(w) for w in fri.commit_pow_witnesses],
        np.asarray(fri.final_coeffs),
        int(fri.pow_witness),
        [
            [
                [
                    [[np.asarray(r) for r in rows], [np.asarray(s) for s in sibs]]
                    for rows, sibs in qp.input_openings
                ],
                [
                    [np.asarray(row), [np.asarray(s) for s in sibs]]
                    for row, sibs in qp.commit_steps
                ],
            ]
            for qp in fri.query_proofs
        ],
    ]


def _fri_from_tree(t) -> FriProof:
    return FriProof(
        commit_digests=t[0],
        commit_pow_witnesses=t[1],
        final_coeffs=t[2],
        pow_witness=t[3],
        query_proofs=[
            QueryProof(
                input_openings=[(rows, sibs) for rows, sibs in q[0]],
                commit_steps=[(row, sibs) for row, sibs in q[1]],
            )
            for q in t[4]
        ],
    )


def uni_proof_to_bytes(proof) -> bytes:
    """Serialize a `stark.uni.UniProof` (reference: all proof types are
    serde round-trippable)."""
    tree = [
        int(proof.log_n),
        np.asarray(proof.trace_commit),
        np.asarray(proof.quotient_commit),
        np.asarray(proof.trace_local),
        np.asarray(proof.trace_next),
        [np.asarray(c) for c in proof.quotient_chunks],
        _fri_tree(proof.fri),
        None if proof.prep_commit is None else np.asarray(proof.prep_commit),
        None if proof.prep_local is None else np.asarray(proof.prep_local),
        None if proof.prep_next is None else np.asarray(proof.prep_next),
    ]
    out = bytearray(b"P3TU\x01")
    _pack(tree, out)
    return bytes(out)


def uni_proof_from_bytes(data: bytes):
    from ..stark.uni import UniProof

    assert data[:5] == b"P3TU\x01", "bad uni proof magic/version"
    tree, _pos = _unpack(memoryview(data), 5)
    (
        log_n,
        trace_commit,
        quotient_commit,
        trace_local,
        trace_next,
        q_chunks,
        fri_t,
        prep_commit,
        prep_local,
        prep_next,
    ) = tree
    return UniProof(
        log_n=int(log_n),
        trace_commit=trace_commit,
        quotient_commit=quotient_commit,
        trace_local=trace_local,
        trace_next=trace_next,
        quotient_chunks=q_chunks,
        fri=_fri_from_tree(fri_t),
        prep_commit=prep_commit,
        prep_local=prep_local,
        prep_next=prep_next,
    )


def batch_stark_proof_to_bytes(proof) -> bytes:
    """Serialize a `prover.batch_prover.BatchStarkProof` — the unit of
    inter-host traffic for distributed aggregation trees (reference:
    `BatchStarkProof` is fully serde, `batch_stark_prover.rs:610-612`;
    recursion state is exactly proof bytes, SURVEY.md §5)."""
    out = bytearray(b"P3SB\x01")
    _pack(np.asarray(proof.public_values, dtype=np.uint32), out)
    out += batch_proof_to_bytes(proof.batch)
    return bytes(out)


def batch_stark_proof_from_bytes(data: bytes, config=None):
    """Inverse of batch_stark_proof_to_bytes; validates the inner batch
    proof against `config` when given (reference `validate()`)."""
    from ..prover.batch_prover import BatchStarkProof

    assert data[:5] == b"P3SB\x01", "bad batch-stark proof magic/version"
    publics, pos = _unpack(memoryview(data), 5)
    batch = batch_proof_from_bytes(data[pos:])
    if config is not None:
        validate_batch_proof(batch, config)
    return BatchStarkProof(batch, np.asarray(publics, dtype=np.uint32))
