"""Goldilocks recursion: the GL uni-stark verifier lowered into a circuit.

TPU-native equivalent of the reference's Goldilocks recursion path
(`recursion/tests/goldilocks.rs`, `Poseidon2Config::GOLDILOCKS_D2_W8`,
`circuit/src/ops/poseidon2_perm/config.rs:135-174`): a native Goldilocks
uni-stark proof (`stark/goldilocks_stark.py`: D=2 extension, Poseidon2 W8,
4-element digests) is verified IN-CIRCUIT over GL itself — the generic
circuit stack (`circuit/`, `recursion/uni_verifier.py`,
`recursion/batch_verifier._verify_fri_circuit`, `CircuitChallenger`,
`MmcsGadget`) is field-generic at the IR level (targets + python-int
constants), so GL plugs in with:

  * limb-pair witness cells: the runner stores GL values as (D, 2) u32
    [lo, hi] pairs (`CircuitRunner.limbs`), ALU rows execute through
    `GlExt2` vectorized arithmetic;
  * `GlPoseidon2Npo`: the chained W8 permutation plugin (capacity/digest
    4, D=2 → 4 ext limbs/state), executed by the runner's chained-NPO
    path with `gl_permute`;
  * width-generic gadgets: `CircuitChallenger` (rate = width − capacity,
    64-bit canonical `sample_bits`) and `MmcsGadget` (digest 4);
  * `GlRecursionConfig`: a StarkConfig-shaped adapter (GL field ints,
    GLE ext, FriParams with max_log_arity=1 matching the GL PCS's fixed
    arity-2 folds).

Scope parity with the reference test: the verifier CIRCUIT is built and
its witness generated/checked by the runner against a real GL proof
(`goldilocks.rs` also stops at `runner.run()` — it never batch-proves the
GL layer).
"""

from __future__ import annotations

import dataclasses
import types

import numpy as np

from ..circuit.builder import CircuitBuilder
from ..fields.monty31 import U32
from ..stark.fri_pcs import FriParams
from ..stark.goldilocks_stark import (
    GL,
    GLE,
    GlStarkConfig,
    GlUniProof,
    gl_permute,
)
from ..stark.symbolic import Air, Public, RowSel, Var
from .uni_verifier import build_uni_verifier_circuit


class GlPoseidon2Npo:
    """Chained Poseidon2-W8 permutation plugin over Goldilocks (reference
    `GoldilocksD2Width8`, `poseidon2_perm/config.rs:135-174`).

    Executor-only for now: the runner's chained path drives sponge /
    Merkle chains through `gl_permute`; the GL table AIR (batch-proving
    the layer) is future work — the reference's goldilocks.rs test also
    stops at witness generation."""

    type_id = "poseidon2_perm/goldilocks_d2_w8"
    chained = True
    d = 2  # ext limbs of D=2 coefficients
    capacity = 4  # 4-element digests (GL W8 preset)

    def __init__(self):
        self.params = types.SimpleNamespace(width=8)

    def permute_states(self, states: np.ndarray) -> np.ndarray:
        """(k, 8, 2) limb-pair states -> permuted."""
        return np.asarray(gl_permute(states))


class GlSymFibAir(Air):
    """Symbolic mirror of `goldilocks_stark.GlFibAir` — identical
    constraint CONTENT AND ORDER so the in-circuit α-fold replays the
    native prover's quotient exactly."""

    width_main = 2
    width_prep = 0
    num_publics = 3

    def eval(self, b):
        a, bb = b.main_local
        an, bn = b.main_next
        p0, p1, pf = b.public_values
        first, last, trans = (
            b.is_first_row,
            b.is_last_row,
            b.is_transition,
        )
        b.assert_zero(first * (a - p0))
        b.assert_zero(first * (bb - p1))
        b.assert_zero(trans * (an - bb))
        b.assert_zero(trans * (bn - (a + bb)))
        b.assert_zero(last * (bb - pf))


class GlSymMulAir(Air):
    """Symbolic mirror of `goldilocks_stark.GlMulAir` (preprocessed)."""

    width_main = 2
    width_prep = 1
    num_publics = 1

    def eval(self, b):
        x, y = b.main_local
        (k,) = b.prep_local
        (p0,) = b.public_values
        b.assert_zero(y - k * x)
        b.assert_zero(b.is_first_row * (x - p0))


class _GlIntChallenger:
    """GlChallenger with an int-valued sample face — the native replay
    interface `VerifierCircuitResult.query_indices` expects."""

    def __init__(self):
        from ..stark.goldilocks_stark import GlChallenger

        self.inner = GlChallenger()

    def observe(self, v: int):
        self.inner.observe(int(v))

    def sample(self) -> int:
        return int(GL.to_ints(self.inner.sample()))


@dataclasses.dataclass(frozen=True)
class GlRecursionConfig:
    """StarkConfig-shaped adapter for the circuit-building modules."""

    gl: GlStarkConfig

    @property
    def field(self):
        return GL

    @property
    def ext(self):
        return GLE

    @property
    def pcs(self):
        P = self.gl.pcs.params
        return types.SimpleNamespace(
            params=FriParams(
                log_blowup=P.log_blowup,
                log_final_poly_len=P.log_final_poly_len,
                num_queries=P.num_queries,
                commit_pow_bits=0,
                query_pow_bits=0,
                max_log_arity=1,  # GlFriPcs folds arity-2 per phase
            ),
            cap_height=0,
            hiding_salt_cols=0,
            salt_dims=lambda heights: [],
        )

    def challenger(self):
        return _GlIntChallenger()


def _ints(arr) -> np.ndarray:
    """GL limb array (..., 2) -> object ndarray of python ints."""
    a = np.asarray(arr, dtype=np.uint64)
    full = a[..., 0] | (a[..., 1] << np.uint64(32))
    return full.astype(object)


class GlUniProofView:
    """GlUniProof exposed through int-valued accessors for the generic
    extractor closures (which call `int(np.asarray(x)[i, j])`)."""

    def __init__(self, proof: GlUniProof, publics):
        self.log_n = proof.log_n
        self.trace_commit = _ints(proof.trace_commit).reshape(-1)
        self.quotient_commit = _ints(proof.quotient_commit).reshape(-1)
        self.trace_local = _ints(proof.trace_local)
        self.trace_next = _ints(proof.trace_next)
        self.quotient_chunks = [_ints(c) for c in proof.quotient_chunks]
        self.publics = [int(v) for v in publics]
        self.prep_commit = (
            _ints(proof.prep_commit).reshape(-1)
            if proof.prep_commit is not None
            else None
        )
        self.prep_local = (
            _ints(proof.prep_local) if proof.prep_local is not None else None
        )
        self.prep_next = (
            _ints(proof.prep_next) if proof.prep_next is not None else None
        )
        qps = []
        for qp in proof.fri.query_proofs:
            input_openings = [
                ([_ints(r) for r in rows], [np.asarray(s, dtype=U32) for s in sibs])
                for rows, sibs in qp.input_openings
            ]
            commit_steps = [
                (_ints(row), [np.asarray(s, dtype=U32) for s in sibs])
                for row, sibs in qp.commit_steps
            ]
            qps.append(
                types.SimpleNamespace(
                    input_openings=input_openings, commit_steps=commit_steps
                )
            )
        self.fri = types.SimpleNamespace(
            commit_digests=[
                _ints(dg).reshape(-1) for dg in proof.fri.commit_digests
            ],
            final_coeffs=_ints(proof.fri.final_coeffs),
            query_proofs=qps,
            query_indices=getattr(proof.fri, "query_indices", None),
        )


def build_gl_uni_verifier_circuit(
    gl_config: GlStarkConfig, air: Air, log_n: int
):
    """Build the GL uni-stark verifier circuit (reference
    `verify_p3_uni_proof_circuit::<..., GoldilocksD2Width8>`).  Returns
    (compiled circuit, VerifierCircuitResult, npo plugin)."""
    config = GlRecursionConfig(gl_config)
    b = CircuitBuilder(GLE)
    npo = GlPoseidon2Npo()
    b.enable_op(npo)
    vcr = build_uni_verifier_circuit(
        config, air, log_n, builder=b, npo_type_id=npo.type_id
    )
    return vcr.builder.build(), vcr, npo


def run_gl_uni_verifier(circuit, vcr, proof: GlUniProof, publics):
    """Pack the proof into the circuit and generate/check the witness —
    the reference test's `runner.run()` acceptance criterion."""
    view = GlUniProofView(proof, publics)
    runner = circuit.runner()
    runner.set_public_inputs(vcr.pack_public_inputs(view))
    runner.set_private_inputs(vcr.pack_private_inputs(view))
    for key, data in vcr.pack_npo_private(view).items():
        runner.set_private_data(key, data)
    return runner.run()
