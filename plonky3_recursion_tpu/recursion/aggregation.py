"""2-to-1 proof aggregation: one circuit verifying two proofs.

TPU-native equivalent of the reference's aggregation API
(`prove_aggregation_layer` / `build_and_prove_aggregation_layer` /
`AggregationPrepCache`, `recursion/src/recursion.rs:656-996`;
SURVEY.md §2.4): both children's verifier circuits are lowered into ONE
CircuitBuilder (sharing the Poseidon2 NPO and its table), producing a
single proof of "both child proofs verify".  Chained up a binary tree this
gives the reference's scaling story (`book/src/advanced_topics/
scaling.md`): leaves are embarrassingly parallel across hosts, every level
halves the proof count.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..circuit.builder import CircuitBuilder
from ..circuit.compile import Circuit
from ..prover.batch_prover import (
    BatchStarkProof,
    BatchStarkProver,
    CircuitProverData,
    _airs,
    circuit_prover_data,
)
from ..stark.uni import StarkConfig
from .batch_verifier import build_batch_verifier_circuit
from .recursion import RecursionInput, _terminal_checks, compute_shapes


@dataclasses.dataclass
class AggregationPrep:
    circuit: Circuit
    vcr_left: object
    vcr_right: object
    pdata: CircuitProverData

    def fingerprint(self) -> tuple:
        """Reference AggregationCircuitFingerprint analog
        (`recursion.rs:73-93`)."""
        c = self.circuit
        return (
            c.witness_count,
            len(c.public_rows),
            len(c.external_private_rows),
            len(c.alu_rows),
            len(c.npo_calls),
        )


def build_aggregation_circuit(
    config: StarkConfig, left: RecursionInput, right: RecursionInput
) -> AggregationPrep:
    from ..prover.horner_table import horner_npo_for
    from ..prover.poseidon2_table import poseidon2_npo_for
    from ..prover.recompose_table import recompose_npo_for

    builder = CircuitBuilder(config.ext)
    npo = poseidon2_npo_for(config.field.name)
    builder.enable_op(npo)
    builder.enable_recompose(recompose_npo_for(config.field.name))
    builder.enable_horner(horner_npo_for(config.field.name))
    vcrs = []
    for ns, child in (("L", left), ("R", right)):
        d = child.circuit.ext.D
        app_idx = child.app_public_idx
        if app_idx is None:
            app_idx = [
                k * d for k in range(len(child.circuit.public_rows))
            ]
        airs = _airs(config, child.circuit, child.prover_data.packing)
        vcrs.append(
            build_batch_verifier_circuit(
                config,
                [(a, a.lookups()) for a in airs],
                compute_shapes(config, child.circuit, child.prover_data),
                child.prover_data.common,
                builder=builder,
                npo_type_id=npo.type_id,
                terminal_checks=_terminal_checks(
                    child.circuit, child.prover_data
                ),
                tag_ns=ns,
                app_public_idx=set(app_idx),
            )
        )
    circuit = builder.build()
    pdata = circuit_prover_data(config, circuit)
    return AggregationPrep(circuit, vcrs[0], vcrs[1], pdata)


def prove_aggregation_layer(
    config: StarkConfig,
    prep: AggregationPrep,
    left_proof: BatchStarkProof,
    right_proof: BatchStarkProof,
    xp=np,
    debug_lookups: bool = False,
) -> BatchStarkProof:
    runner = prep.circuit.runner()
    runner.set_public_inputs(
        prep.vcr_left.pack_public_inputs(left_proof.batch)
        + prep.vcr_right.pack_public_inputs(right_proof.batch)
    )
    runner.set_private_inputs(
        prep.vcr_left.pack_private_inputs(left_proof.batch)
        + prep.vcr_right.pack_private_inputs(right_proof.batch)
    )
    for vcr, pf in (
        (prep.vcr_left, left_proof.batch),
        (prep.vcr_right, right_proof.batch),
    ):
        for key, data in vcr.pack_npo_private(pf).items():
            runner.set_private_data(key, data)
    traces = runner.run()
    prover = BatchStarkProver(config)
    return prover.prove_all_tables(
        prep.circuit, traces, prep.pdata, xp=xp, debug_lookups=debug_lookups
    )


class AggregationPrepCache:
    """Fingerprint-keyed AggregationPrep reuse (reference
    `AggregationPrepCache` keyed by `AggregationCircuitFingerprint`,
    `recursion.rs:73-93`): at the aggregation tree's fixed point every
    pair with like-shaped children reuses the circuit + offline prep."""

    def __init__(self):
        self._entries: dict = {}
        self.hits = 0
        self.misses = 0

    def get_or_build(
        self, config: StarkConfig, left: RecursionInput, right: RecursionInput
    ) -> AggregationPrep:
        from .recursion import inner_fingerprint

        key = (
            inner_fingerprint(config, left),
            inner_fingerprint(config, right),
        )
        prep = self._entries.get(key)
        if prep is None:
            self.misses += 1
            prep = build_aggregation_circuit(config, left, right)
            self._entries[key] = prep
        else:
            self.hits += 1
        return prep


def build_and_prove_aggregation_layer(
    config: StarkConfig,
    left: RecursionInput,
    right: RecursionInput,
    xp=np,
    cache: AggregationPrepCache | None = None,
) -> RecursionInput:
    prep = (
        cache.get_or_build(config, left, right)
        if cache is not None
        else build_aggregation_circuit(config, left, right)
    )
    proof = prove_aggregation_layer(config, prep, left.proof, right.proof, xp=xp)
    d = prep.circuit.ext.D
    off = len(prep.vcr_left.public_extractors)
    app = [p * d for p in prep.vcr_left.app_public_positions] + [
        (off + p) * d for p in prep.vcr_right.app_public_positions
    ]
    return RecursionInput(proof, prep.circuit, prep.pdata, app_public_idx=app)
