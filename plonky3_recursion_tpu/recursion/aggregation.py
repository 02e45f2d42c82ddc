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
from ..stark.uni import StarkConfig, UniProof
from .batch_verifier import build_batch_verifier_circuit
from .recursion import RecursionInput, _terminal_checks, compute_shapes


@dataclasses.dataclass
class UniRecursionInput:
    """A uni-stark child for aggregation (reference
    `RecursionInput::UniStark`, `recursion.rs:96`)."""

    proof: UniProof
    air: object
    log_n: int
    publics: list
    config: StarkConfig | None = None  # cross-config (same field only)


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


def _child_config(config: StarkConfig, child) -> StarkConfig:
    ccfg = child.config or config
    if ccfg is not config:
        assert (
            ccfg.field.name == config.field.name
            and ccfg.ext.D == config.ext.D
        ), "cross-config aggregation requires matching field/extension"
    return ccfg


def build_aggregation_circuit(
    config: StarkConfig,
    left: RecursionInput | UniRecursionInput,
    right: RecursionInput | UniRecursionInput,
) -> AggregationPrep:
    """One circuit verifying both children.  Children may be BatchStark
    (RecursionInput) or UniStark (UniRecursionInput — the reference's
    mixed aggregation, `recursion.rs:656-770`), and each may carry its own
    same-field config (cross-config, `recursion.rs:772-899`)."""
    from ..prover.horner_table import horner_npo_for
    from ..prover.poseidon2_table import poseidon2_npo_for
    from ..prover.recompose_table import recompose_npo_for
    from .uni_verifier import build_uni_verifier_circuit

    builder = CircuitBuilder(config.ext)
    npo = poseidon2_npo_for(config.field.name)
    builder.enable_op(npo)
    builder.enable_recompose(recompose_npo_for(config.field.name))
    builder.enable_horner(horner_npo_for(config.field.name))
    vcrs = []
    for ns, child in (("L", left), ("R", right)):
        ccfg = _child_config(config, child)
        if isinstance(child, UniRecursionInput):
            vcrs.append(
                build_uni_verifier_circuit(
                    ccfg,
                    child.air,
                    child.log_n,
                    builder=builder,
                    npo_type_id=npo.type_id,
                    tag_ns=ns,
                )
            )
            continue
        d = child.circuit.ext.D
        app_idx = child.app_public_idx
        if app_idx is None:
            app_idx = [
                k * d for k in range(len(child.circuit.public_rows))
            ]
        airs = _airs(ccfg, child.circuit, child.prover_data.packing)
        vcrs.append(
            build_batch_verifier_circuit(
                ccfg,
                [(a, a.lookups()) for a in airs],
                compute_shapes(ccfg, child.circuit, child.prover_data),
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


def _extract_view(pf):
    """Extractor-facing view of a child proof: BatchStarkProof -> its
    BatchProof; anything else (e.g. _UniProofView) passes through."""
    return pf.batch if isinstance(pf, BatchStarkProof) else pf


def prove_aggregation_layer(
    config: StarkConfig,
    prep: AggregationPrep,
    left_proof,
    right_proof,
    xp=np,
    debug_lookups: bool = False,
) -> BatchStarkProof:
    """left/right proof: BatchStarkProof, or a `_UniProofView` (uni child)."""
    lv, rv = _extract_view(left_proof), _extract_view(right_proof)
    runner = prep.circuit.runner()
    runner.set_public_inputs(
        prep.vcr_left.pack_public_inputs(lv)
        + prep.vcr_right.pack_public_inputs(rv)
    )
    runner.set_private_inputs(
        prep.vcr_left.pack_private_inputs(lv)
        + prep.vcr_right.pack_private_inputs(rv)
    )
    for vcr, pf in ((prep.vcr_left, lv), (prep.vcr_right, rv)):
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
        self, config: StarkConfig, left, right
    ) -> AggregationPrep:
        key = (
            _child_fingerprint(config, left),
            _child_fingerprint(config, right),
        )
        prep = self._entries.get(key)
        if prep is None:
            self.misses += 1
            prep = build_aggregation_circuit(config, left, right)
            self._entries[key] = prep
        else:
            self.hits += 1
        return prep


def _child_fingerprint(config: StarkConfig, child) -> tuple:
    from .recursion import inner_fingerprint

    if isinstance(child, UniRecursionInput):
        cfg = child.config or config
        ck = getattr(child.air, "cache_key", None)
        return (
            "uni",
            ck() if ck else type(child.air).__name__,
            child.log_n,
            len(child.publics),
            cfg.field.name,
            repr(cfg.pcs.params),
            cfg.pcs.hiding_salt_cols,
        )
    return inner_fingerprint(config, child)


def _child_proof_view(child):
    from .uni_verifier import _UniProofView

    if isinstance(child, UniRecursionInput):
        return _UniProofView(child.proof, child.publics)
    return child.proof


def build_and_prove_aggregation_layer(
    config: StarkConfig,
    left: RecursionInput | UniRecursionInput,
    right: RecursionInput | UniRecursionInput,
    xp=np,
    cache: AggregationPrepCache | None = None,
) -> RecursionInput:
    prep = (
        cache.get_or_build(config, left, right)
        if cache is not None
        else build_aggregation_circuit(config, left, right)
    )
    proof = prove_aggregation_layer(
        config,
        prep,
        _child_proof_view(left),
        _child_proof_view(right),
        xp=xp,
    )
    d = prep.circuit.ext.D
    off = len(prep.vcr_left.public_extractors)
    app = [p * d for p in prep.vcr_left.app_public_positions] + [
        (off + p) * d for p in prep.vcr_right.app_public_positions
    ]
    return RecursionInput(proof, prep.circuit, prep.pdata, app_public_idx=app)
