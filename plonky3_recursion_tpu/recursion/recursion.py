"""Unified recursion API: build/prove the next layer, chain indefinitely.

TPU-native equivalent of the reference's recursion surface
(`recursion/src/recursion.rs:96-996`; SURVEY.md §2.4): `RecursionInput`,
`build_next_layer_circuit`, `prove_next_layer`, `into_recursion_input`, and
the `NextLayerPrepCache` that reuses the expensive offline preprocessed
commitment when the circuit reaches its fixed point.

Each layer proves the statement "the previous batch-stark proof verifies":
the previous layer's proof becomes public (commitments, publics, lookup
terminals) + private (openings, FRI data, siblings) inputs of the verifier
circuit, which is itself proven with the same BatchStarkProver.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..circuit.compile import Circuit
from ..fields.monty31 import U32
from ..prover.batch_prover import (
    BatchStarkProof,
    BatchStarkProver,
    CircuitProverData,
    _airs,
    _npo_groups,
    build_preprocessed,
    circuit_prover_data,
)
from ..stark.batch import InstanceShape
from ..stark.lookups import add_lookup_constraints, num_perm_cols
from ..stark.symbolic import AirBuilder, log_quotient_degree
from ..stark.uni import StarkConfig
from .backend import DEFAULT_BACKEND, PcsRecursionBackend
from .batch_verifier import VerifierCircuitResult


@dataclasses.dataclass
class RecursionInput:
    """A proof + the static data needed to verify it recursively.

    app_public_idx: flat indices (into the proof's flattened public
    coefficient list) of the APP block — the application statement the
    recursion chain propagates verbatim.  None (the base case) means
    coefficient 0 of every public input.  Layer outputs carry the
    positions of their own app block so the chain stays constant-width.
    """

    proof: BatchStarkProof
    circuit: Circuit
    prover_data: CircuitProverData
    app_public_idx: list | None = None
    # the StarkConfig the proof was produced under, when it differs from
    # the config proving the NEXT layer (cross-config recursion/aggregation,
    # reference `prove_aggregation_layer_cross`, `recursion.rs:772-899`).
    # None = same config up the chain.  Cross-config is same-field only:
    # the in-circuit transcript replay runs on the outer circuit's
    # permutation table, which must equal the inner challenger's.
    config: StarkConfig | None = None


@dataclasses.dataclass
class RecursionOutput:
    """Result of proving a layer (reference `RecursionOutput`,
    `recursion.rs:117`): chain with `into_recursion_input()`."""

    proof: BatchStarkProof
    circuit: Circuit
    prover_data: CircuitProverData

    def into_recursion_input(self) -> RecursionInput:
        return RecursionInput(self.proof, self.circuit, self.prover_data)


def compute_shapes(config: StarkConfig, circuit: Circuit, pdata) -> list:
    """Instance shapes of any proof of `circuit` (statically known)."""
    airs = _airs(config, circuit, pdata.packing)
    preps = pdata.preps
    names = ["WitnessChecks"]
    challenge_idx = {nm: 2 * i for i, nm in enumerate(names)}
    shapes = []
    num_publics_by_inst = {1: len(circuit.public_rows) * circuit.ext.D}
    for idx, (air, prep) in enumerate(zip(airs, preps)):
        lks = air.lookups()
        ab = AirBuilder(
            air.width_main,
            prep.shape[1],
            num_publics_by_inst.get(idx, 0),
            num_perm_ext=num_perm_cols(lks),
            num_challenges=2 * len(names),
        )
        air.eval(ab)
        add_lookup_constraints(ab, lks, challenge_idx)
        shapes.append(
            InstanceShape(
                log_n=prep.shape[0].bit_length() - 1,
                width_main=air.width_main,
                width_prep=prep.shape[1],
                num_publics=num_publics_by_inst.get(idx, 0),
                num_perm_cols=num_perm_cols(lks),
                log_quotient_degree=log_quotient_degree(ab.constraints),
            )
        )
    return shapes


def _terminal_checks(circuit: Circuit, pdata) -> list:
    """Public terminal recomputation spec for the verifier circuit.

    Only the Public table needs in-circuit terminal recomputation: its
    values are per-proof claims.  Const values are preprocessed — bound by
    the inner preprocessed commitment — so the spec is value-free, which
    keeps verifier circuits structurally identical across recursion layers
    (the fixed point, reference `recursion.rs:295-342`)."""
    d = circuit.ext.D
    pub_rows = [
        (circuit.public_mults[i], w * d, ("public", i * d))
        for i, w in enumerate(circuit.public_rows)
    ]
    return [(1, pub_rows)]


@dataclasses.dataclass(frozen=True)
class ProveNextLayerParams:
    """Per-layer proving knobs (reference `ProveNextLayerParams`,
    `recursion.rs:221`).  The ConstraintProfile selects the layer's chip
    shaping: RECURSION_OPTIMIZED packs more lanes per trace row and more
    Horner steps per packed row — fewer, wider rows, so the NEXT layer's
    verifier circuit is smaller — while STANDARD keeps the defaults.  The
    profile must match between prove and recursive verify (it changes the
    circuit fingerprint)."""

    packing: "TablePacking | None" = None
    profile: "ConstraintProfile" = None
    horner_k: int = 8

    def __post_init__(self):
        from ..prover.constraint_profile import ConstraintProfile

        if self.profile is None:
            object.__setattr__(
                self, "profile", ConstraintProfile.STANDARD
            )

    def resolved_packing(self):
        from ..prover.batch_prover import TablePacking
        from ..prover.constraint_profile import ConstraintProfile

        if self.packing is not None:
            return self.packing
        if self.profile == ConstraintProfile.RECURSION_OPTIMIZED:
            return TablePacking(public_lanes=2, alu_lanes=8)
        return TablePacking()

    def resolved_horner_k(self) -> int:
        from ..prover.constraint_profile import ConstraintProfile

        if self.profile == ConstraintProfile.RECURSION_OPTIMIZED:
            return max(self.horner_k, 16)
        return self.horner_k

    def key(self) -> tuple:
        p = self.resolved_packing()
        return (
            self.profile.value,
            p.public_lanes,
            p.alu_lanes,
            self.resolved_horner_k(),
        )


def build_next_layer_circuit(
    config: StarkConfig,
    inner: RecursionInput | tuple,
    horner_k: int = 8,
    backend: PcsRecursionBackend | None = None,
) -> tuple[Circuit, VerifierCircuitResult]:
    """Build the circuit verifying proofs shaped like `inner`'s.

    `backend` selects the PCS family verified in-circuit (reference
    `PcsRecursionBackend`, `recursion.rs:170-217`); default FRI.

    Cross-config: when `inner.config` is set, the in-circuit replay runs
    under the INNER config (its FRI params / hiding mode) while the layer
    itself is proven under `config` — FRI-parameter switching up the chain
    (reference `recursion.rs:772-899`).  Same field/extension only."""
    backend = backend or DEFAULT_BACKEND
    if isinstance(inner, RecursionInput):
        inner_circuit, inner_pdata = inner.circuit, inner.prover_data
        app_idx = inner.app_public_idx
        inner_cfg = inner.config or config
    else:
        inner_circuit, inner_pdata = inner
        app_idx = None
        inner_cfg = config
    if inner_cfg is not config:
        assert (
            inner_cfg.field.name == config.field.name
            and inner_cfg.ext.D == config.ext.D
        ), "cross-config recursion requires matching field/extension"
    d = inner_circuit.ext.D
    if app_idx is None:
        # base case: coefficient 0 of every inner public input
        app_idx = [k * d for k in range(len(inner_circuit.public_rows))]
    airs = _airs(inner_cfg, inner_circuit, inner_pdata.packing)
    airs_lookups = [(a, a.lookups()) for a in airs]
    shapes = compute_shapes(inner_cfg, inner_circuit, inner_pdata)
    vcr = backend.build_verifier_circuit(
        inner_cfg,
        airs_lookups,
        shapes,
        inner_pdata.common,
        terminal_checks=_terminal_checks(inner_circuit, inner_pdata),
        app_public_idx=set(app_idx),
        horner_k=horner_k,
    )
    outer_circuit = vcr.builder.build()
    return outer_circuit, vcr


@dataclasses.dataclass
class NextLayerPrep:
    """Cached next-layer circuit + offline preprocessed commitment
    (reference NextLayerPrepCache, `recursion.rs:89`)."""

    circuit: Circuit
    vcr: VerifierCircuitResult
    pdata: CircuitProverData
    backend: PcsRecursionBackend = dataclasses.field(
        default_factory=lambda: DEFAULT_BACKEND
    )


from ..utils.gcpause import gc_paused_fn


@gc_paused_fn
def build_next_layer_prep(
    config: StarkConfig,
    inner: RecursionInput,
    params: ProveNextLayerParams | None = None,
    backend: PcsRecursionBackend | None = None,
) -> NextLayerPrep:
    params = params or ProveNextLayerParams()
    backend = backend or DEFAULT_BACKEND
    outer_circuit, vcr = build_next_layer_circuit(
        config, inner, horner_k=params.resolved_horner_k(), backend=backend
    )
    pdata = circuit_prover_data(
        config, outer_circuit, packing=params.resolved_packing()
    )
    return NextLayerPrep(outer_circuit, vcr, pdata, backend)


def inner_fingerprint(
    config: StarkConfig,
    inner: RecursionInput,
    backend: PcsRecursionBackend | None = None,
) -> tuple:
    """Everything the next-layer circuit depends on: the inner proof's
    instance shapes, the (value-free) Public terminal-check spec, and the
    packing.  The verifier circuit is purely STRUCTURAL — const values are
    preprocessed and the inner prep commitment is a public input — so two
    inners with equal fingerprints produce IDENTICAL layer circuits and
    prep (circuit + offline preprocessed commitment) can be reused: the
    reference's circuit fixed-point detection (`recursion.rs:295-342`,
    `recursive_fibonacci.rs:385-443`)."""
    inner_circuit, pdata = inner.circuit, inner.prover_data
    shapes = tuple(
        (
            s.log_n,
            s.width_main,
            s.width_prep,
            s.num_publics,
            s.num_perm_cols,
            s.log_quotient_degree,
        )
        for s in compute_shapes(config, inner_circuit, pdata)
    )
    has_prep = pdata.common.prep_commitment is not None
    tc = tuple(
        (idx, tuple(rows)) for idx, rows in _terminal_checks(inner_circuit, pdata)
    )
    packing = (pdata.packing.public_lanes, pdata.packing.alu_lanes)
    d = inner_circuit.ext.D
    app = tuple(
        sorted(
            inner.app_public_idx
            if inner.app_public_idx is not None
            else [k * d for k in range(len(inner_circuit.public_rows))]
        )
    )
    cfg = inner.config or config
    cfg_key = (cfg.field.name,) + (backend or DEFAULT_BACKEND).fingerprint_key(cfg)
    return (shapes, has_prep, tc, packing, app, cfg_key)


class NextLayerPrepCache:
    """Fingerprint-keyed cache of NextLayerPrep: once the recursion reaches
    its circuit fixed point (layer k ≥ 2 shapes stabilize), every further
    layer skips circuit building AND the offline preprocessed commitment
    (reference `NextLayerPrepCache`, `recursion.rs:89,295`)."""

    def __init__(self):
        self._entries: dict = {}
        self.hits = 0
        self.misses = 0

    def get_or_build(
        self,
        config: StarkConfig,
        inner: RecursionInput,
        params: ProveNextLayerParams | None = None,
        backend: PcsRecursionBackend | None = None,
    ) -> NextLayerPrep:
        params = params or ProveNextLayerParams()
        key = (inner_fingerprint(config, inner, backend), params.key())
        prep = self._entries.get(key)
        if prep is None:
            self.misses += 1
            prep = build_next_layer_prep(config, inner, params, backend)
            self._entries[key] = prep
        else:
            self.hits += 1
        return prep


@gc_paused_fn
def prove_next_layer(
    config: StarkConfig,
    prep: NextLayerPrep,
    inner_proof: BatchStarkProof,
    xp=np,
    debug_lookups: bool = False,
) -> BatchStarkProof:
    # gc_paused: the proof/packing loops allocate heavily while the heap
    # holds millions of live circuit-graph objects; a mid-prove gen-2
    # collection was measured at ~7s on the layer workload
    from ..utils.tracing import span

    # the extractor payload: batch-stark inners expose `.batch`; other
    # backends (e.g. WhirRecursionBackend) take their view object directly
    payload = getattr(inner_proof, "batch", inner_proof)
    runner = prep.circuit.runner()
    with span("pack_inputs"):
        runner.set_public_inputs(prep.vcr.pack_public_inputs(payload))
        runner.set_private_inputs(prep.vcr.pack_private_inputs(payload))
    with span("set_private_data"):
        prep.backend.set_private_data(runner, prep.vcr, payload)
    with span("runner.run"):
        traces = runner.run()
    prover = BatchStarkProver(config)
    return prover.prove_all_tables(
        prep.circuit, traces, prep.pdata, xp=xp, debug_lookups=debug_lookups
    )


def build_and_prove_next_layer(
    config: StarkConfig,
    inner: RecursionInput,
    xp=np,
    cache: NextLayerPrepCache | None = None,
    params: ProveNextLayerParams | None = None,
) -> RecursionInput:
    prep = (
        cache.get_or_build(config, inner, params)
        if cache is not None
        else build_next_layer_prep(config, inner, params)
    )
    proof = prove_next_layer(config, prep, inner.proof, xp=xp)
    d = prep.circuit.ext.D
    return RecursionInput(
        proof,
        prep.circuit,
        prep.pdata,
        app_public_idx=[p * d for p in prep.vcr.app_public_positions],
    )
