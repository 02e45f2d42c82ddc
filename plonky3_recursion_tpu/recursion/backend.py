"""PCS-specific recursion backends.

TPU-native equivalent of the reference's `PcsRecursionBackend` trait
(`recursion/src/recursion.rs:170-217`) and its FRI implementation
(`recursion/src/backend/fri.rs:41-107`): the recursion pipeline
(`build_next_layer_circuit` / `prove_next_layer`) is generic over WHICH
polynomial-commitment scheme's verifier circuit gets built for the inner
proof.  A backend knows how to

  1. prepare the circuit builder (enable the challenger permutation NPO —
     reference `prepare_circuit`),
  2. build the verifier circuit for an inner proof shape
     (`build_verifier_circuit` -> a `VerifierCircuitResult`-shaped object
     whose pack_* methods feed the runner),
  3. set PCS-specific private data on the runner (Merkle direction bits +
     sibling digests for FRI; reference `set_private_data` /
     `set_fri_mmcs_private_data`), and
  4. contribute its parameter fingerprint to the layer fixed-point key
     (so `NextLayerPrepCache` never reuses prep across PCS configs).

Like the reference (whose `backend/` ships only `fri.rs`), the one
production backend is FRI.  The WHIR verifier circuit
(`recursion/whir_verifier.py`) returns the same pack_* result surface and
plugs in the same way once WHIR is used as the proof's PCS.
"""

from __future__ import annotations

from ..stark.uni import StarkConfig
from .batch_verifier import VerifierCircuitResult, build_batch_verifier_circuit


class PcsRecursionBackend:
    """Interface: how a recursion layer verifies one PCS family in-circuit
    (reference `PcsRecursionBackend`, `recursion/src/recursion.rs:170`)."""

    def prepare_circuit(self, config: StarkConfig, builder) -> None:
        """Enable permutations/NPOs the verifier circuit needs (reference
        `prepare_circuit`).  The FRI builder self-registers its NPOs, so
        the default is a no-op hook."""

    def build_verifier_circuit(
        self,
        config: StarkConfig,
        airs_lookups: list,
        shapes: list,
        common,
        *,
        terminal_checks=None,
        app_public_idx=None,
        horner_k: int = 8,
    ) -> VerifierCircuitResult:
        raise NotImplementedError

    def set_private_data(self, runner, vcr, proof) -> None:
        """Feed PCS-specific private data (Merkle bits/siblings) to the
        runner (reference `set_private_data`,
        `recursion/src/pcs/mmcs.rs:653`)."""
        raise NotImplementedError

    def fingerprint_key(self, config: StarkConfig) -> tuple:
        """PCS parameters that change the verifier circuit's shape —
        folded into `inner_fingerprint` so the prep cache is
        backend-aware."""
        raise NotImplementedError


class FriRecursionBackend(PcsRecursionBackend):
    """The FRI/two-adic backend (reference `backend/fri.rs`): builds the
    batch-stark verifier circuit with the in-circuit FRI fold chain and
    supplies per-query Merkle paths as NPO private data."""

    def build_verifier_circuit(
        self,
        config: StarkConfig,
        airs_lookups: list,
        shapes: list,
        common,
        *,
        terminal_checks=None,
        app_public_idx=None,
        horner_k: int = 8,
    ) -> VerifierCircuitResult:
        return build_batch_verifier_circuit(
            config,
            airs_lookups,
            shapes,
            common,
            terminal_checks=terminal_checks,
            app_public_idx=app_public_idx,
            horner_k=horner_k,
        )

    def set_private_data(self, runner, vcr, proof) -> None:
        for key, data in vcr.pack_npo_private(proof).items():
            runner.set_private_data(key, data)

    def fingerprint_key(self, config: StarkConfig) -> tuple:
        p = config.pcs.params
        return (
            "fri",
            p.log_blowup,
            p.num_queries,
            p.max_log_arity,
            p.log_final_poly_len,
            p.commit_pow_bits,
            p.query_pow_bits,
            config.pcs.hiding_salt_cols,
            getattr(config.pcs, "cap_height", 0),
            getattr(
                getattr(config, "challenger_npo", None), "type_id", None
            ),
        )


class WhirRecursionBackend(PcsRecursionBackend):
    """WHIR backend: the layer's verifier circuit verifies WHIR openings
    (`build_whir_verifier_circuit` — the `verify_whir_circuit` analog,
    reference `recursion/src/pcs/whir/verifier.rs:64`), plugged through the
    same `PcsRecursionBackend` surface the FRI backend uses, so
    `NextLayerPrep`/`prove_next_layer` drive it unchanged.

    The inner statement is a WHIR commitment opened at points
    (`whir_verifier._WhirView`); the LAYER itself is proven with the
    standard batch-stark prover under `config` — mirroring the reference,
    whose WHIR surface is the in-circuit opening verifier (its own STARK
    engine, like ours, proves layers under the two-adic FRI PCS;
    `recursion/tests/whir_verifier.rs`)."""

    def __init__(self, params, n_points: int, base_leaf0: bool = True):
        self.params = params
        self.n_points = n_points
        self.base_leaf0 = base_leaf0

    def build_verifier_circuit(
        self,
        config: StarkConfig,
        airs_lookups: list = (),
        shapes: list = (),
        common=None,
        *,
        terminal_checks=None,
        app_public_idx=None,
        horner_k: int = 8,
    ):
        from .whir_verifier import build_whir_verifier_circuit

        return build_whir_verifier_circuit(
            config, self.params, self.n_points, base_leaf0=self.base_leaf0
        )

    def set_private_data(self, runner, vcr, view) -> None:
        for key, data in vcr.pack_npo_private(view).items():
            runner.set_private_data(key, data)

    def fingerprint_key(self, config: StarkConfig) -> tuple:
        p = self.params
        return (
            "whir",
            p.num_variables,
            p.folding_factor,
            p.num_rounds,
            p.num_queries,
            p.query_pow_bits,
            p.log_inv_rate,
            self.n_points,
            self.base_leaf0,
        )


DEFAULT_BACKEND = FriRecursionBackend()
