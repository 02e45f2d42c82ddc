"""VerifierManifest: verify a circuit proof from METADATA alone.

TPU-native equivalent of the reference's `VerifierManifest`
(`circuit-prover/src/manifest.rs:25`) plus its verify-side AIR
reconstruction (`verify_all_tables` rebuilding AIRs from proof metadata
under the manifest, `circuit-prover/src/batch_stark_prover.rs:1230-1262`;
SURVEY.md §2.2): the manifest carries the circuit's structural identity —
instance shapes, NPO table types, packing, the Public table's [mult, idx]
rows and the offline preprocessed commitment — so a verifier can check a
proof WITHOUT the compiled circuit: AIRs are rebuilt from the manifest's
type ids (`registry.plugin_from_type_id`), lookups re-derived, and the
Public terminal natively recomputed from manifest data (all of it bound by
the preprocessed commitment).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..circuit.compile import Circuit
from ..fields.monty31 import U32
from ..stark.batch import CommonData, verify_batch
from ..stark.uni import StarkConfig
from .airs import AluAir, ConstAir, PublicAir
from .batch_prover import (
    BatchStarkProof,
    CircuitProverData,
    _npo_groups,
    bind_publics_and_terminal,
)


@dataclasses.dataclass(frozen=True)
class VerifierManifest:
    ext_degree: int
    num_instances: int
    instance_shapes: tuple  # ((log_n, width_main, width_prep, lq), ...)
    npo_types: tuple  # type ids in instance order (instances 3..)
    public_lanes: int
    alu_lanes: int
    # circuit-identity payload for circuit-free verification
    public_prep: tuple = ()  # ((mult, idx), ...) logical Public rows
    prep_commitment: tuple | None = None

    @staticmethod
    def from_circuit(
        config: StarkConfig, circuit: Circuit, pdata: CircuitProverData
    ) -> "VerifierManifest":
        from ..recursion.recursion import compute_shapes

        shapes = compute_shapes(config, circuit, pdata)
        return VerifierManifest(
            ext_degree=circuit.ext.D,
            num_instances=len(shapes),
            instance_shapes=tuple(
                (s.log_n, s.width_main, s.width_prep, s.log_quotient_degree)
                for s in shapes
            ),
            npo_types=tuple(
                p.type_id for p, _c in _npo_groups(circuit)
            ),
            public_lanes=pdata.packing.public_lanes,
            alu_lanes=pdata.packing.alu_lanes,
            public_prep=tuple(
                (int(m), int(i))
                for m, i in pdata.preps[1].reshape(-1, 2)
            ),
            prep_commitment=(
                None
                if pdata.common.prep_commitment is None
                else tuple(
                    int(x) for x in pdata.common.prep_commitment
                )
            ),
        )

    def check(self, proof: BatchStarkProof):
        shapes = proof.batch.shapes
        if len(shapes) != self.num_instances:
            raise ValueError(
                f"manifest: expected {self.num_instances} instances, "
                f"proof has {len(shapes)}"
            )
        for i, (s, want) in enumerate(zip(shapes, self.instance_shapes)):
            got = (s.log_n, s.width_main, s.width_prep, s.log_quotient_degree)
            if got != want:
                raise ValueError(
                    f"manifest: instance {i} shape {got} != expected {want}"
                )
        return True

    def rebuild_airs(self, config: StarkConfig) -> list:
        """Reconstruct every table AIR from metadata (no circuit)."""
        from .registry import plugin_from_type_id

        d = config.ext.D
        w = config.ext.W if d > 1 else 0
        airs = [
            ConstAir(d),
            PublicAir(d, self.public_lanes),
            AluAir(d, w, self.alu_lanes),
        ]
        for tid in self.npo_types:
            airs.append(plugin_from_type_id(tid).table_air())
        return airs

    def verify_all_tables(
        self, config: StarkConfig, proof: BatchStarkProof
    ) -> bool:
        """Circuit-free verification: manifest + proof only."""
        if config.ext.D != self.ext_degree:
            raise ValueError("manifest: extension degree mismatch")
        self.check(proof)
        airs = self.rebuild_airs(config)
        airs_lookups = [(a, a.lookups()) for a in airs]
        prep_c = (
            None
            if self.prep_commitment is None
            else np.asarray(self.prep_commitment, dtype=U32)
        )
        common = CommonData(prep_c, [], None)
        verify_batch(config, airs_lookups, proof.batch, common)
        if proof.batch.prep_commitment is not None and (
            prep_c is None
            or not np.array_equal(
                np.asarray(proof.batch.prep_commitment, dtype=U32), prep_c
            )
        ):
            raise ValueError("prep commitment mismatch (wrong circuit)")
        bind_publics_and_terminal(
            config,
            proof,
            prep_c,
            np.asarray(self.public_prep, dtype=U32).reshape(-1, 2),
        )
        return True
