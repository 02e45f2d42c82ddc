"""VerifierManifest: caller-supplied structural expectations for proofs.

TPU-native equivalent of the reference's `VerifierManifest`
(`circuit-prover/src/manifest.rs:25`; SURVEY.md §2.2): structural facts the
verifier *expects* (extension degree, instance count and shapes, NPO table
types, packing) checked against proof metadata BEFORE any AIR
reconstruction, so malformed or mismatched proofs fail fast with a clear
error instead of deep inside verification.
"""

from __future__ import annotations

import dataclasses

from ..circuit.compile import Circuit
from ..stark.uni import StarkConfig
from .batch_prover import BatchStarkProof, CircuitProverData, _npo_groups


@dataclasses.dataclass(frozen=True)
class VerifierManifest:
    ext_degree: int
    num_instances: int
    instance_shapes: tuple  # ((log_n, width_main, width_prep, lq), ...)
    npo_types: tuple  # sorted type ids
    public_lanes: int
    alu_lanes: int

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
