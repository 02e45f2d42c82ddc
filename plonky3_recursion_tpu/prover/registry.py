"""NPO plugin registry: reconstruct a table plugin from its type id.

TPU-native equivalent of the reference's verify-side AIR reconstruction
(`TableProver::batch_air_from_table_entry`,
`circuit-prover/src/batch_stark_prover/dynamic_air.rs:324`): a proof's
table metadata names each dynamic table by type id; the verifier resolves
the id back to a plugin and rebuilds the AIR without ever seeing the
circuit.
"""

from __future__ import annotations


def plugin_from_type_id(type_id: str):
    """Resolve `family/params` type ids to their (cached) plugin."""
    family, _, rest = type_id.partition("/")
    if family == "poseidon2_perm":
        from .poseidon2_table import poseidon2_npo_for

        field_name = rest.rsplit("_d", 1)[0]
        width = int(rest.rsplit("_w", 1)[1])
        return poseidon2_npo_for(field_name, width)
    if family == "poseidon1_perm":
        from .poseidon1_table import koala_bear_poseidon1_npo

        return koala_bear_poseidon1_npo()
    if family == "recompose":
        from .recompose_table import recompose_npo_for

        return recompose_npo_for(rest.rsplit("_d", 1)[0])
    if family == "horner":
        from .horner_table import horner_npo_for

        field_name, _, k = rest.rsplit("_d", 1)[0], None, rest.rsplit("_k", 1)[1]
        return horner_npo_for(field_name, int(k))
    raise KeyError(f"unknown NPO table type id: {type_id}")
