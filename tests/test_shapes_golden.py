"""Golden AIR shape snapshots (reference `shape_golden.rs:33`; SURVEY.md §4
golden/snapshot tests — catches silent layout drift)."""

from plonky3_recursion_tpu.prover.airs import AluAir, ConstAir, PublicAir
from plonky3_recursion_tpu.prover.poseidon2_table import (
    koala_bear_poseidon2_npo,
)

# (air factory, (main_width, prep_width)) — update deliberately only.
GOLDEN = [
    (lambda: ConstAir(4), (1, 6)),
    (lambda: ConstAir(1), (1, 3)),
    (lambda: PublicAir(4, lanes=2), (8, 4)),
    (lambda: AluAir(4, 3), (16, 12)),
    (lambda: AluAir(4, 3, lanes=4), (64, 48)),
    (lambda: AluAir(1, 0), (4, 12)),
    (lambda: koala_bear_poseidon2_npo().table_air(), (166, 30)),
]


def test_air_shapes_pinned():
    for mk, (wm, wp) in GOLDEN:
        air = mk()
        assert (air.width_main, air.width_prep) == (wm, wp), type(air).__name__


def test_poseidon2_table_block_shape():
    npo = koala_bear_poseidon2_npo()
    # wide layout: ONE row per permutation (reference `Poseidon2Cols`)
    assert npo.rows_per_perm == 1


def test_constraint_counts_pinned():
    """Constraint counts per chip are part of the golden surface."""
    counts = {}
    for mk, _shape in GOLDEN:
        air = mk()
        b = air.build()
        counts[f"{type(air).__name__}_{air.width_main}"] = len(b.constraints)
    assert counts["AluAir_16"] == 16  # 4 kinds x D
    assert counts["AluAir_64"] == 64
    # 8 full rounds x 16 posts + 20 partial sboxes + chaining: 1 bit
    # bool + 1 S kill + 1 S accumulate + 4x(4 sponge + 4 zero) + 2x2x4
    # merkle placements
    assert counts["Poseidon2TableAir_166"] == 199
