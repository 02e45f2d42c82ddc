"""Extension-degree completeness through the batch prover.

The reference dispatches D ∈ {1, 2, 4, 5, 6, 8}
(`circuit-prover/src/batch_stark_prover.rs:1067` `dispatch_by_ext_degree!`).
D=4 (default) and D=5 (quintic) are exercised throughout the suite; this
file covers the remaining binomial degrees end-to-end: circuit build →
traces → `prove_all_tables` → `verify_all_tables`, with division (ext
inversion through the ALU solve path) in the circuit so the x^D = W
reduction is genuinely load-bearing, plus pinned AIR shape goldens per
degree and a D=1/D=2 recursion layer (the reference's compact-challenger
and Goldilocks-prep degrees; GL's own D=2 layer lives in
test_goldilocks_recursion.py).
"""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.fields import BABY_BEAR, KOALA_BEAR, ext_field
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.prover.airs import AluAir
from plonky3_recursion_tpu.stark.fri_pcs import FriParams, TwoAdicFriPcs
from plonky3_recursion_tpu.stark.uni import StarkConfig


def _config(d: int, F=KOALA_BEAR) -> StarkConfig:
    E = ext_field(F, d)
    return StarkConfig(F, E, TwoAdicFriPcs(F, E, FriParams.testing()))


def _ext_mul(F, a, b, d, w=None):
    """Schoolbook x^D = W multiplication over int tuples."""
    p, w = F.P, (w if w is not None else F.ext_w)
    out = [0] * d
    for i in range(d):
        for j in range(d):
            k = i + j
            t = a[i] * b[j] % p
            if k >= d:
                out[k - d] = (out[k - d] + t * w) % p
            else:
                out[k] = (out[k] + t) % p
    return tuple(out)


def _ext_inv(F, a, d, w=None):
    """Inverse via extended exponentiation a^(p^d - 2) (slow, test only)."""
    p = F.P
    e = p**d - 2
    acc = tuple([1] + [0] * (d - 1))
    base = a
    while e:
        if e & 1:
            acc = _ext_mul(F, acc, base, d, w)
        base = _ext_mul(F, base, base, d, w)
        e >>= 1
    return acc


@pytest.mark.parametrize(
    "field,d",
    [
        (KOALA_BEAR, 1),
        (KOALA_BEAR, 2),
        (KOALA_BEAR, 8),
        # KoalaBear admits no degree-6 binomial (3 does not divide p-1);
        # D=6 dispatch is exercised over BabyBear (W=22)
        (BABY_BEAR, 6),
    ],
    ids=["kb1", "kb2", "kb8", "bb6"],
)
def test_batch_prove_verify_ext_degree(field, d):
    F = field
    config = _config(d, F)
    E = config.ext
    b = CircuitBuilder(E)
    x = b.public_input()
    y = b.public_input()
    res = b.public_input()
    # mul/add/div mix: div solves a = out/b through ext inversion
    t = b.mul(b.add(x, y), b.sub(x, y))
    t = b.div(t, y)
    out = b.mul_add(t, t, x)
    b.connect(out, res)
    circuit = b.build()

    w = config.ext.W if d > 1 else None
    xv = tuple((7 * i + 3) % F.P for i in range(d))
    yv = tuple((11 * i + 5) % F.P for i in range(d))
    add = tuple((a + c) % F.P for a, c in zip(xv, yv))
    sub = tuple((a - c) % F.P for a, c in zip(xv, yv))
    tv = _ext_mul(F, add, sub, d, w)
    tv = _ext_mul(F, tv, _ext_inv(F, yv, d, w), d, w)
    ov = tuple(
        (m + a) % F.P for m, a in zip(_ext_mul(F, tv, tv, d, w), xv)
    )

    pdata = circuit_prover_data(config, circuit)
    runner = circuit.runner()
    runner.set_public_inputs([np.asarray(xv), np.asarray(yv), np.asarray(ov)])
    traces = runner.run()
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(
        circuit, traces, pdata, debug_lookups=True
    )
    assert prover.verify_all_tables(circuit, proof, pdata)

    # wrong public output rejects
    bad = tuple((o + 1) % F.P for o in ov)
    runner2 = circuit.runner()
    runner2.set_public_inputs(
        [np.asarray(xv), np.asarray(yv), np.asarray(bad)]
    )
    with pytest.raises(Exception):
        runner2.run()


def test_alu_shape_goldens_per_degree():
    """(main_width, prep_width) pinned per dispatch degree (reference
    `shape_golden.rs:33-68`)."""
    golden = {
        1: (4, 12),
        2: (8, 12),
        4: (16, 12),
        6: (24, 12),
        8: (32, 12),
    }
    for d, (wm, wp) in golden.items():
        F = BABY_BEAR if d == 6 else KOALA_BEAR
        air = AluAir(d, ext_field(F, d).W if d > 1 else 0)
        assert (air.width_main, air.width_prep) == (wm, wp), d
        # 4 op kinds × D constraints each
        assert len(air.build().constraints) == 4 * d


@pytest.mark.parametrize("d", [1, 2])
@pytest.mark.slow
def test_recursion_layer_low_degree(d):
    """One full recursion layer at D=1 (compact challenger path) and D=2
    (the Goldilocks-prep degree) over KoalaBear."""
    from plonky3_recursion_tpu.recursion.recursion import (
        RecursionInput,
        build_next_layer_prep,
        prove_next_layer,
    )

    F = KOALA_BEAR
    config = _config(d)
    E = config.ext
    b = CircuitBuilder(E)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(16):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    x, y = 0, 1
    for _ in range(16):
        x, y = y, (x + y) % F.P
    pdata = circuit_prover_data(config, circuit)
    runner = circuit.runner()
    runner.set_public_inputs([0, 1, y])
    traces = runner.run()
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata)
    assert prover.verify_all_tables(circuit, proof, pdata)
    inner = RecursionInput(proof, circuit, pdata)
    prep = build_next_layer_prep(config, inner)
    layer = prove_next_layer(config, prep, proof)
    assert BatchStarkProver(config).verify_all_tables(
        prep.circuit, layer, prep.pdata
    )
