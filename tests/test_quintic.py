"""KoalaBear quintic trinomial extension x^5 + x^2 - 1 (SURVEY.md §2.6)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.fields import KOALA_BEAR as F
from plonky3_recursion_tpu.fields.extension import QuinticTrinomialExtension

E = QuinticTrinomialExtension(F)


def test_mul_matches_polynomial(rng):
    a = E.rand(rng, (16,))
    b = E.rand(rng, (16,))
    got = E.mul(a, b, np)
    p = F.P
    for n in range(16):
        c = [0] * 9
        for i in range(5):
            for j in range(5):
                c[i + j] += int(a[n, i]) * int(b[n, j])
        for k in range(8, 4, -1):
            jj = k - 5
            c[jj] += c[k]
            c[2 + jj] -= c[k]
        assert [int(x) for x in got[n]] == [v % p for v in c[:5]]


def test_defining_relation():
    x = np.zeros((1, 5), dtype=np.uint32)
    x[0, 1] = 1
    s = E.add(E.pow_static(x, 5, np), E.pow_static(x, 2, np), np)
    s = E.sub(s, E.from_base(np.uint32([1]), np), np)
    assert not np.any(s)


def test_inverse_and_associativity(rng):
    a = E.rand(rng, (8,))
    b = E.rand(rng, (8,))
    c = E.rand(rng, (8,))
    assert np.array_equal(
        E.mul(E.mul(a, b, np), c, np), E.mul(a, E.mul(b, c, np), np)
    )
    one = E.mul(a, E.inv(a, np), np)
    want = E.from_base(np.ones(8, dtype=np.uint32), np)
    assert np.array_equal(one, want)


def test_quintic_batch_stark_pipeline():
    """Quintic challenge field through the FULL circuit prover: trinomial
    ALU constraints, quintic FRI/quotient/challenger — the reference's
    `fibonacci_batch_stark_prover_quintic.rs` analog."""
    from plonky3_recursion_tpu.circuit import CircuitBuilder
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.stark.fri_pcs import FriParams
    from plonky3_recursion_tpu.stark.uni import koala_bear_quintic_config

    config = koala_bear_quintic_config(FriParams.testing())
    b = CircuitBuilder(config.ext)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(24):
        a, bb = bb, b.add(a, bb)
    # exercise trinomial multiplication constraints too
    prod = b.mul(bb, a)
    b.tag("prod", prod)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit)
    x, y = 0, 1
    for _ in range(24):
        x, y = y, (x + y) % F.P
    r = circuit.runner()
    r.set_public_inputs([0, 1, y])
    traces = r.run()
    # runner's trinomial mul matches the field class
    want = E.mul(
        np.asarray([y, 0, 0, 0, 0], dtype=np.uint32),
        np.asarray([x, 0, 0, 0, 0], dtype=np.uint32),
        np,
    )
    assert np.array_equal(traces.probe("prod"), want)
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, traces, pdata, debug_lookups=True)
    assert prover.verify_all_tables(circuit, proof, pdata)
    # tampered public rejected
    import copy

    bad = copy.deepcopy(proof)
    bad.public_values = np.asarray(bad.public_values).copy()
    bad.public_values[2, 0] = (int(bad.public_values[2, 0]) + 1) % F.P
    bad.batch.publics[1] = [int(v) for v in bad.public_values.reshape(-1)]
    with pytest.raises(ValueError):
        prover.verify_all_tables(circuit, bad, pdata)
