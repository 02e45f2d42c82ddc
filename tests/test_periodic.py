"""Periodic AIR columns: prover LDE tiling, verifier evaluation at ζ,
and the in-circuit analog (reference `verifier/periodic.rs`)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.stark.batch import (
    StarkInstance,
    prove_batch,
    verify_batch,
)
from plonky3_recursion_tpu.stark.domains import (
    periodic_at_point,
    periodic_lde,
)
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.symbolic import Air
from plonky3_recursion_tpu.stark.uni import (
    koala_bear_config,
    prove,
    verify,
)

E4 = ext_field(KOALA_BEAR, 4)
F = KOALA_BEAR
PATTERN = [3, 1, 4, 1]


class PeriodicAir(Air):
    """main[0] must equal the period-4 pattern everywhere."""

    width_main = 1
    num_publics = 0

    def periodic_columns(self):
        return [np.asarray(PATTERN, dtype=np.uint32)]

    def eval(self, b):
        b.assert_zero(b.main_local[0] - b.periodic[0])

    def cache_key(self):
        return ("PeriodicAir", tuple(PATTERN))


def _trace(n):
    return np.asarray(
        [[PATTERN[i % 4]] for i in range(n)], dtype=np.uint32
    )


def test_periodic_lde_matches_tiling(rng):
    """periodic_lde == naive interpolation of the tiled column."""
    from plonky3_recursion_tpu.ops.ntt import _power_table, intt, ntt

    col = F.rand(rng, (8,))
    log_n, lq = 5, 2
    n, m = 1 << log_n, 1 << (log_n + lq)
    got = np.asarray(periodic_lde(F, col, log_n, lq, np))
    tiled = np.tile(col, n // 8)[:, None]
    coeffs = intt(F, tiled, np)
    gpow = _power_table(F, F.generator, n)
    scaled = F.monty_mul(coeffs, np.asarray(gpow)[:, None], np)
    want = ntt(F, np.pad(scaled, [(0, m - n), (0, 0)]), np)[:, 0]
    assert np.array_equal(got, want)


def test_periodic_at_point_matches_lde(rng):
    col = F.rand(rng, (4,))
    log_n = 4
    # ζ on the LDE coset -> must equal the LDE value there
    lde = np.asarray(periodic_lde(F, col, log_n, 1, np))
    from plonky3_recursion_tpu.stark.domains import domain_points

    pts = domain_points(F, log_n + 1, F.generator)
    j = 7
    zeta = E4.from_base(np.asarray([pts[j]], dtype=np.uint32), np)[0]
    got = periodic_at_point(F, E4, col, log_n, zeta)
    assert int(got[0]) == int(lde[j]) and not got[1:].any()


def test_periodic_uni_roundtrip():
    config = koala_bear_config(FriParams.testing())
    air = PeriodicAir()
    proof = prove(config, air, _trace(16), [])
    assert verify(config, air, proof, [])


def test_periodic_batch_roundtrip():
    config = koala_bear_config(FriParams.testing())
    air = PeriodicAir()
    inst = StarkInstance(air, _trace(16), [])
    proof = prove_batch(config, [inst])
    assert verify_batch(config, [(air, [])], proof)
    # wrong trace rejected
    bad = _trace(16)
    bad[5] = 9
    with pytest.raises(ValueError):
        verify_batch(
            config, [(air, [])], prove_batch(config, [StarkInstance(air, bad, [])])
        )


def test_periodic_uni_recursion_layer():
    """The in-circuit periodic evaluation (exp chain + constant Horner)
    agrees with the native verifier."""
    from plonky3_recursion_tpu.prover import (
        BatchStarkProver,
        circuit_prover_data,
    )
    from plonky3_recursion_tpu.recursion.uni_verifier import (
        build_uni_recursion_layer,
        prove_uni_recursively,
    )

    config = koala_bear_config(FriParams.testing())
    air = PeriodicAir()
    proof = prove(config, air, _trace(16), [])
    circuit, vcr = build_uni_recursion_layer(config, air, log_n=4)
    pdata = circuit_prover_data(config, circuit)
    layer = prove_uni_recursively(config, circuit, vcr, pdata, proof, [])
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(circuit, layer, pdata)
