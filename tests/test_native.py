"""C++ scalar reference vs python/jnp implementations (golden cross-check,
SURVEY.md §4 pyramid level 1)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.fields import BABY_BEAR, KOALA_BEAR
from plonky3_recursion_tpu.native import (
    NativeChallenger,
    NativePoseidon2,
    native_mulmod_vec,
)
from plonky3_recursion_tpu.ops.poseidon2 import permute, poseidon2_params
from plonky3_recursion_tpu.stark.challenger import DuplexChallenger


@pytest.mark.parametrize("F", [KOALA_BEAR, BABY_BEAR], ids=lambda f: f.name)
def test_native_mulmod(F, rng):
    a = F.rand(rng, (1000,))
    b = F.rand(rng, (1000,))
    got = native_mulmod_vec(F, a, b)
    want = (a.astype(np.uint64) * b) % F.P
    assert np.array_equal(got, want)


@pytest.mark.parametrize("F", [KOALA_BEAR, BABY_BEAR], ids=lambda f: f.name)
def test_native_poseidon2(F, rng):
    params = poseidon2_params(F, 16)
    native = NativePoseidon2(params)
    states = F.rand(rng, (32, 16))
    got = native.permute(states)
    want = permute(params, states, np)
    assert np.array_equal(got, want)


def test_native_challenger_transcript(rng):
    F = KOALA_BEAR
    params = poseidon2_params(F, 16)
    native = NativeChallenger(NativePoseidon2(params))
    py = DuplexChallenger(F)
    obs = [int(x) for x in F.rand(rng, (23,))]
    native.observe_slice(obs)
    py.observe_slice(obs)
    ns = native.sample_vec(5)
    ps = py.sample_vec(5)
    assert np.array_equal(ns, ps)
    native.observe_slice([7])
    py.observe(7)
    assert int(native.sample_vec(1)[0]) == py.sample()


def test_native_grind_matches_python():
    F = KOALA_BEAR
    params = poseidon2_params(F, 16)
    native = NativeChallenger(NativePoseidon2(params))
    py = DuplexChallenger(F)
    for ch_obs in ([1, 2, 3],):
        native.observe_slice(ch_obs)
        py.observe_slice(ch_obs)
    wn = native.grind(8)
    wp = py.grind(8)
    assert wn == wp  # both find the smallest witness


def test_native_table_rows_matches_numpy(rng):
    """C++ round-state capture + S-box register columns == numpy path."""
    from plonky3_recursion_tpu.fields import BABY_BEAR, KOALA_BEAR
    from plonky3_recursion_tpu.native import NativePoseidon2
    from plonky3_recursion_tpu.ops.poseidon2 import (
        permute_with_rows,
        poseidon2_params,
    )

    for field, width, n_sbox in (
        (KOALA_BEAR, 16, 1),
        (KOALA_BEAR, 32, 1),
        (BABY_BEAR, 16, 2),
    ):
        params = poseidon2_params(field, width)
        nat = NativePoseidon2(params)
        states = field.rand(rng, (37, width))
        rpp = 2 + params.full_rounds + params.partial_rounds
        rows = permute_with_rows(params, states, np)
        assert np.array_equal(nat.permute_rows(states, rpp), rows)
        # table_rows: state block + sbox register blocks
        rc = np.zeros((rpp, width), dtype=np.uint32)
        r = 1
        for e in range(params.full_rounds // 2):
            rc[r] = params.rc_ext[e]
            r += 1
        for i in range(params.partial_rounds):
            rc[r, 0] = params.rc_int[i]
            r += 1
        for e in range(params.full_rounds // 2, params.full_rounds):
            rc[r] = params.rc_ext[e]
            r += 1
        got = nat.table_rows(states, rc, n_sbox)
        flat = rows.reshape(-1, width)
        t = field.add(flat, np.tile(rc, (37, 1)), np)
        cube = field.mul(field.mul(t, t, np), t, np)
        want = [flat, cube]
        if n_sbox == 2:
            want.append(field.mul(field.mul(cube, cube, np), t, np))
        want = np.concatenate(want, axis=1).reshape(37, rpp, -1)
        assert np.array_equal(got, want)
