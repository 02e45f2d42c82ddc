"""Transcript-compatibility suite: CircuitChallenger vs native
DuplexChallenger (the reference's `challenger_transcript.rs` fixture class —
"the single most important fixture class for a from-scratch rebuild",
SURVEY.md §4)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.prover.poseidon2_table import (
    koala_bear_poseidon2_npo,
)
from plonky3_recursion_tpu.recursion.challenger_circuit import (
    CircuitChallenger,
)
from plonky3_recursion_tpu.stark.challenger import DuplexChallenger

E4 = ext_field(KOALA_BEAR, 4)


def run_script(script, publics):
    """Drive native + circuit challengers through the same op script.

    script: list of ("observe", n_publics) / ("observe_ext",) /
    ("sample", label) / ("sample_ext", label) / ("sample_bits", n, label).
    """
    native = DuplexChallenger(KOALA_BEAR)
    b = CircuitBuilder(E4)
    npo = koala_bear_poseidon2_npo()
    b.enable_op(npo)
    cc = CircuitChallenger(b, npo.type_id)
    pub_targets = []
    native_out = {}
    pi = 0
    for op in script:
        if op[0] == "observe":
            for _ in range(op[1]):
                t = b.public_input()
                pub_targets.append(publics[pi])
                native.observe(publics[pi])
                cc.observe(t)
                pi += 1
        elif op[0] == "observe_ext":
            t = b.public_input()
            val = tuple(int(x) % KOALA_BEAR.P for x in publics[pi])
            pub_targets.append(val)
            native.observe_ext(np.asarray(val, dtype=np.uint32))
            cc.observe_ext(t)
            pi += 1
        elif op[0] == "sample":
            native_out[op[1]] = native.sample()
            b.tag(op[1], cc.sample())
        elif op[0] == "sample_ext":
            native_out[op[1]] = native.sample_ext(E4)
            b.tag(op[1], cc.sample_ext())
        elif op[0] == "sample_bits":
            native_out[op[1 + 1]] = native.sample_bits(op[1])
            bits = cc.sample_bits(op[1])
            for i, bit in enumerate(bits):
                b.tag(f"{op[2]}_{i}", bit)
    circuit = b.build()
    r = circuit.runner()
    r.set_public_inputs(pub_targets)
    traces = r.run()
    return native_out, traces


def test_basic_observe_sample(rng):
    vals = [int(x) for x in KOALA_BEAR.rand(rng, (20,))]
    native_out, traces = run_script(
        [("observe", 3), ("sample", "s1"), ("observe", 8), ("sample", "s2"),
         ("sample", "s3")],
        vals,
    )
    assert int(traces.probe("s1")[0]) == native_out["s1"]
    assert int(traces.probe("s2")[0]) == native_out["s2"]
    assert int(traces.probe("s3")[0]) == native_out["s3"]


def test_multi_duplex_and_ext(rng):
    vals = [int(x) for x in KOALA_BEAR.rand(rng, (30,))]
    ext_vals = [tuple(int(x) for x in E4.rand(rng, ())) for _ in range(3)]
    publics = vals[:17] + ext_vals + vals[17:]
    script = [
        ("observe", 17),
        ("observe_ext",),
        ("observe_ext",),
        ("sample_ext", "alpha"),
        ("observe_ext",),
        ("sample", "z"),
        ("sample_ext", "beta"),
    ]
    native_out, traces = run_script(script, publics)
    assert np.array_equal(traces.probe("alpha"), native_out["alpha"])
    assert int(traces.probe("z")[0]) == native_out["z"]
    assert np.array_equal(traces.probe("beta"), native_out["beta"])


def test_sample_bits_matches(rng):
    vals = [int(x) for x in KOALA_BEAR.rand(rng, (10,))]
    native_out, traces = run_script(
        [("observe", 5), ("sample_bits", 10, "q")], vals
    )
    want = native_out["q"]
    got = sum(int(traces.probe(f"q_{i}")[0]) << i for i in range(10))
    assert got == want


def test_pow_witness_check():
    native = DuplexChallenger(KOALA_BEAR)
    native.observe_slice([7, 8, 9])
    verifier = native.clone()
    w = native.grind(6)
    # circuit side accepts the witness
    b = CircuitBuilder(E4)
    npo = koala_bear_poseidon2_npo()
    b.enable_op(npo)
    cc = CircuitChallenger(b, npo.type_id)
    for v in (7, 8, 9):
        cc.observe(b.public_input())
    wt = b.public_input()
    cc.check_pow_witness(wt, 6)
    circuit = b.build()
    r = circuit.runner()
    r.set_public_inputs([7, 8, 9, w])
    r.run()
    # a wrong witness fails
    from plonky3_recursion_tpu.circuit import WitnessConflict

    r2 = circuit.runner()
    r2.set_public_inputs([7, 8, 9, w + 1])
    with pytest.raises(WitnessConflict):
        r2.run()
