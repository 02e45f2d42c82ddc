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


# ----- comprehensive pattern sweep (reference challenger_transcript.rs:
# every observe/sample pattern, per field) -----

from plonky3_recursion_tpu.fields import BABY_BEAR
from plonky3_recursion_tpu.prover.poseidon2_table import poseidon2_npo_for


def run_script_f(field, script, publics):
    """`run_script` generalized over the base field."""
    E = ext_field(field, 4)
    native = DuplexChallenger(field)
    b = CircuitBuilder(E)
    npo = poseidon2_npo_for(field.name)
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
            val = tuple(int(x) % field.P for x in publics[pi])
            pub_targets.append(val)
            native.observe_ext(np.asarray(val, dtype=np.uint32))
            cc.observe_ext(t)
            pi += 1
        elif op[0] == "sample":
            native_out[op[1]] = native.sample()
            b.tag(op[1], cc.sample())
        elif op[0] == "sample_ext":
            native_out[op[1]] = native.sample_ext(E)
            b.tag(op[1], cc.sample_ext())
        elif op[0] == "sample_bits":
            native_out[op[2]] = native.sample_bits(op[1])
            bits = cc.sample_bits(op[1])
            for i, bit in enumerate(bits):
                b.tag(f"{op[2]}_{i}", bit)
    circuit = b.build()
    r = circuit.runner()
    r.set_public_inputs(pub_targets)
    traces = r.run()
    return native_out, traces, E


# rate-boundary sweep: every observation count around the duplex rate (8)
# forces a different absorb/padding pattern before the sample
@pytest.mark.parametrize("field", [KOALA_BEAR, BABY_BEAR], ids=["kb", "bb"])
@pytest.mark.parametrize("n_obs", [1, 7, 8, 9, 15, 16, 17])
def test_transcript_rate_boundaries(rng, field, n_obs):
    vals = [int(x) for x in field.rand(rng, (n_obs,))]
    out, traces, _E = run_script_f(
        field, [("observe", n_obs), ("sample", "s")], vals
    )
    assert int(traces.probe("s")[0]) == out["s"]


# output-buffer drain: consecutive samples after one absorb must walk the
# squeeze buffer and re-permute exactly like the native challenger
@pytest.mark.parametrize("field", [KOALA_BEAR, BABY_BEAR], ids=["kb", "bb"])
@pytest.mark.parametrize("n_samples", [2, 8, 9, 17])
def test_transcript_consecutive_samples(rng, field, n_samples):
    vals = [int(x) for x in field.rand(rng, (3,))]
    script = [("observe", 3)] + [
        ("sample", f"s{i}") for i in range(n_samples)
    ]
    out, traces, _E = run_script_f(field, script, vals)
    for i in range(n_samples):
        assert int(traces.probe(f"s{i}")[0]) == out[f"s{i}"]


# observe-after-sample restarts absorption mid-buffer
@pytest.mark.parametrize("field", [KOALA_BEAR, BABY_BEAR], ids=["kb", "bb"])
def test_transcript_observe_after_sample(rng, field):
    vals = [int(x) for x in field.rand(rng, (12,))]
    script = [
        ("observe", 2),
        ("sample", "a"),
        ("observe", 1),
        ("sample", "b"),
        ("observe", 9),
        ("sample", "c"),
    ]
    out, traces, _E = run_script_f(field, script, vals)
    for k in ("a", "b", "c"):
        assert int(traces.probe(k)[0]) == out[k]


# sample_bits widths incl. full-index widths used by FRI/PoW
@pytest.mark.parametrize("bits", [1, 2, 5, 15, 20, 27])
def test_transcript_sample_bits_widths(rng, bits):
    vals = [int(x) for x in KOALA_BEAR.rand(rng, (4,))]
    out, traces, _E = run_script_f(
        KOALA_BEAR, [("observe", 4), ("sample_bits", bits, "q")], vals
    )
    got = sum(int(traces.probe(f"q_{i}")[0]) << i for i in range(bits))
    assert got == out["q"]


# mixed ext/base interleavings around the rate boundary
@pytest.mark.parametrize("field", [KOALA_BEAR, BABY_BEAR], ids=["kb", "bb"])
@pytest.mark.parametrize("lead", [0, 3, 5, 6, 7])
def test_transcript_ext_across_boundary(rng, field, lead):
    E = ext_field(field, 4)
    base_vals = [int(x) for x in field.rand(rng, (lead,))]
    ext_vals = [tuple(int(x) for x in E.rand(rng, ())) for _ in range(3)]
    publics = base_vals + ext_vals
    script = (
        [("observe", lead)]
        + [("observe_ext",)] * 3
        + [("sample_ext", "alpha"), ("sample", "z")]
    )
    out, traces, _E = run_script_f(field, script, publics)
    assert np.array_equal(traces.probe("alpha"), out["alpha"])
    assert int(traces.probe("z")[0]) == out["z"]


# a long realistic transcript: commits, publics, challenges, bits, more
# commits — the shape of a whole batch-stark verification
@pytest.mark.parametrize("field", [KOALA_BEAR, BABY_BEAR], ids=["kb", "bb"])
def test_transcript_long_mixed(rng, field):
    E = ext_field(field, 4)
    base_vals = [int(x) for x in field.rand(rng, (40,))]
    ext_vals = [tuple(int(x) for x in E.rand(rng, ())) for _ in range(2)]
    publics = base_vals[:19] + ext_vals[:1] + base_vals[19:27] + ext_vals[1:] + base_vals[27:]
    script = [
        ("observe", 5),       # instance binding
        ("observe", 8),       # commitment
        ("observe", 6),       # publics
        ("sample_ext", "a"),
        ("observe_ext",),     # terminal
        ("sample_ext", "alpha"),
        ("observe", 8),       # quotient commit
        ("sample_ext", "zeta"),
        ("observe_ext",),
        ("sample_bits", 13, "q0"),
        ("observe", 8),
        ("sample_bits", 13, "q1"),
        ("observe", 5),
        ("sample", "tail"),
    ]
    out, traces, _E2 = run_script_f(field, script, publics)
    for k in ("a", "alpha", "zeta"):
        assert np.array_equal(traces.probe(k), out[k])
    for k, bits in (("q0", 13), ("q1", 13)):
        got = sum(int(traces.probe(f"{k}_{i}")[0]) << i for i in range(bits))
        assert got == out[k]
    assert int(traces.probe("tail")[0]) == out["tail"]
