"""Circuit IR/builder/runner tests, incl. the reference's canonical toy
`37*x - 111 = 0` example (SURVEY.md §4, `construction.md:43-61`)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import (
    CircuitBuilder,
    MissingInput,
    WitnessConflict,
)
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field

E4 = ext_field(KOALA_BEAR, 4)
E1 = ext_field(KOALA_BEAR, 1)


def test_toy_example_37_times_x_minus_111():
    b = CircuitBuilder(E4)
    x = b.public_input()
    t = b.mul(b.const(37), x)
    b.assert_zero(b.sub(t, b.const(111)))
    circuit = b.build()
    r = circuit.runner()
    r.set_public_inputs([3])
    traces = r.run()
    assert tuple(traces.value(circuit.public_rows[0])) == (3, 0, 0, 0)
    # wrong input conflicts
    r2 = circuit.runner()
    r2.set_public_inputs([4])
    with pytest.raises(WitnessConflict):
        r2.run()


def test_cse_and_const_pool():
    b = CircuitBuilder(E4)
    x = b.public_input()
    a1 = b.add(x, b.const(5))
    a2 = b.add(x, b.const(5))
    assert a1 == a2  # CSE dedups
    assert b.const(5) == b.const(5)
    # publics never dedup
    assert b.public_input() != x


def test_sub_div_solving():
    b = CircuitBuilder(E4)
    x = b.public_input()
    y = b.public_input()
    d = b.sub(x, y)
    q = b.div(x, y)
    b.tag("d", d)
    b.tag("q", q)
    c = b.build()
    r = c.runner()
    r.set_public_inputs([10, 4])
    t = r.run()
    assert tuple(t.probe("d"))[0] == 6
    q_val = t.probe("q")
    got = E4.mul(q_val, np.asarray([4, 0, 0, 0], dtype=np.uint32), np)
    assert tuple(got) == (10, 0, 0, 0)


def test_ext_arithmetic_in_circuit(rng):
    b = CircuitBuilder(E4)
    xv = E4.rand(rng, ())
    yv = E4.rand(rng, ())
    x = b.public_input()
    y = b.public_input()
    m = b.mul(x, y)
    b.tag("m", m)
    c = b.build()
    r = c.runner()
    r.set_public_inputs([tuple(xv), tuple(yv)])
    t = r.run()
    assert np.array_equal(t.probe("m"), E4.mul(xv, yv, np))


def test_select_and_bool():
    b = CircuitBuilder(E4)
    cond = b.public_input()
    b.assert_bool(cond)
    out = b.select(cond, b.const(77), b.const(33))
    b.tag("out", out)
    c = b.build()
    for cv, want in [(1, 77), (0, 33)]:
        r = c.runner()
        r.set_public_inputs([cv])
        assert int(r.run().probe("out")[0]) == want
    r = c.runner()
    r.set_public_inputs([2])
    with pytest.raises(WitnessConflict):
        r.run()


def test_decompose_to_bits():
    b = CircuitBuilder(E4)
    x = b.public_input()
    bits = b.decompose_to_bits(x, 8)
    for i, bit in enumerate(bits):
        b.tag(f"b{i}", bit)
    c = b.build()
    r = c.runner()
    r.set_public_inputs([0b10110001])
    t = r.run()
    got = [int(t.probe(f"b{i}")[0]) for i in range(8)]
    assert got == [1, 0, 0, 0, 1, 1, 0, 1]
    # out-of-range input fails the recomposition check
    r = c.runner()
    r.set_public_inputs([256])
    with pytest.raises(WitnessConflict):
        r.run()


def test_recompose_decompose_ext():
    b = CircuitBuilder(E4)
    coeffs = [b.public_input() for _ in range(4)]
    ext = b.recompose_base_coeffs_to_ext(coeffs)
    b.tag("ext", ext)
    back = b.decompose_ext_to_base_coeffs(ext)
    for i, cc in enumerate(back):
        b.tag(f"c{i}", cc)
    c = b.build()
    r = c.runner()
    r.set_public_inputs([3, 5, 7, 9])
    t = r.run()
    assert tuple(t.probe("ext")) == (3, 5, 7, 9)
    for i, want in enumerate([3, 5, 7, 9]):
        assert int(t.probe(f"c{i}")[0]) == want


def test_exp_and_inner_product():
    b = CircuitBuilder(E1)
    x = b.public_input()
    e = b.exp_power_of_2(x, 3)  # x^8
    b.tag("e", e)
    ip = b.inner_product([b.const(2), b.const(3)], [x, x])
    b.tag("ip", ip)
    c = b.build()
    r = c.runner()
    r.set_public_inputs([5])
    t = r.run()
    assert int(t.probe("e")[0]) == pow(5, 8, KOALA_BEAR.P)
    assert int(t.probe("ip")[0]) == 25


def test_missing_inputs_raise():
    b = CircuitBuilder(E4)
    x = b.public_input()
    y = b.private_input()
    b.tag("s", b.add(x, y))
    c = b.build()
    r = c.runner()
    r.set_public_inputs([1])
    with pytest.raises(MissingInput):
        r.run()
    r2 = c.runner()
    r2.set_public_inputs([1])
    r2.set_private_inputs([2])
    assert int(r2.run().probe("s")[0]) == 3


def test_bus_multiplicities_balance():
    """Sum over all touches of each witness must be zero (send T-1,
    receives -1 each)."""
    b = CircuitBuilder(E4)
    x = b.public_input()
    t = b.mul(b.const(37), x)
    b.assert_zero(b.sub(t, b.const(111)))
    c = b.build()
    per_wid = np.zeros(c.witness_count, dtype=np.int64)
    for w, _v, m in c.const_rows:
        per_wid[w] += m
    for pos, w in enumerate(c.public_rows):
        per_wid[w] += c.public_mults[pos]
    for r in c.alu_rows:
        for s, w in r.slots():
            per_wid[w] += r.mults[s]
    # every touched wid balances
    touched = np.zeros(c.witness_count, dtype=bool)
    for w, _v, _m in c.const_rows:
        touched[w] = True
    assert np.all(per_wid == 0)


def test_connect_merges_across_levels():
    b = CircuitBuilder(E4)
    x = b.public_input()
    y = b.mul(x, x)
    z = b.public_input()
    b.connect(y, z)  # z must equal x^2
    c = b.build()
    r = c.runner()
    r.set_public_inputs([3, 9])
    r.run()
    r = c.runner()
    r.set_public_inputs([3, 8])
    with pytest.raises(WitnessConflict):
        r.run()


def test_muladd_fusion_pass():
    """Post-lowering a·b+c fusion (reference optimizer `fuse_mul_add`):
    single-use MUL feeding an ADD lowers to ONE MULADD row; shared or
    tagged intermediates are preserved."""
    from plonky3_recursion_tpu.circuit.compile import K_ADD, K_MUL, K_MULADD

    b = CircuitBuilder(E4)
    x, y, z = b.public_input(), b.public_input(), b.public_input()
    b.tag("s", b.add(b.mul(x, y), z))
    c = b.build()
    assert [r.kind for r in c.alu_rows] == [K_MULADD]
    r = c.runner()
    r.set_public_inputs([3, 5, 7])
    assert int(r.run().probe("s")[0]) == 22

    # shared intermediate must NOT fuse
    b = CircuitBuilder(E4)
    x, y, z = b.public_input(), b.public_input(), b.public_input()
    t = b.mul(x, y)
    b.tag("s", b.add(t, z))
    b.tag("s2", b.add(t, x))
    c = b.build()
    assert sorted(r.kind for r in c.alu_rows) == [K_ADD, K_ADD, K_MUL]

    # tagged (probed) intermediate must NOT fuse
    b = CircuitBuilder(E4)
    x, y, z = b.public_input(), b.public_input(), b.public_input()
    t = b.mul(x, y)
    b.tag("t", t)
    b.tag("s", b.add(t, z))
    c = b.build()
    assert sorted(r.kind for r in c.alu_rows) == [K_ADD, K_MUL]


# ----- canonicity of full-width bit decompositions -----
# (closes the v+p encoding slack the reference leaves open,
# circuit_builder.rs:1066; see CircuitBuilder.assert_bits_canonical)

from plonky3_recursion_tpu.fields import BABY_BEAR


def _canonicity_circuit(field):
    E = ext_field(field, 4)
    b = CircuitBuilder(E)
    bits = [b.private_input() for _ in range(31)]
    for t in bits:
        b.assert_bool(t)
    b.assert_bits_canonical(bits)
    return b.build()


@pytest.mark.parametrize("field", ["kb", "bb"])
def test_canonicity_accepts_canonical_values(field):
    F = KOALA_BEAR if field == "kb" else BABY_BEAR
    circuit = _canonicity_circuit(F)
    for v in (0, 1, 3, F.P - 1, (1 << 31) - F.P - 1):
        r = circuit.runner()
        r.set_private_inputs([(v >> i) & 1 for i in range(31)])
        r.run()


@pytest.mark.parametrize("field", ["kb", "bb"])
def test_canonicity_rejects_v_plus_p(field):
    F = KOALA_BEAR if field == "kb" else BABY_BEAR
    circuit = _canonicity_circuit(F)
    # every representable non-canonical encoding v+p (v < 2^31 - p)
    for v in (1, 2, (1 << 31) - F.P - 1):
        attack = v + F.P
        assert attack < (1 << 31)
        r = circuit.runner()
        r.set_private_inputs([(attack >> i) & 1 for i in range(31)])
        with pytest.raises(WitnessConflict):
            r.run()


def test_decompose_canonical_flag_end_to_end():
    """decompose_to_bits(canonical=True) still round-trips honest values."""
    b = CircuitBuilder(E4)
    x = b.public_input()
    bits = b.decompose_to_bits(x, 31, canonical=True)
    for i, bit in enumerate(bits):
        b.tag(f"b{i}", bit)
    circuit = b.build()
    for v in (0, 12345, KOALA_BEAR.P - 1):
        r = circuit.runner()
        r.set_public_inputs([v])
        traces = r.run()
        got = sum(int(traces.probe(f"b{i}")[0]) << i for i in range(31))
        assert got == v
