"""In-circuit MMCS verification vs native Merkle commitments (chained
Poseidon2 table: siblings/direction bits are NPO private data, the final
index-sum lookup binds the path to the index bits)."""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder, WitnessConflict
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.prover.poseidon2_table import (
    koala_bear_poseidon2_npo,
)
from plonky3_recursion_tpu.recursion.mmcs_circuit import MmcsGadget
from plonky3_recursion_tpu.stark.merkle import MerkleMmcs

E4 = ext_field(KOALA_BEAR, 4)


def build_gadget_circuit(dims, log_max):
    b = CircuitBuilder(E4)
    npo = koala_bear_poseidon2_npo()
    b.enable_op(npo)
    gadget = MmcsGadget(b, npo.type_id)
    commitment = [b.public_input() for _ in range(8)]
    index_bits = [b.public_input() for _ in range(log_max)]
    for bit in index_bits:
        b.assert_bool(bit)
    opened = [[b.private_input() for _ in range(w)] for _h, w in dims]
    gadget.verify_batch(commitment, dims, index_bits, opened, tag="T")
    return b.build()


def _run(circuit, root, bits, opened, sibs, index, tamper=None):
    r = circuit.runner()
    r.set_public_inputs([int(x) for x in root] + bits)
    priv = [int(v) for row in opened for v in row]
    if tamper is not None:
        priv[tamper] ^= 1
    r.set_private_inputs(priv)
    for lv, s in enumerate(sibs):
        r.set_private_data(
            ("T", lv), {"bit": (index >> lv) & 1, "sibling": np.asarray(s)}
        )
    return r.run()


def test_mmcs_circuit_accepts_native_proof(rng):
    mmcs = MerkleMmcs(KOALA_BEAR)
    mats = [KOALA_BEAR.rand(rng, (16, 5)), KOALA_BEAR.rand(rng, (8, 3))]
    root, tree = mmcs.commit(mats)
    dims = [(16, 5), (8, 3)]
    circuit = build_gadget_circuit(dims, 4)
    for index in (0, 5, 15):
        opened, sibs = mmcs.open_batch(index, tree)
        bits = [(index >> i) & 1 for i in range(4)]
        _run(circuit, root, bits, opened, sibs, index)


def test_mmcs_circuit_rejects_bad_proof(rng):
    mmcs = MerkleMmcs(KOALA_BEAR)
    mats = [KOALA_BEAR.rand(rng, (8, 4))]
    root, tree = mmcs.commit(mats)
    circuit = build_gadget_circuit([(8, 4)], 3)
    index = 3
    opened, sibs = mmcs.open_batch(index, tree)
    bits = [(index >> i) & 1 for i in range(3)]
    # tamper an opened value
    with pytest.raises(WitnessConflict):
        _run(circuit, root, bits, opened, sibs, index, tamper=0)
    # direction bits inconsistent with the claimed index bits: the runner
    # computes a root for the wrong index -> root connect fails, and even
    # if it matched, the index-sum lookup would not balance
    bad_bits = list(bits)
    bad_bits[0] ^= 1
    with pytest.raises(WitnessConflict):
        _run(circuit, root, bad_bits, opened, sibs, index)


def test_mmcs_index_sum_binds_bits(rng):
    """A prover using direction bits that disagree with the public index
    bits cannot satisfy the index-sum binding even if the root happens to
    connect: the sum wire is an NPO output, so the runner writes the
    accumulated value and the expected-sum check row must then agree."""
    mmcs = MerkleMmcs(KOALA_BEAR)
    mats = [KOALA_BEAR.rand(rng, (8, 4))]
    root, tree = mmcs.commit(mats)
    circuit = build_gadget_circuit([(8, 4)], 3)
    index = 5
    opened, sibs = mmcs.open_batch(index, tree)
    bits = [(index >> i) & 1 for i in range(3)]
    traces = _run(circuit, root, bits, opened, sibs, index)
    # sum wire must hold the bit-reversed accumulation of the path bits
    want = 0
    for lv in range(3):
        want = 2 * want + ((index >> lv) & 1)
    sum_wid = [c for c in circuit.npo_calls if c.sum_out is not None][0].sum_out
    assert int(traces.witness[sum_wid][0]) == want
