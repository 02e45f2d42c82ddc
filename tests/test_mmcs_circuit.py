"""In-circuit MMCS verification vs native Merkle commitments."""

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
    sibs = [[b.private_input() for _ in range(8)] for _ in range(log_max)]
    gadget.verify_batch(commitment, dims, index_bits, opened, sibs)
    return b.build()


def test_mmcs_circuit_accepts_native_proof(rng):
    mmcs = MerkleMmcs(KOALA_BEAR)
    mats = [KOALA_BEAR.rand(rng, (16, 5)), KOALA_BEAR.rand(rng, (8, 3))]
    root, tree = mmcs.commit(mats)
    dims = [(16, 5), (8, 3)]
    circuit = build_gadget_circuit(dims, 4)
    for index in (0, 5, 15):
        opened, sibs = mmcs.open_batch(index, tree)
        r = circuit.runner()
        bits = [(index >> i) & 1 for i in range(4)]
        r.set_public_inputs([int(x) for x in root] + bits)
        priv = [int(v) for row in opened for v in row] + [
            int(v) for s in sibs for v in s
        ]
        r.set_private_inputs(priv)
        r.run()  # passes iff the in-circuit root matches


def test_mmcs_circuit_rejects_bad_proof(rng):
    mmcs = MerkleMmcs(KOALA_BEAR)
    mats = [KOALA_BEAR.rand(rng, (8, 4))]
    root, tree = mmcs.commit(mats)
    circuit = build_gadget_circuit([(8, 4)], 3)
    index = 3
    opened, sibs = mmcs.open_batch(index, tree)
    bits = [(index >> i) & 1 for i in range(3)]
    # tamper an opened value
    priv = [int(v) for row in opened for v in row]
    priv[0] ^= 1
    priv += [int(v) for s in sibs for v in s]
    r = circuit.runner()
    r.set_public_inputs([int(x) for x in root] + bits)
    r.set_private_inputs(priv)
    with pytest.raises(WitnessConflict):
        r.run()
    # wrong index bits
    r = circuit.runner()
    bad_bits = list(bits)
    bad_bits[0] ^= 1
    r.set_public_inputs([int(x) for x in root] + bad_bits)
    r.set_private_inputs(
        [int(v) for row in opened for v in row]
        + [int(v) for s in sibs for v in s]
    )
    with pytest.raises(WitnessConflict):
        r.run()
