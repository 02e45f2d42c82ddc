"""Multi-shape recursion via height normalization (reference
`book/src/advanced_topics/scaling.md` "Flexible FRI verification": a
fixed verifier circuit serving a RANGE of computation sizes).

The fixed-point verifier circuit is purely structural (value-free consts,
prep commitment as public input), so normalizing table heights with
`TablePacking.min_trace_height` makes DIFFERENT-SIZED inner programs
produce IDENTICAL instance shapes — one verifier circuit + one offline
prep verifies them all (the padding-based realization of proof lifting:
smaller computations are lifted to the shared domain at proving time).
"""

import numpy as np
import pytest

from plonky3_recursion_tpu.circuit import CircuitBuilder
from plonky3_recursion_tpu.fields import KOALA_BEAR, ext_field
from plonky3_recursion_tpu.prover import BatchStarkProver, circuit_prover_data
from plonky3_recursion_tpu.prover.batch_prover import TablePacking
from plonky3_recursion_tpu.recursion.recursion import (
    RecursionInput,
    build_next_layer_prep,
    inner_fingerprint,
    prove_next_layer,
)
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import koala_bear_config

E4 = ext_field(KOALA_BEAR, 4)
LIFT_H = 64  # shared (lifted) table height for all program sizes


def _fib_inner(config, n, packing):
    b = CircuitBuilder(E4)
    a = b.public_input()
    bb = b.public_input()
    res = b.public_input()
    for _ in range(n):
        a, bb = bb, b.add(a, bb)
    b.connect(bb, res)
    circuit = b.build()
    pdata = circuit_prover_data(config, circuit, packing=packing)
    x, y = 0, 1
    for _ in range(n):
        x, y = y, (x + y) % KOALA_BEAR.P
    r = circuit.runner()
    r.set_public_inputs([0, 1, y])
    prover = BatchStarkProver(config)
    proof = prover.prove_all_tables(circuit, r.run(), pdata)
    assert prover.verify_all_tables(circuit, proof, pdata)
    return RecursionInput(proof, circuit, pdata)


def test_one_verifier_circuit_serves_multiple_sizes():
    config = koala_bear_config(FriParams.testing())
    packing = TablePacking(min_trace_height=LIFT_H)
    inner_small = _fib_inner(config, 8, packing)
    inner_large = _fib_inner(config, 40, packing)
    # height normalization makes the shapes (and hence the verifier
    # circuit fingerprint) identical across program sizes
    fp_small = inner_fingerprint(config, inner_small)
    fp_large = inner_fingerprint(config, inner_large)
    assert fp_small == fp_large
    # ONE prep (circuit + offline preprocessed commitment) proves both
    prep = build_next_layer_prep(config, inner_small)
    prover = BatchStarkProver(config)
    layer_s = prove_next_layer(config, prep, inner_small.proof)
    assert prover.verify_all_tables(prep.circuit, layer_s, prep.pdata)
    layer_l = prove_next_layer(config, prep, inner_large.proof)
    assert prover.verify_all_tables(prep.circuit, layer_l, prep.pdata)
    # the two layers genuinely attest different statements (app publics)
    assert not np.array_equal(
        np.asarray(layer_s.public_values),
        np.asarray(layer_l.public_values),
    )


def test_unlifted_sizes_have_distinct_fingerprints():
    """Without height normalization the shapes (and circuits) differ —
    the lifting is what buys the shared verifier."""
    config = koala_bear_config(FriParams.testing())
    inner_small = _fib_inner(config, 8, TablePacking())
    inner_large = _fib_inner(config, 40, TablePacking())
    assert inner_fingerprint(config, inner_small) != inner_fingerprint(
        config, inner_large
    )
