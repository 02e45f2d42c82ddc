"""Mixed (UniStark + BatchStark) and cross-config 2-to-1 aggregation.

Reference: mixed children in `prove_aggregation_layer`
(`recursion/src/recursion.rs:656-770`) and cross-config parameter
switching (`prove_aggregation_layer_cross`, `recursion.rs:772-899`) —
BASELINE config #4's shape.
"""

import numpy as np
import pytest

from plonky3_recursion_tpu.prover import BatchStarkProver
from plonky3_recursion_tpu.recursion.aggregation import (
    UniRecursionInput,
    build_and_prove_aggregation_layer,
)
from plonky3_recursion_tpu.stark.fri_pcs import FriParams
from plonky3_recursion_tpu.stark.uni import koala_bear_config, prove, verify
from tests.test_recursion import make_inner
from tests.test_uni_stark import FibonacciAir, fib_trace


def test_mixed_uni_batch_aggregation():
    config = koala_bear_config(FriParams.testing())
    air = FibonacciAir()
    trace, publics = fib_trace(config.field, 16)
    uni_proof = prove(config, air, trace, publics)
    assert verify(config, air, uni_proof, publics)
    left = UniRecursionInput(uni_proof, air, log_n=4, publics=list(publics))
    _cfg, right = make_inner(n=8)
    out = build_and_prove_aggregation_layer(config, left, right)
    prover = BatchStarkProver(config)
    assert prover.verify_all_tables(out.circuit, out.proof, out.prover_data)
    # app block propagates both children's statements
    rows = [tuple(int(x) for x in r) for r in np.asarray(out.proof.public_values)]
    flat = [r[0] for r in rows]
    for v in publics:
        assert int(v) % config.field.P in flat
    assert len(out.app_public_idx) == len(publics) + len(
        right.circuit.public_rows
    )


def test_cross_config_aggregation():
    """Children proven at testing params, aggregated under a different
    FRI-parameter config (parameter switching up the tree)."""
    out_params = FriParams(
        log_blowup=2,
        log_final_poly_len=0,
        num_queries=6,
        commit_pow_bits=0,
        query_pow_bits=1,
    )
    out_config = koala_bear_config(out_params)
    child_cfg, left = make_inner(n=8)
    _c2, right = make_inner(n=8)
    left.config = child_cfg
    right.config = child_cfg
    out = build_and_prove_aggregation_layer(out_config, left, right)
    prover = BatchStarkProver(out_config)
    assert prover.verify_all_tables(out.circuit, out.proof, out.prover_data)
