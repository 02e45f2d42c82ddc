"""Shared test fixtures + AIR satisfaction harness.

TPU-native equivalent of the reference's `p3-test-utils`
(`test-utils/src/lib.rs`; SURVEY.md §2.5): canonical per-field test
configs (so tests never drift from prod params) and the
`check_air_satisfies` / `assert_air_satisfies` / `assert_air_rejects`
per-chip constraint harness.
"""

from __future__ import annotations

import numpy as np

from ..fields.monty31 import U32
from ..stark.fri_pcs import FriParams
from ..stark.symbolic import Air, Evaluator
from ..stark.uni import StarkConfig, baby_bear_config, koala_bear_config


def make_test_config(field_name: str = "koala_bear") -> StarkConfig:
    """Canonical fast test config per field (FriParameters::new_testing)."""
    mk = {"koala_bear": koala_bear_config, "baby_bear": baby_bear_config}[
        field_name
    ]
    return mk(FriParams.testing())


def make_test_config_with_fri(field_name: str, params: FriParams) -> StarkConfig:
    mk = {"koala_bear": koala_bear_config, "baby_bear": baby_bear_config}[
        field_name
    ]
    return mk(params)


def check_air_satisfies(
    config: StarkConfig,
    air: Air,
    trace: np.ndarray,
    publics=(),
    preprocessed: np.ndarray | None = None,
) -> bool:
    """Evaluate every constraint on every row of the (low-degree-free)
    trace with wrap-around next rows and boundary selectors — the debug
    analog of the quotient check (reference `check_constraints`)."""
    F, E = config.field, config.ext
    b = air.build()
    n = trace.shape[0]
    nxt = np.roll(trace, -1, axis=0)
    sel_first = np.zeros(n, dtype=U32)
    sel_first[0] = 1
    sel_last = np.zeros(n, dtype=U32)
    sel_last[-1] = 1
    sel_transition = np.ones(n, dtype=U32)
    sel_transition[-1] = 0
    bindings = {
        "main": {0: ("base", trace), 1: ("base", nxt)},
        "preprocessed": (
            {
                0: ("base", preprocessed),
                1: ("base", np.roll(preprocessed, -1, axis=0)),
            }
            if preprocessed is not None
            else {}
        ),
        "perm": {},
        "publics": [np.uint32(int(x) % F.P) for x in publics],
        "challenges": [],
        "terminals": [],
        "sels": {
            "first": ("base", sel_first),
            "last": ("base", sel_last),
            "transition": ("base", sel_transition),
        },
    }
    ev = Evaluator(F, E, np)
    for kind, v in ev.run(b.constraints, bindings):
        if np.any(np.asarray(v)):
            return False
    return True


def assert_air_satisfies(config, air, trace, publics=(), preprocessed=None):
    assert check_air_satisfies(config, air, trace, publics, preprocessed), (
        "AIR constraints not satisfied"
    )


def assert_air_rejects(config, air, trace, publics=(), preprocessed=None):
    assert not check_air_satisfies(config, air, trace, publics, preprocessed), (
        "AIR unexpectedly satisfied"
    )
