"""Pause CPython's cyclic GC over allocation-heavy regions.

Building a recursion-layer circuit or tracing a whole-stage jaxpr creates
millions of small, acyclic-in-practice objects; CPython's generational GC
rescans the growing heap every ~700 net allocations, which turns those
phases quadratic (observed: minutes of "Garbage-collecting" frames inside
`trace_to_jaxpr` on the bench workload).  Pausing collection across the
region and letting the next natural trigger collect afterwards removes
that overhead without unbounded growth: the region's objects stay live
(they become the circuit / the jaxpr), so there is nothing for the GC to
reclaim mid-build anyway.

Reentrant: nested pauses keep the GC off until the outermost exit.
"""

from __future__ import annotations

import contextlib
import functools
import gc

_depth = 0


@contextlib.contextmanager
def gc_paused():
    global _depth
    outer = _depth == 0 and gc.isenabled()
    if outer:
        gc.disable()
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1
        if outer and _depth == 0:
            gc.enable()


def gc_paused_fn(fn):
    """Decorator form of `gc_paused` for the allocation-heavy entry points
    (circuit build, layer prep, prove)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with gc_paused():
            return fn(*args, **kwargs)

    return wrapped
