"""Hierarchical span timing (reference `tracing`/`tracing-forest` analog).

SURVEY.md §5: the reference instruments `prove_all_tables`,
`CircuitRunner::run` etc. with tracing spans whose durations are the
published benchmark numbers.  This is the same capability: nested spans
with wall-clock durations, dumped as an indented tree.

Enable with env `P3_TRACE=1` (or `enable()`); `report()` prints the tree
and `last_tree()` returns it for the benchmark harness (scripts/benchmark.py
greps span durations into CSV like the reference's benchmark.sh).
"""

from __future__ import annotations

import contextlib
import os
import time

_enabled = os.environ.get("P3_TRACE", "") == "1"
_root: list = []
_stack: list = []


def enable(on: bool = True):
    global _enabled
    _enabled = on


@contextlib.contextmanager
def span(name: str):
    if not _enabled:
        yield
        return
    node = {"name": name, "start": time.time(), "dur": None, "children": []}
    (_stack[-1]["children"] if _stack else _root).append(node)
    _stack.append(node)
    try:
        yield
    finally:
        _stack.pop()
        node["dur"] = time.time() - node["start"]


def reset():
    _root.clear()
    _stack.clear()


def last_tree():
    return list(_root)


def report(out=None):
    lines = []

    def walk(node, depth):
        lines.append(f"{'  ' * depth}{node['name']}: {node['dur']*1e3:.1f} ms")
        for c in node["children"]:
            walk(c, depth + 1)

    for n in _root:
        walk(n, 0)
    text = "\n".join(lines)
    if out is None:
        print(text)
    return text


def find_span(name: str):
    """Total duration of all spans with this name (seconds)."""

    def walk(nodes):
        total = 0.0
        for n in nodes:
            if n["name"] == name and n["dur"] is not None:
                total += n["dur"]
            total += walk(n["children"])
        return total

    return walk(_root)
