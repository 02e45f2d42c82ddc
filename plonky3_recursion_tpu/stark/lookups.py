"""LogUp cross-table lookups: permutation columns + symbolic constraints.

TPU-native equivalent of the reference's upstream `p3-lookup`
(`Lookup`, `LogUpGadget`, permutation-column builder, `check_lookups`;
SURVEY.md §2.6), following the spec in the reference book
(`book/src/architecture_and_internals/lookups.md`):

* For challenge pair (α, β) per named lookup, a row's interaction with
  tuple (t_0..t_{m-1}) and signed multiplicity `mult` contributes
      mult / (β − Σ_k α^k·t_k)
  to the bus; the argument holds iff the global sum over all tables is 0.
* Permutation-column layout per table (reference "single-terminal layout"):
  col 0 = running accumulator (inclusive cumulative sum of row totals),
  then one auxiliary column per interaction *pair-batch* (batching two
  interactions per column keeps the batch constraint at degree 3).
* Constraints added to each AIR:
    aux·d₁·d₂ − (m₁·d₂ + m₂·d₁) = 0        (per pair batch)
    first row:  acc − Σ aux = 0
    transition: acc' − acc − Σ aux' = 0
    last row:   acc − expected_cumulated = 0
  with expected_cumulated a per-proof Terminal value; the verifier also
  checks Σ over all tables of expected_cumulated == 0.

Columns are extension-valued; they commit as base matrices of width
(1 + num_aux)·D via `flatten_ext_matrix`.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..fields.extension import BinomialExtension
from ..fields.monty31 import Monty31, U32
from ..utils import ext_powers
from .symbolic import AirBuilder, Challenge, Evaluator, SExpr, Terminal, Var, _lift

PAIR_BATCH = 2  # interactions per auxiliary column (degree-3 constraints)


@dataclasses.dataclass
class Interaction:
    values: list  # list[SExpr | int] — the bus tuple
    mult: object  # SExpr | int — signed multiplicity (senders +, receivers −)


@dataclasses.dataclass
class Lookup:
    name: str  # e.g. "WitnessChecks"; determines challenge binding
    interactions: list  # list[Interaction]
    kind: str = "global"  # "global": cross-table bus with a per-lookup
    # terminal summing to 0 over all tables; "local": the argument closes
    # WITHIN this table — the accumulator is constrained to 0 on the last
    # row and no terminal appears in the proof (reference p3-lookup
    # `Kind::{Global(name), Local}`, SURVEY.md §2.6).

    def num_aux_cols(self) -> int:
        return (len(self.interactions) + PAIR_BATCH - 1) // PAIR_BATCH


def num_perm_cols(lookups: list[Lookup]) -> int:
    """Permutation width: per lookup one accumulator column + its aux
    columns (reference per-lookup LookupData layout)."""
    return sum(1 + lk.num_aux_cols() for lk in lookups)


def global_lookups(lookups: list[Lookup]) -> list[Lookup]:
    return [lk for lk in lookups if lk.kind == "global"]


def add_lookup_constraints(
    builder: AirBuilder,
    lookups: list[Lookup],
    challenge_idx: dict[str, int],
    terminal_base: int = 0,
):
    """Append LogUp constraints to `builder`.

    `builder` must have been created with num_perm_ext = num_perm_cols and
    enough challenge slots; challenge_idx maps lookup name -> index of its α
    (β is at index+1).  Each GLOBAL lookup binds its accumulator's last row
    to its own Terminal (indices terminal_base, terminal_base+1, … in
    lookup order); a LOCAL lookup's accumulator must close to zero.
    """
    base = 0
    term_idx = terminal_base
    for lk in lookups:
        acc = builder.perm_local[base]
        acc_next = builder.perm_next[base]
        aux_local = builder.perm_local[base + 1 :]
        aux_next = builder.perm_next[base + 1 :]
        alpha = builder.challenges[challenge_idx[lk.name]]
        beta = builder.challenges[challenge_idx[lk.name] + 1]
        col = 0
        for start in range(0, len(lk.interactions), PAIR_BATCH):
            batch = lk.interactions[start : start + PAIR_BATCH]
            denoms = []
            mults = []
            for inter in batch:
                compressed = None
                for k, t in enumerate(inter.values):
                    term = _lift(t)
                    for _ in range(k):
                        term = term * alpha
                    compressed = term if compressed is None else compressed + term
                denoms.append(beta - compressed)
                mults.append(_lift(inter.mult))
            aux = aux_local[col]
            if len(batch) == 1:
                builder.assert_zero(aux * denoms[0] - mults[0])
            else:
                builder.assert_zero(
                    aux * denoms[0] * denoms[1]
                    - (mults[0] * denoms[1] + mults[1] * denoms[0])
                )
            col += 1
        total_local = aux_local[0]
        total_next = aux_next[0]
        for c in range(1, col):
            total_local = total_local + aux_local[c]
            total_next = total_next + aux_next[c]
        builder.when_first_row().assert_zero(acc - total_local)
        builder.when_transition().assert_zero(acc_next - acc - total_next)
        if lk.kind == "global":
            builder.when_last_row().assert_zero(acc - Terminal(term_idx))
            term_idx += 1
        else:
            builder.when_last_row().assert_zero(acc)
        base += 1 + col


def _mod_cumsum_ext(F: Monty31, arr, xp):
    """Inclusive modular cumulative sum along axis 0 of (n, D)."""
    if xp is np:
        return (np.cumsum(arr.astype(np.uint64), axis=0) % F.P).astype(U32)
    import jax

    return jax.lax.associative_scan(lambda a, b: F.add(a, b, xp), arr, axis=0)


def generate_perm_columns(
    F: Monty31,
    E: BinomialExtension,
    lookups: list[Lookup],
    trace_bindings: dict,
    n: int,
    challenges: dict[str, tuple[np.ndarray, np.ndarray]],
    xp,
):
    """Compute the permutation matrix (n, 1+num_aux, D) and the terminal.

    trace_bindings: Evaluator bindings for the main/preprocessed traces
    (natural row order, offset 1 = roll(-1)).  challenges[name] = (α, β).

    Returns (perm, terminals): perm stacks [acc, aux…] per lookup in
    order; terminals holds one (D,) value per GLOBAL lookup (local
    lookups close in-table and carry no terminal).
    """
    ev = Evaluator(F, E, xp)

    # pass 1: compressed denominators + multiplicities per interaction
    denoms = []  # (n, D) per interaction, all lookups flattened
    mults = []  # (kind, value)
    spans = []  # per lookup: list of interaction counts per PAIR_BATCH col
    for lk in lookups:
        alpha, beta = challenges[lk.name]
        per_col = []
        for start in range(0, len(lk.interactions), PAIR_BATCH):
            batch = lk.interactions[start : start + PAIR_BATCH]
            per_col.append(len(batch))
            for inter in batch:
                exprs = [_lift(v) for v in inter.values] + [_lift(inter.mult)]
                vals = ev.run(exprs, trace_bindings)
                # compress with α powers
                comp = None
                apow = ext_powers(E, xp.asarray(alpha), len(inter.values), xp)
                for k, (kind, v) in enumerate(vals[:-1]):
                    if kind == "base":
                        term = E.mul_base(
                            xp.broadcast_to(apow[k], v.shape + (E.D,)), v, xp
                        )
                    else:
                        term = E.mul(v, xp.broadcast_to(apow[k], v.shape), xp)
                    comp = term if comp is None else E.add(comp, term, xp)
                denoms.append(
                    E.sub(
                        xp.broadcast_to(xp.asarray(beta), comp.shape),
                        comp,
                        xp,
                    )
                )
                mults.append(vals[-1])
        spans.append(per_col)

    # batch inversion (Montgomery's trick): ONE extension inversion for
    # all interactions + 3(K-1) ext muls, instead of K inversions — the
    # per-row Fermat/Frobenius inverse dominated permutation-column time
    invs = _batch_inv_ext(E, denoms, xp)

    # pass 2: aux columns, running sums, terminals
    stacked = []
    terminals = []
    ii = 0
    for lk, per_col in zip(lookups, spans):
        cols = []
        for cnt in per_col:
            aux = None
            for _ in range(cnt):
                inv_d = invs[ii]
                mkind, mval = mults[ii]
                ii += 1
                if mkind == "base":
                    term = E.mul_base(inv_d, mval, xp)
                else:
                    term = E.mul(inv_d, mval, xp)
                aux = term if aux is None else E.add(aux, term, xp)
            cols.append(aux)
        total = cols[0]
        for c in cols[1:]:
            total = E.add(total, c, xp)
        acc = _mod_cumsum_ext(F, total, xp)
        stacked.append(xp.stack([acc] + cols, axis=1))
        if lk.kind == "global":
            terminals.append(
                acc[-1] if xp is not np else np.asarray(acc[-1])
            )
    perm = xp.concatenate(stacked, axis=1)  # (n, Σ(1+aux), D)
    return perm, terminals


def _batch_inv_ext(E, xs: list, xp) -> list:
    """Elementwise inverses of a list of (n, D) ext arrays with one E.inv
    (Montgomery batch inversion); values identical to per-array E.inv."""
    k = len(xs)
    if k == 0:
        return []
    if k == 1:
        return [E.inv(xs[0], xp)]
    prefix = [xs[0]]
    for x in xs[1:]:
        prefix.append(E.mul(prefix[-1], x, xp))
    run = E.inv(prefix[-1], xp)
    out = [None] * k
    for i in range(k - 1, 0, -1):
        out[i] = E.mul(run, prefix[i - 1], xp)
        run = E.mul(run, xs[i], xp)
    out[0] = run
    return out


def check_lookups_balance(terminals: list[np.ndarray], E, raise_on_fail=True):
    """Native bus-balance debugger (reference `debug_util::check_lookups`).

    Accepts plain terminal arrays (one implicit bus) or (name, terminal)
    pairs — pairs are balanced PER NAME, matching the reference's
    per-lookup terminals."""
    by_name: dict[str, object] = {}
    for t in terminals:
        if isinstance(t, tuple):
            nm, val = t
        else:
            nm, val = "", t
        prev = by_name.get(nm)
        val = np.asarray(val, dtype=U32)
        by_name[nm] = val if prev is None else E.add(prev, val, np)
    bad = {nm: tot for nm, tot in by_name.items() if np.any(tot)}
    if raise_on_fail and bad:
        raise ValueError(f"lookup bus imbalance: terminal sums {bad}")
    return not bad
