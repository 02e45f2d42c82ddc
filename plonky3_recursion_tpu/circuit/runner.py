"""CircuitRunner: vectorized witness generation + trace extraction.

TPU-native redesign of the reference's `CircuitRunner`
(`circuit/src/tables/runner.rs:22`; SURVEY.md §2.1).  Instead of the
reference's linear op walk, rows execute level-by-level: each level is a
batched gather → field op → scatter over the witness table, so witness
generation for wide circuits is data-parallel (the reference's rayon
equivalent, SURVEY.md §2.7).

Write-once semantics: every slot has one creator; check rows and hint
re-writes must agree with the existing value or a WitnessConflict raises —
the runtime face of the bus-balance argument.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..fields.monty31 import U32
from .compile import (
    Circuit,
    K_ADD,
    K_BOOL,
    K_MUL,
    K_MULADD,
    SOLVE_A,
    SOLVE_CHECK,
    SOLVE_OUT,
)


class WitnessConflict(ValueError):
    pass


class MissingInput(ValueError):
    pass


@dataclasses.dataclass
class Traces:
    """All data the table provers need (reference `Traces<F>`)."""

    circuit: Circuit
    witness: np.ndarray  # (witness_count, D) canonical
    npo_records: dict = dataclasses.field(default_factory=dict)
    # npo_records[type_id][op_id] = executor record (e.g. input state)
    # npo_arrays[type_id] = {"states", "bits", "sums", "bits2"} in
    # call-list order (chained plugins; array form of npo_records)
    npo_arrays: dict = dataclasses.field(default_factory=dict)

    def value(self, wid: int) -> np.ndarray:
        return self.witness[wid]

    def probe(self, tag: str) -> np.ndarray:
        return self.witness[self.circuit.tags[tag]]


class _ExecPlan:
    """Per-circuit execution plan: everything `CircuitRunner.__init__` can
    precompute once and reuse across proofs of the same (static) circuit.
    Building the level groups / flat native arrays walks every ALU row —
    tens of ms for recursion-sized circuits — and sat INSIDE the per-proof
    timing before this cache."""

    def __init__(self, circuit: Circuit):
        # pre-group alu rows by (level, kind, solve)
        groups: dict[tuple, list] = {}
        for r in circuit.alu_rows:
            groups.setdefault((r.level, r.kind, r.solve), []).append(r)
        self.groups_by_level: dict[int, list] = {}
        for (lvl, kind, solve), rows in groups.items():
            self.groups_by_level.setdefault(lvl, []).append(
                (
                    kind,
                    solve,
                    np.asarray([r.a for r in rows], dtype=np.int64),
                    np.asarray([r.b for r in rows], dtype=np.int64),
                    np.asarray([r.c for r in rows], dtype=np.int64),
                    np.asarray([r.out for r in rows], dtype=np.int64),
                )
            )
        self.hints_by_level: dict[int, list] = {}
        for h in circuit.hint_ops:
            self.hints_by_level.setdefault(h.level, []).append(h)
        self.npos_by_level: dict[int, list] = {}
        for call in circuit.npo_calls:
            self.npos_by_level.setdefault(call.level, []).append(call)
        self.levels = sorted(
            set(self.groups_by_level)
            | set(self.hints_by_level)
            | set(self.npos_by_level)
        )
        # coerced const rows (filled lazily by the first runner)
        self.const_cache: tuple | None = None
        # chained-NPO static arrays, keyed (type_id, level), + dense chain
        # index per type_id (filled lazily by the first runner)
        self.chained_static: dict = {}
        self.chain_index: dict = {}
        self.chained_slots: dict = {}  # type_id -> {op_id: call-list pos}
        self.chained_counts: dict = {}
        self.chain_perm: dict = {}  # type_id -> chain-order permutation
        # native executor: level-sorted flat row arrays (C++ hot loop).
        # Binomial extensions only — trinomial (quintic) circuits fall
        # back to the vectorized numpy path.
        limbs = getattr(circuit.ext, "limbs", 1)
        self.native = None
        self.flat = None
        if limbs == 1 and (hasattr(circuit.ext, "W") or circuit.ext.D == 1):
            try:
                from ..native import execute_alu_rows, get_lib

                get_lib()
                self.native = execute_alu_rows
            except Exception:
                pass
        if self.native is not None:
            order = sorted(
                range(len(circuit.alu_rows)),
                key=lambda i: circuit.alu_rows[i].level,
            )
            rows = [circuit.alu_rows[i] for i in order]
            self.flat = (
                np.asarray([r.level for r in rows], dtype=np.int64),
                np.asarray([r.kind for r in rows], dtype=np.uint8),
                np.asarray([r.solve for r in rows], dtype=np.uint8),
                np.ascontiguousarray([r.a for r in rows], dtype=np.int32),
                np.ascontiguousarray([r.b for r in rows], dtype=np.int32),
                np.ascontiguousarray([r.c for r in rows], dtype=np.int32),
                np.ascontiguousarray([r.out for r in rows], dtype=np.int32),
            )


def _exec_plan(circuit: Circuit) -> _ExecPlan:
    plan = getattr(circuit, "_exec_plan_cache", None)
    if plan is None:
        plan = _ExecPlan(circuit)
        circuit._exec_plan_cache = plan
    return plan


class _NativeSchedule:
    """Whole-circuit native execution plan: the full interleaved level
    schedule (ALU ranges, chained perm levels, decompose hints, recompose,
    packed Horner) flattened into arrays for ONE C++ walk per span
    (`p3n_run_schedule`).  Levels with content C++ can't run (generic
    hints, unknown plugins, Poseidon1 chains) become python pause items.
    Built once per circuit and cached on the exec plan."""

    def __init__(self, circuit: Circuit, plan: _ExecPlan):
        d = circuit.ext.D
        self.d = d
        levels_arr = plan.flat[0]
        segs: list = []  # (type, start, end, aux)
        self.program: list = []  # ("cxx", lo, hi) | ("hints", l) | ("npos", l)
        # --- chained plugin slots (plugins with a native permutation) ---
        self.perm_plugins: list = []
        perm_slot: dict = {}
        self.chain_base: dict = {}
        self.slot_base: dict = {}
        chain_total = 0
        slot_total = 0
        # flattened per-call arrays, appended in schedule order
        cflags: list = []
        chain_ids: list = []
        in_w: list = []
        out_w: list = []
        sum_o: list = []
        cslots: list = []
        self.ctags: list = []
        self.cmerkle: list = []
        # hints
        eh_in: list = []
        eh_out: list = []
        bh_in: list = []
        bh_meta: list = []
        bh_out: list = []
        # recompose / horner
        rc_in: list = []
        rc_out: list = []
        rc_slots: list = []
        self.rc_plugin = None
        rc_pos: dict = {}
        h_in: list = []
        h_out: list = []
        h_slots: list = []
        self.h_plugin = None
        self.h_k = 0
        h_pos: dict = {}

        self._cxx_lo = 0

        def cxx_seg(t, s, e, aux=0):
            # merge contiguous same-type segments (same aux) — EXCEPT
            # chained-perm levels (type 1): a level's states batch-read
            # chain state before the permute, so levels must stay separate
            if (
                t != 1
                and segs
                and segs[-1][0] == t
                and segs[-1][2] == s
                and segs[-1][3] == aux
            ):
                segs[-1] = (t, segs[-1][1], e, aux)
            else:
                segs.append((t, s, e, aux))

        def pause(item):
            if len(segs) > self._cxx_lo:
                self.program.append(("cxx", self._cxx_lo, len(segs)))
                self._cxx_lo = len(segs)
            self.program.append(item)

        pos = 0
        for lvl in plan.levels:
            # hints first (python order: hints -> alu -> npos)
            hints = plan.hints_by_level.get(lvl, [])
            py_hints = []
            for h in hints:
                if h.kind == "ext_decompose":
                    cxx_seg(2, len(eh_in), len(eh_in) + 1)
                    eh_in.append(h.inputs[0])
                    eh_out.extend(h.outputs)
                elif h.kind == "bit_decompose":
                    cxx_seg(3, len(bh_in), len(bh_in) + 1)
                    bh_in.append(h.inputs[0])
                    bh_meta.append(h.meta)
                    bh_out.append(list(h.outputs))
                else:
                    py_hints.append(h)
            if py_hints:
                pause(("hints", py_hints))
            # ALU rows of this level
            end = pos + int(
                np.searchsorted(levels_arr[pos:], lvl, side="right")
            )
            if end > pos:
                cxx_seg(0, pos, end)
                pos = end
            # NPO groups of this level
            npos = plan.npos_by_level.get(lvl, [])
            by_plugin: dict = {}
            for c in npos:
                by_plugin.setdefault(c.plugin.type_id, []).append(c)
            for tid, cs in by_plugin.items():
                plugin = cs[0].plugin
                if getattr(plugin, "chained", False):
                    native = plugin._native_perm() if hasattr(
                        plugin, "_native_perm"
                    ) else None
                    if native is None:
                        pause(("npos", cs))
                        continue
                    if tid not in perm_slot:
                        perm_slot[tid] = len(self.perm_plugins)
                        self.perm_plugins.append((plugin, native))
                        cidx = plan.chain_index.get(tid)
                        if cidx is None:
                            # force chain index construction
                            cidx = {}
                            for call in circuit.npo_calls:
                                if call.plugin.type_id == tid:
                                    cidx.setdefault(call.chain, len(cidx))
                            plan.chain_index[tid] = cidx
                        self.chain_base[tid] = chain_total
                        chain_total += len(cidx)
                        base = plan.chained_slots.get(tid)
                        if not base:
                            base = {}
                            p2 = 0
                            for call in circuit.npo_calls:
                                if call.plugin.type_id == tid:
                                    base[call.op_id] = p2
                                    p2 += 1
                            plan.chained_slots[tid] = base
                            plan.chained_counts[tid] = p2
                        self.slot_base[tid] = slot_total
                        slot_total += plan.chained_counts[tid]
                    slot = perm_slot[tid]
                    width = plugin.params.width
                    n_limbs = width // d
                    cidx = plan.chain_index[tid]
                    sbase = plan.chained_slots[tid]
                    s0 = len(cflags)
                    for c in cs:
                        fl = (
                            (1 if c.new_start else 0)
                            | (2 if c.merkle_path else 0)
                            | (
                                4
                                if c.merkle_path
                                and getattr(c, "merkle_arity", 2) == 4
                                else 0
                            )
                        )
                        cflags.append(fl)
                        chain_ids.append(
                            self.chain_base[tid] + cidx[c.chain]
                        )
                        iw = [-1] * n_limbs
                        ow = [-1] * n_limbs
                        for l, wid in enumerate(c.inputs):
                            if wid is not None:
                                iw[l] = wid
                        for l, wid in enumerate(c.outputs):
                            if wid is not None:
                                ow[l] = wid
                        in_w.append(iw)
                        out_w.append(ow)
                        sum_o.append(
                            -1 if c.sum_out is None else c.sum_out
                        )
                        cslots.append(
                            self.slot_base[tid] + sbase[c.op_id]
                        )
                        self.ctags.append(c.tag)
                        self.cmerkle.append(bool(c.merkle_path))
                    cxx_seg(1, s0, len(cflags), slot)
                elif (
                    tid.startswith("recompose/")
                    and hasattr(plugin, "execute_batch")
                    and all(
                        len(c.inputs) == d
                        and None not in c.inputs
                        and len(c.outputs) == 1
                        for c in cs
                    )
                    and (self.rc_plugin is None or plugin is self.rc_plugin)
                ):
                    self.rc_plugin = plugin
                    s0 = len(rc_in)
                    for c in cs:
                        rc_in.append(list(c.inputs))
                        rc_out.append(c.outputs[0])
                        rc_slots.append(
                            rc_pos.setdefault(c.op_id, len(rc_pos))
                        )
                    cxx_seg(4, s0, len(rc_in))
                elif (
                    tid.startswith("horner/")
                    and hasattr(plugin, "execute_batch")
                    and all(
                        None not in c.inputs and len(c.outputs) == 1
                        for c in cs
                    )
                    and (self.h_plugin is None or plugin is self.h_plugin)
                ):
                    self.h_plugin = plugin
                    self.h_k = plugin.k
                    s0 = len(h_in)
                    for c in cs:
                        h_in.append(list(c.inputs))
                        h_out.append(c.outputs[0])
                        h_slots.append(
                            h_pos.setdefault(c.op_id, len(h_pos))
                        )
                    cxx_seg(5, s0, len(h_in), plugin.k)
                else:
                    pause(("npos", cs))
        if len(segs) > self._cxx_lo:
            self.program.append(("cxx", self._cxx_lo, len(segs)))
        self.segs = np.ascontiguousarray(
            np.asarray(segs, dtype=np.int64).reshape(-1, 4)
        )
        self.n_chained = len(cflags)
        self.max_limbs = max(
            (w // d for (p_, n_) in self.perm_plugins for w in
             [p_.params.width]),
            default=1,
        )
        self.max_width = max(
            (p_.params.width for (p_, n_) in self.perm_plugins), default=1
        )
        self.chain_total = chain_total

        def arr(x, dtype, shape2=None):
            a = np.asarray(x, dtype=dtype)
            if a.size == 0:
                a = np.zeros((0,) if shape2 is None else (0, shape2), dtype)
            return np.ascontiguousarray(a)

        self.cflags = arr(cflags, np.uint8)
        self.chain_ids = arr(chain_ids, np.int32)
        iw_m = np.full((len(in_w), self.max_limbs), -1, dtype=np.int32)
        ow_m = np.full((len(out_w), self.max_limbs), -1, dtype=np.int32)
        for i, row in enumerate(in_w):
            iw_m[i, : len(row)] = row
        for i, row in enumerate(out_w):
            ow_m[i, : len(row)] = row
        self.in_wids = iw_m
        self.out_wids = ow_m
        self.sum_outs = arr(sum_o, np.int32)
        self.cslots = arr(cslots, np.int32)
        self.eh_in = arr(eh_in, np.int32)
        self.eh_out = arr(np.asarray(eh_out, np.int32).reshape(-1, d)
                          if eh_out else np.zeros((0, d)), np.int32)
        self.bh_in = arr(bh_in, np.int32)
        self.bh_meta = arr(bh_meta, np.int32)
        flat_bh = [w for outs in bh_out for w in outs]
        self.bh_out = arr(flat_bh, np.int32)
        offs = [0]
        for outs in bh_out:
            offs.append(offs[-1] + len(outs))
        self.bh_off = arr(offs[:-1], np.int64)
        self.rc_in = arr(rc_in, np.int32, d)
        self.rc_out = arr(rc_out, np.int32)
        self.rc_slots = arr(rc_slots, np.int32)
        self.h_in = arr(h_in, np.int32, 2 + self.h_k)
        self.h_out = arr(h_out, np.int32)
        self.h_slots = arr(h_slots, np.int32)
        self.rc_pos = rc_pos
        self.h_pos = h_pos
        self.cmerkle_idx = np.nonzero(
            np.asarray(self.cmerkle, dtype=bool)
        )[0]


class _LazyRecords(dict):
    """Per-op record dict materialized on first access (the device path
    consumes the array form and never pays the per-op build)."""

    def __init__(self, fill):
        super().__init__()
        self._fill = fill
        self._done = False

    def _ensure(self):
        if not self._done:
            self._done = True
            self._fill(self)

    def __getitem__(self, k):
        self._ensure()
        return dict.__getitem__(self, k)

    def get(self, k, default=None):
        self._ensure()
        return dict.get(self, k, default)

    def __len__(self):
        self._ensure()
        return dict.__len__(self)

    def __iter__(self):
        self._ensure()
        return dict.__iter__(self)


class CircuitRunner:
    def __init__(self, circuit: Circuit):
        self.c = circuit
        d = circuit.ext.D
        # cell layout: one u32 per base coefficient for Monty31 fields;
        # fields wider than 32 bits (Goldilocks) carry a trailing limb dim
        # (ext.limbs == 2: [lo, hi] u32 pairs, fields/goldilocks.py)
        self.limbs = getattr(circuit.ext, "limbs", 1)
        cell = (d, self.limbs) if self.limbs > 1 else (d,)
        self.wit = np.zeros((circuit.witness_count,) + cell, dtype=U32)
        self.defined = np.zeros(circuit.witness_count, dtype=bool)
        self.npo_private: dict = {}
        self.npo_arrays: dict = {}
        plan = _exec_plan(circuit)
        self.groups_by_level = plan.groups_by_level
        self.hints_by_level = plan.hints_by_level
        self.npos_by_level = plan.npos_by_level
        self._levels = plan.levels
        self._ran = False
        self.npo_records: dict[str, list] = {}
        self._native = plan.native
        self._flat = plan.flat

    # ----- inputs -----

    def _coerce(self, v) -> np.ndarray:
        d = self.c.ext.D
        if self.limbs > 1:
            return self._coerce_limbed(v, d)
        if isinstance(v, (int, np.integer)):
            out = np.zeros(d, dtype=U32)
            out[0] = int(v) % self.c.ext.base.P
            return out
        arr = np.asarray(v)
        if arr.shape == ():
            return self._coerce(int(arr))
        assert arr.shape == (d,), arr.shape
        return (arr.astype(np.uint64) % self.c.ext.base.P).astype(U32)

    def _coerce_limbed(self, v, d: int) -> np.ndarray:
        """Limbed-field cells: int / (d,) ints -> (d, limbs) u32."""
        F = self.c.ext.base
        if isinstance(v, (int, np.integer)):
            out = np.zeros((d, self.limbs), dtype=U32)
            out[0] = F.from_ints([int(v)])[0]
            return out
        arr = np.asarray(v)
        if arr.shape == (d, self.limbs):
            return arr.astype(U32)
        if arr.shape == ():
            return self._coerce_limbed(int(arr), d)
        flat = np.asarray(v, dtype=object).reshape(-1)
        assert flat.shape == (d,), flat.shape
        return np.stack([F.from_ints([int(x)])[0] for x in flat])

    def _cell_ints(self, cell: np.ndarray) -> tuple:
        """Witness cell -> tuple of python ints (one per coefficient)."""
        if self.limbs == 1:
            return tuple(int(x) for x in cell)
        return tuple(
            int(cell[j, 0]) | (int(cell[j, 1]) << 32)
            for j in range(cell.shape[0])
        )

    def set_witness(self, wid: int, value):
        value = self._coerce(value)
        if self.defined[wid]:
            if not np.array_equal(self.wit[wid], value):
                raise WitnessConflict(
                    f"witness {wid}: {self.wit[wid]} vs {value}"
                )
            return
        self.wit[wid] = value
        self.defined[wid] = True

    def _coerce_many(self, values) -> np.ndarray:
        """Batch _coerce: one vectorized pass when every value is a plain
        scalar (the dominant case when packing recursion-layer inputs —
        tens of thousands of base-embedded ints)."""
        d = self.c.ext.D
        if self.limbs == 1 and values:
            try:
                ints = [int(v) for v in values]
            except (TypeError, ValueError):
                ints = None
            if ints is not None:
                out = np.zeros((len(values), d), dtype=U32)
                out[:, 0] = (
                    np.asarray(ints, dtype=np.uint64) % self.c.ext.base.P
                ).astype(U32)
                return out
        cell = self.wit.shape[1:]
        if not values:
            return np.zeros((0,) + cell, dtype=U32)
        return np.stack([self._coerce(v) for v in values])

    def set_public_inputs(self, values):
        if len(values) != len(self.c.public_rows):
            raise MissingInput(
                f"expected {len(self.c.public_rows)} publics, got {len(values)}"
            )
        self._scatter_checked(
            np.asarray(self.c.public_rows, dtype=np.int64),
            self._coerce_many(values),
        )

    def set_private_inputs(self, values):
        """External (prover-supplied) private inputs, in creation order."""
        ext_rows = self.c.external_private_rows
        if len(values) != len(ext_rows):
            raise MissingInput(
                f"expected {len(ext_rows)} private inputs, got {len(values)}"
            )
        self._scatter_checked(
            np.asarray(ext_rows, dtype=np.int64),
            self._coerce_many(values),
        )

    def set_private_data(self, key, data):
        """NPO private data (e.g. Merkle siblings), keyed by npo tag."""
        self.npo_private[key] = data

    # ----- execution -----

    def run(self) -> Traces:
        from ..utils.tracing import span

        with span("runner.run"):
            return self._run()

    def _run(self) -> Traces:
        assert not self._ran
        self._ran = True
        c = self.c
        E = c.ext
        F = E.base
        if c.const_rows:
            plan = _exec_plan(c)
            if plan.const_cache is None:
                plan.const_cache = (
                    np.asarray([r[0] for r in c.const_rows], dtype=np.int64),
                    np.stack([self._coerce(r[1]) for r in c.const_rows]),
                )
            self._scatter_checked(*plan.const_cache)
        for wid in c.public_rows:
            if not self.defined[wid]:
                raise MissingInput("public inputs not set")
        levels = self._levels
        if self._native is not None:
            plan = _exec_plan(c)
            ns = getattr(plan, "native_schedule", None)
            if ns is None:
                ns = plan.native_schedule = _NativeSchedule(c, plan)
            self._run_native_schedule(ns)
            return self._finish()
        for lvl in levels:
            self._run_hints(self.hints_by_level.get(lvl, []))
            for kind, solve, a, b, cc, out in self.groups_by_level.get(
                lvl, []
            ):
                va = self.wit[a]
                vb = self.wit[b]
                vc = self.wit[cc]
                if kind == K_BOOL:
                    sq = E.mul(va, va, np)
                    if not np.array_equal(sq, va):
                        bad = np.nonzero(np.any(sq != va, axis=-1))[0][0]
                        raise WitnessConflict(
                            f"bool check failed on witness {a[bad]}"
                        )
                    continue
                if solve == SOLVE_A:
                    vo = self.wit[out]
                    if kind == K_ADD:
                        res = E.sub(vo, vb, np)
                    else:  # K_MUL: a = out / b
                        res = E.mul(vo, E.inv(vb, np), np)
                    self._scatter(a, res)
                    continue
                if kind == K_ADD:
                    res = E.add(va, vb, np)
                elif kind == K_MUL:
                    res = E.mul(va, vb, np)
                else:  # K_MULADD
                    res = E.add(E.mul(va, vb, np), vc, np)
                if solve == SOLVE_OUT:
                    self._scatter(out, res)
                else:  # check
                    vo = self.wit[out]
                    if not np.array_equal(res, vo):
                        bad = np.nonzero(np.any(res != vo, axis=-1))[0][0]
                        raise WitnessConflict(
                            f"check row mismatch on witness {out[bad]}: "
                            f"{res[bad]} vs {vo[bad]}"
                        )
            self._run_npos(self.npos_by_level.get(lvl, []))
        return self._finish()

    def _finish(self) -> Traces:
        undef = np.nonzero(~self.defined)[0]
        if undef.size:
            raise MissingInput(
                f"{undef.size} witnesses undefined, first {undef[:5]}"
            )
        return Traces(
            circuit=self.c,
            witness=self.wit,
            npo_records=self.npo_records,
            npo_arrays=self.npo_arrays,
        )

    def _run_native_schedule(self, ns: "_NativeSchedule"):
        """Drive the C++ whole-schedule executor: one native call per
        contiguous C++-able span, python pauses only for generic hints /
        non-native plugins."""
        from ..native import run_schedule

        c = self.c
        d = c.ext.D
        E = c.ext
        plan = _exec_plan(c)
        n_ch = ns.n_chained
        chain_states = np.zeros(
            (max(ns.chain_total, 1), ns.max_width), dtype=U32
        )
        chain_sums = np.zeros(max(ns.chain_total, 1), dtype=np.int64)
        chain_valid = np.zeros(max(ns.chain_total, 1), dtype=np.uint8)
        rec_states = np.zeros((max(n_ch, 1), ns.max_width), dtype=U32)
        rec_bits = np.zeros(max(n_ch, 1), dtype=np.uint8)
        rec_sums = np.zeros(max(n_ch, 1), dtype=np.int64)
        rec_bits2 = np.zeros(max(n_ch, 1), dtype=np.uint8)
        priv_bits = np.zeros(max(n_ch, 1), dtype=np.uint8)
        priv_bits2 = np.zeros(max(n_ch, 1), dtype=np.uint8)
        priv_sibs = np.zeros((max(n_ch, 1), 24), dtype=U32)
        sib_lens = np.zeros(max(n_ch, 1), dtype=np.uint8)
        for i in ns.cmerkle_idx:
            tag = ns.ctags[i]
            priv = self.npo_private.get(tag) if tag is not None else None
            if priv is None:
                continue
            if "bits" in priv:  # arity 4
                b_, b2_ = priv["bits"]
                priv_bits[i] = int(b_)
                priv_bits2[i] = int(b2_)
                sib = np.asarray(
                    priv.get("siblings"), dtype=U32
                ).reshape(-1)
                priv_sibs[i, : sib.size] = sib
            else:
                priv_bits[i] = int(priv.get("bit", 0))
                sib = priv.get("sibling")
                if sib is not None:
                    sib = np.asarray(sib, dtype=U32).reshape(-1)
                    priv_sibs[i, : sib.size] = sib
                    sib_lens[i] = sib.size
        rc_rec = np.zeros((max(len(ns.rc_out), 1), d), dtype=U32)
        h_rec = np.zeros(
            (max(len(ns.h_out), 1), (2 + ns.h_k) * d), dtype=U32
        )
        F = E.base
        w_binomial = E.W if E.D > 1 else 0
        defined_u8 = self.defined.view(np.uint8)
        perm_handles = [n_.handle for (_p, n_) in ns.perm_plugins]
        perm_widths = [p_.params.width for (p_, _n) in ns.perm_plugins]
        for item in ns.program:
            if item[0] == "cxx":
                ret = run_schedule(
                    F,
                    int(w_binomial),
                    d,
                    self.wit,
                    defined_u8,
                    plan.flat,
                    ns,
                    item[1],
                    item[2],
                    perm_handles,
                    perm_widths,
                    priv_bits,
                    priv_bits2,
                    priv_sibs,
                    sib_lens,
                    chain_states,
                    chain_sums,
                    chain_valid,
                    rec_states,
                    rec_bits,
                    rec_sums,
                    rec_bits2,
                    rc_rec,
                    h_rec,
                )
                if ret >= 0:
                    t, idx = ret >> 48, ret & ((1 << 48) - 1)
                    kinds = {
                        0: "alu row",
                        1: "chained perm call",
                        2: "ext_decompose hint",
                        3: "bit_decompose hint",
                        4: "recompose call",
                        5: "horner call",
                    }
                    raise WitnessConflict(
                        f"native schedule failed at {kinds[t]} {idx}"
                    )
            elif item[0] == "hints":
                self._run_hints(item[1])
            else:
                self._run_npos(item[1])
        # ---- publish records (array form + lazy per-op dicts) ----
        for plugin, _native in ns.perm_plugins:
            tid = plugin.type_id
            base = ns.slot_base[tid]
            n = plan.chained_counts[tid]
            width = plugin.params.width
            arrs = {
                "states": rec_states[base : base + n, :width],
                "bits": rec_bits[base : base + n].astype(np.int64),
                "sums": rec_sums[base : base + n],
                "bits2": rec_bits2[base : base + n].astype(np.int64),
            }
            self.npo_arrays[tid] = arrs
            sbase = plan.chained_slots[tid]

            def fill_chained(recs, tid=tid, arrs=arrs, sbase=sbase):
                for call in self.c.npo_calls:
                    if call.plugin.type_id != tid:
                        continue
                    sl = sbase[call.op_id]
                    recs[call.op_id] = (
                        arrs["states"][sl],
                        arrs["bits"][sl],
                        arrs["sums"][sl],
                        arrs["bits2"][sl],
                    )

            self.npo_records[tid] = _LazyRecords(fill_chained)
        if ns.rc_plugin is not None and len(ns.rc_out):
            def fill_rc(recs):
                for op_id, sl in ns.rc_pos.items():
                    recs[op_id] = rc_rec[sl]

            self.npo_records[ns.rc_plugin.type_id] = _LazyRecords(fill_rc)
        if ns.h_plugin is not None and len(ns.h_out):
            def fill_h(recs):
                for op_id, sl in ns.h_pos.items():
                    recs[op_id] = h_rec[sl]

            self.npo_records[ns.h_plugin.type_id] = _LazyRecords(fill_h)

    def _run_native(self, levels: list):
        """C++ ALU execution in level-ordered segments, pausing at levels
        with hints/NPOs (which still run in python/vectorized form)."""
        E = self.c.ext
        F = E.base
        levels_arr, kinds, solves, a, b, c, out = self._flat
        defined_u8 = self.defined.view(np.uint8)
        w_binomial = E.W if E.D > 1 else 0
        n = len(kinds)
        pos = 0

        def flush(end):
            nonlocal pos
            if end > pos:
                err = self._native(
                    F,
                    int(w_binomial),
                    E.D,
                    self.wit,
                    defined_u8,
                    kinds[pos:end],
                    solves[pos:end],
                    a[pos:end],
                    b[pos:end],
                    c[pos:end],
                    out[pos:end],
                )
                if err >= 0:
                    r = pos + int(err)
                    raise WitnessConflict(
                        f"alu row {r} (kind {kinds[r]}, solve {solves[r]}, "
                        f"out wid {out[r]}) failed"
                    )
                pos = end

        for lvl in levels:
            hints = self.hints_by_level.get(lvl)
            if hints:
                flush(pos + int(np.searchsorted(levels_arr[pos:], lvl)))
                self._run_hints(hints)
            npos = self.npos_by_level.get(lvl)
            if npos:
                flush(
                    pos
                    + int(
                        np.searchsorted(levels_arr[pos:], lvl, side="right")
                    )
                )
                self._run_npos(npos)
        flush(n)

    def _run_hints(self, hints: list):
        """Execute a level's hints; same-kind hints run as one vectorized
        batch (the per-instance python closures dominated witness
        generation for recursion-sized circuits)."""
        E = self.c.ext
        d = E.D
        groups: dict[tuple, list] = {}
        for h in hints:
            groups.setdefault((h.kind, h.meta), []).append(h)
        for (kind, meta), hs in groups.items():
            if kind == "ext_decompose":
                in_wids = np.asarray([h.inputs[0] for h in hs], dtype=np.int64)
                vals = self.wit[in_wids]  # (k, D) or (k, D, limbs)
                out_wids = np.asarray(
                    [w for h in hs for w in h.outputs], dtype=np.int64
                )
                cell = self.wit.shape[1:]
                outs = np.zeros((len(hs) * d,) + cell, dtype=U32)
                outs[:, 0] = vals.reshape((-1,) + cell[1:])
                self._scatter_checked(out_wids, outs)
            elif kind == "bit_decompose":
                in_wids = np.asarray([h.inputs[0] for h in hs], dtype=np.int64)
                vals = self.wit[in_wids][:, 0]  # (k,) or (k, limbs)
                if self.limbs == 1:
                    shifts = np.arange(meta, dtype=U32)
                    bits = (vals[:, None] >> shifts[None, :]) & U32(1)
                else:
                    lo = vals[:, 0].astype(np.uint64)
                    hi = vals[:, 1].astype(np.uint64)
                    full = lo | (hi << np.uint64(32))  # (k,) u64
                    shifts = np.arange(meta, dtype=np.uint64)
                    bits = (
                        (full[:, None] >> shifts[None, :]) & np.uint64(1)
                    ).astype(U32)
                out_wids = np.asarray(
                    [w for h in hs for w in h.outputs], dtype=np.int64
                )
                cell = self.wit.shape[1:]
                outs = np.zeros((len(hs) * meta,) + cell, dtype=U32)
                if self.limbs == 1:
                    outs[:, 0] = bits.reshape(-1)
                else:
                    outs[:, 0, 0] = bits.reshape(-1)
                self._scatter_checked(out_wids, outs)
            else:  # generic python hints
                for h in hs:
                    ins = [self._cell_ints(self.wit[w]) for w in h.inputs]
                    for w, v in zip(h.outputs, h.fn(ins)):
                        self.set_witness(w, v)

    def _chained_static(self, plugin, cs: list, level: int):
        """Static (circuit-shaped) arrays for one level's chained perm
        calls, cached on the circuit's exec plan: flag masks, dense chain
        ids, CTL input/output scatter indices."""
        plan = _exec_plan(self.c)
        key = (plugin.type_id, level)
        st = plan.chained_static.get(key)
        if st is not None:
            return st
        # dense chain index, consistent across levels (built once from the
        # full circuit-order call list)
        cidx = plan.chain_index.get(plugin.type_id)
        if cidx is None:
            cidx = {}
            for call in self.c.npo_calls:
                if call.plugin.type_id == plugin.type_id:
                    cidx.setdefault(call.chain, len(cidx))
            plan.chain_index[plugin.type_id] = cidx
        d = self.c.ext.D
        width = plugin.params.width
        n_limbs = width // d
        k = len(cs)
        new_start = np.asarray([c.new_start for c in cs], dtype=bool)
        merkle = np.asarray([bool(c.merkle_path) for c in cs], dtype=bool)
        arity4 = merkle & np.asarray(
            [getattr(c, "merkle_arity", 2) == 4 for c in cs], dtype=bool
        )
        chain_ids = np.asarray([cidx[c.chain] for c in cs], dtype=np.int64)
        in_wids = np.full((k, n_limbs), -1, dtype=np.int64)
        out_wids = np.full((k, n_limbs), -1, dtype=np.int64)
        sum_outs = np.full(k, -1, dtype=np.int64)
        for i, c in enumerate(cs):
            for l, wid in enumerate(c.inputs):
                if wid is not None:
                    in_wids[i, l] = wid
            for l, wid in enumerate(c.outputs):
                if wid is not None:
                    out_wids[i, l] = wid
            if c.sum_out is not None:
                sum_outs[i] = c.sum_out
        in_r, in_l = np.nonzero(in_wids >= 0)
        out_r, out_l = np.nonzero(out_wids >= 0)
        # position of each call within the plugin's full circuit-order
        # call list (for array-form records)
        base = plan.chained_slots.setdefault(plugin.type_id, {})
        if not base:
            pos = 0
            for call in self.c.npo_calls:
                if call.plugin.type_id == plugin.type_id:
                    base[call.op_id] = pos
                    pos += 1
            plan.chained_counts[plugin.type_id] = pos
        st = {
            "slots": np.asarray(
                [base[c.op_id] for c in cs], dtype=np.int64
            ),
            "n_chains": len(cidx),
            "n_limbs": n_limbs,
            "new_start": new_start,
            "merkle": merkle,
            "arity4": arity4,
            "chain_ids": chain_ids,
            "in_rl": (in_r, in_l, in_wids[in_r, in_l]),
            "out_rl": (out_r, out_l, out_wids[out_r, out_l]),
            "sum_rows": np.nonzero(sum_outs >= 0)[0],
            "sum_wids": sum_outs[sum_outs >= 0],
            "m2_rows": np.nonzero(merkle & ~arity4)[0],
            "m4_rows": np.nonzero(arity4)[0],
            "tags": [c.tag for c in cs],
            "op_ids": [c.op_id for c in cs],
        }
        plan.chained_static[key] = st
        return st

    def _run_chained(self, plugin, cs: list):
        """Chained perm calls of one level: assemble each call's input state
        from (chain state | private sibling | CTL'd witness values | merkle
        swap), run ONE batched permutation, scatter outputs and update chain
        state (reference `poseidon_perm/executor.rs:924-970` semantics,
        vectorized across the level's independent chains — per-call python
        work is limited to private-data dict lookups on merkle rows)."""
        E = self.c.ext
        d = E.D
        width = plugin.params.width
        rate = width // 2
        s = self._chained_static(plugin, cs, cs[0].level)
        k = len(cs)
        tail = (self.limbs,) if self.limbs > 1 else ()
        if not hasattr(self, "_chain_state"):
            self._chain_state: dict = {}
        cstate = self._chain_state.get(plugin.type_id)
        if cstate is None:
            cstate = (
                np.zeros((s["n_chains"], width) + tail, dtype=U32),
                np.zeros(s["n_chains"], dtype=np.int64),
                np.zeros(s["n_chains"], dtype=bool),
            )
            self._chain_state[plugin.type_id] = cstate
        chain_arr, chain_sums, chain_valid = cstate
        ids = s["chain_ids"]
        new_start, merkle, arity4 = s["new_start"], s["merkle"], s["arity4"]
        prev_states = chain_arr[ids]
        prev_sums = chain_sums[ids]
        need_prev = ~new_start
        if not np.all(chain_valid[ids] | ~need_prev):
            bad = np.nonzero(need_prev & ~chain_valid[ids])[0][0]
            raise MissingInput(
                f"npo chain {cs[bad].chain} op {cs[bad].op_id}: no prior "
                "output to chain from"
            )
        states = np.zeros((k, width) + tail, dtype=U32)
        m_full = need_prev & ~merkle
        states[m_full] = prev_states[m_full]
        m2 = merkle & ~arity4
        states[m2, :rate] = prev_states[m2, :rate]
        bits = np.zeros(k, dtype=np.int64)
        bits2 = np.zeros(k, dtype=np.int64)
        npo_private = self.npo_private
        for i in s["m2_rows"]:
            tag = s["tags"][i]
            priv = npo_private.get(tag) if tag is not None else None
            if priv is not None:
                bits[i] = int(priv.get("bit", 0))
                sib = priv.get("sibling")
                if sib is not None:
                    sib = np.asarray(sib, dtype=U32)
                    states[i, rate : rate + sib.shape[0]] = sib
        for i in s["m4_rows"]:
            tag = s["tags"][i]
            priv = npo_private.get(tag) if tag is not None else None
            # priv: {"bits": (b, b2), "siblings": (3, 8)} — the running
            # digest goes to slot b + 2·b2; the other three 8-element slots
            # hold the private sibling digests
            if priv is not None:
                b_, b2_ = (int(x) for x in priv.get("bits", (0, 0)))
                bits[i], bits2[i] = b_, b2_
                sibs = np.asarray(priv.get("siblings"), dtype=U32).reshape(
                    3, 8
                )
            else:
                b_ = b2_ = 0
                sibs = np.zeros((3, 8), dtype=U32)
            pos = b_ + 2 * b2_
            si = 0
            for q in range(4):
                if q == pos:
                    states[i, 8 * q : 8 * q + 8] = prev_states[i, :8]
                else:
                    states[i, 8 * q : 8 * q + 8] = sibs[si]
                    si += 1
        # CTL'd witness inputs overwrite chain/sibling placements
        in_r, in_l, in_w = s["in_rl"]
        if in_r.size:
            sv = states.reshape((k, s["n_limbs"], d) + tail)
            sv[in_r, in_l] = self.wit[in_w]
        # arity-2 merkle direction swap (after CTL placement)
        m_swap = m2 & (bits == 1)
        if np.any(m_swap):
            tmp = states[m_swap, :rate].copy()
            states[m_swap, :rate] = states[m_swap, rate:]
            states[m_swap, rate:] = tmp
        psum = np.where(chain_valid[ids], prev_sums, 0)
        sums = np.where(
            arity4,
            4 * psum + bits + 2 * bits2,
            np.where(merkle, 2 * psum + bits, 0),
        )
        outs = plugin.permute_states(states)
        out_r, out_l, out_w = s["out_rl"]
        if out_r.size:
            ov = outs.reshape((k, s["n_limbs"], d) + tail)
            self._scatter_checked(out_w, ov[out_r, out_l])
        if s["sum_rows"].size:
            sv = np.zeros((s["sum_rows"].size, d) + tail, dtype=U32)
            if tail:
                sv[:, 0, 0] = sums[s["sum_rows"]].astype(U32)
            else:
                sv[:, 0] = sums[s["sum_rows"]].astype(U32)
            self._scatter_checked(s["sum_wids"], sv)
        chain_arr[ids] = outs
        chain_sums[ids] = sums
        chain_valid[ids] = True
        # array-form records in call-list order (consumed wholesale by the
        # device table builders), plus the per-op dict (numpy scalars —
        # int() conversion deferred to consumers that need python ints)
        arrs = self.npo_arrays.get(plugin.type_id)
        if arrs is None:
            n_all = _exec_plan(self.c).chained_counts[plugin.type_id]
            arrs = self.npo_arrays[plugin.type_id] = {
                "states": np.zeros((n_all, width) + tail, dtype=U32),
                "bits": np.zeros(n_all, dtype=np.int64),
                "sums": np.zeros(n_all, dtype=np.int64),
                "bits2": np.zeros(n_all, dtype=np.int64),
            }
        slots = s["slots"]
        arrs["states"][slots] = states
        arrs["bits"][slots] = bits
        arrs["sums"][slots] = sums
        arrs["bits2"][slots] = bits2
        recs = self.npo_records.setdefault(plugin.type_id, {})
        op_ids = s["op_ids"]
        for i in range(k):
            recs[op_ids[i]] = (states[i], bits[i], sums[i], bits2[i])

    def _run_npos(self, calls: list):
        """Execute a level's NPO calls; plugins exposing execute_batch run
        all their calls in one vectorized invocation."""
        groups: dict[str, list] = {}
        for call in calls:
            groups.setdefault(call.plugin.type_id, []).append(call)
        for _tid, cs in groups.items():
            plugin = cs[0].plugin
            if getattr(plugin, "chained", False):
                self._run_chained(plugin, cs)
            elif hasattr(plugin, "execute_batch") and all(
                self.npo_private.get(c.tag) is None for c in cs
            ):
                ins = np.stack(
                    [
                        np.concatenate([self.wit[w] for w in c.inputs])
                        for c in cs
                    ]
                )
                outs, records = plugin.execute_batch(ins)
                n_out = len(cs[0].outputs)
                d = self.c.ext.D
                out_wids = np.asarray(
                    [w for c in cs for w in c.outputs], dtype=np.int64
                )
                self._scatter_checked(
                    out_wids, outs.reshape(len(cs) * n_out, d)
                )
                for c, rec in zip(cs, records):
                    self.npo_records.setdefault(plugin.type_id, {})[
                        c.op_id
                    ] = rec
            else:
                for call in cs:
                    ins = [self.wit[w].copy() for w in call.inputs]
                    priv = self.npo_private.get(call.tag)
                    outs, record = call.plugin.execute(
                        call.config, ins, priv
                    )
                    for w, v in zip(call.outputs, outs):
                        self.set_witness(w, v)
                    self.npo_records.setdefault(call.plugin.type_id, {})[
                        call.op_id
                    ] = record

    def _scatter_checked(self, wids: np.ndarray, values: np.ndarray):
        """Batch set_witness tolerating intra-batch duplicate wids (DSU can
        merge outputs of distinct hints/NPOs): duplicates and already-
        defined slots must agree or WitnessConflict raises."""
        uniq, first_idx, counts = np.unique(
            wids, return_index=True, return_counts=True
        )
        if uniq.size != wids.size:
            dup_wids = uniq[counts > 1]
            for w in dup_wids:
                rows = values[wids == w]
                if not np.all(rows == rows[0]):
                    raise WitnessConflict(
                        f"duplicate batch write disagrees on witness {w}"
                    )
        already = self.defined[wids]
        if np.any(already):
            idx = np.nonzero(already)[0]
            if not np.array_equal(self.wit[wids[idx]], values[idx]):
                raise WitnessConflict(
                    f"batch write disagrees on witness {wids[idx][0]}"
                )
        self.wit[wids] = values
        self.defined[wids] = True

    def _scatter(self, wids: np.ndarray, values: np.ndarray):
        already = self.defined[wids]
        if np.any(already):
            idx = np.nonzero(already)[0]
            if not np.array_equal(self.wit[wids[idx]], values[idx]):
                raise WitnessConflict(
                    f"duplicate write disagrees on witness {wids[idx][0]}"
                )
        self.wit[wids] = values
        self.defined[wids] = True
