"""ctypes loader for the C++ scalar reference library.

Builds `libp3native.so` with g++ on first use (cached next to the source)
and exposes thin Python wrappers mirroring the pure-python scalar paths —
the two implementations cross-check each other in tests (golden vectors,
SURVEY.md §4 pyramid level 1).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..fields.monty31 import Monty31, U32
from ..ops.poseidon2 import Poseidon2Params

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libp3native.so")
_SRC = os.path.join(_DIR, "p3_native.cpp")
_lib = None


def _build():
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    # preferred: OpenMP + native tuning; degrade gracefully where missing
    for extra in (["-fopenmp", "-march=native"], ["-fopenmp"], []):
        try:
            subprocess.run(
                base[:1] + extra + base[1:], check=True,
                capture_output=True,
            )
            return
        except subprocess.CalledProcessError:
            continue
    subprocess.run(base, check=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
        _SRC
    ):
        _build()
    lib = ctypes.CDLL(_SO)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.p3n_mulmod.restype = ctypes.c_uint32
    lib.p3n_mulmod.argtypes = [ctypes.c_uint32] * 5
    lib.p3n_mulmod_vec.argtypes = [
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_uint32,
        u32p,
        u32p,
        u32p,
        ctypes.c_uint64,
    ]
    lib.p3n_poseidon2_new.restype = ctypes.c_void_p
    lib.p3n_poseidon2_new.argtypes = [
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        u32p,
        u32p,
        u32p,
    ]
    lib.p3n_poseidon2_free.argtypes = [ctypes.c_void_p]
    lib.p3n_poseidon2_permute.argtypes = [ctypes.c_void_p, u32p, ctypes.c_uint64]
    lib.p3n_poseidon2_permute_rows.argtypes = [
        ctypes.c_void_p,
        u32p,
        u32p,
        ctypes.c_uint64,
    ]
    lib.p3n_poseidon2_table_rows.argtypes = [
        ctypes.c_void_p,
        u32p,
        u32p,
        ctypes.c_int,
        u32p,
        ctypes.c_uint64,
    ]
    lib.p3n_challenger_new.restype = ctypes.c_void_p
    lib.p3n_challenger_new.argtypes = [ctypes.c_void_p]
    lib.p3n_challenger_free.argtypes = [ctypes.c_void_p]
    lib.p3n_challenger_observe.argtypes = [ctypes.c_void_p, u32p, ctypes.c_uint64]
    lib.p3n_challenger_sample.argtypes = [ctypes.c_void_p, u32p, ctypes.c_uint64]
    lib.p3n_challenger_grind.restype = ctypes.c_uint64
    lib.p3n_challenger_grind.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_uint64,
    ]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.p3n_execute_alu.restype = ctypes.c_int64
    lib.p3n_execute_alu.argtypes = [
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_int,
        u32p,
        u8p,
        u8p,
        u8p,
        i32p,
        i32p,
        i32p,
        i32p,
        ctypes.c_int64,
    ]
    i64p = ctypes.POINTER(ctypes.c_int64)
    vpp = ctypes.POINTER(ctypes.c_void_p)
    lib.p3n_run_schedule.restype = ctypes.c_int64
    lib.p3n_run_schedule.argtypes = (
        [ctypes.c_uint32] * 4
        + [ctypes.c_int]  # d
        + [u32p, u8p]  # wit, defined
        + [u8p, u8p, i32p, i32p, i32p, i32p]  # alu
        + [i64p, ctypes.c_int64]  # segs
        + [vpp, i32p, ctypes.c_int]  # perms
        + [u8p, i32p, i32p, i32p, i32p, i32p, ctypes.c_int]  # chained
        + [u8p, u8p, u32p, u8p]  # priv
        + [u32p, i64p, u8p, ctypes.c_int]  # chain state, max_width
        + [u32p, u8p, i64p, u8p]  # records
        + [i32p, i32p]  # ext hints
        + [i32p, i32p, i32p, i64p]  # bit hints
        + [i32p, i32p, i32p, u32p]  # recompose
        + [i32p, i32p, i32p, u32p]  # horner
    )
    _lib = lib
    return lib


def run_schedule(
    field,
    ext_w,
    d,
    wit,
    defined,
    flat,
    ns,
    seg_lo,
    seg_hi,
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
):
    """Run segments [seg_lo, seg_hi) of a `_NativeSchedule` natively.
    Returns -1 on success or (type<<48)|index of the failing unit."""
    import ctypes as ct

    lib = get_lib()
    u32 = ct.POINTER(ct.c_uint32)
    u8 = ct.POINTER(ct.c_uint8)
    i32 = ct.POINTER(ct.c_int32)
    i64 = ct.POINTER(ct.c_int64)

    def p(a, t):
        return a.ctypes.data_as(t)

    handles = (ct.c_void_p * max(len(perm_handles), 1))(
        *[ct.c_void_p(h) for h in perm_handles]
    )
    widths = np.asarray(perm_widths or [0], dtype=np.int32)
    _levels, kinds, solves, a, b, c, out = flat
    segs = ns.segs[seg_lo:seg_hi]
    segs = np.ascontiguousarray(segs, dtype=np.int64)
    return lib.p3n_run_schedule(
        field.P,
        field.NP,
        field.R2,
        ext_w,
        d,
        p(wit, u32),
        p(defined, u8),
        p(kinds, u8),
        p(solves, u8),
        p(a, i32),
        p(b, i32),
        p(c, i32),
        p(out, i32),
        p(segs, i64),
        segs.shape[0],
        handles,
        p(widths, i32),
        len(perm_handles),
        p(ns.cflags, u8),
        p(ns.chain_ids, i32),
        p(ns.in_wids, i32),
        p(ns.out_wids, i32),
        p(ns.sum_outs, i32),
        p(ns.cslots, i32),
        ns.max_limbs,
        p(priv_bits, u8),
        p(priv_bits2, u8),
        p(priv_sibs, u32),
        p(sib_lens, u8),
        p(chain_states, u32),
        p(chain_sums, i64),
        p(chain_valid, u8),
        ns.max_width,
        p(rec_states, u32),
        p(rec_bits, u8),
        p(rec_sums, i64),
        p(rec_bits2, u8),
        p(ns.eh_in, i32),
        p(ns.eh_out, i32),
        p(ns.bh_in, i32),
        p(ns.bh_meta, i32),
        p(ns.bh_out, i32),
        p(ns.bh_off, i64),
        p(ns.rc_in, i32),
        p(ns.rc_out, i32),
        p(ns.rc_slots, i32),
        p(rc_rec, u32),
        p(ns.h_in, i32),
        p(ns.h_out, i32),
        p(ns.h_slots, i32),
        p(h_rec, u32),
    )


def execute_alu_rows(field, ext_w, d, wit, defined, kinds, solves, a, b, c, out):
    """Run a dependency-ordered ALU row range natively; returns failing row
    index or -1.  Mutates wit/defined in place."""
    import ctypes as ct

    lib = get_lib()
    return lib.p3n_execute_alu(
        field.P,
        field.NP,
        field.R2,
        ext_w,
        d,
        wit.ctypes.data_as(ct.POINTER(ct.c_uint32)),
        defined.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        kinds.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        solves.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        a.ctypes.data_as(ct.POINTER(ct.c_int32)),
        b.ctypes.data_as(ct.POINTER(ct.c_int32)),
        c.ctypes.data_as(ct.POINTER(ct.c_int32)),
        out.ctypes.data_as(ct.POINTER(ct.c_int32)),
        len(kinds),
    )


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def native_mulmod_vec(field: Monty31, a: np.ndarray, b: np.ndarray):
    lib = get_lib()
    a = np.ascontiguousarray(a, dtype=U32)
    b = np.ascontiguousarray(b, dtype=U32)
    out = np.zeros_like(a)
    lib.p3n_mulmod_vec(
        field.P, field.NP, field.R2, _ptr(a), _ptr(b), _ptr(out), a.size
    )
    return out


class NativePoseidon2:
    def __init__(self, params: Poseidon2Params):
        lib = get_lib()
        F = params.field
        rc_ext = np.ascontiguousarray(params.rc_ext, dtype=U32)
        rc_int = np.ascontiguousarray(params.rc_int, dtype=U32)
        diag = np.ascontiguousarray(params.diag, dtype=U32)
        self._keep = (rc_ext, rc_int, diag)
        self.handle = lib.p3n_poseidon2_new(
            F.P,
            F.NP,
            F.R2,
            params.width,
            F.sbox_degree,
            params.full_rounds,
            params.partial_rounds,
            _ptr(rc_ext),
            _ptr(rc_int),
            _ptr(diag),
        )
        self.width = params.width

    def permute(self, states: np.ndarray) -> np.ndarray:
        out = np.ascontiguousarray(states, dtype=U32).copy()
        flat = out.reshape(-1, self.width)
        get_lib().p3n_poseidon2_permute(self.handle, _ptr(flat), flat.shape[0])
        return out

    def table_rows(
        self, states: np.ndarray, rc_block: np.ndarray, n_sbox: int
    ) -> np.ndarray:
        """(n, w) -> (n, rpp, (1+n_sbox)*w): state + committed S-box
        register columns per table row (the full main-block generator)."""
        flat = np.ascontiguousarray(states, dtype=U32).reshape(-1, self.width)
        rc = np.ascontiguousarray(rc_block, dtype=U32)
        rpp = rc.shape[0]
        out = np.empty(
            (flat.shape[0], rpp, (1 + n_sbox) * self.width), dtype=U32
        )
        get_lib().p3n_poseidon2_table_rows(
            self.handle, _ptr(flat), _ptr(rc), n_sbox, _ptr(out),
            flat.shape[0],
        )
        return out

    def permute_rows(self, states: np.ndarray, rpp: int) -> np.ndarray:
        """(n, w) -> (n, rpp, w) full round-state capture (the table
        trace generator's hot loop)."""
        flat = np.ascontiguousarray(states, dtype=U32).reshape(-1, self.width)
        out = np.empty((flat.shape[0], rpp, self.width), dtype=U32)
        get_lib().p3n_poseidon2_permute_rows(
            self.handle, _ptr(flat), _ptr(out), flat.shape[0]
        )
        return out


class NativeChallenger:
    def __init__(self, perm: NativePoseidon2):
        self._perm = perm
        self.handle = get_lib().p3n_challenger_new(perm.handle)

    def observe_slice(self, vals):
        vals = np.ascontiguousarray(np.asarray(vals).reshape(-1), dtype=U32)
        get_lib().p3n_challenger_observe(self.handle, _ptr(vals), vals.size)

    def sample_vec(self, n: int) -> np.ndarray:
        out = np.zeros(n, dtype=U32)
        get_lib().p3n_challenger_sample(self.handle, _ptr(out), n)
        return out

    def grind(self, bits: int) -> int:
        w = get_lib().p3n_challenger_grind(self.handle, bits, 0)
        self.observe_slice([w])
        s = self.sample_vec(1)[0]
        assert (int(s) & ((1 << bits) - 1)) == 0
        return int(w)
