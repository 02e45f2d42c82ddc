"""Batched Poseidon2 permutation over Monty31 fields.

TPU-native equivalent of the reference's upstream `p3-poseidon2` dependency
(SURVEY.md §2.6): the permutation that backs Merkle/MMCS hashing and the
Fiat–Shamir duplex challenger.  Operates on arrays of shape (..., WIDTH) of
canonical u32; the whole permutation is elementwise/VPU work that XLA fuses,
with batch dims carrying the parallelism (hash many rows at once).

Structure (Poseidon2 paper / upstream layout):
  state <- M_E(state)
  RF/2 external rounds: add rc, full S-box, M_E
  RP   internal rounds: add rc[0], S-box on lane 0, M_I
  RF/2 external rounds: add rc, full S-box, M_E
where M_E = circ(2·M4, M4, …) with M4 the 4x4 [[2,3,1,1],[1,2,3,1],
[1,1,2,3],[3,1,1,2]] block, and M_I = diag(d) + ones·onesᵀ.

Round-constant / diagonal generation: the upstream crates hardcode vectors
that are not present in this snapshot (crates.io deps; SURVEY.md §2.6), so
this build generates its own via SHA-256 in counter mode with rejection
sampling (`_field_elements_from_seed`).  The derivation is deterministic and
mirrored bit-for-bit by the C++ golden library; swap `Poseidon2Params`
constants to interop with another stack.

S-box degree: BabyBear x^7, KoalaBear x^3 (smallest d ≥ 3 coprime to p-1).
Round counts follow the upstream instantiations: RF=8 for all;
RP: BabyBear W16 → 13, W24 → 21; KoalaBear W16 → 20, W24 → 23.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib

import numpy as np

from ..fields.monty31 import Monty31, U32

_ROUND_NUMBERS = {
    # (field_name, width) -> (full_rounds, partial_rounds)
    # (reference preset family, `poseidon2-circuit-air/src/public_types.rs`)
    ("baby_bear", 16): (8, 13),
    ("baby_bear", 24): (8, 21),
    ("baby_bear", 32): (8, 30),
    ("koala_bear", 16): (8, 20),
    ("koala_bear", 24): (8, 23),
    ("koala_bear", 32): (8, 31),
}


def _field_elements_from_seed(field: Monty31, tag: str, n: int) -> np.ndarray:
    """n canonical field elements via SHA-256 counter-mode + rejection."""
    out = []
    counter = 0
    while len(out) < n:
        h = hashlib.sha256(f"{tag}/{counter}".encode()).digest()
        counter += 1
        for i in range(0, 32, 4):
            v = int.from_bytes(h[i : i + 4], "little") & 0x7FFFFFFF
            if v < field.P:
                out.append(v)
                if len(out) == n:
                    break
    return np.asarray(out, dtype=np.uint64).astype(U32)


@dataclasses.dataclass(frozen=True)
class Poseidon2Params:
    field: Monty31
    width: int
    full_rounds: int
    partial_rounds: int
    rc_ext: np.ndarray  # (full_rounds, width) canonical
    rc_int: np.ndarray  # (partial_rounds,) canonical
    diag: np.ndarray  # (width,) canonical internal-layer diagonal

    @functools.cached_property
    def rc_ext_m(self) -> np.ndarray:
        # Round constants are *added*, so canonical form is fine; keep both
        # anyway for kernels that stay in the Monty domain end-to-end.
        return self.field.monty_array(self.rc_ext)

    @functools.cached_property
    def diag_m(self) -> np.ndarray:
        return self.field.monty_array(self.diag)


@functools.lru_cache(maxsize=None)
def poseidon2_params(field: Monty31, width: int) -> Poseidon2Params:
    rf, rp = _ROUND_NUMBERS[(field.name, width)]
    tag = f"plonky3_recursion_tpu/poseidon2/{field.name}/w{width}"
    rc_ext = _field_elements_from_seed(field, tag + "/ext", rf * width).reshape(
        rf, width
    )
    rc_int = _field_elements_from_seed(field, tag + "/int", rp)
    # Internal diagonal: rejection-sample until M_I = diag(d) + J invertible
    # and entries distinct & nonzero (Poseidon2 paper §5.2 sampling approach).
    attempt = 0
    while True:
        diag = _field_elements_from_seed(field, f"{tag}/diag/{attempt}", width)
        p = field.P
        ds = [int(x) for x in diag]
        if 0 in ds or len(set(ds)) != width:
            attempt += 1
            continue
        det = 1
        for d in ds:
            det = det * d % p
        s = sum(pow(d, p - 2, p) for d in ds) % p
        if det * (1 + s) % p != 0:
            break
        attempt += 1
    return Poseidon2Params(field, width, rf, rp, rc_ext, rc_int, diag)


_NATIVE_PERM_CACHE: dict = {}
_NATIVE_MIN_BATCH = 32  # below this the ctypes round-trip beats nothing
_USE_PALLAS: bool | None = None


def _use_pallas() -> bool:
    """Device (jnp-path) permutations run the fused Pallas kernel on real
    TPU backends (~4x the scan formulation, bit-identical); CPU-backend
    runs (tests, mesh dryruns) keep the portable scan path.  Disable with
    P3_NO_PALLAS=1."""
    global _USE_PALLAS
    if _USE_PALLAS is None:
        import os

        if os.environ.get("P3_NO_PALLAS"):
            _USE_PALLAS = False
        else:
            try:
                import jax

                _USE_PALLAS = jax.default_backend() != "cpu"
            except Exception:
                _USE_PALLAS = False
    return _USE_PALLAS


def _native_perm(params: Poseidon2Params):
    """Cached C++ permutation engine for `params` (None if unavailable or
    disabled via P3_NO_NATIVE=1).  `poseidon2_params` is lru-cached, so
    id(params) is a stable key."""
    import os

    if os.environ.get("P3_NO_NATIVE"):
        return None
    got = _NATIVE_PERM_CACHE.get(id(params))
    if got is not None:
        return got
    try:
        from ..native import NativePoseidon2

        eng = NativePoseidon2(params)
    except Exception:
        eng = None
    _NATIVE_PERM_CACHE[id(params)] = eng
    # keep params alive so the id can never be recycled
    _NATIVE_PERM_CACHE[("params", id(params))] = params
    return eng


def _sbox_monty(F: Monty31, x, degree: int, xp):
    """x^degree with x in Monty form (result in Monty form)."""
    x2 = F.monty_mul(x, x, xp)
    if degree == 3:
        return F.monty_mul(x2, x, xp)
    if degree == 5:
        return F.monty_mul(F.monty_mul(x2, x2, xp), x, xp)
    if degree == 7:
        x4 = F.monty_mul(x2, x2, xp)
        return F.monty_mul(F.monty_mul(x4, x2, xp), x, xp)
    raise ValueError(degree)


def _m4_chunk(F: Monty31, c, xp):
    """Apply M4 = [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]] to (..., 4).

    Uses the standard 8-add decomposition (adds only, no muls).
    """
    x0, x1, x2, x3 = c[..., 0], c[..., 1], c[..., 2], c[..., 3]
    t01 = F.add(x0, x1, xp)
    t23 = F.add(x2, x3, xp)
    t0123 = F.add(t01, t23, xp)
    t01123 = F.add(t0123, x1, xp)  # x0 + 2x1 + x2 + x3
    t01233 = F.add(t0123, x3, xp)  # x0 + x1 + x2 + 2x3
    y3 = F.add(t01233, F.double(x0, xp), xp)  # 3x0 + x1 + x2 + 2x3
    y1 = F.add(t01123, F.double(x2, xp), xp)  # x0 + 2x1 + 3x2 + x3
    y0 = F.add(t01123, t01, xp)  # 2x0 + 3x1 + x2 + x3
    y2 = F.add(t01233, t23, xp)  # x0 + x1 + 2x2 + 3x3
    return xp.stack([y0, y1, y2, y3], axis=-1)


def _external_layer(F: Monty31, state, width: int, xp):
    """M_E = circ(2·M4, M4, ..., M4) on (..., width)."""
    chunks = state.reshape(state.shape[:-1] + (width // 4, 4))
    m4d = _m4_chunk(F, chunks, xp)  # block-diagonal M4
    # add the column sums across chunks: out[g, j] += sum_g' m4d[g', j]
    acc = m4d[..., 0, :]
    for g in range(1, width // 4):
        acc = F.add(acc, m4d[..., g, :], xp)
    out = F.add(m4d, acc[..., None, :], xp)
    return out.reshape(state.shape)


def _internal_layer(F: Monty31, state_m, diag_m, xp):
    """M_I x = diag(d)·x + (Σx)·1 on Monty-form state."""
    acc = state_m[..., 0]
    for i in range(1, state_m.shape[-1]):
        acc = F.add(acc, state_m[..., i], xp)
    dx = F.monty_mul(state_m, diag_m, xp)
    return F.add(dx, acc[..., None], xp)


def permute(params: Poseidon2Params, state, xp):
    """Poseidon2 permutation, batched over leading dims.

    state: (..., width) canonical u32 -> (..., width) canonical u32.
    The jnp path scans over rounds (round constants are the scanned inputs)
    to keep the HLO graph small — an unrolled permutation is ~700 muls,
    which is slow to compile through the remote-compile path.
    """
    F = params.field
    width = params.width
    if xp is np and state.size >= _NATIVE_MIN_BATCH * width:
        # big host batches run on the multicore C++ engine (bit-identical;
        # cross-checked against the numpy and scalar paths in tests)
        eng = _native_perm(params)
        if eng is not None:
            return eng.permute(np.asarray(state, dtype=U32))
    deg = F.sbox_degree
    rf2 = params.full_rounds // 2
    if xp is not np:
        if _use_pallas():
            from .pallas_poseidon2 import permute_pallas_nd

            return permute_pallas_nd(params, state)
        return _permute_scanned_t(params, state, xp)
    diag_m = xp.asarray(params.diag_m)
    rc_ext_m = xp.asarray(params.rc_ext_m)
    rc_int_m = xp.asarray(F.monty_array(params.rc_int))

    # Initial external linear layer (canonical domain: M_E is add-only).
    state = _external_layer(F, state, width, xp)
    # Lift to Monty once; all rounds stay in Monty form.  Round constants are
    # added in Monty form, S-box/linear layers preserve the domain.
    sm = F.to_monty(state, xp)

    def ext_round(sm, rc):
        sm = F.add(sm, rc, xp)
        sm = _sbox_monty(F, sm, deg, xp)
        return _external_layer(F, sm, width, xp)

    def int_round(sm, rc):
        s0 = _sbox_monty(F, F.add(sm[..., 0], rc, xp), deg, xp)
        if xp is np:
            sm = sm.copy()
            sm[..., 0] = s0
        else:
            sm = sm.at[..., 0].set(s0)
        return _internal_layer(F, sm, diag_m, xp)

    for r in range(rf2):
        sm = ext_round(sm, rc_ext_m[r])
    for r in range(params.partial_rounds):
        sm = int_round(sm, rc_int_m[r])
    for r in range(rf2, params.full_rounds):
        sm = ext_round(sm, rc_ext_m[r])

    return F.from_monty(sm, xp)


def _permute_scanned_t(params: Poseidon2Params, state, xp):
    """Device permutation: ONE scan over a unified round schedule (ext and
    int rounds share a body; a per-round flag selects the linear layer) —
    one scan-body compile per instance instead of three, which cut the
    fused prover programs' XLA compile times ~2-3x.  Selecting between
    both layers is nearly free: M_E is add-only, M_I one mul per lane.

    Layout: the state is transposed to (width, ...batch) for the rounds —
    with the batch in the MINOR dims every elementwise op fills full TPU
    vector lanes (a (N, 16) layout leaves 7/8 of the 128-wide lanes idle).
    """
    from jax import lax

    F = params.field
    width = params.width
    deg = F.sbox_degree
    st = xp.moveaxis(state, -1, 0)  # (width, ...batch)
    st = _external_layer_t(F, st, width, xp)
    st = F.to_monty(st, xp)

    rc_all, is_ext = _unified_rounds(params)
    tail = (1,) * (st.ndim - 1)
    rc_all = xp.asarray(rc_all).reshape((rc_all.shape[0], width) + tail)
    is_ext = xp.asarray(is_ext)
    lane0 = (xp.arange(width, dtype=xp.uint32) == 0).reshape(
        (width,) + tail
    )
    diag_t = xp.asarray(params.diag_m).reshape((width,) + tail)

    def step(s, inp):
        rc, ext_flag = inp
        t = F.add(s, rc, xp)
        sb = _sbox_monty(F, t, deg, xp)
        s2 = xp.where(ext_flag | lane0, sb, t)
        e_out = _external_layer_t(F, s2, width, xp)
        i_out = _internal_layer_t(F, s2, diag_t, xp)
        return xp.where(ext_flag, e_out, i_out), None

    st, _ = lax.scan(step, st, (rc_all, is_ext))
    return xp.moveaxis(F.from_monty(st, xp), 0, -1)


def _m4_chunk_t(F: Monty31, c, xp):
    """M4 on (G, 4, ...batch) transposed chunks (coefficient axis 1)."""
    x0, x1, x2, x3 = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    t01 = F.add(x0, x1, xp)
    t23 = F.add(x2, x3, xp)
    t0123 = F.add(t01, t23, xp)
    t01123 = F.add(t0123, x1, xp)
    t01233 = F.add(t0123, x3, xp)
    y3 = F.add(t01233, F.double(x0, xp), xp)
    y1 = F.add(t01123, F.double(x2, xp), xp)
    y0 = F.add(t01123, t01, xp)
    y2 = F.add(t01233, t23, xp)
    return xp.stack([y0, y1, y2, y3], axis=1)


def _external_layer_t(F: Monty31, state_t, width: int, xp):
    """M_E on (width, ...batch) transposed state."""
    chunks = state_t.reshape((width // 4, 4) + state_t.shape[1:])
    m4d = _m4_chunk_t(F, chunks, xp)
    acc = m4d[0]
    for g in range(1, width // 4):
        acc = F.add(acc, m4d[g], xp)
    out = F.add(m4d, acc[None], xp)
    return out.reshape(state_t.shape)


def _internal_layer_t(F: Monty31, state_t, diag_t, xp):
    """M_I on (width, ...batch) transposed Monty-form state."""
    acc = state_t[0]
    for i in range(1, state_t.shape[0]):
        acc = F.add(acc, state_t[i], xp)
    dx = F.monty_mul(state_t, diag_t, xp)
    return F.add(dx, acc[None], xp)


_UNIFIED_CACHE: dict = {}


def _unified_rounds(params: Poseidon2Params):
    got = _UNIFIED_CACHE.get(id(params))
    if got is not None:
        return got
    got = _unified_rounds_build(params)
    _UNIFIED_CACHE[id(params)] = got
    _UNIFIED_CACHE[("params", id(params))] = params  # pin id
    return got


def _unified_rounds_build(params: Poseidon2Params):
    """(n_rounds, width) Monty round constants + (n_rounds,) ext-round
    flags for the unified-scan permutation (ext rc rows as-is; int rounds
    place rc in lane 0 and zeros elsewhere, so `state + rc` touches only
    lane 0 — exactly the int-round rule)."""
    rf2 = params.full_rounds // 2
    width = params.width
    rows = []
    flags = []
    rc_ext_m = params.rc_ext_m
    rc_int_m = params.field.monty_array(params.rc_int)
    for r in range(rf2):
        rows.append(rc_ext_m[r])
        flags.append(True)
    for r in range(params.partial_rounds):
        row = np.zeros(width, dtype=U32)
        row[0] = rc_int_m[r]
        rows.append(row)
        flags.append(False)
    for r in range(rf2, params.full_rounds):
        rows.append(rc_ext_m[r])
        flags.append(True)
    return np.stack(rows), np.asarray(flags)


def permute_with_rows(params: Poseidon2Params, states, xp):
    """Batched permutation capturing every round state.

    states: (N, width) -> (N, 2 + RF + RP, width): row 0 is the raw input,
    row 1 the state after the initial external linear layer, then one row
    per round (the last row is the permutation output).  Feeds the
    Poseidon2 table AIR, whose transition constraints replicate exactly
    these steps.
    """
    F = params.field
    width = params.width
    deg = F.sbox_degree
    rf2 = params.full_rounds // 2
    diag_m = xp.asarray(params.diag_m)
    rc_ext_m = xp.asarray(params.rc_ext_m)
    rc_int_m = xp.asarray(F.monty_array(params.rc_int))
    rows = [states]
    sm = F.to_monty(_external_layer(F, states, width, xp), xp)

    def emit(sm):
        rows.append(F.from_monty(sm, xp))

    emit(sm)  # row 1: after the initial M_E

    for r in range(rf2):
        sm = F.add(sm, rc_ext_m[r], xp)
        sm = _sbox_monty(F, sm, deg, xp)
        sm = _external_layer(F, sm, width, xp)
        emit(sm)
    for r in range(params.partial_rounds):
        s0 = _sbox_monty(F, F.add(sm[..., 0], rc_int_m[r], xp), deg, xp)
        if xp is np:
            sm = sm.copy()
            sm[..., 0] = s0
        else:
            sm = sm.at[..., 0].set(s0)
        sm = _internal_layer(F, sm, diag_m, xp)
        emit(sm)
    for r in range(rf2, params.full_rounds):
        sm = F.add(sm, rc_ext_m[r], xp)
        sm = _sbox_monty(F, sm, deg, xp)
        sm = _external_layer(F, sm, width, xp)
        emit(sm)
    return xp.stack(rows, axis=1)


def permute_scalar(params: Poseidon2Params, state_ints):
    """Pure python-int reference (slow, for golden tests)."""
    F = params.field
    p = F.P
    width = params.width
    deg = F.sbox_degree
    s = [int(x) % p for x in state_ints]
    assert len(s) == width

    def m4(c):
        a, b, cc, d = c
        return [
            (2 * a + 3 * b + cc + d) % p,
            (a + 2 * b + 3 * cc + d) % p,
            (a + b + 2 * cc + 3 * d) % p,
            (3 * a + b + cc + 2 * d) % p,
        ]

    def ext(s):
        chunks = [m4(s[i : i + 4]) for i in range(0, width, 4)]
        sums = [sum(ch[j] for ch in chunks) % p for j in range(4)]
        return [
            (chunks[g][j] + sums[j]) % p for g in range(width // 4) for j in range(4)
        ]

    def internal(s):
        tot = sum(s) % p
        return [(int(params.diag[i]) * s[i] + tot) % p for i in range(width)]

    rf2 = params.full_rounds // 2
    s = ext(s)
    for r in range(rf2):
        s = [pow((x + int(params.rc_ext[r][i])) % p, deg, p) for i, x in enumerate(s)]
        s = ext(s)
    for r in range(params.partial_rounds):
        s = [pow((s[0] + int(params.rc_int[r])) % p, deg, p)] + s[1:]
        s = internal(s)
    for r in range(rf2, params.full_rounds):
        s = [pow((x + int(params.rc_ext[r][i])) % p, deg, p) for i, x in enumerate(s)]
        s = ext(s)
    return s
