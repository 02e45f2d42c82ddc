"""BatchStarkProver: circuit traces -> one batch-stark proof.

TPU-native equivalent of the reference's `BatchStarkProver`
(`circuit-prover/src/batch_stark_prover.rs:1203,1230`; SURVEY.md §2.2):
builds the Const/Public/Alu (+ NPO) table matrices and preprocessed columns
from a compiled `Circuit` + executed `Traces`, batches them into ONE
`prove_batch` proof, and verifies by rebuilding every AIR from the circuit
(the program is fixed, so the verifier reconstructs all shapes natively) —
including native recomputation of the Const and Public tables' LogUp
terminals, which is what binds the public inputs to the bus.

`CircuitProverData` caches the offline preprocessed commitment
(reference `CircuitProverData` / `get_airs_and_degrees_with_prep`,
`circuit-prover/src/common.rs:127`).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..circuit.compile import (
    Circuit,
    K_ADD,
    K_BOOL,
    K_MUL,
    K_MULADD,
)
from ..fields.monty31 import U32
from ..stark.batch import (
    BatchProof,
    CommonData,
    StarkInstance,
    commit_preprocessed,
    prove_batch,
    verify_batch,
)
from ..stark.uni import StarkConfig
from ..utils import ext_powers
from .airs import (
    ALU_PREP_WIDTH,
    P_IDX_A,
    P_MULT_A,
    P_SEL_ADD,
    AluAir,
    ConstAir,
    PublicAir,
)

_KIND_TO_SEL = {K_ADD: 0, K_MUL: 1, K_MULADD: 2, K_BOOL: 3}


def _pad_pow2(mat: np.ndarray, min_height: int) -> np.ndarray:
    n = mat.shape[0]
    target = max(min_height, 1 << max(n - 1, 0).bit_length() if n > 1 else 1)
    if target == n:
        return mat
    return np.pad(mat, [(0, target - n)] + [(0, 0)] * (mat.ndim - 1))


def _lane_pack(mat: np.ndarray, lanes: int, min_height: int) -> np.ndarray:
    """(N, c) logical rows -> (ceil(N/lanes) padded pow2, lanes*c): `lanes`
    consecutive logical rows share one trace row (reference TablePacking,
    `circuit-prover/src/batch_stark_prover/packing.rs:10`)."""
    n, c = mat.shape
    rows = (n + lanes - 1) // lanes
    padded = np.zeros((rows * lanes, c), dtype=mat.dtype)
    padded[:n] = mat
    return _pad_pow2(padded.reshape(rows, lanes * c), min_height)


@dataclasses.dataclass(frozen=True)
class TablePacking:
    """Lane-packing config (reference `TablePacking`)."""

    public_lanes: int = 1
    alu_lanes: int = 4
    min_trace_height: int | None = None  # derived from FRI params if None


def _signed(field, v: int) -> int:
    return v % field.P


@dataclasses.dataclass
class CircuitTables:
    """Main + preprocessed matrices for the three primitive chips."""

    const_main: np.ndarray
    const_prep: np.ndarray
    public_main: np.ndarray
    public_prep: np.ndarray
    alu_main: np.ndarray
    alu_prep: np.ndarray


def build_preprocessed(
    circuit: Circuit, min_height: int = 4, packing: TablePacking | None = None
):
    """Static (trace-independent) preprocessed matrices."""
    packing = packing or TablePacking()
    F = circuit.ext.base
    d = circuit.ext.D
    # const: values live IN the preprocessed columns (circuit identity)
    cp = np.zeros((len(circuit.const_rows), 2 + d), dtype=U32)
    for i, (w, v, m) in enumerate(circuit.const_rows):
        cp[i, 0] = _signed(F, m)
        cp[i, 1] = w * d
        cp[i, 2:] = v
    # public
    pp = np.zeros((len(circuit.public_rows), 2), dtype=U32)
    for i, w in enumerate(circuit.public_rows):
        pp[i] = (_signed(F, circuit.public_mults[i]), w * d)
    # alu
    ap = np.zeros((len(circuit.alu_rows), ALU_PREP_WIDTH), dtype=U32)
    for i, r in enumerate(circuit.alu_rows):
        ap[i, P_IDX_A : P_IDX_A + 4] = (
            r.a * d,
            r.b * d,
            r.c * d,
            r.out * d,
        )
        ap[i, P_MULT_A : P_MULT_A + 4] = [_signed(F, m) for m in r.mults]
        ap[i, P_SEL_ADD + _KIND_TO_SEL[r.kind]] = 1
    preps = [
        _pad_pow2(cp, min_height),
        _lane_pack(pp, packing.public_lanes, min_height),
        _lane_pack(ap, packing.alu_lanes, min_height),
    ]
    for plugin, calls in _npo_groups(circuit):
        preps.append(plugin.build_prep(calls, min_height))
    return tuple(preps)


_SPLIT_FN_CACHE: dict = {}


def _chain_perm(circuit: Circuit, plugin, calls) -> np.ndarray:
    """Chain-order permutation of a chained plugin's call list (static per
    circuit; cached on the exec plan)."""
    from ..circuit.runner import _exec_plan

    plan = _exec_plan(circuit)
    perm = plan.chain_perm.get(plugin.type_id)
    if perm is None:
        from .poseidon2_table import chain_order

        pos = {c.op_id: i for i, c in enumerate(calls)}
        perm = np.asarray(
            [pos[c.op_id] for c in chain_order(calls)], dtype=np.int64
        )
        plan.chain_perm[plugin.type_id] = perm
    return perm


def _packed_upload(pieces: list):
    """ONE host->device transfer for every per-prove host array: the
    pieces concatenate flat (u32), upload once, and a tiny jitted split
    (cached per shape signature) returns the device-resident views.
    Per-transfer tunnel latency (~25 ms through the remote relay)
    otherwise multiplies by the number of tables."""
    import jax
    import jax.numpy as jnp

    sig = tuple(p.shape for p in pieces)
    fn = _SPLIT_FN_CACHE.get(sig)
    if fn is None:

        def split(flat):
            outs, off = [], 0
            for shp in sig:
                size = int(np.prod(shp)) if shp else 1
                outs.append(flat[off : off + size].reshape(shp))
                off += size
            return tuple(outs)

        fn = _SPLIT_FN_CACHE[sig] = jax.jit(split)
    flat = np.concatenate(
        [np.ascontiguousarray(p, dtype=U32).reshape(-1) for p in pieces]
    ) if pieces else np.zeros((0,), dtype=U32)
    return fn(jnp.asarray(flat))


def device_lane_pack(jnp, mat, lanes: int, min_height: int):
    """`_lane_pack` as device ops (static reshapes/pads)."""
    n, c = mat.shape
    rows = (n + lanes - 1) // lanes
    mat = jnp.pad(mat, [(0, rows * lanes - n), (0, 0)])
    mat = mat.reshape(rows, lanes * c)
    target = max(
        min_height, 1 << max(rows - 1, 0).bit_length() if rows > 1 else 1
    )
    return jnp.pad(mat, [(0, target - rows), (0, 0)])


def _prim_tables_fn(
    circuit: Circuit, min_height: int, packing: TablePacking
):
    """Jitted device builder of the three primitive mains from the
    witness table: pm = wit[public_rows], am = [wit[a]|wit[b]|wit[c]|
    wit[out]] with lane packing / pow-2 padding as static reshapes.
    Uploading the witness once (plus static device-resident index
    arrays) replaces uploading the 4x-duplicated ALU main."""
    import jax
    import jax.numpy as jnp

    from ..circuit.runner import _exec_plan
    from ..ops.jitk import _dev

    plan = _exec_plan(circuit)
    key = (min_height, packing.public_lanes, packing.alu_lanes)
    cached = getattr(plan, "prim_tables", {}).get(key)
    if cached is not None:
        return cached
    d = circuit.ext.D
    pub_idx = np.asarray(circuit.public_rows, dtype=np.int32)
    abco = np.asarray(
        [[r.a, r.b, r.c, r.out] for r in circuit.alu_rows], dtype=np.int32
    ).reshape(-1, 4)
    consts = (_dev(pub_idx), _dev(abco))
    n_const = len(circuit.const_rows)
    n_pub = len(circuit.public_rows)
    n_alu = len(abco)

    def lane_pack_dev(mat, lanes):
        return device_lane_pack(jnp, mat, lanes, min_height)

    def fn(wit, consts_t):
        pub_i, abco_i = consts_t
        pm = (
            wit[pub_i]
            if n_pub
            else jnp.zeros((0, d), dtype=jnp.uint32)
        )
        if n_alu:
            g = wit[abco_i.reshape(-1)].reshape(n_alu, 4 * d)
        else:
            g = jnp.zeros((0, 4 * d), dtype=jnp.uint32)
        cm_t = max(
            min_height,
            1 << max(n_const - 1, 0).bit_length() if n_const > 1 else 1,
        )
        cm = jnp.zeros((cm_t, 1), dtype=jnp.uint32)
        return (
            cm,
            lane_pack_dev(pm, packing.public_lanes),
            lane_pack_dev(g, packing.alu_lanes),
        )

    jfn = jax.jit(fn)
    out = lambda wit: jfn(wit, consts)  # noqa: E731
    if not hasattr(plan, "prim_tables"):
        plan.prim_tables = {}
    plan.prim_tables[key] = out
    return out


def build_main_tables(
    circuit: Circuit,
    traces,
    min_height: int = 4,
    packing: TablePacking | None = None,
    device: bool = False,
):
    packing = packing or TablePacking()
    d = circuit.ext.D
    wit = traces.witness
    if wit.ndim != 2:
        device = False  # limbed (Goldilocks) cells keep the host path
    if not device:
        # const values are preprocessed; the main matrix is one zero col
        cm = np.zeros((len(circuit.const_rows), 1), dtype=U32)
        pm = wit[np.asarray(circuit.public_rows, dtype=np.int64)]
        if len(circuit.alu_rows):
            a = wit[
                np.asarray([r.a for r in circuit.alu_rows], dtype=np.int64)
            ]
            b = wit[
                np.asarray([r.b for r in circuit.alu_rows], dtype=np.int64)
            ]
            c = wit[
                np.asarray([r.c for r in circuit.alu_rows], dtype=np.int64)
            ]
            o = wit[
                np.asarray(
                    [r.out for r in circuit.alu_rows], dtype=np.int64
                )
            ]
            am = np.concatenate([a, b, c, o], axis=1)
        else:
            am = np.zeros((0, 4 * d), dtype=U32)
        mains = [
            _pad_pow2(cm, min_height),
            _lane_pack(pm, packing.public_lanes, min_height),
            _lane_pack(am, packing.alu_lanes, min_height),
        ]
        for plugin, calls in _npo_groups(circuit):
            recs = traces.npo_records.get(plugin.type_id, {})
            records = [recs[call.op_id] for call in calls]
            mains.append(plugin.build_main(calls, records, min_height))
        return tuple(mains)
    # device path: the witness table + every NPO payload rides ONE packed
    # upload; the primitive mains are gathered from the witness ON DEVICE
    # (static index arrays) and the big NPO tables are built on device
    # from the tiny per-call payloads
    pieces = [np.ascontiguousarray(wit, dtype=U32)]
    jobs = []  # (kind, plugin, calls, records, n_pieces)
    for plugin, calls in _npo_groups(circuit):
        if hasattr(plugin, "build_main_from_wit"):
            # table derivable from the witness alone: zero extra upload
            jobs.append(("wit", plugin, calls, None, 0))
            continue
        arrays = traces.npo_arrays.get(plugin.type_id)
        if arrays is not None and hasattr(plugin, "payload_from_arrays"):
            # array-form records: vectorized payload, no per-op python
            payload = plugin.payload_from_arrays(
                arrays, _chain_perm(circuit, plugin, calls)
            )
            pieces.extend(payload)
            jobs.append(("dev", plugin, calls, None, len(payload)))
            continue
        recs = traces.npo_records.get(plugin.type_id, {})
        records = [recs[call.op_id] for call in calls]
        if hasattr(plugin, "device_payload"):
            payload = plugin.device_payload(calls, records)
            pieces.extend(payload)
            jobs.append(("dev", plugin, calls, records, len(payload)))
        else:
            pieces.append(plugin.build_main(calls, records, min_height))
            jobs.append(("host", plugin, calls, records, 1))
    dev = list(_packed_upload(pieces))
    out = list(_prim_tables_fn(circuit, min_height, packing)(dev[0]))
    pos = 1
    for kind, plugin, calls, records, n in jobs:
        if kind == "wit":
            out.append(
                plugin.build_main_from_wit(circuit, calls, dev[0], min_height)
            )
        elif kind == "dev":
            out.append(
                plugin.build_main_device(
                    calls, records, min_height, payload=tuple(dev[pos : pos + n])
                )
            )
        else:
            out.append(dev[pos])
        pos += n
    return tuple(out)


@dataclasses.dataclass
class CircuitProverData:
    """Offline data reused across proofs of the same circuit."""

    common: CommonData
    preps: tuple  # (const_prep, public_prep, alu_prep, *npo_preps)
    min_height: int
    packing: TablePacking = dataclasses.field(default_factory=TablePacking)


from ..utils.gcpause import gc_paused_fn


@gc_paused_fn
def circuit_prover_data(
    config: StarkConfig,
    circuit: Circuit,
    min_height: int | None = None,
    packing: TablePacking | None = None,
) -> CircuitProverData:
    packing = packing or TablePacking()
    if min_height is None:
        min_height = packing.min_trace_height or max(
            4, 1 << config.pcs.params.log_final_poly_len
        )
    preps = build_preprocessed(circuit, min_height, packing)
    instances = _instances(config, circuit, preps, mains=None, packing=packing)
    common = commit_preprocessed(config, instances)
    return CircuitProverData(common, preps, min_height, packing)


def _npo_groups(circuit: Circuit):
    """Circuit NPO calls grouped by plugin type, deterministic order."""
    groups: dict[str, tuple] = {}
    for call in circuit.npo_calls:
        groups.setdefault(call.plugin.type_id, (call.plugin, []))[1].append(
            call
        )
    return [groups[k] for k in sorted(groups)]


def _airs(
    config: StarkConfig, circuit: Circuit, packing: TablePacking | None = None
):
    packing = packing or TablePacking()
    d = circuit.ext.D
    quintic = d > 1 and not hasattr(circuit.ext, "W")
    w = circuit.ext.W if d > 1 and not quintic else 0
    airs = [
        ConstAir(d),
        PublicAir(d, packing.public_lanes),
        AluAir(d, w, packing.alu_lanes, quintic=quintic),
    ]
    for plugin, _calls in _npo_groups(circuit):
        airs.append(plugin.table_air())
    return airs


def _instances(config, circuit, preps, mains, packing=None):
    airs = _airs(config, circuit, packing)
    if mains is None:
        # shapes only (for preprocessed commitment): zero mains of right size
        mains = [
            np.zeros((p.shape[0], a.width_main), dtype=U32)
            for a, p in zip(airs, preps)
        ]
    insts = []
    for air, prep, main in zip(airs, preps, mains):
        insts.append(
            StarkInstance(
                air,
                main,
                publics=[],
                preprocessed=prep,
                lookups=air.lookups(),
            )
        )
    # public values of the Public instance = flattened public witness coeffs
    return insts


@dataclasses.dataclass
class BatchStarkProof:
    batch: BatchProof
    public_values: np.ndarray  # (num_publics, D) canonical


class BatchStarkProver:
    def __init__(self, config: StarkConfig):
        self.config = config

    @gc_paused_fn
    def prove_all_tables(
        self,
        circuit: Circuit,
        traces,
        prover_data: CircuitProverData,
        xp=np,
        debug_lookups: bool = False,
    ) -> BatchStarkProof:
        from ..utils.tracing import span

        with span("build_main_tables"):
            mains = build_main_tables(
                circuit,
                traces,
                prover_data.min_height,
                prover_data.packing,
                device=self.config.pcs.use_jit,
            )
        preps = prover_data.preps
        if self.config.pcs.use_jit:
            # ONE host->device upload per table: main matrices and the
            # (static, cached) preprocessed matrices become device-resident
            # here, so commit, permutation-column generation and quotient
            # evaluation all reuse the same buffers instead of re-uploading
            # through the interconnect per consumer (~3x the bytes).
            import jax.numpy as jnp

            with span("upload_tables"):
                mains = [jnp.asarray(m) for m in mains]
                if not hasattr(prover_data, "_device_preps"):
                    prover_data._device_preps = tuple(
                        jnp.asarray(p) for p in preps
                    )
                preps = prover_data._device_preps
        with span("build_instances"):
            instances = _instances(
                self.config,
                circuit,
                preps,
                mains,
                prover_data.packing,
            )
            publics = traces.witness[
                np.asarray(circuit.public_rows, dtype=np.int64)
            ]
            instances[1].publics = [int(x) for x in publics.reshape(-1)]
        with span("prove_batch"):
            batch = prove_batch(
                self.config,
                instances,
                prover_data.common,
                xp=xp,
                debug_lookups=debug_lookups,
            )
        return BatchStarkProof(batch, publics)

    def verify_all_tables(
        self,
        circuit: Circuit,
        proof: BatchStarkProof,
        prover_data: CircuitProverData,
    ) -> bool:
        config = self.config
        F, E = config.field, config.ext
        airs = _airs(config, circuit, prover_data.packing)
        airs_lookups = [(air, air.lookups()) for air in airs]
        verify_batch(config, airs_lookups, proof.batch, prover_data.common)
        # circuit-identity binding: a proof claiming a different offline
        # preprocessed commitment is not a proof of THIS circuit
        if proof.batch.prep_commitment is not None and not np.array_equal(
            np.asarray(proof.batch.prep_commitment, dtype=U32),
            np.asarray(prover_data.common.prep_commitment, dtype=U32),
        ):
            raise ValueError("prep commitment mismatch (wrong circuit)")
        bind_publics_and_terminal(
            config,
            proof,
            prover_data.common.prep_commitment,
            prover_data.preps[1].reshape(-1, 2),
        )
        return True


def bind_publics_and_terminal(
    config: StarkConfig,
    proof: "BatchStarkProof",
    prep_commitment,
    public_prep,
):
    """Bind the claimed public inputs to the bus: check them against the
    proof's Public-instance values and natively recompute the Public
    table's LogUp terminal from the (preprocessed, prep-commitment-bound)
    [mult, idx] rows.  (Const values are preprocessed — bound by the
    offline preprocessed commitment, no value recomputation needed.)"""
    F, E = config.field, config.ext
    d = E.D
    pubs = np.asarray(proof.public_values, dtype=U32)
    if [int(x) for x in pubs.reshape(-1)] != list(proof.batch.publics[1]):
        raise ValueError("public values mismatch")
    # challenges must be re-derived exactly as verify_batch did
    ch = config.challenger()
    from ..stark.batch import _bind_instances

    _bind_instances(ch, proof.batch.shapes)
    if prep_commitment is not None:
        ch.observe_slice(np.asarray(prep_commitment, dtype=U32))
    if proof.batch.random_commit is not None:
        ch.observe_slice(np.asarray(proof.batch.random_commit))
    ch.observe_slice(proof.batch.trace_commit)
    for ps in proof.batch.publics:
        ch.observe_slice(np.asarray(ps, dtype=U32))
    alpha = ch.sample_ext(E)
    beta = ch.sample_ext(E)
    term_by_inst = dict(proof.batch.lookup_terminals)
    prep = np.asarray(public_prep, dtype=U32).reshape(-1, 2)
    values = _pad_rows(pubs, prep.shape[0], d)
    want = _native_terminal(F, E, prep, values, alpha, beta)
    got = term_by_inst[1]
    if not np.array_equal(want, np.asarray(got, dtype=U32)):
        raise ValueError(
            "Public terminal does not match native recomputation "
            "(publics not bound)"
        )
    return True


def _pad_rows(mat, height, d):
    if mat.size == 0:
        return np.zeros((height, d), dtype=U32)
    return np.pad(mat, [(0, height - mat.shape[0]), (0, 0)])


def _native_terminal(F, E, prep, values, alpha, beta):
    """Σ_rows mult / (β − (idx + Σ_j α^{1+j} v_j)) over a 2-col-prep table."""
    n = prep.shape[0]
    apow = ext_powers(E, np.asarray(alpha), values.shape[1] + 1, np)
    comp = E.mul_base(
        np.broadcast_to(apow[0], (n, E.D)), prep[:, 1].astype(U32), np
    )
    for j in range(values.shape[1]):
        comp = E.add(
            comp,
            E.mul_base(
                np.broadcast_to(apow[1 + j], (n, E.D)),
                values[:, j].astype(U32),
                np,
            ),
            np,
        )
    denom = E.sub(np.broadcast_to(np.asarray(beta), comp.shape), comp, np)
    term = E.mul_base(E.inv(denom, np), prep[:, 0].astype(U32), np)
    acc = term[0]
    for i in range(1, n):
        acc = E.add(acc, term[i], np)
    return acc
