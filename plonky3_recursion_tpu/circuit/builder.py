"""CircuitBuilder: the user-facing circuit construction API.

TPU-native redesign of the reference's `CircuitBuilder`
(`circuit/src/builder/circuit_builder.rs:49`; SURVEY.md §2.1).  Covers the
reference surface: publics/consts/privates, add/sub/mul/div, mul_add,
mul_many, inner_product, assert_zero/assert_bool, connect, select,
exp_power_of_2, decompose_to_bits, reconstruct_index_from_bits,
recompose/decompose between base coefficients and extension elements,
tagging/scoping, hint registration, and NPO (non-primitive op) calls.

Circuit values are extension-field elements (D base coefficients); base
values are embedded with zero high coefficients, as on the reference's
witness bus (`book/src/architecture_and_internals/construction.md:80`).
"""

from __future__ import annotations

import dataclasses

from ..fields.extension import BinomialExtension
from ..utils.gcpause import gc_paused_fn
from .expr import ADD, BOOL, DIV, MUL, MULADD, SUB, ExprGraph


@dataclasses.dataclass
class HintDecl:
    """A prover-side computed hint: outputs = fn(input values).

    `kind`/`meta` let the runner execute same-shaped hints of a level as
    one vectorized batch ("bit_decompose" with meta=n_bits,
    "ext_decompose") instead of per-instance python calls."""

    fn: object  # callable(list[tuple]) -> list[tuple]  (D-coeff tuples)
    inputs: list  # ExprIds
    outputs: list  # ExprIds (PRIVATE nodes)
    kind: str = ""
    meta: int = 0


@dataclasses.dataclass
class NpoCall:
    """An instance of a registered non-primitive operation.

    Chained perm calls (reference `PermCall`, `circuit/src/ops/perm.rs:105`)
    extend the plain all-in/all-out form: `inputs`/`outputs` entries may be
    None (the value chains in-table from the previous call of the same
    `chain`, or is prover private data such as a Merkle sibling), and
    `sum_out` optionally exposes the in-table MMCS index accumulator."""

    plugin: object  # NpoPlugin
    config: object
    inputs: list  # list[ExprId | None]
    outputs: list  # list[ExprId | None] (NPO_OUT nodes)
    op_id: int
    tag: object = None
    new_start: bool = True
    merkle_path: bool = False
    chain: object = None  # chain key; same-key calls form one in-table chain
    prev_op: int | None = None  # previous call op_id on the same chain
    sum_out: int | None = None  # ExprId of the bound mmcs_index_sum
    merkle_arity: int = 2  # 2 (direction bit) or 4 (two position bits)


class CircuitBuilder:
    def __init__(self, ext: BinomialExtension, debug: bool = False):
        self.E = ext
        self.g = ExprGraph(ext.D, debug=debug)
        self.g.scope_provider = lambda: "/".join(self._scopes)
        self.connects: list[tuple[int, int]] = []
        self.hints: list[HintDecl] = []
        self.npos: list[NpoCall] = []
        self.tags: dict[str, int] = {}
        self._scopes: list[str] = []
        self.enabled_ops: dict[str, object] = {}
        self.op_counts: dict[str, dict[str, int]] = {}
        self._chain_last: dict = {}  # chain key -> last perm_call op_id
        self._chain_counter = 0
        self.recompose_src: dict = {}  # recomposed ext eid -> coeff eids
        self._recompose_npo: str | None = None  # type_id when enabled
        self._recompose_cse: dict = {}  # coeff tuple -> packed eid
        self._horner_npo: str | None = None  # type_id when enabled
        self._horner_k: int = 0

    # ----- leaf construction -----

    @property
    def zero(self) -> int:
        return 0

    def const(self, value) -> int:
        """value: int (base-embedded) or D-tuple of ints."""
        if isinstance(value, (int,)):
            value = (value,) + (0,) * (self.E.D - 1)
        return self.g.const(tuple(int(v) % self.E.base.P for v in value))

    def one(self) -> int:
        return self.const(1)

    def public_input(self) -> int:
        return self.g.public()

    def public_inputs(self, n: int) -> list[int]:
        return [self.g.public() for _ in range(n)]

    def private_input(self) -> int:
        return self.g.private()

    # ----- arithmetic -----

    def add(self, a: int, b: int) -> int:
        if a == 0:
            return b
        if b == 0:
            return a
        self._record_op("add")
        return self.g.op(ADD, a, b)

    def sub(self, a: int, b: int) -> int:
        if b == 0:
            return a
        self._record_op("sub")
        return self.g.op(SUB, a, b)

    def mul(self, a: int, b: int) -> int:
        self._record_op("mul")
        return self.g.op(MUL, a, b)

    def div(self, a: int, b: int) -> int:
        self._record_op("div")
        return self.g.op(DIV, a, b)

    def neg(self, a: int) -> int:
        return self.sub(0, a)

    def mul_add(self, a: int, b: int, c: int) -> int:
        """a*b + c as one fused row (reference MulAdd)."""
        if c == 0:
            return self.mul(a, b)
        self._record_op("mul_add")
        return self.g.op(MULADD, a, b, c)

    def mul_many(self, xs: list[int]) -> int:
        acc = xs[0]
        for x in xs[1:]:
            acc = self.mul(acc, x)
        return acc

    def inner_product(self, xs: list[int], ys: list[int]) -> int:
        acc = 0
        for x, y in zip(xs, ys):
            acc = self.mul_add(x, y, acc)
        return acc

    def add_many(self, xs: list[int]) -> int:
        acc = 0
        for x in xs:
            acc = self.add(acc, x)
        return acc

    # ----- constraints -----

    def connect(self, a: int, b: int):
        """Force two expressions onto the same witness slot ("free"
        equality via union-find, reference ConnectDsu)."""
        if a != b:
            self.connects.append((a, b))

    def assert_zero(self, a: int):
        self.connect(a, 0)

    def assert_eq(self, a: int, b: int):
        self.connect(a, b)

    def assert_bool(self, a: int) -> int:
        return self.g.op(BOOL, a)

    def assert_one(self, a: int):
        self.connect(a, self.one())

    # ----- gadgets -----

    def select(self, cond: int, if_true: int, if_false: int) -> int:
        """cond·(t−f) + f; cond must be boolean-constrained by caller."""
        return self.mul_add(cond, self.sub(if_true, if_false), if_false)

    def exp_power_of_2(self, x: int, log_exp: int) -> int:
        for _ in range(log_exp):
            x = self.mul(x, x)
        return x

    def exp_const(self, x: int, e: int) -> int:
        acc = None
        base = x
        while e:
            if e & 1:
                acc = base if acc is None else self.mul(acc, base)
            e >>= 1
            if e:
                base = self.mul(base, base)
        return acc if acc is not None else self.one()

    def decompose_to_bits(
        self, x: int, n_bits: int, canonical: bool = False
    ) -> list[int]:
        """Hint n_bits booleans with Σ b_i·2^i == x (constrains x to be a
        base-embedded value < 2^n_bits; reference BinaryDecompositionHint).

        With canonical=False and n_bits = 31 the decomposition is
        constrained mod p but NOT to be canonical — for sampled v in
        [0, 2^31 − p) a malicious prover may witness v + p instead,
        flipping in-circuit FRI query-index bits / PoW checks for ~1/128
        of samples on KoalaBear.  This matches the reference construction
        exactly (circuit_builder.rs:1066).  canonical=True closes that
        slack via `assert_bits_canonical` (the challenger circuit's
        sample_bits / check_pow_witness use it)."""
        p = self.E.base.P
        d = self.E.D

        def fill(vals):
            v = int(vals[0][0])
            return [
                ((v >> i) & 1,) + (0,) * (d - 1) for i in range(n_bits)
            ]

        bits = [self.private_input() for _ in range(n_bits)]
        self.hints.append(
            HintDecl(fill, [x], bits, kind="bit_decompose", meta=n_bits)
        )
        for b in bits:
            self.assert_bool(b)
        self.connect(self.reconstruct_index_from_bits(bits), x)
        if canonical:
            self.assert_bits_canonical(bits)
        return bits

    def assert_bits_canonical(self, bits: list[int]) -> None:
        """Constrain Σ b_i·2^i < p for a full-width decomposition.

        For p = 2^n − 2^k + 1 (every Monty31 field here, n=31, and
        Goldilocks, n=64/k=32) an n-bit value v is non-canonical iff bits
        k..n−1 are all ones AND the low k bits encode a nonzero value:
        v = (2^n − 2^k) + low ≥ p ⟺ low ≥ 1.  With top = Π_{i≥k} b_i and
        low = Σ_{i<k} b_i·2^i the forbidden region is exactly
        top·low ≠ 0 (top all-ones with low = 0 is v = p − 1, canonical).
        `low` is the length-k prefix of the `reconstruct_index_from_bits`
        chain already emitted by `decompose_to_bits`, so CSE shares it;
        net cost is ~(n−k)+1 MUL rows per decomposition.  Closes the
        encoding slack the reference leaves open
        (circuit_builder.rs:1066)."""
        p = self.E.base.P
        n = p.bit_length()
        assert len(bits) == n, "canonicity check needs a full-width decompose"
        gap = (1 << n) + 1 - p
        k = gap.bit_length() - 1
        assert gap == 1 << k, "field is not of the 2^n - 2^k + 1 form"
        top = bits[k]
        for b in bits[k + 1 :]:
            top = self.mul(top, b)
        low = self.reconstruct_index_from_bits(bits[:k])
        self.assert_zero(self.mul(top, low))

    def reconstruct_index_from_bits(self, bits: list[int]) -> int:
        acc = 0
        for i, b in enumerate(bits):
            acc = self.mul_add(b, self.const(1 << i), acc)
        return acc

    def recompose_base_coeffs_to_ext(self, coeffs: list[int]) -> int:
        """Σ c_d·e_d for the extension basis e_d = x^d (coeffs must be
        base-embedded).

        When a recompose NPO is enabled (`enable_recompose`), the bridge is
        ONE zero-constraint table row bound purely by the bus (reference
        `circuit/src/ops/recompose.rs`); otherwise D mul_add ALU rows."""
        assert len(coeffs) == self.E.D
        if self._recompose_npo is not None:
            key = tuple(coeffs)
            hit = self._recompose_cse.get(key)
            if hit is not None:
                return hit
            (acc,) = self.call_npo(self._recompose_npo, list(coeffs))
            self._recompose_cse[key] = acc
            self.recompose_src[acc] = list(coeffs)
            return acc
        acc = 0
        for d2, c in enumerate(coeffs):
            basis = tuple(1 if j == d2 else 0 for j in range(self.E.D))
            acc = self.mul_add(c, self.const(basis), acc)
        # remember the coefficient sources (transcript replay + challenger
        # coefficient-level observation of recomposed wires)
        self.recompose_src[acc] = list(coeffs)
        return acc

    def horner_eval(self, x: int, coeffs: list[int]) -> int:
        """Σ coeffs[i]·x^i (coeffs[0] = constant term) via Horner.

        With a Horner NPO enabled (`enable_horner`), K steps pack into one
        degree-2 table row (reference packed HornerAcc,
        `alu_air.rs:63-99`); otherwise one MULADD ALU row per step.
        Short/partial chunks are padded IN FRONT with zero coefficients —
        leading zeros are a no-op for a Horner chain starting at 0."""
        if not coeffs:
            return self.zero
        rev = list(reversed(coeffs))
        # short chains: a nearly-empty packed row costs more (columns and
        # bus tuples) than a couple of lane-packed MULADD ALU ops
        if self._horner_npo is None or len(rev) < 3:
            acc = self.zero
            for c in rev:
                acc = self.mul_add(acc, x, c)
            return acc
        k = self._horner_k
        pad = (-len(rev)) % k
        rev = [self.zero] * pad + rev
        acc = self.zero
        for start in range(0, len(rev), k):
            (acc,) = self.call_npo(
                self._horner_npo, [acc, x] + rev[start : start + k]
            )
        return acc

    def decompose_ext_to_base_coeffs(self, x: int) -> list[int]:
        d = self.E.D

        def fill(vals):
            v = vals[0]
            return [(int(v[j]),) + (0,) * (d - 1) for j in range(d)]

        coeffs = [self.private_input() for _ in range(d)]
        self.hints.append(HintDecl(fill, [x], coeffs, kind="ext_decompose"))
        self.connect(self.recompose_base_coeffs_to_ext(coeffs), x)
        return coeffs

    def hint(self, fn, inputs: list[int], n_outputs: int) -> list[int]:
        outs = [self.private_input() for _ in range(n_outputs)]
        self.hints.append(HintDecl(fn, inputs, outs))
        return outs

    # ----- NPOs -----

    def enable_op(self, plugin, config=None):
        self.enabled_ops[plugin.type_id] = (plugin, config)

    def enable_recompose(self, plugin, config=None):
        """Route `recompose_base_coeffs_to_ext` through the zero-constraint
        recompose table (reference `enable_recompose`)."""
        self.enable_op(plugin, config)
        self._recompose_npo = plugin.type_id

    def enable_horner(self, plugin, config=None):
        """Route `horner_eval` through the K-step packed Horner table."""
        self.enable_op(plugin, config)
        self._horner_npo = plugin.type_id
        self._horner_k = plugin.k

    def call_npo(self, type_id: str, inputs: list[int], tag=None) -> list[int]:
        plugin, config = self.enabled_ops[type_id]
        op_id = len(self.npos)
        n_out = plugin.num_outputs(config, inputs)
        outputs = [self.g.npo_out(op_id, k) for k in range(n_out)]
        self.npos.append(NpoCall(plugin, config, list(inputs), outputs, op_id, tag))
        return outputs

    def perm_call(
        self,
        type_id: str,
        inputs: list,
        out_ctl: list,
        *,
        new_start: bool = True,
        merkle_path: bool = False,
        merkle_arity: int = 2,
        bind_sum: bool = False,
        chain=None,
        tag=None,
    ):
        """Add one chained permutation row block (reference `add_perm`,
        `circuit/src/ops/perm.rs:130`).

        inputs: per ext limb, an ExprId to CTL in, or None (value chains
        in-table from the previous call of `chain`, or is private sibling
        data on merkle rows); out_ctl: per limb, whether to expose the
        output limb as a wire.  Consecutive calls sharing `chain` occupy
        adjacent table row blocks so the chaining constraints bind them.
        Returns (outputs, sum_wire)."""
        plugin, config = self.enabled_ops[type_id]
        op_id = len(self.npos)
        outputs = [
            self.g.npo_out(op_id, k) if out_ctl[k] else None
            for k in range(len(out_ctl))
        ]
        if chain is None:
            chain = ("solo", op_id)
        prev_op = self._chain_last.get(chain)
        if new_start:
            assert prev_op is None or not merkle_path, (
                "a merkle row never starts a chain"
            )
        else:
            assert prev_op is not None, f"chain {chain} has no previous call"
        call = NpoCall(
            plugin,
            config,
            list(inputs),
            outputs,
            op_id,
            tag,
            new_start=new_start,
            merkle_path=merkle_path,
            merkle_arity=merkle_arity,
            chain=chain,
            prev_op=prev_op,
        )
        if bind_sum:
            call.sum_out = self.g.npo_out(op_id, len(out_ctl))
        self._chain_last[chain] = op_id
        self.npos.append(call)
        return outputs, call.sum_out

    def new_chain(self, label: str = "chain"):
        """Fresh chain key for perm_call (unique per builder)."""
        self._chain_counter += 1
        return (label, self._chain_counter)

    def npo_out_wire(self, op_id: int, limb: int) -> int:
        """Lazily expose output limb `limb` of an earlier perm_call (used by
        the chained challenger to out-CTL a limb only when it is sampled)."""
        call = self.npos[op_id]
        if call.outputs[limb] is None:
            call.outputs[limb] = self.g.npo_out(op_id, limb)
        return call.outputs[limb]

    # ----- tags / scopes / profiling -----

    def tag(self, name: str, eid: int):
        self.tags[name] = eid

    def push_scope(self, name: str):
        self._scopes.append(name)

    def pop_scope(self):
        self._scopes.pop()

    def _record_op(self, kind_name: str):
        """Per-scope op counting (reference `OpCounts`/`ProfilingState`,
        `expression_builder.rs:73-99`)."""
        scope = "/".join(self._scopes) or "<root>"
        per = self.op_counts.setdefault(scope, {})
        per[kind_name] = per.get(kind_name, 0) + 1

    def dump_allocation_log(self) -> str:
        """Per-node allocation report with creating scope (reference
        `dump_allocation_log`, `circuit_builder.rs:844`; needs debug=True)."""
        from .expr import CONST, PRIVATE, PUBLIC

        kind_names = {CONST: "const", PUBLIC: "public", PRIVATE: "private"}
        lines = []
        for eid, kind, scope in self.g.alloc_log:
            kn = kind_names.get(kind, f"op{kind}")
            lines.append(f"[ALLOC] expr {eid}: {kn} @ {scope or '<root>'}")
        return "\n".join(lines)

    def dump_profile(self) -> str:
        """[PROFILING]-style per-scope op-count report."""
        lines = []
        for scope in sorted(self.op_counts):
            per = self.op_counts[scope]
            total = sum(per.values())
            detail = " ".join(f"{k}={v}" for k, v in sorted(per.items()))
            lines.append(f"[PROFILING] {scope}: total={total} {detail}")
        return "\n".join(lines)

    # ----- build -----

    @gc_paused_fn
    def build(self):
        from .compile import compile_circuit

        return compile_circuit(self)
