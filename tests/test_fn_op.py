"""Traced-function ops (FnOp / FnGate): the lazy-streaming oracle path.

The reference streams function-op entries lazily at any width with O(1)
memory (``FunctionOpIterator``, qip-iterators/src/iterators/
qubit_iterators.rs:223-269). The TPU-native analog computes ``(col, val)``
IN-TRACE from iota bit arithmetic — nothing embeds in the program — and
these tests pin its semantics against the table-based paths at small
widths, plus a wide case no table could reasonably embed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustqip_tpu.builder.builder import _lower_item
from rustqip_tpu.builder.circuit_objects import (
    CircuitObject,
    FnGate,
    invert_circuit_object,
)
from rustqip_tpu.engine.apply import apply_op
from rustqip_tpu.engine.real_apply import apply_ops_ri, plan_sweeps
from rustqip_tpu.errors import CircuitError
from rustqip_tpu.ops import gates
from rustqip_tpu.ops.matrix_ops import (
    DenseOp,
    FnOp,
    invert_op,
    make_fn_op,
    make_function_op,
    make_matrix_op,
    op_to_dense,
)
from rustqip_tpu.prelude import LocalBuilder


def _phase_perm(row):
    """An order-respecting affine permutation with a nontrivial phase."""
    return (row * 5 + 3) % 32, jnp.exp(1j * 0.7 * row)


def test_fn_op_matches_dense_embedding():
    """FnOp on mixed row/col qubits (unsorted indices) == its dense form."""
    n = 12
    rng = np.random.default_rng(0)
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    v /= np.linalg.norm(v)
    op = make_fn_op([0, 7, 3, 10, 11], _phase_perm)
    U = op_to_dense(op)
    assert np.abs(U @ U.conj().T - np.eye(32)).max() < 1e-12

    got = np.asarray(apply_op(n, op, jnp.asarray(v)))
    want = np.asarray(
        apply_op(n, DenseOp(tuple(op.indices), U), jnp.asarray(v))
    )
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_fn_op_ri_path_with_neighbors():
    """(re, im) plane path: FnOp between window-eligible gates; the
    planner must treat it as a solo pass, not crash or fuse it."""
    n = 12
    ops = [
        make_matrix_op([1], gates.H.reshape(-1)),
        make_fn_op([0, 7, 3, 10, 11], _phase_perm),
        make_matrix_op([11], gates.H.reshape(-1)),
    ]
    kinds = [k for k, _, _ in plan_sweeps(n, ops, False)]
    assert kinds[1] == "op"  # the FnOp is its own pass

    rng = np.random.default_rng(1)
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    v /= np.linalg.norm(v)
    re, im = apply_ops_ri(
        n, ops, jnp.asarray(v.real), jnp.asarray(v.imag)
    )
    got = np.asarray(re) + 1j * np.asarray(im)
    want = v
    for op in ops:
        if isinstance(op, FnOp):
            op = DenseOp(tuple(op.indices), op_to_dense(op))
        want = np.asarray(apply_op(n, op, jnp.asarray(want)))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_wide_fn_oracle_single_pass():
    """18-qubit XOR permutation inside n=20 — far beyond any table cap;
    a basis state maps to the XOR-shifted basis state exactly."""
    n, k = 20, 18

    def wide(row):
        return row ^ 0x2A5A5, jnp.ones(row.shape, jnp.float64)

    op = make_fn_op(list(range(k)), wide)
    s = np.zeros(1 << n, np.float64)
    s[12345] = 1.0
    re, im = apply_ops_ri(n, [op], jnp.asarray(s), jnp.zeros(1 << n))
    nz = np.nonzero(np.asarray(re))[0]
    # qubits 0..17 sit above the two low qubits in the big-endian index.
    assert list(nz) == [12345 ^ (0x2A5A5 << 2)]
    assert float(np.asarray(re)[nz[0]]) == 1.0


def test_function_op_xor_semantics_and_invert():
    """|x>|y> -> theta(x)|x>|y ^ f(x)> matches the reference construction
    (qubit_iterators.rs:232-253) and inverts via elementwise conjugate."""

    def f(x):
        return (3 * x + 1) % 8, jnp.exp(1j * 0.3 * x)

    op = make_function_op([0, 1, 2], [3, 4, 5], f)
    U = op_to_dense(op)
    assert np.abs(U @ U.conj().T - np.eye(64)).max() < 1e-12
    Uinv = op_to_dense(invert_op(op))
    assert np.abs(Uinv @ U - np.eye(64)).max() < 1e-12


def test_builder_apply_function_op_matches_table_path():
    def f(x):
        return (3 * x + 1) % 8, 1

    b = LocalBuilder(dtype="c128")
    rx, ry = b.register(3), b.register(3)
    rx = b.h(rx)
    rx, ry = b.apply_function_op(rx, ry, f)
    b.merge_registers([rx, ry])
    state = np.asarray(b.calculate_state()[0])

    U = op_to_dense(make_function_op([0, 1, 2], [3, 4, 5], f))
    b2 = LocalBuilder(dtype="c128")
    rx2, ry2 = b2.register(3), b2.register(3)
    rx2 = b2.h(rx2)
    r2 = b2.merge_registers([rx2, ry2])
    b2.apply_matrix(r2, U)
    want = np.asarray(b2.calculate_state()[0])
    np.testing.assert_allclose(state, want, atol=1e-12)


def test_builder_apply_fn_matrix_f32_planes():
    """The f32 (re, im) production dtype end-to-end."""

    def g(row):
        return (row + 5) % 16, jnp.exp(1j * 0.25 * row)

    b = LocalBuilder(dtype="f32")
    r = b.h(b.register(4))
    b.apply_fn_matrix(r, g)
    state = b.calculate_state()[0]
    got = np.asarray(state).astype(np.complex128)

    U = op_to_dense(make_fn_op([0, 1, 2, 3], g))
    b2 = LocalBuilder(dtype="c128")
    r2 = b2.h(b2.register(4))
    b2.apply_matrix(r2, U)
    want = np.asarray(b2.calculate_state()[0])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fn_gate_survives_swap_deferral():
    """Lazy relabeling remaps FnOp indices positionally: swaps recorded
    before the oracle must commute through it exactly."""

    def g(row):
        return (row * 3 + 1) % 8, jnp.exp(1j * 0.4 * row)

    def build(b):
        r = b.register(5)
        qs = b.split_all_register(r)
        qs[0], qs[3] = b.swap(qs[0], qs[3])
        qs[1] = b.h(qs[1])
        tgt = b.merge_registers([qs[0], qs[2], qs[4]])
        b.apply_fn_matrix(tgt, g)

    b1 = LocalBuilder(dtype="c128")
    build(b1)
    got = np.asarray(b1.calculate_state()[0])

    # Reference: same circuit with the oracle densified up front.
    U = op_to_dense(make_fn_op([0, 1, 2], g))
    b2 = LocalBuilder(dtype="c128")
    r = b2.register(5)
    qs = b2.split_all_register(r)
    qs[0], qs[3] = b2.swap(qs[0], qs[3])
    qs[1] = b2.h(qs[1])
    tgt = b2.merge_registers([qs[0], qs[2], qs[4]])
    b2.apply_matrix(tgt, U)
    want = np.asarray(b2.calculate_state()[0])
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_fn_op_not_fused():
    """Fusion must pass FnOps through instead of densifying them."""
    from rustqip_tpu.engine.fusion import fuse_ops

    ops = [
        make_matrix_op([0], gates.H.reshape(-1)),
        make_fn_op([0, 1], lambda r: (r ^ 3, 1)),
        make_matrix_op([0], gates.H.reshape(-1)),
    ]
    fused = fuse_ops(ops)
    assert any(isinstance(op, FnOp) for op in fused)


def test_fn_gate_inversion_rules():
    def f(x):
        return x ^ 5, jnp.exp(1j * 0.3 * x)

    op = make_function_op([0, 1, 2], [3, 4, 5], f)
    co = CircuitObject(6, FnGate(6, op.fn, op.tag, False, True))
    (inv,) = invert_circuit_object(co)
    assert inv.obj.conjugated and inv.obj.self_transpose

    general = CircuitObject(
        2, FnGate(2, lambda r: ((r + 1) % 4, 1), "rot4")
    )
    with pytest.raises(CircuitError):
        invert_circuit_object(general)


def test_fn_gate_serialize_raises_clearly():
    from rustqip_tpu.utils.serialize import circuit_to_json

    b = LocalBuilder(dtype="c128")
    r = b.h(b.register(2))
    b.apply_fn_matrix(r, lambda row: ((row + 1) % 4, 1), tag="rot4")
    with pytest.raises(CircuitError, match="rot4"):
        circuit_to_json(b)


def test_fn_gate_qasm_export_materializes_small():
    from rustqip_tpu.qasm.export import to_openqasm

    def g(row):
        return (row + 1) % 4, jnp.ones(row.shape, jnp.float64)

    b = LocalBuilder(dtype="c128")
    r = b.h(b.register(2))
    b.apply_fn_matrix(r, g)
    qasm = to_openqasm(b)
    assert "OPENQASM 2.0" in qasm
    # The traced op synthesized to real gates, not a placeholder comment.
    assert "traced-function" not in qasm


def test_fn_op_sharded_gspmd_and_explicit():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.parallel import make_shard_mesh, sharded_calculate_state
    from rustqip_tpu.parallel.explicit import compile_sharded_explicit

    def f(x):
        return (3 * x + 1) % 8, jnp.exp(1j * 0.5 * x)

    def build(b):
        rx, ry = b.register(5), b.register(3)
        rx = b.h(rx)
        rx, ry = b.apply_function_op(rx, ry, f)
        b.merge_registers([rx, ry])

    b1 = LocalBuilder(dtype="f64")
    build(b1)
    expected = np.asarray(b1.calculate_state(seed=0)[0])

    mesh = make_shard_mesh(8)
    b2 = LocalBuilder(dtype="f64")
    build(b2)
    re, im, _ = sharded_calculate_state(b2, mesh=mesh, seed=0)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-10)

    b3 = LocalBuilder(dtype="f64")
    build(b3)
    entries = [e for item in b3.pipeline for e in _lower_item(item)]
    cc = compile_sharded_explicit(8, entries, np.complex128, mesh)
    re3, im3, _ = cc.run(initial_index=0, key=jax.random.PRNGKey(0))
    got3 = np.asarray(re3) + 1j * np.asarray(im3)
    np.testing.assert_allclose(got3, expected, atol=1e-10)


def test_fn_op_shard_local_stays_lazy():
    """An oracle entirely on shard-local qubits lowers into the 'local'
    schedule (no densification) under the explicit executor."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.parallel.shard_ops import _lower_schedule

    op = make_fn_op([4, 5, 6, 7, 8], _phase_perm)
    sched = _lower_schedule(9, 3, [op])
    assert [kind for kind, *_ in sched] == ["local"]
    (lop,) = sched[0][1]
    assert isinstance(lop, FnOp) and lop.indices == (1, 2, 3, 4, 5)


def test_diagonal_fn_op_matches_gather_form():
    """diagonal=True (no gather) must agree with the same fn applied as a
    general FnOp and with its dense form, including conjugation."""

    def phases(row):
        return row, jnp.exp(1j * 0.37 * row)

    n = 10
    rng = np.random.default_rng(3)
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    v /= np.linalg.norm(v)
    diag = make_fn_op([1, 4, 8], phases, diagonal=True)
    assert diag.diagonal and diag.self_transpose
    general = make_fn_op([1, 4, 8], phases)
    got = np.asarray(apply_op(n, diag, jnp.asarray(v)))
    want = np.asarray(apply_op(n, general, jnp.asarray(v)))
    np.testing.assert_allclose(got, want, atol=1e-12)

    from rustqip_tpu.ops.matrix_ops import conj_op

    gotc = np.asarray(apply_op(n, conj_op(diag), jnp.asarray(v)))
    wantc = np.asarray(
        apply_op(
            n,
            DenseOp(tuple(diag.indices), op_to_dense(diag).conj()),
            jnp.asarray(v),
        )
    )
    np.testing.assert_allclose(gotc, wantc, atol=1e-10)


def test_diagonal_fn_op_sharded_zero_comm():
    """A wide diagonal FnOp spanning global + local qubits lowers to the
    zero-communication 'fndiag' schedule and matches the dense result."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.parallel import make_shard_mesh
    from rustqip_tpu.parallel.shard_ops import (
        _lower_schedule,
        apply_sharded_ops,
        make_sharded_pair,
    )

    n, g = 10, 3

    def phases(row):
        return row, jnp.exp(1j * 0.21 * row)

    # Spans ALL qubits — the relocation path would have no free slots;
    # the fndiag schedule needs none.
    op = make_fn_op(list(range(n)), phases, diagonal=True)
    sched = _lower_schedule(n, g, [op])
    assert [kind for kind, *_ in sched] == ["fndiag"]

    mesh = make_shard_mesh(8)
    re, im = make_sharded_pair(mesh, n, initial_index=0, dtype=np.float64)
    # Spread amplitude first so every shard is nontrivial.
    from rustqip_tpu.ops.matrix_ops import make_matrix_op as _mk

    hs = [_mk([q], gates.H.reshape(-1)) for q in range(n)]
    re, im = apply_sharded_ops(mesh, n, hs + [op], re, im)
    got = np.asarray(re) + 1j * np.asarray(im)

    v = np.full(1 << n, (1 / np.sqrt(2)) ** n, dtype=np.complex128)
    want = v * np.exp(1j * 0.21 * np.arange(1 << n))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_conditioned_fn_matrix():
    """cb.apply_fn_matrix — conditioned traced ops (Shor-style controlled
    modular arithmetic) match the conditioned dense reference, export to
    QASM, and invert."""
    A, MOD = 7, 15

    def mulmod(row):
        return (
            jnp.where(row < MOD, (A * row) % MOD, row),
            jnp.ones(row.shape, jnp.float64),
        )

    def build(b, traced):
        c = b.h(b.qubit())
        y = b.register(4)
        qs = b.split_all_register(y)
        qs[0] = b.x(qs[0])  # |y=1>
        y = b.merge_registers(qs)
        cb = b.condition_with(c)
        if traced:
            y = cb.apply_fn_matrix(y, mulmod, tag="mul7mod15")
        else:
            y = cb.apply_matrix(
                y, op_to_dense(make_fn_op([0, 1, 2, 3], mulmod))
            )
        cb.dissolve()
        return b

    s1 = np.asarray(build(LocalBuilder(dtype="c128"), True).calculate_state()[0])
    s2 = np.asarray(build(LocalBuilder(dtype="c128"), False).calculate_state()[0])
    np.testing.assert_allclose(s1, s2, atol=1e-12)

    qasm = build(LocalBuilder(dtype="c128"), True).to_openqasm()
    assert "OPENQASM" in qasm and "traced-function" not in qasm


def test_controlled_fn_gate_invert_and_serialize():
    from rustqip_tpu.builder.circuit_objects import ControlledMatGate
    from rustqip_tpu.utils.serialize import circuit_to_json

    def f(x):
        return x ^ 2, 1

    op = make_function_op([0], [1, 2], f)
    g = FnGate(3, op.fn, op.tag, False, True)
    (inv,) = invert_circuit_object(CircuitObject(4, ControlledMatGate(1, g)))
    assert inv.obj.mat.conjugated and inv.obj.mat.self_transpose

    b = LocalBuilder(dtype="c128")
    c = b.qubit()
    y = b.register(3)
    cb = b.condition_with(c)
    y = cb.apply_fn_matrix(y, lambda r: (r ^ 1, 1), tag="xor1",
                           self_transpose=True)
    cb.dissolve()
    with pytest.raises(CircuitError, match="xor1"):
        circuit_to_json(b)


def test_wide_xor_oracle_gex_sharded():
    """VERDICT r3 #7: a wide XOR oracle spanning the TOP (global) qubits of
    an n=16 / 8-device mesh — more globals than free local slots, wider
    than DENSE_CAP — lowers to the generalized-permutation exchange
    ('gex': XOR-stage ppermutes with in-trace source routing, never
    densified) and matches the single-device engine exactly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.parallel import make_shard_mesh
    from rustqip_tpu.parallel.shard_ops import (
        _lower_schedule,
        apply_sharded_ops,
        make_sharded_pair,
    )

    n, g = 16, 3

    def xor_oracle(row):
        # |x>|y> -> |x>|y ^ f(x)>, x = top 12 bits, y = low 4.
        x = row >> 4
        return row ^ ((x * 11 + 3) & 0xF), jnp.ones(row.shape, jnp.float64)

    op = make_fn_op(list(range(n)), xor_oracle, self_transpose=True)
    sched = _lower_schedule(n, g, [op])
    assert [kind for kind, *_ in sched] == ["gex"]

    mesh = make_shard_mesh(8)
    hs = [make_matrix_op([q], gates.H.reshape(-1)) for q in range(0, 12, 2)]
    ts = [make_matrix_op([q], gates.T.reshape(-1)) for q in (0, 2, 8)]
    re, im = make_sharded_pair(mesh, n, initial_index=0, dtype=np.float64)
    re, im = apply_sharded_ops(mesh, n, hs + ts + [op], re, im)
    got = np.asarray(re) + 1j * np.asarray(im)

    v = jnp.zeros(1 << n, jnp.complex128).at[0].set(1.0)
    for o in hs + ts + [op]:
        v = apply_op(n, o, v)
    np.testing.assert_allclose(got, np.asarray(v), atol=1e-12)


def test_xor_flip_flat_matches_gather():
    """_xor_flip_flat is the gather-free re-addressing x[i ^ lmask] the
    gex flip recombination rides (measured ~26x cheaper than the flat
    gather at 2^25-elem shards, scripts/gex_cost_probe.py 2026-08-20).
    Pin bit-exactness against the straight gather on both layouts: the
    (rows, 128) lane view (row bits, lane bits, mixed) and the tiny
    all-row-bits fallback."""
    from rustqip_tpu.parallel.shard_ops import _xor_flip_flat

    rng = np.random.default_rng(11)
    for size, masks in (
        (1 << 10, (0, 1, 0b101, 1 << 7, 1 << 9, (1 << 9) | (1 << 7) | 5)),
        (1 << 5, (0, 1, 0b10110)),
    ):
        x = jnp.asarray(rng.normal(size=size))
        idx = np.arange(size)
        for lmask in masks:
            got = np.asarray(_xor_flip_flat(x, lmask))
            want = np.asarray(x)[idx ^ lmask]
            np.testing.assert_array_equal(got, want)


def test_gex_flip_path_matches_gather_path():
    """gex recombination A/B: a wide oracle with only kl=3 LOCAL qubits
    routes through the XOR-flip layout by default (RUSTQIP_TPU_GEX_FLIP
    = 4 >= kl); forcing -1 takes the per-slot whole-shard gather. Both
    must match the single-device engine exactly — and each other."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.parallel import make_shard_mesh
    from rustqip_tpu.parallel.shard_ops import (
        _lower_schedule,
        apply_sharded_ops,
        make_sharded_pair,
    )

    n, g = 8, 3

    def oracle(row):
        # self-inverse XOR permutation mixing global and local op bits,
        # with a phase on the permutation-invariant bits.
        return row ^ 0b110101, jnp.exp(1j * 0.31 * (row & 0b001010))

    # 3 globals + 3 locals; free locals {6,7} = 2 < 3 globals -> gex,
    # and kl = 3 <= the default flip threshold.
    op = make_fn_op(tuple(range(6)), oracle, self_transpose=True)
    sched = _lower_schedule(n, g, [op])
    assert [kind for kind, *_ in sched] == ["gex"]

    mesh = make_shard_mesh(8)
    hs = [make_matrix_op([q], gates.H.reshape(-1)) for q in range(0, n, 2)]
    ts = [make_matrix_op([q], gates.T.reshape(-1)) for q in (1, 5)]

    def run():
        re, im = make_sharded_pair(mesh, n, initial_index=0, dtype=np.float64)
        re, im = apply_sharded_ops(mesh, n, hs + ts + [op], re, im)
        return np.asarray(re) + 1j * np.asarray(im)

    got_flip = run()
    import os

    os.environ["RUSTQIP_TPU_GEX_FLIP"] = "-1"
    try:
        got_gather = run()
    finally:
        del os.environ["RUSTQIP_TPU_GEX_FLIP"]

    v = jnp.zeros(1 << n, jnp.complex128).at[0].set(1.0)
    for o in hs + ts + [op]:
        v = apply_op(n, o, v)
    np.testing.assert_allclose(got_flip, np.asarray(v), atol=1e-12)
    np.testing.assert_allclose(got_gather, got_flip, atol=0)


@pytest.mark.parametrize("seed", [5])
def test_gex_flip_fuzz_random_xor_affine(seed):
    """Seeded-random gex-flip coverage at the kl=4 threshold edge:
    XOR-affine oracles (col = row ^ m, random m and random phases on
    the untouched bits) on two index shapes that lower to gex with
    kl=4 local bits — contiguous and scattered. Sharded (default flip
    layout) must match the single-device engine exactly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.parallel import make_shard_mesh
    from rustqip_tpu.parallel.shard_ops import (
        _lower_schedule,
        apply_sharded_ops,
        make_sharded_pair,
    )

    rng = np.random.default_rng(seed)
    n, g = 9, 3
    mesh = make_shard_mesh(8)
    # Two fixed gex-guaranteed shapes (globals outnumber the free local
    # slots), random mask/phase values: kl=4 contiguous and kl=4 with a
    # lane-and-row scatter of local bits.
    for locs in ((3, 4, 5, 6), (3, 5, 6, 8)):
        idx = tuple(range(g)) + locs
        k = len(idx)
        m = int(rng.integers(1, 1 << k))
        th = float(rng.uniform(0, 2 * np.pi))

        def oracle(row, m=m, th=th):
            keep = (~np.int32(m)) & ((1 << k) - 1)
            return row ^ m, jnp.exp(1j * th * (row & keep))

        op = make_fn_op(idx, oracle, self_transpose=True)
        sched = _lower_schedule(n, g, [op])
        assert [kind for kind, *_ in sched] == ["gex"]
        hs = [
            make_matrix_op([q], gates.H.reshape(-1))
            for q in range(0, n, 2)
        ]
        re, im = make_sharded_pair(mesh, n, initial_index=0,
                                   dtype=np.float64)
        re, im = apply_sharded_ops(mesh, n, hs + [op], re, im)
        got = np.asarray(re) + 1j * np.asarray(im)
        v = jnp.zeros(1 << n, jnp.complex128).at[0].set(1.0)
        for o in hs + [op]:
            v = apply_op(n, o, v)
        np.testing.assert_allclose(got, np.asarray(v), atol=1e-12)


def test_fn_op_gex_unsorted_indices_and_inverse():
    """gex with UNSORTED op indices, complex phases, and the conjugated
    inverse: op then invert_op(op) must return the input state (the
    conjugated value plane rides the same exchange)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.parallel import make_shard_mesh
    from rustqip_tpu.parallel.shard_ops import (
        _lower_schedule,
        apply_sharded_ops,
        make_sharded_pair,
    )

    n, g = 10, 3

    def phases(row):
        # self-inverse XOR permutation + a phase on the UNTOUCHED bits
        # only (so M^T == M truly holds and the inverse is the
        # elementwise conjugate)
        return row ^ 0b101000101, jnp.exp(
            1j * 0.43 * (row & ~np.int32(0b101000101))
        )

    idx = (0, 9, 1, 2, 5, 4, 3, 7, 8)  # 6 missing: 1 free slot < 3 globals
    op = make_fn_op(idx, phases, self_transpose=True)
    inv = invert_op(op)
    sched = _lower_schedule(n, g, [op, inv])
    assert [kind for kind, *_ in sched] == ["gex", "gex"]

    mesh = make_shard_mesh(8)
    hs = [make_matrix_op([q], gates.H.reshape(-1)) for q in range(0, n, 3)]
    re, im = make_sharded_pair(mesh, n, initial_index=0, dtype=np.float64)
    re, im = apply_sharded_ops(mesh, n, hs + [op], re, im)
    got = np.asarray(re) + 1j * np.asarray(im)
    v = jnp.zeros(1 << n, jnp.complex128).at[0].set(1.0)
    for o in hs + [op]:
        v = apply_op(n, o, v)
    np.testing.assert_allclose(got, np.asarray(v), atol=1e-12)

    # op followed by its inverse == the H-only state
    re, im = make_sharded_pair(mesh, n, initial_index=0, dtype=np.float64)
    re, im = apply_sharded_ops(mesh, n, hs + [op, inv], re, im)
    got2 = np.asarray(re) + 1j * np.asarray(im)
    v2 = jnp.zeros(1 << n, jnp.complex128).at[0].set(1.0)
    for o in hs:
        v2 = apply_op(n, o, v2)
    np.testing.assert_allclose(got2, np.asarray(v2), atol=1e-12)


def test_conditioned_fn_op_sharded_paths():
    """Conditioned traced oracles under the explicit sharded executor:
    a controlled DIAGONAL fn lowers to the zero-comm 'fndiag' schedule
    (control select inside the traced fn); a controlled wide general fn
    with immovable globals rides 'gex'. Both match the single-device
    engine exactly, including the inverse."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.ops.matrix_ops import make_control_op
    from rustqip_tpu.parallel import make_shard_mesh
    from rustqip_tpu.parallel.shard_ops import (
        _lower_schedule,
        apply_sharded_ops,
        make_sharded_pair,
    )

    n, g = 10, 3
    mesh = make_shard_mesh(8)
    hs = [make_matrix_op([q], gates.H.reshape(-1)) for q in range(0, n, 2)]

    def phases(row):
        return row, jnp.exp(1j * 0.29 * row)

    cop_diag = make_control_op(
        [0], make_fn_op(list(range(1, n)), phases, diagonal=True)
    )
    assert [k for k, *_ in _lower_schedule(n, g, [cop_diag])] == ["fndiag"]

    def xor_f(row):
        # phase-free XOR into the low 5 bits, keyed on the untouched
        # high bits -> truly self-transpose
        return row ^ (((row >> 5) * 7 + 2) % 32), jnp.ones(
            row.shape, jnp.float64
        )

    cop_wide = make_control_op(
        [0],
        make_fn_op(list(range(1, n)), xor_f, self_transpose=True),
    )
    assert [k for k, *_ in _lower_schedule(n, g, [cop_wide])] == ["gex"]

    inv_wide = invert_op(cop_wide)
    for ops in ([cop_diag], [cop_wide], [cop_wide, inv_wide]):
        re, im = make_sharded_pair(mesh, n, initial_index=0,
                                   dtype=np.float64)
        re, im = apply_sharded_ops(mesh, n, hs + ops, re, im)
        got = np.asarray(re) + 1j * np.asarray(im)
        v = jnp.zeros(1 << n, jnp.complex128).at[0].set(1.0)
        for o in hs + ops:
            v = apply_op(n, o, v)
        np.testing.assert_allclose(got, np.asarray(v), atol=1e-12)


def test_conditioned_fn_matrix_sharded_builder():
    """Builder surface: cb.apply_fn_matrix under BOTH sharded executors
    (controlled modular arithmetic, the Shor shape) matches the
    single-chip state at 1e-10."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.parallel import make_shard_mesh, sharded_calculate_state

    A, MOD = 7, 15

    def mulmod(row):
        return (
            jnp.where(row < MOD, (A * row) % MOD, row),
            jnp.ones(row.shape, jnp.float64),
        )

    def build(b):
        c = b.h(b.qubit())
        y = b.register(4)
        qs = b.split_all_register(y)
        qs[0] = b.x(qs[0])  # |y=1>
        y = b.merge_registers(qs)
        cb = b.condition_with(c)
        y = cb.apply_fn_matrix(y, mulmod, tag="mul7mod15")
        cb.dissolve()

    b1 = LocalBuilder(dtype="f64")
    build(b1)
    expected = np.asarray(b1.calculate_state(seed=0)[0])

    mesh = make_shard_mesh(8)
    for strategy in ("explicit", "gspmd"):
        b2 = LocalBuilder(dtype="f64")
        build(b2)
        re, im, _ = sharded_calculate_state(
            b2, mesh=mesh, seed=0, strategy=strategy
        )
        got = np.asarray(re) + 1j * np.asarray(im)
        np.testing.assert_allclose(got, expected, atol=1e-10)
