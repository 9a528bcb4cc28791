"""Native reflection op (``ReflectionOp`` / ``ReflectionGate``).

``D = 2|s><s| - I`` about the uniform superposition — the TPU-native
inversion-about-the-mean. The reference (and ``algos.grover.diffusion``)
composes this from ``2k`` Hadamards, ``2k`` X's and a multi-controlled Z
(one state pass each; cf. Grover's construction the reference's examples
follow); the native op is one reduction + one elementwise pass at any
width, and the distributed mean is a single (grouped) ``psum``. These
tests pin the op against dense ground truth on every execution path:
engine (complex 2-D, tensor, (re, im) planes), builder (both
conditioning modes, inversion, serialization, QASM), window planner, and
both sharded executors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustqip_tpu.builder.builder import LocalBuilder, _lower_item
from rustqip_tpu.builder.circuit_objects import (
    CircuitObject,
    ControlledMatGate,
    ReflectionGate,
    invert_circuit_object,
)
from rustqip_tpu.errors import CircuitError
from rustqip_tpu.ops.matrix_ops import (
    ReflectionOp,
    conj_op,
    invert_op,
    make_control_op,
    make_matrix_op,
    make_reflection_op,
    op_to_dense,
    transpose_op,
)


def _dense_reflection(k: int) -> np.ndarray:
    dim = 1 << k
    return (2.0 / dim) * np.ones((dim, dim)) - np.eye(dim)


def test_reflection_op_dense_and_algebra():
    for k in (1, 2, 4):
        op = make_reflection_op(range(k))
        np.testing.assert_allclose(
            op_to_dense(op), _dense_reflection(k), atol=1e-14
        )
    op = make_reflection_op([3, 1])
    assert op.indices == (1, 3)  # normalized sorted (order-invariant)
    assert conj_op(op) is op and transpose_op(op) is op  # real symmetric
    assert invert_op(op) == op  # self-inverse
    with pytest.raises(CircuitError):
        make_reflection_op([])
    with pytest.raises(CircuitError):
        make_reflection_op([2, 2])
    # D on one qubit is exactly X.
    np.testing.assert_allclose(
        op_to_dense(make_reflection_op([0])), [[0, 1], [1, 0]], atol=1e-15
    )


@pytest.mark.parametrize(
    "n,idx",
    [
        (3, [0, 1, 2]),          # all-lane widths
        (4, [1, 3]),
        (9, [0, 2, 3, 7, 8]),    # non-contiguous row + lane mix
        (10, list(range(10))),   # full register across the (R, C) seam
        (10, [0, 9]),            # top row bit + bottom lane bit
        (8, [4]),                # single mid qubit
    ],
)
def test_reflection_engine_paths_match_dense(n, idx):
    from rustqip_tpu.engine.apply import _apply_to_state, _t_apply, apply_op
    from rustqip_tpu.engine.real_apply import apply_op_ri

    rng = np.random.default_rng(7)
    psi = rng.normal(size=2**n) + 1j * rng.normal(size=2**n)
    psi /= np.linalg.norm(psi)
    op = make_reflection_op(idx)
    ref = np.asarray(
        apply_op(
            n,
            make_matrix_op(idx, op_to_dense(op).reshape(-1)),
            jnp.asarray(psi),
        )
    )
    got_2d = np.asarray(_apply_to_state(n, op, jnp.asarray(psi)))
    got_t = np.asarray(
        _t_apply(n, op, jnp.asarray(psi).reshape((2,) * n)).reshape(-1)
    )
    gr, gi = apply_op_ri(n, op, jnp.asarray(psi.real), jnp.asarray(psi.imag))
    got_ri = np.asarray(gr) + 1j * np.asarray(gi)
    for got in (got_2d, got_t, got_ri):
        np.testing.assert_allclose(got, ref, atol=1e-12)
    # self-inverse on the layout-aware path
    twice = np.asarray(
        _apply_to_state(n, op, _apply_to_state(n, op, jnp.asarray(psi)))
    )
    np.testing.assert_allclose(twice, psi, atol=1e-12)


def test_apply_reflection_equals_gate_diffusion_up_to_phase():
    from rustqip_tpu.algos import grover

    n = 5
    for native_cond in (True, False):
        def state_of(build):
            b = LocalBuilder(dtype="f64", native_conditioning=native_cond)
            r = b.register(n)
            r = b.h(r)
            r = b.t(r)
            r = build(b, r)
            s, _ = b.calculate_state_with_init([(r, 3)])
            return np.asarray(s)

        s_native = state_of(lambda b, r: b.apply_reflection(r))
        s_gates = state_of(lambda b, r: grover.diffusion(b, r))
        # The gate composition realizes -(2|s><s| - I): global phase -1.
        np.testing.assert_allclose(s_native, -s_gates, atol=1e-12)


@pytest.mark.parametrize("k,nctrl", [(3, 1), (3, 2), (1, 1), (2, 3)])
def test_conditioned_reflection_matches_controlled_dense(k, nctrl):
    D = _dense_reflection(k)

    def run(use_dense, native_cond):
        b = LocalBuilder(dtype="f64", native_conditioning=native_cond)
        c = b.register(nctrl)
        r = b.register(k)
        c = b.h(c)
        r = b.h(r)
        r = b.t(r)
        cb = b.condition_with(c)
        if use_dense:
            r = cb.apply_vec_matrix(r, D.reshape(-1))
        else:
            r = cb.apply_reflection(r)
        c = cb.dissolve()
        s = np.asarray(b.calculate_state_with_init([])[0])
        stride = s.size // 2 ** (k + nctrl)  # temp qubits end in |0>
        return s[::stride] if stride > 1 else s

    for native_cond in (True, False):
        np.testing.assert_allclose(
            run(False, native_cond), run(True, native_cond), atol=1e-12
        )


def test_reflection_inversion_and_subcircuit():
    (inv,) = invert_circuit_object(CircuitObject(3, ReflectionGate(3)))
    assert isinstance(inv.obj, ReflectionGate) and inv.obj.n == 3
    (cinv,) = invert_circuit_object(
        CircuitObject(4, ControlledMatGate(1, ReflectionGate(3)))
    )
    assert isinstance(cinv.obj.mat, ReflectionGate)

    sub = LocalBuilder(dtype="f64")
    rr = sub.register(4)
    rr = sub.apply_reflection(rr)
    sc = sub.make_subcircuit()

    b = LocalBuilder(dtype="f64")
    r = b.register(4)
    r = b.h(r)
    r = b.t(r)
    r = b.apply_subcircuit(sc, r)
    r = b.apply_inverted_subcircuit(sc, r)  # D then D^-1 = identity
    s = np.asarray(b.calculate_state_with_init([])[0])

    b2 = LocalBuilder(dtype="f64")
    r2 = b2.register(4)
    r2 = b2.h(r2)
    r2 = b2.t(r2)
    s2 = np.asarray(b2.calculate_state_with_init([])[0])
    np.testing.assert_allclose(s, s2, atol=1e-12)


def test_reflection_serialize_roundtrip():
    from rustqip_tpu.utils.serialize import builder_from_json, circuit_to_json

    b = LocalBuilder(dtype="f64")
    c = b.qubit()
    r = b.register(3)
    c = b.h(c)
    r = b.h(r)
    r = b.apply_reflection(r)
    cb = b.condition_with(c)
    r = cb.apply_reflection(r)
    c = cb.dissolve()
    s1 = np.asarray(b.calculate_state_with_init([])[0])

    b2 = builder_from_json(circuit_to_json(b))
    s2 = np.asarray(b2.calculate_state_with_init([])[0])
    np.testing.assert_allclose(s2, s1, atol=1e-12)


def test_reflection_qasm_export_roundtrip():
    from rustqip_tpu.qasm import circuit_from_qasm, to_openqasm

    b = LocalBuilder(dtype="f64")
    r = b.register(3)
    r = b.h(r)
    r = b.t(r)
    r = b.apply_reflection(r)
    text = to_openqasm(b)
    assert "exceeds synthesis cap" not in text
    s1 = np.asarray(b.calculate_state_with_init([])[0])

    imp = circuit_from_qasm(text)
    s2 = np.asarray(imp.builder.calculate_state_with_init([])[0])
    if s2.size > s1.size:  # export-time ancillas end in |0>
        s2 = s2.reshape(s1.size, -1)
        np.testing.assert_allclose(np.abs(s2[:, 1:]), 0.0, atol=1e-9)
        s2 = s2[:, 0]
    # Gate expansion drops the -1 global phase (QASM 2.0 policy): compare
    # up to phase via the largest-amplitude entry.
    j = int(np.argmax(np.abs(s1)))
    phase = s1[j] / s2[j]
    np.testing.assert_allclose(abs(phase), 1.0, atol=1e-9)
    np.testing.assert_allclose(s2 * phase, s1, atol=1e-9)


def test_controlled_reflection_qasm_export_exact():
    from rustqip_tpu.qasm import circuit_from_qasm, to_openqasm

    b = LocalBuilder(dtype="f64")
    c = b.qubit()
    r = b.register(2)
    c = b.h(c)
    r = b.h(r)
    r = b.t(r)
    cb = b.condition_with(c)
    r = cb.apply_reflection(r)
    c = cb.dissolve()
    text = to_openqasm(b)
    assert "exceeds synthesis cap" not in text
    s1 = np.asarray(b.calculate_state_with_init([])[0])

    imp = circuit_from_qasm(text)
    s2 = np.asarray(imp.builder.calculate_state_with_init([])[0])
    if s2.size > s1.size:
        s2 = s2.reshape(s1.size, -1)
        np.testing.assert_allclose(np.abs(s2[:, 1:]), 0.0, atol=1e-9)
        s2 = s2[:, 0]
    # Controlled reflection's RELATIVE phase is observable; the dense
    # synthesis path keeps it (up to one overall phase for the circuit).
    j = int(np.argmax(np.abs(s1)))
    phase = s1[j] / s2[j]
    np.testing.assert_allclose(s2 * phase, s1, atol=1e-9)


def test_reflection_planner_and_fusion_keep_it_standalone():
    from rustqip_tpu.engine.fusion import fuse_ops
    from rustqip_tpu.engine.real_apply import plan_sweeps
    from rustqip_tpu.ops import gates

    n = 9
    ops = [
        make_matrix_op([0], gates.H.reshape(-1)),
        make_matrix_op([8], gates.H.reshape(-1)),
        make_reflection_op(range(n)),
        make_matrix_op([4], gates.T.reshape(-1)),
    ]
    fused = fuse_ops(ops)
    assert any(isinstance(op, ReflectionOp) for op in fused)
    for kernel_ok in (False, True):
        plan = plan_sweeps(n, fused, kernel_ok)
        kinds = [kind for kind, _, _ in plan]
        assert "op" in kinds  # the reflection runs as its own sweep
    # relabel interplay: swaps before the reflection remap its indices
    b = LocalBuilder(dtype="f64")
    ra, rb = b.register(2), b.register(2)
    ra, rb = b.swap(ra, rb)
    res = b.split_register_relative(b.merge_two_registers(ra, rb), [0, 3])
    rs, rest = res.selected, res.remaining
    rs = b.apply_reflection(rs)
    b.merge_two_registers(rs, rest)
    s1 = np.asarray(b.calculate_state_with_init([(ra, 1), (rb, 2)])[0])

    D = _dense_reflection(2)
    b2 = LocalBuilder(dtype="f64")
    ra2, rb2 = b2.register(2), b2.register(2)
    ra2, rb2 = b2.swap(ra2, rb2)
    res2 = b2.split_register_relative(b2.merge_two_registers(ra2, rb2), [0, 3])
    rs2, rest2 = res2.selected, res2.remaining
    rs2 = b2.apply_vec_matrix(rs2, D.reshape(-1))
    b2.merge_two_registers(rs2, rest2)
    s2 = np.asarray(b2.calculate_state_with_init([(ra2, 1), (rb2, 2)])[0])
    np.testing.assert_allclose(s1, s2, atol=1e-12)


def test_reflection_sharded_both_executors():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.parallel import make_shard_mesh, sharded_calculate_state
    from rustqip_tpu.parallel.explicit import compile_sharded_explicit
    from rustqip_tpu.parallel.shard_ops import _lower_schedule

    n = 10
    # Lowering: global-touching reflections take the psum entry, local
    # ones stay in the shard-local run.
    sched = _lower_schedule(n, 3, [make_reflection_op(range(n))])
    assert [e[0] for e in sched] == ["reflect"]
    sched = _lower_schedule(
        n, 3, [make_control_op([0], make_reflection_op([1, 5, 9]))]
    )
    assert [e[0] for e in sched] == ["reflect"]
    sched = _lower_schedule(n, 3, [make_reflection_op([4, 5, 6])])
    assert [e[0] for e in sched] == ["local"]

    def build(b, sub=None, ctrl=False):
        r = b.register(n)
        r = b.h(r)
        r = b.t(r)
        if ctrl:
            res = b.split_register_relative(r, [0])
            c, rest = res.selected, res.remaining
            cb = b.condition_with(c)
            rest = cb.apply_reflection(rest)
            c = cb.dissolve()
            b.merge_two_registers(c, rest)
        elif sub is None:
            b.apply_reflection(r)
        else:
            res = b.split_register_relative(r, sub)
            rs, rest = res.selected, res.remaining
            rs = b.apply_reflection(rs)
            b.merge_two_registers(rs, rest)

    cases = [
        {},                          # full register (full psum)
        {"sub": [1, 4, 7]},          # globals a strict subset (grouped psum)
        {"sub": [0, 1, 8, 9]},       # global-only + lane-only mix
        {"ctrl": True},              # controlled, global target bits
    ]
    mesh = make_shard_mesh(8)
    for kw in cases:
        b1 = LocalBuilder(dtype="f64")
        build(b1, **kw)
        expected = np.asarray(b1.calculate_state(seed=0)[0])

        b2 = LocalBuilder(dtype="f64")
        build(b2, **kw)
        re, im, _ = sharded_calculate_state(
            b2, mesh=mesh, seed=0, strategy="gspmd"
        )
        np.testing.assert_allclose(
            np.asarray(re) + 1j * np.asarray(im), expected, atol=1e-10
        )

        b3 = LocalBuilder(dtype="f64")
        build(b3, **kw)
        entries = [e for item in b3.pipeline for e in _lower_item(item)]
        cc = compile_sharded_explicit(n, entries, np.complex128, mesh)
        re3, im3, _ = cc.run(initial_index=0, key=jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            np.asarray(re3) + 1j * np.asarray(im3), expected, atol=1e-10
        )


def test_grover_native_diffusion_search():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.algos import grover
    from rustqip_tpu.parallel import make_shard_mesh, sharded_calculate_state

    n, marked = 8, 0b10110101
    b1 = LocalBuilder(dtype="f64")
    _, h1 = grover.grover_search(b1, n, marked)
    _, m1 = b1.calculate_state(seed=0)
    p_gate = np.asarray(m1.get_stochastic_measurement(h1))

    b2 = LocalBuilder(dtype="f64")
    _, h2 = grover.grover_search(b2, n, marked, native_diffusion=True)
    _, m2 = b2.calculate_state(seed=0)
    p_native = np.asarray(m2.get_stochastic_measurement(h2))

    # -D vs D per round is a global phase: identical distributions.
    np.testing.assert_allclose(p_native, p_gate, atol=1e-10)
    assert int(np.argmax(p_native)) == marked
    assert p_native[marked] > 0.99

    # and the native loop shards (repeat body -> fori_loop + psum)
    b3 = LocalBuilder(dtype="f64")
    _, h3 = grover.grover_search(b3, n, marked, native_diffusion=True)
    re, im, res = sharded_calculate_state(
        b3, mesh=make_shard_mesh(8), seed=0, strategy="explicit"
    )
    p_shard = np.asarray(res.get_stochastic_measurement(h3))
    np.testing.assert_allclose(p_shard, p_native, atol=1e-10)
