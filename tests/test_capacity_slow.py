"""CI-tier virtual-mesh capacity regression (VERDICT r3 #10).

The n=28 both-executors capacity proof (benches/capacity_sharded.py,
2026-08-18: 128 MiB shard planes through explicit AND GSPMD on the
8-virtual-device CPU mesh) was a one-off script result; this keeps an
n=24 version green as a ``slow``-marked test (~2-4 min on the 1-core
host; run with ``-m slow``), with the per-shard Pallas window kernel
asserted ACTIVE on the explicit executor's shard-local sweeps
(interpret mode off-TPU, Mosaic on real chips).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

CAP_N = 24


@pytest.mark.slow
def test_virtual_mesh_capacity_both_executors():
    """n=24 f32 state (two 64 MiB planes, 8 MiB shards) end-to-end through
    BOTH sharded executors on the 8-virtual-device mesh: normalized,
    actually sharded over all 8 devices, and executor-agreeing."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.parallel import make_shard_mesh
    from rustqip_tpu.parallel.sharded import sharded_calculate_state
    from rustqip_tpu.prelude import LocalBuilder

    n = CAP_N
    mesh = make_shard_mesh(8)
    states = {}
    for strategy in ("explicit", "gspmd"):
        b = LocalBuilder(dtype="f32")
        r = b.register(n)
        qs = b.split_all_register(r)
        qs[0] = b.h(qs[0])                      # global (device-index) qubit
        qs[0], qs[-1] = b.cnot(qs[0], qs[-1])   # cross-seam entanglement
        qs[-2] = b.h(qs[-2])                    # shard-local qubit
        b.merge_registers(qs)
        re, im, _ = sharded_calculate_state(
            b, mesh=mesh, seed=0, strategy=strategy
        )
        assert len(re.sharding.device_set) == 8
        norm = float(jnp.sum(re * re + im * im))
        assert abs(norm - 1.0) < 1e-5, f"{strategy}: norm drift {norm}"
        # The state is 4 nonzero amplitudes; fetch and compare sparsely.
        flat_re = np.asarray(re).reshape(-1)
        flat_im = np.asarray(im).reshape(-1)
        nz = np.flatnonzero(np.abs(flat_re) + np.abs(flat_im) > 1e-6)
        states[strategy] = (nz, flat_re[nz], flat_im[nz])
        del re, im, flat_re, flat_im
    np.testing.assert_array_equal(states["explicit"][0], states["gspmd"][0])
    np.testing.assert_allclose(
        states["explicit"][1], states["gspmd"][1], atol=1e-6
    )
    np.testing.assert_allclose(
        states["explicit"][2], states["gspmd"][2], atol=1e-6
    )


@pytest.mark.slow
def test_virtual_mesh_capacity_per_shard_kernel():
    """n=24 explicit shard_map run with the per-shard window kernel ON
    (kernel_ok=True -> interpret mode on CPU): the shard-local plan must
    actually window (non-vacuous) and the result must match the
    single-program engine on the same op list."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.engine.real_apply import apply_op_ri, plan_sweeps
    from rustqip_tpu.ops import gates
    from rustqip_tpu.ops.matrix_ops import make_matrix_op
    from rustqip_tpu.parallel import make_shard_mesh
    from rustqip_tpu.parallel.shard_ops import (
        apply_sharded_ops,
        make_sharded_pair,
    )

    n = CAP_N
    mesh = make_shard_mesh(8)
    g = 3
    # Alternating top-row / lane targets: the canonical one-kernel-sweep
    # window shape (bench.py's fused headline), on shard-local qubits.
    ops = [
        make_matrix_op([g], gates.H.reshape(-1)),
        make_matrix_op([n - 1], gates.H.reshape(-1)),
        make_matrix_op([g], gates.H.reshape(-1)),
        make_matrix_op([n - 1], gates.T.reshape(-1)),
    ]
    local = [
        make_matrix_op([q - g for q in op.indices], op.data) for op in ops
    ]
    kinds = {k for k, _, _ in plan_sweeps(n - g, local, True)}
    assert "kwindow" in kinds, f"local plan did not window: {kinds}"

    re, im = make_sharded_pair(mesh, n, initial_index=1)
    re, im = apply_sharded_ops(mesh, n, ops, re, im, kernel_ok=True)

    er = jnp.zeros(1 << n, jnp.float32).at[1].set(1.0)
    ei = jnp.zeros_like(er)
    for op in ops:
        er, ei = apply_op_ri(n, op, er, ei)
    np.testing.assert_allclose(np.asarray(re), np.asarray(er), atol=1e-5)
    np.testing.assert_allclose(np.asarray(im), np.asarray(ei), atol=1e-5)
