"""GSPMD executor vs hand-scheduled shard_map path on an 8-virtual-device
CPU mesh (multi-chip stand-in; the schedule and collectives are identical
to what runs on a real pod, only link speeds differ).

Usage: python benches/shard_bench.py  (forces the CPU platform itself)
"""

import json
import os
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_ops(n):
    """Global-qubit-heavy layer mix: the collective-bound regime."""
    from rustqip_tpu.ops import gates
    from rustqip_tpu.ops.matrix_ops import (
        PhaseProductOp,
        make_control_op,
        make_matrix_op,
    )

    ops = []
    for layer in range(4):
        for q in range(3):  # global qubits on an 8-device mesh
            ops.append(make_matrix_op([q], gates.H.reshape(-1)))
        for q in range(3, n):
            ops.append(make_matrix_op([q], gates.T.reshape(-1)))
        ops.append(
            make_control_op([0], make_matrix_op([n - 1], gates.X.reshape(-1)))
        )
        ops.append(
            PhaseProductOp(
                tuple(
                    ((q, n - 1), (1, 1, 1, np.exp(1j * 0.1 * (q + 1))))
                    for q in range(3)
                )
            )
        )
    return ops


def main():
    from rustqip_tpu.engine.compile import UnitaryEntry, compile_pipeline
    from rustqip_tpu.parallel import make_shard_mesh
    from rustqip_tpu.parallel.shard_ops import (
        apply_sharded_ops,
        make_sharded_pair,
    )
    from rustqip_tpu.parallel.sharded import compile_sharded

    n = 22
    ops = build_ops(n)
    mesh = make_shard_mesh(8)
    log(f"devices: {len(jax.devices())}, n={n}, ops={len(ops)}")

    # --- explicit shard_map schedule -------------------------------------
    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def explicit_step(re, im):
        return apply_sharded_ops(mesh, n, ops, re, im)

    re, im = make_sharded_pair(mesh, n)
    t0 = time.time()
    re, im = explicit_step(re, im)
    jax.block_until_ready(re)
    log(f"explicit compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    steps = 6
    for _ in range(steps):
        re, im = explicit_step(re, im)
    jax.block_until_ready(re)
    explicit_s = (time.time() - t0) / steps

    # --- GSPMD executor ----------------------------------------------------
    entries = [UnitaryEntry(op) for op in ops]
    cc = compile_sharded(n, entries, np.complex64, mesh, fuse=False)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    out = cc.run(initial_index=0, key=key)
    jax.block_until_ready(out[0])
    log(f"gspmd compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(steps):
        out = cc.run(initial_index=0, key=key)
    jax.block_until_ready(out[0])
    gspmd_s = (time.time() - t0) / steps

    print(json.dumps({
        "n": n,
        "ops": len(ops),
        "explicit_s_per_step": round(explicit_s, 4),
        "gspmd_s_per_step": round(gspmd_s, 4),
        "explicit_vs_gspmd": round(gspmd_s / explicit_s, 2),
    }))


if __name__ == "__main__":
    main()
