"""Real-TPU validation of the per-shard Pallas window-kernel path.

The explicit sharded executor now routes shard-LOCAL runs through the
window kernel (a per-device ``pallas_call`` inside ``shard_map`` — see
``parallel/shard_ops.apply_sharded_ops(kernel_ok=...)``). CPU tests
cover interpret mode only; this script proves the MOSAIC path compiles
and executes inside shard_map on a real chip, using a 1-device mesh
(the only mesh this host has), and A/Bs it against the XLA fallback.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/shard_kernel_tpu.py
Prints one summary line per check; exits non-zero on mismatch.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rustqip_tpu.engine.real_apply import plan_sweeps  # noqa: E402
from rustqip_tpu.ops import gates  # noqa: E402
from rustqip_tpu.ops.matrix_ops import make_matrix_op  # noqa: E402
from rustqip_tpu.parallel import make_shard_mesh  # noqa: E402
from rustqip_tpu.parallel.shard_ops import (  # noqa: E402
    apply_sharded_ops,
    make_sharded_pair,
)

N = 20
REPS = 30  # alternating window, REPS gates -> one kernel sweep


def fetch(re, im):
    """Force a device sync over the relay (block_until_ready lies)."""
    return float(jnp.asarray(re).reshape(-1)[0]), float(
        jnp.asarray(im).reshape(-1)[1]
    )


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    mesh = make_shard_mesh(1)

    ops = []
    for i in range(REPS):
        q = 0 if i % 2 == 0 else N - 1
        ops.append(make_matrix_op([q], gates.H.reshape(-1)))
    ops.append(make_matrix_op([N - 1], gates.T.reshape(-1)))

    kinds = {k for k, _, _ in plan_sweeps(N, ops, True)}
    print(f"local plan kinds: {sorted(kinds)}", flush=True)
    assert "kwindow" in kinds, kinds

    results = {}
    for label, kok in (("xla", False), ("kernel", True)):
        re, im = make_sharded_pair(mesh, N, initial_index=3)
        t0 = time.time()
        ro, io = apply_sharded_ops(mesh, N, ops, re, im, kernel_ok=kok)
        fetch(ro, io)
        compile_s = time.time() - t0
        # steady-state: rerun the same jitted program
        t0 = time.time()
        for _ in range(3):
            ro2, io2 = apply_sharded_ops(mesh, N, ops, re, im, kernel_ok=kok)
            fetch(ro2, io2)
        steady = (time.time() - t0) / 3
        results[label] = (np.asarray(ro), np.asarray(io))
        print(
            f"{label}: compile+run {compile_s:.1f}s, steady {steady*1e3:.1f}"
            f" ms/apply_sharded_ops({len(ops)} ops)",
            flush=True,
        )

    dr = np.max(np.abs(results["xla"][0] - results["kernel"][0]))
    di = np.max(np.abs(results["xla"][1] - results["kernel"][1]))
    print(f"max|diff| re={dr:.3e} im={di:.3e}", flush=True)
    assert dr < 1e-6 and di < 1e-6, (dr, di)
    print("PER-SHARD KERNEL PATH ON REAL TPU: OK", flush=True)


if __name__ == "__main__":
    main()
