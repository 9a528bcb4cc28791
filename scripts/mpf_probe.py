"""TPU timing probe: measure_prob_fn device tier at n=28 (cold + warm).

The device tier (ops/measurement_ops.py:_measure_prob_fn_device) streams
a 2^r subspace through one jitted chunked fori_loop. Its docstring
claims "n=28 in well under a second warm"; this records the actual v5e
numbers (VERDICT r4 missing #2). Ref asymptotics:
qip/src/state_ops/measurement_ops.rs:65-112.

Shape: n=28, one measured qubit (outcome of qubit 0 = bit 27), r=27
remaining -> 2^27 indices in 32 fori_loop chunks of 2^22. The oracle is
a nontrivial traceable phase state (equal magnitude, index-dependent
phase), so the reduction can't constant-fold.

Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

N = 18 if "--cpu" in sys.argv else 28
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from rustqip_tpu.ops import measurement_ops as mo


def oracle(i):
    # Equal-magnitude state with an index-dependent phase; uses only
    # int32-safe arithmetic (measurement_ops device-tier contract).
    ang = (i % jnp.int32(4096)).astype(jnp.float32) * (2.0 * 3.14159265 / 4096.0)
    amp = jnp.float32(1.0 / (2.0 ** (N / 2.0)))
    return amp * (jnp.cos(ang) + 1j * jnp.sin(ang))


def main():
    print(f"backend: {jax.default_backend()} n={N}", file=sys.stderr)
    t0 = time.time()
    p0 = mo.measure_prob_fn(N, 0, [0], oracle)
    cold_s = time.time() - t0
    t0 = time.time()
    p1 = mo.measure_prob_fn(N, 1, [0], oracle)
    warm_other = time.time() - t0
    t0 = time.time()
    p2 = mo.measure_prob_fn(N, 0, [0], oracle)
    warm_s = time.time() - t0
    ok = abs(p0 - 0.5) < 1e-3 and abs(p0 + p1 - 1.0) < 1e-3 and abs(p2 - p0) < 1e-6
    print(
        json.dumps(
            {
                "tag": "measure_prob_fn_device_tier",
                "n": N,
                "subspace_log2": N - 1,
                "cold_s": round(cold_s, 2),
                "warm_s": round(warm_s, 4),
                "warm_other_template_s": round(warm_other, 4),
                "p": round(p0, 6),
                "ok": bool(ok),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
