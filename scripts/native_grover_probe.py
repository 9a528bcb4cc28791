"""Same-session TPU A/B: gate-built vs native-reflection Grover iteration.

The round-5 ROADMAP names Grover-28's residual as sweep-count-bound
("needs a sweep-count reduction, not cheaper sweeps"); the native
``ReflectionOp`` is that reduction — diffusion drops from ~15 window
sweeps (H-broadcast x2 + phase flip about zero) to one reduction + one
elementwise pass. This probe:

1. parity at n=20: full-state native vs gate iteration on the TPU,
   compared up to the known -1 global phase (the gate core is -D);
2. n=28 A/B: one grover_iteration, gate arm vs native arm, same session,
   3 steady-state trials each (the bench.py harness shape: jit +
   donate_argnums, scalar fetch at every timing boundary).

Usage: RUSTQIP_TPU_PALLAS=1 python scripts/native_grover_probe.py
Reference shape: /root/reference/qip/benches/state_bench.rs:142-155
(big-state gates) and examples/grovers.rs (the gate-built search).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benches"
    ),
)

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def lower(n, native):
    from ab_harness import lower_circuit

    from rustqip_tpu.algos.grover import grover_iteration
    from rustqip_tpu.builder.builder import LocalBuilder

    b = LocalBuilder()
    grover_iteration(b, b.register(n), (1 << n) - 3, native_diffusion=native)
    _, raw, qops, plan, _ = lower_circuit(b.compile())
    nk = sum(1 for k, _, _ in plan if k == "kwindow")
    log(
        f"grover-{n} {'native' if native else 'gate'}: {len(raw)} raw ops"
        f" -> {len(plan)} sweeps ({nk} kernel)"
    )
    return qops


def time_arm(n, native, trials=3):
    qops = lower(n, native)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(re, im):
        from rustqip_tpu.engine.real_apply import apply_ops_ri

        return apply_ops_ri(n, qops, re, im)

    dim = 1 << n
    re = jnp.zeros(dim, jnp.float32).at[0].set(1.0)
    im = jnp.zeros(dim, jnp.float32)
    t0 = time.time()
    re, im = step(re, im)
    float(re[0])
    log(f"  compile+first: {time.time() - t0:.1f}s")
    times = []
    for _ in range(trials):
        t0 = time.time()
        re, im = step(re, im)
        float(re[0])
        times.append(time.time() - t0)
    times.sort()
    log(f"  steady: {times[len(times) // 2] * 1e3:.1f} ms median ({times})")
    return times[len(times) // 2]


def parity(n=20):
    gate_ops = lower(n, False)
    native_ops = lower(n, True)

    dim = 1 << n
    # start from a non-trivial superposition: H everywhere via the ops
    # themselves is part of the iteration; use a ramp state instead.
    v = np.arange(dim, dtype=np.float32)
    v = v / np.linalg.norm(v)

    @functools.partial(jax.jit, static_argnums=(2,))
    def arm(re, im, gate):
        from rustqip_tpu.engine.real_apply import apply_ops_ri

        if gate:
            return apply_ops_ri(n, gate_ops, re, im)
        return apply_ops_ri(n, native_ops, re, im)

    rg, ig = arm(jnp.asarray(v), jnp.zeros(dim, jnp.float32), True)
    rn, inn = arm(jnp.asarray(v), jnp.zeros(dim, jnp.float32), False)
    # gate core is -D: compare native vs -gate.
    d = max(
        float(jnp.max(jnp.abs(rn + rg))),
        float(jnp.max(jnp.abs(inn + ig))),
    )
    log(f"parity n={n}: max |native - (-gate)| = {d:.3e}")
    return d


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} backend={jax.default_backend()}")
    d = parity(20)
    ok = d < 5e-6
    gate_ms = time_arm(28, False) * 1e3
    native_ms = time_arm(28, True) * 1e3
    print(
        {
            "parity20": d,
            "parity_ok": ok,
            "grover28_gate_iter_ms": round(gate_ms, 2),
            "grover28_native_iter_ms": round(native_ms, 2),
            "speedup": round(gate_ms / native_ms, 2),
        }
    )


if __name__ == "__main__":
    main()
