"""Single-chip capacity proof: the FULL ``calculate_state`` entry point —
gate sweeps + sampled measurement collapse + stochastic readback — at the
largest state one chip holds (default n=30: 2 x 4.3 GB f32 planes on a
16 GB v5e, in-place kernel sweeps engage via ``_inplace_policy``).

The reference's end-to-end path is ``calculate_state_with_init``
(``/root/reference/qip/src/builder.rs:400-519``: gate fold, then
``measure`` = sample -> prob -> collapse, ``measure_probs`` for
stochastic handles). This bench runs the same semantics as ONE jitted
program on the default backend and validates them in-program:

- circuit: H broadcast on all n qubits (mix/seam kernel windows), a
  CNOT(0, n-1) across the row/col seam, ``measure`` on the last 4
  qubits (sample-and-collapse), then ``measure_stochastic`` of the SAME
  qubits — whose 16-entry distribution must be one-hot at the sampled
  outcome if the collapse actually happened (prob[outcome] ~= 1).
- the sampled outcome's probability must be ~= 1/16 (uniform after H).

Nothing state-sized ever crosses the relay: only the measurement
scalars/the 16-entry distribution are fetched.

Usage (RUSTQIP_TPU_PALLAS=1 is REQUIRED on the axon relay host, where
the kernel path defaults off; without it the dense sweeps materialize
fresh outputs and n=30 cannot fit):

    RUSTQIP_TPU_PALLAS=1 python benches/capacity_single_chip.py 30
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from rustqip_tpu.builder.builder import LocalBuilder

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    k = 4

    b = LocalBuilder(dtype="f32")
    r = b.register(n)
    r = b.h(r)  # broadcast: one H per qubit
    rest, q0 = b.split_first_qubit(r)
    rest, qlast = b.split_last_qubit(rest)
    q0, qlast = b.cnot(q0, qlast)  # row/col-seam two-qubit gate
    r = b.merge_registers([q0, rest, qlast])
    res = b.split_register_relative(r, range(n - k))
    head, mreg = res.selected, res.remaining  # mreg = last k qubits
    mreg, h_meas = b.measure(mreg)  # sample + collapse (ordinal 0)
    mreg, h_probs = b.measure_stochastic(mreg)  # post-collapse readback
    b.merge_registers([head, mreg])

    cc = b.compile()
    log(f"n={n}: {cc.num_measurements} measurements, "
        f"{cc.num_sweeps} unitary sweeps, device={jax.devices()[0]}")

    t0 = time.time()
    re, im, results = cc.run(initial_index=0, key=jax.random.PRNGKey(7))
    outcome, prob = results[0]
    outcome = int(outcome)
    prob = float(prob)
    compile_s = time.time() - t0
    probs = [float(p) for p in results[1]]
    log(f"compile+run: {compile_s:.1f} s; outcome={outcome} "
        f"prob={prob:.6f}; post-collapse distribution peak "
        f"{max(probs):.6f} at {probs.index(max(probs))}")

    uniform = 1.0 / (1 << k)
    ok = (
        abs(prob - uniform) < 0.05 * uniform
        and probs.index(max(probs)) == outcome
        and abs(probs[outcome] - 1.0) < 1e-3
        and abs(sum(probs) - 1.0) < 1e-3
    )
    # steady-state timing: rerun the same compiled program. Drop the
    # validation run's planes FIRST — at n=30 two (re, im) states are
    # 17.2 GB and cannot coexist in 16 GB HBM (observed
    # RESOURCE_EXHAUSTED on the rerun fetch, 2026-08-20).
    del re, im
    times = []
    for i in range(3):
        t0 = time.time()
        re2, im2, results = cc.run(
            initial_index=0, key=jax.random.PRNGKey(i)
        )
        float(results[0][1])  # scalar fetch = relay-safe sync
        times.append(time.time() - t0)
        del re2, im2
    times.sort()
    print(json.dumps({
        "n": n,
        "sweeps": cc.num_sweeps,
        "outcome": outcome,
        "outcome_prob": round(prob, 8),
        "post_collapse_peak": round(max(probs), 8),
        "ok": ok,
        "compile_s": round(compile_s, 1),
        "steady_ms": round(times[1] * 1e3, 1),
    }))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
