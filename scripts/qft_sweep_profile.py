"""Per-sweep timing of QFT-n under the default (h<=4) window ladder.

VERDICT r4 weak #2: QFT-28 sits ~1.3-1.6x above the measured primitive
roofline (5 sweeps x ~16.5-18.6 ms fresh-pass floor + 37 ms reversal
~= 103-111 ms vs 232.9 ms measured 2026-08-20). This attributes the
residual per sweep via ``observe.profile_passes_fused`` (ONE compiled
program, per-sweep repeat counts as a runtime vector) so the next lever
(mix+CP fold, block shape, step merge) is chosen from data, not guesses.

NOTE: the single program wraps every sweep in a fori_loop — one BIG
Mosaic+XLA compile over the relay (possibly 10-20+ min). Run it once,
bank the table. Ref shape: qip/src/qfft.rs:7-40.

Usage: RUSTQIP_TPU_PALLAS=1 python scripts/qft_sweep_profile.py [n]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

from rustqip_tpu.algos.qfft import qfft
from rustqip_tpu.builder.builder import LocalBuilder
from rustqip_tpu.utils import observe


def main():
    kind = "qft"
    if "--grover" in sys.argv:
        sys.argv.remove("--grover")
        kind = "grover"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    print(f"backend: {jax.default_backend()} {kind} n={n}", file=sys.stderr)
    b = LocalBuilder()
    if kind == "grover":
        from rustqip_tpu.algos.grover import grover_iteration

        grover_iteration(b, b.register(n), (1 << n) - 3)
    else:
        qfft(b, b.register(n))
    t0 = time.time()
    rows = observe.profile_passes_fused(b, extra_reps=7, iters=2)
    total_s = time.time() - t0
    for r in rows:
        print(
            json.dumps(
                {
                    "kind": r.get("kind"),
                    "ops": r.get("ops"),
                    "row_bits": r.get("row_bits"),
                    "steps": r.get("steps"),
                    "kernel": r.get("kernel"),
                    "ms": round(r["ms"], 2),
                    "gbps": None
                    if r.get("below_noise_floor")
                    else round(r["gbps"], 1),
                }
            ),
            flush=True,
        )
    print(
        f"total wall (incl compile): {total_s:.1f} s; "
        f"sum of sweeps: {sum(r['ms'] for r in rows):.1f} ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
