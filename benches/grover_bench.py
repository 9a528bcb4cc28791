"""Grover-iteration end-to-end wall-clock on the default backend.

Grover on n qubits is the second flagship shape (BASELINE.json config 2;
reference ingredients at qip/src/builder_traits.rs:541-568 — the
multi-controlled phase flip the reference decomposes into toffoli
ladders). One `grover_iteration` = oracle phase flip + diffusion: an
H-broadcast + X-broadcast + wide multi-controlled Z — a mix of h=3 mix
windows, butterfly chains, and an rmix seam window, i.e. every kernel
step class except diag. Lowering and timing ride the shared harness
(benches/ab_harness.py) so the arms cannot drift from arith_bench's.

A/B the window-fusion kernel path against the full-dense plan (same
hatch pair as arith_bench; RUSTQIP_TPU_PALLAS=1 is REQUIRED on the axon
relay host, where the kernel path defaults off):

    RUSTQIP_TPU_PALLAS=1 python benches/grover_bench.py 28    # kernel
    RUSTQIP_TPU_PALLAS=1 RUSTQIP_TPU_WINDOW_FUSION=0 \
        RUSTQIP_TPU_KEEP_BUTTERFLY=0 \
        python benches/grover_bench.py 28                     # dense

NOTE on historical numbers: the round-3 "window-aware fusion A/B"
(BENCH_NOTES, 855.8 -> 181.1 ms) used WINDOW_FUSION=0 with
KEEP_BUTTERFLY still ON as its baseline arm (plain greedy fusion but
kernel butterflies live) — NOT the full-dense arm above. Post scalar
fold the kernel arm measures 174.5 ms median/iteration (20 kernel
sweeps, 0 fallbacks, 2026-08-18 session).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from ab_harness import run_ab

from rustqip_tpu.algos.grover import grover_iteration
from rustqip_tpu.builder.builder import LocalBuilder


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    marked = (1 << n) - 3
    b = LocalBuilder()
    r = b.register(n)
    grover_iteration(b, r, marked)
    dim = 1 << n
    run_ab(
        "grover",
        b.compile(),
        trials=5,
        init=jnp.full(dim, 1.0 / (dim**0.5), jnp.float32),
    )


if __name__ == "__main__":
    main()
