"""QFT end-to-end wall-clock on the default backend.

The reference's closest shape is the qfft example circuit
(qip/src/qfft.rs:7-40) scaled to a realistic state size. Builds QFT-n
through the builder stack and lowers/times it via the shared harness
(benches/ab_harness.py — the SAME pipeline as engine/compile._plan:
swap deferral, butterfly keep, window-aware fusion), so its numbers are
like-for-like with arith_bench/grover_bench.

Measured on v5e (RUSTQIP_TPU_PALLAS=1): QFT-28 = 0.239-0.26 s steady —
six HBM sweeps (5 Pallas windows + the ONE-transpose bit reversal) for
406 raw gates; see BENCH_NOTES "QFT-28 roofline" for why this is
VPU-primitive-bound. Round 1: 0.98 s.

Usage: RUSTQIP_TPU_PALLAS=1 python benches/qft_bench.py [n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_harness import run_ab

from rustqip_tpu.algos.qfft import qfft
from rustqip_tpu.builder.builder import LocalBuilder


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    b = LocalBuilder()
    qfft(b, b.register(n))
    run_ab(f"qft", b.compile())


if __name__ == "__main__":
    main()
