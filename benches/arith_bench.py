"""Arithmetic-adder end-to-end wall-clock on the default backend.

The reference's arithmetic macros (qip/src/macros/program/arithmetic.rs:
add/add_op) compile to CCX/CNOT carry chains — the op shape the round-3
controlled-butterfly kernel path targets. This bench builds `add` on a
k-bit + (k+1)-bit register pair (n = 3k+1 qubits), lowers it through the
SAME pipeline as engine/compile._plan (shared harness:
benches/ab_harness.py), and times steady-state execution.

A/B the round-3 path with the env hatches (RUSTQIP_TPU_PALLAS=1 is
REQUIRED on the axon relay host, where the kernel path defaults off —
without it both arms silently benchmark the same dense plan):

    RUSTQIP_TPU_PALLAS=1 RUSTQIP_TPU_WINDOW_FUSION=0 \
        RUSTQIP_TPU_KEEP_BUTTERFLY=0 \
        python benches/arith_bench.py 9                      # dense
    RUSTQIP_TPU_PALLAS=1 python benches/arith_bench.py 9     # kernel

At k=9 (n=28) with round 3's "cmix" steps (multi-controlled gates with
HIGH row-bit targets become inter-strip controlled butterflies),
window-aware fusion, the scoped-VMEM admission split, and the scalar
butterfly fold, the adder plans to 3 kernel sweeps, zero fallbacks:
measured 98.4 ms kernel vs 338.8 ms dense (3.44x, 2026-08-18 session).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_harness import run_ab

from rustqip_tpu.algos import arithmetic
from rustqip_tpu.builder.builder import LocalBuilder


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    b = LocalBuilder()
    ra = b.register(k)
    rb = b.register(k + 1)
    rc = b.make_zeroed_temp_register(k)
    arithmetic.add(b, rc, ra, rb)
    run_ab(f"add_k{k}", b.compile())


if __name__ == "__main__":
    main()
