#!/bin/bash
# Round-5 owed TPU probe batch (VERDICT r4 items 1, 5, 6) — sequential,
# one relay session, raw output per step to /tmp/r5_*.log.
set -u
cd /root/repo
PY=python
export RUSTQIP_TPU_PALLAS=1

echo "=== batch start $(date -u +%H:%M:%S) ===" > /tmp/r5_batch.log

step() {
  local tag="$1"; shift
  echo "--- $tag start $(date -u +%H:%M:%S)" >> /tmp/r5_batch.log
  "$@" > "/tmp/r5_${tag}.log" 2>&1
  echo "--- $tag rc=$? end $(date -u +%H:%M:%S)" >> /tmp/r5_batch.log
}

# 1. Grover-28 same-session A/B (h3 baseline, then h4 with the fixed
#    50% VMEM headroom at ns>=16)
step grover_h3 timeout 2000 $PY benches/grover_bench.py 28
step grover_h4 env RUSTQIP_TPU_WINDOW_MAXH=4,3,2,1 timeout 2000 $PY benches/grover_bench.py 28

# 2. QFT-28 same-session A/B (re-confirm yesterday's -10.5%)
step qft_h3 timeout 2000 $PY benches/qft_bench.py 28
step qft_h4 env RUSTQIP_TPU_WINDOW_MAXH=4,3,2,1 timeout 2000 $PY benches/qft_bench.py 28

# 3. Field-reversal slab-kernel probe vs XLA transpose
step fieldrev timeout 2400 $PY scripts/field_reversal_probe.py

# 4. gex recombination cost per XOR stage, shard-local shapes
step gex timeout 2400 $PY scripts/gex_cost_probe.py

# 5. measure_prob_fn device tier n=28 cold+warm
step mpf timeout 2000 $PY scripts/mpf_probe.py

echo "=== batch done $(date -u +%H:%M:%S) ===" >> /tmp/r5_batch.log
