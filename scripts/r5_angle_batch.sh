#!/bin/bash
# Round-5 diag angle-accumulation A/B (QFT-28 seam-window attack),
# same relay session, sequential. Arm A = pre-round-5 masked-multiply
# evaluation (RUSTQIP_TPU_DIAG_MASK_MAX=999 disables the angle path;
# the raised merge cap stays, so A isolates the EVALUATION change).
set -u
cd /root/repo
PY=python
export RUSTQIP_TPU_PALLAS=1

echo "=== angle batch start $(date -u +%H:%M:%S) ===" > /tmp/r5_angle_batch.log

step() {
  local tag="$1"; shift
  echo "--- $tag start $(date -u +%H:%M:%S)" >> /tmp/r5_angle_batch.log
  "$@" > "/tmp/r5_${tag}.log" 2>&1
  echo "--- $tag rc=$? end $(date -u +%H:%M:%S)" >> /tmp/r5_angle_batch.log
}

step qft_mask env RUSTQIP_TPU_DIAG_MASK_MAX=999 timeout 2000 $PY benches/qft_bench.py 28
step qft_angle timeout 2000 $PY benches/qft_bench.py 28
step grover_angle timeout 2400 $PY benches/grover_bench.py 28
step qft_profile2 timeout 2400 $PY scripts/qft_sweep_profile.py 28

echo "=== angle batch done $(date -u +%H:%M:%S) ===" >> /tmp/r5_angle_batch.log
