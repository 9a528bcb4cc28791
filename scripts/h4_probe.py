"""TPU A/B probe: h=4 kernel windows (RUSTQIP_TPU_WINDOW_MAXH=4,3,2,1).

Wider windows retire more qubits per HBM sweep — planned sweep counts
(CPU, kernel-aware): QFT-28 6 -> 5, Grover-28 iteration 20 -> 16,
H-broadcast-28 5 -> 4. This probe measures whether the 16-strip Mosaic
bodies actually compile + run at those plans on the v5e, same-session:

1. random-circuit parity (scripts/tpu_circuit_parity.py) with the h4
   ladder — correctness on the real Mosaic path (N=20: qubits 0..3 sit
   above the rbf range, so h=4 windows form);
2. qft_bench 28: default ladder, then 4,3,2,1;
3. grover_bench 28: default ladder, then 4,3,2,1.

Raw output to stderr; one JSON line per arm to stdout.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H4 = {"RUSTQIP_TPU_WINDOW_MAXH": "4,3,2,1"}


def run(tag, cmd, env_extra, timeout):
    env = dict(os.environ, RUSTQIP_TPU_PALLAS="1", **env_extra)
    t0 = time.time()
    try:
        out = subprocess.run(
            cmd, env=env, capture_output=True, timeout=timeout, text=True,
            cwd=REPO,
        )
        sys.stderr.write(out.stderr[-4000:])
        lines = out.stdout.strip().splitlines()
        line = lines[-1] if lines else ""
        rec = {
            "tag": tag,
            "rc": out.returncode,
            "wall_s": round(time.time() - t0, 1),
            "tail": line[-300:],
        }
        print(json.dumps(rec), flush=True)
        return rec
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            sys.stderr.write(
                (e.stderr.decode() if isinstance(e.stderr, bytes) else e.stderr)[-2000:]
            )
        print(
            json.dumps({"tag": tag, "rc": "timeout", "timeout_s": timeout}),
            flush=True,
        )
        return None


def main():
    py = sys.executable
    run(
        "parity_h4_seed1313",
        [py, os.path.join(REPO, "scripts", "tpu_circuit_parity.py"), "1313"],
        H4,
        1500,
    )
    for tag, bench, env in (
        ("qft28_h3", "qft_bench.py", {}),
        ("qft28_h4", "qft_bench.py", H4),
        ("grover28_h3", "grover_bench.py", {}),
        ("grover28_h4", "grover_bench.py", H4),
    ):
        run(
            tag,
            [py, os.path.join(REPO, "benches", bench), "28"],
            env,
            2000,
        )


if __name__ == "__main__":
    main()
