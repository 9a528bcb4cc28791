"""TPU A/B probe: step-merge headline + window block-row sizing.

Runs, in one session (each arm a bounded subprocess so a hung relay
costs only its own timeout):

1. the production kernel parity gate (scripts/kernel_parity.py) — the
   step-merge pass (engine/real_apply.merge_window_steps) must not
   perturb the Mosaic path;
2. bench_device_pair with merge ON (default) — the new fused headline
   (the alternating arm now plans to ONE 2-step sweep, so this measures
   sweep latency, i.e. the pipeline's pure-bandwidth limit);
3. same with RUSTQIP_TPU_BLOCK_ROWS=1024 then 2048 — larger DMA blocks
   per grid step (VMEM allows 33/67 MB pipeline buffers at h<=2).

Raw output to stderr; one JSON line per arm to stdout.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(tag, cmd, env_extra, timeout):
    env = dict(os.environ, RUSTQIP_TPU_PALLAS="1", **env_extra)
    t0 = time.time()
    try:
        out = subprocess.run(
            cmd, env=env, capture_output=True, timeout=timeout, text=True,
            cwd=REPO,
        )
        sys.stderr.write(out.stderr[-4000:])
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        rec = {"tag": tag, "rc": out.returncode, "wall_s": round(time.time() - t0, 1)}
        try:
            rec["result"] = json.loads(line)
        except Exception:
            rec["raw_tail"] = line[-300:]
        print(json.dumps(rec), flush=True)
        return rec
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            sys.stderr.write(
                (e.stderr.decode() if isinstance(e.stderr, bytes) else e.stderr)[-2000:]
            )
        print(json.dumps({"tag": tag, "rc": "timeout", "timeout_s": timeout}), flush=True)
        return None


def main():
    py = sys.executable
    # 1. parity gate (production Mosaic path, post-merge)
    run(
        "kernel_parity",
        [py, os.path.join(REPO, "scripts", "kernel_parity.py")],
        {},
        900,
    )
    # 2-4. bench pair arms
    for tag, env in (
        ("bench_merge_br512", {}),
        ("bench_merge_br1024", {"RUSTQIP_TPU_BLOCK_ROWS": "1024"}),
        ("bench_merge_br2048", {"RUSTQIP_TPU_BLOCK_ROWS": "2048"}),
    ):
        run(
            tag,
            [py, os.path.join(REPO, "bench.py"), "--device-json", "28"],
            env,
            1100,
        )


if __name__ == "__main__":
    main()
