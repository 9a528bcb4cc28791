"""Same-session QFT-28 A/B: current engine vs a pinned git revision.

Relay sessions vary +-15% steady / 2-10x compile (CLAUDE.md), so perf
claims need a SAME-SESSION baseline. This script runs benches/qft_bench.py
twice back-to-back — once from the working tree, once from a read-only
git worktree of a baseline revision — and prints both steadies plus the
ratio. The worktree lives under .worktrees/ (in-repo scratch) and is
removed afterwards.

Usage:
    RUSTQIP_TPU_PALLAS=1 python scripts/qft_ab.py [baseline_rev] [n]
Defaults: baseline_rev = fe691b9 (pre-separable-diag kernel), n = 28.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_bench(tree: str, n: int, timeout: float) -> dict:
    env = dict(os.environ, RUSTQIP_TPU_PALLAS="1")
    # qft_bench inserts its own repo root at sys.path[0]; run the copy
    # inside `tree` so the engine under test comes from that tree.
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "benches", "qft_bench.py"),
         str(n)],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    wall = time.time() - t0
    sys.stderr.write(out.stderr)
    m = re.search(r"steady: ([0-9.]+) s", out.stderr + out.stdout)
    c = re.search(r"compile\+first: ([0-9.]+) s", out.stderr + out.stdout)
    return {
        "steady_s": float(m.group(1)) if m else None,
        "compile_s": float(c.group(1)) if c else None,
        "wall_s": wall,
        "rc": out.returncode,
    }


def main():
    rev = sys.argv[1] if len(sys.argv) > 1 else "fe691b9"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 28
    budget = float(os.environ.get("QFT_AB_TIMEOUT_S", "1800"))
    wt = os.path.join(REPO, ".worktrees", f"ab-{rev}")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", wt, rev],
        check=True,
    )
    try:
        log(f"=== NEW (working tree) n={n}")
        new = run_bench(REPO, n, budget)
        log(f"=== OLD ({rev}) n={n}")
        old = run_bench(wt, n, budget)
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            check=False,
        )
    ratio = (
        old["steady_s"] / new["steady_s"]
        if new["steady_s"] and old["steady_s"]
        else None
    )
    import json

    print(
        json.dumps(
            {"new": new, "old": old, "old_over_new": ratio, "rev": rev,
             "n": n}
        )
    )


if __name__ == "__main__":
    main()
