"""On-TPU f64 validation (BASELINE.md row 3, VERDICT r3 missing #1).

The reference's whole correctness story is f64 (`qip/src/types.rs:6-13`;
every example builds an f64 `LocalBuilder`). The test suite validates the
f64/complex128 path on the forced-CPU x64 backend only; this script runs
the SAME circuits at ``dtype='f64'`` on the real TPU (float64 planes end
to end inside the compiled program — this chip's XLA emulates f64 at
~1e-15 matmul accuracy) and asserts 1e-10 amplitude agreement against the
CPU x64 leg, the strongest cross-backend check this environment allows:

  1. the README CSWAP example (qip/src/lib.rs:26-66, examples/simple.rs),
     including the forced-measurement outcome under a fixed PRNG key;
  2. QFT-12 on a nontrivial basis init, also pinned against the analytic
     DFT column;
  3. an `add` truth-table slice (arithmetic.rs:342+ semantics): four
     (a, b) pairs through ONE compiled circuit, classical outputs exact
     and amplitude mass 1.0 at 1e-10.

Usage:  python scripts/tpu_f64_validate.py          # TPU leg + CPU leg
        python scripts/tpu_f64_validate.py cpu FILE # CPU reference leg
"""

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_circuits():
    """Build and run the three validation circuits at dtype='f64'.

    Returns a dict of numpy arrays / scalars (backend-agnostic)."""
    from rustqip_tpu.algos import add, qfft
    from rustqip_tpu.prelude import LocalBuilder

    out = {}

    # 1. CSWAP (the reference README circuit).
    b = LocalBuilder(dtype="f64")
    q = b.qubit()
    ra = b.register(3)
    rb = b.register(3)
    q = b.h(q)
    cb = b.condition_with(q)
    ra, rb = cb.swap(ra, rb)
    q = cb.dissolve()
    q = b.h(q)
    q, m = b.measure(q)
    t0 = time.time()
    state, measured = b.calculate_state_with_init(
        [(ra, 0b000), (rb, 0b001)], key=jax.random.PRNGKey(3)
    )
    res, prob = measured.get_measurement(m)
    out["cswap_state"] = np.asarray(state)
    out["cswap_m"] = np.array([res, prob], dtype=np.float64)
    log(f"  cswap: {time.time() - t0:.1f}s, measured ({res}, {prob:.12f})")

    # 2. QFT-12 on |x=0b101001110101>.
    b = LocalBuilder(dtype="f64")
    r = b.register(12)
    r = qfft(b, r)
    x = 0b101001110101
    # Init values are little-endian across the register's qubit list
    # (CLAUDE.md conventions), so the occupied basis STATE INDEX is the
    # bit-reversal of x over 12 qubits — record it for the analytic DFT
    # column check (the state vector is indexed by state index).
    idx = b.initial_index([(r, x)])
    t0 = time.time()
    state, _ = b.calculate_state_with_init([(r, x)])
    out["qft12_state"] = np.asarray(state)
    out["qft12_x"] = np.array([idx])
    log(f"  qft12: {time.time() - t0:.1f}s")

    # 3. add truth-table slice: rc(3 carries), ra(3), rb(4) = 10 qubits,
    # |a, b> -> |a, a+b> (ref arithmetic.rs add semantics).
    b = LocalBuilder(dtype="f64")
    rc = b.register(3)
    ra = b.register(3)
    rb = b.register(4)
    rc, ra, rb = add(b, rc, ra, rb)
    cc = b.compile()
    pairs = [(1, 2), (3, 5), (7, 8), (6, 6)]
    outs = []
    t0 = time.time()

    def decode(idx, reg):
        # little-endian across the register's qubit list (CLAUDE.md
        # conventions; TruthTable.decode in tests/test_algos.py)
        v = 0
        for j, q in enumerate(reg.indices):
            v |= ((int(idx) >> (b.n - 1 - q)) & 1) << j
        return v

    for a, v in pairs:
        idx = b.initial_index([(ra, a), (rb, v)])
        re, im, _ = cc.run(initial_index=idx, key=jax.random.PRNGKey(0))
        amps = np.asarray(re) + 1j * np.asarray(im)
        top = int(np.argmax(np.abs(amps)))
        got = decode(top, rb)
        assert got == a + v, f"add({a},{v}) -> {got} (classical semantics)"
        assert decode(top, ra) == a and decode(top, rc) == 0
        outs.append((top, amps[top].real, amps[top].imag))
    out["add_outs"] = np.asarray(outs, dtype=np.float64)
    log(f"  add x{len(pairs)}: {time.time() - t0:.1f}s (a+b exact)")
    return out


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "cpu":
        jax.config.update("jax_platforms", "cpu")
        log(f"cpu leg: backend={jax.default_backend()}")
        np.savez(sys.argv[2], **run_circuits())
        return

    assert jax.default_backend() == "tpu", (
        "TPU leg needs the real TPU backend"
    )
    log("tpu leg: running f64 circuits on the real chip")
    tpu = run_circuits()

    ref_file = "/tmp/f64_cpu_ref.npz"
    log("cpu leg: subprocess (forced-CPU x64 reference)")
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "cpu", ref_file],
        check=True,
    )
    cpu = np.load(ref_file)

    report = {"dtype": "f64", "backend": "tpu", "atol": 1e-10}

    # CSWAP: amplitudes AND forced-measurement agreement.
    d = np.abs(tpu["cswap_state"] - cpu["cswap_state"]).max()
    report["cswap_max_amp_diff"] = float(d)
    assert d < 1e-10, f"CSWAP f64 mismatch: {d}"
    assert tpu["cswap_m"][0] == cpu["cswap_m"][0], "measurement outcome"
    dm = abs(tpu["cswap_m"][1] - cpu["cswap_m"][1])
    report["cswap_prob_diff"] = float(dm)
    assert dm < 1e-10, f"CSWAP measured prob mismatch: {dm}"

    # QFT-12: vs CPU leg and vs the analytic DFT column.
    d = np.abs(tpu["qft12_state"] - cpu["qft12_state"]).max()
    report["qft12_max_amp_diff"] = float(d)
    assert d < 1e-10, f"QFT-12 f64 mismatch: {d}"
    N = 1 << 12
    idx = int(tpu["qft12_x"][0])  # initial basis STATE INDEX (see above)
    analytic = np.exp(2j * np.pi * idx * np.arange(N) / N) / np.sqrt(N)
    da = np.abs(tpu["qft12_state"] - analytic).max()
    report["qft12_vs_analytic"] = float(da)
    assert da < 1e-10, f"QFT-12 vs DFT column: {da}"

    # add: identical top states, unit mass, matching amplitudes.
    assert np.array_equal(
        tpu["add_outs"][:, 0], cpu["add_outs"][:, 0]
    ), "add truth-table outputs differ"
    amp_t = tpu["add_outs"][:, 1] + 1j * tpu["add_outs"][:, 2]
    amp_c = cpu["add_outs"][:, 1] + 1j * cpu["add_outs"][:, 2]
    d = np.abs(amp_t - amp_c).max()
    dm = np.abs(np.abs(amp_t) - 1.0).max()
    report["add_max_amp_diff"] = float(d)
    report["add_mass_defect"] = float(dm)
    assert d < 1e-10 and dm < 1e-10, f"add f64 mismatch: {d} / {dm}"

    report["ok"] = True
    print(json.dumps(report))


if __name__ == "__main__":
    main()
