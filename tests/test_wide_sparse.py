"""Wide (> DENSE_CAP qubits) sparse / oracle ops via gather passes.

Reference parity: ``SparseMatrixOpIterator`` / ``FunctionOpIterator``
stream nonzero columns for ops of ANY width
(qip-iterators/src/iterators/qubit_iterators.rs:60,223); round 1
materialized dense and rejected >10-qubit supports.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rustqip_tpu.builder.builder import LocalBuilder
from rustqip_tpu.engine.apply import DENSE_CAP, _apply_sparse_wide, apply_op
from rustqip_tpu.engine.real_apply import apply_op_ri
from rustqip_tpu.ops.matrix_ops import (
    make_control_op,
    make_sparse_matrix_from_function,
    make_sparse_matrix_op,
)
from rustqip_tpu.types import Representation


def _dense_expected(n, op, state):
    from rustqip_tpu.ops.matrix_ops import make_op_matrix

    return make_op_matrix(n, op) @ state


def _random_state(n, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    return s / np.linalg.norm(s)


def test_gather_path_matches_dense_small():
    # Cross-check the gather implementation against the dense matmul path
    # on a small op where both run (k=4 spanning rows and cols at n=9).
    n, k = 9, 4
    rng = np.random.default_rng(2)
    m = rng.normal(size=(1 << k, 1 << k)) + 1j * rng.normal(
        size=(1 << k, 1 << k)
    )
    u, _ = np.linalg.qr(m)
    rows = [
        [(c, u[r, c]) for c in range(1 << k) if abs(u[r, c]) > 0]
        for r in range(1 << k)
    ]
    op = make_sparse_matrix_op([0, 3, 7, 8], rows)
    state = _random_state(n)
    got = np.asarray(_apply_sparse_wide(n, op, jnp.asarray(state)))
    want = _dense_expected(n, op, state)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_wide_permutation_oracle_matches_known_map():
    # 12-qubit modular-multiplication permutation |x> -> |3x mod 4097 ...|:
    # wider than DENSE_CAP, expected state computable by pure indexing.
    n = 13
    k = 12
    a, N = 5, 4001

    def f(row):
        # permutation on [0, 2^k): multiply mod N below N, identity above
        x = row
        y = (a * x) % N if x < N else x
        return [(y, 1.0)]

    # column c -> row p(c): build rows from the inverse map
    inv = {}
    for x in range(1 << k):
        y = (a * x) % N if x < N else x
        inv[y] = x
    rows = [[(inv[r], 1.0)] for r in range(1 << k)]
    assert k > DENSE_CAP
    op = make_sparse_matrix_op(list(range(k)), rows)

    state = _random_state(n, seed=3)
    got = np.asarray(apply_op(n, op, jnp.asarray(state)))

    # Expected by direct indexing: qubits 0..k-1 are the TOP index bits at
    # n=13, so sub index = full index >> 1; the last qubit is untouched.
    # out[row] = in[col] with row = f(col): out[f(x)] = in[x].
    full = np.arange(1 << n)
    sub = full >> 1
    low = full & 1
    fx = np.array([(a * x) % N if x < N else x for x in range(1 << k)])
    out_idx = (fx[sub] << 1) | low
    want = np.empty_like(state)
    want[out_idx] = state
    np.testing.assert_allclose(got, want, atol=1e-12)

    # Real-pair path agrees.
    re, im = apply_op_ri(
        n, op, jnp.asarray(state.real), jnp.asarray(state.imag)
    )
    np.testing.assert_allclose(
        np.asarray(re) + 1j * np.asarray(im), want, atol=1e-10
    )


def test_wide_phase_oracle_from_function():
    # Grover-style +-1 phase oracle over 12 qubits via
    # make_sparse_matrix_from_function (FunctionOpIterator analog).
    n = 12
    marked = 0b101101011001

    def f(row):
        return [(row, -1.0 if row == marked else 1.0)]

    rows = make_sparse_matrix_from_function(n, f)
    op = make_sparse_matrix_op(list(range(n)), rows)
    state = _random_state(n, seed=4)
    got = np.asarray(apply_op(n, op, jnp.asarray(state)))
    want = state.copy()
    want[marked] *= -1
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_wide_sparse_multi_entry_rows():
    # Non-permutation wide sparse: 2 entries per row (block-diagonal mix of
    # 2x2 rotations indexed by the remaining bits), k=11 > DENSE_CAP.
    n = 12
    k = 11
    c, s = np.cos(0.3), np.sin(0.3)

    def f(row):
        # pair rows that differ in the LAST sub bit
        base, bit = row >> 1, row & 1
        phase = np.exp(1j * 0.001 * base)
        if bit == 0:
            return [(row, c * phase), (row | 1, -s * phase)]
        return [(row & ~1, s * phase), (row, c * phase)]

    rows = make_sparse_matrix_from_function(k, f)
    op = make_sparse_matrix_op(list(range(k)), rows)
    state = _random_state(n, seed=5)
    got = np.asarray(apply_op(n, op, jnp.asarray(state)))
    # expected via an explicit per-row accumulation on the host
    want = np.zeros_like(state)
    for r in range(1 << k):
        for col, val in rows[r]:
            src = (col << 1) | np.arange(2)
            dst = (r << 1) | np.arange(2)
            want[dst] += val * state[src]
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_controlled_wide_sparse():
    # Control wrapping a wide sparse inner op.
    n = 13
    k = 11
    rows = [[(r ^ 1, 1.0)] for r in range(1 << k)]  # X on last sub qubit
    inner = make_sparse_matrix_op(list(range(2, 2 + k)), rows)
    op = make_control_op([0], inner)
    state = _random_state(n, seed=6)
    got = np.asarray(apply_op(n, op, jnp.asarray(state)))
    # expected: where qubit 0 (top bit) is 1, flip qubit 12 (bit 0 of the
    # sub block = qubit 2+k-1 = 12 -> full bit n-1-12 = 0)
    full = np.arange(1 << n)
    top = (full >> (n - 1)) & 1
    src = np.where(top == 1, full ^ 1, full)
    want = state[src]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_builder_sparse_surface_end_to_end():
    # Builder-level oracle: phase-flip a marked state inside a circuit.
    b = LocalBuilder()
    r = b.register(12)
    r = b.h(r)
    marked = 0x5A3

    def oracle(row):
        return [(row, -1.0 if row == marked else 1.0)]

    r = b.apply_sparse_matrix_from_function(r, oracle)
    state, _ = b.calculate_state()
    amp = 1.0 / np.sqrt(1 << 12)
    # The marked basis state's qubit values are little-endian over the
    # register; builder initial_index conventions apply symmetrically, so
    # just check one amplitude flipped and norms hold.
    flipped = np.isclose(state, -amp, atol=1e-7).sum()
    kept = np.isclose(state, amp, atol=1e-7).sum()
    assert flipped == 1 and kept == (1 << 12) - 1


def test_builder_sparse_inversion_roundtrip():
    b = LocalBuilder()
    r = b.register(11)
    r = b.h(r)
    rng = np.random.default_rng(8)
    perm = rng.permutation(1 << 11)
    phases = np.exp(1j * rng.uniform(-3, 3, 1 << 11))
    rows = [[(int(perm[i]), complex(phases[i]))] for i in range(1 << 11)]
    sc_start = len(b.pipeline)
    r = b.apply_sparse_matrix(r, rows)
    sc = b.pipeline[sc_start:]
    r = b.apply_inverted_subcircuit(sc, r)
    state, _ = b.calculate_state()
    # H^(x)n |0> restored
    amp = 1.0 / np.sqrt(1 << 11)
    np.testing.assert_allclose(state, amp, atol=1e-8)


def test_little_endian_sparse_normalization_wide():
    # LittleEndian input normalizes identically for wide ops.
    k = 11
    rng = np.random.default_rng(10)
    perm = rng.permutation(1 << k)
    rows_le = [[(int(perm[i]), 1.0)] for i in range(1 << k)]
    op_le = make_sparse_matrix_op(
        list(range(k)), rows_le, Representation.LittleEndian
    )
    from rustqip_tpu.utils import flip_bits

    rows_be = [None] * (1 << k)
    for i in range(1 << k):
        rows_be[flip_bits(k, i)] = [(flip_bits(k, int(perm[i])), 1.0)]
    op_be = make_sparse_matrix_op(list(range(k)), rows_be)
    state = _random_state(k + 1, seed=11)
    got = np.asarray(apply_op(k + 1, op_le, jnp.asarray(state)))
    want = np.asarray(apply_op(k + 1, op_be, jnp.asarray(state)))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sparse_width_cap_clear_error():
    """Widths beyond MAX_SPARSE_BITS raise a CircuitError naming the
    env knob (VERDICT r2 item 8: documented, tested cap — the reference
    streams lazily at any width, qubit_iterators.rs:60,223; the TPU
    columnar design embeds 2^k tables as program constants)."""
    from rustqip_tpu.errors import CircuitError
    from rustqip_tpu.ops.matrix_ops import MAX_SPARSE_BITS

    k = MAX_SPARSE_BITS + 1
    with pytest.raises(CircuitError, match="RUSTQIP_TPU_MAX_SPARSE_BITS"):
        make_sparse_matrix_from_function(k, lambda r: [(r, 1.0)])
    with pytest.raises(CircuitError, match="RUSTQIP_TPU_MAX_SPARSE_BITS"):
        # rows list is validated for width before its length
        make_sparse_matrix_op(list(range(k)), [[(0, 1.0)]])


def test_sparse_width_cap_env_override(monkeypatch):
    from rustqip_tpu.errors import CircuitError
    from rustqip_tpu.ops.matrix_ops import MAX_SPARSE_BITS

    monkeypatch.setenv("RUSTQIP_TPU_MAX_SPARSE_BITS", "4")
    with pytest.raises(CircuitError):
        make_sparse_matrix_from_function(5, lambda r: [(r, 1.0)])
    monkeypatch.setenv(
        "RUSTQIP_TPU_MAX_SPARSE_BITS", str(MAX_SPARSE_BITS + 2)
    )
    rows = make_sparse_matrix_from_function(5, lambda r: [(r, 1.0)])
    assert len(rows) == 32


@pytest.mark.slow
def test_k16_oracle_inside_n24_circuit():
    """A 16-qubit permutation oracle inside a 24-qubit circuit — the
    upper-middle of the supported width range on a big state (VERDICT r2
    item 8 'test at k=16 inside an n=24 circuit'). Verified against
    direct index arithmetic. ``slow``: ~10 min solo on the 1-core host
    (the 2^16-entry inverse-map table + x64 gathers over 16M-element
    planes); run with ``-m slow``. The default suite covers k=13 in
    ``test_wide_permutation_oracle_matches_known_map`` and the width-cap
    errors above."""
    n, k = 24, 16
    a, N = 3, 65521  # 3 * x mod 65521 (prime < 2^16), identity above

    inv3 = pow(a, -1, N)

    def f(row):
        return [((a * row) % N if row < N else row, 1.0)]

    rows = [
        [((inv3 * r) % N if r < N else r, 1.0)] for r in range(1 << k)
    ]
    op = make_sparse_matrix_op(list(range(k)), rows)

    state = _random_state(n, seed=9)
    re, im = apply_op_ri(
        n, op, jnp.asarray(state.real), jnp.asarray(state.imag)
    )
    got = np.asarray(re) + 1j * np.asarray(im)

    # qubits 0..15 are the top 16 index bits; low 8 bits untouched
    full = np.arange(1 << n)
    sub = full >> 8
    low = full & 0xFF
    fx = np.array([(a * x) % N if x < N else x for x in range(1 << k)])
    out_idx = (fx[sub] << 8) | low
    want = np.empty_like(state)
    want[out_idx] = state
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_wide_sparse_gex_sharded():
    """VERDICT r3 #7 (sparse half): a sparse op wider than DENSE_CAP whose
    global qubits outnumber the free local slots lowers to the 'gex'
    generalized exchange (per-nnz-slot source routing over XOR-stage
    ppermutes) and matches the single-device gather engine exactly."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from rustqip_tpu.ops import gates
    from rustqip_tpu.ops.matrix_ops import SparseOp, make_matrix_op
    from rustqip_tpu.parallel import make_shard_mesh
    from rustqip_tpu.parallel.shard_ops import (
        _lower_schedule,
        apply_sharded_ops,
        make_sharded_pair,
    )

    n, g = 12, 3
    k = DENSE_CAP + 1  # too wide to densify
    # (permutation + phase on the top k-1 bits) tensor (H on the low bit):
    # a genuinely sparse unitary with 2 nonzeros per row.
    rng = np.random.default_rng(7)
    half = 1 << (k - 1)
    sigma = rng.permutation(half)
    phase = np.exp(1j * rng.uniform(0, 2 * np.pi, half))
    s = 1 / np.sqrt(2)
    rows = []
    for r in range(1 << k):
        x, b = r >> 1, r & 1
        c0 = int(sigma[x]) << 1
        p = complex(phase[x])
        sign = -1.0 if b else 1.0
        rows.append(((c0, p * s), (c0 | 1, sign * p * s)))
    op = SparseOp(tuple(range(k)), tuple(rows))
    # k=11 on n=12 leaves ONE free local slot for three globals.
    sched = _lower_schedule(n, g, [op])
    assert [kind for kind, *_ in sched] == ["gex"]

    mesh = make_shard_mesh(8)
    hs = [make_matrix_op([q], gates.H.reshape(-1)) for q in range(0, n, 2)]
    re, im = make_sharded_pair(mesh, n, initial_index=0, dtype=np.float64)
    re, im = apply_sharded_ops(mesh, n, hs + [op], re, im)
    got = np.asarray(re) + 1j * np.asarray(im)

    v = jnp.zeros(1 << n, jnp.complex128).at[0].set(1.0)
    for o in hs + [op]:
        v = apply_op(n, o, v)
    np.testing.assert_allclose(got, np.asarray(v), atol=1e-12)
    assert abs(np.sum(np.abs(got) ** 2) - 1.0) < 1e-10
