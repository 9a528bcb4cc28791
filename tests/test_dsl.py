"""DSL tests: program() lines, control/control(mask), @invertible —
mirroring the reference macro examples (qip/src/lib.rs:67-234,
qip/examples/*.rs)."""

import numpy as np
import pytest

from rustqip_tpu.dsl import invertible, ops, program
from rustqip_tpu.prelude import CircuitError, LocalBuilder, make_circuit_matrix


def gamma(b, ra, rb):
    """The reference's README gamma: toffoli(ra->rb); toffoli(rb->ra)."""
    ra, rb = b.toffoli(ra, rb)
    rb, ra = b.toffoli(rb, ra)
    return ra, rb


def unitary_of(build):
    b = LocalBuilder()
    r = build(b)
    return make_circuit_matrix(b, r)


def test_program_selectors_match_manual():
    # program-built circuit == manually built circuit
    def with_program(b):
        ra = b.register(3)
        rb = b.register(3)
        with program(b, ra=ra, rb=rb) as p:
            p.apply(gamma, p.ra[0:2], p.ra[2])
            p.apply(gamma, (p.ra[0], p.rb[0]), p.ra[2])
            p.apply(gamma, p.ra[0], (p.rb[0], p.ra[2]))
        ra, rb = p.results()
        return b.merge_two_registers(ra, rb)

    def manual(b):
        ra = b.register(3)
        rb = b.register(3)
        ras = b.split_all_register(ra)
        rbs = b.split_all_register(rb)
        # gamma ra[0..2], ra[2]
        g1 = b.merge_registers([ras[0], ras[1]])
        g1, t1 = gamma(b, g1, ras[2])
        ras[0], ras[1] = b.split_all_register(g1)
        ras[2] = t1
        # gamma [ra[0], rb[0]], ra[2]
        g2 = b.merge_registers([ras[0], rbs[0]])
        g2, t2 = gamma(b, g2, ras[2])
        ras[0], rbs[0] = b.split_all_register(g2)
        ras[2] = t2
        # gamma ra[0], [rb[0], ra[2]]
        g3 = b.merge_registers([rbs[0], ras[2]])
        ras[0], g3 = gamma(b, ras[0], g3)
        rbs[0], ras[2] = b.split_all_register(g3)
        ra = b.merge_registers(ras)
        rb = b.merge_registers(rbs)
        return b.merge_two_registers(ra, rb)

    np.testing.assert_allclose(
        unitary_of(with_program), unitary_of(manual), atol=1e-10
    )


def test_program_control_all_ones():
    # `control gamma rb, ra[0..2], ra[2]` == gamma conditioned on rb=|111>
    def build(b):
        ra = b.register(2)
        rb = b.register(2)
        with program(b, ra=ra, rb=rb) as p:
            p.control(p.rb).apply(ops.x, p.ra[0])
        ra, rb = p.results()
        return b.merge_two_registers(rb, ra)

    full = unitary_of(build)
    # register order (rb, ra): X on ra[0] iff rb=11
    expected = np.eye(16)
    for s in range(16):
        if (s >> 2) == 0b11:
            expected[s, s] = 0
            expected[s, s ^ 0b10] = 1
    np.testing.assert_allclose(full, expected, atol=1e-10)


def test_program_control_mask():
    # control(0b01): rb[0]==1, rb[1]==0 triggers (mask bit i = rb[i])
    def build(b):
        ra = b.register(1)
        rb = b.register(2)
        with program(b, ra=ra, rb=rb) as p:
            p.control(p.rb, mask=0b01).apply(ops.x, p.ra)
        ra, rb = p.results()
        return b.merge_two_registers(rb, ra)

    full = unitary_of(build)
    expected = np.eye(8)
    for s in range(8):
        rb0 = (s >> 2) & 1
        rb1 = (s >> 1) & 1
        if rb0 == 1 and rb1 == 0:
            expected[s, s] = 0
            expected[s, s ^ 1] = 1
    np.testing.assert_allclose(full, expected, atol=1e-10)


def test_program_nonregister_args():
    def maybe_x(b, do_it, r):
        return b.x(r) if do_it else r

    def build(flag):
        def _b(b):
            r = b.register(1)
            with program(b, r=r) as p:
                p.apply(maybe_x, flag, p.r)
            (r,) = p.results()
            return r

        return _b

    np.testing.assert_allclose(
        unitary_of(build(True)), np.array([[0, 1], [1, 0]]), atol=1e-12
    )
    np.testing.assert_allclose(unitary_of(build(False)), np.eye(2), atol=1e-12)


def test_program_arg_order_enforced():
    b = LocalBuilder()
    r = b.register(1)
    with pytest.raises(CircuitError, match="precede"):
        with program(b, r=r) as p:
            p.apply(lambda bb, rr, flag: rr, p.r, True)


def test_program_duplicate_qubit_rejected():
    b = LocalBuilder()
    r = b.register(2)
    with pytest.raises(CircuitError, match="twice"):
        with program(b, r=r) as p:
            p.apply(gamma, p.r[0], p.r[0])


def test_invertible_roundtrip():
    @invertible
    def gamma_inv_test(b, ra, rb):
        return gamma(b, ra, rb)

    def build(b):
        ra = b.register(2)
        rb = b.register(1)
        with program(b, ra=ra, rb=rb) as p:
            p.apply(gamma_inv_test, p.ra, p.rb)
            p.apply(gamma_inv_test.inv, p.ra, p.rb)
        ra, rb = p.results()
        return b.merge_two_registers(ra, rb)

    np.testing.assert_allclose(unitary_of(build), np.eye(8), atol=1e-10)


def test_invertible_with_args():
    # ref README: #[invert(gamma_inv, skip)] with a bool arg
    @invertible
    def gamma_skip(b, skip, ra, rb):
        ra, rb = b.toffoli(ra, rb)
        if skip:
            rb, ra = b.toffoli(rb, ra)
        return ra, rb

    for flag in (True, False):

        def build(b):
            ra = b.register(2)
            rb = b.register(1)
            with program(b, ra=ra, rb=rb) as p:
                p.apply(gamma_skip, flag, p.ra, p.rb)
                p.apply(gamma_skip.inv, flag, p.ra, p.rb)
            ra, rb = p.results()
            return b.merge_two_registers(ra, rb)

        np.testing.assert_allclose(unitary_of(build), np.eye(8), atol=1e-10)


def test_invertible_custom_name():
    @invertible(name="ungamma")
    def named(b, r):
        return b.t(r)

    assert named.inv.__name__ == "ungamma"
    # t then inverse == identity
    def build(b):
        r = b.register(1)
        r = named(b, r)
        r = named.inv(b, r)
        return r

    np.testing.assert_allclose(unitary_of(build), np.eye(2), atol=1e-12)


def test_inverse_example_end_to_end():
    # ref qip/examples/inverse_example.rs: h; control gamma(not) -> stochastic
    def gam(b, ra):
        return b.not_(ra)

    b = LocalBuilder()
    ra = b.qubit()
    rb = b.qubit()
    ra = b.h(ra)
    with program(b, ra=ra, rb=rb) as p:
        p.control(p.ra).apply(gam, p.rb)
    ra, rb = p.results()
    r = b.merge_two_registers(ra, rb)
    r, handle = b.measure_stochastic(r)
    state, measures = b.calculate_state(seed=0)
    probs = measures.get_stochastic_measurement(handle)
    # Bell state: outcomes 00 and 11 (bit i = qubit indices[i]) equally likely
    np.testing.assert_allclose(probs, [0.5, 0, 0, 0.5], atol=1e-10)
