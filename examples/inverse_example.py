"""The invert example (qip/examples/inverse_example.rs): conditioned NOT
then a stochastic measurement of the Bell pair."""

from rustqip_tpu.dsl import program
from rustqip_tpu.prelude import LocalBuilder


def gamma(cb, ra):
    return cb.not_(ra)


def main():
    b = LocalBuilder()

    ra = b.qubit()
    rb = b.qubit()

    ra = b.h(ra)
    with program(b, ra=ra, rb=rb) as p:
        p.control(p.ra).apply(gamma, p.rb)
    ra, rb = p.results()

    r = b.merge_two_registers(ra, rb)
    r, handle = b.measure_stochastic(r)

    state, measures = b.calculate_state()
    print(state)
    print(measures.get_stochastic_measurement(handle))


if __name__ == "__main__":
    main()
