"""@invertible example (qip/examples/inverse_example pattern with
#[invert]): gamma then gamma.inv is the identity."""

import numpy as np

from rustqip_tpu.dsl import invertible, program
from rustqip_tpu.prelude import LocalBuilder


@invertible
def gamma(b, ra, rb):
    ra, rb = b.toffoli(ra, rb)
    rb, ra = b.toffoli(rb, ra)
    return ra, rb


def main():
    b = LocalBuilder()
    ra = b.register(3)
    rb = b.register(3)

    with program(b, ra=ra, rb=rb) as p:
        p.apply(gamma, p.ra[0:2], p.ra[2])
        p.apply(gamma.inv, p.ra[0:2], p.ra[2])
    ra, rb = p.results()

    state, _ = b.calculate_state_with_init([(ra, 0b101), (rb, 0b010)])
    nonzero = int(np.argmax(np.abs(state)))
    print("f . f^-1 == identity; amplitude stayed on the init state:", nonzero)


if __name__ == "__main__":
    main()
