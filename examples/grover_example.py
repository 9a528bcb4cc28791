"""Grover search over 12 qubits — the benchmark flagship
(BASELINE.json config 2): oracle + diffusion rounds under a device-side
loop, stochastic readout of the marked element."""

import numpy as np

from rustqip_tpu.algos import grover_search
from rustqip_tpu.prelude import LocalBuilder
from rustqip_tpu.utils.observe import circuit_stats


def main():
    n, marked = 12, 0b101101011001
    b = LocalBuilder(dtype="f32")
    _, handle = grover_search(b, n, marked)
    print(circuit_stats(b))
    _, measured = b.calculate_state(seed=0)
    probs = measured.get_stochastic_measurement(handle)
    found = int(np.argmax(probs))
    print(f"marked={marked:#014b} found={found:#014b} p={probs[found]:.4f}")


if __name__ == "__main__":
    main()
