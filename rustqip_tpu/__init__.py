"""rustqip_tpu — a TPU-native quantum state-vector simulation framework.

A ground-up JAX/XLA/Pallas re-design with the full capability surface of the
reference Rust library (Renmusxd/RustQIP): a linear-typed circuit-builder
API, a symbolic gate pipeline, whole-circuit jit compilation with gate
fusion, on-device measurement, a ``program``/``invertible`` DSL, the
QFT/reversible-arithmetic algorithm library, OpenQASM export, and a sharded
multi-chip execution layer over ``jax.sharding.Mesh``.

Layer map (SURVEY.md §1):
  engine/    L0  gate-apply kernels, fusion, whole-circuit compile
  ops/       L1  op IR + constructors, measurement math
  builder/   L2  LocalBuilder, registers, conditioning, inversion
  dsl/       L3  program() / @invertible (the proc-macro analogs)
  algos/     L4  qfft, reversible arithmetic, grover
  parallel/      sharded state vectors over device meshes
  qasm/          OpenQASM 2.0 export
"""

from rustqip_tpu import prelude
from rustqip_tpu.errors import CircuitError
from rustqip_tpu.types import PiRational, Representation

__version__ = "0.1.0"

__all__ = ["prelude", "CircuitError", "PiRational", "Representation"]
