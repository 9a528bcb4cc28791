"""OpenQASM 2.0 text export.

Re-design of ``qip/src/qasm.rs``: walk the builder's recorded pipeline and
emit qelib1 gates. Same conventions as the reference:

* one classical bit per distinct collapsed-measured qubit, allocated in
  sorted qubit order (qasm.rs:35-52);
* CNOT entries emit ``cx`` control->target (:127-134); SWAP emits pairwise
  ``swap`` across register halves (:137-154);
* Rz angles print as decimal radians (trimmed) or symbolic ``k*pi/m``
  (:192-214);
* global phases, arbitrary matrices, and stochastic measurements are not
  representable in OpenQASM 2.0 and emit comments.
"""

from __future__ import annotations

from typing import List

from rustqip_tpu.builder.circuit_objects import (
    ControlledMatGate,
    GlobalPhaseGate,
    MatGate,
    MeasurementObject,
    NamedGate,
    RzGate,
)
from rustqip_tpu.types import Angle, PiRational


def format_angle(theta: Angle) -> str:
    """Decimal radians (trimmed) or exact ``k*pi/m`` (ref qasm.rs:192-214)."""
    if isinstance(theta, PiRational):
        num, den = theta.numerator, theta.denominator
        if den == 1:
            return f"{num}*pi"
        return f"{num}*pi/{den}"
    text = f"{float(theta):.12f}".rstrip("0").rstrip(".")
    return text if text else "0"


def _emit_unitary(obj, indices, out: List[str]) -> None:
    if isinstance(obj, NamedGate):
        name = obj.name
        if name in ("X", "Y", "Z", "H", "S", "T"):
            for q in indices:
                out.append(f"{name.lower()} q[{q}];")
        elif name == "CNOT":
            if indices:
                c = indices[0]
                for t in indices[1:]:
                    out.append(f"cx q[{c}],q[{t}];")
        elif name == "SWAP":
            k = len(indices)
            if k < 2:
                return
            if k == 2:
                out.append(f"swap q[{indices[0]}],q[{indices[1]}];")
            elif k % 2 == 0:
                half = k // 2
                for i in range(half):
                    out.append(
                        f"swap q[{indices[i]}],q[{indices[i + half]}];"
                    )
            else:
                out.append(
                    f"// swap with odd arity {list(indices)} not directly "
                    "supported"
                )
    elif isinstance(obj, RzGate):
        ang = format_angle(obj.theta)
        for q in indices:
            out.append(f"rz({ang}) q[{q}];")
    elif isinstance(obj, GlobalPhaseGate):
        out.append(
            f"// global phase {format_angle(obj.theta)} "
            "(ignored in OpenQASM 2.0)"
        )
    elif isinstance(obj, MatGate):
        out.append(
            f"// generic unitary on {list(indices)} "
            "(not emitted in OpenQASM 2.0)"
        )
    elif isinstance(obj, ControlledMatGate):
        out.append(
            f"// controlled generic unitary on {list(indices)} "
            "(not emitted in OpenQASM 2.0)"
        )


def to_openqasm(builder) -> str:
    """Export a builder's circuit as OpenQASM 2.0 text (repeat blocks are
    unrolled — OpenQASM 2.0 has no loops)."""
    from rustqip_tpu.builder.circuit_objects import flatten_pipeline

    pipeline = flatten_pipeline(builder.make_subcircuit())
    n_qubits = builder.n

    measured = sorted(
        {
            q
            for indices, co in pipeline
            if isinstance(co.obj, MeasurementObject) and not co.obj.stochastic
            for q in indices
        }
    )
    classical_map = {q: c for c, q in enumerate(measured)}

    out: List[str] = ["OPENQASM 2.0;", 'include "qelib1.inc";']
    out.append(f"qreg q[{n_qubits}];")
    if measured:
        out.append(f"creg c[{len(measured)}];")

    for indices, co in pipeline:
        obj = co.obj
        if isinstance(obj, MeasurementObject):
            if obj.stochastic:
                out.append(
                    f"// stochastic measurement over {list(indices)} "
                    "(not in OpenQASM 2.0)"
                )
            else:
                for q in indices:
                    if q in classical_map:
                        out.append(f"measure q[{q}] -> c[{classical_map[q]}];")
        else:
            _emit_unitary(obj, indices, out)

    return "\n".join(out) + "\n"


def write_openqasm_file(builder, path) -> None:
    """Write the circuit as OpenQASM 2.0 into ``path`` (ref qasm.rs:103)."""
    with open(path, "w") as f:
        f.write(to_openqasm(builder))
