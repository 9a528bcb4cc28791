"""OpenQASM 2.0 import: parse qelib1-subset text into a LocalBuilder.

No reference analog (RustQIP only exports); added here so exported gate
streams round-trip — the acceptance check for export-time decomposition of
natively-conditioned circuits. Supports the gate set the exporter emits
plus the common qelib1 one- and two-qubit names.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from rustqip_tpu.errors import CircuitError

_TOKEN_RE = re.compile(r"^(?P<name>[a-zA-Z_][\w]*)\s*(\((?P<params>[^)]*)\))?\s*(?P<args>.*)$")
_QARG_RE = re.compile(r"^(?P<reg>[a-zA-Z_][\w]*)\s*(\[\s*(?P<idx>\d+)\s*\])?$")

_SAFE_NAMES = {"pi": np.pi}


def _eval_param(expr: str) -> float:
    """Evaluate a QASM angle expression (arithmetic over numbers and pi)."""
    if not re.fullmatch(r"[\d\s\.\+\-\*/\(\)epi]*", expr):
        raise CircuitError(f"Unsupported QASM parameter expression {expr!r}")
    try:
        return float(eval(expr, {"__builtins__": {}}, _SAFE_NAMES)) # noqa: S307
    except Exception as e:
        raise CircuitError(f"Bad QASM parameter {expr!r}: {e}") from e


# Matrix semantics shared with the exporter's synthesis backend: a
# convention change there must flow here or round-trips silently break.
from rustqip_tpu.qasm.decompose import _u3_matrix as _u3  # noqa: E402


def _u1(lam: float) -> np.ndarray:
    from rustqip_tpu.qasm.decompose import gate_matrix

    return gate_matrix("u1", (lam,))


def _rot(axis: str, theta: float) -> np.ndarray:
    c, s = np.cos(theta / 2), np.sin(theta / 2)
    if axis == "x":
        return np.array([[c, -1j * s], [-1j * s, c]])
    if axis == "y":
        return np.array([[c, -s], [s, c]])
    return np.diag([np.exp(-1j * theta / 2), np.exp(1j * theta / 2)])


def _ctrl(mat: np.ndarray) -> np.ndarray:
    dim = mat.shape[0]
    out = np.eye(2 * dim, dtype=np.complex128)
    out[dim:, dim:] = mat
    return out


_SWAP4 = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
    dtype=np.complex128,
)
_X = np.array([[0, 1], [1, 0]], dtype=np.complex128)

#: name -> (n_params, matrix factory over qubits in listed order)
_GATES = {
    "id": (0, lambda: np.eye(2)),
    "x": (0, lambda: _X),
    "y": (0, lambda: np.array([[0, -1j], [1j, 0]])),
    "z": (0, lambda: np.diag([1.0, -1.0])),
    "h": (0, lambda: np.array([[1, 1], [1, -1]]) / np.sqrt(2)),
    "s": (0, lambda: np.diag([1.0, 1j])),
    "sdg": (0, lambda: np.diag([1.0, -1j])),
    "t": (0, lambda: np.diag([1.0, np.exp(1j * np.pi / 4)])),
    "tdg": (0, lambda: np.diag([1.0, np.exp(-1j * np.pi / 4)])),
    "sx": (0, lambda: 0.5 * np.array([[1 + 1j, 1 - 1j], [1 - 1j, 1 + 1j]])),
    "u1": (1, _u1),
    "u2": (2, lambda p, l: _u3(np.pi / 2, p, l)),
    "u3": (3, _u3),
    "u": (3, _u3),
    "p": (1, _u1),
    "rx": (1, lambda t: _rot("x", t)),
    "ry": (1, lambda t: _rot("y", t)),
    # qelib1 defines rz(phi) as u1(phi)
    "rz": (1, _u1),
    "cx": (0, lambda: _ctrl(_X)),
    "cy": (0, lambda: _ctrl(np.array([[0, -1j], [1j, 0]]))),
    "cz": (0, lambda: _ctrl(np.diag([1.0, -1.0]))),
    "ch": (0, lambda: _ctrl(np.array([[1, 1], [1, -1]]) / np.sqrt(2))),
    "cu1": (1, lambda l: _ctrl(_u1(l))),
    "cp": (1, lambda l: _ctrl(_u1(l))),
    "cu3": (3, lambda t, p, l: _ctrl(_u3(t, p, l))),
    # qelib1's crz expands to a TRUE controlled-Rz (relative phases only)
    "crz": (1, lambda l: _ctrl(_rot("z", l))),
    "swap": (0, lambda: _SWAP4),
    "ccx": (0, lambda: _ctrl(_ctrl(_X))),
    "cswap": (0, lambda: _ctrl(_SWAP4)),
}


@dataclass
class QasmCircuit:
    """Result of a QASM import: a ready builder plus handle bookkeeping."""

    builder: object
    n: int
    qubits: List[object]  # current single-qubit Registers, index order
    measurements: List[Tuple[int, object]] = field(default_factory=list)
    #: classical bit index -> ordinal of the producing measurement
    creg_map: Dict[int, int] = field(default_factory=dict)

    def finish(self):
        """Merge the remaining qubit registers into one (consumes them)."""
        return self.builder.merge_registers(
            [q for q in self.qubits if q is not None]
        )


def circuit_from_qasm(text: str, builder=None) -> QasmCircuit:
    """Parse OpenQASM 2.0 (qelib1 subset) into a LocalBuilder circuit.

    Multiple qregs concatenate in declaration order. ``measure`` becomes a
    collapsing measurement on the named qubit(s); ``barrier`` and comments
    are ignored; ``if``/custom ``gate`` definitions are rejected loudly.
    """
    from rustqip_tpu.builder.builder import LocalBuilder

    if builder is None:
        builder = LocalBuilder()
    # strip comments, join lines, split statements
    body = re.sub(r"//[^\n]*", "", text)
    statements = [s.strip() for s in body.replace("\n", " ").split(";")]
    qreg_offsets: Dict[str, Tuple[int, int]] = {}
    cregs: Dict[str, Tuple[int, int]] = {}
    qubits: List[Optional[object]] = []
    out = QasmCircuit(builder=builder, n=0, qubits=qubits)
    n_c = 0

    def qubit_indices(args: str) -> List[int]:
        idxs = []
        for arg in args.split(","):
            m = _QARG_RE.match(arg.strip())
            if not m or m.group("reg") not in qreg_offsets:
                raise CircuitError(f"Bad qubit argument {arg!r}")
            off, size = qreg_offsets[m.group("reg")]
            if m.group("idx") is None:
                idxs.extend(range(off, off + size))
            else:
                i = int(m.group("idx"))
                if i >= size:
                    raise CircuitError(f"Qubit index out of range: {arg!r}")
                idxs.append(off + i)
        return idxs

    for st in statements:
        if not st:
            continue
        if st.startswith("OPENQASM") or st.startswith("include"):
            continue
        if st.startswith("barrier"):
            continue
        if st.startswith("if") or st.startswith("gate ") or st.startswith("opaque"):
            raise CircuitError(f"Unsupported QASM statement: {st!r}")
        m = re.match(r"^qreg\s+([a-zA-Z_]\w*)\s*\[\s*(\d+)\s*\]$", st)
        if m:
            name, size = m.group(1), int(m.group(2))
            off = len(qubits)
            qreg_offsets[name] = (off, size)
            r = builder.register(size)
            qubits.extend(builder.split_all_register(r))
            continue
        m = re.match(r"^creg\s+([a-zA-Z_]\w*)\s*\[\s*(\d+)\s*\]$", st)
        if m:
            cregs[m.group(1)] = (n_c, int(m.group(2)))
            n_c += int(m.group(2))
            continue
        m = re.match(
            r"^measure\s+(?P<q>[^\s]+)\s*->\s*(?P<c>[a-zA-Z_]\w*)"
            r"\s*(\[\s*(?P<ci>\d+)\s*\])?$",
            st,
        )
        if m:
            for qi in qubit_indices(m.group("q")):
                qubits[qi], handle = builder.measure(qubits[qi])
                ordinal = len(out.measurements)
                out.measurements.append((qi, handle))
                if m.group("ci") is not None and m.group("c") in cregs:
                    out.creg_map[
                        cregs[m.group("c")][0] + int(m.group("ci"))
                    ] = ordinal
            continue
        tok = _TOKEN_RE.match(st)
        if not tok or tok.group("name") not in _GATES:
            raise CircuitError(f"Unsupported QASM statement: {st!r}")
        name = tok.group("name")
        n_params, factory = _GATES[name]
        params = []
        if tok.group("params"):
            params = [_eval_param(p) for p in tok.group("params").split(",")]
        if len(params) != n_params:
            raise CircuitError(
                f"{name} expects {n_params} parameters, got {len(params)}"
            )
        mat = np.asarray(factory(*params), dtype=np.complex128)
        idxs = qubit_indices(tok.group("args"))
        k = int(mat.shape[0]).bit_length() - 1
        if len(idxs) != k:
            raise CircuitError(
                f"{name} expects {k} qubits, got {len(idxs)}"
            )
        regs = []
        for qi in idxs:
            if qubits[qi] is None:  # pragma: no cover
                raise CircuitError("Qubit reused before release")
            regs.append(qubits[qi])
            qubits[qi] = None
        merged = builder.merge_registers(regs)
        merged = builder.apply_matrix(merged, mat)
        for qi, q in zip(idxs, builder.split_all_register(merged)):
            qubits[qi] = q

    out.n = len(qubits)
    return out
