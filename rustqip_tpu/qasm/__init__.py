"""OpenQASM 2.0 export (re-design of ``qip/src/qasm.rs``)."""

from rustqip_tpu.qasm.export import to_openqasm, write_openqasm_file

__all__ = ["to_openqasm", "write_openqasm_file"]
