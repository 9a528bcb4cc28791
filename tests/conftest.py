"""Test configuration: CPU backend, 8 virtual devices, x64 on.

Multi-chip logic is tested without a pod via XLA's host-platform device
multiplexing (SURVEY.md §4: shard-exchange equivalence tests on 8 fake CPU
devices); x64 gives the complex128 correctness path for 1e-10 matches.

Note: this environment pre-imports jax at interpreter startup (axon
sitecustomize), so the platform must be overridden via jax.config rather
than env vars; XLA_FLAGS still takes effect because no backend has been
initialized yet when conftest runs.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
