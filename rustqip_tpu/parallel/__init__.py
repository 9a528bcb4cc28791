"""Multi-chip distribution layer: sharded amplitude vectors over a mesh.

The reference's engine is offset-aware so a state vector can be "split
across multiple vectors (as for distributed computation)" — but no transport
ever connects the shards (SURVEY.md §2.4/§5). Here distribution is
first-class and TPU-native: the 2^n amplitudes shard across a
``jax.sharding.Mesh`` along the top (most significant) qubits; gates on
local qubits run shard-local, gates on sharded qubits resolve to XLA
collectives (collective_permute / all-to-all over ICI) inserted by GSPMD,
and measurement reductions become psums.
"""

from rustqip_tpu.parallel.mesh import make_multislice_mesh, make_shard_mesh
from rustqip_tpu.parallel.sharded import (
    ShardedCircuit,
    compile_sharded,
    sharded_calculate_state,
)
from rustqip_tpu.parallel.explicit import (
    ExplicitShardedCircuit,
    compile_sharded_explicit,
)

__all__ = [
    "make_shard_mesh",
    "make_multislice_mesh",
    "ShardedCircuit",
    "compile_sharded",
    "sharded_calculate_state",
    "ExplicitShardedCircuit",
    "compile_sharded_explicit",
]
