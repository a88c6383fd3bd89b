from gcc_tpu.parallel.mesh import make_mesh
from gcc_tpu.parallel.partitioned import (
    PartitionedGraph,
    partition_edges,
    partitioned_aggregate,
)

__all__ = [
    "make_mesh",
    "PartitionedGraph",
    "partition_edges",
    "partitioned_aggregate",
]
