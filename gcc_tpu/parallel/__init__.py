from gcc_tpu.parallel.giant_features import (
    choose_partition,
    giant_graph_embedding,
    giant_laplacian_pe,
)
from gcc_tpu.parallel.mesh import make_mesh
from gcc_tpu.parallel.partitioned import (
    DensePartitionedGraph,
    PartitionedGraph,
    RingPartitionedGraph,
    partition_dense,
    shard_dense_partition,
    partition_edges,
    partition_edges_ring,
    partitioned_aggregate,
    partitioned_aggregate_batched,
    partitioned_aggregate_dense,
    partitioned_aggregate_ring,
)

__all__ = [
    "choose_partition",
    "giant_graph_embedding",
    "giant_laplacian_pe",
    "make_mesh",
    "DensePartitionedGraph",
    "PartitionedGraph",
    "RingPartitionedGraph",
    "partition_dense",
    "shard_dense_partition",
    "partition_edges",
    "partition_edges_ring",
    "partitioned_aggregate",
    "partitioned_aggregate_batched",
    "partitioned_aggregate_dense",
    "partitioned_aggregate_ring",
]
