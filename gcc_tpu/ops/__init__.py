from gcc_tpu.ops.aggregate import (
    aggregate_sum_dense,
    aggregate_sum_segment,
    build_dense_adjacency,
    graph_pool_sum,
    node_degrees,
)

__all__ = [
    "aggregate_sum_segment",
    "aggregate_sum_dense",
    "build_dense_adjacency",
    "graph_pool_sum",
    "node_degrees",
]
