from gcc_tpu.sampling.native import (
    native_available,
    random_walk_final,
    sample_subgraphs,
    weighted_sample,
)
from gcc_tpu.sampling.sampler import (
    degree_weights,
    entire_graph_subgraph,
    rwr_budgets,
    sample_contrastive_pairs,
)

__all__ = [
    "native_available",
    "sample_subgraphs",
    "random_walk_final",
    "weighted_sample",
    "rwr_budgets",
    "sample_contrastive_pairs",
    "entire_graph_subgraph",
    "degree_weights",
]
