from gcc_tpu.graph.csr import CSRGraph
from gcc_tpu.graph.batch import PaddedSubgraphBatch, batch_subgraphs, pick_bucket

__all__ = ["CSRGraph", "PaddedSubgraphBatch", "batch_subgraphs", "pick_bucket"]
