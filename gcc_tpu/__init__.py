"""gcc_tpu — a TPU-native graph contrastive pre-training framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of THUDM/GCC
(Graph Contrastive Coding, KDD 2020): random-walk-with-restart subgraph
sampling, Laplacian-eigenvector positional embeddings, GIN encoders, and
E2E/MoCo InfoNCE contrastive pre-training, plus the downstream node
classification / graph classification / similarity search evaluations.

Design stance (see SURVEY.md §7): instead of porting DGL's dynamic graph
object model, everything is centered on a static-shape
:class:`~gcc_tpu.graph.batch.PaddedSubgraphBatch` so that the entire
training step — featurization (including the eigendecomposition that the
reference runs on CPU via ARPACK), message passing, contrastive loss,
optimizer and EMA update — compiles into a single XLA program per size
bucket.
"""

__version__ = "0.1.0"

from gcc_tpu.graph.csr import CSRGraph  # noqa: F401
from gcc_tpu.graph.batch import PaddedSubgraphBatch  # noqa: F401
