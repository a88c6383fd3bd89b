from gcc_tpu.features.positional import laplacian_positional_embedding
from gcc_tpu.features.featurize import featurize_batch, BatchFeatures

__all__ = [
    "laplacian_positional_embedding",
    "featurize_batch",
    "BatchFeatures",
]
