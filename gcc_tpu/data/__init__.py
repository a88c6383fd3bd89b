from gcc_tpu.data.formats import (
    Edgelist,
    SSDataset,
    SSSingleDataset,
    create_node_classification_dataset,
)

__all__ = [
    "Edgelist",
    "SSDataset",
    "SSSingleDataset",
    "create_node_classification_dataset",
]
