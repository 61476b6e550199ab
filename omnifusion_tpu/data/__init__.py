from omnifusion_tpu.data.datasets import (
    PanoDepthDataset,
    StanfordDataset,
    MatterportDataset,
    ThreeSixtyDDataset,
    SemanticDataset,
    SyntheticDataset,
    SyntheticSemanticDataset,
    make_dataset,
)
from omnifusion_tpu.data.loader import DataLoader

__all__ = [
    "PanoDepthDataset",
    "StanfordDataset",
    "MatterportDataset",
    "ThreeSixtyDDataset",
    "SemanticDataset",
    "SyntheticDataset",
    "SyntheticSemanticDataset",
    "make_dataset",
    "DataLoader",
]
