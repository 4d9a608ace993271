"""Datasets and loading: tensor-pickle / raw-SVG datasets, batch loader,
synthetic generators, preprocess CLI (python -m deepsvg_tpu.data.preprocess)."""
from .dataset import (
    SVGDataset,
    SVGDatasetBase,
    SVGFinetuneDataset,
    SVGTensorDataset,
    load_dataset,
)
from .loader import DataLoader, collate, device_put_sharded
from .synthetic import SyntheticIconDataset, generate_batch, generate_icon

__all__ = [
    "SVGDataset", "SVGDatasetBase", "SVGFinetuneDataset", "SVGTensorDataset",
    "load_dataset", "DataLoader", "collate", "device_put_sharded",
    "SyntheticIconDataset", "generate_batch", "generate_icon",
]
