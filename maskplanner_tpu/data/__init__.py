"""Data layer: geometry preprocessing, dataset pipeline, synthetic data."""
from .dataset import PaintDataset, DataLoader, collate, segment_budget, point_budget
from .legacy import LegacyPaintDataset
from .synthetic import SyntheticPaintDataset, generate_sample

__all__ = [
    "PaintDataset", "DataLoader", "collate", "segment_budget", "point_budget",
    "LegacyPaintDataset", "SyntheticPaintDataset", "generate_sample",
]
