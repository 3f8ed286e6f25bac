from geoformer_tpu.data.scannet import FOLD, FOLD_NAME, BENCHMARK_SEMANTIC_LABELS, InstDataset
from geoformer_tpu.data.episodic import FSInstDataset
from geoformer_tpu.data.collate import pad_batch

__all__ = [
    "FOLD",
    "FOLD_NAME",
    "BENCHMARK_SEMANTIC_LABELS",
    "InstDataset",
    "FSInstDataset",
    "pad_batch",
]
