"""Ground-truth id encoding for the ScanNet protocol.

gt_id = benchmark_semantic_id * 1000 + instance_index + 1, 0 for
unannotated points (reference data/scannetv2/prepare_data_inst_gttxt.py:
33-71). Raw labels are the 0-19 remap; BENCHMARK_SEMANTIC_LABELS maps them
back to nyu40 benchmark ids.
"""

from __future__ import annotations

import numpy as np

from geoformer_tpu.data.scannet import BENCHMARK_SEMANTIC_LABELS


def make_gt_ids(raw_labels: np.ndarray, instance_labels: np.ndarray) -> np.ndarray:
    out = np.zeros(instance_labels.shape, np.int64)
    bench = np.asarray(BENCHMARK_SEMANTIC_LABELS)
    for inst_id in np.unique(instance_labels):
        if inst_id < 0:
            continue
        sel = instance_labels == inst_id
        sem = int(raw_labels[sel][0])
        if sem == -100:
            sem = 0
        out[sel] = bench[sem] * 1000 + inst_id + 1
    return out
