"""Multi-process data/logging semantics (reference util/dist.py +
util/dataloader_util.py DistributedSampler), simulated by patching the
process index/count — the driver-level contract is: disjoint episode
streams, partitioned scene shards, and a single checkpoint writer.
A real 2-process gradient-sync smoke lives in tools/multihost_smoke.py.
"""

import numpy as np

import geoformer_tpu.parallel.dist as dist


def _patch_world(monkeypatch, rank, world):
    monkeypatch.setattr(dist, "get_rank", lambda: rank)
    monkeypatch.setattr(dist, "get_world_size", lambda: world)
    import jax

    monkeypatch.setattr(jax, "process_index", lambda: rank)
    monkeypatch.setattr(jax, "process_count", lambda: world)


def test_shard_indices_partition(monkeypatch):
    n, bs, seed = 103, 4, 7
    shards = []
    for rank in range(2):
        _patch_world(monkeypatch, rank, 2)
        shards.append(dist.shard_indices(n, bs, seed))
    # equal length (padded), union covers the dataset, same global shuffle
    assert len(shards[0]) == len(shards[1])
    union = set(shards[0].tolist()) | set(shards[1].tolist())
    assert union == set(range(n))
    overlap = set(shards[0].tolist()) & set(shards[1].tolist())
    assert len(overlap) <= 1  # only the pad wrap can repeat


def test_shard_indices_world1_is_plain_permutation(monkeypatch):
    _patch_world(monkeypatch, 0, 1)
    got = dist.shard_indices(10, 2, seed=3)
    expect = np.random.default_rng(3).permutation(10)
    np.testing.assert_array_equal(got, expect)


def test_local_seed_offsets(monkeypatch):
    _patch_world(monkeypatch, 0, 2)
    s0 = dist.local_seed(100)
    _patch_world(monkeypatch, 1, 2)
    s1 = dist.local_seed(100)
    assert s0 == 100 and s1 == 101


def test_primary_gating(monkeypatch):
    _patch_world(monkeypatch, 1, 2)
    assert not dist.is_primary()
    from geoformer_tpu.utils.logger import create_logger

    lg = create_logger(None, name="nonprimary_test", primary=False)
    assert lg.level >= 30  # WARNING: info logs are suppressed off-primary
    _patch_world(monkeypatch, 0, 2)
    assert dist.is_primary()


def test_episodic_streams_disjoint(monkeypatch, tmp_path):
    """Two ranks sampling episodes from the same dataset draw different
    (class, query, support) streams (reference seeds rank-offset RNGs,
    train.py:169-171)."""
    import random

    streams = []
    for rank in range(2):
        _patch_world(monkeypatch, rank, 2)
        s = dist.local_seed(42)
        pyrng = random.Random(s)
        # mirror of FSInstDataset.train_batches' episode draws
        stream = [(pyrng.choice(range(9)), pyrng.random()) for _ in range(16)]
        streams.append(stream)
    assert streams[0] != streams[1]
