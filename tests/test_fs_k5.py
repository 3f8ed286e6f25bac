"""K=5 multi-support protocol (reference test_fs.py:136: K in {1,5}).

The only K-dependent code is load_set_support's mean over the first k_shot
support tuples (test_fs.py:49-53; reference test_fs.py:33-118) — these pin
that a 5-shot run consumes 5 tuples per (run, class) and averages their
embeddings, end-to-end through the real dataset + model surface.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from tools.make_synthetic_data import main as make_data

    root = tmp_path_factory.mktemp("k5data")
    make_data(root=str(root), n_scenes=6, n_points=300, seed=3)
    return str(root)


def _cfg(tiny_cfg, synth_root, **kw):
    return tiny_cfg.replace(
        data_root=synth_root, cvfold=0, k_shot=5, run_num=2,
        fix_support=True, type_support="fullscene_fold", **kw
    )


def test_support_sets_carry_five_tuples(tiny_cfg, synth_root):
    from geoformer_tpu.data.episodic import FSInstDataset

    cfg = _cfg(tiny_cfg, synth_root)
    ds = FSInstDataset(cfg, "val")
    sets = ds.load_support_sets()
    assert len(sets) == 10
    for sset in sets:
        assert all(len(tuples) == 5 for tuples in sset.values())
    # and the 1-shot file still loads independently
    sets1 = ds.load_support_sets(k_shot=1)
    assert all(len(t) == 1 for s in sets1 for t in s.values())


def test_load_set_support_k5_mean_embedding(tiny_cfg, synth_root, monkeypatch):
    """load_set_support at k_shot=5: consumes exactly 5 supports per
    (run, class) and returns the mean of their process_support embeddings."""
    from geoformer_tpu.data.episodic import FSInstDataset
    from geoformer_tpu.engine import Engine
    from geoformer_tpu.models.geoformer_fs import GeoFormerFS
    from geoformer_tpu.utils.logger import create_logger
    import test_fs as fs_driver

    cfg = _cfg(tiny_cfg, synth_root, batch_size=1)
    ds = FSInstDataset(cfg, "val")
    engine = Engine(cfg, few_shot=True)

    # init variables from one support batch (process_support covers the
    # backbone + aggregator params it needs)
    sets = ds.load_support_sets()
    # first class in iteration order: its 5 embeds consume the FIRST five
    # rng splits of load_set_support's stream, so the reconstruction below
    # can replay them
    cls0 = next(iter(sets[0]))
    tuples0 = sets[0][cls0]
    b0 = jax.tree.map(jnp.asarray, ds.support_batch(tuples0[0][0], tuples0[0][1]))
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    variables = jax.jit(
        lambda r, b: engine.model.init(r, b, method=GeoFormerFS.process_support)
    )({"params": k1, "sample": k2, "dropout": k3}, b0)

    calls = []
    orig = FSInstDataset.support_batch

    def counting(self, scene, inst):
        calls.append((scene, inst))
        return orig(self, scene, inst)

    monkeypatch.setattr(FSInstDataset, "support_batch", counting)
    logger = create_logger(os.path.join(cfg.output_path, "k5_test"))
    embs = fs_driver.load_set_support(engine, variables, ds, logger)

    n_classes = len(sets[0])
    assert len(calls) == cfg.run_num * n_classes * 5
    assert len(embs) == cfg.run_num

    # the recorded per-class vector is the mean of the 5 individual embeds
    rng = jax.random.PRNGKey(cfg.test_seed)

    @jax.jit
    def embed(batch, r):
        return engine.model.apply(
            variables, batch, rngs={"sample": r},
            method=GeoFormerFS.process_support)

    want = []
    for scene, inst in sets[0][cls0][:5]:
        rng, sub = jax.random.split(rng)
        want.append(np.asarray(embed(
            jax.tree.map(jnp.asarray, orig(ds, scene, inst)), sub))[0])
    np.testing.assert_allclose(
        embs[0][cls0], np.mean(want, axis=0), rtol=1e-5, atol=1e-6)
