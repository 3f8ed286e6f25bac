"""Training/eval engine: jitted SPMD steps wiring model + criterion + optax.

Replaces the reference drivers' inner loops (train.py:31-152,
train_fs.py:32-153). Two compiled step variants exist per model — the
prepare phase (semantic only, epoch <= prepare_epochs) and the full phase —
mirroring the reference's two-phase schedule without retracing per epoch.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.losses import FSInstSetCriterion, InstSetCriterion
from geoformer_tpu.models import GeoFormer, GeoFormerFS
from geoformer_tpu.models.geoformer import ModelConfig
from geoformer_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from geoformer_tpu.parallel.train_state import (
    TrainState,
    _set_lr,
    create_train_state,
    make_optimizer,
)
from geoformer_tpu.utils.scheduler import adjust_learning_rate, cosine_lr_after_step


class Engine:
    def __init__(self, cfg, few_shot: bool = False, mesh=None):
        self.cfg = cfg
        self.few_shot = few_shot
        self.mc = ModelConfig.from_cfg(cfg)
        self.model = GeoFormerFS(self.mc) if few_shot else GeoFormer(self.mc)
        self.criterion = FSInstSetCriterion(cfg) if few_shot else InstSetCriterion(cfg)
        self.mesh = mesh or make_mesh()
        self.tx = None
        self._train_steps = {}
        self._eval_fn = None

    # ---------------- init ----------------

    def init_state(self, example_batch, seed=0, example_support=None) -> TrainState:
        k = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(k, 3)
        rngs = {"params": k1, "sample": k2, "dropout": k3}
        if self.few_shot:
            variables = self.model.init(rngs, example_support, example_batch, train=True)
        else:
            variables = self.model.init(rngs, example_batch, train=True)
        self.tx = make_optimizer(self.cfg, variables["params"])
        state, = (create_train_state(variables, self.tx),)
        return state

    # ---------------- train ----------------

    def _make_train_step(self, semantic_only: bool, epoch_repr: int):
        cfg = self.cfg
        model, criterion = self.model, self.criterion

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, batch, support, rng, lr):
            r1, r2 = jax.random.split(rng)
            rngs = {"sample": r1, "dropout": r2}

            def loss_fn(params):
                variables = {
                    "params": params,
                    "batch_stats": state.batch_stats,
                    "constants": state.constants,
                }
                if self.few_shot:
                    out, mut = model.apply(
                        variables, support, batch, train=True, rngs=rngs,
                        mutable=["batch_stats"],
                    )
                else:
                    out, mut = model.apply(
                        variables, batch, train=True, semantic_only=semantic_only,
                        rngs=rngs, mutable=["batch_stats"],
                    )
                loss, loss_dict = criterion(out, batch, epoch_repr)
                return loss, (loss_dict, mut)

            (loss, (loss_dict, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            opt_state = _set_lr(state.opt_state, lr)
            updates, opt_state = self.tx.update(grads, opt_state, state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=params,
                batch_stats=mut["batch_stats"],
                opt_state=opt_state,
            )
            return new_state, loss, loss_dict

        return step

    def train_step(self, state, batch, epoch, rng, support=None):
        cfg = self.cfg
        semantic_only = (not self.few_shot) and epoch <= cfg.prepare_epochs
        epoch_repr = 0 if (epoch <= cfg.prepare_epochs) else cfg.prepare_epochs + 1
        key = (semantic_only, epoch_repr)
        if key not in self._train_steps:
            self._train_steps[key] = self._make_train_step(semantic_only, epoch_repr)
        batch = shard_batch(batch, self.mesh)
        if support is not None:
            support = shard_batch(support, self.mesh)
        lr = self.learning_rate(epoch)
        # ambient mesh so bare-PartitionSpec sharding constraints inside the
        # model (query/model-axis parallelism) resolve during tracing
        with jax.sharding.set_mesh(self.mesh):
            return self._train_steps[key](state, batch, support, rng, lr) + (lr,)

    def learning_rate(self, epoch):
        cfg = self.cfg
        if (not self.few_shot) and epoch <= cfg.prepare_epochs:
            return cosine_lr_after_step(cfg.lr, epoch, cfg.prepare_epochs, cfg.epochs)
        return adjust_learning_rate(
            cfg.base_lr, cfg.warm_lr, cfg.final_lr, cfg.warm_lr_epochs, cfg.epochs, epoch
        )

    # ---------------- eval ----------------

    def eval_fn(self):
        if self._eval_fn is None:
            model = self.model

            if self.few_shot:
                @jax.jit
                def fn(variables, support, batch, rng):
                    return model.apply(
                        variables, support, batch, train=False, rngs={"sample": rng}
                    )
            else:
                @jax.jit
                def fn(variables, batch, rng):
                    return model.apply(variables, batch, train=False, rngs={"sample": rng})

            self._eval_fn = fn
        return self._eval_fn

    def eval_batch(self, variables, batch, rng, support=None):
        """Run the jitted eval forward on a [B, ...] batch, sharded over the
        mesh's data axis when B divides it (multi-chip eval serving; no
        reference analog — its test drivers are strictly bs=1)."""
        b = jax.tree.leaves(batch)[0].shape[0]
        n_data = dict(
            zip(self.mesh.axis_names, self.mesh.devices.shape)
        ).get("data", 1)
        if n_data > 1 and b % n_data == 0:
            batch = shard_batch(batch, self.mesh)
            if support is not None:
                support = shard_batch(support, self.mesh)
        fn = self.eval_fn()
        with jax.sharding.set_mesh(self.mesh):
            if self.few_shot:
                return fn(variables, support, batch, rng)
            return fn(variables, batch, rng)
