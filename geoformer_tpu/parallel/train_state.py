"""Train state + optimizer with module freezing and per-epoch LR.

The reference uses torch Adam with requires_grad freezing
(train.py:187-198, train_fs.py:190-197); here freezing is an optax
multi_transform that zeroes updates for frozen top-level modules, and the
LR is injected per epoch (two-phase schedule lives in the driver).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

# cfg.fix_module names -> our top-level param collections
_FIX_NAME_MAP = {
    "input_conv": ["backbone"],
    "unet": ["backbone"],
    "output_layer": ["backbone"],
    "semantic": ["semantic"],
    "semantic_linear": ["semantic"],
    "mask_tower": ["mask_tower0", "mask_tower1", "mask_tower2", "mask_out"],
    "controller": ["controller_head"],
    "set_aggregator": ["set_aggregator"],
    "pos_embedding": ["pos_embedding"],
    "query_projection": ["query_projection"],
    "decoder": ["decoder"],
    "encoder_to_decoder_projection": ["encoder_to_decoder_projection"],
    "similarity_net": ["similarity_net"],
}


def frozen_toplevel_names(fix_module: list[str]) -> set[str]:
    out: set[str] = set()
    for name in fix_module:
        out.update(_FIX_NAME_MAP.get(name, [name]))
    return out


def make_optimizer(cfg, params) -> optax.GradientTransformation:
    frozen = frozen_toplevel_names(cfg.fix_module)
    labels = {k: ("frozen" if k in frozen else "train") for k in params}
    if cfg.optim.lower() == "adam":
        # reference: optim.Adam(trainable, lr) — no weight decay (train.py:191)
        inner = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    else:
        # reference: optim.SGD(trainable, lr, momentum, weight_decay)
        # (train.py:192-197)
        def sgd_wd(learning_rate, momentum, weight_decay):
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.sgd(learning_rate, momentum=momentum),
            )

        inner = optax.inject_hyperparams(sgd_wd)(
            learning_rate=cfg.lr, momentum=cfg.momentum, weight_decay=cfg.weight_decay
        )
    # multi_transform wraps each branch in optax.masked, so the Adam moment
    # state for frozen modules is optax.MaskedNode — no arrays are
    # allocated for them (verified: freezing "unet" leaves zero moment
    # buffers under the backbone subtree), matching the reference's
    # build-optimizer-over-trainable-params memory footprint.
    tx = optax.multi_transform(
        {"train": inner, "frozen": optax.set_to_zero()}, labels
    )
    accum = int(getattr(cfg, "grad_accum_steps", 1) or 1)
    if accum > 1:
        # gradient accumulation: one v5e chip fits B=1 at prod capacities
        # (B=2 OOMs at compile, BASELINE.md r4), while the reference trains
        # effective batch 16 supervised / 8 episodic on one GPU
        # (/root/reference/config/geoformer_scannet.yaml:38-42). MultiSteps
        # averages grads over `accum` micro-steps and applies the inner
        # update on the last one (identity updates between) — the
        # accumulator costs one params-sized buffer, not an activations
        # buffer, so accumulated-16 fits wherever B=1 fits.
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Update the injected LR in-place in the optax state pytree."""
    return jax.tree.map(
        lambda x: x,
        _set_lr(opt_state, lr),
    )


def _set_lr(opt_state, lr):
    if hasattr(opt_state, "inner_opt_state"):  # optax.MultiStepsState
        return opt_state._replace(
            inner_opt_state=_set_lr(opt_state.inner_opt_state, lr)
        )
    if hasattr(opt_state, "inner_states"):
        inner = dict(opt_state.inner_states)
        st = inner["train"]
        hp = dict(st.inner_state.hyperparams)
        hp["learning_rate"] = jax.numpy.asarray(lr, dtype=hp["learning_rate"].dtype)
        new_inner = st._replace(
            inner_state=st.inner_state._replace(hyperparams=hp)
        )
        inner["train"] = new_inner
        return opt_state._replace(inner_states=inner)
    return opt_state


class TrainState(flax.struct.PyTreeNode):
    step: int
    params: Any
    batch_stats: Any
    constants: Any
    opt_state: Any

    def variables(self):
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "constants": self.constants,
        }


def create_train_state(variables, tx) -> tuple[TrainState, optax.GradientTransformation]:
    params = variables["params"]
    return TrainState(
        step=0,
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        constants=variables.get("constants", {}),
        opt_state=tx.init(params),
    )
