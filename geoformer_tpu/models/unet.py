"""Sparse 3D U-Net backbone (reference geoformer_modules.py:10-129).

Recursive UBlock over nPlanes=[m..7m]: 2 ResidualBlocks per level, k2s2
down / inverse-k2 up, skip concat + 2 tail blocks; at the bottleneck a
small dense transformer encoder runs over the (few) deepest voxels
(geoformer_modules.py:64-68,120-127 / model/transformer.py:153-188).

Convolutions consume the precomputed `GridPlan` rulebooks; no module ever
sees a dynamic shape.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from geoformer_tpu.models.blocks import MaskedBatchNorm, MultiHeadSelfAttention, SimpleNorm, masked_softmax
from geoformer_tpu.ops.brick import (
    dense_1x1_folded,
    dense_subm_conv,
    dense_subm_conv_folded,
    down_conv_bricks,
    fold_mask,
    fold_x,
    from_dense,
    to_dense,
    unfold_x,
    up_conv_bricks,
)
from geoformer_tpu.ops.sparse_conv import GridPlan, apply_subm, dense_1x1, down_conv, subm_conv, up_conv


def _subm_param(module, name, cin, cout):
    # kaiming-like fan-in init over the 27*cin fan
    init = nn.initializers.variance_scaling(1.0, "fan_in", "normal")
    return module.param(name, init, (27, cin, cout))


@jax.tree_util.register_pytree_node_class
class _LevelCtx:
    """Per-level conv context: the level's feature representation and how
    to conv in it.

    Brick mode (plan.bricks): features live as dense [B,NB,8,8,8,C] bricks
    for the WHOLE level — scatter in once (`enter`), run every subm conv as
    a dense MXU conv, gather out once (`exit`) — so the per-voxel
    scatter/gather cost amortizes over the level's ~8 convs instead of
    being paid 2x per conv. Rulebook mode: passthrough sparse [B,V,C].

    Registered as a pytree so it can flow through nn.remat."""

    def __init__(self, brick, nbr, mask):
        self.brick = brick
        self.nbr = nbr
        self.mask = mask

    @classmethod
    def for_level(cls, plan: GridPlan, lvl: int):
        if plan.bricks:
            return cls(plan.bricks[lvl], None, plan.bricks[lvl].occ)
        nbr = plan.subm_compact[lvl] if plan.subm_compact else plan.subm[lvl]
        return cls(None, nbr, plan.grids[lvl].voxel_mask)

    def tree_flatten(self):
        return (self.brick, self.nbr, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def enter(self, x_sparse):
        return to_dense(x_sparse, self.brick) if self.brick is not None else x_sparse

    def exit(self, x_rep):
        return from_dense(x_rep, self.brick) if self.brick is not None else x_rep

    def conv(self, x_rep, w, compute_dtype=None, segs=None):
        if segs is not None:
            # x-folded level residency (ops/brick.py): x_rep is
            # [B,NB,8,8,sum(8c)], only valid in brick mode
            return dense_subm_conv_folded(x_rep, self.brick, w, segs,
                                          compute_dtype=compute_dtype)
        if self.brick is not None:
            return dense_subm_conv(x_rep, self.brick, w,
                                   compute_dtype=compute_dtype)
        return apply_subm(x_rep, self.nbr, w, compute_dtype=compute_dtype)


class ResidualBlock(nn.Module):
    """(BN-ReLU-SubM3-BN-ReLU-SubM3) + identity (1x1 if channels change)."""

    in_channels: int
    out_channels: int
    compute_dtype: object = None  # bf16 halves gather traffic, fp32 accum
    # x-folded level residency: input lane segments (None = standard).
    # Params are layout-independent — checkpoints interchange.
    fold_segs: tuple = None

    @nn.compact
    def __call__(self, feats, ctx, train: bool):
        vmask = ctx.mask
        segs = self.fold_segs
        out_segs = (self.out_channels,) if segs is not None else None
        if self.in_channels == self.out_channels:
            identity = feats
        else:
            wi = self.param(
                "i_branch",
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                (self.in_channels, self.out_channels),
            )
            # keep the identity branch in the level's residency dtype
            if segs is not None:
                identity = dense_1x1_folded(feats, wi.astype(feats.dtype), segs)
            else:
                identity = dense_1x1(
                    feats.reshape(feats.shape[0], -1, feats.shape[-1]),
                    wi.astype(feats.dtype),
                ).astype(feats.dtype).reshape(feats.shape[:-1] + (self.out_channels,))
        x = MaskedBatchNorm(self.in_channels, fold_segs=segs)(feats, vmask, train)
        x = nn.relu(x)
        x = ctx.conv(x, _subm_param(self, "conv1", self.in_channels, self.out_channels),
                     compute_dtype=self.compute_dtype, segs=segs)
        x = MaskedBatchNorm(self.out_channels, fold_segs=out_segs)(x, vmask, train)
        x = nn.relu(x)
        x = ctx.conv(x, _subm_param(self, "conv2", self.out_channels, self.out_channels),
                     compute_dtype=self.compute_dtype, segs=out_segs)
        x = x + identity
        if segs is not None:
            return jnp.where(fold_mask(vmask, out_segs), x, 0.0)
        return jnp.where(vmask[..., None], x, 0.0)


class BottleneckTransformer(nn.Module):
    """Dense encoder over bottleneck voxels (model/transformer.py:153-188).

    Positional term: linear(mean_j (xyz_i - xyz_j)) == linear(xyz_i - mean xyz),
    computed with masked means. Self-attention is masked over pad voxels.
    """

    d_model: int = 128
    n_layers: int = 2
    heads: int = 4
    d_ff: int = 64
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, xyz, vmask, train: bool):
        m = vmask.astype(feats.dtype)[..., None]
        n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        centered = (xyz - jnp.sum(xyz * m, axis=1, keepdims=True) / n) * m
        pos = nn.Dense(self.d_model, name="position_linear")(centered)
        x = feats + pos
        for i in range(self.n_layers):
            # EncoderLayer (model/helper.py:93-108): prenorm attn + prenorm FF
            x2 = SimpleNorm(self.d_model, name=f"norm1_{i}")(x)
            attn = MultiHeadSelfAttention(self.d_model, self.heads, name=f"attn_{i}")(
                x2, x2, x2, vmask, train
            )
            x = x + nn.Dropout(self.dropout, deterministic=not train)(attn)
            x2 = SimpleNorm(self.d_model, name=f"norm2_{i}")(x)
            h = nn.Dense(self.d_ff, name=f"ff1_{i}")(x2)
            h = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(h))
            h = nn.Dense(self.d_model, name=f"ff2_{i}")(h)
            x = x + nn.Dropout(self.dropout, deterministic=not train)(h)
        x = SimpleNorm(self.d_model, name="norm_out")(x)
        return jnp.where(vmask[..., None], x, 0.0)


class UBlock(nn.Module):
    """Recursive U-Net block over nPlanes (geoformer_modules.py:52-129)."""

    n_planes: Sequence[int]
    block_reps: int = 2
    use_backbone_transformer: bool = True
    level: int = 0
    compute_dtype: object = None
    remat: bool = False
    rep_io: bool = False  # in/out are level-rep (dense bricks), not sparse
    # fold the brick x axis into lanes for levels with c0 <= fold_max_c
    # (0 = off): narrow-channel levels pad their 16-lane buffers 8x under
    # XLA's (8,128) tiling; folded levels tile exactly (ops/brick.py)
    fold_max_c: int = 0
    # fold during TRAINING too (fold is layout-only — params/stats are
    # identical either way): default False because the folded prod train
    # step OOMs one v5e chip by 0.44 GB with 7.6 GB of HLO-temp
    # fragmentation (r5c train_bench B=1 fold32) while the unfolded step
    # is the proven fit (r4g, 1553.9 ms); the fold's win is the EVAL
    # forward. Flip via tpu_brick_fold_train for measurement
    fold_train: bool = False

    @nn.compact
    def __call__(self, feats, plan: GridPlan, train: bool):
        """feats: sparse [B, V_lvl, C] in; sparse [B, V_lvl, c0] out —
        unless rep_io, in which case both are the level representation
        (dense bricks in brick mode; the fold is internal to the level).
        Internally the level may be brick-dense (_LevelCtx)."""
        lvl = self.level
        ctx = _LevelCtx.for_level(plan, lvl)
        vmask = plan.grids[lvl].voxel_mask
        c0 = self.n_planes[0]
        # brick-native transitions: down/up convs run in brick space, so
        # recursion stays dense end-to-end (no sparse<->dense per level)
        native = bool(plan.brick_links)
        fold = bool(native and self.fold_max_c and c0 <= self.fold_max_c
                    and (not train or self.fold_train))
        # rematerialize residual blocks during training to trade FLOPs for
        # HBM (jax.checkpoint; reference has no analog — torch keeps all
        # activations and OOM-guards with empty_cache, train.py:49)
        Block = (
            nn.remat(ResidualBlock, static_argnums=(3,))  # `train` flag is static
            if (self.remat and train)
            else ResidualBlock
        )

        x = feats if self.rep_io else ctx.enter(feats)
        cin0 = x.shape[-1]
        if fold:
            x = fold_x(x)
        for i in range(self.block_reps):
            cin = cin0 if i == 0 else c0
            segs = ((cin,) if fold else None)
            x = Block(cin, c0, self.compute_dtype, segs,
                      name=f"block{i}")(x, ctx, train)

        if len(self.n_planes) > 1:
            c1 = self.n_planes[1]
            identity = x
            # down: BN, ReLU, SparseConv3d k2s2
            d = MaskedBatchNorm(c0, fold_segs=(c0,) if fold else None,
                                name="conv_bn")(x, ctx.mask, train)
            d = nn.relu(d)
            if fold:
                d = unfold_x(d, c0)
            wd = self.param(
                "conv_w", nn.initializers.variance_scaling(1.0, "fan_in", "normal"), (8, c0, c1)
            )
            if native:
                d = down_conv_bricks(d, plan.bricks[lvl], plan.brick_links[lvl],
                                     wd, compute_dtype=self.compute_dtype)
            else:
                d = down_conv(ctx.exit(d), plan.links[lvl], wd,
                              compute_dtype=self.compute_dtype)
            d = UBlock(
                self.n_planes[1:],
                self.block_reps,
                self.use_backbone_transformer,
                level=lvl + 1,
                compute_dtype=self.compute_dtype,
                remat=self.remat,
                rep_io=native,
                fold_max_c=self.fold_max_c,
                fold_train=self.fold_train,
                name="u",
            )(d, plan, train)
            # up: BN, ReLU, SparseInverseConv3d k2
            child_mask = (plan.bricks[lvl + 1].occ if native
                          else plan.grids[lvl + 1].voxel_mask)
            u = MaskedBatchNorm(c1, name="deconv_bn")(d, child_mask, train)
            u = nn.relu(u)
            wu = self.param(
                "deconv_w", nn.initializers.variance_scaling(1.0, "fan_in", "normal"), (8, c1, c0)
            )
            if native:
                u = up_conv_bricks(u, plan.brick_links[lvl], wu,
                                   compute_dtype=self.compute_dtype)
                u = jnp.where(ctx.mask[..., None], u, 0.0)
                if fold:
                    u = fold_x(u)
            else:
                u = up_conv(u, plan.links[lvl], wu, compute_dtype=self.compute_dtype)
                u = jnp.where(vmask[..., None], u, 0.0)
                u = ctx.enter(u)

            # folded concat is a plain lane concat: segments (c0, c0) — the
            # banded kernel/BN consume the segmented layout directly
            x = jnp.concatenate([identity, u], axis=-1)
            for i in range(self.block_reps):
                cin = c0 * (2 - i)
                segs = (((c0,) * (2 - i)) if fold else None)
                x = Block(cin, c0, self.compute_dtype, segs,
                          name=f"block_tail{i}")(x, ctx, train)

        if len(self.n_planes) <= 2 and self.use_backbone_transformer:
            d_model = 128
            if fold:
                x = unfold_x(x, c0)
            x = ctx.exit(x)
            xyz = plan.grids[lvl].voxel_coords.astype(jnp.float32)
            h = nn.Dense(d_model, name="before_transformer_linear")(x)
            h = BottleneckTransformer(d_model, name="transformer")(h, xyz, vmask, train)
            x = nn.Dense(c0, name="after_transformer_linear")(h)
            x = jnp.where(vmask[..., None], x, 0.0)
            return ctx.enter(x) if self.rep_io else x

        if fold:
            x = unfold_x(x, c0)
        return x if self.rep_io else ctx.exit(x)


class SparseUNetBackbone(nn.Module):
    """input_conv + UBlock + output_layer + semantic head
    (geoformer.py:42-59,530-549)."""

    m: int
    classes: int
    depth: int = 7
    block_reps: int = 2
    compute_dtype: object = None
    remat: bool = False
    fold_max_c: int = 0  # x-folded levels with c0 <= this (0 = off)
    fold_train: bool = False  # fold during training too (see UBlock)

    @nn.compact
    def __call__(self, voxel_feats, plan: GridPlan, train: bool):
        vmask0 = plan.grids[0].voxel_mask
        w_in = self.param(
            "input_conv",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (27, voxel_feats.shape[-1], self.m),
        )
        planes = [self.m * (i + 1) for i in range(self.depth)]
        if plan.bricks and plan.brick_links:
            # brick-native: scatter to dense bricks ONCE, input conv and the
            # whole U recursion stay dense, gather back once at the end
            bp0 = plan.bricks[0]
            if self.compute_dtype is not None:
                # enter brick space already narrowed: halves the scatter
                # traffic and every level buffer after it
                voxel_feats = voxel_feats.astype(self.compute_dtype)
            xd = to_dense(voxel_feats, bp0)
            xd = dense_subm_conv(xd, bp0, w_in,
                                 compute_dtype=self.compute_dtype)
            xd = jnp.where(bp0.occ[..., None], xd, 0.0)
            xd = UBlock(planes, self.block_reps, True, level=0,
                        compute_dtype=self.compute_dtype, remat=self.remat,
                        rep_io=True, fold_max_c=self.fold_max_c,
                        fold_train=self.fold_train,
                        name="unet")(xd, plan, train)
            x = from_dense(xd, bp0)
        else:
            if plan.bricks:
                nbr0 = plan.bricks[0]
            elif plan.subm_compact:
                nbr0 = plan.subm_compact[0]
            else:
                nbr0 = plan.subm[0]
            x = apply_subm(voxel_feats, nbr0, w_in, compute_dtype=self.compute_dtype)
            x = jnp.where(vmask0[..., None], x, 0.0)
            x = UBlock(planes, self.block_reps, True, level=0,
                       compute_dtype=self.compute_dtype, remat=self.remat,
                       fold_max_c=self.fold_max_c, name="unet")(x, plan, train)

        x = MaskedBatchNorm(self.m, name="output_bn")(x, vmask0, train)
        x = nn.relu(x)
        # exit boundary: downstream heads (semantic, aggregator, decoder)
        # run f32 regardless of the level residency dtype
        return x.astype(jnp.float32)  # [B, V0, m]


class SemanticHead(nn.Module):
    """2x (Dense+BN+ReLU) + Dense->classes (geoformer.py:56-59)."""

    m: int
    classes: int

    @nn.compact
    def __call__(self, point_feats, pmask, train: bool):
        x = nn.Dense(self.m)(point_feats)
        x = MaskedBatchNorm(self.m)(x, pmask, train)
        x = nn.relu(x)
        x = nn.Dense(self.m)(x)
        x = MaskedBatchNorm(self.m)(x, pmask, train)
        x = nn.relu(x)
        return nn.Dense(self.classes)(x)
