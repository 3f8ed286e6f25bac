"""GeoFormer: fully-supervised model (reference model/geoformer/geoformer.py).

All stages run under one jit with static shapes:

  voxelize -> sparse U-Net -> semantic head -> fg packing -> mask tower ->
  set aggregator (random subsample + FPS + ball group) -> kNN + geodesic ->
  Fourier embeddings -> DETR rel-attention decoder -> dynamic-conv mask head
  [-> proposal generation at eval]

Deviation from the reference: the reference seeds the geodesic BFS with FPS
indices *into a randomly permuted subsample* but gathers them against the
unpermuted foreground array (geoformer.py:575-580 feeding
geodesic_utils.py:102), i.e. its seeds are not actually the query points.
We map FPS indices through the subsample so seeds == query points.
"""

from __future__ import annotations

import dataclasses
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from geoformer_tpu.models.aggregator import SetAggregator
from geoformer_tpu.models.blocks import GenericMLP, MLPConvBlock, MaskedBatchNorm
from geoformer_tpu.models.decoder import TransformerDecoder
from geoformer_tpu.models.dynamic_conv import (
    Controller,
    dynamic_param_sizes,
    mask_heads_forward,
    parse_dynamic_params,
)
from geoformer_tpu.models.pos_embedding import PositionEmbeddingCoordsFourier
from geoformer_tpu.models.unet import SemanticHead, SparseUNetBackbone
from geoformer_tpu.ops.sparse_conv import build_grid_plan, plan_stats, voxel_capacities
from geoformer_tpu.ops.voxelize import devoxelize, voxel_mean_pool
from geoformer_tpu.ops.knn import knn
from geoformer_tpu.ops.radius_graph import radius_knn
from geoformer_tpu.ops.geodesic import geodesic_distance, geodesic_distance_hier
from geoformer_tpu.parallel.mesh import maybe_shard


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    m: int = 16
    classes: int = 13
    input_channel: int = 3
    use_coords: bool = True
    train_fold: int = 0
    cvfold: int = 0
    dec_nlayers: int = 4
    dec_dim: int = 64
    dec_ffn_dim: int = 64
    dec_nhead: int = 4
    dec_dropout: float = 0.1
    n_decode_point: int = 2048
    n_query_points: int = 128
    n_downsampling: int = 50000
    spatial: int = 1024
    depth: int = 7
    max_voxels: int = 131072
    voxel_decay: float = 0.5
    max_fg_points: int = 131072
    train_subsample: int = 30000
    knn_neighbors: int = 64
    geodesic_radius: float = 0.05
    radius_cell_cap: int = 24  # keep in sync with utils/config.py
    # radius-graph cell-slot capacity divisor (ops/radius_graph.py): fg
    # points are dense scan surfaces (>= ~3 points per radius cell), so
    # F // 2 cell slots never bind and the per-cell window lookup sort
    # halves; 1 = exact for any input
    radius_cell_div: int = 2
    geodesic_int16: bool = False  # keep in sync with utils/config.py
    geodesic_steps_train: int = 32   # keep in sync with utils/config.py
    geodesic_steps_eval: int = 64    # keep in sync with utils/config.py
    # two-level geodesic solve (ops/geodesic.py:_hier_scene): ~7-10x faster
    # at eval scale, O(cell)-approximate (the reference field is itself a
    # capped first-visit BFS approximation, geodesic_utils.py:91-164)
    geodesic_hier: bool = True
    geodesic_fine_sweeps: int = 2  # keep in sync with utils/config.py
    # fine smoothing runs on the nearest fine_k edge slots only (0 = all):
    # the prod-scale fine-sweep gathers were the single biggest line item
    # (~1.1 s of the 2.5 s forward at 131k fg points, K=64)
    geodesic_fine_k: int = 16
    geodesic_k_sub: int = 8  # keep in sync with utils/config.py
    geodesic_cell_factor: float = 2.0
    geodesic_coarse_eps: float = 0.0  # coarse fixpoint exit slack (meters)
    ball_radius: float = 0.2
    # >0: voxel-hash ball query bounded to the 3^3 cell window (exact up to
    # this many points per radius-cell) instead of brute-force [K,P] tiles.
    # 32 measured the prod aggregator 454.5 -> 357.6 ms (ONCHIP_SUITE_r3)
    ball_cell_cap: int = 32
    # per-cell candidate-window compaction for the radius kNN (0 = full
    # 27*cell_cap width; measured loss on v5e — see utils/config.py)
    knn_window: int = 0
    # per-cell window MATERIALIZATION (no compaction): candidates gathered
    # once per cell, points pick their window up with one wide row-gather.
    # Exact (identical candidate set). keep in sync with utils/config.py
    knn_cellwin: bool = False
    # dense scatter-grid window lookup (0 = compare-count lookup); keep in
    # sync with utils/config.py tpu_knn_dense_grid
    knn_dense_grid: int = 256
    # candidate k-selection: "pallas" | "topk" | "passes" | "approx";
    # keep in sync with utils/config.py tpu_knn_select
    knn_select: str = "pallas"
    ball_nsample: int = 64
    test_score_thresh: float = 0.1  # keep in sync with config TEST_SCORE_THRESH
    test_npoint_thresh: int = 50    # keep in sync with config TEST_NPOINT_THRESH
    similarity_thresh: float = 0.5
    # live-packed subm slot count (27 = exact/off). Surface scans peak ~18
    # live neighbors so 20 would be lossless, but the one-hot weight
    # routing lowers to per-voxel tiny GEMMs and measured slower than the
    # full conv on v5e — default off, kept as an option
    subm_k: int = 27
    # dense-brick subm convs (ops/brick.py): NB = V // brick_occupancy
    # brick slots per level; 0 disables (fall back to gather rulebooks).
    # 32 measured 173 ms / 64 measured 136 ms for the full 65k-point U-Net
    # conv stack on v5e (vs 310 ms rulebook); 32 is the default for its
    # capacity margin (overflow is counted + warned either way)
    brick_occupancy: int = 32
    # bf16 compute in the sparse-conv path (gathers + GEMMs; fp32 accum)
    bf16: bool = False
    # jax.checkpoint residual blocks during training (memory for FLOPs)
    remat: bool = False
    # x-folded brick levels with c0 <= this (0 = off): narrow-channel
    # levels pad 16-lane buffers 8x under XLA (8,128) tiling; folding the
    # brick x axis into lanes tiles exactly (ops/brick.py fold_x).
    # keep in sync with utils/config.py tpu_brick_fold_max_c
    brick_fold_max_c: int = 32
    # fold during training too (default off: the folded prod train step
    # OOMs one v5e; see utils/config.py tpu_brick_fold_train)
    brick_fold_train: bool = False
    # frozen modules (cfg.fix_module): their BN uses running stats, dropout is
    # off, and outputs are stop_gradient'ed (matches requires_grad=False +
    # .eval() + no_grad contexts, geoformer.py:167-184,531,552)
    fix_modules: tuple = ()

    def is_fixed(self, name: str) -> bool:
        return name in self.fix_modules

    def train_for(self, name: str, train: bool) -> bool:
        return train and not self.is_fixed(name)

    @classmethod
    def from_cfg(cls, cfg):
        fix = tuple(cfg.fix_module)
        # the reference splits the backbone into input_conv/unet/output_layer
        # and the semantic head into semantic/semantic_linear; we fold them
        if "unet" in fix:
            fix = fix + ("backbone",)
        if "semantic_linear" in fix or "semantic" in fix:
            fix = fix + ("semantic",)
        return cls(
            fix_modules=fix,
            similarity_thresh=cfg.similarity_thresh,
            m=cfg.m,
            classes=cfg.classes,
            input_channel=cfg.input_channel,
            use_coords=cfg.use_coords,
            train_fold=cfg.train_fold,
            cvfold=cfg.cvfold,
            dec_nlayers=cfg.dec_nlayers,
            dec_dim=cfg.dec_dim,
            dec_ffn_dim=cfg.dec_ffn_dim,
            dec_nhead=cfg.dec_nhead,
            dec_dropout=cfg.dec_dropout,
            n_decode_point=cfg.n_decode_point,
            n_query_points=cfg.n_query_points,
            n_downsampling=cfg.n_downsampling,
            spatial=cfg.tpu_spatial_shape,
            depth=cfg.tpu_unet_depth,
            max_voxels=cfg.tpu_max_voxels,
            voxel_decay=cfg.tpu_voxel_decay,
            max_fg_points=cfg.tpu_max_fg_points,
            train_subsample=cfg.tpu_train_subsample,
            knn_neighbors=cfg.tpu_knn_neighbors,
            radius_cell_cap=cfg.tpu_radius_cell_cap,
            radius_cell_div=cfg.tpu_radius_cell_div,
            geodesic_int16=cfg.tpu_geodesic_int16,
            geodesic_radius=cfg.tpu_geodesic_radius,
            geodesic_steps_train=cfg.tpu_geodesic_steps_train,
            geodesic_steps_eval=cfg.tpu_geodesic_steps_eval,
            geodesic_hier=cfg.tpu_geodesic_hier,
            geodesic_fine_sweeps=cfg.tpu_geodesic_fine_sweeps,
            geodesic_fine_k=cfg.tpu_geodesic_fine_k,
            geodesic_k_sub=cfg.tpu_geodesic_k_sub,
            geodesic_cell_factor=cfg.tpu_geodesic_cell_factor,
            geodesic_coarse_eps=cfg.tpu_geodesic_coarse_eps,
            ball_radius=cfg.tpu_ball_radius,
            ball_nsample=cfg.tpu_ball_nsample,
            ball_cell_cap=cfg.tpu_ball_cell_cap,
            knn_window=cfg.tpu_knn_window,
            knn_cellwin=cfg.tpu_knn_cellwin,
            knn_dense_grid=cfg.tpu_knn_dense_grid,
            knn_select=cfg.tpu_knn_select,
            test_score_thresh=cfg.TEST_SCORE_THRESH,
            test_npoint_thresh=cfg.TEST_NPOINT_THRESH,
            subm_k=cfg.tpu_subm_k,
            brick_occupancy=cfg.tpu_brick_occupancy,
            bf16=cfg.tpu_bf16 or cfg.tpu_compute_dtype == "bfloat16",
            remat=cfg.tpu_remat,
            brick_fold_max_c=cfg.tpu_brick_fold_max_c,
            brick_fold_train=cfg.tpu_brick_fold_train,
        )


def _shard_solve(solve, seeds, seed_mask, fg_valid, fg_locs):
    """Run the geodesic solver under shard_map over the ambient mesh.

    Scenes split over the "data" axis, seed columns over "model"; the
    radius graph is built inside (replicated within a model group — cheaper
    than the all-gather SPMD inserts around its un-partitionable top_k).
    No-op (plain call) when the mesh is absent or shapes don't divide."""
    from jax.sharding import PartitionSpec as P

    mesh = jax.sharding.get_abstract_mesh()
    axes = tuple(getattr(mesh, "axis_names", ()) or ())
    b, q = seeds.shape
    use_dp = "data" in axes and mesh.shape["data"] > 1 and b % mesh.shape["data"] == 0
    use_mp = "model" in axes and mesh.shape["model"] > 1 and q % mesh.shape["model"] == 0
    if not (use_dp or use_mp):
        return solve(seeds, seed_mask, fg_valid, fg_locs)
    d = "data" if use_dp else None
    m = "model" if use_mp else None
    return jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(P(d, m), P(d, m), P(d), P(d)),
        # (geo table, per-scene graph-overflow count — replicated within a
        # model group: the graph build runs per model-shard on full scenes)
        out_specs=(P(d, None, m), P(d), P(d)),
        # the solver body is collective-free (columns independent); the vma
        # tracker otherwise demands pcasts on every while_loop carry
        check_vma=False,
    )(seeds, seed_mask, fg_valid, fg_locs)


def pack_by_mask(mask: jax.Array, capacity: int):
    """Pack valid entries to the front (stable). [P] -> (idx [cap], valid [cap])."""
    order = jnp.argsort(~mask)  # False (valid) sorts first, stable in index order
    idx = order[:capacity].astype(jnp.int32)
    return idx, mask[idx]


def random_pack_by_mask(mask: jax.Array, capacity: int, rng: jax.Array):
    """Random subsample of valid entries (np.random.choice replace=False
    semantics, geoformer.py:575-580 / geoformer_modules.py:165-186).
    Training path; eval uses strided_pack_by_mask (deterministic).

    The call site passes a PACKED prefix mask (fg_valid from
    foreground_pack), so when capacity covers the whole array the
    subsample set is the identity and the sort-based shuffle reduces to a
    random rotation of the valid prefix — downstream FPS still starts at
    a random foreground point, without a device sort (~4 ms amortized).
    (With a non-prefix mask this path still returns correct validity
    flags, just without packing.)"""
    p = mask.shape[0]
    if capacity >= p:
        # capacity clamps to p like the original order[:capacity] slice
        n_valid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
        r = jax.random.randint(rng, (), 0, n_valid)
        pos = jnp.arange(p, dtype=jnp.int32)
        idx = jnp.where(pos < n_valid, (pos + r) % n_valid, pos)
        return idx, mask[idx]
    scores = jnp.where(mask, jax.random.uniform(rng, mask.shape), 2.0)
    order = jnp.argsort(scores)
    idx = order[:capacity].astype(jnp.int32)
    return idx, mask[idx]


def strided_pack_by_mask(mask: jax.Array, capacity: int):
    """Deterministic uniform subsample of a PACKED prefix mask: when the
    n valid entries exceed `capacity`, take every (n/capacity)-th one
    (systematic sampling — uniform coverage of the prefix order); when
    they fit, the identity prefix (matching pack_by_mask exactly, which
    the full-model golden-parity test relies on). [P] -> (idx [cap],
    valid [cap]). No sort: positions are pure index arithmetic.
    """
    n = jnp.sum(mask.astype(jnp.int32))
    i = jnp.arange(capacity, dtype=jnp.int32)
    # f32 step: n <= ~2^18 and capacity >= 1 keep i*step < 2^24 (exact
    # int range), so floor() indices are monotone non-repeating when n>cap
    step = n.astype(jnp.float32) / jnp.float32(capacity)
    strided = jnp.floor(i.astype(jnp.float32) * step).astype(jnp.int32)
    idx = jnp.where(n > capacity, jnp.clip(strided, 0, jnp.maximum(n - 1, 0)), i)
    idx = jnp.minimum(idx, mask.shape[0] - 1)
    return idx, i < jnp.minimum(n, capacity)


def gather_scene(arr, idx):
    """arr [P, ...] gather rows -> [len(idx), ...]."""
    return arr[idx]


class GeoFormerBase(nn.Module):
    """Shared submodules + stages for supervised and few-shot variants."""

    mc: ModelConfig

    def setup(self):
        mc = self.mc
        self.backbone = SparseUNetBackbone(
            mc.m, mc.classes, mc.depth,
            compute_dtype=jnp.bfloat16 if mc.bf16 else None,
            remat=mc.remat, fold_max_c=mc.brick_fold_max_c,
            fold_train=mc.brick_fold_train,
            name="backbone",
        )
        self.semantic = SemanticHead(mc.m, mc.classes, name="semantic")
        self.mask_tower = [
            MLPConvBlock(mc.m, name=f"mask_tower{i}") for i in range(3)
        ]
        self.mask_out = nn.Dense(mc.m, name="mask_out")
        agg_dim = 2 * mc.m
        self.set_aggregator = SetAggregator(
            mlp_dims=(agg_dim, agg_dim, agg_dim),
            radius=mc.ball_radius,
            nsample=mc.ball_nsample,
            ball_cell_cap=mc.ball_cell_cap,
            name="set_aggregator",
        )
        self.pos_embedding = PositionEmbeddingCoordsFourier(d_pos=mc.dec_dim, name="pos_embedding")
        self.query_projection = GenericMLP(
            hidden_dims=(mc.dec_dim,),
            output_dim=mc.dec_dim,
            hidden_use_bias=True,
            output_use_activation=True,
            name="query_projection",
        )
        self.decoder = TransformerDecoder(
            num_layers=mc.dec_nlayers,
            d_model=mc.dec_dim,
            nhead=mc.dec_nhead,
            dim_feedforward=mc.dec_ffn_dim,
            dropout=mc.dec_dropout,
            name="decoder",
        )
        _, _, num_gen = dynamic_param_sizes(mc.m, use_coords=True)
        self.controller = Controller(mc.m, num_gen, name="controller_head")

    # ---------------- backbone ----------------

    def forward_backbone(self, batch, train: bool):
        mc = self.mc
        caps = voxel_capacities(mc.max_voxels, mc.depth, mc.voxel_decay)
        plan = build_grid_plan(
            batch["coords"], batch["point_mask"], mc.spatial, mc.depth, caps,
            subm_k=mc.subm_k if mc.subm_k < 27 else None,
            brick_occupancy=mc.brick_occupancy or None,
        )
        feats = batch["feats"]
        if mc.use_coords:
            feats = jnp.concatenate([feats, batch["points"]], axis=-1)
        voxel_feats = voxel_mean_pool(feats, plan.grids[0])
        voxel_out = self.backbone(voxel_feats, plan, mc.train_for("backbone", train))
        point_feats = devoxelize(voxel_out, plan.grids[0])
        if mc.is_fixed("backbone"):
            point_feats = jax.lax.stop_gradient(point_feats)
        semantic_scores = self.semantic(
            point_feats, batch["point_mask"], mc.train_for("semantic", train)
        )
        if mc.is_fixed("semantic"):
            semantic_scores = jax.lax.stop_gradient(semantic_scores)
        semantic_preds = jnp.argmax(semantic_scores, axis=-1)
        semantic_preds = jnp.where(batch["point_mask"], semantic_preds, -1)
        return point_feats, semantic_scores, semantic_preds, plan_stats(plan)

    def foreground_pack(self, semantic_preds, point_mask):
        mc = self.mc
        if mc.train_fold == mc.cvfold:
            fg_cond = semantic_preds >= 4
        else:
            fg_cond = semantic_preds == 3
        fg_cond = fg_cond & point_mask
        return jax.vmap(lambda m: pack_by_mask(m, mc.max_fg_points))(fg_cond)

    def run_mask_tower(self, fg_feats, fg_valid, train: bool):
        train = self.mc.train_for("mask_tower", train)
        x = fg_feats
        for blk in self.mask_tower:
            x = blk(x, fg_valid, train)
        x = self.mask_out(x)
        return jax.lax.stop_gradient(x) if self.mc.is_fixed("mask_tower") else x

    # ---------------- aggregator ----------------

    def forward_aggregator(self, fg_locs, fg_feats, fg_valid, train: bool):
        """Random-subsample fg -> FPS K centers -> ball group -> SharedMLP.

        Returns context_locs [B,K,3], context_feats [B,K,2m],
        context_inds [B,K] (into the fg arrays), context_valid [B,K].
        """
        mc = self.mc
        train = mc.train_for("set_aggregator", train)
        if train:
            rng = self.make_rng("sample")
            keys = jax.random.split(rng, fg_locs.shape[0])
            sub_idx, sub_valid = jax.vmap(
                lambda m, k: random_pack_by_mask(m, mc.n_downsampling, k)
            )(fg_valid, keys)
        else:
            # DOCUMENTED DEVIATION: the reference permutes the foreground
            # with an *unseeded* np.random.choice even at eval
            # (geoformer.py:575-580), so its eval FPS start — and therefore
            # its query set and AP — varies run to run. Eval here is
            # deterministic: a STRIDED take over the packed fg prefix —
            # identity whenever fg fits n_downsampling (FPS from fg[0],
            # same contract the reference has on any single run), and a
            # uniform systematic sample when it doesn't (a plain prefix
            # take would keep one spatially coherent region of the raw
            # scan vertex order and starve the rest of query coverage).
            sub_idx, sub_valid = jax.vmap(
                lambda m: strided_pack_by_mask(m, mc.n_downsampling)
            )(fg_valid)
        sub_locs = jax.vmap(gather_scene)(fg_locs, sub_idx)
        sub_feats = jax.vmap(gather_scene)(fg_feats, sub_idx)

        # FPS + ball grouping under a data-axis shard_map: their top_k /
        # while bodies are un-partitionable and SPMD would all-gather the
        # whole batch around them on a multi-device mesh
        from geoformer_tpu.parallel.mesh import shard_map_data

        new_xyz, grouped, _, inds, inds_valid, hit = shard_map_data(
            lambda pl, pf, pv: self.set_aggregator.group(pl, pf, pv, mc.n_decode_point),
            sub_locs, sub_feats, sub_valid,
        )
        # reference BN statistics run over all 64 slots (pads are duplicated
        # first hits), so the group mask is just "center has any hit"
        center_ok = jnp.any(hit, axis=-1) & inds_valid
        group_mask = jnp.broadcast_to(center_ok[..., None], grouped.shape[:-1])
        context_feats = self.set_aggregator(grouped, group_mask, train, pooling="max")
        if mc.is_fixed("set_aggregator"):
            context_feats = jax.lax.stop_gradient(context_feats)
        context_inds = jnp.take_along_axis(sub_idx, inds, axis=1)  # back into fg indexing
        return new_xyz, context_feats, context_inds, inds_valid

    # ---------------- geodesic ----------------

    def forward_geodesic(self, fg_locs, fg_valid, context_inds, context_valid, train: bool):
        mc = self.mc
        q = mc.n_query_points
        seeds = context_inds[:, :q]
        seed_mask = context_valid[:, :q]
        steps = mc.geodesic_steps_train if train else mc.geodesic_steps_eval

        def solve(seeds, seed_mask, fg_valid, fg_locs):
            # K nearest within the geodesic radius via a voxel hash — the
            # radius gate makes brute-force kNN (reference FAISS) wasteful;
            # see ops/radius_graph.py. Out-of-radius slots carry 1e30 and
            # die at the geodesic's own gate. Built INSIDE the shard_map:
            # its top_k is un-partitionable inside the per-scene vmap and
            # would otherwise be all-gathered across the data axis.
            # hier mode only ever reads the nearest max(fine_k, k_sub=16)
            # edge slots (contraction takes k_sub, fine sweeps take fine_k;
            # ops/geodesic.py:_hier_scene) and radius_knn packs ascending,
            # so building a narrower table is bit-identical — and the top_k
            # over the 27*cell_cap candidate window is ~4x cheaper at k=16
            # than at the reference-parity k=64 (FAISS 64-NN analog, used
            # in full only by the exact solver)
            k_graph = mc.knn_neighbors
            if mc.geodesic_hier and mc.geodesic_fine_k:
                # hier mode only ever reads the nearest max(fine_k, k_sub)
                # edge slots, and radius_knn packs ascending — narrower is
                # bit-identical downstream
                k_graph = min(k_graph, max(mc.geodesic_fine_k, mc.geodesic_k_sub))
            d2, nbr_i, graph_ovf, graph_wovf = radius_knn(
                fg_locs, fg_valid, mc.geodesic_radius, k_graph,
                cell_cap=mc.radius_cell_cap,
                cell_div=mc.radius_cell_div,
                window=mc.knn_window,
                cellwin=mc.knn_cellwin,
                dense_grid=mc.knn_dense_grid,
                select=mc.knn_select,
                with_stats=True,  # cell-capacity drops surface, never silent
            )
            nbr_d = jnp.sqrt(jnp.maximum(jnp.minimum(d2, 4.0), 0.0))
            if mc.geodesic_hier:
                # two-level solve: coarse cell-graph fixpoint + fixed fine
                # sweeps — the production path (exact sweeps need ~100
                # passes over the [F,K] edge table at room scale)
                return geodesic_distance_hier(
                    nbr_i, nbr_d, seeds, seed_mask, fg_valid, mc.geodesic_radius,
                    steps, fg_locs, fine_sweeps=mc.geodesic_fine_sweeps,
                    cell_factor=mc.geodesic_cell_factor,
                    k_sub=mc.geodesic_k_sub,
                    fine_k=mc.geodesic_fine_k or None,
                    coarse_eps=mc.geodesic_coarse_eps,
                ), graph_ovf, graph_wovf  # [B, F, Q], [B], [B]
            # symmetrize=False: the radius-kNN graph is symmetric up to the
            # K cap, so the reverse-edge table would double relaxation
            # traffic for near-zero effect
            return geodesic_distance(
                nbr_i, nbr_d, seeds, seed_mask, fg_valid, mc.geodesic_radius, steps,
                symmetrize=False, positions=fg_locs,  # spatial sweep ordering
                relax_dtype=jnp.int16 if mc.geodesic_int16 else None,
            ), graph_ovf, graph_wovf  # [B, F, Q], [B], [B]

        # the [B,F,Q] table is the forward's biggest tensor, the solve its
        # most serial stage, and every distance column is independent: run
        # the solver UNDER shard_map so the scene axis splits over "data"
        # and the seed/query axis over "model" — each device relaxes only
        # its own [F, Q/mp] table for its own scenes, instead of the
        # per-scene lax.map running replicated and the table being
        # all-gathered afterwards. Falls back to the unsharded solve on
        # single-axis / indivisible meshes.
        geo, graph_ovf, graph_wovf = _shard_solve(
            solve, seeds, seed_mask, fg_valid, fg_locs
        )
        return maybe_shard(geo, "data", None, "model"), graph_ovf, graph_wovf

    # ---------------- decoder ----------------

    def _pos_range(self, pc_mins, pc_maxs):
        """REFERENCE QUIRK, kept for checkpoint parity: the supervised
        reference builds pc_dims = [pc_maxs, pc_mins]
        (geoformer.py:412-415) and passes it as shift_scale_points'
        [min, max] src_range, so every positional embedding is normalized
        FLIPPED: (max-x)/(max-min). The few-shot model passes the correct
        [pc_mins, pc_maxs] (geoformer_fs.py:433-436) and overrides this.
        Released checkpoints are trained with the respective conventions;
        pinned by tests/test_full_model_golden_parity.py (which caught it).
        """
        return pc_maxs, pc_mins

    def rel_pos_tensor(self, query_locs, context_locs, geo_dist, context_inds, pc_mins, pc_maxs):
        """Build the geodesic-guided relative position embedding
        (geoformer.py:618-651). geo_dist [B,F,Q] -> embeds [B,Q,K,dec_dim]."""
        b, k, _ = context_locs.shape
        q = query_locs.shape[1]
        rel = jnp.abs(query_locs[:, :, None, :] - context_locs[:, None, :, :])  # [B,Q,K,3]
        geo_ctx = jax.vmap(lambda g, ci: g[ci])(geo_dist, context_inds)  # [B,K,Q]
        geo_ctx = jnp.swapaxes(geo_ctx, 1, 2)  # [B,Q,K]
        max_geo = jnp.max(geo_ctx, axis=2)  # [B,Q]
        global_max = jnp.max(max_geo)
        max_geo = jnp.where(max_geo < 0, global_max, max_geo)
        geo3 = jnp.repeat(geo_ctx[..., None], 3, axis=-1)
        fallback = max_geo[:, :, None, None] + rel
        geo3 = jnp.where(geo3 < 0, fallback, geo3)
        ra, rb = self._pos_range(pc_mins, pc_maxs)
        emb = self.pos_embedding(geo3.reshape(b, q * k, 3), ra, rb)
        return emb.reshape(b, q, k, -1)

    def run_decoder(
        self, enc2dec, context_locs, context_feats, context_valid, geo_dist, context_inds,
        pc_mins, pc_maxs, train: bool,
    ):
        mc = self.mc
        q = mc.n_query_points
        ctx_feats = enc2dec(
            context_feats, context_valid, mc.train_for("encoder_to_decoder_projection", train)
        )  # [B,K,dec_dim]
        if mc.is_fixed("encoder_to_decoder_projection"):
            ctx_feats = jax.lax.stop_gradient(ctx_feats)
        query_locs = context_locs[:, :q]
        query_valid = context_valid[:, :q]

        ra, rb = self._pos_range(pc_mins, pc_maxs)
        query_pos = self.pos_embedding(query_locs, ra, rb)
        query_pos = self.query_projection(
            query_pos, query_valid, mc.train_for("query_projection", train)
        )
        dec_inputs = ctx_feats[:, :q]

        rel_pos = self.rel_pos_tensor(
            query_locs, context_locs, geo_dist, context_inds, pc_mins, pc_maxs
        )
        # under a ("data","model") mesh, queries shard over "model": rel-pos
        # cross-attention and everything downstream is query-parallel
        rel_pos = maybe_shard(rel_pos, "data", "model", None, None)
        dec_inputs = maybe_shard(dec_inputs, "data", "model", None)
        dec_outputs = self.decoder(
            dec_inputs, ctx_feats, query_pos, rel_pos, query_valid, context_valid,
            mc.train_for("decoder", train),
        )  # [L,B,Q,d]
        dec_outputs = maybe_shard(dec_outputs, None, "data", "model", None)
        if mc.is_fixed("decoder"):
            dec_outputs = jax.lax.stop_gradient(dec_outputs)
        return dec_outputs, query_locs, query_valid

    # ---------------- mask head ----------------

    def get_mask_prediction(
        self, sem_head, dec_outputs, geo_dist, mask_feats, fg_locs, fg_valid, query_locs,
        query_valid, train: bool,
    ):
        """Per decoder layer: cls logits + dynamic-conv mask logits.

        Returns cls_logits [L,B,Q,classes] (or None), mask_logits [L,B,Q,F].
        """
        mc = self.mc
        n_layers = dec_outputs.shape[0]
        cls_list, mask_list = [], []
        for l in range(n_layers):
            x = dec_outputs[l]  # [B,Q,d]
            cls_logits = sem_head(x, query_valid, train) if sem_head is not None else None
            params = self.controller(x, query_valid, mc.train_for("controller", train))
            if mc.is_fixed("controller"):
                params = jax.lax.stop_gradient(params)
            w1, b1, w2, b2 = parse_dynamic_params(params, mc.m, use_coords=True)
            w1 = maybe_shard(w1, "data", "model", None, None)
            mh = functools.partial(
                mask_heads_forward,
                compute_dtype=jnp.bfloat16 if mc.bf16 else None,
            )
            mask_logits = jax.vmap(mh)(
                geo_dist, mask_feats, w1, b1, w2, b2, fg_locs, query_locs
            )  # [B,Q,F]
            mask_logits = maybe_shard(mask_logits, "data", "model", None)
            mask_logits = jnp.where(fg_valid[:, None, :], mask_logits, -1e4)
            cls_list.append(cls_logits)
            mask_list.append(mask_logits)
        cls_out = jnp.stack(cls_list) if cls_list[0] is not None else None
        return cls_out, jnp.stack(mask_list)


class GeoFormer(GeoFormerBase):
    """Fully-supervised GeoFormer (geoformer.py:23-662)."""

    def setup(self):
        super().setup()
        mc = self.mc
        self.encoder_to_decoder_projection = GenericMLP(
            hidden_dims=(2 * mc.m,),
            output_dim=mc.dec_dim,
            norm="bn",
            output_use_activation=True,
            output_use_norm=True,
            output_use_bias=False,
            name="encoder_to_decoder_projection",
        )
        self.detr_sem_head = GenericMLP(
            hidden_dims=(mc.dec_dim, mc.dec_dim),
            output_dim=mc.classes,
            norm="bn",
            name="detr_sem_head",
        )

    def __call__(self, batch, train: bool = True, semantic_only: bool = False):
        mc = self.mc
        outputs = {}
        point_feats, semantic_scores, semantic_preds, vox_stats = self.forward_backbone(
            batch, train
        )
        outputs["semantic_scores"] = semantic_scores
        outputs["voxel_stats"] = vox_stats
        if semantic_only:
            return outputs

        fg_idx, fg_valid = self.foreground_pack(semantic_preds, batch["point_mask"])
        fg_locs = jax.vmap(gather_scene)(batch["points"], fg_idx)
        fg_feats = jax.vmap(gather_scene)(point_feats, fg_idx)
        outputs["fg_idx"], outputs["fg_valid"] = fg_idx, fg_valid

        mask_feats = self.run_mask_tower(fg_feats, fg_valid, train)

        context_locs, context_feats, context_inds, context_valid = self.forward_aggregator(
            fg_locs, fg_feats, fg_valid, train
        )
        geo_dist, graph_ovf, graph_wovf = self.forward_geodesic(
            fg_locs, fg_valid, context_inds, context_valid, train
        )
        outputs["voxel_stats"] = dict(
            outputs["voxel_stats"], n_radius_cell_overflow=graph_ovf,
            n_radius_window_overflow=graph_wovf,
        )

        dec_outputs, query_locs, query_valid = self.run_decoder(
            self.encoder_to_decoder_projection,
            context_locs, context_feats, context_valid, geo_dist, context_inds,
            batch["pc_mins"], batch["pc_maxs"], train,
        )
        outputs["query_valid"] = query_valid

        if train:
            rng = self.make_rng("sample")
            keys = jax.random.split(rng, fg_locs.shape[0])
            sub_idx, sub_valid = jax.vmap(
                lambda m, k: random_pack_by_mask(m, mc.train_subsample, k)
            )(fg_valid, keys)
            mask_feats_s = jax.vmap(gather_scene)(mask_feats, sub_idx)
            fg_locs_s = jax.vmap(gather_scene)(fg_locs, sub_idx)
            geo_s = jax.vmap(gather_scene)(geo_dist, sub_idx)
            fg_idx_s = jnp.take_along_axis(fg_idx, sub_idx, axis=1)
            outputs["fg_idx"], outputs["fg_valid"] = fg_idx_s, sub_valid
            cls_logits, mask_logits = self.get_mask_prediction(
                self.detr_sem_head, dec_outputs, geo_s, mask_feats_s, fg_locs_s, sub_valid,
                query_locs, query_valid, train,
            )
        else:
            dec_outputs = dec_outputs[-1:]
            cls_logits, mask_logits = self.get_mask_prediction(
                self.detr_sem_head, dec_outputs, geo_dist, mask_feats, fg_locs, fg_valid,
                query_locs, query_valid, train,
            )

        outputs["cls_logits"] = cls_logits  # [L,B,Q,classes]
        outputs["mask_logits"] = mask_logits  # [L,B,Q,F]

        if not train:
            sem_fg = jax.vmap(gather_scene)(jax.nn.softmax(semantic_scores, -1), fg_idx)
            outputs["proposals"] = generate_proposal(
                mask_logits[-1], cls_logits[-1], fg_idx, fg_valid, sem_fg,
                batch["point_mask"],
                logit_thresh=0.5,
                score_thresh=mc.test_score_thresh,
                npoint_thresh=mc.test_npoint_thresh,
            )
        return outputs


def generate_proposal(
    mask_logits, cls_logits, fg_idx, fg_valid, sem_scores_fg, point_mask,
    logit_thresh=0.5, score_thresh=0.5, npoint_thresh=100,
):
    """Static-shape proposal generation (geoformer.py:193-262).

    mask_logits [B,Q,F], cls_logits [B,Q,classes]. Returns a dict of
    per-query proposals scattered to full point resolution with a validity
    flag instead of the reference's dynamic filtering.
    """
    p = point_mask.shape[1]

    def scene(ml, cl, fidx, fval, sem):
        probs = jax.nn.sigmoid(ml)  # [Q,F]
        cls_prob = jax.nn.softmax(cl, -1)
        cls_pred = jnp.argmax(cl, -1)  # [Q]
        mask_bool = (probs >= logit_thresh) & fval[None, :]
        npoints = jnp.sum(mask_bool, axis=1)
        mask_scores = jnp.sum(probs * mask_bool, axis=1) / (npoints + 1e-6)
        cls_scores = jnp.take_along_axis(cls_prob, cls_pred[:, None], axis=1)[:, 0]
        sem_q = jnp.einsum("qf,fc->qc", mask_bool.astype(sem.dtype), sem) / (
            npoints[:, None] + 1e-6
        )
        sem_scores_q = jnp.take_along_axis(sem_q, cls_pred[:, None], axis=1)[:, 0]
        scores = mask_scores * jnp.sqrt(cls_scores) * sem_scores_q
        keep = (cls_pred >= 4) & (npoints >= npoint_thresh) & (mask_scores >= score_thresh)
        full = jnp.zeros((ml.shape[0], p + 1), bool).at[:, fidx].set(
            mask_bool, unique_indices=True, mode="promise_in_bounds"
        )[:, :p]
        return {
            "masks": full,  # [Q, P] bool
            "scores": scores,
            "classes": cls_pred,
            "keep": keep,
        }

    return jax.vmap(scene)(mask_logits, cls_logits, fg_idx, fg_valid, sem_scores_fg)
