"""GeoFormerFS: episodic few-shot model (reference geoformer_fs.py:21-793).

Adds to the supervised model:
  * process_support: backbone over the support scene, masked aggregation
    (npoint=32, avg pooling), mean -> a 2m support embedding
    (geoformer_fs.py:377-422)
  * support/query fusion: aggregation tensor [ctx*sup, ctx-sup, ctx]
    (geoformer_fs.py:532-538)
  * similarity_net scoring the first Q contexts (geoformer_fs.py:151-159,572)
  * no classification head; proposals gated by similarity instead
    (geoformer_fs.py:191-239)

The eval-time `remember` scene cache (geoformer_fs.py:439-527) maps to the
split methods `encode_scene` (cacheable, support-independent) and
`decode_with_support` (cheap per support embedding) — the test driver caches
the former across classes x runs.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from geoformer_tpu.models.blocks import GenericMLP, MaskedBatchNorm
from geoformer_tpu.models.geoformer import (
    GeoFormerBase,
    gather_scene,
    random_pack_by_mask,
)


class SimilarityNet(nn.Module):
    """MLP(6m -> 6m BN ReLU -> 6m BN ReLU -> 1) (geoformer_fs.py:151-159)."""

    dim: int

    @nn.compact
    def __call__(self, x, mask, train: bool):
        h = nn.Dense(self.dim)(x)
        h = MaskedBatchNorm(self.dim)(h, mask, train)
        h = nn.relu(h)
        h = nn.Dense(self.dim)(h)
        h = MaskedBatchNorm(self.dim)(h, mask, train)
        h = nn.relu(h)
        return nn.Dense(1)(h)[..., 0]


class GeoFormerFS(GeoFormerBase):
    """Few-shot GeoFormer."""

    def _pos_range(self, pc_mins, pc_maxs):
        # the FS reference passes the CORRECT [pc_mins, pc_maxs] range
        # (geoformer_fs.py:433-436) — unlike the supervised model's flipped
        # pc_dims quirk (see GeoFormerBase._pos_range)
        return pc_mins, pc_maxs

    def setup(self):
        super().setup()
        mc = self.mc
        agg_dim = 2 * mc.m
        self.encoder_to_decoder_projection = GenericMLP(
            hidden_dims=(3 * agg_dim,),
            output_dim=mc.dec_dim,
            norm="bn",
            output_use_activation=True,
            output_use_norm=True,
            output_use_bias=False,
            name="encoder_to_decoder_projection",
        )
        self.similarity_net = SimilarityNet(3 * agg_dim, name="similarity_net")

    # ---------------- support ----------------

    def process_support(self, support_batch, train: bool = False):
        """Support scene -> [B, 2m] embedding. Always no-grad in the
        reference (geoformer_fs.py:436 torch.no_grad)."""
        point_feats, _, _, _ = self.forward_backbone(support_batch, train=False)
        sup_mask = (support_batch["support_masks"] > 0) & support_batch["point_mask"]

        # per-scene masked aggregation with npoint=32, avg pooling
        from geoformer_tpu.models.geoformer import pack_by_mask

        idx, valid = jax.vmap(lambda m: pack_by_mask(m, min(4096, point_feats.shape[1])))(
            sup_mask
        )
        locs = jax.vmap(gather_scene)(support_batch["points"], idx)
        feats = jax.vmap(gather_scene)(point_feats, idx)

        _, grouped, _, _, inds_valid, hit = self.set_aggregator.group(locs, feats, valid, 32)
        center_ok = jnp.any(hit, axis=-1) & inds_valid
        group_mask = jnp.broadcast_to(center_ok[..., None], grouped.shape[:-1])
        ctx = self.set_aggregator(grouped, group_mask, False, pooling="avg")  # [B,32,2m]
        m = center_ok.astype(ctx.dtype)[..., None]
        emb = jnp.sum(ctx * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        return jax.lax.stop_gradient(emb)  # [B, 2m]

    # ---------------- scene encoding (cacheable) ----------------

    def encode_scene(self, scene_batch, train: bool):
        point_feats, semantic_scores, semantic_preds, vox_stats = self.forward_backbone(
            scene_batch, train
        )
        fg_idx, fg_valid = self.foreground_pack(semantic_preds, scene_batch["point_mask"])
        fg_locs = jax.vmap(gather_scene)(scene_batch["points"], fg_idx)
        fg_feats = jax.vmap(gather_scene)(point_feats, fg_idx)
        mask_feats = self.run_mask_tower(fg_feats, fg_valid, train)
        context_locs, context_feats, context_inds, context_valid = self.forward_aggregator(
            fg_locs, fg_feats, fg_valid, train
        )
        geo_dist, graph_ovf, graph_wovf = self.forward_geodesic(
            fg_locs, fg_valid, context_inds, context_valid, train
        )
        return {
            "semantic_scores": semantic_scores,
            "voxel_stats": dict(vox_stats, n_radius_cell_overflow=graph_ovf,
                                n_radius_window_overflow=graph_wovf),
            "fg_idx": fg_idx,
            "fg_valid": fg_valid,
            "fg_locs": fg_locs,
            "mask_feats": mask_feats,
            "context_locs": context_locs,
            "context_feats": context_feats,
            "context_inds": context_inds,
            "context_valid": context_valid,
            "geo_dist": geo_dist,
        }

    # ---------------- fused decode ----------------

    def decode_with_support(self, cache, support_embeddings, pc_mins, pc_maxs, train: bool):
        mc = self.mc
        ctx = cache["context_feats"]  # [B,K,2m]
        sup = support_embeddings[:, None, :]  # [B,1,2m]
        aggregation = jnp.concatenate([ctx * sup, ctx - sup, ctx], axis=-1)  # [B,K,6m]

        dec_outputs, query_locs, query_valid = self.run_decoder(
            self.encoder_to_decoder_projection,
            cache["context_locs"], aggregation, cache["context_valid"],
            cache["geo_dist"], cache["context_inds"], pc_mins, pc_maxs, train,
        )

        sim_train = mc.train_for("similarity_net", train)
        similarity = self.similarity_net(
            aggregation[:, : mc.n_query_points], query_valid, sim_train
        )  # [B,Q] logits
        if mc.is_fixed("similarity_net"):
            similarity = jax.lax.stop_gradient(similarity)

        fg_idx, fg_valid = cache["fg_idx"], cache["fg_valid"]
        mask_feats, fg_locs, geo_dist = cache["mask_feats"], cache["fg_locs"], cache["geo_dist"]

        if train:
            rng = self.make_rng("sample")
            keys = jax.random.split(rng, fg_locs.shape[0])
            sub_idx, sub_valid = jax.vmap(
                lambda m, k: random_pack_by_mask(m, mc.train_subsample, k)
            )(fg_valid, keys)
            mask_feats = jax.vmap(gather_scene)(mask_feats, sub_idx)
            fg_locs = jax.vmap(gather_scene)(fg_locs, sub_idx)
            geo_dist = jax.vmap(gather_scene)(geo_dist, sub_idx)
            fg_idx = jnp.take_along_axis(fg_idx, sub_idx, axis=1)
            fg_valid = sub_valid
        else:
            dec_outputs = dec_outputs[-1:]

        _, mask_logits = self.get_mask_prediction(
            None, dec_outputs, geo_dist, mask_feats, fg_locs, fg_valid,
            query_locs, query_valid, train,
        )
        return {
            "mask_logits": mask_logits,  # [L,B,Q,F]
            "similarity": similarity,
            "fg_idx": fg_idx,
            "fg_valid": fg_valid,
            "query_valid": query_valid,
        }

    def __call__(self, support_batch, scene_batch, train: bool = True, support_embeddings=None):
        outputs = {}
        cache = self.encode_scene(scene_batch, train)
        outputs["semantic_scores"] = cache["semantic_scores"]
        outputs["voxel_stats"] = cache["voxel_stats"]
        if support_embeddings is None:
            support_embeddings = self.process_support(support_batch, train)
        dec = self.decode_with_support(
            cache, support_embeddings, scene_batch["pc_mins"], scene_batch["pc_maxs"], train
        )
        outputs.update(dec)
        if not train:
            outputs["proposals"] = generate_fs_proposal(
                dec["mask_logits"][-1],
                jax.nn.sigmoid(dec["similarity"]),
                dec["fg_idx"], dec["fg_valid"], scene_batch["point_mask"],
                logit_thresh=0.2,
                score_thresh=self.mc.test_score_thresh,
                npoint_thresh=self.mc.test_npoint_thresh,
                sim_score_thresh=self.mc.similarity_thresh,
            )
        return outputs


def generate_fs_proposal(
    mask_logits, similarity, fg_idx, fg_valid, point_mask,
    logit_thresh=0.2, score_thresh=0.5, npoint_thresh=100, sim_score_thresh=0.5,
):
    """FS proposal generation (geoformer_fs.py:191-239): mask threshold 0.2,
    score = mask_score * sqrt(similarity), gate on similarity."""
    p = point_mask.shape[1]

    def scene(ml, sim, fidx, fval):
        probs = jax.nn.sigmoid(ml)
        mask_bool = (probs >= logit_thresh) & fval[None, :]
        npoints = jnp.sum(mask_bool, axis=1)
        mask_scores = jnp.sum(probs * mask_bool, axis=1) / (npoints + 1e-6)
        scores = mask_scores * jnp.sqrt(jnp.maximum(sim, 0.0))
        keep = (sim >= sim_score_thresh) & (npoints >= npoint_thresh) & (
            mask_scores >= score_thresh
        )
        full = jnp.zeros((ml.shape[0], p + 1), bool).at[:, fidx].set(
            mask_bool, unique_indices=True, mode="promise_in_bounds"
        )[:, :p]
        return {"masks": full, "scores": scores, "keep": keep}

    return jax.vmap(scene)(mask_logits, similarity, fg_idx, fg_valid)
