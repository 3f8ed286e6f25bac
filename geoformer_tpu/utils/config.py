"""Flat YAML config, mirroring the reference's schema.

The reference (util/config.py:11-40) flattens YAML sections
(GENERAL/META/DETR/DATA/STRUCTURE/TRAIN/TEST) onto one argparse namespace
singleton. We keep the same YAML schema so reference configs load unchanged,
but use an explicit immutable-ish Config object instead of an import-time
singleton, plus a TPU section for static-shape capacities.
"""

from __future__ import annotations

import argparse
import copy
from types import SimpleNamespace

import yaml

# Defaults cover every knob the reference configs set, plus TPU capacities.
_DEFAULTS = dict(
    # GENERAL
    task="train",
    manual_seed=123,
    # META
    train_fold=0,
    cvfold=0,
    k_shot=1,
    similarity_thresh=0.5,
    fix_support=False,
    negative_ratio=2,
    run_num=10,
    type_support="fullscene_fold",
    file_support="support_vectors_df",
    test_model="geoformer",
    test_fold=0,
    # DETR
    dec_nlayers=4,
    dec_dim=64,
    dec_ffn_dim=64,
    dec_dropout=0.1,
    dec_nhead=4,
    use_rel=True,
    n_downsampling=50000,
    n_decode_point=2048,
    n_query_points=128,
    filter_biases_wd=False,
    base_lr=0.0005,
    warm_lr=1e-6,
    warm_lr_epochs=3,
    final_lr=1e-6,
    lr_scheduler="cosine",
    # DATA
    data_root="data",
    dataset="scannetv2",
    filename_suffix=".npy",
    classes=13,
    ignore_label=-100,
    input_channel=3,
    scale=50,
    batch_size=4,
    full_scale=[128, 512],
    full_scale_support=[32, 64],
    max_npoint=250000,
    mode=4,
    # STRUCTURE
    model_name="geoformer",
    m=16,
    block_residual=True,
    block_reps=2,
    use_coords=True,
    # TRAIN
    start_epoch=1,
    prepare_epochs=120,
    epochs=500,
    num_workers=0,
    optim="Adam",
    lr=0.001,
    step_epoch=384,
    multiplier=0.5,
    momentum=0.9,
    weight_decay=0.0001,
    save_freq=10,
    save_freq_last=2,
    # micro-steps averaged per optimizer update (optax.MultiSteps): one
    # chip fits B=1 at prod capacities, so the reference's effective batch
    # 16/8 on one chip is batch_size=1 x grad_accum_steps=16/8 (or dp
    # sharding across chips). 1 = off
    grad_accum_steps=1,
    fix_module=[],
    loss_weight=[1.0, 1.0, 1.0, 1.0],  # PointGroup legacy (unused, kept for YAML compat)
    # set-criterion term weights (reference hardwires 1/1/1, criterion.py:129-133)
    loss_dice_weight=1.0,
    loss_focal_weight=1.0,
    loss_cls_weight=1.0,
    # TEST
    split="val",
    test_epoch=29999,
    test_workers=0,
    test_seed=567,
    # scenes per eval dispatch (test.py). >1 batches scenes into one jitted
    # forward — sharded over the mesh's data axis when divisible — which
    # both scales eval across chips and amortizes the per-dispatch floor on
    # one chip. 1 = reference protocol (test.py bs=1).
    test_batch_size=1,
    TEST_NMS_THRESH=0.3,
    TEST_SCORE_THRESH=0.1,
    TEST_NPOINT_THRESH=50,
    BENCHMARK_SEMANTIC_LABELS=[1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39],
    eval=True,
    save_semantic=False,
    save_pt_offsets=False,
    save_instance=False,
    save_cluster=False,
    save_fg=False,
    # --- TPU static-shape capacities (ours; no reference equivalent) ---
    tpu_bf16=False,
    tpu_remat=False,
    # x-folded brick levels with c0 <= this channel width (0 = off):
    # XLA tiles buffer lanes to 128, so C=16 level tensors pad 8x; folding
    # the brick x axis into lanes ([B,NB,8,8,8C]) tiles exactly and runs
    # the conv banded over (z,y) (ops/brick.py). Measured at prod
    # (ONCHIP_SUITE_r4 R4K): full unet f32 304.9 -> fold64 287.6 ->
    # fold32 279.7 ms (bf16 273.7 -> fold64 247.6); per-level fold WINS at
    # C16/C32 (8x/4x lane-pad removed) and ~ties at C48, so 32 ships
    tpu_brick_fold_max_c=32,
    # apply the fold in the TRAIN step too. Default False: the folded
    # prod train step (B=1, remat, bf16) exceeded one v5e's HBM by
    # 0.44 GB with 7.6 GB of HLO-temp fragmentation (r5c train_bench
    # fold32 OOM dump), while the unfolded step is the proven fit (r4g,
    # 1553.9 ms/step). The fold is layout-only (params/batch_stats are
    # identical; checkpoints interchange), so eval keeps its measured
    # win while training runs unfolded
    tpu_brick_fold_train=False,
    tpu_max_points=250000,      # P: padded points per scene
    tpu_max_voxels=131072,      # V_0: level-0 voxel capacity per scene
    tpu_voxel_decay=0.5,        # V_{l+1} = ceil(V_l * decay) (clamped to >= 64)
    tpu_max_fg_points=131072,   # F: padded foreground points per scene
    tpu_train_subsample=30000,  # mask-head training subsample (ref: 30k)
    tpu_max_instances=64,       # gt instance capacity per scene
    tpu_knn_neighbors=64,       # geodesic kNN fan-out (ref: 64)
    # voxel-hash cell capacity for the radius graph. The r3 default 8
    # dropped ~8.7% of fg points from the graph at prod density
    # (BENCH_r03); 16 left 11 drops at plane junctions of the bench scene;
    # 24 measures ZERO on the full 65k synthetic cloud (an upper bound on
    # any fg subset) for ~+6% graph-build cost (BASELINE.md r4)
    tpu_radius_cell_cap=24,
    tpu_radius_cell_div=2,      # cell-slot capacity divisor (1 = exact any input)
    # per-cell candidate-window compaction for the radius kNN: compact each
    # cell's 27-neighbor member lists to this many lanes (round-robin
    # across cells, center-first) before the per-point d2/top_k (0 = full
    # 27*cell_cap width). MEASURED LOSS on v5e at prod fg (window=64:
    # 1195.7 ms vs 217.5 ms full width — the per-cell searchsorted/gather
    # compaction machinery costs more than the wide top_k it saves,
    # BASELINE.md r4) — default OFF; kept for exactness tests and future
    # hardware where sort width dominates. Overflow surfaces as
    # n_radius_window_overflow (AP floor table in BASELINE.md r4)
    tpu_knn_window=0,
    # per-cell candidate-window MATERIALIZATION for the radius kNN (no
    # compaction — exact, identical candidate set): the [27*cap] window is
    # gathered once per CELL and points pick it up with one wide
    # row-gather, replacing 27 tile-padded row-gathers per point. Default
    # False pending the on-chip A/B (geo_bisect --cellwin; BASELINE.md)
    tpu_knn_cellwin=False,
    # dense scatter-grid 27-window lookup for the radius kNN (0 = the
    # run-compressed compare-count lookup). Measured on-chip 39.7 vs
    # 76.6 ms at prod fg with 0 mismatches (ONCHIP_SUITE_r4 r4n). Exact
    # while occupied cell coords < this (256 = 12.8 m extent at 5 cm
    # cells, beyond any ScanNet room); farther cells' points drop from the
    # graph and surface in n_radius_cell_overflow
    tpu_knn_dense_grid=256,
    # k-selection over the candidate window, MEASURED on-chip at prod fg
    # (ONCHIP_SUITE_r5 r5c knn_ab, dense=256 arms, end-to-end radius_knn):
    # "pallas" (VMEM-resident k-extraction kernel, ops/knn_select_pallas)
    # 128.9 ms vs "topk" (lax.top_k per-row sort) 175.4 — exact, 0 idx
    # mismatches, ships. "passes" (k argmin passes in XLA: re-reads the
    # table from HBM every pass) 250.7 ms; "approx" (approx_max_k recall
    # .95) 170.2 ms for 0.6% wrong edges — measurement-only arms.
    tpu_knn_select="pallas",
    tpu_device_matcher=True,    # auction LSA on device (no host callback)
    tpu_brick_occupancy=32,     # dense-brick subm convs: NB = V // this
                                # (ops/brick.py; 0 = gather-rulebook path)
    # voxel-hash ball query, cap pts/cell (0 = brute force). 32 measured
    # the prod aggregator 454.5 -> 357.6 ms (-21%, ONCHIP_SUITE_r3); exact
    # up to the cap, overflow counted + warned
    tpu_ball_cell_cap=32,
    tpu_subm_k=27,              # live-packed subm conv slots (27 = exact/off;
    # the one-hot-routed compact path lowered to per-voxel tiny GEMMs and
    # measured SLOWER than the full 27-slot conv on v5e — keep off)
    tpu_geodesic_int16=False,   # int16 mm fixed-point table (no speed win on v5e)
    tpu_geodesic_radius=0.05,   # edge gate (ref: 0.05)
    # two-level geodesic: coarse cell-graph fixpoint + fine smoothing
    # sweeps (ops/geodesic.py:_hier_scene) — ~7-10x faster at eval scale
    tpu_geodesic_hier=True,
    # on-chip at prod fg=131k the hier solve runs 391/340/335 ms at
    # sweeps 6/4/2 (ONCHIP_SUITE_r3); r3 shipped 4 for margin when the AP
    # gate was ONE walled scene. r5 re-gated sweeps=2 on all four
    # topologies (walled / multi-room loop / thin bridge / clutter, AP
    # 1.00 each) and measured the distance-error delta vs sweeps=4 at
    # ~0.5 cm mean (clutter 25.9 vs 25.4 cm, multiroom 7.3 vs 6.5 — the
    # hier approximation itself dominates); one pass-pair halves the fine
    # stage, the prod-scale geodesic hot spot. The (fine_k=8, sweeps=2)
    # collapse cliff is fine_k-driven (fine_k=8 fails the multiroom gate
    # at EVERY sweep count) and fine_k stays 16
    tpu_geodesic_fine_sweeps=2,
    tpu_geodesic_fine_k=16,    # fine sweeps use the nearest k edges (0=all)
    # contraction edge-lift uses the nearest k edges; 8 halves the
    # contract's 2.1M-key sort. r5 re-gate: AP 1.00 on all four
    # topologies and mean-|err| UNCHANGED vs k_sub=16 at shipped sweeps=2
    # (21.8/25.9/7.3 cm vs 21.9/25.9/7.3 — the cell-pair dedup keeps the
    # same coarse connectivity; the dropped slots only lose redundant
    # parallel edges). The earlier +1.6cm DESIGN.md note predates the
    # kc-cap dedup ordering
    tpu_geodesic_k_sub=8,
    tpu_geodesic_cell_factor=2.0,
    # coarse-fixpoint exit slack (meters): 0 = exact fixpoint. The exact
    # exit spends tail cycles shaving sub-mm amounts off far-field values
    # the fine sweeps re-smooth anyway; measured on-chip before shipping a
    # nonzero default (BASELINE.md r4)
    tpu_geodesic_coarse_eps=0.0,
    # sweep-units, not single hops: one forward+backward block sweep pair
    # propagates many hops (see ops/geodesic.py); 64 units cover any
    # room-scale scene beyond the reference BFS's 256-hop first-visit cap
    tpu_geodesic_steps_train=32,
    tpu_geodesic_steps_eval=64,
    tpu_spatial_shape=1024,     # voxel grid extent per axis (power of two)
    tpu_unet_depth=7,           # number of U-Net levels (ref: 7)
    tpu_ball_radius=0.2,        # set-aggregator ball radius (ref: 0.2)
    tpu_ball_nsample=64,        # set-aggregator group size (ref: 64)
    tpu_compute_dtype="float32",  # "bfloat16" for MXU-heavy paths
    # paths filled by CLI
    config=None,
    profile_dir=None,
    pretrain=None,
    resume=None,
    output_path="exp",
    exp_name="default",
)


class Config(SimpleNamespace):
    """Flat config namespace; attribute access like the reference's cfg."""

    def replace(self, **kw) -> "Config":
        new = copy.deepcopy(vars(self))
        new.update(kw)
        return Config(**new)

    def to_dict(self) -> dict:
        return dict(vars(self))


def load_config(yaml_path: str | None = None, **overrides) -> Config:
    """Build a Config from defaults <- YAML sections <- overrides."""
    merged = dict(_DEFAULTS)
    if yaml_path is not None:
        with open(yaml_path) as f:
            raw = yaml.safe_load(f) or {}
        for _section, kv in raw.items():
            if isinstance(kv, dict):
                merged.update(kv)
    merged.update(overrides)
    merged["config"] = yaml_path
    return Config(**merged)


def config_from_args(argv=None) -> Config:
    """CLI entry matching the reference's argparse surface (util/config.py).

    Also enables the persistent XLA compilation cache for every driver —
    full-scale forwards compile in minutes and the executables are
    reusable across runs (utils/compilation_cache.py)."""
    from geoformer_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser("geoformer_tpu")
    p.add_argument("--config", type=str, default=None, help="path to config yaml")
    p.add_argument("--pretrain", type=str, default=None, help="path to pretrain checkpoint")
    p.add_argument("--resume", type=str, default=None, help="path to resume checkpoint")
    p.add_argument("--output_path", type=str, default="exp")
    p.add_argument("--exp_name", type=str, default="default")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--use_backbone", action="store_true")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the eval/train loop here")
    args = p.parse_args(argv)
    return load_config(
        args.config,
        pretrain=args.pretrain,
        resume=args.resume,
        output_path=args.output_path,
        exp_name=args.exp_name,
        profile_dir=args.profile_dir,
    )
