"""Hier-geodesic approximation tied to the metric that matters: AP.

The production two-level solve (ops/geodesic.py:_hier_scene) is
O(cell)-approximate. Its raw distance error is characterized elsewhere
(test_point_ops: mean |err| 5-8 cm, p95 < 0.2 m); this test measures the
effect on ScanNet AP through the pathway the model actually uses geodesics
for — separating instances across walls. Segmentation oracle: masks are
geodesic balls around per-instance query points (exactly the structure the
dynamic-conv mask head learns from its geodesic-corrected coordinates), on
a scene of rooms separated by a thin wall with a small doorway. Euclidean
distance would bleed masks through the wall; a correct geodesic keeps AP at
1.0. Documented bound: the hier solve must not cost more than 0.05 AP50 /
AP25 vs the exact solver on this scene (in practice it matches exactly).

(A trained-checkpoint AP comparison at eval scale lives in the CLI flow —
the tiny CPU smoke trains minutes per phase, too heavy for the unit suite.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from geoformer_tpu.evaluation.scannet_eval import ScanNetEval
from geoformer_tpu.ops.geodesic import geodesic_distance, geodesic_distance_hier
from geoformer_tpu.ops.radius_graph import radius_knn


def make_walled_scene(seed=0, spacing=0.02):
    """Two rooms (x<1 and x>1) joined by a doorway at y in [1.4, 1.6]:
    floor points everywhere except a wall plane at x=1 blocks direct paths.

    Instances: one blob per room near the wall — euclidean distance between
    them is ~10 cm through the wall, geodesic goes through the door (~2 m).
    """
    rng = np.random.default_rng(seed)
    pts = []
    # floor grid 2m x 2m with a wall gap: remove points at x ~ 1.0 except door
    xs = np.arange(0.05, 1.95, spacing)
    ys = np.arange(0.05, 1.95, spacing)
    gx, gy = np.meshgrid(xs, ys)
    keep = ~((np.abs(gx - 1.0) < 0.03) & ~((gy > 1.4) & (gy < 1.6)))
    floor = np.stack([gx[keep], gy[keep], np.zeros(keep.sum())], axis=1)
    pts.append(floor + rng.normal(0, 0.002, floor.shape))
    xyz = np.concatenate(pts).astype(np.float32)

    # two instance blobs hugging the wall on either side, away from the door
    def blob(center, n=130, r=0.12):
        d = rng.normal(size=(n, 3)) * [1, 1, 0]
        d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
        return (center + d * (rng.random((n, 1)) ** 0.5) * r).astype(np.float32)

    inst_a = blob(np.array([0.85, 0.5, 0.0]))
    inst_b = blob(np.array([1.15, 0.5, 0.0]))
    all_pts = np.concatenate([xyz, inst_a, inst_b])
    inst = np.full(all_pts.shape[0], -1, np.int32)
    inst[xyz.shape[0]: xyz.shape[0] + len(inst_a)] = 0
    inst[xyz.shape[0] + len(inst_a):] = 1
    return all_pts, inst


def make_multiroom_scene(seed=1, spacing=0.025):
    """Four rooms in a 2x2 layout whose doors form a LOOP: (0,0)-(1,0) at
    low y, (1,0)-(1,1) at high x, (1,1)-(0,1) at high y — so the two
    instances hugging the (0,0)/(0,1) shared wall are ~15 cm apart
    euclidean but ~5 m geodesic (three doors). Probes multi-hop long-range
    propagation through the coarse graph (the walled scene has one door)."""
    rng = np.random.default_rng(seed)
    xs = np.arange(0.05, 2.95, spacing)
    gx, gy = np.meshgrid(xs, xs)
    wall_x = (np.abs(gx - 1.5) < 0.035) & ~((gy > 0.5) & (gy < 0.8))
    wall_y = (np.abs(gy - 1.5) < 0.035) & ~((gx > 2.2) & (gx < 2.5))
    # the x-wall door only exists at LOW y (room row 0): re-block it in row 1
    wall_x |= (np.abs(gx - 1.5) < 0.035) & (gy >= 1.5)
    keep = ~(wall_x | wall_y)
    floor = np.stack([gx[keep], gy[keep], np.zeros(keep.sum())], axis=1)
    xyz = (floor + rng.normal(0, 0.002, floor.shape)).astype(np.float32)

    def blob(center, n=130, r=0.12):
        d = rng.normal(size=(n, 3)) * [1, 1, 0]
        d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
        return (center + d * (rng.random((n, 1)) ** 0.5) * r).astype(np.float32)

    inst_a = blob(np.array([0.7, 1.35, 0.0]))   # room (0,0), at the y-wall
    inst_b = blob(np.array([0.7, 1.65, 0.0]))   # room (0,1), other side
    all_pts = np.concatenate([xyz, inst_a, inst_b])
    inst = np.full(all_pts.shape[0], -1, np.int32)
    inst[xyz.shape[0]: xyz.shape[0] + len(inst_a)] = 0
    inst[xyz.shape[0] + len(inst_a):] = 1
    return all_pts, inst


def make_bridge_scene(seed=2, spacing=0.02):
    """Two floor islands separated by a 10 cm void, connected only by a
    ~4 cm-wide bridge at the far end. The instances face each other across
    the void (~20 cm euclidean — inside the 0.25 m oracle ball) and the
    geodesic route runs ~1.5 m through the thin bridge. Probes that the
    coarse contraction keeps a one-cell-wide connection alive (a lost
    bridge makes the far instance unreachable; a euclidean bleed merges
    them)."""
    rng = np.random.default_rng(seed)
    xs_a = np.arange(0.05, 1.0, spacing)
    xs_b = np.arange(1.1, 2.05, spacing)
    ys = np.arange(0.05, 1.2, spacing)
    ga_x, ga_y = np.meshgrid(xs_a, ys)
    gb_x, gb_y = np.meshgrid(xs_b, ys)
    isl_a = np.stack([ga_x.ravel(), ga_y.ravel(), np.zeros(ga_x.size)], 1)
    isl_b = np.stack([gb_x.ravel(), gb_y.ravel(), np.zeros(gb_x.size)], 1)
    # bridge at SCAN density (the cap is sized for 2 cm spacing; a
    # half-spacing bridge put >24 points in one 5 cm cell — an unphysical
    # density, not a capacity finding): 2-3 rows wide, connected at r=5 cm
    bx = np.arange(0.98, 1.12, spacing)
    by = np.arange(1.1, 1.15, spacing)
    gbr_x, gbr_y = np.meshgrid(bx, by)
    bridge = np.stack([gbr_x.ravel(), gbr_y.ravel(), np.zeros(gbr_x.size)], 1)
    floor = np.concatenate([isl_a, isl_b, bridge])
    xyz = (floor + rng.normal(0, 0.002, floor.shape)).astype(np.float32)

    def blob(center, n=130, r=0.1):
        d = rng.normal(size=(n, 3)) * [1, 1, 0]
        d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
        return (center + d * (rng.random((n, 1)) ** 0.5) * r).astype(np.float32)

    inst_a = blob(np.array([0.93, 0.3, 0.0]))
    inst_b = blob(np.array([1.17, 0.3, 0.0]))
    all_pts = np.concatenate([xyz, inst_a, inst_b])
    inst = np.full(all_pts.shape[0], -1, np.int32)
    inst[xyz.shape[0]: xyz.shape[0] + len(inst_a)] = 0
    inst[xyz.shape[0] + len(inst_a):] = 1
    return all_pts, inst


def make_clutter_scene(seed=3, spacing=0.02):
    """The walled scene plus ~18 dense 3-D distractor blobs (furniture):
    highly non-uniform cell occupancy. Probes the shipped radius_cell_cap
    against density hot-spots (must stay drop-free) and the hier solve's
    accuracy when the coarse graph's cells straddle clutter."""
    rng = np.random.default_rng(seed)
    pts, inst = make_walled_scene(seed=seed, spacing=spacing)
    clutter = []
    for _ in range(18):
        c = np.array([rng.uniform(0.15, 1.85), rng.uniform(0.15, 1.85),
                      rng.uniform(0.0, 0.1)])
        if abs(c[0] - 1.0) < 0.15:  # keep the wall void clean
            continue
        n = rng.integers(150, 300)
        clutter.append((c + rng.normal(0, 0.05, (n, 3))).astype(np.float32))
    all_pts = np.concatenate([pts] + clutter)
    inst = np.concatenate(
        [inst, np.full(all_pts.shape[0] - pts.shape[0], -1, np.int32)])
    return all_pts, inst


def _ap_for_solver(hier: bool, fine_k=None, fine_sweeps=6, cell_cap=16,
                   window=0, report_drops=False, cell_factor=2.0, kc=32,
                   coarse_eps=0.0, fine_block=None, k_sub=16,
                   scene=make_walled_scene):
    pts, inst = scene()
    f = pts.shape[0]
    mask = np.ones(f, bool)
    radius = 0.05
    # K must exceed the typical in-radius neighbor count, or the pull-based
    # relaxation loses in-edges to dense spots (symmetrize=False contract —
    # production K=64 covers 2 cm scan density the same way)
    d2, nbr_i, n_drop, n_wovf = radius_knn(
        jnp.asarray(pts[None]), jnp.asarray(mask[None]), radius, 32,
        cell_cap=cell_cap, window=window, with_stats=True,
    )
    nbr_d = jnp.sqrt(jnp.maximum(jnp.minimum(d2, 4.0), 0.0))

    # one seed per instance (blob centroids' nearest points)
    seeds = []
    for i in (0, 1):
        sel = np.nonzero(inst == i)[0]
        c = pts[sel].mean(0)
        seeds.append(sel[np.argmin(np.linalg.norm(pts[sel] - c, axis=1))])
    seeds = jnp.asarray(np.asarray(seeds)[None], jnp.int32)
    seed_mask = jnp.ones((1, 2), bool)

    if hier:
        geo = geodesic_distance_hier(
            nbr_i, nbr_d, seeds, seed_mask, jnp.asarray(mask[None]), radius,
            64, jnp.asarray(pts[None]), fine_sweeps=fine_sweeps,
            cell_factor=cell_factor, fine_k=fine_k, kc=kc,
            coarse_eps=coarse_eps, fine_block=fine_block, k_sub=k_sub,
        )
    else:
        geo = geodesic_distance(
            nbr_i, nbr_d, seeds, seed_mask, jnp.asarray(mask[None]), radius,
            256, symmetrize=False, positions=jnp.asarray(pts[None]),
        )
    g = np.asarray(geo[0])  # [F, 2]

    # oracle masks: geodesic ball of 0.25 m around each query, restricted
    # to foreground (instance) points — the same structure the model's
    # pipeline produces (semantic fg filter, then geodesic-driven masks).
    # Each ball covers its own blob; the other blob is ~10 cm away
    # euclidean but ~2 m geodesic through the doorway
    fg = (inst >= 0)[None, :]
    pred_masks = (((g >= 0) & (g <= 0.25)).T & fg).astype(np.int32)  # [2, F]
    pred_info = {
        "label_id": np.asarray([3, 3], np.int64),  # benchmark id of class 2
        "conf": np.asarray([0.9, 0.9], np.float64),
        "mask": pred_masks,
    }
    gt_ids = np.zeros(f, np.int64)
    for i in (0, 1):
        gt_ids[inst == i] = 3 * 1000 + i + 1
    ev = ScanNetEval(cvfold=0)
    ev.assign_instances_for_scan("walled", pred_info, gt_ids)
    a = ev.compute_averages()
    if report_drops:
        return (a["all_ap_50%"], a["all_ap_25%"],
                int(n_drop[0]), int(n_wovf[0]), f)
    return a["all_ap_50%"], a["all_ap_25%"]


@pytest.mark.slow
@pytest.mark.parametrize(
    "scene", [make_walled_scene, make_multiroom_scene, make_bridge_scene,
              make_clutter_scene],
    ids=["walled", "multiroom-loop", "thin-bridge", "clutter"])
def test_shipped_hier_defaults_ap_all_topologies(scene):
    """Gate the SHIPPED hier defaults (fine_k=16, fine_sweeps=2, k_sub=8,
    radius_cell_cap=24 — tpu_* config defaults) on every topology the
    approximation could plausibly break: one-door wall, multi-room loop,
    thin bridge, clutter (VERDICT r4 #7: one synthetic topology is not a
    gate). Exact solver must nail each scene; hier within 0.05 AP; the
    shipped cell cap must be drop-free on all of them."""
    from geoformer_tpu.models.geoformer import ModelConfig
    from geoformer_tpu.utils.config import load_config

    mc = ModelConfig.from_cfg(load_config(None))
    assert (mc.geodesic_fine_k, mc.geodesic_fine_sweeps,
            mc.geodesic_k_sub, mc.radius_cell_cap) == (16, 2, 8, 24), (
        "shipped geodesic/graph defaults moved — update this gate")
    ap50_e, ap25_e = _ap_for_solver(hier=False, cell_cap=mc.radius_cell_cap,
                                    scene=scene)
    assert ap50_e == 1.0 and ap25_e == 1.0, (
        f"exact solver failed the {scene.__name__} oracle: {ap50_e}/{ap25_e}")
    ap50_h, ap25_h, n_drop, _, _ = _ap_for_solver(
        hier=True, fine_k=mc.geodesic_fine_k,
        fine_sweeps=mc.geodesic_fine_sweeps, cell_cap=mc.radius_cell_cap,
        k_sub=mc.geodesic_k_sub, report_drops=True, scene=scene)
    assert n_drop == 0, f"{scene.__name__}: shipped cap dropped {n_drop} pts"
    assert ap50_h >= ap50_e - 0.05, (scene.__name__, ap50_h)
    assert ap25_h >= ap25_e - 0.05, (scene.__name__, ap25_h)


@pytest.mark.slow
def test_hier_geodesic_ap_within_bound():
    ap50_exact, ap25_exact = _ap_for_solver(hier=False)
    ap50_hier, ap25_hier = _ap_for_solver(hier=True)
    # the exact solver must nail the wall scene outright
    assert ap50_exact == 1.0 and ap25_exact == 1.0
    # documented bound for the production approximation
    assert ap50_hier >= ap50_exact - 0.05
    assert ap25_hier >= ap25_exact - 0.05


@pytest.mark.slow
def test_hier_fine_k_ap_within_bound():
    """The SHIPPED production configuration — fine_k=16, fine_sweeps=2
    (tpu_geodesic_fine_k / tpu_geodesic_fine_sweeps defaults) — must hold
    the same AP bound CI gates the exact-vs-hier comparison with."""
    from geoformer_tpu.models.geoformer import ModelConfig
    from geoformer_tpu.utils.config import load_config

    mc = ModelConfig.from_cfg(load_config(None))
    assert mc.geodesic_fine_k == 16 and mc.geodesic_fine_sweeps == 2, (
        "shipped geodesic defaults moved — update this gate to match"
    )
    ap50_exact, ap25_exact = _ap_for_solver(hier=False)
    ap50_k, ap25_k = _ap_for_solver(
        hier=True, fine_k=mc.geodesic_fine_k,
        fine_sweeps=mc.geodesic_fine_sweeps)
    assert ap50_k >= ap50_exact - 0.05
    assert ap25_k >= ap25_exact - 0.05


@pytest.mark.slow
@pytest.mark.parametrize("fine_block", [2048, 4096])
def test_hier_fine_block_ap_within_bound(fine_block):
    """Candidate fine-sweep block sizes (tpu_geodesic_fine_block — bigger
    blocks trade in-sweep Gauss-Seidel propagation for ~4-8x fewer
    sequential block dispatches; the fine stage is latency-bound on chip).
    Viability record for the measurement knob: the AP bound holds at
    sweeps=4 (where r4f measured the on-chip tie that kept the default at
    512). At the r5 shipped sweeps=2 the big blocks BREAK the bound (one
    pass-pair doesn't recover the lost in-block propagation), so the knob
    must not be combined with sweeps<4 — the shipped default stays 512,
    which the 4-topology shipped-defaults gate covers."""
    ap50_exact, ap25_exact = _ap_for_solver(hier=False)
    ap50_b, ap25_b = _ap_for_solver(
        hier=True, fine_k=16, fine_sweeps=4, fine_block=fine_block)
    assert ap50_b >= ap50_exact - 0.05, (fine_block, ap50_b)
    assert ap25_b >= ap25_exact - 0.05, (fine_block, ap25_b)


@pytest.mark.slow
def test_forced_graph_drops_ap_measured():
    """Price the radius-cell drop contract: force a ~10% drop rate
    (cell_cap=7 on this scene) and pin the MEASURED AP cost. It is NOT
    graceful: drops cluster in the densest cells, which are the instance
    blobs themselves, so a dropped seed/centroid region loses its whole
    geodesic column — AP50 halves (one of two instances lost) at every
    tested rate from 5% to 84% (BASELINE.md r4 table). This is exactly why
    the counters exist and why shipped capacities must report ZERO drops
    (the companion exact tests + BENCH dropped_points=0 gate that)."""
    ap50, ap25, n_drop, _, f = _ap_for_solver(
        hier=True, fine_k=16, fine_sweeps=2, cell_cap=7, report_drops=True)
    rate = n_drop / f
    assert 0.05 <= rate <= 0.15, f"drop rate {rate:.3f} missed the target band"
    # measured degradation: the sparser instance survives, the denser one
    # (where the cap binds) is lost — pin it so the contract stays honest
    assert abs(ap50 - 0.5) < 1e-6, f"AP50 {ap50} at {rate:.1%} graph drops"
    assert abs(ap25 - 0.5) < 1e-6, f"AP25 {ap25} at {rate:.1%} graph drops"


@pytest.mark.slow
def test_window_overflow_ap_floor():
    """Contract for the kNN candidate-window compaction under extreme
    overflow: window=20 on this scene overflows ~99% of points (windows
    hold 50-150 members), yet the round-robin cell interleave keeps the
    graph isotropic and AP50 holds at 0.5 (the denser instance degrades,
    same floor as the hard-drop table in BASELINE.md r4). The pre-fix
    cell-sequential truncation scored AP 0.0 — all edges pointed into one
    face cell and geodesic propagation died; this is the regression pin.
    The shipped config keeps the compaction OFF (tpu_knn_window=0 — it
    measured a 5.5x loss at prod, BASELINE.md r4); this pins the soft-
    degradation contract for configs that do enable it
    (test_radius_knn_window_exact covers the exact regime)."""
    ap50, ap25, n_drop, n_wovf, f = _ap_for_solver(
        hier=True, fine_k=16, fine_sweeps=2, cell_cap=16, window=20,
        report_drops=True)
    assert n_wovf > 0.9 * f  # the forced window binds almost everywhere
    assert ap50 >= 0.5, f"AP50 {ap50} with {n_wovf}/{f} window overflows"
    assert ap25 >= 0.5
