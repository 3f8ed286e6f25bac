#!/usr/bin/env python
"""Benchmark: per-scene inference throughput of the flagship model.

Prints ONE JSON line:
  {"metric": "scene_inference", "value": <scenes/sec/chip>, "unit":
   "scenes/sec", "vs_baseline": <ratio>, ...}

The workload mirrors the fully-supervised eval config (test.py, bs=1):
synthetic ScanNet-scale scene, full pipeline voxelize -> U-Net ->
aggregator -> kNN+geodesic -> decoder -> dynamic conv -> proposals.
`vs_baseline` is measured against REFERENCE_SCENES_PER_SEC, an estimate of
the PyTorch reference's per-scene rate on its GPU (the repo publishes no
numbers — see BASELINE.md); update it when a measured baseline exists.

Robustness: the measurement runs in a watchdogged subprocess (the TPU
tunnel in this environment can stall mid-compile); on timeout it retries at
a reduced scale and reports which scale produced the number.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# No measured reference baseline exists: the repo publishes no numbers, and
# this environment has no GPU / reference checkpoint / egress to produce one
# (BASELINE.md). `vs_baseline` is therefore null. DERIVED_REFERENCE_RATE is
# an op-count reconstruction of the reference's per-scene eval rate on its
# era GPU (BASELINE.md "Derived reference bound"): dominated by the dynamic
# frontier BFS (<=256 serial steps of torch.unique/gather on ~1-10M-pair
# frontiers) plus FAISS 64-NN at 250k points — ~0.6-1.5 s/scene -> ~1.0
# scenes/s mid-estimate, reported separately as `vs_derived_bound`.
REFERENCE_SCENES_PER_SEC = None          # measured: none available
DERIVED_REFERENCE_RATE = 1.0             # scenes/s, derived (see BASELINE.md)

SCALES = {
    # reference eval capacity (max_npoint=250000, scannetv2_inst.py:206-222)
    # at the SHIPPED production config's capacities
    # (config/geoformer_scannet.yaml TPU: spatial 1024, 262144 voxels —
    # a 250k-point scene at 2 cm needs ~250k voxel slots; the previous
    # 512/131072 prod scale silently dropped ~half the scene into the pad
    # voxel). Run via `python bench.py --scale prod`; the default fallback
    # chain starts at "full" so round-over-round headline numbers stay
    # comparable
    "prod": dict(
        n_decode_point=2048, n_query_points=256, n_downsampling=50000,
        tpu_max_points=250000, tpu_max_voxels=262144, tpu_max_fg_points=131072,
        tpu_knn_neighbors=64, tpu_geodesic_steps_eval=64, tpu_spatial_shape=1024,
        tpu_unet_depth=7, tpu_ball_nsample=64, tpu_brick_occupancy=64,
    ),
    # production-shaped eval scene (one chip)
    "full": dict(
        n_decode_point=2048, n_query_points=256, n_downsampling=50000,
        tpu_max_points=65536, tpu_max_voxels=65536, tpu_max_fg_points=32768,
        tpu_knn_neighbors=64, tpu_geodesic_steps_eval=64, tpu_spatial_shape=512,
        tpu_unet_depth=7, tpu_ball_nsample=64,
    ),
    "half": dict(
        n_decode_point=1024, n_query_points=128, n_downsampling=16384,
        tpu_max_points=32768, tpu_max_voxels=32768, tpu_max_fg_points=16384,
        tpu_knn_neighbors=32, tpu_geodesic_steps_eval=48, tpu_spatial_shape=512,
        tpu_unet_depth=7, tpu_ball_nsample=32,
    ),
    "small": dict(
        n_decode_point=256, n_query_points=64, n_downsampling=4096,
        tpu_max_points=8192, tpu_max_voxels=8192, tpu_max_fg_points=4096,
        tpu_knn_neighbors=16, tpu_geodesic_steps_eval=32, tpu_spatial_shape=512,
        tpu_unet_depth=5, tpu_ball_nsample=16,
    ),
}
TIMEOUTS = {"prod": 3000, "full": 2400, "half": 1500, "small": 900}


def _cache_entries() -> int:
    from geoformer_tpu.utils.compilation_cache import _DEFAULT_DIR

    d = os.environ.get("GEOFORMER_COMPILE_CACHE", _DEFAULT_DIR)
    try:
        return len(os.listdir(d))
    except OSError:
        return 0


def measure(scale: str, batch_size: int = 1, select: str | None = None):
    import jax

    from geoformer_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from geoformer_tpu.models.geoformer import GeoFormer, ModelConfig
    from geoformer_tpu.utils.config import load_config
    from __graft_entry__ import _synthetic_batch

    cfg = load_config(None, batch_size=batch_size, tpu_max_instances=64,
                      **({"tpu_knn_select": select} if select else {}),
                      **SCALES[scale])
    mc = ModelConfig.from_cfg(cfg)
    model = GeoFormer(mc)
    # B > 1 amortizes the pipeline's fixed per-op overheads (sorts, gathers,
    # table builds at [B*...] rows) — the production eval path already
    # dispatches batched (test.py test_batch_size); value stays per-scene
    batch = _synthetic_batch(cfg, batch_size, seed=0)

    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    # jit the init: eager init compiles every op separately through the
    # remote-compile tunnel (~20 min at full scale)
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False)
    )({"params": k1, "sample": k2, "dropout": k3}, batch)

    import jax.numpy as jnp

    # variables must be an ARGUMENT: jit-closure arrays become HLO
    # constants that get re-staged through the device tunnel every call.
    # The result is reduced to one scalar and pulled to host each call:
    # block_until_ready does NOT block on the axon tunnel backend, so only
    # an actual D2H transfer observes completion.
    # capacity honesty: a benchmark that drops points into the pad voxel is
    # measuring a degraded workload — surface each counter in the JSON
    # line. The first four are HARD drops (the point loses its voxel /
    # graph edges entirely; AP cost is catastrophic per-instance,
    # tests/test_geodesic_ap_delta.py) and gate the headline
    # dropped_points. The window counter is SOFT (the point keeps
    # in-radius edges, possibly non-nearest; measured AP holds at bench
    # overflow rates, BASELINE.md r4) and is reported alongside.
    _COUNTERS = (
        "n_overflow_points",    # points over the voxel capacity
        "n_oor_points",         # points outside the spatial grid
        "n_brick_overflow",     # voxels over the dense-brick occupancy
        "n_radius_cell_overflow",    # fg points dropped from the geo graph
        "n_radius_window_overflow",  # SOFT: non-nearest kNN edges
    )

    @jax.jit
    def fwd(variables, batch, rng):
        out = model.apply(variables, batch, train=False, rngs={"sample": rng})
        vs = out["voxel_stats"]
        counters = jnp.stack([jnp.sum(vs[k]) for k in _COUNTERS])
        return (
            jnp.sum(out["proposals"]["scores"])
            + jnp.sum(out["semantic_scores"][:, :64])
        ), counters

    r = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    s, counters = fwd(variables, batch, r)
    float(s)
    compile_s = time.perf_counter() - t0
    counters = {k: int(v) for k, v in zip(_COUNTERS, counters)}
    dropped_points = sum(v for k, v in counters.items()
                         if k != "n_radius_window_overflow")

    times = []
    for _ in range(8):
        r, sub = jax.random.split(r)
        t0 = time.perf_counter()
        float(fwd(variables, batch, sub)[0])
        times.append(time.perf_counter() - t0)

    p50 = float(np.median(times))
    scenes_per_sec = batch_size / p50
    vs_baseline = (
        round(scenes_per_sec / REFERENCE_SCENES_PER_SEC, 4)
        if REFERENCE_SCENES_PER_SEC
        else None
    )
    print(
        json.dumps(
            {
                "metric": "scene_inference",
                "value": round(scenes_per_sec, 4),
                "unit": "scenes/sec",
                "vs_baseline": vs_baseline,
                "baseline": "unmeasured (no ref ckpt/GPU here; see BASELINE.md)",
                "vs_derived_bound": round(scenes_per_sec / DERIVED_REFERENCE_RATE, 4),
                "p50_latency_s": round(p50, 4),
                "batch_size": batch_size,
                "compile_s": round(compile_s, 1),
                "scale": scale,
                **({"knn_select": select} if select else {}),
                "points": int(cfg.tpu_max_points),
                "dropped_points": dropped_points,
                "degradation_counters": counters,
                # compile_s reflects the persistent XLA cache when warm
                # (utils/compilation_cache.py) — cold first-ever compiles
                # are the uncached number
                "compile_cache_dir_entries": _cache_entries(),
                "device": str(jax.devices()[0]),
                **(
                    {"note": "TPU tunnel unreachable; CPU fallback"}
                    if os.environ.get("GEOFORMER_BENCH_CPU_FALLBACK")
                    else {}
                ),
            }
        ),
        flush=True,
    )


def _tunnel_up(env, here, probe_timeout=150) -> bool:
    """Quick healthcheck: can a fresh process see the TPU? The axon tunnel
    in this environment goes down for hours at a time, and a dead tunnel
    makes `jax.devices()` hang — without this check the fallback chain
    burns every scale's full timeout before reporting."""
    probe = (
        "import jax; d = jax.devices(); assert 'TPU' in str(d[0]); "
        "import jax.numpy as jnp; print(float(jnp.ones(4).sum()))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", probe], timeout=probe_timeout,
            capture_output=True, env=env, cwd=here,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_tunnel(env, here, budget_s=900) -> bool:
    """Bounded wait-retry for the tunnel (VERDICT r4: a ONE-shot probe
    surrendered to CPU permanently while the chip measured 4.37 scenes/s
    the same morning — transient contention, e.g. another process holding
    the single chip, looks identical to an outage for one probe). Probe
    until one succeeds or ~`budget_s` elapses; only then fall back."""
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        if _tunnel_up(env, here):
            return True
        attempt += 1
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        print(f"# tunnel probe {attempt} failed; retrying "
              f"({remaining:.0f}s of wait budget left)", file=sys.stderr)
        time.sleep(min(30, max(remaining, 1)))


def main():
    if len(sys.argv) > 3 and sys.argv[1] == "--_worker":
        measure(sys.argv[2], int(sys.argv[3]),
                select=(sys.argv[4] if len(sys.argv) > 4 else None) or None)
        return
    args = dict(zip(sys.argv[1::2], sys.argv[2::2]))  # --scale X --batch N
    batch_size = int(args.get("--batch", 1))
    select = args.get("--select", "")  # tpu_knn_select override (A/B runs)
    here = os.path.dirname(os.path.abspath(__file__))
    # APPEND to PYTHONPATH: the axon TPU plugin is found via PYTHONPATH and
    # overwriting it silently falls back to CPU
    prev = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=f"{here}:{prev}" if prev else here)
    chain = ("full", "half", "small")
    if "--scale" in args:
        chain = (args["--scale"],)
    timeouts = dict(TIMEOUTS)
    wait_budget = int(os.environ.get("GEOFORMER_BENCH_TUNNEL_WAIT_S", "900"))
    if not _wait_tunnel(env, here, budget_s=wait_budget):
        # Honest degraded mode: measure on the host CPU at small scale and
        # label the device in the JSON rather than emitting value 0.0 after
        # 80 minutes of per-scale timeouts. CPU needs the axon plugin
        # stripped (its sitecustomize overrides JAX_PLATFORMS, CLAUDE.md).
        print("# TPU tunnel unreachable; falling back to CPU small scale",
              file=sys.stderr)
        env = {
            k: v for k, v in env.items()
            if not k.startswith(("PALLAS_AXON", "AXON_"))
        }
        env["PYTHONPATH"] = here
        env["JAX_PLATFORMS"] = "cpu"
        env["GEOFORMER_BENCH_CPU_FALLBACK"] = "1"
        chain = ("small",)
        timeouts["small"] = 2400
    for scale in chain:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--_worker", scale,
                 str(batch_size), select],
                timeout=timeouts[scale] * (1 + (batch_size > 1)),
                capture_output=True, text=True, env=env,
                cwd=here,
            )
        except subprocess.TimeoutExpired:
            print(f"# scale={scale} timed out, retrying smaller", file=sys.stderr)
            continue
        for line in (proc.stdout or "").splitlines():
            if line.startswith("{"):
                print(line)
                return
        print(f"# scale={scale} failed: {(proc.stderr or '')[-400:]}", file=sys.stderr)
    print(json.dumps({"metric": "scene_inference", "value": 0.0,
                      "unit": "scenes/sec", "vs_baseline": None,
                      "error": "all scales failed"}))


if __name__ == "__main__":
    main()
