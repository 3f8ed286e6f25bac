"""Experiment tracking: scalar writer + profiler (SURVEY §5 aux subsystems).

The reference logs TB scalars per loss per epoch (train.py:28,87-91,144-145
via tensorboardX) and wall-clock meters; it has no formal profiler. We keep
the TB scalars (tensorboardX when importable, JSONL always — greppable and
dependency-free) and add `jax.profiler` trace capture, the TPU-native
replacement for torch.cuda.max_memory_allocated-style introspection.
"""

from __future__ import annotations

import contextlib
import json
import os
import time


class ScalarWriter:
    """Writes scalars to scalars.jsonl (always) and TensorBoard (if present)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_scalars(self, scalars: dict, step: int, prefix: str = ""):
        for k, v in scalars.items():
            self.add_scalar(f"{prefix}{k}", v, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(log_dir: str | None, enabled: bool = True):
    """jax.profiler trace context; view with TensorBoard or Perfetto.

    Replaces the reference's iteration wall-clock + CUDA memory breadcrumbs
    (train.py:80-85) with a full XLA timeline.
    """
    if not enabled or log_dir is None:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-phase wall-clock accumulator (AverageMeter heritage,
    train.py:33-34) usable as a context manager factory."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def averages(self) -> dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

    def summary(self) -> str:
        return " ".join(f"{k}={v:.3f}s" for k, v in sorted(self.averages().items()))


def device_memory_stats() -> dict:
    """Best-effort live/peak device memory (replaces the reference's
    torch.cuda.max_memory_allocated logging, train.py:85)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {
            "bytes_in_use": stats.get("bytes_in_use", 0),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            "bytes_limit": stats.get("bytes_limit", 0),
        }
    except Exception:
        return {}
