"""Scalar writer, step timer, memory stats."""

import json

from geoformer_tpu.utils.tracking import ScalarWriter, StepTimer, device_memory_stats


def test_scalar_writer_jsonl(tmp_path):
    w = ScalarWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, 1)
    w.add_scalars({"a": 1.0, "b": 2.0}, 2, prefix="train/")
    w.close()
    rows = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert {"tag": "loss", "value": 1.5, "step": 1} in rows
    assert any(r["tag"] == "train/a" for r in rows)


def test_step_timer():
    t = StepTimer()
    with t.phase("data"):
        pass
    with t.phase("data"):
        pass
    with t.phase("step"):
        pass
    avg = t.averages()
    assert set(avg) == {"data", "step"}
    assert t.counts["data"] == 2
    assert "data=" in t.summary()


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)
