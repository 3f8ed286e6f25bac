"""Checkpoint save/load with tolerant partial restore.

Reference checkpoint.py:10-101: saves {epoch, state_dict, optimizer} and
loads pretrain weights by suffix-matched alignment, skipping shape
mismatches — essential for stage-2 (the FS model widens
encoder_to_decoder_projection 2m->6m, geoformer_fs.py:139-149).

We store flax pytrees with orbax-free msgpack (flax.serialization) and
implement the same align-by-path, skip-on-shape-mismatch semantics.
"""

from __future__ import annotations

import os
import re

import flax
import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(path, state: dict):
    """state: arbitrary pytree (params, batch_stats, opt_state, epoch...)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(state))


def load_checkpoint(path) -> dict:
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def align_and_update(target: dict, loaded: dict, logger=None) -> dict:
    """Copy loaded leaves into target wherever the path suffix matches and
    shapes agree (checkpoint.py:10-66 semantics). Returns a new tree."""
    tflat = _flatten(target)
    lflat = _flatten(loaded)
    out = dict(tflat)
    n_loaded = 0
    for tkey in tflat:
        best = None
        if tkey in lflat:
            best = tkey
        else:
            # longest loaded key that is a suffix match
            cands = [lk for lk in lflat if lk.endswith("/" + tkey) or tkey.endswith("/" + lk)]
            if cands:
                best = max(cands, key=len)
        if best is None:
            continue
        lv, tv = lflat[best], tflat[tkey]
        if np.shape(lv) == np.shape(tv):
            out[tkey] = np.asarray(lv, dtype=np.asarray(tv).dtype)
            n_loaded += 1
        elif logger:
            logger.info(f"skip {tkey}: shape {np.shape(lv)} vs {np.shape(tv)}")
    if logger:
        logger.info(f"loaded {n_loaded}/{len(tflat)} tensors")
    return _unflatten(out)


def state_payload(state, epoch: int) -> dict:
    """Full training payload: weights + optimizer state (reference
    checkpoint.py:90-101 saves model+optimizer+epoch)."""
    return {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "constants": jax.device_get(state.constants),
        "opt_state": flax.serialization.to_state_dict(jax.device_get(state.opt_state)),
        "step": int(state.step),
        "epoch": epoch,
    }


def restore_train_state(state, loaded: dict):
    """Exact resume: weights + optimizer moments + step counter."""
    new = state.replace(
        params=loaded["params"],
        batch_stats=loaded["batch_stats"],
        step=int(loaded.get("step", 0)),
    )
    if "constants" in loaded and loaded["constants"]:
        new = new.replace(constants=loaded["constants"])
    if "opt_state" in loaded:
        new = new.replace(
            opt_state=flax.serialization.from_state_dict(state.opt_state, loaded["opt_state"])
        )
    return new


def checkpoint_path(output_path: str, epoch: int | None = None) -> str:
    if epoch is None:
        return os.path.join(output_path, "checkpoint_last.ckpt")
    return os.path.join(output_path, f"checkpoint_epoch_{epoch}.ckpt")


def find_last_checkpoint(output_path: str) -> str | None:
    last = checkpoint_path(output_path)
    if os.path.exists(last):
        return last
    if not os.path.isdir(output_path):
        return None
    epochs = []
    for f in os.listdir(output_path):
        m = re.match(r"checkpoint_epoch_(\d+)\.ckpt", f)
        if m:
            epochs.append(int(m.group(1)))
    if not epochs:
        return None
    return checkpoint_path(output_path, max(epochs))
