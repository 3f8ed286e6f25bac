#!/usr/bin/env python
"""Probe: which gather forms lower in compiled TPU Pallas kernels?

The geodesic relaxation kernel needs `dist[nbr_idx]` row gathers from a
VMEM-resident [P, Q] buffer. Mosaic's gather support varies by form and
version — this probe tries the candidates and reports which compile and
produce correct results on the real chip. Run on TPU (falls back to
interpret mode elsewhere, where everything trivially works).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _take_axis0(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(x_ref[:], i_ref[:, 0], axis=0)


def _takealong_axis0(x_ref, i_ref, o_ref):
    idx = jnp.broadcast_to(i_ref[:, :1], o_ref.shape)
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=0)


def _fori_dynslice(x_ref, i_ref, o_ref):
    n = o_ref.shape[0]

    def body(r, _):
        o_ref[r, :] = x_ref[i_ref[r, 0], :]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _onehot_matmul(x_ref, i_ref, o_ref):
    p = x_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (o_ref.shape[0], p), 1)
    onehot = (rows == i_ref[:, :1]).astype(jnp.float32)
    o_ref[:] = jnp.dot(onehot, x_ref[:], preferred_element_type=jnp.float32)


KERNELS = {
    "take_axis0": _take_axis0,
    "take_along_axis0": _takealong_axis0,
    "fori_dynslice": _fori_dynslice,
    "onehot_matmul": _onehot_matmul,
}


def run_probe(interpret=False):
    p, q, n = 512, 128, 256
    rng = np.random.default_rng(0)
    x = rng.normal(size=(p, q)).astype(np.float32)
    idx = rng.integers(0, p, size=(n, 1)).astype(np.int32)
    want = x[idx[:, 0]]
    results = {}
    for name, kern in KERNELS.items():
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((n, q), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interpret,
            )(jnp.asarray(x), jnp.asarray(idx))
            ok = np.allclose(np.asarray(out), want, atol=1e-5)
            results[name] = "OK" if ok else "WRONG RESULT"
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
    return results


if __name__ == "__main__":
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    print(f"device={jax.devices()[0]} interpret={interpret}")
    for name, res in run_probe(interpret).items():
        print(f"{name:20s} {res}")
