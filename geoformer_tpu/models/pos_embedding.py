"""Fourier positional embedding (reference model/pos_embedding.py:13-134).

Gaussian-matrix Fourier features of min-max normalized coordinates. The
gaussian matrix is a fixed (non-trained) buffer in the reference
(pos_embedding.py:38-41) and must survive checkpoints — stored in the
'constants' variable collection here.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def shift_scale_points(xyz, src_a, src_b):
    """(xyz - src_a) / (src_b - src_a) for [B,N,3] points, ranges [B,3]
    (reference util/utils_pc.py:35-61, exact formula — src_b < src_a is
    legal and flips the normalization; see the pc_dims quirk note at the
    call sites in models/geoformer.py)."""
    diff = (src_b - src_a)[:, None, :]
    diff = jnp.where(jnp.abs(diff) < 1e-12, 1e-12, diff)
    return (xyz - src_a[:, None, :]) / diff


class PositionEmbeddingCoordsFourier(nn.Module):
    d_pos: int
    d_in: int = 3
    gauss_scale: float = 1.0
    normalize: bool = True

    @nn.compact
    def __call__(self, xyz, pc_mins, pc_maxs):
        """xyz [B,N,3] -> [B,N,d_pos] (note: reference returns channel-first;
        we stay channel-last)."""
        gauss = self.variable(
            "constants",
            "gauss_B",
            lambda: jax.random.normal(self.make_rng("params"), (self.d_in, self.d_pos // 2))
            * self.gauss_scale,
        )
        x = xyz
        if self.normalize:
            x = shift_scale_points(x, pc_mins, pc_maxs)
        x = x * (2.0 * np.pi)
        proj = jnp.einsum("bnd,dk->bnk", x, gauss.value)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class PositionEmbeddingCoordsSine(nn.Module):
    """Sine/cosine positional embedding (reference pos_embedding.py
    get_sine_embeddings, :44-86). Unused by the shipped GeoFormer configs
    (they select the fourier type, geoformer.py:119) but part of the
    module's public surface: per coordinate d, ndim = d_pos // 3 rounded
    down to even, remainder channels assigned to the leading dims two at a
    time, frequencies temperature**(2*(i//2)/cdim), interleaved
    sin(even)/cos(odd)."""

    d_pos: int
    d_in: int = 3
    temperature: float = 10000.0
    scale: float = 2.0 * np.pi
    normalize: bool = True

    @nn.compact
    def __call__(self, xyz, pc_mins, pc_maxs):
        x = xyz
        if self.normalize:
            x = shift_scale_points(x, pc_mins, pc_maxs)
        ndim = self.d_pos // self.d_in
        if ndim % 2 != 0:
            ndim -= 1
        rems = self.d_pos - ndim * self.d_in
        embeds = []
        for d in range(self.d_in):
            cdim = ndim
            if rems > 0:
                cdim += 2
                rems -= 2
            i = np.arange(cdim, dtype=np.float32)
            dim_t = self.temperature ** (2.0 * (i // 2) / cdim)  # [cdim]
            pos = (x[:, :, d] * self.scale)[:, :, None] / dim_t  # [B,N,cdim]
            pos = jnp.stack(
                [jnp.sin(pos[:, :, 0::2]), jnp.cos(pos[:, :, 1::2])], axis=3
            ).reshape(pos.shape[0], pos.shape[1], -1)
            embeds.append(pos)
        return jnp.concatenate(embeds, axis=-1)  # [B,N,d_pos] channel-last
