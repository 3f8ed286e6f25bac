"""Shared flax building blocks: masked BatchNorm, MLPs, attention.

BatchNorm semantics match the reference exactly: torch BatchNorm1d with
eps=1e-4, momentum=0.1, weights initialized to (1, 0)
(geoformer.py:39,186-191) — but statistics are computed over *valid*
elements only, since every tensor here carries a padding mask.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all leading axes, masked. x [..., C], mask [...].

    fold_segs: x-folded brick input (ops/brick.py fold_x) — x is
    [..., sum(8*c)] with the brick x axis folded into lanes and mask is
    the SITE occupancy [..., 8]. Stats/params stay [sum(segs)] (identical
    to the unfolded module — checkpoints interchange), computed via
    lane-group reductions so the folded tensor never unfolds."""

    features: int
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-4
    use_scale_bias: bool = True
    fold_segs: tuple = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features))

        segs = self.fold_segs
        if segs is not None:
            assert sum(segs) == self.features, (segs, self.features)

            def lane_to_c(v):  # [sum(8c)] -> [sum(c)] (sum over x groups)
                out, off = [], 0
                for c in segs:
                    out.append(v[off:off + 8 * c].reshape(8, c).sum(0))
                    off += 8 * c
                return jnp.concatenate(out)

            def c_to_lane(v):  # [sum(c)] -> [sum(8c)] (x-major broadcast)
                out, off = [], 0
                for c in segs:
                    out.append(jnp.tile(v[off:off + c], 8))
                    off += c
                return jnp.concatenate(out)
        else:
            lane_to_c = c_to_lane = lambda v: v

        # bf16-resident inputs (the brick-dense U-Net levels): stats MUST
        # accumulate in f32 (a bf16 sum over ~10^6 elements loses the batch
        # mean), the normalize chain runs f32 in-register (XLA fuses the
        # upcast), and the output returns in the input dtype so level
        # residency holds
        xd = x.dtype
        xf = x.astype(jnp.float32)
        lead = tuple(range(x.ndim - 1))
        if train:
            mf = mask.astype(jnp.float32)
            if segs is not None:
                m = jnp.concatenate(
                    [jnp.repeat(mf, c, axis=-1) for c in segs], axis=-1)
                n = jnp.maximum(jnp.sum(mf), 1.0)
            else:
                m = mf[..., None]
                n = jnp.maximum(jnp.sum(mf), 1.0)
            mean = lane_to_c(jnp.sum(xf * m, axis=lead)) / n
            mean_l = c_to_lane(mean)
            var = lane_to_c(jnp.sum(m * (xf - mean_l) ** 2, axis=lead)) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
            mean_l = c_to_lane(mean)

        y = (xf - mean_l) * c_to_lane(jax.lax.rsqrt(var + self.eps))
        if self.use_scale_bias:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * c_to_lane(scale) + c_to_lane(bias)
        return y.astype(xd)


class MLPConvBlock(nn.Module):
    """conv_with_kaiming_uniform("BN", activation=True) equivalent
    (geoformer_modules.py:132-161): Dense (no bias) + masked BN + ReLU."""

    features: int

    @nn.compact
    def __call__(self, x, mask, train: bool):
        x = nn.Dense(self.features, use_bias=False,
                     kernel_init=nn.initializers.kaiming_uniform())(x)
        x = MaskedBatchNorm(self.features)(x, mask, train)
        return nn.relu(x)


class GenericMLP(nn.Module):
    """Reference model/helper.py:42-118: Dense stacks with optional BN/act.

    norm="bn" uses masked BN; hidden layers may drop bias like the reference.
    """

    hidden_dims: Sequence[int]
    output_dim: int
    norm: str | None = None  # None | "bn"
    hidden_use_bias: bool = False
    output_use_bias: bool = True
    output_use_activation: bool = False
    output_use_norm: bool = False

    @nn.compact
    def __call__(self, x, mask, train: bool):
        for h in self.hidden_dims:
            x = nn.Dense(h, use_bias=self.hidden_use_bias)(x)
            if self.norm == "bn":
                x = MaskedBatchNorm(h)(x, mask, train)
            x = nn.relu(x)
        x = nn.Dense(self.output_dim, use_bias=self.output_use_bias)(x)
        if self.output_use_norm and self.norm == "bn":
            x = MaskedBatchNorm(self.output_dim)(x, mask, train)
        if self.output_use_activation:
            x = nn.relu(x)
        return x


def masked_softmax(logits, mask, axis):
    neg = jnp.finfo(logits.dtype).min
    logits = jnp.where(mask, logits, neg)
    out = jax.nn.softmax(logits, axis=axis)
    return jnp.where(mask, out, 0.0)


def _chunked_attention(q, k, v, mask, chunk=512):
    """Exact masked softmax attention without materializing [B,H,N,N].

    Online-softmax (flash-style) scan over key chunks: running max / sum /
    accumulator per query row. q,k,v [B,N,H,D], mask [B,N] (key validity).
    Exact up to fp reassociation — the [N,N] score tensor at the level-5
    U-Net bottleneck (8192 voxels) measured 109 ms/layer materialized vs
    sub-ms chunked. Returns [B,N,H,D]."""
    b, n, h, d = q.shape
    scale = 1.0 / jnp.sqrt(d).astype(q.dtype)
    neg = jnp.finfo(q.dtype).min
    pad = (-n) % chunk
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    mp = jnp.pad(mask, ((0, 0), (0, pad)))
    steps = (n + pad) // chunk
    kc = kp.reshape(b, steps, chunk, h, d).transpose(1, 0, 2, 3, 4)
    vc = vp.reshape(b, steps, chunk, h, d).transpose(1, 0, 2, 3, 4)
    mc = mp.reshape(b, steps, chunk).transpose(1, 0, 2)

    def body(carry, kv):
        m_run, s_run, acc = carry
        kb, vb, mb = kv  # [B,C,H,D], [B,C,H,D], [B,C]
        logits = jnp.einsum("bqhd,bkhd->bqhk", q, kb) * scale  # [B,N,H,C]
        logits = jnp.where(mb[:, None, None, :], logits, neg)
        m_new = jnp.maximum(m_run, jnp.max(logits, axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        p = jnp.where(mb[:, None, None, :], p, 0.0)
        corr = jnp.exp(m_run - m_new)
        s_new = s_run * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum("bqhk,bkhd->bqhd", p, vb)
        return (m_new, s_new, acc), None

    init = (
        jnp.full((b, n, h), neg, q.dtype),
        jnp.zeros((b, n, h), q.dtype),
        jnp.zeros((b, n, h, d), q.dtype),
    )
    (m_run, s, acc), _ = jax.lax.scan(body, init, (kc, vc, mc))
    return acc / jnp.maximum(s, 1e-30)[..., None]


class MultiHeadSelfAttention(nn.Module):
    """Standard MHA (torch nn.MultiheadAttention semantics) over [B, N, d].

    For long sequences with no attention-prob dropout the softmax runs
    chunked (online-softmax) instead of materializing [B,H,N,N]."""

    d_model: int
    nhead: int
    dropout: float = 0.0
    chunk_threshold: int = 1024  # N >= this -> chunked path (when exact)

    @nn.compact
    def __call__(self, q_in, k_in, v_in, mask, train: bool):
        d_head = self.d_model // self.nhead
        dense = lambda name: nn.DenseGeneral((self.nhead, d_head), axis=-1, name=name)
        q = dense("q")(q_in)
        k = dense("k")(k_in)
        v = dense("v")(v_in)
        # attention-prob dropout forces the dense path (the probs must exist)
        use_chunked = (
            k.shape[1] >= self.chunk_threshold and (self.dropout == 0.0 or not train)
        )
        if use_chunked:
            out = _chunked_attention(q, k, v, mask)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d_head).astype(q.dtype)
            attn = masked_softmax(logits, mask[:, None, None, :], axis=-1)
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(out.shape[:-2] + (self.d_model,))
        return nn.Dense(self.d_model, name="out")(out)


class MultiHeadAttention(nn.Module):
    """Cross-attention with decoupled key/value dims (reference
    model/attention.py:32-404 — a torch-MHA fork supporting kdim/vdim and
    optional no-in-projection; dead code in the shipped model but part of
    its public surface). q [B,Nq,dq], k [B,Nk,kdim], v [B,Nk,vdim]."""

    d_model: int
    nhead: int
    kdim: int | None = None
    vdim: int | None = None
    dropout: float = 0.0
    use_in_proj: bool = True

    @nn.compact
    def __call__(self, q_in, k_in, v_in, mask, train: bool):
        d_head = self.d_model // self.nhead
        if self.use_in_proj:
            q = nn.DenseGeneral((self.nhead, d_head), axis=-1, name="q")(q_in)
            k = nn.DenseGeneral((self.nhead, d_head), axis=-1, name="k")(k_in)
            v = nn.DenseGeneral((self.nhead, d_head), axis=-1, name="v")(v_in)
        else:
            reshape = lambda x: x.reshape(x.shape[:-1] + (self.nhead, d_head))
            q, k, v = reshape(q_in), reshape(k_in), reshape(v_in)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d_head).astype(q.dtype)
        attn = masked_softmax(logits, mask[:, None, None, :], axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(out.shape[:-2] + (self.d_model,))
        return nn.Dense(self.d_model, name="out")(out)


class SimpleNorm(nn.Module):
    """The backbone bottleneck's hand-rolled Norm (model/helper.py:64-76):
    (x - mean) / (std + eps) with *unbiased* std, learnable alpha/bias."""

    d_model: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (self.d_model,))
        bias = self.param("bias", nn.initializers.zeros, (self.d_model,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / (x.shape[-1] - 1)
        # double-where: d sqrt/d var = inf at var=0, and 0-upstream * inf =
        # NaN in the backward. Static-shape pad voxel rows are exactly
        # constant at init (zero biases), so from-scratch training NaN'd on
        # step 1 whenever the bottleneck level had pad rows. Forward is
        # bit-identical (sqrt(0) == 0 == where branch).
        std = jnp.where(var > 0, jnp.sqrt(jnp.where(var > 0, var, 1.0)), 0.0)
        return alpha * (x - mean) / (std + self.eps) + bias
