"""DETR-style decoder with geodesic-guided relative vector attention.

Reference model/transformer_detr.py:91-166 (decoder), 346-489 (layer).
Pre-norm, return_intermediate, 4 layers. Self-attention over queries uses
absolute Fourier positions; cross-attention is the custom `forward_pre_rel`
(transformer_detr.py:422-463): a vector attention where the similarity is
an MLP of (query - context + rel_pos) and values are v_mlp(context +
rel_pos), softmax over contexts.

We keep batch-first [B, N, d] layouts (the reference uses torch's seq-first)
and reproduce the reference's residual quirk at transformer_detr.py:453-457:
the post-attention residual adds dropout(norm2(tgt_pre)) to the attention
output — not the pre-attention stream.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.models.blocks import MultiHeadSelfAttention, masked_softmax


class RelDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, query_pos, rel_pos, query_mask, memory_mask, train: bool):
        """tgt [B,Q,d], memory [B,K,d], query_pos [B,Q,d],
        rel_pos [B,Q,K,d], masks [B,Q]/[B,K]."""
        drop = lambda name: nn.Dropout(self.dropout, deterministic=not train)

        # self attention between queries (absolute positions)
        tgt2 = nn.LayerNorm(name="norm1")(tgt)
        qk = tgt2 + query_pos
        sa = MultiHeadSelfAttention(self.d_model, self.nhead, self.dropout, name="self_attn")(
            qk, qk, tgt2, query_mask, train
        )
        tgt = tgt + drop("dropout1")(sa)
        tgt2 = nn.LayerNorm(name="norm2")(tgt)

        # rel vector cross-attention
        diff = tgt2[:, :, None, :] - memory[:, None, :, :] + rel_pos  # [B,Q,K,d]
        h = nn.Dense(self.d_model, name="attn_mlp0")(diff)
        h = nn.relu(h)
        sim = nn.Dense(self.d_model, name="attn_mlp1")(h)
        attn = masked_softmax(
            sim / np.sqrt(self.d_model), memory_mask[:, None, :, None], axis=2
        )
        v2 = nn.Dense(self.d_model, name="v_mlp")(memory[:, None, :, :] + rel_pos)
        out = jnp.einsum("bqkf,bqkf->bqf", attn, v2)
        out = nn.Dense(self.d_model, name="out_mlp")(out)
        out = nn.relu(out)

        # reference residual quirk: attn output + dropout(norm2(pre-attn tgt))
        tgt = out + drop("dropout2")(tgt2)
        tgt2 = nn.LayerNorm(name="norm3")(tgt)
        h = nn.Dense(self.dim_feedforward, name="linear1")(tgt2)
        h = drop("dropout")(nn.relu(h))
        h = nn.Dense(self.d_model, name="linear2")(h)
        tgt = tgt + drop("dropout3")(h)
        return tgt


class TransformerDecoder(nn.Module):
    """Stack of RelDecoderLayers returning all intermediate outputs, each
    passed through the shared final LayerNorm (transformer_detr.py:139-164)."""

    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, query_pos, rel_pos, query_mask, memory_mask, train: bool):
        norm = nn.LayerNorm(name="norm")
        outputs = []
        x = tgt
        for i in range(self.num_layers):
            x = RelDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout, name=f"layer{i}"
            )(x, memory, query_pos, rel_pos, query_mask, memory_mask, train)
            outputs.append(norm(x))
        return jnp.stack(outputs)  # [L, B, Q, d]
