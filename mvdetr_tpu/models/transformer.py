"""Vanilla (dense) transformer encoder, DETR-style.

Contract from `/root/reference/multiview_detector/models/transformer.py:37-65`:
positional embeds are added to queries and keys only (not values), post-norm
residual blocks with ReLU FFN.
"""

from __future__ import annotations

import flax.linen as nn


class TransformerEncoderLayer(nn.Module):
    d_model: int = 128
    nhead: int = 8
    dim_feedforward: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, pos=None, train: bool = True):
        q = k = src if pos is None else src + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead,
            qkv_features=self.d_model,
            out_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
            name="self_attn",
        )(inputs_q=q, inputs_k=k, inputs_v=src)
        src = src + nn.Dropout(self.dropout, deterministic=not train)(attn)
        src = nn.LayerNorm(name="norm1")(src)
        y = nn.Dense(self.dim_feedforward, name="linear1")(src)
        y = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(y))
        y = nn.Dense(self.d_model, name="linear2")(y)
        src = src + nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.LayerNorm(name="norm2")(src)


class TransformerEncoder(nn.Module):
    num_layers: int = 3
    d_model: int = 128
    nhead: int = 8
    dim_feedforward: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, pos=None, train: bool = True):
        out = src
        for i in range(self.num_layers):
            out = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout, name=f"layer{i}"
            )(out, pos, train)
        return out
