"""Transformer building blocks — flax.linen, batch-first ``[B, S, D]``.

These reproduce the reference's "improved" (pre-LN) layer semantics
(model/layers/improved_transformer.py):

- :class:`EncoderLayerImproved` — pre-LN self-attention + optional label
  injection + pre-LN feed-forward (improved_transformer.py:16-54).
- :class:`DecoderLayerGlobalImproved` — pre-LN self-attention, then the latent
  ``z`` injected as a per-layer learned linear broadcast (NO cross-attention;
  improved_transformer.py:97-141 — the architecturally unusual bit of DeepSVG).

Attention is a hand-rolled fused-projection MHA so the same module serves
training (full-sequence) and KV-cached autoregressive decoding. Everything is
batch-first; the reference's seq-first layout and ``_pack_group_batch``
permutes (utils/utils.py:20-49) are replaced by plain leading-axis reshapes
that XLA handles as no-op layout changes.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def kaiming_embed_init(fan_in: int):
    """torch ``kaiming_normal_(mode='fan_in')`` on a [num, fan_in] table:
    std = sqrt(2 / fan_in)."""
    return nn.initializers.normal(stddev=(2.0 / fan_in) ** 0.5)


class MultiheadAttention(nn.Module):
    """Fused-projection multi-head attention (reference: layers/attention.py +
    functional.py:8-256, re-designed batch-first for XLA fusion).

    ``mask`` is an additive float mask broadcastable to
    ``[B, n_heads, S_q, S_k]`` (0 = attend, -inf = blocked); key-padding and
    causal masks are combined by the caller.
    """

    d_model: int
    n_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        head_dim = self.d_model // self.n_heads
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        xq, xk, xv = dense("q_proj")(q), dense("k_proj")(k), dense("v_proj")(v)

        def split(x):  # [B, S, D] -> [B, H, S, hd]
            b, s, _ = x.shape
            return x.reshape(b, s, self.n_heads, head_dim).transpose(0, 2, 1, 3)

        xq, xk, xv = split(xq), split(xk), split(xv)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", xq * (head_dim**-0.5), xk,
            preferred_element_type=jnp.float32,
        )
        if mask is not None:
            scores = scores + mask
        weights = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        weights = nn.Dropout(self.dropout, deterministic=deterministic)(weights)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, xv)
        b, h, s, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)


def key_padding_to_additive(key_padding_mask: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """``[B, S_k]`` bool (True = masked) -> additive ``[B, 1, 1, S_k]`` float."""
    if key_padding_mask is None:
        return None
    return jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, 0.0)


def causal_additive_mask(seq_len: int) -> jnp.ndarray:
    """Additive causal mask broadcastable to ``[B, H, S, S]``."""
    allowed = jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool))
    return jnp.where(allowed, 0.0, -jnp.inf)[None, None, :, :]


def combine_masks(*masks: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """Sum additive attention masks, skipping Nones."""
    out = None
    for m in masks:
        if m is not None:
            out = m if out is None else out + m
    return out


class FeedForward(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)


class EncoderLayerImproved(nn.Module):
    """Pre-LN encoder layer (improved_transformer.py:42-54)."""

    d_model: int
    n_heads: int
    dim_feedforward: int
    dropout: float
    use_label: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        label_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)
        src1 = nn.LayerNorm(dtype=self.dtype, name="norm1")(src)
        attn = MultiheadAttention(
            self.d_model, self.n_heads, self.dropout, self.dtype, name="self_attn"
        )(src1, src1, src1, mask=mask, deterministic=deterministic)
        src = src + drop(attn)

        if self.use_label and label_emb is not None:
            inj = nn.Dense(self.d_model, dtype=self.dtype, name="linear_global2")(label_emb)
            src = src + drop(inj)

        src1 = nn.LayerNorm(dtype=self.dtype, name="norm2")(src)
        ff = FeedForward(self.d_model, self.dim_feedforward, self.dropout, self.dtype,
                         name="ff")(src1, deterministic)
        return src + drop(ff)


class DecoderLayerGlobalImproved(nn.Module):
    """Pre-LN decoder layer with latent injection instead of cross-attention
    (improved_transformer.py:126-141): ``tgt += linear_global(z)`` broadcast
    over the sequence axis."""

    d_model: int
    n_heads: int
    dim_feedforward: int
    dropout: float
    use_label: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        z: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        label_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)
        tgt1 = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt)
        attn = MultiheadAttention(
            self.d_model, self.n_heads, self.dropout, self.dtype, name="self_attn"
        )(tgt1, tgt1, tgt1, mask=mask, deterministic=deterministic)
        tgt = tgt + drop(attn)

        # z: [B, 1, dim_z] or [B, dim_z] — broadcast-added over sequence.
        if z.ndim == 2:
            z = z[:, None, :]
        inj = nn.Dense(self.d_model, dtype=self.dtype, name="linear_global")(z)
        tgt = tgt + drop(inj)

        if self.use_label and label_emb is not None:
            inj2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear_global2")(label_emb)
            tgt = tgt + drop(inj2)

        tgt1 = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt)
        ff = FeedForward(self.d_model, self.dim_feedforward, self.dropout, self.dtype,
                         name="ff")(tgt1, deterministic)
        return tgt + drop(ff)


class EncoderStack(nn.Module):
    """N encoder layers + final LayerNorm (reference TransformerEncoder,
    layers/transformer.py with norm)."""

    n_layers: int
    d_model: int
    n_heads: int
    dim_feedforward: int
    dropout: float
    use_label: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, mask=None, label_emb=None, deterministic=True):
        for i in range(self.n_layers):
            src = EncoderLayerImproved(
                self.d_model, self.n_heads, self.dim_feedforward, self.dropout,
                self.use_label, self.dtype, name=f"layer_{i}",
            )(src, mask=mask, label_emb=label_emb, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(src)


class DecoderStack(nn.Module):
    """N global-conditioned decoder layers + final LayerNorm."""

    n_layers: int
    d_model: int
    n_heads: int
    dim_feedforward: int
    dropout: float
    use_label: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, z, mask=None, label_emb=None, deterministic=True):
        for i in range(self.n_layers):
            tgt = DecoderLayerGlobalImproved(
                self.d_model, self.n_heads, self.dim_feedforward, self.dropout,
                self.use_label, self.dtype, name=f"layer_{i}",
            )(tgt, z, mask=mask, label_emb=label_emb, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(tgt)


class PositionalEncodingLUT(nn.Module):
    """Learned positional table added to the input, then dropout
    (reference: layers/positional_encoding.py:24-43)."""

    max_len: int
    d_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        table = self.param(
            "pos_embed", kaiming_embed_init(self.d_model), (self.max_len, self.d_model)
        )
        s = x.shape[-2]
        x = x + table[:s].astype(self.dtype)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)
