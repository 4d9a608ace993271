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
import jax
import jax.numpy as jnp


def kaiming_embed_init(fan_in: int):
    """torch ``kaiming_normal_(mode='fan_in')`` on a [num, fan_in] table:
    std = sqrt(2 / fan_in)."""
    return nn.initializers.normal(stddev=(2.0 / fan_in) ** 0.5)


class MultiheadSelfAttention(nn.Module):
    """Fused-QKV multi-head self-attention (reference: layers/attention.py +
    functional.py:8-256, re-designed batch-first).

    Two execution paths over the same parameters:
    - ``impl='xla'``: einsum formulation (training path; supports
      attention-weight dropout);
    - ``impl='pallas'``: the fused VMEM kernel (ops/attention.py), used when
      deterministic — the inference hot path.

    ``key_pad`` is an additive float mask ``[B, S]`` (0 = attend, -inf = pad).
    """

    d_model: int
    n_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_pad: Optional[jnp.ndarray] = None,
        causal: bool = False,
        deterministic: bool = True,
        decode_index=None,
        decode_len: Optional[int] = None,
    ) -> jnp.ndarray:
        from ..ops.attention import fused_mha, mha_reference, pick_tile_b

        d = self.d_model
        init = nn.initializers.lecun_normal()
        wqkv = self.param("wqkv", init, (d, 3 * d), jnp.float32)
        bqkv = self.param("bqkv", nn.initializers.zeros, (3 * d,), jnp.float32)
        wo = self.param("wo", init, (d, d), jnp.float32)
        bo = self.param("bo", nn.initializers.zeros, (d,), jnp.float32)
        wqkv, bqkv = wqkv.astype(self.dtype), bqkv.astype(self.dtype)
        wo, bo = wo.astype(self.dtype), bo.astype(self.dtype)

        b, s, _ = x.shape

        if decode_index is not None:
            # KV-cached single-token step: x [B, 1, D], attend over the cache
            # prefix [0, decode_index]. key_pad [B, L] masks EOS'd positions.
            h, hd = self.n_heads, d // self.n_heads
            length = decode_len
            qkv = (x.reshape(b, d) @ wqkv + bqkv)  # [B, 3D]
            q, k_t, v_t = qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :]

            ck = self.variable(
                "cache", "k", lambda: jnp.zeros((b, length, d), self.dtype)
            )
            cv = self.variable(
                "cache", "v", lambda: jnp.zeros((b, length, d), self.dtype)
            )
            ck.value = jax.lax.dynamic_update_index_in_dim(
                ck.value, k_t.astype(self.dtype), decode_index, axis=1
            )
            cv.value = jax.lax.dynamic_update_index_in_dim(
                cv.value, v_t.astype(self.dtype), decode_index, axis=1
            )

            qh = q.reshape(b, h, hd) * (hd ** -0.5)
            kh = ck.value.reshape(b, length, h, hd)
            scores = jnp.einsum(
                "bhd,bkhd->bhk", qh, kh, preferred_element_type=jnp.float32
            )  # [B, H, L]
            pos = jnp.arange(length)
            scores = jnp.where(
                (pos <= decode_index)[None, None, :], scores, -jnp.inf
            )
            if key_pad is not None:
                scores = scores + key_pad[:, None, :]
            p = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            vh = cv.value.reshape(b, length, h, hd)
            ctx = jnp.einsum("bhk,bkhd->bhd", p, vh).reshape(b, d)
            out = (ctx @ wo + bo).astype(self.dtype)
            return out.reshape(b, 1, d)

        use_pallas = self.impl == "pallas" and deterministic
        if use_pallas:
            mask = (
                key_pad.astype(jnp.float32)
                if key_pad is not None
                else jnp.zeros((b, s), jnp.float32)
            )
            return fused_mha(
                x, wqkv, bqkv, wo, bo, mask,
                n_heads=self.n_heads, tile_b=pick_tile_b(b, s), causal=causal,
            )

        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.dropout > 0.0)
            else None
        )
        return mha_reference(
            x, wqkv, bqkv, wo, bo, key_pad, self.n_heads, causal=causal,
            dropout_rate=self.dropout if not deterministic else 0.0,
            dropout_rng=rng,
        )


def key_padding_to_additive(key_padding_mask: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """``[B, S_k]`` bool (True = masked) -> additive ``[B, S_k]`` float."""
    if key_padding_mask is None:
        return None
    return jnp.where(key_padding_mask, -jnp.inf, 0.0)


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
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        key_pad: Optional[jnp.ndarray] = None,
        label_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)
        src1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src)
        attn = MultiheadSelfAttention(
            self.d_model, self.n_heads, self.dropout, self.dtype, self.attn_impl,
            name="self_attn",
        )(src1, key_pad=key_pad, deterministic=deterministic)
        src = src + drop(attn)

        if self.use_label and label_emb is not None:
            inj = nn.Dense(self.d_model, dtype=self.dtype, name="linear_global2")(label_emb)
            src = src + drop(inj)

        src1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)
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
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        z: jnp.ndarray,
        key_pad: Optional[jnp.ndarray] = None,
        causal: bool = False,
        label_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        decode_index=None,
        decode_len: Optional[int] = None,
    ) -> jnp.ndarray:
        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)
        tgt1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)
        attn = MultiheadSelfAttention(
            self.d_model, self.n_heads, self.dropout, self.dtype, self.attn_impl,
            name="self_attn",
        )(tgt1, key_pad=key_pad, causal=causal, deterministic=deterministic,
          decode_index=decode_index, decode_len=decode_len)
        tgt = tgt + drop(attn)

        # z: [B, 1, dim_z] or [B, dim_z] — broadcast-added over sequence.
        if z.ndim == 2:
            z = z[:, None, :]
        inj = nn.Dense(self.d_model, dtype=self.dtype, name="linear_global")(z)
        tgt = tgt + drop(inj)

        if self.use_label and label_emb is not None:
            inj2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear_global2")(label_emb)
            tgt = tgt + drop(inj2)

        tgt1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)
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
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, src, key_pad=None, label_emb=None, deterministic=True):
        for i in range(self.n_layers):
            src = EncoderLayerImproved(
                self.d_model, self.n_heads, self.dim_feedforward, self.dropout,
                self.use_label, self.dtype, self.attn_impl, name=f"layer_{i}",
            )(src, key_pad=key_pad, label_emb=label_emb, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(src)


class DecoderStack(nn.Module):
    """N global-conditioned decoder layers + final LayerNorm."""

    n_layers: int
    d_model: int
    n_heads: int
    dim_feedforward: int
    dropout: float
    use_label: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, tgt, z, key_pad=None, causal=False, label_emb=None,
                 deterministic=True, decode_index=None, decode_len=None):
        for i in range(self.n_layers):
            tgt = DecoderLayerGlobalImproved(
                self.d_model, self.n_heads, self.dim_feedforward, self.dropout,
                self.use_label, self.dtype, self.attn_impl, name=f"layer_{i}",
            )(tgt, z, key_pad=key_pad, causal=causal, label_emb=label_emb,
              deterministic=deterministic, decode_index=decode_index,
              decode_len=decode_len)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tgt)


class PositionalEncodingLUT(nn.Module):
    """Learned positional table added to the input, then dropout
    (reference: layers/positional_encoding.py:24-43)."""

    max_len: int
    d_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 index=None) -> jnp.ndarray:
        table = self.param(
            "pos_embed", kaiming_embed_init(self.d_model), (self.max_len, self.d_model)
        )
        if index is not None:
            # single-position lookup (KV-cached decoding): x [B, 1, D]
            x = x + jax.lax.dynamic_slice_in_dim(
                table.astype(self.dtype), index, 1, axis=0
            )[None]
        else:
            s = x.shape[-2]
            x = x + table[:s].astype(self.dtype)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)
