"""Fully-fused transformer layer kernels (Pallas TPU).

One kernel per layer: LN1 -> self-attention -> residual [-> latent injection]
-> LN2 -> feed-forward -> residual, entirely in VMEM. Beyond the fused
attention (ops/attention.py), this removes the ~6 HBM round-trips per layer
that LayerNorms, residual adds and the FF block cost under a stock XLA
lowering — at bench shapes those bandwidth passes are comparable to the
attention itself.

Residual accumulation is float32 (slightly *better* numerics than the bf16
XLA path); matmuls follow the same block-packing strategy as fused_mha.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer_norm_f32(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * scale + bias


def _attention_block(xn, wqkv_ref, bqkv_ref, wo_ref, bo_ref, mask_ref,
                     n_heads, d_model, seq_len, causal, attn_rows):
    """Block-packed attention on the LN'd input (see ops/attention.py).

    ``attn_rows`` decouples the ATTENTION block from the dense-matmul row
    tile: the QKV/out projections run over all ``rows`` (best MXU shapes),
    while scores/softmax/pv run per ``attn_rows`` sub-block. The packed
    block-diagonal mask wastes score FLOPs quadratically in the block size
    but dense-matmul efficiency grows with the tile — decoupling takes both
    (docs/PERFORMANCE.md "Sub-blocked attention"). ``attn_rows`` must be a
    multiple of ``seq_len`` so sequences never straddle blocks."""
    rows = xn.shape[0]
    head_dim = d_model // n_heads
    scale = head_dim ** -0.5
    qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(xn.dtype)

    ctx_blocks = []
    for r0 in range(0, rows, attn_rows):
        big_mask = _make_big_mask(mask_ref, r0, attn_rows, seq_len, causal)
        ctx_heads = []
        for h in range(n_heads):
            q = qkv[r0:r0 + attn_rows, h * head_dim : (h + 1) * head_dim]
            k = qkv[r0:r0 + attn_rows,
                    d_model + h * head_dim : d_model + (h + 1) * head_dim]
            v = qkv[r0:r0 + attn_rows,
                    2 * d_model + h * head_dim : 2 * d_model + (h + 1) * head_dim]
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            # f32 softmax with a two-sided score CLAMP (not max-subtraction):
            # LN bounds x but not q·k — rare rows can exceed exp's f32 range
            # in BOTH directions once QKV norms grow (a flagship self-match
            # training run NaN'd from this; all-negative rows also underflow
            # to a 0/0 after TPU subnormal flush). The training kernels
            # (ops/layer_vjp.py) max-subtract exactly; here on the inference
            # hot path a full row-max reduce costs ~20% end-to-end (22.8k ->
            # 18.1k samples/s measured), while the fuseable clip is free:
            # exact whenever |scores| <= 75 (typical scores are O(10)),
            # saturating beyond. Clamp BEFORE the mask add so padded keys
            # stay exp(-inf) = 0.
            scores = jnp.clip(scores, -75.0, 75.0) + big_mask
            exp = jnp.exp(scores)
            # guard the all-masked-row 0/0 (happens only for alignment-pad
            # rows, whose outputs are sliced away): any row with >= 1 valid
            # key has sum >= exp(-75) >> 1e-30, so this is exact elsewhere
            den = jnp.maximum(jnp.sum(exp, axis=-1, keepdims=True), 1e-30)
            p = (exp / den).astype(xn.dtype)
            ctx_heads.append(
                jnp.dot(p, v, preferred_element_type=jnp.float32).astype(xn.dtype)
            )
        ctx_blocks.append(jnp.concatenate(ctx_heads, axis=1))
    ctx = (jnp.concatenate(ctx_blocks, axis=0) if len(ctx_blocks) > 1
           else ctx_blocks[0])
    out = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
    return out + bo_ref[:].astype(jnp.float32)


def _make_big_mask(mask_ref, r0, rows, seq_len, causal):
    """[rows, rows] additive mask for the sub-block starting at packed row
    ``r0`` (block-diagonal per sequence + key padding)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    allowed = (r // seq_len) == (c // seq_len)
    if causal:
        allowed = allowed & ((c % seq_len) <= (r % seq_len))
    key_pad = mask_ref[0, :, r0:r0 + rows]  # [1, rows] (2D keeps Mosaic layouts)
    return jnp.where(allowed, key_pad, -jnp.inf)


def _ffn_block(x_res, ln2_s, ln2_b, w1_ref, b1_ref, w2_ref, b2_ref, dtype):
    xn2 = _layer_norm_f32(x_res, ln2_s, ln2_b).astype(dtype)
    h = jnp.dot(xn2, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:].astype(jnp.float32), 0.0).astype(dtype)
    ff = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    return ff + b2_ref[:].astype(jnp.float32)


def _layer_kernel(
    x_ref, bias_ref, ln1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, ln2_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, mask_ref, out_ref,
    *, n_heads, seq_len, d_model, tile_b, causal, use_bias, attn_rows=None,
):
    """Shared encoder/decoder layer body. ``bias_ref [tile_b, D]`` carries the
    per-sequence additive injections (decoder latent, label conditioning) —
    constant over the sequence axis, so they fold into one broadcast add
    between the attention and FF blocks (addition commutes; exact parity with
    the reference's separate injections)."""
    rows = tile_b * seq_len
    dtype = x_ref.dtype
    x = x_ref[:].reshape(rows, d_model).astype(jnp.float32)

    ln1 = ln1_ref[:].astype(jnp.float32)
    xn = _layer_norm_f32(x, ln1[0:1], ln1[1:2]).astype(dtype)
    x = x + _attention_block(xn, wqkv_ref, bqkv_ref, wo_ref, bo_ref, mask_ref,
                             n_heads, d_model, seq_len, causal,
                             attn_rows or rows)

    if use_bias:
        inj = bias_ref[:, 0, :].astype(jnp.float32)  # [tile_b, D]
        x = x + jnp.broadcast_to(
            inj[:, None, :], (tile_b, seq_len, d_model)
        ).reshape(rows, d_model)

    ln2 = ln2_ref[:].astype(jnp.float32)
    x = x + _ffn_block(x, ln2[0:1], ln2[1:2], w1_ref, b1_ref, w2_ref, b2_ref, dtype)
    out_ref[:] = x.astype(dtype).reshape(tile_b, seq_len, d_model)


def _common_specs(d, dff, tile_b, s):
    rows = tile_b * s
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    return rows, full


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "tile_b", "causal", "interpret", "attn_rows"),
)
def fused_layer(
    x, seq_bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2, mask,
    n_heads: int, tile_b: int = 8, causal: bool = False, interpret: bool = False,
    attn_rows: int | None = None,
):
    """One fused transformer layer. ``seq_bias [B, D]`` (or None) is the
    combined per-sequence injection — decoder latent ``z @ Wg + bg`` and/or
    label conditioning ``label_emb @ W2 + b2`` — computed outside (tiny
    matmuls) and broadcast-added in-kernel. ln1/ln2 are stacked [2, D]; mask
    is [B, S] additive float32."""
    b, s, d = x.shape
    dff = w1.shape[-1]
    assert b % tile_b == 0
    if jax.default_backend() == "cpu":
        interpret = True
    rows, full = _common_specs(d, dff, tile_b, s)

    use_bias = seq_bias is not None
    if seq_bias is None:
        seq_bias = jnp.zeros((b, d), x.dtype)

    if attn_rows is None:
        # auto: the attention knee is ~256 rows (scripts/bench_layer_tile.py
        # sweep — block-diagonal score waste grows quadratically past it,
        # fixed per-block overheads dominate below it); dense matmuls keep
        # the full row tile either way
        a = 1
        while (a * 2 * s <= 256) and (tile_b % (a * 2) == 0):
            a *= 2
        attn_rows = a * s if a < tile_b else None
    if attn_rows is not None:
        assert attn_rows % s == 0 and rows % attn_rows == 0, (attn_rows, s)
    kernel = functools.partial(
        _layer_kernel, n_heads=n_heads, seq_len=s, d_model=d,
        tile_b=tile_b, causal=causal, use_bias=use_bias, attn_rows=attn_rows,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # [b, 1, d] with a unit middle dim: the block's trailing dims are
            # (1, d) = the full array dims, legal for ANY tile_b (a 2D
            # (tile_b, d) block violates Mosaic's 8-sublane rule at tile_b < 8,
            # which one-stage models hit via pick_tile_b(s=257) = 1)
            pl.BlockSpec((tile_b, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full(ln1.shape), full(wqkv.shape), full(bqkv.shape),
            full(wo.shape), full(bo.shape), full(ln2.shape),
            full(w1.shape), full(b1.shape), full(w2.shape), full(b2.shape),
            pl.BlockSpec((1, 1, rows), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, seq_bias.reshape(b, 1, d), ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2,
      mask.reshape(b // tile_b, 1, rows))


def fused_encoder_layer(
    x, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2, mask,
    n_heads: int, tile_b: int = 8, causal: bool = False, interpret: bool = False,
    seq_bias=None,
):
    """Encoder layer (optional label-injection bias)."""
    return fused_layer(
        x, seq_bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2, mask,
        n_heads=n_heads, tile_b=tile_b, causal=causal, interpret=interpret,
    )


def fused_decoder_layer(
    x, z, ln1, wqkv, bqkv, wo, bo, wg, bg, ln2, w1, b1, w2, b2, mask,
    n_heads: int, tile_b: int = 8, causal: bool = False, interpret: bool = False,
    extra_bias=None,
):
    """Decoder layer: latent injection (+ optional label bias) folded into the
    per-sequence bias."""
    seq_bias = (z @ wg + bg).astype(x.dtype)
    if extra_bias is not None:
        seq_bias = seq_bias + extra_bias.astype(x.dtype)
    return fused_layer(
        x, seq_bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2, mask,
        n_heads=n_heads, tile_b=tile_b, causal=causal, interpret=interpret,
    )

