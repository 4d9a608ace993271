"""Fused KV-cached autoregressive decode step (Pallas TPU).

The KV-cached scan (models/sample.py:autoregressive_sample_cached) is already
5.8x over per-token re-forwarding, but each token step still dispatches ~10
small XLA ops per layer on ``[R, 1, D]`` tensors — LayerNorms, cache reads,
einsum attention, injections, the FF pair — each a separate HBM round-trip at
bandwidth-unfriendly sizes.

This kernel runs the ENTIRE decoder stack for one token in a single Pallas
call: all L layers (LN1 -> cached attention -> latent injection -> LN2 -> FF)
plus the final stack LayerNorm, reading each layer's K/V cache block once.
The new K/V rows are returned for XLA to scatter into the caches (one
``dynamic_update_index`` per layer — writing inside the kernel would force a
full cache write-back per step).

Cached attention for the current token t: exp-scores over past positions
(pos < t, key-padding applied) PLUS the current token's own k/v handled as an
explicit extra term — softmax over [past .. current] without materializing an
updated cache first.

Reference semantics: deepsvg/model/model.py:424-438 greedy autoregressive
loop; layer math identical to models/layers.py `_attention_cached` + XLA FFN.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _ln(x, scale, bias):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + _EPS) * scale + bias


def _decode_kernel(
    idx_ref, x_ref, bias_ref, ln1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    ln2_ref, w1_ref, b1_ref, w2_ref, b2_ref, lnf_ref, kc_ref, vc_ref, kp_ref,
    y_ref, knew_ref, vnew_ref,
    *, n_layers, n_heads, d_model, tile_r, cache_len,
):
    head_dim = d_model // n_heads
    scale = head_dim ** -0.5
    dtype = x_ref.dtype
    f32 = jnp.float32
    idx = idx_ref[0]

    x = x_ref[:, 0, :].astype(f32)  # [tile_r, D]
    kp = kp_ref[:, 0, :].astype(f32)  # [tile_r, T] additive
    pos = jax.lax.broadcasted_iota(jnp.int32, (tile_r, cache_len), 1)
    past = pos < idx
    add_mask = jnp.where(past, kp, -jnp.inf)  # [tile_r, T]
    # key-padding also applies to the current token's own score (parity with
    # the cached-einsum path, which masks pos <= idx THEN adds key_pad).
    # Column extraction as a masked reduction: Mosaic has no dynamic_slice.
    kp_cur = jnp.sum(
        jnp.where(pos == idx, kp, 0.0), axis=1, keepdims=True
    )  # [tile_r, 1]

    for l in range(n_layers):
        ln1 = ln1_ref[l].astype(f32)
        xn1 = _ln(x, ln1[0:1], ln1[1:2]).astype(dtype)
        qkv = jnp.dot(xn1, wqkv_ref[l], preferred_element_type=f32)
        qkv = qkv + bqkv_ref[l, 0].astype(f32)
        k_t = qkv[:, d_model : 2 * d_model].astype(dtype)
        v_t = qkv[:, 2 * d_model :].astype(dtype)
        knew_ref[l, :, 0, :] = k_t
        vnew_ref[l, :, 0, :] = v_t

        kc = kc_ref[l]  # [tile_r, T, D]
        vc = vc_ref[l]
        ctx_parts = []
        for h in range(n_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q_h = qkv[:, h * head_dim : (h + 1) * head_dim] * scale  # f32
            # caches stay bf16 in HBM/VMEM (half the bandwidth — the decode
            # bottleneck); the batched matvecs run f32 — Mosaic's batched
            # tpu.matmul only lowers the f32 vector-like form.
            k_h = kc[:, :, sl].astype(f32)  # [tile_r, T, hd]
            v_h = vc[:, :, sl].astype(f32)
            # batched matvec as a VPU broadcast-multiply + lane reduction:
            # the dot_general form compiles alone but Mosaic fuses the
            # following mask-add into the matmul accumulator and rejects it
            # ("only constant accumulators supported")
            s_past = jnp.sum(k_h * q_h[:, None, :], axis=-1)  # [tile_r, T]
            s_cur = jnp.sum(
                q_h * k_t[:, sl].astype(f32), axis=-1, keepdims=True
            )  # [tile_r, 1]
            # two-sided clamp (see ops/layer.py note: q·k can exceed exp's
            # f32 range both ways once QKV norms grow); clamp before the
            # mask add so masked positions stay exp(-inf)=0
            e_past = jnp.exp(jnp.clip(s_past, -75.0, 75.0) + add_mask)
            e_cur = jnp.exp(jnp.clip(s_cur, -75.0, 75.0) + kp_cur)
            denom = jnp.sum(e_past, axis=-1, keepdims=True) + e_cur
            p_past = e_past / denom
            # VPU form again: any add following a tpu.matmul gets fused into
            # its accumulator, which Mosaic only supports as a constant
            ctx_h = jnp.sum(v_h * p_past[:, :, None], axis=1)  # [tile_r, hd]
            ctx_h = ctx_h + (e_cur / denom) * v_t[:, sl].astype(f32)
            ctx_parts.append(ctx_h.astype(dtype))
        ctx = jnp.concatenate(ctx_parts, axis=1)  # [tile_r, D]
        attn = jnp.dot(ctx, wo_ref[l], preferred_element_type=f32)
        attn = attn + bo_ref[l, 0].astype(f32)

        x = x + attn + bias_ref[l, :, 0, :].astype(f32)

        ln2 = ln2_ref[l].astype(f32)
        xn2 = _ln(x, ln2[0:1], ln2[1:2]).astype(dtype)
        hpre = jnp.dot(xn2, w1_ref[l], preferred_element_type=f32)
        hpre = hpre + b1_ref[l, 0].astype(f32)
        h_act = jnp.maximum(hpre, 0.0).astype(dtype)
        ff = jnp.dot(h_act, w2_ref[l], preferred_element_type=f32)
        x = x + ff + b2_ref[l, 0].astype(f32)

    lnf = lnf_ref[:].astype(f32)
    y = _ln(x, lnf[0:1], lnf[1:2])
    y_ref[:, 0, :] = y.astype(dtype)


def _full(shape):
    return pl.BlockSpec(shape, lambda i, *_: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "tile_r", "interpret")
)
def fused_decode_step(
    x, seq_bias, ln1s, wqkvs, bqkvs, wos, bos, ln2s, w1s, b1s, w2s, b2s, lnf,
    kcache, vcache, key_pad, index,
    n_heads: int, tile_r: int = 8, interpret: bool = False,
):
    """One token through the whole decoder stack.

    Args:
      x: ``[R, D]`` current-token activations (embedding + positional).
      seq_bias: ``[L, R, D]`` per-layer per-sequence injections
        (``z @ Wg_l + bg_l`` [+ label]), constant across steps.
      ln1s..b2s: per-layer weight stacks (leading dim L); biases ``[L, 1, .]``.
      lnf: final stack LayerNorm ``[2, D]``.
      kcache/vcache: ``[L, R, T, D]``.
      key_pad: ``[R, T]`` additive float32.
      index: int32[1] current position (tokens at pos < index are cached).

    Returns ``(y [R, D], k_new [L, R, D], v_new [L, R, D])``; the caller
    scatters k_new/v_new into the caches at ``index``.
    """
    L, r, t, d = kcache.shape
    dff = w1s.shape[-1]
    if jax.default_backend() == "cpu":
        interpret = True
    assert r % tile_r == 0
    kernel = functools.partial(
        _decode_kernel, n_layers=L, n_heads=n_heads, d_model=d, tile_r=tile_r,
        cache_len=t,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, 1, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile_r, 1, d), lambda i, *_: (0, i, 0, 0), memory_space=pltpu.VMEM),
            _full(ln1s.shape), _full(wqkvs.shape), _full(bqkvs.shape),
            _full(wos.shape), _full(bos.shape), _full(ln2s.shape),
            _full(w1s.shape), _full(b1s.shape), _full(w2s.shape), _full(b2s.shape),
            _full(lnf.shape),
            pl.BlockSpec((L, tile_r, t, d), lambda i, *_: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile_r, t, d), lambda i, *_: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 1, t), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_r, 1, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile_r, 1, d), lambda i, *_: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile_r, 1, d), lambda i, *_: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    y, knew, vnew = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((r, 1, d), x.dtype),
            jax.ShapeDtypeStruct((L, r, 1, d), kcache.dtype),
            jax.ShapeDtypeStruct((L, r, 1, d), vcache.dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(index, x.reshape(r, 1, d), seq_bias.reshape(L, r, 1, d), ln1s, wqkvs,
      bqkvs, wos, bos, ln2s, w1s, b1s, w2s, b2s, lnf, kcache, vcache,
      key_pad.reshape(r, 1, t))
    return y[:, 0, :], knew[:, :, 0, :], vnew[:, :, 0, :]
