"""Differentiable fused attention: Pallas forward + Pallas backward.

The training step spends most of its time in attention forward+backward under
the stock XLA lowering (thousands of [32, 32] matmuls each way). This module
wraps the block-packed attention in a ``jax.custom_vjp`` whose backward pass
is also a Pallas kernel using the same row-block packing: the backward
recomputes probabilities in VMEM (nothing is saved but the inputs — flash-
style rematerialization) and accumulates weight gradients across the grid in
a VMEM-resident output block.

Attention-weight dropout (the reference trains with p=0.1 on the attention
probabilities, functional.py:244) is supported with the on-chip PRNG: the
forward and backward kernels regenerate identical masks from the same seed,
so no mask tensor is ever materialized.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probs(qkv, big_mask, h, d_model, head_dim, scale, dtype):
    q = qkv[:, h * head_dim : (h + 1) * head_dim]
    k = qkv[:, d_model + h * head_dim : d_model + (h + 1) * head_dim]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    scores = scores + big_mask
    # max-subtracted softmax (see ops/layer.py note: q·k can overflow exp)
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), -1e30)
    exp = jnp.exp(scores - m)
    p = exp / jnp.sum(exp, axis=-1, keepdims=True)
    return q, k, p  # p in f32


def _dropout_mask(shape, rate, interpret=False, salt=0):
    """Deterministic dropout keep-mask: on-chip PRNG on TPU; a shader-style
    hash in interpret mode (prng primitives have no CPU lowering). Forward
    and backward regenerate identical masks from the same seed/salt."""
    if interpret:
        r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        u = jnp.sin(
            (r * 12.9898 + c * 78.233 + salt * 37.719).astype(jnp.float32)
        ) * 43758.5453
        u = u - jnp.floor(u)
        return (u >= rate).astype(jnp.float32)
    bits = pltpu.prng_random_bits(shape)
    # uniform in [0, 1) from the top 24 bits; route through int32 (Mosaic has
    # no uint32 -> float cast; the shifted value is < 2^24 so int32-safe)
    top24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
    u = top24.astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32)


def _fwd_kernel(
    seed_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, mask_ref, out_ref,
    *, n_heads, seq_len, d_model, tile_b, causal, dropout_rate, interpret,
):
    head_dim = d_model // n_heads
    rows = tile_b * seq_len
    scale = head_dim ** -0.5
    x = x_ref[:].reshape(rows, d_model)

    if dropout_rate > 0.0 and not interpret:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    salt0 = seed_ref[0] * 1009 + pl.program_id(0)

    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)

    r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    allowed = (r // seq_len) == (c // seq_len)
    if causal:
        allowed = allowed & ((c % seq_len) <= (r % seq_len))
    big_mask = jnp.where(allowed, mask_ref[0], -jnp.inf)

    ctx_heads = []
    for h in range(n_heads):
        _, _, p = _probs(qkv, big_mask, h, d_model, head_dim, scale, x.dtype)
        if dropout_rate > 0.0:
            keep = _dropout_mask(p.shape, dropout_rate, interpret, salt0 * 31 + h)
            p = p * keep * (1.0 / (1.0 - dropout_rate))
        v = qkv[:, 2 * d_model + h * head_dim : 2 * d_model + (h + 1) * head_dim]
        ctx_heads.append(
            jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32).astype(x.dtype)
        )
    ctx = jnp.concatenate(ctx_heads, axis=1)
    out = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (out + bo_ref[:].astype(jnp.float32)).astype(x.dtype).reshape(
        tile_b, seq_len, d_model
    )


def _bwd_kernel(
    seed_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, mask_ref, g_ref,
    dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
    *, n_heads, seq_len, d_model, tile_b, causal, dropout_rate, interpret,
):
    head_dim = d_model // n_heads
    rows = tile_b * seq_len
    scale = head_dim ** -0.5
    f32 = jnp.float32

    x = x_ref[:].reshape(rows, d_model)
    g = g_ref[:].reshape(rows, d_model)
    dtype = x.dtype

    if dropout_rate > 0.0 and not interpret:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    salt0 = seed_ref[0] * 1009 + pl.program_id(0)

    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=f32)
    qkv = (qkv + bqkv_ref[:].astype(f32)).astype(dtype)

    r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    allowed = (r // seq_len) == (c // seq_len)
    if causal:
        allowed = allowed & ((c % seq_len) <= (r % seq_len))
    big_mask = jnp.where(allowed, mask_ref[0], -jnp.inf)

    # dctx (pre-out-proj grad) and out-proj grads
    dctx = jnp.dot(g, wo_ref[:].T, preferred_element_type=f32).astype(dtype)

    ctx_heads = []
    dqkv_parts_q, dqkv_parts_k, dqkv_parts_v = [], [], []
    for h in range(n_heads):
        q, k, p = _probs(qkv, big_mask, h, d_model, head_dim, scale, dtype)
        if dropout_rate > 0.0:
            # identical to the forward mask (same seed/salt/call order)
            keep = _dropout_mask(p.shape, dropout_rate, interpret, salt0 * 31 + h)
        v = qkv[:, 2 * d_model + h * head_dim : 2 * d_model + (h + 1) * head_dim]
        dctx_h = dctx[:, h * head_dim : (h + 1) * head_dim]

        p_eff = p
        if dropout_rate > 0.0:
            p_eff = p * keep * (1.0 / (1.0 - dropout_rate))
        pe16 = p_eff.astype(dtype)
        ctx_heads.append(
            jnp.dot(pe16, v, preferred_element_type=f32).astype(dtype)
        )

        # dv = p_eff^T @ dctx_h
        dv = jax.lax.dot_general(
            pe16, dctx_h, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        # dp = dctx_h @ v^T (through dropout scaling)
        dp = jax.lax.dot_general(
            dctx_h, v, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )
        if dropout_rate > 0.0:
            dp = dp * keep * (1.0 / (1.0 - dropout_rate))
        # softmax backward: ds = p * (dp - sum(dp * p))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=f32
        ) * scale
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=f32
        ) * scale
        dqkv_parts_q.append(dq.astype(dtype))
        dqkv_parts_k.append(dk.astype(dtype))
        dqkv_parts_v.append(dv.astype(dtype))

    ctx = jnp.concatenate(ctx_heads, axis=1)
    dqkv = jnp.concatenate(dqkv_parts_q + dqkv_parts_k + dqkv_parts_v, axis=1)

    # input grad
    dx = jnp.dot(dqkv, wqkv_ref[:].T, preferred_element_type=f32)
    dx_ref[:] = dx.astype(dtype).reshape(tile_b, seq_len, d_model)

    # weight grads: accumulate across grid steps (f32 accumulators)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    dwqkv_ref[:] += jax.lax.dot_general(
        x, dqkv, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    dbqkv_ref[:] += jnp.sum(dqkv.astype(f32), axis=0, keepdims=True)
    dwo_ref[:] += jax.lax.dot_general(
        ctx, g, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    dbo_ref[:] += jnp.sum(g.astype(f32), axis=0, keepdims=True)


def _call_fwd(seed, x, wqkv, bqkv, wo, bo, mask, n_heads, tile_b, causal,
              dropout_rate, interpret):
    b, s, d = x.shape
    rows = tile_b * s
    kernel = functools.partial(
        _fwd_kernel, n_heads=n_heads, seq_len=s, d_model=d, tile_b=tile_b,
        causal=causal, dropout_rate=dropout_rate, interpret=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, s, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wqkv.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bqkv.shape, lambda i, *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(wo.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bo.shape, lambda i, *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, s, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(seed, x, wqkv, bqkv, wo, bo, mask.reshape(b // tile_b, 1, rows))


def _call_bwd(seed, x, wqkv, bqkv, wo, mask, g, n_heads, tile_b, causal,
              dropout_rate, interpret):
    b, s, d = x.shape
    rows = tile_b * s
    kernel = functools.partial(
        _bwd_kernel, n_heads=n_heads, seq_len=s, d_model=d, tile_b=tile_b,
        causal=causal, dropout_rate=dropout_rate, interpret=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, s, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wqkv.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bqkv.shape, lambda i, *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(wo.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, s, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, s, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wqkv.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bqkv.shape[0]), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wo.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, s, d), x.dtype),
            jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, bqkv.shape[0]), jnp.float32),
            jax.ShapeDtypeStruct(wo.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(seed, x, wqkv, bqkv, wo, mask.reshape(b // tile_b, 1, rows), g)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10)
)
def fused_mha_train(x, wqkv, bqkv, wo, bo, mask, seed, n_heads, tile_b,
                    causal, dropout_rate):
    """Differentiable fused attention.

    ``seed`` is an ``int32[1]`` array (traced OK); gradients flow to x and
    the four weight tensors.
    """
    interpret = jax.default_backend() == "cpu"
    return _call_fwd(seed, x, wqkv, bqkv, wo, bo, mask, n_heads, tile_b,
                     causal, dropout_rate, interpret)


def _fwd_rule(x, wqkv, bqkv, wo, bo, mask, seed, n_heads, tile_b, causal,
              dropout_rate):
    out = fused_mha_train(x, wqkv, bqkv, wo, bo, mask, seed, n_heads, tile_b,
                          causal, dropout_rate)
    return out, (x, wqkv, bqkv, wo, mask, seed)


def _bwd_rule(n_heads, tile_b, causal, dropout_rate, residuals, g):
    import numpy as np

    x, wqkv, bqkv, wo, mask, seed = residuals
    interpret = jax.default_backend() == "cpu"
    dx, dwqkv, dbqkv, dwo, dbo = _call_bwd(
        seed, x, wqkv, bqkv, wo, mask, g, n_heads, tile_b, causal,
        dropout_rate, interpret,
    )
    float0 = jax.dtypes.float0
    return (
        dx,
        dwqkv.astype(wqkv.dtype),
        dbqkv[0].astype(bqkv.dtype),
        dwo.astype(wo.dtype),
        dbo[0].astype(wo.dtype),
        np.zeros(mask.shape, float0),   # mask: no gradient
        np.zeros(seed.shape, float0),   # seed: int, no gradient
    )


fused_mha_train.defvjp(_fwd_rule, _bwd_rule)
