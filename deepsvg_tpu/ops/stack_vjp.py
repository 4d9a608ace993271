"""Fused multi-layer transformer STACK kernels (Pallas TPU, training).

Motivation (docs/sol_table.json): the hierarchical E2/D2 stages run G=8-token
sequences, where per-layer FLOPs are ~1/30 of the big stages and the fused
per-layer kernels' FIXED cost (kernel launch, grid setup, VMEM staging)
dominates — measured 4.4-6.8x over the analytic floor while the big stages
sit at ~2.4x. This module collapses a WHOLE L-layer stack into ONE forward
kernel and ONE backward kernel:

- grid = (L,): one grid step per layer, the ENTIRE batch resident in VMEM
  (only legal because the target stages are tiny — rows = B*S <= ~2048);
  the activation is carried across grid steps in a persistent VMEM scratch,
  so intermediate layer outputs never touch HBM in the forward;
- per-layer weights are STACKED with a leading [L] dim and streamed one
  layer per grid step by the Pallas pipeline (block index = layer);
- the backward runs the same grid REVERSED (block index = L-1-l), carries
  the input-gradient in scratch, and writes each layer's weight grads
  exactly once — no cross-step accumulation, no output revisiting;
- residuals: layer inputs, pre-dropout attention probs and FF hidden are
  saved per layer (the production save-residuals mode of the single-layer
  VJP, ops/layer_vjp.py — these stages' residuals are tiny).

Numerics and dropout semantics exactly follow ops/layer_vjp.py (the
per-layer kernels): same LN/softmax math, same per-(seed, pid, site) PRNG
re-seeding with pid = LAYER index here (distinct masks per layer, backward
regenerates them independent of draw order). The attention uses the
sub-blocked 2-D form (the rank-3 batched form does not compile on the real
chip — docs/PERFORMANCE.md "Negative result").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layer_vjp import (
    _attn_fwd_head,
    _auto_attn_rows,
    _big_mask,
    _ln_bwd,
    _ln_fwd,
    _site_mask,
    _SITE_ATTN_OUT,
    _SITE_FF_HIDDEN,
    _SITE_FF_OUT,
)


def _attention_fwd(qkv, mask_ref, seed_val, pid, rate, kp, interpret, save,
                   p_ref, n_heads, d_model, head_dim, seq_len, rows,
                   attn_rows, causal, scale, dtype):
    """Sub-blocked attention forward shared by the stack fwd/bwd kernels;
    returns (ctx, cache) where cache holds per-(block, head) tensors for
    the backward (empty when save-residuals supplies them)."""
    n_blocks = rows // attn_rows
    ctx_blocks, block_cache = [], []
    for bi, r0 in enumerate(range(0, rows, attn_rows)):
        bm = _big_mask(mask_ref, r0, attn_rows, seq_len, causal)
        ctx_heads, head_cache = [], []
        for h in range(n_heads):
            q, k, v, p = _attn_fwd_head(qkv, bm, h, d_model, head_dim,
                                        scale, r0, attn_rows)
            if save:
                p_ref[0, r0:r0 + attn_rows,
                      h * attn_rows:(h + 1) * attn_rows] = p.astype(p_ref.dtype)
            keep = (
                _site_mask(p.shape, rate, interpret, seed_val, pid,
                           h * n_blocks + bi)
                if rate > 0.0 else None
            )
            pe = p * keep * kp if rate > 0.0 else p
            head_cache.append((q, k, v, p, keep))
            ctx_heads.append(
                jnp.dot(pe.astype(dtype), v,
                        preferred_element_type=jnp.float32).astype(dtype))
        block_cache.append(head_cache)
        ctx_blocks.append(jnp.concatenate(ctx_heads, axis=1))
    ctx = (jnp.concatenate(ctx_blocks, axis=0) if n_blocks > 1
           else ctx_blocks[0])
    return ctx, block_cache


def _stack_fwd_kernel(
    seed_ref, x_ref, bias_ref, ln1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    ln2_ref, w1_ref, b1_ref, w2_ref, b2_ref, mask_ref,
    out_ref, xsave_ref, p_ref, hact_ref,
    xcur,
    *, n_layers, n_heads, seq_len, d_model, batch, causal, rate, interpret,
    attn_rows,
):
    head_dim = d_model // n_heads
    rows = batch * seq_len
    scale = head_dim ** -0.5
    kp = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    dtype = x_ref.dtype
    seed_val = seed_ref[0]
    l = pl.program_id(0)
    pid = l  # dropout-site salt: the LAYER index (backward reuses it)

    @pl.when(l == 0)
    def _load_input():
        xcur[:] = x_ref[:].reshape(rows, d_model)

    x_in = xcur[:]
    xsave_ref[0] = x_in.reshape(1, batch, seq_len, d_model)[0]

    x0 = x_in.astype(jnp.float32)
    ln1 = ln1_ref[0].astype(jnp.float32)
    xn1_f, _, _ = _ln_fwd(x0, ln1[0:1], ln1[1:2])
    xn1 = xn1_f.astype(dtype)

    qkv = jnp.dot(xn1, wqkv_ref[0], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(dtype)

    ctx, _ = _attention_fwd(
        qkv, mask_ref, seed_val, pid, rate, kp, interpret, True, p_ref,
        n_heads, d_model, head_dim, seq_len, rows, attn_rows, causal, scale,
        dtype)

    a = jnp.dot(ctx, wo_ref[0], preferred_element_type=jnp.float32)
    a = a + bo_ref[0].astype(jnp.float32)
    if rate > 0.0:
        a = a * _site_mask(a.shape, rate, interpret, seed_val, pid,
                           _SITE_ATTN_OUT) * kp

    inj = bias_ref[0, :, 0, :].astype(jnp.float32)  # [B, D]
    x1 = x0 + a + jnp.broadcast_to(
        inj[:, None, :], (batch, seq_len, d_model)).reshape(rows, d_model)

    ln2 = ln2_ref[0].astype(jnp.float32)
    xn2_f, _, _ = _ln_fwd(x1, ln2[0:1], ln2[1:2])
    xn2 = xn2_f.astype(dtype)
    hpre = jnp.dot(xn2, w1_ref[0], preferred_element_type=jnp.float32)
    hpre = hpre + b1_ref[0].astype(jnp.float32)
    h_act = jnp.maximum(hpre, 0.0)
    hact_ref[0] = h_act.astype(hact_ref.dtype)
    if rate > 0.0:
        h_act = h_act * _site_mask(h_act.shape, rate, interpret, seed_val,
                                   pid, _SITE_FF_HIDDEN) * kp
    f = jnp.dot(h_act.astype(dtype), w2_ref[0],
                preferred_element_type=jnp.float32)
    f = f + b2_ref[0].astype(jnp.float32)
    if rate > 0.0:
        f = f * _site_mask(f.shape, rate, interpret, seed_val, pid,
                           _SITE_FF_OUT) * kp

    x_out = (x1 + f).astype(dtype)
    xcur[:] = x_out

    @pl.when(l == n_layers - 1)
    def _store_output():
        out_ref[:] = x_out.reshape(batch, seq_len, d_model)


def _stack_bwd_kernel(
    seed_ref, xsave_ref, bias_ref, ln1_ref, wqkv_ref, bqkv_ref, wo_ref,
    bo_ref, ln2_ref, w1_ref, b1_ref, w2_ref, b2_ref, mask_ref, g_ref,
    p_sav_ref, hact_sav_ref,
    dx_ref, dbias_ref, dln1_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
    dln2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dxcur,
    *, n_layers, n_heads, seq_len, d_model, batch, causal, rate, interpret,
    attn_rows,
):
    head_dim = d_model // n_heads
    rows = batch * seq_len
    scale = head_dim ** -0.5
    kp = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    dtype = xsave_ref.dtype
    f32 = jnp.float32
    seed_val = seed_ref[0]
    l = pl.program_id(0)
    pid = n_layers - 1 - l  # the layer this step differentiates
    n_blocks = rows // attn_rows

    # ---- recompute this layer's forward from its saved input -------------
    x0 = xsave_ref[0].reshape(rows, d_model).astype(f32)
    ln1 = ln1_ref[0].astype(f32)
    _, xh1, r1 = _ln_fwd(x0, ln1[0:1], ln1[1:2])
    xn1 = (xh1 * ln1[0:1] + ln1[1:2]).astype(dtype)

    qkv = jnp.dot(xn1, wqkv_ref[0], preferred_element_type=f32)
    qkv = (qkv + bqkv_ref[0].astype(f32)).astype(dtype)

    m_attn = (_site_mask((rows, d_model), rate, interpret, seed_val, pid,
                         _SITE_ATTN_OUT) if rate > 0.0 else None)
    m_hid = (_site_mask((rows, w1_ref.shape[-1]), rate, interpret, seed_val,
                        pid, _SITE_FF_HIDDEN) if rate > 0.0 else None)
    m_out = (_site_mask((rows, d_model), rate, interpret, seed_val, pid,
                        _SITE_FF_OUT) if rate > 0.0 else None)

    ctx_blocks, block_cache = [], []
    for bi, r0 in enumerate(range(0, rows, attn_rows)):
        ctx_heads, head_cache = [], []
        for h in range(n_heads):
            rr = slice(r0, r0 + attn_rows)
            q = qkv[rr, h * head_dim:(h + 1) * head_dim]
            k = qkv[rr, d_model + h * head_dim:d_model + (h + 1) * head_dim]
            v = qkv[rr, 2 * d_model + h * head_dim:
                    2 * d_model + (h + 1) * head_dim]
            p = p_sav_ref[0, rr, h * attn_rows:(h + 1) * attn_rows].astype(f32)
            keep = (_site_mask(p.shape, rate, interpret, seed_val, pid,
                               h * n_blocks + bi) if rate > 0.0 else None)
            pe = p * keep * kp if rate > 0.0 else p
            head_cache.append((q, k, v, p, keep))
            ctx_heads.append(
                jnp.dot(pe.astype(dtype), v,
                        preferred_element_type=f32).astype(dtype))
        block_cache.append(head_cache)
        ctx_blocks.append(jnp.concatenate(ctx_heads, axis=1))
    ctx = (jnp.concatenate(ctx_blocks, axis=0) if n_blocks > 1
           else ctx_blocks[0])
    a = jnp.dot(ctx, wo_ref[0], preferred_element_type=f32)
    a = a + bo_ref[0].astype(f32)
    if rate > 0.0:
        a = a * m_attn * kp

    inj = bias_ref[0, :, 0, :].astype(f32)
    x1 = x0 + a + jnp.broadcast_to(
        inj[:, None, :], (batch, seq_len, d_model)).reshape(rows, d_model)

    ln2 = ln2_ref[0].astype(f32)
    _, xh2, r2 = _ln_fwd(x1, ln2[0:1], ln2[1:2])
    xn2 = (xh2 * ln2[0:1] + ln2[1:2]).astype(dtype)
    h_act = hact_sav_ref[0].astype(f32)
    hd = h_act * m_hid * kp if rate > 0.0 else h_act
    hd16 = hd.astype(dtype)

    # ---- backward --------------------------------------------------------
    # upstream gradient: the stack output cotangent at the first grid step,
    # the carried dx afterwards (the scratch read is masked out at l == 0,
    # where its contents are uninitialized)
    g_top = g_ref[:].reshape(rows, d_model).astype(f32)
    g = jnp.where(l == 0, g_top, dxcur[:])

    df = g * m_out * kp if rate > 0.0 else g
    df16 = df.astype(dtype)
    dw2_ref[0] = jax.lax.dot_general(
        hd16, df16, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    db2_ref[0] = jnp.sum(df, axis=0, keepdims=True)
    dhd = jnp.dot(df16, w2_ref[0].T, preferred_element_type=f32)
    dh = dhd * m_hid * kp if rate > 0.0 else dhd
    dhpre = jnp.where(h_act > 0.0, dh, 0.0)
    dhpre16 = dhpre.astype(dtype)
    dw1_ref[0] = jax.lax.dot_general(
        xn2, dhpre16, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    db1_ref[0] = jnp.sum(dhpre, axis=0, keepdims=True)
    dxn2 = jnp.dot(dhpre16, w1_ref[0].T, preferred_element_type=f32)

    dx1_ln, dln2_s, dln2_b = _ln_bwd(dxn2, xh2, r2, ln2[0:1])
    dln2_ref[0] = jnp.concatenate([dln2_s, dln2_b], axis=0)
    dx1 = g + dx1_ln

    dbias_ref[0] = (
        jnp.sum(dx1.reshape(batch, seq_len, d_model), axis=1, keepdims=True)
    ).astype(dbias_ref.dtype)

    da = dx1 * m_attn * kp if rate > 0.0 else dx1
    da16 = da.astype(dtype)
    dbo_ref[0] = jnp.sum(da, axis=0, keepdims=True)
    dwo_ref[0] = jax.lax.dot_general(
        ctx, da16, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dctx = jnp.dot(da16, wo_ref[0].T, preferred_element_type=f32).astype(dtype)

    dqkv_blocks = []
    for bi, r0 in enumerate(range(0, rows, attn_rows)):
        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(n_heads):
            q, k, v, p, keep = block_cache[bi][h]
            pe = p * keep * kp if rate > 0.0 else p
            dctx_h = dctx[r0:r0 + attn_rows, h * head_dim:(h + 1) * head_dim]
            dv = jax.lax.dot_general(
                pe.astype(dtype), dctx_h, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            dp = jax.lax.dot_general(
                dctx_h, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            if rate > 0.0:
                dp = dp * keep * kp
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds16 = ds.astype(dtype)
            dq = jnp.dot(ds16, k.astype(dtype),
                         preferred_element_type=f32) * scale
            dk = jax.lax.dot_general(
                ds16, q, (((0,), (0,)), ((), ())),
                preferred_element_type=f32) * scale
            dq_parts.append(dq.astype(dtype))
            dk_parts.append(dk.astype(dtype))
            dv_parts.append(dv.astype(dtype))
        dqkv_blocks.append(
            jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=1))
    dqkv = (jnp.concatenate(dqkv_blocks, axis=0) if n_blocks > 1
            else dqkv_blocks[0])
    dwqkv_ref[0] = jax.lax.dot_general(
        xn1, dqkv, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dbqkv_ref[0] = jnp.sum(dqkv.astype(f32), axis=0, keepdims=True)
    dxn1 = jnp.dot(dqkv, wqkv_ref[0].T, preferred_element_type=f32)

    dx0_ln, dln1_s, dln1_b = _ln_bwd(dxn1, xh1, r1, ln1[0:1])
    dln1_ref[0] = jnp.concatenate([dln1_s, dln1_b], axis=0)
    dx_val = dx1 + dx0_ln
    dxcur[:] = dx_val
    dx_ref[:] = dx_val.astype(dtype).reshape(batch, seq_len, d_model)


def _stk(shape, offset=1):
    """BlockSpec for a [L, ...]-stacked operand: one layer per grid step."""
    return pl.BlockSpec((1,) + tuple(shape),
                        lambda l, *_: (l,) + tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _stk_rev(shape, n_layers):
    """Layer-stacked operand iterated in REVERSE grid order (backward)."""
    return pl.BlockSpec((1,) + tuple(shape),
                        lambda l, *_: (n_layers - 1 - l,)
                        + tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _const(shape):
    return pl.BlockSpec(tuple(shape), lambda l, *_: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _stack_rows_ok(b, s):
    return b * s <= 2048


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16))
def fused_stack_train(x, bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2,
                      mask, seed, n_heads, causal, dropout_rate):
    """Differentiable fused L-layer transformer stack (training path).

    Weight operands carry a leading layer dim ``[L, ...]``; ``bias [L, B, D]``
    is each layer's pre-dropout-applied per-sequence injection (zeros when
    none). Semantics per layer are EXACTLY ops/layer_vjp.fused_layer_train
    with save-residuals — same math, same dropout sites, pid = layer index.
    Intended for the short-sequence hierarchical stages (rows = B*S <= 2048:
    the whole batch lives in VMEM and the layer loop is the Pallas grid).
    """
    out, _, _, _ = _stack_fwd_call(x, bias, ln1, wqkv, bqkv, wo, bo, ln2,
                                   w1, b1, w2, b2, mask, seed, n_heads,
                                   causal, dropout_rate)
    return out


def _stack_fwd_call(x, bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2,
                    mask, seed, n_heads, causal, rate):
    b, s, d = x.shape
    L = ln1.shape[0]
    dff = w1.shape[-1]
    rows = b * s
    assert _stack_rows_ok(b, s), (b, s)
    interpret = jax.default_backend() == "cpu"
    attn_rows = _auto_attn_rows(b, s)
    p_width = n_heads * attn_rows
    kernel = functools.partial(
        _stack_fwd_kernel, n_layers=L, n_heads=n_heads, seq_len=s,
        d_model=d, batch=b, causal=causal, rate=rate, interpret=interpret,
        attn_rows=attn_rows,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            _const((b, s, d)),                       # x (read at l == 0)
            _stk((b, 1, d)),                         # bias
            _stk((2, d)), _stk((d, 3 * d)), _stk((1, 3 * d)),
            _stk((d, d)), _stk((1, d)), _stk((2, d)),
            _stk((d, dff)), _stk((1, dff)), _stk((dff, d)), _stk((1, d)),
            _const((1, 1, rows)),                    # packed mask
        ],
        out_specs=[
            _const((b, s, d)),                       # out (written at l == L-1)
            _stk((b, s, d)),                         # per-layer inputs
            _stk((rows, p_width)),                   # attention probs
            _stk((rows, dff)),                       # FF hidden
        ],
        scratch_shapes=[pltpu.VMEM((rows, d), x.dtype)],
    )
    out, xsave, p_sav, hact = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, s, d), x.dtype),
            jax.ShapeDtypeStruct((L, b, s, d), x.dtype),
            jax.ShapeDtypeStruct((L, rows, p_width), x.dtype),
            jax.ShapeDtypeStruct((L, rows, dff), x.dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(seed, x, bias.reshape(L, b, 1, d), ln1, wqkv, bqkv, wo, bo, ln2,
      w1, b1, w2, b2, mask.reshape(1, 1, rows))
    return out, xsave, p_sav, hact


def _rule_fwd(x, bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2, mask,
              seed, n_heads, causal, rate):
    out, xsave, p_sav, hact = _stack_fwd_call(
        x, bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2, mask, seed,
        n_heads, causal, rate)
    return out, (xsave, bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2,
                 mask, seed, p_sav, hact)


def _rule_bwd(n_heads, causal, rate, res, g):
    (xsave, bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2, mask, seed,
     p_sav, hact) = res
    _, b, s, d = xsave.shape
    x_dtype = xsave.dtype
    L = ln1.shape[0]
    dff = w1.shape[-1]
    rows = b * s
    interpret = jax.default_backend() == "cpu"
    attn_rows = _auto_attn_rows(b, s)
    p_width = n_heads * attn_rows
    kernel = functools.partial(
        _stack_bwd_kernel, n_layers=L, n_heads=n_heads, seq_len=s,
        d_model=d, batch=b, causal=causal, rate=rate, interpret=interpret,
        attn_rows=attn_rows,
    )
    rev = functools.partial(_stk_rev, n_layers=L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            rev((b, s, d)),                          # saved layer inputs
            rev((b, 1, d)),                          # bias
            rev((2, d)), rev((d, 3 * d)), rev((1, 3 * d)),
            rev((d, d)), rev((1, d)), rev((2, d)),
            rev((d, dff)), rev((1, dff)), rev((dff, d)), rev((1, d)),
            _const((1, 1, rows)),
            _const((b, s, d)),                       # stack output cotangent
            rev((rows, p_width)),
            rev((rows, dff)),
        ],
        out_specs=[
            _const((b, s, d)),                       # dx (final value wins)
            rev((b, 1, d)),                          # dbias
            rev((2, d)), rev((d, 3 * d)), rev((1, 3 * d)),
            rev((d, d)), rev((1, d)), rev((2, d)),
            rev((d, dff)), rev((1, dff)), rev((dff, d)), rev((1, d)),
        ],
        scratch_shapes=[pltpu.VMEM((rows, d), jnp.float32)],
    )
    (dx, dbias, dln1, dwqkv, dbqkv, dwo, dbo, dln2, dw1, db1, dw2,
     db2) = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, s, d), x_dtype),
            jax.ShapeDtypeStruct((L, b, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((L, 2, d), jnp.float32),
            jax.ShapeDtypeStruct((L, d, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((L, d, d), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((L, 2, d), jnp.float32),
            jax.ShapeDtypeStruct((L, d, dff), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, dff), jnp.float32),
            jax.ShapeDtypeStruct((L, dff, d), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, d), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(seed, xsave, bias.reshape(L, b, 1, d), ln1, wqkv, bqkv, wo, bo, ln2,
      w1, b1, w2, b2, mask.reshape(1, 1, rows), g, p_sav, hact)
    float0 = jax.dtypes.float0
    return (
        dx,
        dbias[:, :, 0, :].astype(bias.dtype),
        dln1.astype(ln1.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(bqkv.dtype),     # row operands keep their [L, 1, n]
        dwo.astype(wo.dtype),
        dbo.astype(bo.dtype),
        dln2.astype(ln2.dtype),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
        np.zeros(mask.shape, float0),
        np.zeros(seed.shape, float0),
    )


fused_stack_train.defvjp(_rule_fwd, _rule_bwd)
