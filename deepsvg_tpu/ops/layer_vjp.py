"""Differentiable fully-fused transformer layer (Pallas fwd + Pallas bwd).

Extends the fused inference layer (ops/layer.py) to training: ONE kernel for
the whole layer forward — LN1 -> attention (prob dropout) -> residual dropout
-> residual -> [per-sequence injection] -> LN2 -> FF (hidden + output dropout)
-> residual — and ONE kernel for its backward. By default nothing but the
layer inputs is saved between forward and backward (flash-style: the backward
recomputes every intermediate in VMEM), so the training step's LN/FF/residual
HBM round-trips (docs/PERFORMANCE.md "Kernel-level findings") disappear in
both directions. ``save_residuals=True`` instead stashes the attention probs
and FF hidden to HBM in the forward and skips their recompute in the backward
(small at S=32; see fused_layer_train docstring and the r4 A/B).

Dropout (reference semantics, improved_transformer.py:16-54/97-141: attention
probabilities, attention output, FF hidden, FF output) uses the on-chip PRNG,
re-seeded per (step seed, grid program, site) so the backward regenerates each
mask independently of draw order. The per-sequence injections (decoder latent
``z @ Wg``, label conditioning) and their dropout are computed OUTSIDE in XLA
(tiny ``[B, D]`` math) and enter as one ``seq_bias`` operand whose gradient
(the sequence-summed residual gradient) flows back through this op's VJP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5

# Production default for the model's fused train path (layers.py
# _fused_train_layer): save-residuals beat full recompute in the r4 on-chip
# A/B (docs/save_recompute_ab.json: 2.140 -> 1.824 ms/layer fwd+bwd at
# dropout 0.1, flagship shapes; forward +0.005 ms). Module-level so tests
# and experiments can monkeypatch the old flash-style behavior back on.
SAVE_RESIDUALS_DEFAULT = True

# dropout site ids (anything distinct — they only salt the PRNG re-seed;
# attention-probability sites use h * n_blocks + bi which stays < 2**16)
_SITE_ATTN_OUT = 1 << 16
_SITE_FF_HIDDEN = (1 << 16) + 1
_SITE_FF_OUT = (1 << 16) + 2


def _site_mask(shape, rate, interpret, seed_val, pid, site):
    """Keep-mask in f32 for one dropout site; independent of draw order
    (the PRNG is re-seeded per site)."""
    if interpret:
        r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        salt = (seed_val * 1009 + pid) * 131 + site
        u = jnp.sin(
            (r * 12.9898 + c * 78.233 + salt * 37.719).astype(jnp.float32)
        ) * 43758.5453
        u = u - jnp.floor(u)
        return (u >= rate).astype(jnp.float32)
    # Mosaic supports at most 2 seed words: fold (program, site) into one
    pltpu.prng_seed(seed_val, pid * 997 + site)
    bits = pltpu.prng_random_bits(shape)
    top24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
    u = top24.astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32)


def _ln_fwd(x, scale, bias):
    """f32 LayerNorm; returns (out, xhat, rstd) for reuse in backward."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = xc * rstd
    return xhat * scale + bias, xhat, rstd


def _ln_bwd(dy, xhat, rstd, scale):
    """Standard LayerNorm input/param gradients (per-row stats)."""
    dxhat = dy * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dscale = jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbias = jnp.sum(dy, axis=0, keepdims=True)
    return dx, dscale, dbias


def _big_mask(mask_ref, r0, blk, seq_len, causal):
    """[blk, blk] additive mask for the attention sub-block starting at
    packed row ``r0`` (block-diagonal per sequence + key padding). ``r0`` is
    a multiple of ``seq_len`` so sequence boundaries are block-local."""
    r = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    allowed = (r // seq_len) == (c // seq_len)
    if causal:
        allowed = allowed & ((c % seq_len) <= (r % seq_len))
    return jnp.where(allowed, mask_ref[0, :, r0:r0 + blk], -jnp.inf)


def _auto_attn_rows(tile_b, seq_len):
    """Attention sub-block size in packed rows for TRAINING kernels: the
    ~128-row knee from the fwd+bwd sweep (docs/PERFORMANCE.md "Corrected
    layer-kernel measurements": 128 rows 2.19 ms vs 256 rows 2.55 vs 64 rows
    2.40 at flagship shapes) — the backward pays the block-diagonal score
    waste ~2.5x (forward + recompute + dp/ds/dq/dk), which moves the knee
    below inference's 256. Always a multiple of ``seq_len`` and a divisor
    of the row tile, so sequences never straddle sub-blocks."""
    a = 1
    while (a * 2 * seq_len <= 128) and (tile_b % (a * 2) == 0):
        a *= 2
    return a * seq_len


def _attn_fwd_head(qkv, big_mask, h, d_model, head_dim, scale, r0=0,
                   attn_rows=None):
    """Per-head attention on the sub-block starting at packed row ``r0``.
    Slices row+lane ranges straight out of the full-tile ``qkv`` (one
    combined slice per operand, like the inference kernel) rather than
    materializing a per-block sublane-slice intermediate."""
    rr = slice(r0, r0 + (attn_rows or qkv.shape[0]))
    q = qkv[rr, h * head_dim : (h + 1) * head_dim]
    k = qkv[rr, d_model + h * head_dim : d_model + (h + 1) * head_dim]
    v = qkv[rr, 2 * d_model + h * head_dim : 2 * d_model + (h + 1) * head_dim]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    # max-subtraction matters in training: QKV norms grow and rare aligned
    # rows overflow exp's f32 range (see ops/layer.py note). The shift is a
    # softmax identity, so the recomputing backward stays exact.
    scores = scores + big_mask
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), -1e30)
    exp = jnp.exp(scores - m)
    # all-masked rows (alignment padding; outputs sliced away, cotangents
    # zero) would hit 0/0 here — the guard makes them exact zeros instead of
    # NaN. Rows with any valid key have sum >= exp(0) = 1 after the max
    # subtraction, so the guard is inert for real rows (bit-exact).
    den = jnp.maximum(jnp.sum(exp, axis=-1, keepdims=True), 1e-30)
    p = exp / den
    return q, k, v, p


def _batched_attn_mask(mask_ref, tile_b, seq_len, causal):
    """[tile_b, 1 or S, S] additive mask for per-sequence (batched) attention:
    key padding from the per-sequence mask block ``[1, tile_b, S]`` (batched
    mode lays the mask out per sequence — a packed ``[1, 1, rows]`` row would
    need a lane-splitting reshape Mosaic can't lower), plus causality."""
    am = mask_ref[0, :, :].reshape(tile_b, 1, seq_len)
    if causal:
        r = jax.lax.broadcasted_iota(jnp.int32, (1, seq_len, seq_len), 1)
        c = jax.lax.broadcasted_iota(jnp.int32, (1, seq_len, seq_len), 2)
        am = am + jnp.where(c <= r, 0.0, -jnp.inf)
    return am


def _attn_fwd_batched(qkv, am, h, d_model, head_dim, scale, tile_b, seq_len):
    """Per-head attention over ALL tile sequences as one rank-3 (batched)
    dot_general: scores ``[tile_b, S, S]`` — no cross-sequence score waste
    and no sub-block loop, which lets the dense tile grow to 1024 rows
    (the 2-D sub-blocked form fails to lower there; docs/PERFORMANCE.md
    "Lowering-failure isolation"). Returns rank-3 (q, k, v, p)."""
    rows = tile_b * seq_len
    q = qkv[:, h * head_dim : (h + 1) * head_dim]
    k = qkv[:, d_model + h * head_dim : d_model + (h + 1) * head_dim]
    v = qkv[:, 2 * d_model + h * head_dim : 2 * d_model + (h + 1) * head_dim]
    qb = q.reshape(tile_b, seq_len, head_dim)
    kb = k.reshape(tile_b, seq_len, head_dim)
    vb = v.reshape(tile_b, seq_len, head_dim)
    sc = jax.lax.dot_general(
        qb, kb, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale + am
    m = jnp.maximum(jnp.max(sc, axis=-1, keepdims=True), -1e30)
    e = jnp.exp(sc - m)
    den = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    return qb, kb, vb, e / den


def _fwd_kernel(
    seed_ref, x_ref, bias_ref, ln1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    ln2_ref, w1_ref, b1_ref, w2_ref, b2_ref, mask_ref, out_ref,
    p_ref=None, hact_ref=None,
    *, n_heads, seq_len, d_model, tile_b, causal, rate, interpret,
    attn_rows=None, batched=False, save=False,
):
    head_dim = d_model // n_heads
    rows = tile_b * seq_len
    scale = head_dim ** -0.5
    kp = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    dtype = x_ref.dtype
    seed_val = seed_ref[0]
    pid = pl.program_id(0)

    x0 = x_ref[:].reshape(rows, d_model).astype(jnp.float32)
    ln1 = ln1_ref[:].astype(jnp.float32)
    xn1_f, _, _ = _ln_fwd(x0, ln1[0:1], ln1[1:2])
    xn1 = xn1_f.astype(dtype)

    qkv = jnp.dot(xn1, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(dtype)

    if batched:
        # per-sequence rank-3 attention (see _attn_fwd_batched). Dropout site
        # per head = h (mask drawn on the packed 2-D view so fwd/bwd agree).
        am = _batched_attn_mask(mask_ref, tile_b, seq_len, causal)
        ctx_heads = []
        for h in range(n_heads):
            _, _, vb, p = _attn_fwd_batched(qkv, am, h, d_model, head_dim,
                                            scale, tile_b, seq_len)
            if save:
                p_ref[:, h * seq_len:(h + 1) * seq_len] = (
                    p.reshape(rows, seq_len).astype(p_ref.dtype))
            if rate > 0.0:
                keep = _site_mask((rows, seq_len), rate, interpret, seed_val,
                                  pid, h)
                p = p * keep.reshape(tile_b, seq_len, seq_len) * kp
            ctx_h = jax.lax.dot_general(
                p.astype(dtype), vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            ctx_heads.append(ctx_h.astype(dtype).reshape(rows, head_dim))
        ctx = jnp.concatenate(ctx_heads, axis=1)
    else:
        # sub-blocked attention (see _auto_attn_rows): QKV/out/FF matmuls run
        # on the full row tile, scores/softmax/pv per ~256-row sub-block.
        # Dropout sites: (head, sub-block) pairs get ids h * n_blocks + bi,
        # kept below the reserved per-row site ids.
        attn_rows = attn_rows or _auto_attn_rows(tile_b, seq_len)
        n_blocks = rows // attn_rows
        assert n_heads * n_blocks <= _SITE_ATTN_OUT, (n_heads, n_blocks)
        ctx_blocks = []
        for bi, r0 in enumerate(range(0, rows, attn_rows)):
            bm = _big_mask(mask_ref, r0, attn_rows, seq_len, causal)
            ctx_heads = []
            for h in range(n_heads):
                _, _, v, p = _attn_fwd_head(qkv, bm, h, d_model, head_dim,
                                            scale, r0, attn_rows)
                if save:
                    p_ref[r0:r0 + attn_rows,
                          h * attn_rows:(h + 1) * attn_rows] = (
                        p.astype(p_ref.dtype))
                if rate > 0.0:
                    p = p * _site_mask(p.shape, rate, interpret, seed_val, pid,
                                       h * n_blocks + bi) * kp
                ctx_heads.append(
                    jnp.dot(p.astype(dtype), v, preferred_element_type=jnp.float32).astype(dtype)
                )
            ctx_blocks.append(jnp.concatenate(ctx_heads, axis=1))
        ctx = (jnp.concatenate(ctx_blocks, axis=0) if n_blocks > 1
               else ctx_blocks[0])
    a = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
    a = a + bo_ref[:].astype(jnp.float32)
    if rate > 0.0:
        a = a * _site_mask(a.shape, rate, interpret, seed_val, pid, _SITE_ATTN_OUT) * kp

    inj = bias_ref[:, 0, :].astype(jnp.float32)  # [tile_b, D]
    x1 = x0 + a + jnp.broadcast_to(
        inj[:, None, :], (tile_b, seq_len, d_model)
    ).reshape(rows, d_model)

    ln2 = ln2_ref[:].astype(jnp.float32)
    xn2_f, _, _ = _ln_fwd(x1, ln2[0:1], ln2[1:2])
    xn2 = xn2_f.astype(dtype)
    hpre = jnp.dot(xn2, w1_ref[:], preferred_element_type=jnp.float32)
    hpre = hpre + b1_ref[:].astype(jnp.float32)
    h_act = jnp.maximum(hpre, 0.0)
    if save:
        hact_ref[:] = h_act.astype(hact_ref.dtype)
    if rate > 0.0:
        h_act = h_act * _site_mask(
            h_act.shape, rate, interpret, seed_val, pid, _SITE_FF_HIDDEN
        ) * kp
    f = jnp.dot(h_act.astype(dtype), w2_ref[:], preferred_element_type=jnp.float32)
    f = f + b2_ref[:].astype(jnp.float32)
    if rate > 0.0:
        f = f * _site_mask(f.shape, rate, interpret, seed_val, pid, _SITE_FF_OUT) * kp

    out_ref[:] = (x1 + f).astype(dtype).reshape(tile_b, seq_len, d_model)


def _bwd_kernel_saved(
    seed_ref, x_ref, bias_ref, ln1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    ln2_ref, w1_ref, b1_ref, w2_ref, b2_ref, mask_ref, g_ref,
    p_sav_ref, hact_sav_ref,
    dx_ref, dbias_ref, dln1_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
    dln2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, **kw,
):
    """Positional adapter: the save-mode backward takes the two residual
    operands (attention probs, FF hidden) between ``g`` and the outputs."""
    _bwd_kernel(
        seed_ref, x_ref, bias_ref, ln1_ref, wqkv_ref, bqkv_ref, wo_ref,
        bo_ref, ln2_ref, w1_ref, b1_ref, w2_ref, b2_ref, mask_ref, g_ref,
        dx_ref, dbias_ref, dln1_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
        dln2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
        p_sav_ref=p_sav_ref, hact_sav_ref=hact_sav_ref, **kw)


def _bwd_kernel(
    seed_ref, x_ref, bias_ref, ln1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    ln2_ref, w1_ref, b1_ref, w2_ref, b2_ref, mask_ref, g_ref,
    dx_ref, dbias_ref, dln1_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
    dln2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, n_heads, seq_len, d_model, tile_b, causal, rate, interpret,
    attn_rows=None, batched=False, p_sav_ref=None, hact_sav_ref=None,
):
    save = p_sav_ref is not None
    head_dim = d_model // n_heads
    rows = tile_b * seq_len
    scale = head_dim ** -0.5
    kp = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    dtype = x_ref.dtype
    f32 = jnp.float32
    seed_val = seed_ref[0]
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        dln1_ref[:] = jnp.zeros_like(dln1_ref)
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)
        dln2_ref[:] = jnp.zeros_like(dln2_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    # ---- recompute forward intermediates (flash-style) -------------------
    x0 = x_ref[:].reshape(rows, d_model).astype(f32)
    ln1 = ln1_ref[:].astype(f32)
    _, xh1, r1 = _ln_fwd(x0, ln1[0:1], ln1[1:2])
    xn1 = (xh1 * ln1[0:1] + ln1[1:2]).astype(dtype)

    qkv = jnp.dot(xn1, wqkv_ref[:], preferred_element_type=f32)
    qkv = (qkv + bqkv_ref[:].astype(f32)).astype(dtype)
    if not batched:
        attn_rows = attn_rows or _auto_attn_rows(tile_b, seq_len)
        n_blocks = rows // attn_rows
        assert n_heads * n_blocks <= _SITE_ATTN_OUT, (n_heads, n_blocks)

    m_attn = (
        _site_mask((rows, d_model), rate, interpret, seed_val, pid, _SITE_ATTN_OUT)
        if rate > 0.0 else None
    )
    m_hid = (
        _site_mask((rows, w1_ref.shape[-1]), rate, interpret, seed_val, pid, _SITE_FF_HIDDEN)
        if rate > 0.0 else None
    )
    m_out = (
        _site_mask((rows, d_model), rate, interpret, seed_val, pid, _SITE_FF_OUT)
        if rate > 0.0 else None
    )

    if batched:
        am = None if save else _batched_attn_mask(mask_ref, tile_b, seq_len,
                                                  causal)
        ctx_heads = []
        head_cache = []  # per head: (qb, kb, vb, p_raw, keep) — rank-3
        for h in range(n_heads):
            if save:
                # saved attention probs: skip scores matmul + softmax
                qb = qkv[:, h * head_dim:(h + 1) * head_dim].reshape(
                    tile_b, seq_len, head_dim)
                kb = qkv[:, d_model + h * head_dim:
                         d_model + (h + 1) * head_dim].reshape(
                    tile_b, seq_len, head_dim)
                vb = qkv[:, 2 * d_model + h * head_dim:
                         2 * d_model + (h + 1) * head_dim].reshape(
                    tile_b, seq_len, head_dim)
                p = (p_sav_ref[:, h * seq_len:(h + 1) * seq_len]
                     .astype(f32).reshape(tile_b, seq_len, seq_len))
            else:
                qb, kb, vb, p = _attn_fwd_batched(qkv, am, h, d_model,
                                                  head_dim, scale, tile_b,
                                                  seq_len)
            keep = (
                _site_mask((rows, seq_len), rate, interpret, seed_val, pid, h)
                .reshape(tile_b, seq_len, seq_len)
                if rate > 0.0 else None
            )
            pe = p * keep * kp if rate > 0.0 else p
            head_cache.append((qb, kb, vb, p, keep))
            ctx_h = jax.lax.dot_general(
                pe.astype(dtype), vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            ctx_heads.append(ctx_h.astype(dtype).reshape(rows, head_dim))
        ctx = jnp.concatenate(ctx_heads, axis=1)
    else:
        ctx_blocks = []
        block_cache = []  # per sub-block: per-head (q, k, v, p_raw, keep)
        for bi, r0 in enumerate(range(0, rows, attn_rows)):
            bm = (None if save
                  else _big_mask(mask_ref, r0, attn_rows, seq_len, causal))
            ctx_heads = []
            head_cache = []
            for h in range(n_heads):
                if save:
                    rr = slice(r0, r0 + attn_rows)
                    q = qkv[rr, h * head_dim:(h + 1) * head_dim]
                    k = qkv[rr, d_model + h * head_dim:
                            d_model + (h + 1) * head_dim]
                    v = qkv[rr, 2 * d_model + h * head_dim:
                            2 * d_model + (h + 1) * head_dim]
                    p = p_sav_ref[rr, h * attn_rows:(h + 1) * attn_rows
                                  ].astype(f32)
                else:
                    q, k, v, p = _attn_fwd_head(qkv, bm, h, d_model, head_dim,
                                                scale, r0, attn_rows)
                keep = (
                    _site_mask(p.shape, rate, interpret, seed_val, pid,
                               h * n_blocks + bi)
                    if rate > 0.0 else None
                )
                pe = p * keep * kp if rate > 0.0 else p
                head_cache.append((q, k, v, p, keep))
                ctx_heads.append(
                    jnp.dot(pe.astype(dtype), v, preferred_element_type=f32).astype(dtype)
                )
            block_cache.append(head_cache)
            ctx_blocks.append(jnp.concatenate(ctx_heads, axis=1))
        ctx = (jnp.concatenate(ctx_blocks, axis=0) if n_blocks > 1
               else ctx_blocks[0])
    a = jnp.dot(ctx, wo_ref[:], preferred_element_type=f32)
    a = a + bo_ref[:].astype(f32)
    if rate > 0.0:
        a = a * m_attn * kp

    inj = bias_ref[:, 0, :].astype(f32)
    x1 = x0 + a + jnp.broadcast_to(
        inj[:, None, :], (tile_b, seq_len, d_model)
    ).reshape(rows, d_model)

    ln2 = ln2_ref[:].astype(f32)
    _, xh2, r2 = _ln_fwd(x1, ln2[0:1], ln2[1:2])
    xn2 = (xh2 * ln2[0:1] + ln2[1:2]).astype(dtype)
    if save:
        # saved FF hidden: skip the [rows, D] @ [D, dff] recompute matmul.
        # ReLU mask below uses h_act > 0, identical to hpre > 0.
        h_act = hact_sav_ref[:].astype(f32)
    else:
        hpre = jnp.dot(xn2, w1_ref[:], preferred_element_type=f32)
        hpre = hpre + b1_ref[:].astype(f32)
        h_act = jnp.maximum(hpre, 0.0)
    hd = h_act * m_hid * kp if rate > 0.0 else h_act
    hd16 = hd.astype(dtype)

    # ---- backward ---------------------------------------------------------
    g = g_ref[:].reshape(rows, d_model).astype(f32)

    # FF block
    df = g * m_out * kp if rate > 0.0 else g
    df16 = df.astype(dtype)
    dw2_ref[:] += jax.lax.dot_general(
        hd16, df16, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    db2_ref[:] += jnp.sum(df, axis=0, keepdims=True)
    dhd = jnp.dot(df16, w2_ref[:].T, preferred_element_type=f32)
    dh = dhd * m_hid * kp if rate > 0.0 else dhd
    dhpre = jnp.where(h_act > 0.0, dh, 0.0)
    dhpre16 = dhpre.astype(dtype)
    dw1_ref[:] += jax.lax.dot_general(
        xn2, dhpre16, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    db1_ref[:] += jnp.sum(dhpre, axis=0, keepdims=True)
    dxn2 = jnp.dot(dhpre16, w1_ref[:].T, preferred_element_type=f32)

    dx1_ln, dln2_s, dln2_b = _ln_bwd(dxn2, xh2, r2, ln2[0:1])
    dln2_ref[:] += jnp.concatenate([dln2_s, dln2_b], axis=0)
    dx1 = g + dx1_ln

    # per-sequence injection gradient: sum over the sequence axis
    dbias_ref[:] = (
        jnp.sum(dx1.reshape(tile_b, seq_len, d_model), axis=1, keepdims=True)
    ).astype(dbias_ref.dtype)

    # attention block
    da = dx1 * m_attn * kp if rate > 0.0 else dx1
    da16 = da.astype(dtype)
    dbo_ref[:] += jnp.sum(da, axis=0, keepdims=True)
    dwo_ref[:] += jax.lax.dot_general(
        ctx, da16, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    dctx = jnp.dot(da16, wo_ref[:].T, preferred_element_type=f32).astype(dtype)

    if batched:
        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(n_heads):
            qb, kb, vb, p, keep = head_cache[h]
            pe = p * keep * kp if rate > 0.0 else p
            dctx_h = dctx[:, h * head_dim : (h + 1) * head_dim].reshape(
                tile_b, seq_len, head_dim)
            # dv[b,k,d] = sum_q pe[b,q,k] dctx[b,q,d]
            dv = jax.lax.dot_general(
                pe.astype(dtype), dctx_h, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            dp = jax.lax.dot_general(
                dctx_h, vb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            if rate > 0.0:
                dp = dp * keep * kp
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds16 = ds.astype(dtype)
            dq = jax.lax.dot_general(
                ds16, kb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            ) * scale
            dk = jax.lax.dot_general(
                ds16, qb, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            ) * scale
            dq_parts.append(dq.astype(dtype).reshape(rows, head_dim))
            dk_parts.append(dk.astype(dtype).reshape(rows, head_dim))
            dv_parts.append(dv.astype(dtype).reshape(rows, head_dim))
        dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=1)
    else:
        dqkv_blocks = []
        for bi, r0 in enumerate(range(0, rows, attn_rows)):
            dq_parts, dk_parts, dv_parts = [], [], []
            for h in range(n_heads):
                q, k, v, p, keep = block_cache[bi][h]
                pe = p * keep * kp if rate > 0.0 else p
                dctx_h = dctx[r0:r0 + attn_rows,
                              h * head_dim : (h + 1) * head_dim]
                dv = jax.lax.dot_general(
                    pe.astype(dtype), dctx_h, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                dp = jax.lax.dot_general(
                    dctx_h, v, (((1,), (1,)), ((), ())), preferred_element_type=f32
                )
                if rate > 0.0:
                    dp = dp * keep * kp
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                ds16 = ds.astype(dtype)
                dq = jax.lax.dot_general(
                    ds16, k, (((1,), (0,)), ((), ())), preferred_element_type=f32
                ) * scale
                dk = jax.lax.dot_general(
                    ds16, q, (((0,), (0,)), ((), ())), preferred_element_type=f32
                ) * scale
                dq_parts.append(dq.astype(dtype))
                dk_parts.append(dk.astype(dtype))
                dv_parts.append(dv.astype(dtype))
            dqkv_blocks.append(
                jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=1)
            )

        dqkv = (jnp.concatenate(dqkv_blocks, axis=0) if n_blocks > 1
                else dqkv_blocks[0])
    dwqkv_ref[:] += jax.lax.dot_general(
        xn1, dqkv, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    dbqkv_ref[:] += jnp.sum(dqkv.astype(f32), axis=0, keepdims=True)
    dxn1 = jnp.dot(dqkv, wqkv_ref[:].T, preferred_element_type=f32)

    dx0_ln, dln1_s, dln1_b = _ln_bwd(dxn1, xh1, r1, ln1[0:1])
    dln1_ref[:] += jnp.concatenate([dln1_s, dln1_b], axis=0)
    dx_ref[:] = (dx1 + dx0_ln).astype(dtype).reshape(tile_b, seq_len, d_model)


def _full(shape):
    return pl.BlockSpec(shape, lambda i, *_: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _layer_fwd_call(seed, x, bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2,
                    b2, mask, n_heads, tile_b, causal, rate, interpret,
                    attn_rows=None, batched=False, save=False):
    b, s, d = x.shape
    dff = w1.shape[-1]
    rows = tile_b * s
    kernel = functools.partial(
        _fwd_kernel, n_heads=n_heads, seq_len=s, d_model=d, tile_b=tile_b,
        causal=causal, rate=rate, interpret=interpret, attn_rows=attn_rows,
        batched=batched, save=save,
    )
    out_specs = pl.BlockSpec((tile_b, s, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, s, d), x.dtype)
    if save:
        # residual saves: pre-dropout attention probs (packed rows x
        # heads*key-width) + pre-dropout FF hidden, in the activation dtype
        p_width = (n_heads * s if batched
                   else n_heads * (attn_rows or _auto_attn_rows(tile_b, s)))
        out_specs = [
            out_specs,
            pl.BlockSpec((rows, p_width), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, dff), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((b * s, p_width), x.dtype),
            jax.ShapeDtypeStruct((b * s, dff), x.dtype),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, s, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            _full(ln1.shape), _full(wqkv.shape), _full(bqkv.shape),
            _full(wo.shape), _full(bo.shape), _full(ln2.shape),
            _full(w1.shape), _full(b1.shape), _full(w2.shape), _full(b2.shape),
            (pl.BlockSpec((1, tile_b, s), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
             if batched else
             pl.BlockSpec((1, 1, rows), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)),
        ],
        out_specs=out_specs,
    )
    mask3 = (mask.reshape(b // tile_b, tile_b, s) if batched
             else mask.reshape(b // tile_b, 1, rows))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(seed, x, bias.reshape(b, 1, d), ln1, wqkv, bqkv, wo, bo, ln2, w1, b1,
      w2, b2, mask3)


def _layer_bwd_call(seed, x, bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2,
                    b2, mask, g, n_heads, tile_b, causal, rate, interpret,
                    attn_rows=None, batched=False, saved=None):
    b, s, d = x.shape
    dff = w1.shape[-1]
    rows = tile_b * s
    kernel = functools.partial(
        _bwd_kernel_saved if saved is not None else _bwd_kernel,
        n_heads=n_heads, seq_len=s, d_model=d, tile_b=tile_b,
        causal=causal, rate=rate, interpret=interpret, attn_rows=attn_rows,
        batched=batched,
    )
    saved_specs = []
    saved_ops = ()
    if saved is not None:
        p_sav, hact_sav = saved
        saved_specs = [
            pl.BlockSpec((rows, p_sav.shape[-1]), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, dff), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        saved_ops = (p_sav, hact_sav)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, s, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            _full(ln1.shape), _full(wqkv.shape), _full(bqkv.shape),
            _full(wo.shape), _full(bo.shape), _full(ln2.shape),
            _full(w1.shape), _full(b1.shape), _full(w2.shape), _full(b2.shape),
            (pl.BlockSpec((1, tile_b, s), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
             if batched else
             pl.BlockSpec((1, 1, rows), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)),
            pl.BlockSpec((tile_b, s, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            *saved_specs,
        ],
        out_specs=[
            pl.BlockSpec((tile_b, s, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            _full((2, d)), _full(wqkv.shape), _full((1, 3 * d)),
            _full(wo.shape), _full((1, d)), _full((2, d)),
            _full(w1.shape), _full((1, dff)), _full(w2.shape), _full((1, d)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, s, d), x.dtype),
            jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((2, d), jnp.float32),
            jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct(wo.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((2, d), jnp.float32),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, dff), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(seed, x, bias.reshape(b, 1, d), ln1, wqkv, bqkv, wo, bo, ln2, w1, b1,
      w2, b2,
      (mask.reshape(b // tile_b, tile_b, s) if batched
       else mask.reshape(b // tile_b, 1, rows)), g, *saved_ops)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(14, 15, 16, 17, 18, 19, 20))
def fused_layer_train(x, seq_bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2,
                      b2, mask, seed, n_heads, tile_b, causal, dropout_rate,
                      attn_rows=None, batched=False, save_residuals=False):
    """Differentiable fused transformer layer (training path).

    ``seq_bias [B, D]`` is the pre-dropout-applied per-sequence injection
    (pass zeros when none); its gradient is returned (sequence-summed).
    ``seed`` is int32[1]; gradients flow to x, seq_bias and all weights.
    ``attn_rows`` overrides the attention sub-block size (default: the
    ~256-row auto pick, _auto_attn_rows). ``batched=True`` selects the
    rank-3 per-sequence attention form instead of sub-blocked 2-D scores
    (see _attn_fwd_batched; it admits 1024-row dense tiles and removes the
    cross-sequence score waste — measured faster at flagship shapes).
    ``save_residuals=True`` saves the pre-dropout attention probs and FF
    hidden to HBM in the forward and reuses them in the backward instead of
    the default flash-style full recompute — at S=32 the residuals are small
    (B*S x H*S + B*S x dff in the activation dtype), so trading that HBM
    round-trip for the backward's scores+softmax+FF-hidden recompute can win
    (VERDICT r3 #1a save-vs-recompute A/B). The saved tensors round through
    the activation dtype (bf16 on chip), a tolerance-level numerics change
    vs the exact f32 recompute.
    """
    interpret = jax.default_backend() == "cpu"
    return _layer_fwd_call(seed, x, seq_bias, ln1, wqkv, bqkv, wo, bo, ln2,
                           w1, b1, w2, b2, mask, n_heads, tile_b, causal,
                           dropout_rate, interpret, attn_rows, batched)


def _rule_fwd(x, seq_bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2,
              mask, seed, n_heads, tile_b, causal, dropout_rate,
              attn_rows=None, batched=False, save_residuals=False):
    interpret = jax.default_backend() == "cpu"
    if save_residuals:
        out, p_sav, hact_sav = _layer_fwd_call(
            seed, x, seq_bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2,
            mask, n_heads, tile_b, causal, dropout_rate, interpret,
            attn_rows, batched, save=True)
    else:
        out = fused_layer_train(x, seq_bias, ln1, wqkv, bqkv, wo, bo, ln2,
                                w1, b1, w2, b2, mask, seed, n_heads, tile_b,
                                causal, dropout_rate, attn_rows, batched)
        p_sav = hact_sav = None
    return out, (x, seq_bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2,
                 mask, seed, p_sav, hact_sav)


def _rule_bwd(n_heads, tile_b, causal, dropout_rate, attn_rows, batched,
              save_residuals, res, g):
    (x, seq_bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2, mask,
     seed, p_sav, hact_sav) = res
    interpret = jax.default_backend() == "cpu"
    (dx, dbias, dln1, dwqkv, dbqkv, dwo, dbo, dln2, dw1, db1, dw2,
     db2) = _layer_bwd_call(
        seed, x, seq_bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2,
        mask, g, n_heads, tile_b, causal, dropout_rate, interpret, attn_rows,
        batched,
        saved=(p_sav, hact_sav) if save_residuals else None,
    )
    float0 = jax.dtypes.float0
    return (
        dx,
        dbias[:, 0, :].astype(seq_bias.dtype),
        dln1.astype(ln1.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv[0].astype(bqkv.dtype),
        dwo.astype(wo.dtype),
        dbo[0].astype(bo.dtype),
        dln2.astype(ln2.dtype),
        dw1.astype(w1.dtype),
        db1[0].astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2[0].astype(b2.dtype),
        np.zeros(mask.shape, float0),
        np.zeros(seed.shape, float0),
    )


fused_layer_train.defvjp(_rule_fwd, _rule_bwd)
