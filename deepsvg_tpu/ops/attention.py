"""Fused multi-head self-attention kernel (Pallas TPU).

DeepSVG's sequences are tiny (S <= 52) while the *batch* is huge (B·G up to
hundreds of thousands of folded path-sequences). XLA's stock lowering pays for
layout transposes, f32 casts, HBM roundtrips, and — worst — thousands of
[S, hd] = [32, 32] matmuls that each use 1/16 of the MXU.

This kernel instead packs ``tile_b`` sequences into one 128-row block and
computes every matmul at full MXU shape:

- QKV projection: one ``[128, D] x [D, 3D]`` matmul;
- per-head scores: ``[128, hd] x [hd, 128]`` — all tile_b sequences at once,
  cross-sequence terms killed by a block-diagonal additive mask;
- value mixing: ``[128, 128] x [128, hd]``;
- output projection: one ``[128, D] x [D, D]`` matmul.

Everything stays 2D (no lane-splitting reshapes, which Mosaic cannot do) and
lives in VMEM; HBM is touched once for input and once for output. Forward-only
(inference hot path); training uses the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_mha_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, mask_ref, out_ref,
    *, n_heads: int, seq_len: int, d_model: int, tile_b: int, causal: bool,
):
    head_dim = d_model // n_heads
    rows = tile_b * seq_len
    scale = head_dim ** -0.5

    x = x_ref[:].reshape(rows, d_model)

    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)

    # combined mask [rows, rows]: -inf across different sequences in the row
    # block (block-diagonal structure), at padded key positions, and (for
    # autoregressive decoding) above the in-sequence diagonal
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    allowed = (r // seq_len) == (c // seq_len)
    if causal:
        allowed = allowed & ((c % seq_len) <= (r % seq_len))
    key_pad = mask_ref[0]  # [1, rows] additive 0 / -inf per key (pre-flattened)
    big_mask = jnp.where(allowed, key_pad, -jnp.inf)

    ctx_heads = []
    for h in range(n_heads):
        q = qkv[:, h * head_dim : (h + 1) * head_dim]
        k = qkv[:, d_model + h * head_dim : d_model + (h + 1) * head_dim]
        v = qkv[:, 2 * d_model + h * head_dim : 2 * d_model + (h + 1) * head_dim]

        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [rows, rows]
        # two-sided clamp instead of a row-max reduce — see ops/layer.py
        # note (exact for |scores| <= 75; the training kernels max-subtract
        # exactly). Clamp BEFORE the mask add so padded keys stay -inf.
        scores = jnp.clip(scores, -75.0, 75.0) + big_mask
        exp = jnp.exp(scores)
        p = (exp / jnp.sum(exp, axis=-1, keepdims=True)).astype(x.dtype)

        # zeros in p outside the diagonal blocks kill cross-sequence terms
        ctx_heads.append(
            jnp.dot(p, v, preferred_element_type=jnp.float32).astype(x.dtype)
        )

    ctx = jnp.concatenate(ctx_heads, axis=1)  # [rows, D]
    out = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(x.dtype).reshape(tile_b, seq_len, d_model)


def pick_tile_b(b: int, s: int, target_rows: int = 256) -> int:
    """Largest batch tile (<= target_rows/s rows) that divides the batch."""
    best = 1
    t = 1
    while t * s <= target_rows:
        if b % t == 0:
            best = t
        t *= 2
    return best


@functools.partial(
    jax.jit, static_argnames=("n_heads", "tile_b", "causal", "interpret")
)
def fused_mha(
    x: jnp.ndarray,           # [B, S, D]
    wqkv: jnp.ndarray,        # [D, 3D] (q | k | v)
    bqkv: jnp.ndarray,        # [3D]
    wo: jnp.ndarray,          # [D, D]
    bo: jnp.ndarray,          # [D]
    mask: jnp.ndarray,        # [B, S] additive float32 (0 = attend, -inf = pad)
    n_heads: int,
    tile_b: int = 8,
    causal: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused self-attention block. Requires ``B % tile_b == 0`` (the model
    folds G into B, so pad the batch if needed)."""
    b, s, d = x.shape
    assert b % tile_b == 0, f"batch {b} not divisible by tile {tile_b}"
    dtype = x.dtype

    # off-TPU (CPU tests, virtual meshes) the kernel runs interpreted
    if jax.default_backend() == "cpu":
        interpret = True

    kernel = functools.partial(
        _fused_mha_kernel, n_heads=n_heads, seq_len=s, d_model=d, tile_b=tile_b,
        causal=causal,
    )
    grid = (b // tile_b,)
    rows = tile_b * s
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, d), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # scores/pv run over the padded [rows, rows] block
            flops=2 * b * s * d * (4 * d) + 2 * (b // tile_b) * n_heads * 2 * rows * rows * (d // n_heads),
            bytes_accessed=2 * (2 * b * s * d + 4 * d * d),
            transcendentals=(b // tile_b) * n_heads * rows * rows,
        ),
    )(x, wqkv, bqkv, wo, bo, mask.reshape(b // tile_b, 1, rows))


def mha_blockpacked(x, wqkv, bqkv, wo, bo, mask, n_heads, causal=False,
                    dropout_rate=0.0, dropout_rng=None, tile_b=None):
    """Block-packed attention in *pure XLA* — the training-path counterpart of
    :func:`fused_mha`.

    Packs ``tile_b`` sequences into one row block so the score and value
    matmuls run at full MXU shape ([rows, hd] x [hd, rows] instead of
    thousands of [S, hd] x [hd, S]); cross-sequence terms are killed by a
    block-diagonal additive mask. Unlike the Pallas kernel this composes with
    autodiff and attention-weight dropout, so it serves the training step.
    FLOPs on scores inflate by ``tile_b`` but MXU utilization improves ~16x —
    a large net win at DeepSVG shapes.
    """
    b, s, d = x.shape
    if tile_b is None:
        tile_b = pick_tile_b(b, s)
    head_dim = d // n_heads
    rows = tile_b * s
    nb = b // tile_b

    qkv = (x.reshape(-1, d) @ wqkv + bqkv).reshape(nb, rows, 3 * d)

    # block-diagonal (+ causal) structure and key padding, combined
    r = jnp.arange(rows)
    allowed = (r[:, None] // s) == (r[None, :] // s)
    if causal:
        allowed = allowed & ((r[None, :] % s) <= (r[:, None] % s))
    key_pad = (
        mask.reshape(nb, 1, rows)
        if mask is not None else jnp.zeros((nb, 1, rows), jnp.float32)
    )
    big_mask = jnp.where(allowed[None], key_pad, -jnp.inf)  # [nb, rows, rows]

    def head(h):
        q = qkv[:, :, h * head_dim : (h + 1) * head_dim] * (head_dim ** -0.5)
        k = qkv[:, :, d + h * head_dim : d + (h + 1) * head_dim]
        v = qkv[:, :, 2 * d + h * head_dim : 2 * d + (h + 1) * head_dim]
        scores = jnp.einsum("brd,bkd->brk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(scores + big_mask, axis=-1).astype(x.dtype)
        return p, v

    ctx_heads = []
    drop_rngs = (
        jax.random.split(dropout_rng, n_heads)
        if (dropout_rate > 0.0 and dropout_rng is not None) else [None] * n_heads
    )
    for h in range(n_heads):
        p, v = head(h)
        if dropout_rate > 0.0 and drop_rngs[h] is not None:
            keep = jax.random.bernoulli(drop_rngs[h], 1.0 - dropout_rate, p.shape)
            p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        ctx_heads.append(jnp.einsum("brk,bkd->brd", p, v))
    ctx = jnp.concatenate(ctx_heads, axis=-1).reshape(-1, d)
    return ((ctx @ wo) + bo).reshape(b, s, d).astype(x.dtype)


def mha_reference(x, wqkv, bqkv, wo, bo, mask, n_heads, causal=False,
                  dropout_rate=0.0, dropout_rng=None):
    """Plain-XLA equivalent of :func:`fused_mha` (tests + training path; the
    only path with attention-weight dropout)."""
    b, s, d = x.shape
    head_dim = d // n_heads
    qkv = (x.reshape(-1, d) @ wqkv + bqkv).reshape(b, s, 3 * d)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(m):
        return m.reshape(b, s, n_heads, head_dim)

    q, k, v = heads(q) * (head_dim ** -0.5), heads(k), heads(v)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask[:, None, None, :]
    if causal:
        tri = jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, -jnp.inf)
        scores = scores + tri[None, None]
    p = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return (ctx.reshape(-1, d) @ wo + bo).reshape(b, s, d).astype(x.dtype)
