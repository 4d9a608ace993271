"""Fused argument-head softmax cross-entropy (Pallas TPU, custom VJP).

Training's memory wall is the argument-logits tensor: the head expands the
decoder states ``[R, D]`` to ``[R, n_args, args_dim] = [R, 11, 257]`` logits
— ~1.4 GB f32 at batch 512 — which XLA materializes in the forward AND keeps
(plus its softmax) as backward residuals for the cross-entropy
(reference loss.py:45-53 pays the same through torch autograd).

This op computes the CE directly from ``(y, W, b, targets)``: the forward
emits only the per-token-per-slot CE ``[R, n_args]`` (logits live tile-wise
in VMEM, one slot at a time), and the backward flash-style *recomputes* the
tile's logits/softmax to form ``dy``, ``dW``, ``db`` — nothing head-sized
ever touches HBM. Residuals are just the op's inputs, so the peak-memory
term that capped the per-chip batch disappears.

Weight/bias grads accumulate across the sequential grid in the output VMEM
block (initialized at program 0 — same pattern as ops/attention_vjp.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(
    y_ref, wa_ref, ba_ref, tgt_ref, ce_ref,
    *, n_args: int, args_vocab: int, tile_rows: int,
):
    # wa_ref is stacked per-slot [n_args, D, vocab] (likewise ba_ref
    # [n_args, vocab]): selecting a slot is a free leading-dim index. The
    # original flat layout's per-slot LANE slices (offsets 257, 514, ... not
    # multiples of 128) forced a vector relayout per slot per grid step —
    # measured 2.61 ms/step fwd+bwd at flagship shapes vs a ~0.95 ms matmul
    # floor; the stacked layout removes them.
    y = y_ref[:]  # [tile_rows, D]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, args_vocab), 1)
    cols = []
    for s in range(n_args):
        lg = jnp.dot(y, wa_ref[s], preferred_element_type=jnp.float32)
        lg = lg + ba_ref[s : s + 1, :].astype(jnp.float32)
        m = jnp.max(lg, axis=-1, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(lg - m), axis=-1, keepdims=True))
        onehot = col == tgt_ref[:, s : s + 1]
        tl = jnp.sum(jnp.where(onehot, lg, 0.0), axis=-1, keepdims=True)
        cols.append(lse - tl)
    ce_ref[:] = jnp.concatenate(cols, axis=1)  # [tile_rows, n_args]


def _pairwise_kernel(
    y_ref, wa_ref, ba_ref, tgt_ref, ce_ref,
    *, n_args: int, args_vocab: int, tile_rows: int, n_variants: int,
):
    """Like ``_fwd_kernel`` but each row is scored against ``n_variants``
    candidate target rows at once: the logits/logsumexp per argument slot are
    computed ONCE in VMEM and re-gathered per variant. This is the self-match
    (Hungarian) cost-matrix hot path — the reference builds the full
    ``[N, P, S, n_args, args_dim]`` logits to score every (proposal, target)
    pair (model/model.py:322-335); here the pairwise CE ``[rows, G*n_args]``
    is the only head-sized tensor that ever exists."""
    y = y_ref[:]  # [tile_rows, D]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, args_vocab), 1)
    cols: list = [None] * (n_variants * n_args)
    for s in range(n_args):
        lg = jnp.dot(y, wa_ref[s], preferred_element_type=jnp.float32)
        lg = lg + ba_ref[s : s + 1, :].astype(jnp.float32)
        m = jnp.max(lg, axis=-1, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(lg - m), axis=-1, keepdims=True))
        for g in range(n_variants):
            c = g * n_args + s
            onehot = col == tgt_ref[:, c : c + 1]
            tl = jnp.sum(jnp.where(onehot, lg, 0.0), axis=-1, keepdims=True)
            cols[c] = lse - tl
    ce_ref[:] = jnp.concatenate(cols, axis=1)  # [tile_rows, n_variants*n_args]


def _bwd_kernel(
    y_ref, wa_ref, ba_ref, tgt_ref, g_ref, dy_ref, dwa_ref, dba_ref,
    *, n_args: int, args_vocab: int, tile_rows: int, d_model: int,
):
    """Backward: dlg = (softmax - onehot) * g, then dy / dW / db matmuls.

    Numerics tradeoff (round 3, grad-verified): ``dlg`` is rounded to the
    activation dtype (bf16 in production) BEFORE the dy and dW matmuls — an
    intentional perf choice (bf16 MXU issue rate) replacing the earlier f32
    wgrad path. The accumulators stay f32 (``preferred_element_type``); only
    the per-element softmax gradient loses mantissa. Acceptance bar is the
    measured parity curves (docs/PARITY_CURVE_CHIP.md), which cover this
    rounding within the stated bf16 tolerance."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwa_ref[:] = jnp.zeros_like(dwa_ref)
        dba_ref[:] = jnp.zeros_like(dba_ref)

    y = y_ref[:]
    md = y.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, args_vocab), 1)
    dy = jnp.zeros((tile_rows, d_model), jnp.float32)
    for s in range(n_args):
        w = wa_ref[s]  # [D, vocab] — free leading-dim slot select
        lg = jnp.dot(y, w, preferred_element_type=jnp.float32)
        lg = lg + ba_ref[s : s + 1, :].astype(jnp.float32)
        m = jnp.max(lg, axis=-1, keepdims=True)
        e = jnp.exp(lg - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        onehot = col == tgt_ref[:, s : s + 1]
        dlg = (p - jnp.where(onehot, 1.0, 0.0)) * g_ref[:, s : s + 1]
        dlg16 = dlg.astype(md)
        dy = dy + jax.lax.dot_general(
            dlg16, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwa_ref[s] = dwa_ref[s] + jax.lax.dot_general(
            y, dlg16, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dba_ref[s : s + 1, :] = dba_ref[s : s + 1, :] + jnp.sum(
            dlg, axis=0, keepdims=True
        )
    dy_ref[:] = dy.astype(dy_ref.dtype)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _stack_slots(wa, ba, n_args):
    """[D, n_args*vocab] -> [n_args, D, vocab] (+ ba [n_args, vocab]): the
    kernels select a slot by a free leading-dim index instead of a
    lane-unaligned slice (vocab=257 offsets force per-slot relayouts)."""
    d, k = wa.shape
    vocab = k // n_args
    wa3 = wa.reshape(d, n_args, vocab).transpose(1, 0, 2)
    ba2 = ba.reshape(n_args, vocab)
    return wa3, ba2


def _ce_fwd_call(y, wa, ba, targets, n_args, tile_rows, interpret):
    r, d = y.shape
    args_vocab = wa.shape[-1] // n_args
    if jax.default_backend() == "cpu":
        interpret = True
    wa3, ba2 = _stack_slots(wa, ba, n_args)
    kernel = functools.partial(
        _fwd_kernel, n_args=n_args, args_vocab=args_vocab, tile_rows=tile_rows,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, n_args), jnp.float32),
        grid=(r // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _full_spec(wa3.shape),
            _full_spec(ba2.shape),
            pl.BlockSpec((tile_rows, n_args), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, n_args), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y, wa3, ba2, targets)


def _ce_bwd_call(y, wa, ba, targets, g, n_args, tile_rows, interpret):
    r, d = y.shape
    k = wa.shape[-1]
    args_vocab = k // n_args
    if jax.default_backend() == "cpu":
        interpret = True
    wa3, ba2 = _stack_slots(wa, ba, n_args)
    kernel = functools.partial(
        _bwd_kernel, n_args=n_args, args_vocab=args_vocab, tile_rows=tile_rows,
        d_model=d,
    )
    dy, dwa3, dba2 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((r, d), y.dtype),
            jax.ShapeDtypeStruct((n_args, d, args_vocab), jnp.float32),
            jax.ShapeDtypeStruct((n_args, args_vocab), jnp.float32),
        ),
        grid=(r // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _full_spec(wa3.shape),
            _full_spec(ba2.shape),
            pl.BlockSpec((tile_rows, n_args), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, n_args), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _full_spec((n_args, d, args_vocab)),
            _full_spec((n_args, args_vocab)),
        ),
        interpret=interpret,
    )(y, wa3, ba2, targets, g)
    dwa = dwa3.transpose(1, 0, 2).reshape(d, k)
    return dy, dwa.astype(wa.dtype), dba2.reshape(-1).astype(ba.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _args_ce_core(y, wa, ba, targets, n_args, tile_rows, interpret):
    return _ce_fwd_call(y, wa, ba, targets, n_args, tile_rows, interpret)


def _core_fwd(y, wa, ba, targets, n_args, tile_rows, interpret):
    ce = _ce_fwd_call(y, wa, ba, targets, n_args, tile_rows, interpret)
    return ce, (y, wa, ba, targets)


def _core_bwd(n_args, tile_rows, interpret, res, g):
    y, wa, ba, targets = res
    dy, dwa, dba = _ce_bwd_call(
        y, wa, ba, targets, g.astype(jnp.float32), n_args, tile_rows, interpret
    )
    return dy, dwa, dba, np.zeros(targets.shape, jax.dtypes.float0)


_args_ce_core.defvjp(_core_fwd, _core_bwd)


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def args_ce(y, wa, ba, targets, tile_rows: int = 256, interpret: bool = False):
    """Per-token-per-slot CE ``[..., n_args]`` of the argument head applied to
    ``y [..., D]`` against integer ``targets [..., n_args]`` in
    ``[0, args_vocab)`` — differentiable wrt ``y``/``wa``/``ba``, without ever
    materializing the ``[..., n_args, args_vocab]`` logits."""
    *lead, d = y.shape
    n_args = targets.shape[-1]
    yf = y.reshape(-1, d)
    tf = targets.reshape(-1, n_args).astype(jnp.int32)
    r = yf.shape[0]
    pad = (-r) % tile_rows
    if pad:
        yf = jnp.pad(yf, ((0, pad), (0, 0)))
        tf = jnp.pad(tf, ((0, pad), (0, 0)))
    ce = _args_ce_core(yf, wa, ba, tf, n_args, tile_rows, interpret)
    return ce[:r].reshape(tuple(lead) + (n_args,))


@functools.partial(
    jax.jit, static_argnames=("n_variants", "tile_rows", "interpret")
)
def args_ce_pairwise(y, wa, ba, targets, n_variants: int,
                     tile_rows: int = 256, interpret: bool = False):
    """Pairwise argument-head CE ``[..., n_variants * n_args]`` of ``y
    [..., D]`` against ``n_variants`` candidate integer target rows per token
    (``targets [..., n_variants * n_args]``, classes in ``[0, args_vocab)``,
    variant-major layout) — the self-match cost matrix without ever
    materializing the logits. Forward-only by design: the reference computes
    its matching cost under ``no_grad`` (model/model.py:321), so no VJP is
    needed; callers pass ``stop_gradient`` inputs."""
    *lead, d = y.shape
    k = targets.shape[-1]
    n_args = k // n_variants
    args_vocab = wa.shape[-1] // n_args
    yf = y.reshape(-1, d)
    tf = targets.reshape(-1, k).astype(jnp.int32)
    r = yf.shape[0]
    pad = (-r) % tile_rows
    if pad:
        yf = jnp.pad(yf, ((0, pad), (0, 0)))
        tf = jnp.pad(tf, ((0, pad), (0, 0)))
    interp = interpret or jax.default_backend() == "cpu"
    wa3, ba2 = _stack_slots(wa, ba, n_args)
    kernel = functools.partial(
        _pairwise_kernel, n_args=n_args, args_vocab=args_vocab,
        tile_rows=tile_rows, n_variants=n_variants,
    )
    rp = yf.shape[0]
    ce = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rp, k), jnp.float32),
        grid=(rp // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _full_spec(wa3.shape),
            _full_spec(ba2.shape),
            pl.BlockSpec((tile_rows, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interp,
    )(yf, wa3, ba2, tf)
    return ce[:r].reshape(tuple(lead) + (k,))
