"""Fused classification-head + argmax kernel (Pallas TPU).

Greedy sampling needs only the argmax of the command/argument logits, but the
stock lowering materializes the full ``[B, G, S, 11, 257]`` argument logits
(1.4 GB bf16 at bench shapes), converts them, builds an equally-sized s32 iota
and reduces — ~6 GB of HBM traffic for information worth 4 bytes per token.

This kernel computes the head matmuls tile-by-tile in VMEM and reduces each
``[rows, 257]`` block to ids immediately; HBM sees only the decoder hidden
states in and ``[rows, 12]`` ids out. Ties resolve to the smallest index,
matching ``jnp.argmax``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _argmax_lanes(logits: jnp.ndarray, n_valid: int) -> jnp.ndarray:
    """First-argmax over the lane axis: [rows, V] f32 -> [rows, 1] int32."""
    rows, v = logits.shape
    mx = jnp.max(logits, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, v), 1)
    candidate = jnp.where((logits == mx) & (col < n_valid), col, jnp.int32(2**30))
    return jnp.min(candidate, axis=-1, keepdims=True)


def _head_kernel(
    x_ref, wc_ref, bc_ref, wa_ref, ba_ref, out_ref,
    *, tile_rows: int, d_model: int, n_commands: int, n_args: int, args_vocab: int,
):
    x = x_ref[:]  # [tile_rows, D]

    cmd_logits = jnp.dot(x, wc_ref[:], preferred_element_type=jnp.float32)
    cmd_logits = cmd_logits + bc_ref[:].astype(jnp.float32)
    ids = [_argmax_lanes(cmd_logits, n_commands)]

    for i in range(n_args):
        w_i = wa_ref[:, i * args_vocab : (i + 1) * args_vocab]
        logits = jnp.dot(x, w_i, preferred_element_type=jnp.float32)
        logits = logits + ba_ref[:, i * args_vocab : (i + 1) * args_vocab].astype(jnp.float32)
        ids.append(_argmax_lanes(logits, args_vocab))

    out_ref[:] = jnp.concatenate(ids, axis=1)  # [tile_rows, 1 + n_args]


@functools.partial(
    jax.jit, static_argnames=("n_commands", "n_args", "tile_rows", "interpret")
)
def fused_head_argmax(
    x: jnp.ndarray,      # [R, D] decoder hidden states (flattened tokens)
    wc: jnp.ndarray,     # [D, n_commands]
    bc: jnp.ndarray,     # [n_commands]
    wa: jnp.ndarray,     # [D, n_args * args_vocab]
    ba: jnp.ndarray,     # [n_args * args_vocab]
    n_commands: int,
    n_args: int,
    tile_rows: int = 256,
    interpret: bool = False,
):
    """Returns ``ids [R, 1 + n_args]`` int32: column 0 = command argmax,
    columns 1..n_args = per-argument argmax."""
    r, d = x.shape
    args_vocab = wa.shape[-1] // n_args
    assert r % tile_rows == 0, f"rows {r} not divisible by tile {tile_rows}"
    if jax.default_backend() == "cpu":
        interpret = True

    # pad the command head to an 8-lane boundary for clean VMEM tiling
    kernel = functools.partial(
        _head_kernel, tile_rows=tile_rows, d_model=d, n_commands=n_commands,
        n_args=n_args, args_vocab=args_vocab,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, 1 + n_args), jnp.int32),
        grid=(r // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wc.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bc.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(wa.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ba.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, 1 + n_args), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, wc, bc, wa, ba.reshape(1, -1))
