"""Fused SVG-token embedding kernel (Pallas TPU).

The model's input embedding is a sum of lookups: command embedding + 11
per-argument embeddings (projected by one Linear) + optional group embedding +
positional table. As gathers, the argument lookup materializes a
``[B·S, 11, 64]`` intermediate and lowers to slow TPU dynamic-gathers — it
costs as much as several transformer layers.

Because everything downstream of the lookups is linear, the argument
embedding+projection folds into 11 fused tables ``T_i = arg_embed @ W_fcn_i``
of shape ``[257, D]``, and a lookup becomes a one-hot matmul — which the MXU
executes at full rate. The kernel builds each one-hot block in VMEM via iota
comparison (never touching HBM) and accumulates all terms in one pass:

    out[row] = CmdT[cmd] + sum_i T_i[arg_i + 1] (+ GroupT[gid]) + PosT[s]

Index operands are passed as ``[B, S, k]`` with blocks ``(tile_b, S, k)`` —
trailing block dims equal to the full array dims are legal for ANY tile_b
(a pre-flattened ``[B·S, k]`` block needs ``tile_b·S % 8 == 0``, which
one-stage models violate via ``pick_tile_b(s=242) = 1``). In-kernel they
collapse to 2D by a leading-dims-only reshape (no lane/sublane relayout)
and are lane-sliced per slot.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _embed_kernel(
    cmd_ref, args_ref, groups_ref, cmd_t_ref, arg_t_ref, group_t_ref, pos_t_ref,
    out_ref, *, tile_b: int, seq_len: int, d_model: int, n_args: int,
    args_vocab: int, n_commands: int, use_group: bool, group_vocab: int,
):
    rows = tile_b * seq_len
    f32 = jnp.float32

    # Precision.HIGHEST: these matmuls ARE the lookup — default single
    # bf16-pass MXU precision would round f32 table values (a gather is
    # exact). bf16 tables are already exact in one pass (native MXU input),
    # and Mosaic rejects fp32 contract precision on bf16 operands.
    hi = (jax.lax.Precision.HIGHEST if cmd_t_ref.dtype == jnp.float32
          else jax.lax.Precision.DEFAULT)
    cmd = cmd_ref[:].reshape(rows, 1)
    args_flat = args_ref[:].reshape(rows, n_args)
    col7 = jax.lax.broadcasted_iota(jnp.int32, (rows, n_commands), 1)
    oh_cmd = (col7 == cmd).astype(cmd_t_ref.dtype)
    acc = jnp.dot(oh_cmd, cmd_t_ref[:], preferred_element_type=f32, precision=hi)

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, args_vocab), 1)
    for i in range(n_args):
        a = args_flat[:, i : i + 1] + 1  # [rows, 1]; PAD -1 -> 0
        oh = (col == a).astype(arg_t_ref.dtype)
        table_i = arg_t_ref[i * args_vocab : (i + 1) * args_vocab, :]
        acc = acc + jnp.dot(oh, table_i, preferred_element_type=f32, precision=hi)

    if use_group:
        g = groups_ref[:].reshape(rows, 1)
        colg = jax.lax.broadcasted_iota(jnp.int32, (rows, group_vocab), 1)
        oh_g = (colg == g).astype(group_t_ref.dtype)
        acc = acc + jnp.dot(oh_g, group_t_ref[:], preferred_element_type=f32,
                            precision=hi)

    # positional term: PosT [S, D] repeated for each of the tile_b sequences
    pos = pos_t_ref[:].astype(f32)  # [S, D]
    acc = acc + jnp.concatenate([pos] * tile_b, axis=0)
    out_ref[:] = acc.astype(out_ref.dtype).reshape(tile_b, seq_len, d_model)


@functools.partial(
    jax.jit,
    static_argnames=("tile_b", "use_group", "interpret", "out_dtype"),
)
def fused_embedding(
    commands: jnp.ndarray,     # [B, S] int
    args: jnp.ndarray,         # [B, S, n_args] (PAD_VAL -1 based)
    groups,                    # [B, S] int or None
    cmd_table: jnp.ndarray,    # [n_commands, D]
    arg_tables: jnp.ndarray,   # [n_args * args_vocab, D] (fused with the FCN)
    group_table,               # [group_vocab, D] or None
    pos_table: jnp.ndarray,    # [S, D]
    tile_b: int = 8,
    use_group: bool = False,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    b, s = commands.shape
    n_args = args.shape[-1]
    d = cmd_table.shape[-1]
    args_vocab = arg_tables.shape[0] // n_args
    rows = tile_b * s
    if jax.default_backend() == "cpu":
        interpret = True

    if groups is None:
        groups = jnp.zeros((b, s), jnp.int32)
    if group_table is None:
        group_table = jnp.zeros((8, d), cmd_table.dtype)
    group_vocab = group_table.shape[0]

    # 3D index operands: trailing block dims = full dims (see module docstring)
    cmd_flat = commands.astype(jnp.int32).reshape(b, s, 1)
    args_flat = args.astype(jnp.int32).reshape(b, s, n_args)
    groups_flat = groups.astype(jnp.int32).reshape(b, s, 1)

    kernel = functools.partial(
        _embed_kernel, tile_b=tile_b, seq_len=s, d_model=d, n_args=n_args,
        args_vocab=args_vocab, n_commands=cmd_table.shape[0],
        use_group=use_group, group_vocab=group_vocab,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, d), out_dtype),
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, s, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, s, n_args), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, s, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cmd_table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(arg_tables.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(group_table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pos_table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cmd_flat, args_flat, groups_flat, cmd_table, arg_tables, group_table, pos_table)


def _embed_bwd_kernel(
    cmd_ref, args_ref, groups_ref, dy_ref,
    dcmd_ref, darg_ref, dgroup_ref, dpos_ref,
    *, tile_b: int, seq_len: int, d_model: int, n_args: int,
    args_vocab: int, n_commands: int, use_group: bool, group_vocab: int,
):
    """Backward of the one-hot-matmul embedding: table grads are the
    TRANSPOSED one-hot matmuls ``oh^T @ dy`` — MXU work instead of the
    scatter-adds an XLA gather's backward lowers to. Grads accumulate in the
    output VMEM blocks across the sequential grid (program 0 initializes)."""
    rows = tile_b * seq_len

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dcmd_ref[:] = jnp.zeros_like(dcmd_ref)
        darg_ref[:] = jnp.zeros_like(darg_ref)
        dgroup_ref[:] = jnp.zeros_like(dgroup_ref)
        dpos_ref[:] = jnp.zeros_like(dpos_ref)

    # One-hot wgrad matmuls are EXACT in the incoming gradient's dtype: each
    # product is 1*dy or 0 (no rounding), and accumulation happens in f32
    # (preferred_element_type). Running them as f32 Precision.HIGHEST costs
    # ~6x MXU passes for bit-identical results — measured 1.56 ms/step vs
    # ~0.25 for the bf16 lowering at flagship training shapes. f32 dy keeps
    # HIGHEST (Mosaic would otherwise round the f32 values to bf16 inputs).
    dy3 = dy_ref[:]                                # [tile_b, S, D]
    md = dy3.dtype
    hi = (jax.lax.Precision.HIGHEST if md == jnp.float32
          else jax.lax.Precision.DEFAULT)
    dyr = dy3.reshape(rows, d_model)

    cmd = cmd_ref[:].reshape(rows, 1)
    col7 = jax.lax.broadcasted_iota(jnp.int32, (rows, n_commands), 1)
    oh_cmd = (col7 == cmd).astype(md)
    dcmd_ref[:] = dcmd_ref[:] + jax.lax.dot_general(
        oh_cmd, dyr, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )

    args_flat = args_ref[:].reshape(rows, n_args)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, args_vocab), 1)
    for i in range(n_args):
        a = args_flat[:, i : i + 1] + 1
        oh = (col == a).astype(md)
        sl = slice(i * args_vocab, (i + 1) * args_vocab)
        darg_ref[sl, :] = darg_ref[sl, :] + jax.lax.dot_general(
            oh, dyr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )

    if use_group:
        g = groups_ref[:].reshape(rows, 1)
        colg = jax.lax.broadcasted_iota(jnp.int32, (rows, group_vocab), 1)
        oh_g = (colg == g).astype(md)
        dgroup_ref[:] = dgroup_ref[:] + jax.lax.dot_general(
            oh_g, dyr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )

    dpos_ref[:] = dpos_ref[:] + jnp.sum(dy3.astype(jnp.float32), axis=0)


def _embed_bwd_call(cmd3, args3, groups3, dy, n_commands, n_args, args_vocab,
                    group_vocab, tile_b, use_group, interpret):
    b, s, _ = cmd3.shape
    d = dy.shape[-1]
    if jax.default_backend() == "cpu":
        interpret = True
    kernel = functools.partial(
        _embed_bwd_kernel, tile_b=tile_b, seq_len=s, d_model=d, n_args=n_args,
        args_vocab=args_vocab, n_commands=n_commands, use_group=use_group,
        group_vocab=group_vocab,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_commands, d), jnp.float32),
            jax.ShapeDtypeStruct((n_args * args_vocab, d), jnp.float32),
            jax.ShapeDtypeStruct((group_vocab, d), jnp.float32),
            jax.ShapeDtypeStruct((s, d), jnp.float32),
        ),
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, s, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, s, n_args), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, s, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(full((n_commands, d)), full((n_args * args_vocab, d)),
                   full((group_vocab, d)), full((s, d))),
        interpret=interpret,
    )(cmd3, args3, groups3, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_embedding_train(commands, args, groups, cmd_table, arg_tables,
                          group_table, pos_table, tile_b, use_group,
                          out_dtype, interpret):
    """Differentiable :func:`fused_embedding` — same forward kernel, with a
    Pallas backward producing table grads as transposed one-hot matmuls
    (grid-accumulated in VMEM) instead of HBM scatter-adds. ``groups`` and
    ``group_table`` must be arrays (callers pass zeros when unused)."""
    return fused_embedding(
        commands, args, groups, cmd_table, arg_tables, group_table, pos_table,
        tile_b=tile_b, use_group=use_group, out_dtype=out_dtype,
        interpret=interpret,
    )


def _fet_fwd(commands, args, groups, cmd_table, arg_tables, group_table,
             pos_table, tile_b, use_group, out_dtype, interpret):
    out = fused_embedding(
        commands, args, groups, cmd_table, arg_tables, group_table, pos_table,
        tile_b=tile_b, use_group=use_group, out_dtype=out_dtype,
        interpret=interpret,
    )
    # tables ride along as residuals only for their (static) shapes/dtypes
    return out, (commands, args, groups, cmd_table, arg_tables, group_table,
                 pos_table)


def _fet_bwd(tile_b, use_group, out_dtype, interpret, res, dy):
    commands, args, groups, cmd_table, arg_tables, group_table, pos_table = res
    n_commands, group_vocab = cmd_table.shape[0], group_table.shape[0]
    b, s = commands.shape
    n_args = args.shape[-1]
    args_vocab = arg_tables.shape[0] // n_args
    cmd3 = commands.astype(jnp.int32).reshape(b, s, 1)
    args3 = args.astype(jnp.int32).reshape(b, s, n_args)
    groups3 = groups.astype(jnp.int32).reshape(b, s, 1)
    dcmd, darg, dgroup, dpos = _embed_bwd_call(
        cmd3, args3, groups3, dy, n_commands, n_args, args_vocab, group_vocab,
        tile_b, use_group, interpret,
    )
    import numpy as np

    f0 = jax.dtypes.float0
    return (np.zeros(commands.shape, f0), np.zeros(args.shape, f0),
            np.zeros(groups.shape, f0), dcmd.astype(cmd_table.dtype),
            darg.astype(arg_tables.dtype), dgroup.astype(group_table.dtype),
            dpos.astype(pos_table.dtype))


fused_embedding_train.defvjp(_fet_fwd, _fet_bwd)


def fold_arg_tables(arg_embed: jnp.ndarray, fcn_kernel: jnp.ndarray,
                    fcn_bias: jnp.ndarray, n_args: int) -> jnp.ndarray:
    """Fold ``embed_fcn(concat_i(arg_embed[a_i]))`` into per-slot tables:
    ``T_i = arg_embed @ W[64*i:64*(i+1)]``; the bias is spread onto slot 0.

    arg_embed: [vocab, 64]; fcn_kernel: [64*n_args, D]; returns
    ``[n_args*vocab, D]``.
    """
    vocab, e = arg_embed.shape
    tables = []
    for i in range(n_args):
        t = arg_embed @ fcn_kernel[e * i : e * (i + 1)]
        if i == 0:
            t = t + fcn_bias[None, :]
        tables.append(t)
    return jnp.concatenate(tables, axis=0)
