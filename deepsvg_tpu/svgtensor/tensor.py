"""SVG tensor packing and coordinate transforms.

Two halves:

1. **Host-side packing (numpy)** — converts variable-length 14-col command rows
   into the fixed-shape, SOS/EOS/padded arrays the model consumes. Runs in the
   data pipeline (CPU), never under jit. Reference semantics:
   difflib/tensor.py:108-149 (add_sos/add_eos/pad) and
   svgtensor_dataset.py:164-205 (get_data group packing).

2. **Device-side transforms (JAX)** — relative<->absolute argument coordinates,
   fully vectorized and jit-friendly (reference: difflib/tensor.py:172-189
   ``get_relative_args`` and model/model.py:461-479 ``_make_absolute``, which are
   per-sample boolean-indexing loops in the reference; here they are batched
   cumulative ops over the sequence axis).

Everything is **batch-first**: ``commands [..., S]``, ``args [..., S, 11]``.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from .constants import (
    ARGS_DIM,
    CMD_ARGS_MASK_NP,
    CMD_EOS,
    CMD_SOS,
    Index,
    IndexArgs,
    N_ARGS,
    PAD_VAL,
)

# ---------------------------------------------------------------------------
# Host-side (numpy) packing
# ---------------------------------------------------------------------------


def data14_to_cmd_args(data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split a ``[n, 14]`` row tensor into ``commands [n]`` and ``args [n, 11]``.

    Drops the redundant start-position columns (6-7).
    """
    data = np.asarray(data, dtype=np.float32)
    commands = data[:, Index.COMMAND].astype(np.int32)
    args = np.concatenate(
        [data[:, Index.RADIUS], data[:, Index.X_AXIS_ROT : Index.X_AXIS_ROT + 1],
         data[:, Index.LARGE_ARC_FLG : Index.LARGE_ARC_FLG + 1],
         data[:, Index.SWEEP_FLG : Index.SWEEP_FLG + 1],
         data[:, Index.CONTROL1], data[:, Index.CONTROL2], data[:, Index.END_POS]],
        axis=-1,
    ).astype(np.float32)
    return commands, args


def cmd_args_to_data14(commands: np.ndarray, args: np.ndarray) -> np.ndarray:
    """Inverse of :func:`data14_to_cmd_args`; recomputes start positions by
    chaining end positions (difflib/tensor.py:75-82 ``start_pos`` property)."""
    commands = np.asarray(commands, dtype=np.float32).reshape(-1, 1)
    args = np.asarray(args, dtype=np.float32).reshape(-1, N_ARGS)
    if len(commands) == 0:  # e.g. an untrained model sampling zero commands
        return np.zeros((0, 14), np.float32)
    end_pos = args[:, IndexArgs.END_POS]
    start_pos = np.concatenate([np.zeros((1, 2), np.float32), end_pos[:-1]], axis=0)
    return np.concatenate(
        [commands, args[:, IndexArgs.RADIUS],
         args[:, IndexArgs.X_AXIS_ROT : IndexArgs.X_AXIS_ROT + 1],
         args[:, IndexArgs.LARGE_ARC_FLG : IndexArgs.LARGE_ARC_FLG + 1],
         args[:, IndexArgs.SWEEP_FLG : IndexArgs.SWEEP_FLG + 1],
         start_pos, args[:, IndexArgs.CONTROL1], args[:, IndexArgs.CONTROL2], end_pos],
        axis=-1,
    )


def pack_sequence(
    commands: np.ndarray,
    args: np.ndarray,
    target_len: int,
    add_sos: bool = True,
    add_eos: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """SOS + content + EOS + pad-to-``target_len``.

    Mirrors reference ``add_eos().add_sos().pad(target_len)``: EOS/pad commands
    are ``CMD_EOS``; SOS/EOS/pad argument rows are all ``PAD_VAL``. Content is
    truncated if it would overflow (cannot happen for filtered datasets).

    Returns ``(commands [target_len] int32, args [target_len, 11] float32)``.
    """
    commands = np.asarray(commands, dtype=np.int32).reshape(-1)
    args = np.asarray(args, dtype=np.float32).reshape(-1, N_ARGS)

    max_content = target_len - int(add_sos) - int(add_eos)
    commands, args = commands[:max_content], args[:max_content]
    n = len(commands)

    out_cmd = np.full((target_len,), CMD_EOS, dtype=np.int32)
    out_args = np.full((target_len, N_ARGS), PAD_VAL, dtype=np.float32)
    ofs = int(add_sos)
    if add_sos:
        out_cmd[0] = CMD_SOS
    out_cmd[ofs : ofs + n] = commands
    out_args[ofs : ofs + n] = args
    return out_cmd, out_args


def relative_args_np(commands: np.ndarray, args: np.ndarray) -> np.ndarray:
    """Host-side absolute -> relative encoding (reference
    difflib/tensor.py:172-189), used by the data pipeline."""
    from .constants import CMD_ARGS_MASK_NP

    data = np.asarray(args, dtype=np.float32).copy()
    commands = np.asarray(commands)
    real = commands < CMD_EOS
    d = data[real]
    if len(d) > 1:
        start = d[:-1, IndexArgs.END_POS].copy()
        d[1:, IndexArgs.CONTROL1] -= start
        d[1:, IndexArgs.CONTROL2] -= start
        d[1:, IndexArgs.END_POS] -= start
        data[real] = d
    mask = CMD_ARGS_MASK_NP[commands].astype(bool)
    data[mask] += ARGS_DIM - 1
    data[~mask] = PAD_VAL
    return data


def pack_groups(
    group_tensors: Sequence[np.ndarray],
    max_num_groups: int,
    max_seq_len: int,
    max_total_len: int,
    fillings: Sequence[int] | None = None,
) -> dict[str, np.ndarray]:
    """Pack a list of per-path ``[n_i, 14]`` row tensors into the full model-args
    dict (reference: svgtensor_dataset.py:164-205 ``get_data``).

    Returns a dict with:
      - ``commands [G, max_seq_len+2]``, ``args [G, ..., 11]``, ``args_rel`` —
        per-group packed (two-stage models),
      - ``commands_grouped [1, max_total_len+2]``, ``args_grouped``,
        ``args_rel_grouped`` — concatenated packing with a singleton group axis
        (one-stage models; the reference stacks a 1-element list, giving the
        same shape),
      - ``filling [G, 1]`` — per-group filling flags,
    where G = ``max_num_groups``. Missing groups are empty (SOS+EOS+pad).
    """
    groups = [np.asarray(t, dtype=np.float32).reshape(-1, 14) for t in group_tensors]
    groups = groups[:max_num_groups]
    fill = list(fillings) if fillings is not None else [0] * len(groups)
    fill = (fill + [0] * max_num_groups)[:max_num_groups]
    while len(groups) < max_num_groups:
        groups.append(np.zeros((0, 14), dtype=np.float32))

    sep_cmd = np.zeros((max_num_groups, max_seq_len + 2), dtype=np.int32)
    sep_args = np.zeros((max_num_groups, max_seq_len + 2, N_ARGS), dtype=np.float32)
    for gi, t in enumerate(groups):
        c, a = data14_to_cmd_args(t)
        sep_cmd[gi], sep_args[gi] = pack_sequence(c, a, max_seq_len + 2)

    flat = np.concatenate(groups, axis=0)
    c, a = data14_to_cmd_args(flat)
    grouped_cmd, grouped_args = pack_sequence(c, a, max_total_len + 2)

    return {
        "commands": sep_cmd,
        "args": sep_args,
        "args_rel": np.stack(
            [relative_args_np(sep_cmd[g], sep_args[g]) for g in range(max_num_groups)]
        ),
        "commands_grouped": grouped_cmd[None],
        "args_grouped": grouped_args[None],
        "args_rel_grouped": relative_args_np(grouped_cmd, grouped_args)[None],
        "filling": np.asarray(fill, dtype=np.int32)[:, None],
    }


# ---------------------------------------------------------------------------
# Device-side (JAX) transforms
# ---------------------------------------------------------------------------

# control1/control2/end_pos are the contiguous columns 5:11 of the args layout.
_POS_START = IndexArgs.CONTROL1.start
assert IndexArgs.END_POS.stop == N_ARGS


def _position_shift(delta_xy: jnp.ndarray) -> jnp.ndarray:
    """Broadcast an (x, y) delta ``[..., 2]`` to all 11 arg columns: zero on the
    non-position columns, repeated over control1/control2/end_pos."""
    zeros = jnp.zeros(delta_xy.shape[:-1] + (_POS_START,), delta_xy.dtype)
    return jnp.concatenate([zeros, jnp.tile(delta_xy, (1,) * (delta_xy.ndim - 1) + (3,))], axis=-1)


def _prev_real_end_pos(commands: jnp.ndarray, end_pos: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each position, the end_pos of the closest *preceding* real command.

    Returns ``(start [..., S, 2], has_prev [..., S] bool)``.
    """
    s = commands.shape[-1]
    real = commands < CMD_EOS
    idx = jnp.arange(s, dtype=jnp.int32)
    real_idx = jnp.where(real, idx, -1)
    # exclusive running max of real indices = index of previous real command
    shifted = jnp.pad(real_idx[..., :-1], [(0, 0)] * (real_idx.ndim - 1) + [(1, 0)],
                      constant_values=-1)
    prev = jax_cummax(shifted)
    has_prev = prev >= 0
    start = jnp.take_along_axis(end_pos, jnp.clip(prev, 0, None)[..., None], axis=-2)
    return start, has_prev


def jax_cummax(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative max over the last axis."""
    import jax.lax as lax

    return lax.cummax(x, axis=x.ndim - 1)


def relative_args(commands: jnp.ndarray, args: jnp.ndarray) -> jnp.ndarray:
    """Absolute -> relative encoded args (reference difflib/tensor.py:172-189).

    Real commands after the first have their control1/control2/end_pos shifted by
    the previous real command's end position; valid args are then shifted by
    ``ARGS_DIM - 1`` into ``[0, 2*ARGS_DIM-1)`` and invalid args set to PAD_VAL.

    Shapes: ``commands [..., S]`` int, ``args [..., S, 11]`` float.
    """
    mask = jnp.asarray(CMD_ARGS_MASK_NP)[commands]  # [..., S, 11]
    real = commands < CMD_EOS
    end_pos = args[..., IndexArgs.END_POS]
    start, has_prev = _prev_real_end_pos(commands, end_pos)
    delta = jnp.where((real & has_prev)[..., None], start, 0.0)
    rel = args - _position_shift(delta)
    return jnp.where(mask > 0, rel + (ARGS_DIM - 1), float(PAD_VAL))


def make_absolute(commands: jnp.ndarray, args: jnp.ndarray) -> jnp.ndarray:
    """Relative (decoded, delta-valued) -> absolute args
    (reference model/model.py:461-479 ``_make_absolute`` minus the un-shift,
    which the sampler applies before calling this).

    ``args`` position columns hold *deltas* relative to the previous real
    command's end position; the first real command is absolute. Invalid args are
    reset to PAD_VAL.
    """
    mask = jnp.asarray(CMD_ARGS_MASK_NP)[commands] > 0
    real = commands < CMD_EOS
    rel_end = jnp.where(real[..., None], args[..., IndexArgs.END_POS], 0.0)
    cum = jnp.cumsum(rel_end, axis=-2)
    prev_cum = cum - rel_end  # exclusive: sum of previous real deltas

    first_real = real & (jnp.cumsum(real.astype(jnp.int32), axis=-1) == 1)
    add = jnp.where((real & ~first_real)[..., None], prev_cum, 0.0)
    out = args + _position_shift(add)
    return jnp.where(mask, out, float(PAD_VAL))


def mask_invalid_args(commands: jnp.ndarray, args: jnp.ndarray) -> jnp.ndarray:
    """Set args not used by their command to PAD_VAL
    (reference model/model.py:450-459 ``_make_valid`` arg half)."""
    mask = jnp.asarray(CMD_ARGS_MASK_NP)[commands] > 0
    return jnp.where(mask, args, float(PAD_VAL))
