"""Differentiable point sampling of SVG tensors — pure JAX, batched.

The reference (difflib/tensor.py:191-249) samples points per-SVGTensor with
boolean gathers (dynamic shapes). Here the core is fixed-shape and vmappable:
every command slot yields ``n`` points plus a validity flag, so the whole
computation jits onto the VPU/MXU; ragged reference-layout outputs are provided
as thin eager wrappers for the notebook-style API.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..svgtensor.constants import CMD_C, CMD_L, IndexArgs, N_COMMANDS

# Monomial-basis coefficient matrices per command (difflib/tensor.py:197-218).
# coeffs = Q[cmd] @ [start, control1, control2, end]  (4 control rows, 2 cols)
_Q_NP = np.zeros((N_COMMANDS, 4, 4), dtype=np.float32)
_Q_NP[CMD_L] = np.array(
    [[1.0, 0, 0, 0], [-1.0, 0, 0, 1.0], [0, 0, 0, 0], [0, 0, 0, 0]], np.float32
)
_Q_NP[CMD_C] = np.array(
    [[1.0, 0, 0, 0], [-3.0, 3.0, 0, 0], [3.0, -6.0, 3.0, 0], [-1.0, 3.0, -3.0, 1.0]],
    np.float32,
)


def command_positions(commands: jnp.ndarray, args: jnp.ndarray) -> jnp.ndarray:
    """Build the ``[..., S, 4, 2]`` control-point tensor (start, c1, c2, end).

    Start positions chain from the previous command's end position
    (difflib/tensor.py:75-82); the first start is (0, 0).
    """
    end_pos = args[..., IndexArgs.END_POS]
    start_pos = jnp.concatenate(
        [jnp.zeros(end_pos.shape[:-2] + (1, 2), end_pos.dtype), end_pos[..., :-1, :]],
        axis=-2,
    )
    c1 = args[..., IndexArgs.CONTROL1]
    c2 = args[..., IndexArgs.CONTROL2]
    del commands
    return jnp.stack([start_pos, c1, c2, end_pos], axis=-2)


def sample_points_padded(
    commands: jnp.ndarray, args: jnp.ndarray, n: int = 10
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``n`` points per command slot, fixed-shape.

    Only line (``l``) and cubic (``c``) commands produce valid samples
    (reference behavior; arcs are pre-lowered to cubics by the SVG library).

    Returns:
        points: ``[..., S, n, 2]`` — Bézier curve samples at uniform parameter t.
        valid:  ``[..., S]`` bool — True where the command contributes points.
    """
    pos = command_positions(commands, args)  # [..., S, 4, 2]
    t = jnp.linspace(0.0, 1.0, n)
    z = jnp.stack([jnp.ones_like(t), t, t**2, t**3], axis=1)  # [n, 4]
    q = jnp.asarray(_Q_NP)[commands]  # [..., S, 4, 4]
    coeffs = q @ pos  # [..., S, 4, 2]
    points = jnp.einsum("nk,...kd->...nd", z, coeffs)  # [..., S, n, 2]
    valid = (commands == CMD_L) | (commands == CMD_C)
    return points, valid


def sample_points(commands: jnp.ndarray, args: jnp.ndarray, n: int = 10) -> jnp.ndarray:
    """Reference-layout ragged sampling (difflib/tensor.py:191-230): keep l/c
    commands, drop each segment's last point except the final one.

    Output shape ``[K*(n-1)+1, 2]`` with K = number of l/c commands — dynamic,
    so this is an **eager** convenience API (use ``sample_points_padded`` under
    jit).
    """
    points, valid = sample_points_padded(commands, args, n)
    points = points[np.asarray(valid)]  # [K, n, 2]
    if points.shape[0] == 0:
        return jnp.zeros((0, 2), args.dtype)
    return jnp.concatenate(
        [points[:, :-1].reshape(-1, 2), points[-1, -1][None]], axis=0
    )


def get_length_distribution(p: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Cumulative arc-length of a polyline ``[..., n, 2] -> [..., n]``
    (difflib/utils.py:72-81)."""
    seg = jnp.linalg.norm(p[..., 1:, :] - p[..., :-1, :], axis=-1)
    distr = jnp.cumsum(seg, axis=-1)
    distr = jnp.concatenate(
        [jnp.zeros(distr.shape[:-1] + (1,), distr.dtype), distr], axis=-1
    )
    if normalize:
        distr = distr / jnp.maximum(distr[..., -1:], 1e-12)
    return distr


def sample_uniform_points(commands: jnp.ndarray, args: jnp.ndarray, n: int = 100) -> jnp.ndarray:
    """Arc-length-uniform resampling (difflib/tensor.py:241-249). Eager API."""
    p = sample_points(commands, args, n=n)
    return resample_uniform(p, n)


def resample_uniform(p: jnp.ndarray, n: int) -> jnp.ndarray:
    """Pick, for each of ``n`` uniform arc-length fractions, the nearest
    existing sample. Fixed-shape given fixed input length — jit-friendly."""
    distr_unif = jnp.linspace(0.0, 1.0, n)
    distr = get_length_distribution(p, normalize=True)
    d = jnp.abs(distr_unif[:, None] - distr[None, :])
    matching = jnp.argmin(d, axis=-1)
    return p[matching]
