"""Point-set helpers — pure JAX (reference: difflib/utils.py:52-81).

All functions are fixed-shape and differentiable; ``make_clockwise`` uses a
``jnp.where`` select instead of Python branching so it jits.
"""
from __future__ import annotations

import jax.numpy as jnp


def is_clockwise(p: jnp.ndarray) -> jnp.ndarray:
    """Signed-area orientation test over consecutive point pairs.

    ``sum_i det([p_i, p_{i+1}]) > 0`` (difflib/utils.py:52-54). Note the SVG
    y-axis points down, so "clockwise" here is the screen-space convention.
    """
    start, end = p[..., :-1, :], p[..., 1:, :]
    det = start[..., 0] * end[..., 1] - start[..., 1] * end[..., 0]
    return jnp.sum(det, axis=-1) > 0


def make_clockwise(p: jnp.ndarray) -> jnp.ndarray:
    """Flip the point order if not clockwise (difflib/utils.py:57-60)."""
    cw = is_clockwise(p)
    return jnp.where(cw[..., None, None], p, jnp.flip(p, axis=-2))


def reorder(p: jnp.ndarray, i) -> jnp.ndarray:
    """Cyclic shift: ``[p_i, ..., p_{n-1}, p_0, ..., p_{i-1}]``.

    Works with traced ``i`` (uses roll), matching difflib/utils.py:63-64.
    """
    return jnp.roll(p, -i, axis=-2)


def get_length(p: jnp.ndarray) -> jnp.ndarray:
    """Total polyline length ``[..., n, 2] -> [...]`` (difflib/utils.py:67-69)."""
    return jnp.sum(jnp.linalg.norm(p[..., 1:, :] - p[..., :-1, :], axis=-1), axis=-1)
