"""Differentiable geometry losses — pure JAX, jit/vmap-friendly.

Reference: difflib/loss.py. The reference EMD loss runs a Python loop over all
cyclic shifts (loss.py:39); here every shift is evaluated at once as one batched
gather + norm, which vectorizes onto the TPU VPU and is O(n^2) flops in a single
fused computation instead of n sequential kernel launches.
"""
from __future__ import annotations

import jax.numpy as jnp

from .sample import get_length_distribution
from .utils import get_length, make_clockwise


def cdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Euclidean distances ``[..., n, d] x [..., m, d] -> [..., n, m]``."""
    diff = x[..., :, None, :] - y[..., None, :, :]
    return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-12))


def chamfer_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Symmetric Chamfer distance (difflib/loss.py:5-7)."""
    d = cdist(x, y)
    return jnp.mean(jnp.min(d, axis=-2), axis=-1) + jnp.mean(jnp.min(d, axis=-1), axis=-1)


def continuity_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Mean consecutive-point distance (difflib/loss.py:10-12)."""
    return jnp.mean(jnp.linalg.norm(x[..., 1:, :] - x[..., :-1, :], axis=-1), axis=-1)


def svg_length_loss(p_pred: jnp.ndarray, p_target: jnp.ndarray) -> jnp.ndarray:
    """Relative length error (difflib/loss.py:15-18)."""
    pred_len, tgt_len = get_length(p_pred), get_length(p_target)
    return jnp.abs(tgt_len - pred_len) / jnp.maximum(tgt_len, 1e-12)


def svg_emd_loss(
    p_pred: jnp.ndarray,
    p_target: jnp.ndarray,
    first_point_weight: bool = False,
    return_matching: bool = False,
):
    """Earth-mover-style loss between closed contours (difflib/loss.py:21-51).

    Steps (matching the reference exactly):
      1. orient target clockwise,
      2. resample the target at the pred's uniform arc-length fractions,
      3. find the cyclic shift of the target that minimizes mean pointwise
         distance — evaluated for all ``n`` shifts in one batched computation,
      4. mean pointwise distance under that shift.

    Shapes: ``p_pred [n, 2]``, ``p_target [m, 2]``; fully jit-able for static
    n, m. Use ``jax.vmap`` for batches.
    """
    n = p_pred.shape[-2]
    p_target = make_clockwise(p_target)

    distr_pred = jnp.linspace(0.0, 1.0, n)
    distr_target = get_length_distribution(p_target, normalize=True)
    d = jnp.abs(distr_pred[:, None] - distr_target[None, :])
    matching = jnp.argmin(d, axis=-1)
    p_target_sub = p_target[matching]  # [n, 2]

    # All cyclic shifts at once: shifted[i, j] = p_target_sub[(i + j) % n]
    idx = (jnp.arange(n)[:, None] + jnp.arange(n)[None, :]) % n
    shifted = p_target_sub[idx]  # [shift, point, 2]
    dists = jnp.linalg.norm(p_pred[None, :, :] - shifted, axis=-1)  # [shift, point]
    best = jnp.argmin(jnp.mean(dists, axis=-1))

    losses = dists[best]
    if first_point_weight:
        weights = jnp.ones_like(losses).at[0].set(10.0)
        losses = losses * weights

    if return_matching:
        return jnp.mean(losses), (p_pred, p_target, jnp.roll(matching, -best, axis=0))
    return jnp.mean(losses)
