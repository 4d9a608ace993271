"""Quantitative reconstruction evaluation for trained models.

The reference's only quality check is eyeballing TensorBoard grids (its
``visualize`` hook, reference configs/deepsvg/default_icons.py:79-97 +
deepsvg/utils/train_utils.py); it ships no numeric eval. This module is
the missing "done" criterion for a training run: held-out reconstruction
metrics computed from in-repo parts —

  vis_acc    group-visibility accuracy (predicted vs ground-truth groups)
  cmd_acc    command-type accuracy over ground-truth valid positions
  args_mae   mean |pred - gt| over valid argument slots (quantized units,
             grid 0..255)
  chamfer    symmetric Chamfer distance between the union point clouds of
             the input and its greedy reconstruction (difflib sampling,
             quantized units)
  emd        reference-style EMD (difflib/loss.py svg_emd_loss, reference
             difflib/loss.py:21-51) per group, matched by group index
             (the flagship orders groups), averaged over groups visible in
             BOTH gt and prediction. Noise floor ~0.1 quantized units at
             identity (nearest-point arc-length resampling)

Everything is fixed-shape and jit-compiled; geometry uses the padded
Bézier sampler (difflib/sample.py sample_points_padded) with validity
masks, so the whole eval runs batched on the device.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .difflib.loss import svg_emd_loss
from .difflib.sample import get_length_distribution, sample_points_padded
from .difflib.utils import make_clockwise
from .models.matching import solve_assignment
from .models.sample import greedy_sample
from .svgtensor import masks as M
from .svgtensor.constants import CMD_ARGS_MASK_NP


def _masked_chamfer(x, xv, y, yv):
    """Symmetric Chamfer between masked point clouds.

    x ``[n, 2]`` with bool validity ``xv [n]``; likewise y. Invalid points
    take part in neither the min nor the outer mean. Returns a scalar
    (0 when either cloud is empty).
    """
    diff = x[:, None, :] - y[None, :, :]
    d = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-12))
    big = jnp.asarray(1e9, d.dtype)
    d_row = jnp.where(yv[None, :], d, big)   # invalid targets excluded
    d_col = jnp.where(xv[:, None], d, big)
    nx = jnp.maximum(jnp.sum(xv), 1)
    ny = jnp.maximum(jnp.sum(yv), 1)
    fwd = jnp.sum(jnp.where(xv, jnp.min(d_row, axis=1), 0.0)) / nx
    bwd = jnp.sum(jnp.where(yv, jnp.min(d_col, axis=0), 0.0)) / ny
    ok = (jnp.sum(xv) > 0) & (jnp.sum(yv) > 0)
    return jnp.where(ok, fwd + bwd, 0.0), ok


def _group_contour(commands, args, n: int, m: int):
    """Fixed-shape contour of one group: ``m`` arc-length-uniform points.

    commands ``[S]``, args ``[S, n_args]``. Samples ``n`` points per l/c
    command (reference layout: each segment keeps its first ``n-1`` points),
    forward-fills invalid slots to the previous valid point (zero-length
    segments, so they never move the arc-length parameterization), then
    resamples ``m`` uniform fractions. Returns (points ``[m, 2]``,
    n_valid_points scalar).
    """
    pts, valid = sample_points_padded(commands, args, n)   # [S, n, 2], [S]
    flat = pts[:, : n - 1, :].reshape(-1, 2)               # [S*(n-1), 2]
    vflat = jnp.repeat(valid, n - 1)
    # fill invalid slots: forward fill to the previous valid point (zero
    # length), and leading invalids to the FIRST valid point
    idx = jnp.arange(flat.shape[0])
    last = jax.lax.associative_scan(jnp.maximum, jnp.where(vflat, idx, -1))
    first = jnp.argmax(vflat)
    flat = flat[jnp.where(last >= 0, jnp.maximum(last, 0), first)]
    # canonical orientation so identical inputs score ~0 (svg_emd_loss
    # re-orients only its target, reference difflib/loss.py:23)
    flat = make_clockwise(flat)
    distr = get_length_distribution(flat, normalize=True)
    take = jnp.argmin(
        jnp.abs(jnp.linspace(0.0, 1.0, m)[:, None] - distr[None, :]), axis=-1
    )
    return flat[take], jnp.sum(vflat)


@partial(jax.jit,
         static_argnames=("points_per_cmd", "emd_points", "match_groups"))
def recon_metrics(
    gt_commands: jnp.ndarray,     # [N, G, S] int32 (SOS already dropped)
    gt_args: jnp.ndarray,         # [N, G, S, n_args] float32
    pr_commands: jnp.ndarray,     # [N, G, S] int32
    pr_args: jnp.ndarray,         # [N, G, S, n_args] float32
    points_per_cmd: int = 5,
    emd_points: int = 48,
    match_groups: bool = False,
) -> dict:
    """Batched reconstruction metrics; returns summed numerators and counts
    so batches aggregate exactly (see :func:`evaluate_batches`).

    ``match_groups=False`` pairs prediction group i with ground-truth group i
    — correct for the flagship ordered model, whose decoder is trained to
    emit groups in the canonical dataset order. ``match_groups=True`` instead
    Hungarian-matches groups by pairwise EMD (exact brute force on device for
    G <= 8, scipy callback beyond — models/matching.py solve_assignment):
    required for self-match/permutation-invariant variants, whose group
    order is arbitrary, and for ``cmd_acc``/``args_mae``/``vis_acc`` those
    token metrics are likewise computed under the matched permutation."""
    n = points_per_cmd
    vis_gt = M.visibility_mask(gt_commands)                # [N, G]
    vis_pr = M.visibility_mask(pr_commands)

    # per-group contours (shared by both EMD modes)
    contour = jax.vmap(jax.vmap(
        lambda c, a: _group_contour(c, a, n, emd_points)))
    tgt, n_t = contour(gt_commands, gt_args)               # [N, G, m, 2]
    prd, n_p = contour(pr_commands, pr_args)
    ok_t = (n_t >= 2) & vis_gt
    ok_p = (n_p >= 2) & vis_pr

    if match_groups:
        # pairwise EMD [N, G_target, G_pred] -> minimal-cost assignment
        pair = jax.vmap(jax.vmap(jax.vmap(
            svg_emd_loss, in_axes=(0, None)), in_axes=(None, 0)))(prd, tgt)
        cost = jnp.where(ok_p[:, None, :], pair, 1e6)      # bar dead preds
        assign = solve_assignment(cost, ok_t)              # [N, G]
        emd = jnp.take_along_axis(pair, assign[:, :, None], axis=2)[..., 0]
        emd_ok = ok_t & jnp.take_along_axis(ok_p, assign, axis=1)
        # re-order predictions to target order so the token metrics below
        # score the matched pairs (group order is arbitrary for self-match
        # models — index-aligned token accuracy would be meaningless)
        pr_commands = jnp.take_along_axis(
            pr_commands, assign[:, :, None], axis=1)
        pr_args = jnp.take_along_axis(
            pr_args, assign[:, :, None, None], axis=1)
        vis_pr = jnp.take_along_axis(vis_pr, assign, axis=1)
    else:
        # index-matched (flagship: the decoder emits groups in dataset order)
        emd = jax.vmap(jax.vmap(svg_emd_loss))(prd, tgt)
        emd_ok = ok_t & ok_p

    pad = M.padding_mask(gt_commands)                      # [N, G, S]
    cmd_hit = (pr_commands == gt_commands).astype(jnp.float32) * pad
    amask = (jnp.asarray(CMD_ARGS_MASK_NP)[gt_commands]
             * pad[..., None]) * (gt_args >= 0)
    mae = jnp.abs(pr_args - gt_args) * amask

    # geometry — union point cloud per sample (permutation-invariant)
    pts_g, val_g = sample_points_padded(gt_commands, gt_args, n)
    pts_p, val_p = sample_points_padded(pr_commands, pr_args, n)
    N = gt_commands.shape[0]
    flat = lambda p, v: (p.reshape(N, -1, 2),
                         jnp.repeat(v.reshape(N, -1), n, axis=-1))
    xg, vg = flat(pts_g, val_g)
    xp, vp = flat(pts_p, val_p)
    chamfer, cham_ok = jax.vmap(_masked_chamfer)(xg, vg, xp, vp)

    return {
        "vis_hit": jnp.sum(vis_gt == vis_pr).astype(jnp.float32),
        "vis_cnt": jnp.asarray(float(vis_gt.size)),
        "cmd_hit": jnp.sum(cmd_hit),
        "cmd_cnt": jnp.sum(pad),
        "mae_sum": jnp.sum(mae),
        "mae_cnt": jnp.sum(amask),
        "chamfer_sum": jnp.sum(jnp.where(cham_ok, chamfer, 0.0)),
        "chamfer_cnt": jnp.sum(cham_ok).astype(jnp.float32),
        "emd_sum": jnp.sum(jnp.where(emd_ok, emd, 0.0)),
        "emd_cnt": jnp.sum(emd_ok).astype(jnp.float32),
    }


def _ratios(acc: dict) -> dict:
    den = lambda k: max(float(acc[k]), 1e-9)
    return {
        "vis_acc": float(acc["vis_hit"]) / den("vis_cnt"),
        "cmd_acc": float(acc["cmd_hit"]) / den("cmd_cnt"),
        "args_mae": float(acc["mae_sum"]) / den("mae_cnt"),
        "chamfer": float(acc["chamfer_sum"]) / den("chamfer_cnt"),
        "emd": float(acc["emd_sum"]) / den("emd_cnt"),
        "n_groups_emd": float(acc["emd_cnt"]),
    }


def reconstruct(model, variables, commands, args, label=None):
    """Encode + greedy decode one batch; returns (commands, args) aligned to
    the ground truth's post-SOS layout ``[N, G, S+1]``.

    VAE variants (fonts) encode to the posterior MEAN (``sample_vae=False``)
    so the metric is deterministic — the reference always samples
    (model/model.py:182-186) but ships no numeric eval to be deterministic
    for."""
    z = model.apply(variables, commands, args, None, None, label=label,
                    encode_mode=True, deterministic=True, sample_vae=False)
    if z.dtype != jnp.float32:
        z = z.astype(jnp.float32)
    return greedy_sample(model, variables, z=z, label=label)


def evaluate_batches(model, variables, batches, *, points_per_cmd: int = 5,
                     emd_points: int = 48, match_groups: bool = False,
                     verbose: bool = False) -> dict:
    """Run reconstruction metrics over an iterable of batches.

    Each batch is a dict with ``commands [N, G, S+2]`` (SOS+content+EOS),
    ``args``, optional ``label``. Returns the aggregated metric dict plus
    ``n_samples``. ``match_groups=True`` for permutation-invariant
    (self-match) models — see :func:`recon_metrics`.
    """
    acc: dict = {}
    n_samples = 0
    for batch in batches:
        gt_c = jnp.asarray(batch["commands"], jnp.int32)
        gt_a = jnp.asarray(batch["args"], jnp.float32)
        label = (jnp.asarray(batch["label"], jnp.int32)
                 if "label" in batch else None)
        pr_c, pr_a = reconstruct(model, variables, gt_c, gt_a, label=label)
        # align: drop the gt SOS column -> [N, G, S+1]
        m = recon_metrics(gt_c[..., 1:], gt_a[..., 1:, :],
                          pr_c.astype(jnp.int32), pr_a.astype(jnp.float32),
                          points_per_cmd=points_per_cmd,
                          emd_points=emd_points, match_groups=match_groups)
        m = {k: float(v) for k, v in m.items()}
        acc = {k: acc.get(k, 0.0) + v for k, v in m.items()}
        n_samples += int(gt_c.shape[0])
        if verbose:
            print(f"  evaluated {n_samples} samples", flush=True)
    out = _ratios(acc)
    out["n_samples"] = n_samples
    return out
