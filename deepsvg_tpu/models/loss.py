"""Training loss (reference: deepsvg/model/loss.py:9-65) — pure JAX.

The reference computes cross-entropies over boolean-indexed selections
(dynamic shapes); here the same quantities are masked means over fixed-shape
arrays, so the whole loss jits and fuses with the model forward/backward.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..svgtensor import CMD_ARGS_MASK_NP
from ..svgtensor import masks as M
from .config import ModelConfig


def svg_loss(output: dict, weights: dict, cfg: ModelConfig,
             axis_name: Optional[str] = None) -> dict:
    """Weighted sum of KL + visibility CE + command CE + args CE.

    Args:
        output: dict from ``SVGTransformer.__call__`` with ``return_tgt=True``.
        weights: per-step loss weights (reference keys): ``kl_tolerance``,
            ``loss_kl_weight``, ``loss_visibility_weight``, ``loss_cmd_weight``,
            ``loss_args_weight``.
        cfg: model config.
        axis_name: when set (inside ``shard_map`` over a data-parallel axis),
            the masked means reduce GLOBALLY — numerators and denominators are
            ``psum``'d over the axis, so the loss (and its gradients, after a
            grads ``psum``) exactly equal the single-device computation over
            the full batch regardless of how valid tokens split across shards.

    Returns:
        dict with ``loss`` and each component (reference loss.py:19-65).
    """
    psum = (lambda x: jax.lax.psum(x, axis_name)) if axis_name else (lambda x: x)
    pmean = (lambda x: jax.lax.pmean(x, axis_name)) if axis_name else (lambda x: x)
    res = {}
    loss = 0.0

    if cfg.use_vae:
        mu, logsigma = output["mu"], output["logsigma"]
        loss_kl = -0.5 * pmean(jnp.mean(1 + logsigma - mu**2 - jnp.exp(logsigma)))
        loss_kl = jnp.clip(loss_kl, min=weights["kl_tolerance"])
        loss += weights["loss_kl_weight"] * loss_kl
        res["loss_kl"] = loss_kl

    tgt_commands, tgt_args = output["tgt_commands"], output["tgt_args"]

    vis = M.visibility_mask(tgt_commands)                         # [N, G]
    pad = M.padding_mask(tgt_commands, extended=True) * vis[..., None].astype(jnp.float32)

    cmd_logits = output["command_logits"]
    args_logits = output.get("args_logits")

    if cfg.decode_stages == 2:
        vis_logits = output["visibility_logits"]                  # [N, P, 2]
        loss_visibility = pmean(jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                vis_logits.reshape(-1, 2).astype(jnp.float32),
                vis.reshape(-1).astype(jnp.int32),
            )
        ))
        loss += weights["loss_visibility_weight"] * loss_visibility
        res["loss_visibility"] = loss_visibility

    # drop the SOS position from targets/mask (logits already predict pos 1..S)
    tgt_c = tgt_commands[..., 1:]
    tgt_a = tgt_args[..., 1:, :]
    pad = pad[..., 1:]

    args_mask = jnp.asarray(CMD_ARGS_MASK_NP)[tgt_c]              # [N, G, S, n_args]

    ce_cmd = optax.softmax_cross_entropy_with_integer_labels(
        cmd_logits.astype(jnp.float32), tgt_c.astype(jnp.int32)
    )
    loss_cmd = psum(jnp.sum(ce_cmd * pad)) / jnp.maximum(psum(jnp.sum(pad)), 1.0)

    if "args_ce" in output:
        # fused softmax-CE head (ops/ce.py): the model already computed the
        # per-token-per-slot CE against (tgt_args + 1) without materializing
        # the argument logits
        ce_args = output["args_ce"]
    else:
        ce_args = optax.softmax_cross_entropy_with_integer_labels(
            args_logits.astype(jnp.float32),
            (tgt_a + 1).astype(jnp.int32),  # +1: PAD_VAL -1 -> class 0
        )
    loss_args = psum(jnp.sum(ce_args * args_mask)) / jnp.maximum(
        psum(jnp.sum(args_mask)), 1.0
    )

    loss += weights["loss_cmd_weight"] * loss_cmd + weights["loss_args_weight"] * loss_args

    res.update({"loss": loss, "loss_cmd": loss_cmd, "loss_args": loss_args})
    return res
