"""Hungarian (self-match) assignment of predicted groups to target groups.

Reference: model/model.py:311-350 ``perfect_matching``. The cost matrix there
is built with a chain of ``repeat``s and per-sample Python loops; here it is a
single broadcasted computation ``[N, G, P]`` on device. The assignment itself
is combinatorial: we solve it with scipy's Jonker-Volgenant solver through
``jax.pure_callback`` — the same solver the reference uses, but called once per
step on the whole batch instead of per sample inside the hot loop. (The cost
matrix stays on device; only the tiny [N, G, P] costs cross to the host.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..svgtensor import CMD_ARGS_MASK_NP
from ..svgtensor import masks as M
from .config import ModelConfig


def matching_cost(
    cmd_logits: jnp.ndarray,       # [N, P, S, n_commands]
    args_logits: jnp.ndarray,      # [N, P, S, n_args, args_dim] (or None)
    vis_logits: jnp.ndarray,       # [N, P, 2]
    tgt_commands: jnp.ndarray,     # [N, G, S+1] (with SOS)
    tgt_args: jnp.ndarray,         # [N, G, S+1, n_args]
    cfg: ModelConfig,
    args_ce_pair: jnp.ndarray | None = None,  # [N, G, P, S, n_args]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise (target group g, proposal p) loss matrix.

    cost = 2*args CE + 1*cmd CE + 1*visibility CE (model/model.py:322-335).
    Returns ``(cost [N, G, P], visibility [N, G])``.

    ``args_ce_pair`` supplies the pairwise argument CE precomputed by the
    fused kernel (ops/ce.py ``args_ce_pairwise``) so the ``[N, P, S, n_args,
    args_dim]`` logits never exist; otherwise it is derived from
    ``args_logits`` by broadcasting (the reference's formulation).
    """
    vis = M.visibility_mask(tgt_commands)                       # [N, G]
    pad = M.padding_mask(tgt_commands, extended=True) * vis[..., None].astype(jnp.float32)

    tgt_c = tgt_commands[..., 1:]                               # [N, G, S]
    tgt_a = tgt_args[..., 1:, :]
    pad = pad[..., 1:]

    # broadcast targets over proposals: [N, G, 1, ...] vs logits [N, 1, P, ...]
    ce_cmd = optax.softmax_cross_entropy_with_integer_labels(
        cmd_logits[:, None].astype(jnp.float32), tgt_c[:, :, None].astype(jnp.int32)
    )                                                            # [N, G, P, S]
    if args_ce_pair is not None:
        ce_args = args_ce_pair
    else:
        ce_args = optax.softmax_cross_entropy_with_integer_labels(
            args_logits[:, None].astype(jnp.float32),
            (tgt_a[:, :, None] + 1).astype(jnp.int32),
        )                                                        # [N, G, P, S, n_args]
    ce_vis = optax.softmax_cross_entropy_with_integer_labels(
        vis_logits[:, None].astype(jnp.float32),
        jnp.broadcast_to(
            vis[:, :, None], vis.shape + (vis_logits.shape[1],)
        ).astype(jnp.int32),
    )                                                            # [N, G, P]

    args_mask = jnp.asarray(CMD_ARGS_MASK_NP)[tgt_c][:, :, None]  # [N, G, 1, S, n_args]
    denom_a = jnp.maximum(jnp.sum(args_mask, axis=(-1, -2)), 1.0)
    loss_args = jnp.sum(ce_args * args_mask, axis=(-1, -2)) / denom_a

    padb = pad[:, :, None]                                       # [N, G, 1, S]
    denom_c = jnp.maximum(jnp.sum(padb, axis=-1), 1.0)
    loss_cmd = jnp.sum(ce_cmd * padb, axis=-1) / denom_c

    cost = 2.0 * loss_args + 1.0 * loss_cmd + 1.0 * ce_vis       # [N, G, P]
    return cost, vis


def _assign_host(costs: np.ndarray, vis: np.ndarray) -> np.ndarray:
    """Batch assignment on host (reference model/model.py:337-348): Hungarian
    over visible target rows, remaining proposals appended in index order."""
    from scipy.optimize import linear_sum_assignment

    n, _, p = costs.shape
    out = np.zeros((n, p), dtype=np.int32)
    full = set(range(p))
    for i in range(n):
        v = vis[i].astype(bool)
        _, assign = linear_sum_assignment(costs[i][v])
        assign = assign.tolist()
        out[i] = np.asarray(assign + sorted(full - set(assign)), dtype=np.int32)
    return out


_PERM_CACHE: dict = {}


def _permutations(p: int) -> np.ndarray:
    """All permutations of range(p) in lexicographic order, cached."""
    if p not in _PERM_CACHE:
        import itertools

        _PERM_CACHE[p] = np.array(list(itertools.permutations(range(p))), np.int32)
    return _PERM_CACHE[p]


def assign_bruteforce(cost: jnp.ndarray, vis: jnp.ndarray) -> jnp.ndarray:
    """Exact on-device assignment for small P (<= 8): evaluate every
    permutation at once on the VPU and take the lexicographically-first
    optimum.

    Invisible target rows get zero cost, so their columns are free; because
    the dataset packs visible groups as a prefix and ``jnp.argmin`` returns
    the first (lex-smallest) optimum, the trailing rows receive the remaining
    proposals in ascending order — exactly the reference's
    ``assign + sorted(remaining)`` construction (model/model.py:340-346).
    """
    n, g, p = cost.shape
    perms = jnp.asarray(_permutations(p))                    # [K, P] lex order
    c = jnp.where(vis[:, :, None], cost, 0.0)                # [N, G, P]
    picked = jnp.take_along_axis(
        c[:, None, :, :],                                    # [N, 1, G, P]
        perms[None, :, :, None],                             # [1, K, G, 1]
        axis=3,
    )[..., 0]                                                # [N, K, G]
    totals = jnp.sum(picked, axis=-1)                        # [N, K]
    best = jnp.argmin(totals, axis=-1)                       # first optimum
    return perms[best]                                       # [N, P]


def perfect_matching(
    cmd_logits, args_logits, vis_logits, tgt_commands, tgt_args, cfg: ModelConfig
) -> jnp.ndarray:
    """Assignment permutation ``[N, P]``: entry i = proposal index matched to
    the i-th (ordered) target group. No gradients flow through this.

    P <= 8 (the reference's configs): exact on-device brute force — no host
    sync in the train step. Larger P falls back to the scipy JV solver via
    host callback (the reference's own solver)."""
    cost, vis = matching_cost(
        jax.lax.stop_gradient(cmd_logits),
        jax.lax.stop_gradient(args_logits),
        jax.lax.stop_gradient(vis_logits),
        tgt_commands, tgt_args, cfg,
    )
    return solve_assignment(cost, vis)


def solve_assignment(cost: jnp.ndarray, vis: jnp.ndarray) -> jnp.ndarray:
    """Assignment from a ``[N, G, P]`` cost matrix: exact on-device brute
    force for P <= 8, scipy JV host callback beyond."""
    n, _, p = cost.shape
    if p <= 8:
        return assign_bruteforce(cost, vis)
    return jax.pure_callback(
        _assign_host,
        jax.ShapeDtypeStruct((n, p), jnp.int32),
        cost, vis,
        vmap_method="sequential",
    )


def fused_perfect_matching(
    states: jnp.ndarray,           # [N, P, S, D] decoder output states
    wa: jnp.ndarray,               # [D, n_args * args_dim] argument-head kernel
    ba: jnp.ndarray,               # [n_args * args_dim]
    cmd_logits: jnp.ndarray,       # [N, P, S, n_commands]
    vis_logits: jnp.ndarray,       # [N, P, 2]
    tgt_commands: jnp.ndarray,     # [N, G, S+1] (with SOS)
    tgt_args: jnp.ndarray,         # [N, G, S+1, n_args]
    cfg: ModelConfig,
) -> jnp.ndarray:
    """``perfect_matching`` without the argument logits: the pairwise args CE
    comes from the fused kernel (ops/ce.py ``args_ce_pairwise``) straight off
    the decoder states, so the ``[N, P, S, n_args, args_dim]`` tensor — the
    self-match variant's memory wall (reference model/model.py:322-335) —
    never exists. No gradients flow (matching is under no_grad in the
    reference, model/model.py:321)."""
    from ..ops.ce import args_ce_pairwise

    n, p, s, _ = states.shape
    g = tgt_commands.shape[1]
    n_args = tgt_args.shape[-1]

    tgt_a = tgt_args[..., 1:, :]                                 # [N, G, S]
    # candidate targets per (sample, proposal, position): every target group's
    # labels at that position, variant(=g)-major — [N, P, S, G*n_args]
    t = jnp.moveaxis((tgt_a + 1).astype(jnp.int32), 1, 2)        # [N, S, G, n_args]
    t = jnp.broadcast_to(t[:, None], (n, p) + t.shape[1:])
    ce = args_ce_pairwise(
        jax.lax.stop_gradient(states), jax.lax.stop_gradient(wa),
        jax.lax.stop_gradient(ba), t.reshape(n, p, s, g * n_args), g,
    )                                                            # [N, P, S, G*n_args]
    ce_pair = jnp.transpose(
        ce.reshape(n, p, s, g, n_args), (0, 3, 1, 2, 4)
    )                                                            # [N, G, P, S, n_args]

    cost, vis = matching_cost(
        jax.lax.stop_gradient(cmd_logits), None,
        jax.lax.stop_gradient(vis_logits),
        tgt_commands, tgt_args, cfg, args_ce_pair=ce_pair,
    )
    return solve_assignment(cost, vis)


def apply_assignment(assignment: jnp.ndarray, *logits: jnp.ndarray):
    """Reorder the proposal axis (axis=1) of each logits tensor by the
    assignment permutation (model/model.py:390-392)."""
    out = []
    for x in logits:
        idx = assignment.reshape(assignment.shape + (1,) * (x.ndim - 2))
        out.append(jnp.take_along_axis(x, idx, axis=1))
    return tuple(out)
