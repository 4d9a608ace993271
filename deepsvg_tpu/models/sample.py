"""Greedy / temperature sampling from a trained SVGTransformer.

Reference: model/model.py:414-479 (``greedy_sample``, ``_make_valid``,
``_make_absolute``) and model/utils.py:75-84 (categorical / threshold
sampling).

One-shot sampling is a single jitted forward + categorical draw. The
autoregressive path is a ``lax.scan`` over a fixed-length token buffer —
fully compiled, no Python loop (the reference re-runs a Python forward per
token, model.py:430-436).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..svgtensor import CMD_ARGS_MASK_NP, CMD_EOS, CMD_M, CMD_SOS, PAD_VAL
from ..svgtensor import masks as M
from ..svgtensor.tensor import make_absolute
from .config import ModelConfig
from .model import SVGTransformer


def sample_categorical(key: Optional[jax.Array], logits: jnp.ndarray,
                       temperature: float = 0.0001) -> jnp.ndarray:
    """Temperature sampling; argmax when no key is given (T -> 0 limit)."""
    if key is None:
        return jnp.argmax(logits, axis=-1)
    return jax.random.categorical(key, logits / temperature, axis=-1)


def threshold_sample(logits: jnp.ndarray, threshold: float = 0.5,
                     temperature: float = 1.0) -> jnp.ndarray:
    """P(class 1) > threshold (model/utils.py:82-84)."""
    scores = jax.nn.softmax(logits / temperature, axis=-1)[..., 1]
    return scores > threshold


def make_valid(commands: jnp.ndarray, args: jnp.ndarray,
               visibility: Optional[jnp.ndarray] = None):
    """Zero out invalid args; replace invisible groups by an empty path
    (model/model.py:450-459)."""
    if visibility is not None:
        s = commands.shape[-1]
        empty = jnp.concatenate(
            [jnp.full((1,), CMD_M, commands.dtype),
             jnp.full((s - 1,), CMD_EOS, commands.dtype)]
        )
        commands = jnp.where(visibility[..., None], commands, empty)
        args = jnp.where(visibility[..., None, None], args, float(PAD_VAL))
    mask = jnp.asarray(CMD_ARGS_MASK_NP)[commands] > 0
    args = jnp.where(mask, args, float(PAD_VAL))
    return commands, args


def _finalize_args(cfg: ModelConfig, commands, args):
    """Undo the relative encoding if needed (model/model.py:440-441)."""
    if cfg.rel_targets:
        mask = jnp.asarray(CMD_ARGS_MASK_NP)[commands] > 0
        deltas = jnp.where(mask, args - (cfg.args_dim - 1), args)
        args = make_absolute(commands, deltas)
    return commands, args


def one_shot_sample(
    model: SVGTransformer,
    variables,
    z: Optional[jnp.ndarray] = None,
    commands_enc: Optional[jnp.ndarray] = None,
    args_enc: Optional[jnp.ndarray] = None,
    label: Optional[jnp.ndarray] = None,
    temperature: float = 0.0001,
    key: Optional[jax.Array] = None,
    visibility_threshold: float = 0.7,
    rngs: Optional[dict] = None,
):
    """One-shot greedy decode (model/model.py:417-422).

    Returns ``(commands [N, G, S+1], args [N, G, S+1, n_args])`` — padded;
    flatten with :func:`flatten_groups_np` for the ragged reference layout.
    """
    cfg = model.cfg
    if cfg.use_vae and (rngs is None or "vae" not in rngs):
        # deterministic-eval convention (matches trainer.eval_step): the VAE
        # still samples, with a fixed key
        rngs = {**(rngs or {}), "vae": jax.random.key(0)}
    # greedy (T -> 0) with the Pallas backend: fused head+argmax kernel — the
    # full argument-logits tensor is never materialized
    use_argmax_head = key is None and cfg.attention_impl == "pallas"
    res = model.apply(
        variables, commands_enc, args_enc, None, None, label=label, z=z,
        return_tgt=False, deterministic=True, rngs=rngs,
        argmax_head=use_argmax_head,
    )
    if use_argmax_head:
        commands_y = res["command_ids"]
        args_y = res["args_ids"] - 1  # PAD shift
    else:
        kc, ka = (None, None) if key is None else jax.random.split(key)
        commands_y = sample_categorical(kc, res["command_logits"], temperature)
        args_y = sample_categorical(ka, res["args_logits"], temperature) - 1
    visibility_y = (
        threshold_sample(res["visibility_logits"], visibility_threshold)
        if cfg.decode_stages == 2 else None
    )
    commands_y, args_y = make_valid(commands_y, args_y.astype(jnp.float32), visibility_y)
    return _finalize_args(cfg, commands_y, args_y)


def autoregressive_sample_cached(
    model: SVGTransformer,
    variables,
    z: jnp.ndarray,
    label: Optional[jnp.ndarray] = None,
    temperature: float = 0.0001,
    key: Optional[jax.Array] = None,
):
    """KV-cached autoregressive greedy decode: a jitted ``lax.scan`` where
    each step embeds ONE token and attends over the per-layer key/value cache
    — O(L) total attention work per position instead of the reference's full
    re-forward per token (model.py:430-436).

    Key-padding parity: positions at/after the first generated EOS are masked
    out of the cache exactly as the reference masks its growing prefix.
    Returns ``(commands [N, 1, L], args [N, 1, L, n_args])`` without SOS.
    """
    cfg = model.cfg
    n = z.shape[0]
    length = cfg.max_total_len + 1
    params = variables["params"]

    buf_cmds = jnp.full((n, 1, length), CMD_EOS, jnp.int32).at[..., 0].set(CMD_SOS)
    buf_args = jnp.full((n, 1, length, cfg.n_args), float(PAD_VAL), jnp.float32)
    key_pad = jnp.zeros((n, 1, length), jnp.float32)
    eos_seen = jnp.zeros((n, 1), bool)
    gcount = jnp.zeros((n, 1), jnp.int32)

    def one_step(cache, cmds, args, kp, gcount, eos_seen, i, k):
        cmd_t = jax.lax.dynamic_slice_in_dim(cmds, i, 1, axis=2)       # [N,1,1]
        args_t = jax.lax.dynamic_slice_in_dim(args, i, 1, axis=2)      # [N,1,1,A]
        gcount = gcount + (cmd_t[..., 0] == CMD_M).astype(jnp.int32)
        mvars = {"params": params}
        if cache is not None:
            mvars["cache"] = cache
        (cmd_logits, args_logits, _), updated = model.apply(
            mvars, z, cmd_t, args_t, gcount[..., None], i, kp, label,
            method=SVGTransformer.decode_step, mutable=["cache"],
        )
        if k is None:
            kc = ka = knext = None
        else:
            k, kc, ka = jax.random.split(k, 3)
            knext = k
        cmd_new = sample_categorical(kc, cmd_logits[:, :, 0], temperature)
        args_new = sample_categorical(ka, args_logits[:, :, 0], temperature) - 1
        _, args_new = make_valid(cmd_new, args_new.astype(jnp.float32))
        eos_seen = eos_seen | (cmd_new == CMD_EOS)
        kp = jax.lax.dynamic_update_index_in_dim(
            kp, jnp.where(eos_seen, -jnp.inf, 0.0), i + 1, axis=2
        )
        cmds = jax.lax.dynamic_update_index_in_dim(cmds, cmd_new, i + 1, axis=2)
        args = jax.lax.dynamic_update_index_in_dim(args, args_new, i + 1, axis=2)
        return updated["cache"], cmds, args, kp, gcount, eos_seen, knext

    # step 0 outside the scan creates the cache collection
    cache, buf_cmds, buf_args, key_pad, gcount, eos_seen, key = one_step(
        None, buf_cmds, buf_args, key_pad, gcount, eos_seen, 0, key
    )

    def step(carry, i):
        cache, cmds, args, kp, gcount, eos_seen, k = carry
        return one_step(cache, cmds, args, kp, gcount, eos_seen, i, k), None

    (cache, buf_cmds, buf_args, *_), _ = jax.lax.scan(
        step, (cache, buf_cmds, buf_args, key_pad, gcount, eos_seen, key),
        jnp.arange(1, cfg.max_total_len),
    )

    commands_y = buf_cmds[..., 1:]
    args_y = buf_args[..., 1:, :]
    return _finalize_args(cfg, commands_y, args_y)


def _pick_tile_r(n: int, cap: int = 8) -> int:
    t, best = 1, 1
    while t <= cap:
        if n % t == 0:
            best = t
        t *= 2
    return best


def autoregressive_sample_fused(
    model: SVGTransformer,
    variables,
    z: jnp.ndarray,
    label: Optional[jnp.ndarray] = None,
    temperature: float = 0.0001,
    key: Optional[jax.Array] = None,
):
    """Fused autoregressive greedy decode: the ENTIRE decoder stack for each
    token — all layers' LN1/cached-attention/latent-injection/LN2/FF plus the
    final LayerNorm — runs as ONE Pallas kernel per step (ops/decode.py),
    with greedy heads through the fused head+argmax kernel. Operates directly
    on the parameter tree (one-stage transformer decoders,
    cfg.decode_stages == 1). Bit-compatible with
    :func:`autoregressive_sample_cached` (tested).

    MEASURED NEGATIVE RESULT (kept for evidence, not dispatched by default):
    10x slower than the einsum cached scan on a v5e chip — decode is
    bandwidth-bound on the K/V cache reads, which XLA's einsum lowering
    already streams at full rate, while this kernel's per-head [tile, T, 32]
    operands waste 3/4 of each VPU lane. See docs/PERFORMANCE.md.
    """
    cfg = model.cfg
    assert cfg.decode_stages == 1 and cfg.model_type == "transformer"
    from ..ops.decode import fused_decode_step
    from ..ops.head import fused_head_argmax

    dtype = jnp.dtype(cfg.compute_dtype)
    params = variables["params"]["decoder"]
    dec, emb, fcn = params["decoder"], params["embedding"], params["fcn"]
    L = cfg.n_layers_decode
    n = z.shape[0]
    length = cfg.max_total_len + 1
    tile_r = _pick_tile_r(n)

    layers = [dec[f"layer_{i}"] for i in range(L)]
    st = lambda k: jnp.stack([l[k] for l in layers]).astype(dtype)
    ln1s, wqkvs, wos, ln2s = st("norm1"), st("wqkv"), st("wo"), st("norm2")
    w1s, w2s = st("ff1_kernel"), st("ff2_kernel")
    bqkvs, bos = st("bqkv")[:, None, :], st("bo")[:, None, :]
    b1s, b2s = st("ff1_bias")[:, None, :], st("ff2_bias")[:, None, :]
    lnf = jnp.stack([dec["norm"]["scale"], dec["norm"]["bias"]]).astype(dtype)

    zt = z.astype(dtype)
    bias = [
        zt @ l["glob_kernel"].astype(dtype) + l["glob_bias"].astype(dtype)
        for l in layers
    ]
    if cfg.label_condition and label is not None:
        ltab = params["label_embedding"]["label_embedding"]["embedding"]
        le = jnp.take(ltab.astype(dtype), label.astype(jnp.int32), axis=0)
        bias = [
            b + le @ l["glob2_kernel"].astype(dtype) + l["glob2_bias"].astype(dtype)
            for b, l in zip(bias, layers)
        ]
    seq_bias = jnp.stack(bias)  # [L, n, D]

    cmd_tab = emb["command_embed"].astype(dtype)
    arg_tab = emb["arg_embed"].astype(dtype)
    efk = emb["embed_fcn_kernel"].astype(dtype)
    efb = emb["embed_fcn_bias"].astype(dtype)
    grp_tab = emb["group_embed"].astype(dtype)
    pos_tab = emb["pos_embed"].astype(dtype)
    wc, bc = fcn["command_kernel"].astype(dtype), fcn["command_bias"].astype(dtype)
    wa, ba = fcn["args_kernel"].astype(dtype), fcn["args_bias"].astype(dtype)

    def embed(cmd, args, grp, i):
        ae = jnp.take(arg_tab, (args + 1).astype(jnp.int32), axis=0)
        e = (jnp.take(cmd_tab, cmd, axis=0)
             + ae.reshape(n, 64 * cfg.n_args) @ efk + efb
             + jnp.take(grp_tab, grp, axis=0))
        return e + jax.lax.dynamic_slice_in_dim(pos_tab, i, 1, axis=0)

    buf_cmds = jnp.full((n, length), CMD_EOS, jnp.int32).at[:, 0].set(CMD_SOS)
    buf_args = jnp.full((n, length, cfg.n_args), float(PAD_VAL), jnp.float32)
    kcache = jnp.zeros((L, n, length, cfg.d_model), dtype)
    vcache = jnp.zeros_like(kcache)
    kp = jnp.zeros((n, length), jnp.float32)
    eos_seen = jnp.zeros((n,), bool)
    gcount = jnp.zeros((n,), jnp.int32)

    def step(carry, i):
        kc, vc, cmds, argsb, kp, gcount, eos_seen, k = carry
        cmd_t = jax.lax.dynamic_slice_in_dim(cmds, i, 1, axis=1)[:, 0]
        args_t = jax.lax.dynamic_slice_in_dim(argsb, i, 1, axis=1)[:, 0]
        gcount = gcount + (cmd_t == CMD_M).astype(jnp.int32)
        x = embed(cmd_t, args_t, gcount, i)
        y, knew, vnew = fused_decode_step(
            x, seq_bias, ln1s, wqkvs, bqkvs, wos, bos, ln2s, w1s, b1s, w2s,
            b2s, lnf, kc, vc, kp, jnp.reshape(i, (1,)).astype(jnp.int32),
            cfg.n_heads, tile_r,
        )
        kc = jax.lax.dynamic_update_slice(kc, knew[:, :, None, :], (0, 0, i, 0))
        vc = jax.lax.dynamic_update_slice(vc, vnew[:, :, None, :], (0, 0, i, 0))
        if k is None:
            ids = fused_head_argmax(
                y, wc, bc, wa, ba, n_commands=cfg.n_commands,
                n_args=cfg.n_args, tile_rows=_pick_tile_r(n, cap=256),
            )
            cmd_new = ids[:, 0]
            args_new = ids[:, 1:].astype(jnp.float32) - 1.0
            knext = None
        else:
            k, kc_key, ka_key = jax.random.split(k, 3)
            cmd_new = sample_categorical(kc_key, y @ wc + bc, temperature)
            args_logits = (y @ wa + ba).reshape(n, cfg.n_args, cfg.args_dim_out)
            args_new = sample_categorical(ka_key, args_logits, temperature) - 1
            args_new = args_new.astype(jnp.float32)
            knext = k
        _, args_new = make_valid(cmd_new, args_new)
        eos_seen = eos_seen | (cmd_new == CMD_EOS)
        kp = kp.at[:, i + 1].set(jnp.where(eos_seen, -jnp.inf, 0.0))
        cmds = jax.lax.dynamic_update_slice(cmds, cmd_new[:, None], (0, i + 1))
        argsb = jax.lax.dynamic_update_slice(
            argsb, args_new[:, None, :], (0, i + 1, 0)
        )
        return (kc, vc, cmds, argsb, kp, gcount, eos_seen, knext), None

    carry = (kcache, vcache, buf_cmds, buf_args, kp, gcount, eos_seen, key)
    carry, _ = jax.lax.scan(
        lambda c, i: step(c, i), carry, jnp.arange(cfg.max_total_len)
    )
    buf_cmds, buf_args = carry[2], carry[3]
    commands_y = buf_cmds[:, None, 1:]
    args_y = buf_args[:, None, 1:, :]
    return _finalize_args(cfg, commands_y, args_y)


def autoregressive_sample(
    model: SVGTransformer,
    variables,
    z: jnp.ndarray,
    label: Optional[jnp.ndarray] = None,
    temperature: float = 0.0001,
    key: Optional[jax.Array] = None,
):
    """Autoregressive greedy decode as a jitted ``lax.scan`` over a fixed
    ``max_total_len`` buffer (replacing model.py:424-438's Python loop).

    Each step runs the decoder over the full buffer under a causal mask and
    reads the logits at the current position. See
    :func:`autoregressive_sample_cached` for the O(L) KV-cached variant.
    Returns ``(commands [N, 1, L], args [N, 1, L, n_args])`` without SOS.
    """
    cfg = model.cfg
    n = z.shape[0]
    length = cfg.max_total_len + 1

    buf_cmds = jnp.full((n, 1, length), CMD_EOS, jnp.int32).at[..., 0].set(CMD_SOS)
    buf_args = jnp.full((n, 1, length, cfg.n_args), float(PAD_VAL), jnp.float32)

    def step(carry, i):
        cmds, args, k = carry
        res = model.apply(
            variables, None, None, cmds, args, label=label, z=z,
            return_tgt=False, deterministic=True,
        )
        if k is None:
            kc = ka = None
            knext = None
        else:
            k, kc, ka = jax.random.split(k, 3)
            knext = k
        cmd_logits = jnp.take(res["command_logits"], i, axis=2)   # [N, 1, n_commands]
        args_logits = jnp.take(res["args_logits"], i, axis=2)     # [N, 1, n_args, A]
        cmd_new = sample_categorical(kc, cmd_logits, temperature)
        args_new = sample_categorical(ka, args_logits, temperature) - 1
        _, args_new = make_valid(cmd_new, args_new.astype(jnp.float32))
        cmds = jax.lax.dynamic_update_index_in_dim(cmds, cmd_new, i + 1, axis=2)
        args = jax.lax.dynamic_update_index_in_dim(args, args_new, i + 1, axis=2)
        return (cmds, args, knext), None

    (buf_cmds, buf_args, _), _ = jax.lax.scan(
        step, (buf_cmds, buf_args, key), jnp.arange(cfg.max_total_len)
    )

    commands_y = buf_cmds[..., 1:]          # drop SOS
    args_y = buf_args[..., 1:, :]
    return _finalize_args(cfg, commands_y, args_y)


def greedy_sample(
    model: SVGTransformer,
    variables,
    commands_enc=None,
    args_enc=None,
    label=None,
    z=None,
    temperature: float = 0.0001,
    key: Optional[jax.Array] = None,
    rngs: Optional[dict] = None,
):
    """Dispatch to one-shot or autoregressive sampling (model/model.py:414-448)."""
    cfg = model.cfg
    if cfg.use_vae and (rngs is None or "vae" not in rngs):
        rngs = {**(rngs or {}), "vae": jax.random.key(0)}
    if cfg.pred_mode == "one_shot":
        return one_shot_sample(
            model, variables, z=z, commands_enc=commands_enc, args_enc=args_enc,
            label=label, temperature=temperature, key=key, rngs=rngs,
        )
    if z is None:
        z = model.apply(
            variables, commands_enc, args_enc, None, None, label=label,
            encode_mode=True, deterministic=True, rngs=rngs,
        )
    # NOTE: the fused whole-stack decode kernel (autoregressive_sample_fused)
    # measured SLOWER than this einsum path on real hardware — the cached scan
    # is bandwidth-bound on the K/V reads, which XLA already streams at full
    # rate (docs/PERFORMANCE.md "Negative result: fused decode-stack kernel").
    return autoregressive_sample_cached(model, variables, z, label=label,
                                        temperature=temperature, key=key)


def flatten_groups_np(commands: np.ndarray, args: np.ndarray):
    """Host-side ragged flattening (model/model.py:443-446): drop padded
    positions, concatenate groups. Per-sample lists of (commands, args)."""
    commands, args = np.asarray(commands), np.asarray(args)
    pad = np.asarray(M.padding_mask(jnp.asarray(commands))).astype(bool)
    out = []
    for i in range(commands.shape[0]):
        out.append((commands[i][pad[i]], args[i][pad[i]]))
    return out
