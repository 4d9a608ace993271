"""Train state and jitted train/eval steps.

The reference hot loop (train.py:77-135) dispatches Python-side per step:
``.to(device)``, forward, backward, clip, optimizer/scheduler stepping. Here
the entire step — forward, loss, backward, global-norm clip, AdamW update,
lr schedule — is one jitted (optionally pjit-sharded) function.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.loss import svg_loss
from ..models.model import SVGTransformer


class TrainState(flax.struct.PyTreeNode):
    """Replicable training state: params + optimizer state + step + rng."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


def make_optimizer(
    lr_schedule: Callable,
    grad_clip: float = 1.0,
    weight_decay: float = 0.01,
    start_step: int = 0,
) -> optax.GradientTransformation:
    """AdamW + global-norm clipping (reference config.py:73-76 make_optimizers
    + train.py:99-100 clip_grad_norm). ``start_step`` reproduces the
    reference's ``optimizer_starts`` gating (train.py:97-106: before the
    start step no backward/update runs and no optimizer state accumulates)."""
    opt = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr_schedule, weight_decay=weight_decay),
    )
    if start_step > 0:
        opt = delayed_start(opt, start_step)
    return opt


def make_optimizers(
    members: dict,
    param_labels,
) -> optax.GradientTransformation:
    """The reference's multi-optimizer LIST hook (``cfg.make_optimizers`` +
    per-optimizer ``optimizer_starts`` gating, reference train.py:91-112,
    config.py:73-76) as ONE optax transformation: each ``members[label]`` is
    either a ready ``GradientTransformation`` or a kwargs dict for
    :func:`make_optimizer` (``lr_schedule`` / ``grad_clip`` / ``weight_decay``
    / ``start_step``), applied to the parameters ``param_labels`` maps to that
    label (a pytree of labels matching params, or ``callable(params) ->
    labels`` — ``optax.multi_transform`` semantics). ``start_step`` reproduces
    the reference's skip exactly: no update AND no state accumulation before
    the start step. The combined transformation drops into the existing
    single-optimizer ``TrainState``/``train_step`` unchanged."""
    transforms = {}
    for label, spec in members.items():
        if isinstance(spec, dict):
            spec = make_optimizer(**spec)
        transforms[label] = spec
    return optax.multi_transform(transforms, param_labels)


def delayed_start(
    opt: optax.GradientTransformation, start_step: int
) -> optax.GradientTransformation:
    """Gate an optimizer to begin at ``start_step``: until then updates are
    zero AND the inner state (Adam moments, schedule counts) stays frozen —
    exactly the reference's ``if step >= optimizer_start`` skip
    (train.py:97-106). Used standalone (``cfg.optimizer_start``) or as the
    per-member gate inside :func:`make_optimizers`."""

    def init(params):
        return (opt.init(params), jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        inner, count = state
        updates, new_inner = opt.update(grads, inner, params)
        on = (count >= start_step).astype(jnp.float32)
        updates = jax.tree.map(lambda u: u * on.astype(u.dtype), updates)
        new_inner = jax.tree.map(
            lambda a, b: jnp.where(count >= start_step, a, b), new_inner, inner
        )
        return updates, (new_inner, count + 1)

    return optax.GradientTransformation(init, update)


def create_train_state(
    model: SVGTransformer,
    optimizer: optax.GradientTransformation,
    sample_batch: dict,
    model_args: list[str],
    seed: int = 42,
) -> TrainState:
    """Initialize params from a sample batch (reference train.py:66-72 init
    forward pass)."""
    rngs = {"params": jax.random.key(seed)}
    if model.cfg.use_vae:
        rngs["vae"] = jax.random.key(seed + 1)
    args = [sample_batch[k] for k in model_args]
    variables = model.init(rngs, *args)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt_state=optimizer.init(variables["params"]),
        # legacy raw uint32 key: serializable by flax (typed keys are not)
        rng=jax.random.PRNGKey(seed + 2),
    )


def train_step(
    state: TrainState,
    batch: dict,
    weights: dict,
    model: SVGTransformer,
    optimizer: optax.GradientTransformation,
    model_args: list[str],
    axis_name: str | None = None,
) -> tuple[TrainState, dict]:
    """One fully-fused training step. ``weights`` values may be traced scalars
    (the KL ramp changes per step without recompilation).

    ``axis_name`` marks a data-parallel ``shard_map`` axis: the loss reduces
    globally (see ``svg_loss``), per-shard RNG streams are decorrelated, and
    the (globally-normalized) gradients ``psum`` over the axis — every shard
    then applies the identical optimizer update to its replicated state."""
    from ..data.loader import decompress_batch

    rng, drop_rng, vae_rng = jax.random.split(state.rng, 3)
    if axis_name is not None:
        shard = jax.lax.axis_index(axis_name)
        drop_rng = jax.random.fold_in(drop_rng, shard)
        vae_rng = jax.random.fold_in(vae_rng, shard)
    # narrow-integer wire format -> canonical dtypes, on device, fused by XLA
    batch = decompress_batch(batch)
    args = [batch[k] for k in model_args]

    def loss_fn(params):
        rngs = {"dropout": drop_rng}
        if model.cfg.use_vae:
            rngs["vae"] = vae_rng
        out = model.apply(
            {"params": params}, *args, deterministic=False, rngs=rngs,
            # fused softmax-CE head (ops/ce.py) on the Pallas backend: removes
            # the argument-logits tensor from the step's memory/bandwidth
            fused_ce=model.cfg.attention_impl == "pallas",
        )
        res = svg_loss(out, weights, model.cfg, axis_name=axis_name)
        return res["loss"], res

    (_, res), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    if axis_name is not None:
        # the loss is already globally normalized -> SUM the shard gradients
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis_name), grads)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1, params=params, opt_state=opt_state, rng=rng
    )
    res = dict(res)
    res["grad_norm"] = optax.global_norm(grads)
    return new_state, res


def eval_step(
    state: TrainState,
    batch: dict,
    weights: dict,
    model: SVGTransformer,
    model_args: list[str],
) -> dict:
    """Forward + loss without update (deterministic, VAE still samples with a
    fixed key for reproducibility)."""
    from ..data.loader import decompress_batch

    batch = decompress_batch(batch)
    args = [batch[k] for k in model_args]
    rngs = {"vae": jax.random.key(0)} if model.cfg.use_vae else None
    out = model.apply({"params": state.params}, *args, deterministic=True,
                      rngs=rngs, fused_ce=model.cfg.attention_impl == "pallas")
    return svg_loss(out, weights, model.cfg)


def jit_train_step(model, optimizer, model_args, donate: bool = True):
    """Close over the static pieces and jit. Donates the state buffer."""
    fn = partial(train_step, model=model, optimizer=optimizer, model_args=model_args)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def jit_train_multi_step(model, optimizer, model_args, weights_fn,
                         donate: bool = True):
    """K training steps per dispatch: ``lax.scan`` over a stacked batch dict
    ``{k: [K, ...]}``.

    Per-step host dispatch is pure overhead on the device timeline — ~100 us
    on an attached host, but a full RPC round trip (10-15 ms!) through a
    remote TPU relay, where it dominates the 29 ms step. One dispatch per K
    steps amortizes it to nothing. ``weights_fn(step) -> dict`` computes the
    per-step loss weights (e.g. the KL ramp) IN-GRAPH from the state's step
    counter, so weight ramps keep exact per-step semantics. Returns
    ``(state, res)`` where each res value is stacked ``[K]``."""

    def multi(state, batches, *, _m=model, _o=optimizer, _a=model_args):
        def body(st, batch):
            w = weights_fn(st.step)
            st, res = train_step(st, batch, w, model=_m, optimizer=_o,
                                 model_args=_a)
            return st, {k: v for k, v in res.items() if jnp.ndim(v) == 0}

        return jax.lax.scan(body, state, batches)

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def jit_train_resident_multi_step(model, optimizer, model_args, weights_fn,
                                  n_augs: int = 1, donate: bool = True,
                                  item_shapes: dict | None = None):
    """K training steps per dispatch gathering batches ON DEVICE from a
    resident dataset (data/resident.py).

    ``data`` is the full wire-compressed dataset ``{k: [M, ...]}`` living in
    HBM (``M = n_icons * n_augs``); ``icon_idx [K, B]`` carries each step's
    icon indices — the only per-dispatch host->device transfer (a few KB).
    ``item_shapes`` (``{k: trailing_shape}``) means ``data`` rows were
    FLATTENED to ``[M, prod(shape)]`` for residency — mandatory at corpus
    scale: TPU memory tiling pads a narrow minor dim (args' 11) to the
    128-lane register width, and XLA materializes that repack as a
    corpus-sized temp (measured 5.8x for the [M, 8, 32, 11] uint8 corpus —
    an instant OOM at 100k x 10 variants). A [M, 2816] row layout gathers
    with ZERO temp; the batch is reshaped after the gather.
    With ``n_augs > 1`` the augmentation variant is drawn per (step, item)
    from a step-seeded on-device key, reproducing the reference's
    uniform-per-access choice (svgtensor_dataset.py:156) without the host in
    the loop. Each res value returns ``[K]``-stacked scalars."""

    def multi(state, data, icon_idx):
        def body(st, idx):
            if n_augs > 1:
                akey = jax.random.fold_in(jax.random.PRNGKey(0xA9), st.step)
                aug = jax.random.randint(akey, idx.shape, 0, n_augs)
                flat = idx * n_augs + aug
            else:
                flat = idx
            batch = {k: jnp.take(v, flat, axis=0) for k, v in data.items()}
            if item_shapes:
                batch = {k: v.reshape(v.shape[:1] + tuple(item_shapes[k]))
                         for k, v in batch.items()}
            w = weights_fn(st.step)
            st, res = train_step(st, batch, w, model=model,
                                 optimizer=optimizer, model_args=model_args)
            return st, {k: v for k, v in res.items() if jnp.ndim(v) == 0}

        return jax.lax.scan(body, state, icon_idx)

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def jit_eval_step(model, model_args):
    return jax.jit(partial(eval_step, model=model, model_args=model_args))
