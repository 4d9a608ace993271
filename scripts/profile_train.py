"""Profile the flagship training step on the real chip: where does the time go?

Measures (per-iteration, chained-scan method — see docs/PERFORMANCE.md):
  1. full train step (fused attention VJP + fused CE head)
  2. loss forward only (no backward, same dropout config)
  3. deterministic inference forward (fully-fused layers) at the same batch
  4. optimizer-only update (AdamW + clip on fixed grads)
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import time

import numpy as np


def timed_scan(fn, args, n=10, reps=3):
    """fn(carry, n) -> carry chained n times inside jit; returns s/iter."""
    np.asarray(fn(*args, 1))
    best1 = best_n = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args, 1))
        best1 = min(best1, time.perf_counter() - t0)
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args, 1 + n))
        best_n = min(best_n, time.perf_counter() - t0)
    return (best_n - best1) / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.models.loss import svg_loss
    from deepsvg_tpu.training.trainer import (
        TrainState, create_train_state, make_optimizer, train_step)
    import optax

    B = 128
    cfg = ModelConfig(
        encode_stages=2, decode_stages=2, use_vae=False,
        compute_dtype="bfloat16", attention_impl="pallas", dropout=0.1,
    )
    model = SVGTransformer(cfg)
    model_args = ["commands", "args", "commands", "args"]

    rng = np.random.default_rng(0)
    b = generate_batch(rng, B, cfg.max_num_groups, cfg.max_seq_len)
    batch = {
        "commands": jnp.asarray(b["commands"]),
        "args": jnp.asarray(b["args"]),
    }
    batch = {"commands": batch["commands"], "args": batch["args"]}
    full_batch = {k: batch[k.split("_")[0] if False else k] for k in batch}
    data = {"commands": batch["commands"], "args": batch["args"]}
    sample = {k: data[k] for k in ["commands", "args"]}

    optimizer = make_optimizer(optax.constant_schedule(1e-3))
    state = create_train_state(model, optimizer, sample, ["commands", "args"] * 2)
    weights = dict(kl_tolerance=0.1, loss_kl_weight=1.0,
                   loss_visibility_weight=1.0, loss_cmd_weight=1.0,
                   loss_args_weight=2.0)

    args_list = [data[k] for k in model_args]

    # --- 1. full train step, chained -------------------------------------
    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_train(state, data, n):
        def body(st, _):
            st, res = train_step(st, data, weights, model, optimizer,
                                 ["commands", "args"] * 2)
            return st, res["loss"]
        st, losses = jax.lax.scan(body, state, None, length=n)
        return losses[-1]

    t = timed_scan(lambda s, d, n: chain_train(s, d, n), (state, data), n=10)
    print(f"full train step       : {t*1e3:8.2f} ms/step  {B/t:8.0f} samples/s")

    # --- 2. forward loss only (with dropout rngs, no grad) ----------------
    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_fwd(params, data, n):
        def body(carry, i):
            rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(0), i)}
            out = model.apply(
                {"params": params}, *[data[k] for k in model_args],
                deterministic=False, rngs=rngs, fused_ce=True,
            )
            res = svg_loss(out, weights, model.cfg)
            return carry + res["loss"], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return acc

    t = timed_scan(lambda p, d, n: chain_fwd(p, d, n), (state.params, data), n=10)
    print(f"loss forward only     : {t*1e3:8.2f} ms/step  {B/t:8.0f} samples/s")

    # --- 3. deterministic fused inference forward -------------------------
    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_inf(params, data, n):
        def body(carry, _):
            out = model.apply(
                {"params": params}, *[data[k] for k in model_args],
                deterministic=True,
            )
            return carry + jnp.sum(out["command_logits"].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    t = timed_scan(lambda p, d, n: chain_inf(p, d, n), (state.params, data), n=10)
    print(f"inference fwd (fused) : {t*1e3:8.2f} ms/step  {B/t:8.0f} samples/s")

    # --- 4. optimizer-only -------------------------------------------------
    grads = jax.tree.map(jnp.ones_like, state.params)

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_opt(state, grads, n):
        def body(st, _):
            updates, opt_state = optimizer.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return st.replace(params=params, opt_state=opt_state), None
        st, _ = jax.lax.scan(body, state, None, length=n)
        return jax.tree.leaves(st.params)[0].sum()

    t = timed_scan(lambda s, g, n: chain_opt(s, g, n), (state, grads), n=10)
    print(f"optimizer only        : {t*1e3:8.2f} ms/step")


if __name__ == "__main__":
    main()
