"""A/B: execution backend for the HIERARCHICAL (stage-2) stacks.

E2/D2 sequences are G=8 tokens — per-layer FLOPs ~1/30 of the big E1/D1
stages — so the Pallas whole-layer kernels' fixed cost (grid setup, VMEM
staging) may dominate there and the plain XLA lowering win. This times the
full flagship training step with the stage-2 stacks on pallas vs xla
(attention_impl_hierarchical), plus a grad-equivalence check between the
two settings from identical params.

Run on the chip: python scripts/exp_hier_stack_impl.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WEIGHTS = dict(kl_tolerance=0.1, loss_kl_weight=1.0,
               loss_visibility_weight=1.0, loss_cmd_weight=1.0,
               loss_args_weight=2.0)


def time_step(hier_impl, batch_size=128, n_iters=10, dropout=0.1):
    import jax
    import jax.numpy as jnp
    import optax

    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.training.trainer import (
        create_train_state, make_optimizer, train_step)

    cfg = ModelConfig(
        encode_stages=2, decode_stages=2, use_vae=False,
        compute_dtype="bfloat16", attention_impl="pallas", dropout=dropout,
        attention_impl_hierarchical=hier_impl,
    )
    model = SVGTransformer(cfg)
    model_args = ["commands", "args", "commands", "args"]
    rng = np.random.default_rng(0)
    b = generate_batch(rng, batch_size, cfg.max_num_groups, cfg.max_seq_len)
    data = {"commands": jnp.asarray(b["commands"]),
            "args": jnp.asarray(b["args"])}
    optimizer = make_optimizer(optax.constant_schedule(1e-3))
    state = create_train_state(model, optimizer, data, model_args)

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain(state, data, n):
        def body(st, _):
            st, res = train_step(st, data, WEIGHTS, model, optimizer,
                                 model_args)
            return st, res["loss"]

        _, losses = jax.lax.scan(body, state, None, length=n)
        return losses[-1]

    def timed(n, reps=3):
        np.asarray(chain(state, data, n))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chain(state, data, n))
            best = min(best, time.perf_counter() - t0)
        return best

    per_step = (timed(1 + n_iters) - timed(1)) / n_iters
    return per_step * 1e3, batch_size / per_step


def grad_check(batch_size=16):
    """Same params, dropout 0: loss and grads must agree between hier-impl
    settings to bf16-pass tolerance."""
    import jax
    import jax.numpy as jnp

    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.models.loss import svg_loss

    rng = np.random.default_rng(1)
    b = generate_batch(rng, batch_size, 8, 30)
    args = (jnp.asarray(b["commands"]), jnp.asarray(b["args"]))

    def loss_for(hier_impl, params=None):
        cfg = ModelConfig(encode_stages=2, decode_stages=2, use_vae=False,
                          compute_dtype="bfloat16", attention_impl="pallas",
                          dropout=0.0, attention_impl_hierarchical=hier_impl)
        model = SVGTransformer(cfg)
        if params is None:
            params = model.init({"params": jax.random.key(0)},
                                *args, *args)["params"]

        def f(p):
            # deterministic=False routes through the differentiable training
            # kernels (the fully-fused inference layer has no VJP); dropout
            # is 0.0 so the result is still deterministic
            out = model.apply({"params": p}, *args, *args,
                              deterministic=False,
                              rngs={"dropout": jax.random.key(1)})
            return svg_loss(out, WEIGHTS, cfg)["loss"]

        return params, jax.jit(jax.value_and_grad(f))

    params, f_pallas = loss_for(None)
    _, f_xla = loss_for("xla", params)
    lp, gp = f_pallas(params)
    lx, gx = f_xla(params)
    rel = abs(float(lp) - float(lx)) / max(abs(float(lx)), 1e-9)
    gdiff = max(
        float(jnp.max(jnp.abs(a - b))) / max(float(jnp.max(jnp.abs(b))), 1e-9)
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)))
    print(f"grad check: loss rel diff {rel:.2e}, "
          f"max per-leaf grad rel diff {gdiff:.2e}")


def main():
    for impl in (None, "xla"):
        ms, sps = time_step(impl)
        print(f"hier_impl={impl or 'pallas'}: {ms:.2f} ms/step, "
              f"{sps:.0f} samples/s")
    grad_check()
    # batch scaling: the fused-CE head removed the old logits HBM cap, so
    # larger-than-recipe batches are the production operating point
    for b in (256, 512):
        for impl in (None, "xla"):
            ms, sps = time_step(impl, batch_size=b, n_iters=6)
            print(f"B={b} hier_impl={impl or 'pallas'}: {ms:.2f} ms/step, "
                  f"{sps:.0f} samples/s")


if __name__ == "__main__":
    main()
