"""A/B: per-leaf optax AdamW+clip vs the same transform flattened.

docs/glue_decomp.json: the full step runs 2.23 ms past loss-fwd+bwd, yet
the isolated optimizer microbench says 0.19 ms — BELOW its own 0.40 ms
HBM floor (fixed grads let XLA hoist the global-norm and fold the
elementwise chain; the microbench is invalid). In situ the optimizer phase
is ~300 per-leaf fusions (clip norm over 300 leaves, 300 AdamW elementwise
kernels, 300 apply_updates adds) — launch overhead and sub-lane tails
dominate at ~0.14 MB/leaf. ``optax.flatten`` runs the whole transform on
ONE raveled vector: 4 big HBM-bound passes + one reduce, at the cost of a
ravel/unravel copy per step.

Measures the FULL train step (chained scan) both ways plus grad_norm
variants. Run on chip: python scripts/exp_flat_opt.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, G, S = 128, 8, 30


def timed(fn, args, n=10, reps=3):
    np.asarray(fn(*args, 1))
    best1 = bestn = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args, 1))
        best1 = min(best1, time.perf_counter() - t0)
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args, 1 + n))
        bestn = min(bestn, time.perf_counter() - t0)
    return (bestn - best1) / n


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.training.trainer import (create_train_state,
                                              make_optimizer, train_step)

    cfg = ModelConfig(encode_stages=2, decode_stages=2, use_vae=False,
                      compute_dtype="bfloat16", attention_impl="pallas",
                      dropout=0.1)
    model = SVGTransformer(cfg)
    model_args = ["commands", "args"] * 2
    rng = np.random.default_rng(0)
    b = generate_batch(rng, B, G, S)
    data = {"commands": jnp.asarray(b["commands"]),
            "args": jnp.asarray(b["args"])}
    weights = dict(kl_tolerance=0.1, loss_kl_weight=1.0,
                   loss_visibility_weight=1.0, loss_cmd_weight=1.0,
                   loss_args_weight=2.0)
    out = {}

    def bench(tag, optimizer):
        state = create_train_state(model, optimizer, data, model_args)

        @functools.partial(jax.jit, static_argnums=(2,))
        def chain(st, d, n):
            def body(s, _):
                s, res = train_step(s, d, weights, model, optimizer,
                                    model_args)
                return s, res["loss"]
            _, losses = jax.lax.scan(body, st, None, length=n)
            return losses[-1]

        t = timed(chain, (state, data)) * 1e3
        out[tag] = round(t, 3)
        print(f"{tag:28s} {t:7.3f} ms/step", flush=True)

    sched = optax.constant_schedule(1e-3)
    bench("per_leaf (current)", make_optimizer(sched))
    bench("flattened", optax.flatten(optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=0.01))))

    out["delta_ms"] = round(out["per_leaf (current)"] - out["flattened"], 3)
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "flat_opt_ab.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
