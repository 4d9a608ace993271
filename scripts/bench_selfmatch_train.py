"""Benchmark the self-match (Hungarian) training step: fused vs stock.

The self-match variant (reference model/model.py:311-350 + configs
hierarchical_self_matching) was this framework's last training path that had
to materialize the ``[N, P, S, n_args, args_dim]`` argument logits — the
matching cost needs every (proposal, target) pair scored. The fused path
(ops/ce.py ``args_ce_pairwise`` + target permutation + fused CE head) scores
pairs tile-wise in VMEM, so nothing head-sized touches HBM in forward or
backward and the per-chip batch cap disappears.

Timing: chained-scan method (see docs/PERFORMANCE.md).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import time

import numpy as np


def timed_scan(fn, args, n=10, reps=3):
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
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.training.trainer import (
        create_train_state, make_optimizer, train_step)

    model_args = ["commands", "args"] * 2
    weights = dict(kl_tolerance=0.1, loss_kl_weight=1.0,
                   loss_visibility_weight=1.0, loss_cmd_weight=1.0,
                   loss_args_weight=2.0)

    def bench(attention_impl: str, B: int):
        cfg = ModelConfig(
            encode_stages=2, decode_stages=2, use_vae=False, self_match=True,
            compute_dtype="bfloat16", attention_impl=attention_impl,
            dropout=0.1,
        )
        model = SVGTransformer(cfg)
        rng = np.random.default_rng(0)
        b = generate_batch(rng, B, cfg.max_num_groups, cfg.max_seq_len)
        data = {"commands": jnp.asarray(b["commands"]),
                "args": jnp.asarray(b["args"])}
        optimizer = make_optimizer(optax.constant_schedule(1e-3))
        state = create_train_state(model, optimizer, data, model_args)

        @functools.partial(jax.jit, static_argnums=(2,))
        def chain(state, data, n):
            def body(st, _):
                st, res = train_step(st, data, weights, model, optimizer,
                                     model_args)
                return st, res["loss"]
            st, losses = jax.lax.scan(body, state, None, length=n)
            return losses[-1]

        t = timed_scan(chain, (state, data), n=10)
        print(f"self-match train [{attention_impl:6s}] B={B:<4d}: "
              f"{t*1e3:8.2f} ms/step  {B/t:8.0f} samples/s/chip", flush=True)
        return t

    for impl, B in [("xla", 128), ("pallas", 128), ("pallas", 256),
                    ("pallas", 512)]:
        try:
            bench(impl, B)
        except Exception as e:  # OOM etc — part of the result
            print(f"self-match train [{impl:6s}] B={B:<4d}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
