"""A/B the promoted batched (rank-3) attention form in the PRODUCTION
fused layer VJP (ops/layer_vjp.py fused_layer_train) against the current
sub-blocked 2-D form, fwd+bwd at flagship training shapes.

scripts/exp_batched_attn.py measured the forward-only prototype 11%
faster at tile 32 (docs/batched_attn_fwd.json); this measures the full
training path (custom-VJP backward included, dropout 0.1 like production)
and verifies gradient agreement at rate=0 before timing.

Run on the chip: python scripts/exp_batched_train_ab.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.ops.layer_vjp import fused_layer_train

    b, s, d, dff, heads = 1024, 32, 256, 512, 8
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.3, dt)
    bias = jnp.asarray(rng.standard_normal((b, d)) * 0.1, dt)
    ln = jnp.stack([jnp.ones(d), jnp.zeros(d)]).astype(jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, jnp.float32)
    bqkv = jnp.zeros(3 * d, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)
    bo = jnp.zeros(d, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, dff)) * 0.05, jnp.float32)
    b1 = jnp.zeros(dff, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((dff, d)) * 0.05, jnp.float32)
    b2 = jnp.zeros(d, jnp.float32)
    mask = jnp.zeros((b, s), jnp.float32)
    seed = jnp.asarray([7], jnp.int32)
    weights = (ln, wqkv, bqkv, wo, bo, ln, w1, b1, w2, b2)

    def make_fn(tile_b, rate, batched):
        @jax.jit
        def f(x, bias, weights, mask, seed):
            def loss(x, bias, ws):
                y = fused_layer_train(x, bias, *ws, mask, seed, heads,
                                      tile_b, False, rate, None, batched)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-3
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                x, bias, weights)
            return l, grads
        return f

    # chained-scan difference timing (the per-call method under-reads on the
    # axon relay): run a scan of N fwd+bwd layer steps inside one jit, time
    # long minus short.
    N_SHORT, N_LONG = 5, 55

    def make_chain(tile_b, rate, batched, n):
        @jax.jit
        def chain(x0, bias, weights, mask, seed):
            def body(c, _):
                def loss(x, bias, ws):
                    y = fused_layer_train(x, bias, *ws, mask, seed, heads,
                                          tile_b, False, rate, None, batched)
                    return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-3
                _, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                    c, bias, weights)
                return grads[0].astype(c.dtype), None
            out, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.sum(out.astype(jnp.float32))
        return chain

    def timed(tile_b, rate, batched, reps=3):
        f_s = make_chain(tile_b, rate, batched, N_SHORT)
        f_l = make_chain(tile_b, rate, batched, N_LONG)
        float(f_s(x, bias, weights, mask, seed))
        float(f_l(x, bias, weights, mask, seed))
        best_s = best_l = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f_s(x, bias, weights, mask, seed))
            best_s = min(best_s, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(f_l(x, bias, weights, mask, seed))
            best_l = min(best_l, time.perf_counter() - t0)
        return (best_l - best_s) / (N_LONG - N_SHORT) * 1e3

    # gradient agreement at rate=0 (dropout masks differ across forms)
    ref_l, ref_g = make_fn(8, 0.0, False)(x, bias, weights, mask, seed)
    out = {}
    for tile in (8, 16, 32):
        try:
            l2, g2 = make_fn(tile, 0.0, True)(x, bias, weights, mask, seed)
        except Exception as e:  # VMEM overflow etc. — record and move on
            out[f"batched_tile{tile}"] = {"error": str(e)[:200]}
            continue
        errs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                               - b.astype(jnp.float32)))),
            ref_g, g2)
        max_err = max(jax.tree.leaves(errs))
        out[f"batched_tile{tile}"] = {
            "max_grad_err_vs_current": max_err,
            "loss_err": abs(float(ref_l) - float(l2)),
        }

    for rate in (0.1, 0.0):
        key = f"rate{rate}"
        out[f"current_tile8_{key}_ms"] = round(timed(8, rate, False), 4)
        print(f"current tile8 {key}: {out[f'current_tile8_{key}_ms']} ms",
              flush=True)
        for tile in (8, 16, 32):
            k = f"batched_tile{tile}_{key}_ms"
            if isinstance(out.get(f"batched_tile{tile}"), dict) and \
               "error" in out[f"batched_tile{tile}"]:
                continue
            try:
                out[k] = round(timed(tile, rate, True), 4)
            except Exception as e:
                out[k] = f"error: {str(e)[:160]}"
            print(f"batched tile{tile} {key}: {out[k]}", flush=True)

    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "batched_train_ab.json"),
            "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
