"""A/B the fused training layer's save-residuals mode against the default
flash-style full recompute (VERDICT r3 #1a, the round's highest-leverage
question): at S=32 the residuals (pre-dropout attention probs + FF hidden)
are small, so stashing them to HBM in the forward and skipping the backward's
scores+softmax+FF-hidden recompute may beat recomputing.

Also audits the measurement itself: the earlier chained-scan methodology
(scripts/exp_batched_train_ab.py) consumed only grads[0] per iteration, so
XLA could dead-code parts of the backward; here every gradient leaf is folded
into the scan carry ("consume-all"), and the old consume-dx-only number is
recorded alongside to quantify the artifact.

Timing: chained-scan difference (long minus short chain inside one jit) —
per-call timing under-reads through the axon relay (bench.py method note).

Verification first: save-mode gradients must match recompute-mode gradients
at the same seed (bf16 saves -> tolerance) before any timing is trusted.

Run on the chip: python scripts/exp_save_recompute_ab.py
Writes docs/save_recompute_ab.json.
"""
from __future__ import annotations

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

    b, s, d, dff, heads, tile_b = 1024, 32, 256, 512, 8, 8
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

    def layer(xx, bb, ws, rate, save):
        return fused_layer_train(xx, bb, *ws, mask, seed, heads, tile_b,
                                 False, rate, None, False, save)

    # ---- correctness gate: save-mode grads match recompute-mode ------------
    out = {}

    import functools

    @functools.partial(jax.jit, static_argnums=(3,))
    def grads_of(xx, bb, ws, save):
        def loss(xx, bb, ws):
            return jnp.sum(layer(xx, bb, ws, 0.1, save)
                           .astype(jnp.float32) ** 2) * 1e-3
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(xx, bb, ws)

    l_r, g_r = grads_of(x, bias, weights, False)
    l_s, g_s = grads_of(x, bias, weights, True)
    errs = jax.tree.map(
        lambda a, b_: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                            - b_.astype(jnp.float32)))),
        g_r, g_s)
    rel = jax.tree.map(
        lambda a, b_: float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32)))
            / (jnp.max(jnp.abs(a.astype(jnp.float32))) + 1e-9)),
        g_r, g_s)
    out["grad_check"] = {
        "loss_rel_err": abs(float(l_r) - float(l_s)) / abs(float(l_r)),
        "max_abs_err": max(jax.tree.leaves(errs)),
        "max_rel_err": max(jax.tree.leaves(rel)),
    }
    print("grad check:", json.dumps(out["grad_check"]), flush=True)

    # ---- chained-scan timing ----------------------------------------------
    N_SHORT, N_LONG = 5, 35

    def make_chain(rate, save, n, consume_all):
        @jax.jit
        def chain(x0, bb, ws):
            def body(c, _):
                def loss(xx, bb, ws):
                    return jnp.sum(layer(xx, bb, ws, rate, save)
                                   .astype(jnp.float32) ** 2) * 1e-3
                _, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                    c, bb, ws)
                dx = grads[0].astype(jnp.float32)
                if consume_all:
                    gsum = sum(jnp.sum(g.astype(jnp.float32))
                               for g in jax.tree.leaves(grads[1:]))
                    dx = dx + gsum * 1e-20
                return dx.astype(c.dtype), None
            outc, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.sum(outc.astype(jnp.float32))
        return chain

    def timed(rate, save, consume_all, reps=4):
        f_s = make_chain(rate, save, N_SHORT, consume_all)
        f_l = make_chain(rate, save, N_LONG, consume_all)
        float(f_s(x, bias, weights))
        float(f_l(x, bias, weights))
        best_s = best_l = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f_s(x, bias, weights))
            best_s = min(best_s, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(f_l(x, bias, weights))
            best_l = min(best_l, time.perf_counter() - t0)
        return (best_l - best_s) / (N_LONG - N_SHORT) * 1e3

    # fwd-only chain (save mode pays its HBM writes here)
    def make_fwd_chain(rate, save, n):
        @jax.jit
        def chain(x0, bb, ws):
            def body(c, _):
                y = layer(c, bb, ws, rate, save)
                return y.astype(c.dtype), None
            outc, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.sum(outc.astype(jnp.float32))
        return chain

    def timed_fwd(rate, save, reps=4):
        f_s = jax.jit(make_fwd_chain(rate, save, N_SHORT))
        f_l = jax.jit(make_fwd_chain(rate, save, N_LONG))
        float(f_s(x, bias, weights))
        float(f_l(x, bias, weights))
        best_s = best_l = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f_s(x, bias, weights))
            best_s = min(best_s, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(f_l(x, bias, weights))
            best_l = min(best_l, time.perf_counter() - t0)
        return (best_l - best_s) / (N_LONG - N_SHORT) * 1e3

    for rate in (0.1, 0.0):
        for save in (False, True):
            k = f"fwdbwd_{'save' if save else 'recompute'}_rate{rate}_ms"
            out[k] = round(timed(rate, save, True), 4)
            print(f"{k}: {out[k]}", flush=True)
    # the old consume-dx-only methodology, for the measurement audit
    out["fwdbwd_recompute_rate0.1_dxonly_ms"] = round(
        timed(0.1, False, False), 4)
    print("dx-only (old methodology):",
          out["fwdbwd_recompute_rate0.1_dxonly_ms"], flush=True)
    for save in (False, True):
        k = f"fwd_{'save' if save else 'plain'}_rate0.1_ms"
        out[k] = round(timed_fwd(0.1, save), 4)
        print(f"{k}: {out[k]}", flush=True)

    out["shapes"] = {"b": b, "s": s, "d": d, "dff": dff, "heads": heads,
                     "tile_b": tile_b, "n_short": N_SHORT, "n_long": N_LONG}
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "save_recompute_ab.json"),
            "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
