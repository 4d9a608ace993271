"""Decompose the fused TRAINING layer's time into measured components.

docs/sol_table.json puts the E1/D1 stacks at 2.4x a VPU floor whose peak is
a GUESSED constant, with the MXU floor far below the measurement — so where
does the per-layer time actually go? This measures it directly by swapping
individual stages of the kernel for pass-throughs (monkeypatching the
module-level helpers the kernels call at trace time) and re-timing at
flagship training shapes:

  base           full training kernel (rate 0 and 0.1)
  skip_ln        _ln_fwd/_ln_bwd -> identity (no mean/var/rsqrt/stat bwd)
  skip_softmax   _attn_fwd_head returns masked scaled scores (no max/exp/sum)
  skip_both      both of the above

Component cost = base - variant. The residue of skip_both is matmuls +
casts + reshapes + mask build, to compare against the MXU floor.

Numerics of the patched variants are wrong on purpose; only time matters.
Run on the chip: python scripts/exp_layer_decomp.py
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

    from deepsvg_tpu.ops import layer_vjp as lv

    b, s, d, dff, heads = 1024, 32, 256, 512, 8
    tile_b = 8  # 256 rows, the production pick
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

    N_SHORT, N_LONG = 10, 110

    def timed(make_chain):
        f_short = make_chain(N_SHORT)
        f_long = make_chain(N_LONG)
        float(jnp.sum(f_short(x)))  # compile+warm
        float(jnp.sum(f_long(x)))
        best_s = best_l = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(f_short(x)))
            best_s = min(best_s, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jnp.sum(f_long(x)))
            best_l = min(best_l, time.perf_counter() - t0)
        return (best_l - best_s) / (N_LONG - N_SHORT) * 1e3  # ms/iter

    def fwd_chain(rate):
        def make(n):
            @jax.jit
            def chain(x0):
                def body(c, _):
                    return lv._layer_fwd_call(
                        seed, c, bias, *weights, mask, heads, tile_b, False,
                        rate, False), None
                out, _ = jax.lax.scan(body, x0, None, length=n)
                return out
            return chain
        return make

    def bwd_chain(rate):
        # the backward kernel alone (it recomputes the forward internally)
        def make(n):
            @jax.jit
            def chain(x0):
                def body(c, _):
                    outs = lv._layer_bwd_call(
                        seed, c, bias, *weights, mask, c, heads, tile_b,
                        False, rate, False)
                    return outs[0], None
                out, _ = jax.lax.scan(body, x0, None, length=n)
                return out
            return chain
        return make

    # --- patch points -------------------------------------------------------
    real_ln_fwd, real_ln_bwd = lv._ln_fwd, lv._ln_bwd
    real_attn = lv._attn_fwd_head

    def ln_fwd_skip(x, scale, bias):
        return x, x, jnp.ones_like(x[:, :1])

    def ln_bwd_skip(dy, xhat, rstd, scale):
        z = jnp.zeros((1, dy.shape[1]), dy.dtype)
        return dy, z, z

    def attn_skip(qkv, big_mask, h, d_model, head_dim, scale, r0=0,
                  attn_rows=None):
        rr = slice(r0, r0 + (attn_rows or qkv.shape[0]))
        q = qkv[rr, h * head_dim:(h + 1) * head_dim]
        k = qkv[rr, d_model + h * head_dim:d_model + (h + 1) * head_dim]
        v = qkv[rr, 2 * d_model + h * head_dim:2 * d_model + (h + 1) * head_dim]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jnp.where(big_mask >= 0.0, scores * 1e-2, 0.0)
        return q, k, v, p

    def with_patches(skip_ln, skip_softmax, fn):
        lv._ln_fwd = ln_fwd_skip if skip_ln else real_ln_fwd
        lv._ln_bwd = ln_bwd_skip if skip_ln else real_ln_bwd
        lv._attn_fwd_head = attn_skip if skip_softmax else real_attn
        try:
            return fn()
        finally:
            lv._ln_fwd, lv._ln_bwd = real_ln_fwd, real_ln_bwd
            lv._attn_fwd_head = real_attn

    results = {}
    variants = [
        ("base_r0", False, False, 0.0),
        ("base_r01", False, False, 0.1),
        ("skip_ln", True, False, 0.0),
        ("skip_softmax", False, True, 0.0),
        ("skip_both", True, True, 0.0),
    ]
    for name, sl, ss, rate in variants:
        fms = with_patches(sl, ss, lambda: timed(fwd_chain(rate)))
        bms = with_patches(sl, ss, lambda: timed(bwd_chain(rate)))
        results[name] = {"fwd_ms": round(fms, 4), "bwd_ms": round(bms, 4)}
        print(f"{name:14s} fwd {fms:7.3f} ms   bwd {bms:7.3f} ms",
              flush=True)

    base_f = results["base_r0"]["fwd_ms"]
    base_b = results["base_r0"]["bwd_ms"]
    print("\ncomponent costs (ms, fwd / bwd):")
    for name in ("skip_ln", "skip_softmax", "skip_both"):
        print(f"  {name:13s} saves {base_f - results[name]['fwd_ms']:6.3f} / "
              f"{base_b - results[name]['bwd_ms']:6.3f}")
    print(f"  dropout        costs {results['base_r01']['fwd_ms'] - base_f:6.3f} / "
          f"{results['base_r01']['bwd_ms'] - base_b:6.3f}")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "layer_decomp.json")
    with open(out, "w") as f:
        json.dump({"shapes": {"b": b, "s": s, "d": d, "dff": dff,
                              "tile_b": tile_b},
                   "results": results}, f, indent=1)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
