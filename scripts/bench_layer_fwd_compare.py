"""Apples-to-apples layer-kernel timings at TRAINING shapes (b=1024 seqs,
S=32, D=256, dff=512), with the relay round-trip CANCELLED.

Methodology bug this replaces: timing one ``float(chain(x))`` call divides
the host<->relay round trip (tens of ms) over N=30 iterations — at these
small shapes that latency is comparable to the kernels themselves and made
every variant read ~1.6 ms/layer. Here per-iteration time is
``(t(N_long) - t(N_short)) / (N_long - N_short)`` — two chains differing
only in iteration count, so launch + transfer + fetch cancel exactly
(the same method bench.py uses).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.ops.layer import fused_layer
    from deepsvg_tpu.ops.layer_vjp import fused_layer_train

    b, s, d, dff, heads = 1024, 32, 256, 512, 8
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.3, dt)
    ln1 = jnp.stack([jnp.ones(d), jnp.zeros(d)]).astype(jnp.float32)
    ln2 = ln1
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, dt)
    bqkv = jnp.zeros(3 * d, dt)
    wo = jnp.asarray(rng.standard_normal((d, d)) * 0.05, dt)
    bo = jnp.zeros(d, dt)
    w1 = jnp.asarray(rng.standard_normal((d, dff)) * 0.05, dt)
    b1 = jnp.zeros(dff, dt)
    w2 = jnp.asarray(rng.standard_normal((dff, d)) * 0.05, dt)
    b2 = jnp.zeros(d, dt)
    mask = jnp.zeros((b, s), jnp.float32)
    seed = jnp.asarray([7], jnp.int32)
    zbias = jnp.zeros((b, d), dt)

    N_SHORT, N_LONG = 10, 110

    def bench(label, fn, grad=False):
        def make(n):
            @jax.jit
            def chain(x):
                def body(carry, _):
                    if grad:
                        def loss(xx):
                            out = fn(xx)
                            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
                        g = jax.grad(loss)(carry)
                        return (carry * 0.99 + g.astype(dt) * 0.01), None
                    return fn(carry).astype(dt), None
                y, _ = jax.lax.scan(body, x, None, length=n)
                return jnp.float32(jnp.sum(y.astype(jnp.float32)))
            return chain

        short, long_ = make(N_SHORT), make(N_LONG)
        try:
            float(short(x)); float(long_(x))          # compile + warm
            reps = 3
            ts = min(_t(short, x) for _ in range(reps))
            tl = min(_t(long_, x) for _ in range(reps))
            per = (tl - ts) / (N_LONG - N_SHORT)
            print(f"{label}: {per*1e3:7.3f} ms/layer")
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}")

    def _t(f, x):
        t0 = time.perf_counter()
        float(f(x))
        return time.perf_counter() - t0

    for tile_b in (8, 32):
        bench(f"inference fwd          tile {tile_b:3d}",
              lambda xx, tb=tile_b: fused_layer(
                  xx, None, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2,
                  mask, n_heads=heads, tile_b=tb))
    for rate in (0.0, 0.1):
        bench(f"training  fwd rate {rate:.1f}  tile   8",
              lambda xx, r=rate: fused_layer_train(
                  xx, zbias, ln1, wqkv, bqkv, wo, bo, ln2,
                  w1, b1, w2, b2, mask, seed, heads, 8, False, r))
        bench(f"training  fwd+bwd {rate:.1f}   tile   8",
              lambda xx, r=rate: fused_layer_train(
                  xx, zbias, ln1, wqkv, bqkv, wo, bo, ln2,
                  w1, b1, w2, b2, mask, seed, heads, 8, False, r),
              grad=True)

    # attention sub-block sweep: score waste is linear in attn_rows and the
    # backward pays it ~2.5x (fwd + recompute + dp/ds/dq/dk) — the knee may
    # sit lower than inference's 256
    for ar in (32, 64, 128, 256):
        bench(f"training  fwd+bwd 0.1 attn {ar:3d}",
              lambda xx, a=ar: fused_layer_train(
                  xx, zbias, ln1, wqkv, bqkv, wo, bo, ln2,
                  w1, b1, w2, b2, mask, seed, heads, 8, False, 0.1, a),
              grad=True)


if __name__ == "__main__":
    main()
