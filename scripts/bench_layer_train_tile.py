"""Row-tile sweep for the TRAINING fused layer (ops/layer_vjp.py): dense
matmuls run on the full tile, attention on ~256-row sub-blocks
(_auto_attn_rows), mirroring the inference decoupling that bought +4.8%
(docs/PERFORMANCE.md "Sub-blocked attention").

Times forward+backward (jax.grad of a sum) at flagship TRAINING shapes:
B=128 icons -> 1024 stage-1 sequences of S=32, d_model 256, dff 512, bf16,
dropout 0.1. Chained lax.scan timing (data dependency between iterations),
synchronized by a scalar fetch.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.ops.layer_vjp import _auto_attn_rows, fused_layer_train

    b, s, d, dff, heads = 1024, 32, 256, 512, 8
    rate = 0.1
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.3, dt)
    bias = jnp.asarray(rng.standard_normal((b, d)) * 0.1, dt)
    ln1 = jnp.stack([jnp.ones(d), jnp.zeros(d)]).astype(jnp.float32)
    ln2 = ln1
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

    # difference method: per-iter = (t(N_long) - t(N_short)) / (long - short)
    # so the host<->relay round trip (~30 ms, comparable to the kernels at
    # these shapes) cancels instead of smearing over the iterations
    N_SHORT, N_LONG = 10, 110
    for tile_b in (8, 16, 32, 64):
        if b % tile_b:
            continue

        def make(n):
            @jax.jit
            def chain(x):
                def body(carry, _):
                    def loss(xx):
                        out = fused_layer_train(
                            xx, bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1,
                            w2, b2, mask, seed, heads, tile_b, False, rate)
                        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
                    g = jax.grad(loss)(carry)
                    return (carry * 0.99 + g.astype(dt) * 0.01), None

                y, _ = jax.lax.scan(body, x, None, length=n)
                return jnp.float32(jnp.sum(y.astype(jnp.float32)))
            return chain

        try:
            short, long_ = make(N_SHORT), make(N_LONG)
            float(short(x)); float(long_(x))  # compile + warm
            def t(f):
                t0 = time.perf_counter(); float(f(x))
                return time.perf_counter() - t0
            ts = min(t(short) for _ in range(3))
            tl = min(t(long_) for _ in range(3))
            dt_iter = (tl - ts) / (N_LONG - N_SHORT)
            ar = _auto_attn_rows(tile_b, s)
            print(f"tile {tile_b:3d} ({tile_b*s:5d} rows, attn {ar}): "
                  f"{dt_iter*1e3:7.3f} ms/layer-fwdbwd")
        except Exception as e:  # Mosaic lowering / VMEM limits
            print(f"tile {tile_b:3d}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
