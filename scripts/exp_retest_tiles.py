"""Retest training-kernel lowering at n_blocks > 1 after the combined-slice
restructure (no per-block sublane-slice intermediates)."""
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

    from deepsvg_tpu.ops.layer_vjp import fused_layer_train

    b, s, d, dff, heads = 1024, 32, 256, 512, 8
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.3, dt)
    zbias = jnp.zeros((b, d), dt)
    ln = jnp.stack([jnp.ones(d), jnp.zeros(d)]).astype(jnp.float32)
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
    N_SHORT, N_LONG = 10, 110

    def bench(label, tile_b, attn_rows):
        def make(n):
            @jax.jit
            def chain(x):
                def body(carry, _):
                    def loss(xx):
                        out = fused_layer_train(
                            xx, zbias, ln, wqkv, bqkv, wo, bo, ln, w1, b1,
                            w2, b2, mask, seed, heads, tile_b, False, 0.1,
                            attn_rows)
                        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
                    g = jax.grad(loss)(carry)
                    return (carry * 0.99 + g.astype(dt) * 0.01), None
                y, _ = jax.lax.scan(body, x, None, length=n)
                return jnp.float32(jnp.sum(y.astype(jnp.float32)))
            return chain
        try:
            short, long_ = make(N_SHORT), make(N_LONG)
            float(short(x)); float(long_(x))
            def t(f):
                t0 = time.perf_counter(); float(f(x))
                return time.perf_counter() - t0
            ts = min(t(short) for _ in range(3))
            tl = min(t(long_) for _ in range(3))
            per = (tl - ts) / (N_LONG - N_SHORT)
            print(f"{label}: {per*1e3:7.3f} ms/layer-fwdbwd")
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}")

    bench("tile 32 attn 128           ", 32, 128)
    bench("tile 16 attn  64           ", 16, 64)
    bench("tile 32 attn  64           ", 32, 64)


if __name__ == "__main__":
    main()
