"""Does D1's odd sequence length (S=31) cost real time in the fused layer
kernels via sublane-misaligned attention sub-block slices?

The training kernel slices per-block row ranges at multiples of
``attn_rows = k*S`` — for S=31 those offsets (124, 248, ...) are not
multiples of the 8/16-row sublane tile, forcing relayouts. This bench
compares S=31 vs S=32 at matched row counts, fwd and fwd+bwd, on the chip.
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

    from deepsvg_tpu.ops.attention import pick_tile_b
    from deepsvg_tpu.ops.layer_vjp import fused_layer_train

    d, dff, heads = 256, 512, 8
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    ln = jnp.stack([jnp.ones(d), jnp.zeros(d)]).astype(jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, dt)
    bqkv = jnp.zeros(3 * d, dt)
    wo = jnp.asarray(rng.standard_normal((d, d)) * 0.05, dt)
    bo = jnp.zeros(d, dt)
    w1 = jnp.asarray(rng.standard_normal((d, dff)) * 0.05, dt)
    b1 = jnp.zeros(dff, dt)
    w2 = jnp.asarray(rng.standard_normal((dff, d)) * 0.05, dt)
    b2 = jnp.zeros(d, dt)
    seed = jnp.asarray([7], jnp.int32)
    N_SHORT, N_LONG = 10, 110

    def bench(label, b, s, rate, bwd=True):
        x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.3, dt)
        zbias = jnp.zeros((b, d), dt)
        mask = jnp.zeros((b, s), jnp.float32)
        tile_b = pick_tile_b(b, s)

        def make(n):
            @jax.jit
            def chain(x):
                def body(carry, _):
                    def loss(xx):
                        out = fused_layer_train(
                            xx, zbias, ln, wqkv, bqkv, wo, bo, ln, w1, b1,
                            w2, b2, mask, seed, heads, tile_b, False, rate)
                        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
                    if bwd:
                        g = jax.grad(loss)(carry)
                        return (carry * 0.99 + g.astype(dt) * 0.01), None
                    out = fused_layer_train(
                        carry, zbias, ln, wqkv, bqkv, wo, bo, ln, w1, b1,
                        w2, b2, mask, seed, heads, tile_b, False, rate)
                    return (carry * 0.99 + out * 0.01).astype(dt), None
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
            print(f"{label}: {per*1e3:7.3f} ms/layer  (tile_b={tile_b})")
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}")

    # flagship D1 shapes: 1024 sequences
    bench("S=31 fwd+bwd dropout 0.1", 1024, 31, 0.1)
    bench("S=32 fwd+bwd dropout 0.1", 1024, 32, 0.1)
    bench("S=31 fwd+bwd dropout 0.0", 1024, 31, 0.0)
    bench("S=32 fwd+bwd dropout 0.0", 1024, 32, 0.0)
    bench("S=31 fwd only dropout 0.1", 1024, 31, 0.1, bwd=False)
    bench("S=32 fwd only dropout 0.1", 1024, 32, 0.1, bwd=False)


if __name__ == "__main__":
    main()
