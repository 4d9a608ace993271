"""How much of the big-stage training layer is DROPOUT?

The fused training layers draw dropout masks from the on-chip PRNG
(ops/layer.py: threefry lanes inside the kernel). threefry-2x32 is ~30
vector ops per 32-bit output, and training applies dropout to every
activation the reference drops (attention output, FF inner, FF output) —
the sol_table VPU model says that could be ~0.7 ms/layer of the measured
~2.2 ms/layer fwd+bwd. This times the 4-layer E1 stack fwd+bwd with
dropout 0.1 vs 0.0 (same kernels, the rate is a runtime scalar) to get the
true number, plus the xla lowering for reference.

Run on the chip: python scripts/exp_dropout_cost.py
"""
from __future__ import annotations

import functools
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

    from deepsvg_tpu.models.layers import EncoderStack

    B, S, D, DFF, H, NL = 1024, 32, 256, 512, 8, 4
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, S, D)),
                    jnp.bfloat16)

    def timed(fn, args, n=10, reps=3):
        np.asarray(fn(*args, 1))
        b1 = bn = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args, 1))
            b1 = min(b1, time.perf_counter() - t0)
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args, 1 + n))
            bn = min(bn, time.perf_counter() - t0)
        return (bn - b1) / n

    for impl in ("pallas", "xla"):
        for rate in (0.1, 0.0):
            mod = EncoderStack(NL, D, H, DFF, rate, dtype=jnp.bfloat16,
                               attn_impl=impl)
            params = mod.init({"params": key, "dropout": key}, x,
                              deterministic=False)

            @functools.partial(jax.jit, static_argnums=(2,))
            def chain(p, xx, n, mod=mod):
                def body(carry, i):
                    x0 = xx + carry.astype(xx.dtype)
                    def lf(pp):
                        out = mod.apply(
                            pp, x0, deterministic=False,
                            rngs={"dropout": jax.random.fold_in(key, i)})
                        return jnp.sum(out.astype(jnp.float32)) * 1e-6
                    l, g = jax.value_and_grad(lf)(p)
                    gs = sum(jnp.sum(t.astype(jnp.float32))
                             for t in jax.tree.leaves(g))
                    return (l + gs) * 1e-20, None
                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
                return acc

            t = timed(chain, (params, x))
            print(f"{impl:6s} dropout={rate}: {t*1e3:6.3f} ms "
                  f"({t*1e3/NL:.3f} ms/layer fwd+bwd)")


if __name__ == "__main__":
    main()
