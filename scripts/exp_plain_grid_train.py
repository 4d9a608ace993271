"""Experiment: does the training fused-layer kernel lower with a PLAIN grid
(seed as an SMEM scalar operand) where the PrefetchScalarGridSpec version
fails (any n_blocks > 1 / row tiles > 256 — see bench_layer_fwd_compare)?

If yes, the scalar-prefetch grid spec is what the remote Mosaic toolchain
chokes on, and switching unlocks bigger training tiles + attention
sub-blocking."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.ops.layer_vjp import _fwd_kernel

    b, s, d, dff, heads = 1024, 32, 256, 512, 8
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.3, dt)
    bias = jnp.zeros((b, d), dt)
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

    def plain_fwd(x, seed, tile_b, rate, attn_rows):
        rows = tile_b * s
        kernel = functools.partial(
            _fwd_kernel, n_heads=heads, seq_len=s, d_model=d, tile_b=tile_b,
            causal=False, rate=rate, interpret=False, attn_rows=attn_rows,
        )
        full = lambda shape: pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
            grid=(b // tile_b,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
                pl.BlockSpec((tile_b, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                full(ln1.shape), full(wqkv.shape), full(bqkv.shape),
                full(wo.shape), full(bo.shape), full(ln2.shape),
                full(w1.shape), full(b1.shape), full(w2.shape), full(b2.shape),
                pl.BlockSpec((1, 1, rows), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_b, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )(seed, x, bias.reshape(b, 1, d), ln1, wqkv, bqkv, wo, bo, ln2,
          w1, b1, w2, b2, mask.reshape(b // tile_b, 1, rows))

    N_SHORT, N_LONG = 10, 110

    def bench(label, tile_b, rate, attn_rows):
        def make(n):
            @jax.jit
            def chain(x):
                def body(carry, _):
                    return plain_fwd(carry, seed, tile_b, rate,
                                     attn_rows).astype(dt), None
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
            print(f"{label}: {per*1e3:7.3f} ms/layer-fwd")
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}")

    bench("plain grid tile  8 rate .1 attn 256", 8, 0.1, None)
    bench("plain grid tile  8 rate .1 attn 128", 8, 0.1, 128)
    bench("plain grid tile 16 rate .1 attn 256", 16, 0.1, 256)
    bench("plain grid tile 32 rate .1 attn 256", 32, 0.1, 256)

    # last structural difference vs the (multi-block-capable) inference
    # kernel: exact row-max softmax. swap in the clip form and retry
    import deepsvg_tpu.ops.layer_vjp as lv

    def _attn_clip(qkv, big_mask, h, d_model, head_dim, scale):
        q = qkv[:, h * head_dim : (h + 1) * head_dim]
        k = qkv[:, d_model + h * head_dim : d_model + (h + 1) * head_dim]
        v = qkv[:, 2 * d_model + h * head_dim : 2 * d_model + (h + 1) * head_dim]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        scores = jnp.clip(scores, -75.0, 75.0) + big_mask
        exp = jnp.exp(scores)
        p = exp / jnp.sum(exp, axis=-1, keepdims=True)
        return q, k, v, p

    lv._attn_fwd_head, orig = _attn_clip, lv._attn_fwd_head
    bench("CLIP-softmax tile 16 rate .1 attn 256", 16, 0.1, 256)
    bench("CLIP-softmax tile  8 rate .1 attn 128", 8, 0.1, 128)
    lv._attn_fwd_head = orig


if __name__ == "__main__":
    main()
