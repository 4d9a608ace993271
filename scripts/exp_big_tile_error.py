"""Surface the actual Mosaic error for the >512-row training-tile lowering
failures (dense tile 1024 rows + attn 128/256; 512 + 256), which previously
died as a swallowed `tpu_compile_helper exit 1`. Prints the full exception.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import traceback

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

    for tile_seqs, attn_rows in [(16, 256), (32, 128), (32, 256)]:
        label = f"tile {tile_seqs*s} rows, attn {attn_rows}"
        try:
            @jax.jit
            def run(x):
                def loss(xx):
                    out = fused_layer_train(
                        xx, zbias, ln, wqkv, bqkv, wo, bo, ln, w1, b1,
                        w2, b2, mask, seed, heads, tile_seqs, False, 0.1,
                        attn_rows)
                    return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
                return jax.grad(loss)(x).sum()
            print(f"{label}: OK value={float(run(x)):.5f}")
        except Exception:
            tb = traceback.format_exc()
            print(f"{label}: FAILED\n{tb[-3000:]}\n{'='*70}")


if __name__ == "__main__":
    main()
