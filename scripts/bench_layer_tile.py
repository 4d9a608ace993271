"""Microbenchmark: fused layer kernel per-layer time vs row-tile size.

The packed block-diagonal attention trades MXU shape (more rows per matmul)
against quadratically growing masked-out score FLOPs; ~35% MXU utilization
measured at the default 256 rows (xplane trace, scripts/trace_inference.py).
This sweeps tile_b at the flagship bench shapes to find the knee.
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

    from deepsvg_tpu.ops.layer import fused_layer

    B, S, D, H, DFF = 8192, 32, 256, 8, 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)

    def init(*s, dtype=jnp.bfloat16):
        return jnp.asarray(rng.normal(size=s) * 0.05, dtype)

    wqkv, bqkv = init(D, 3 * D), init(3 * D)
    wo, bo = init(D, D), init(D)
    w1, b1 = init(D, DFF), init(DFF)
    w2, b2 = init(DFF, D), init(D)
    ln1 = jnp.stack([jnp.ones((D,)), jnp.zeros((D,))]).astype(jnp.float32)
    ln2 = ln1
    mask = jnp.zeros((B, S), jnp.float32)
    seq_bias = init(B, D)

    @functools.partial(jax.jit, static_argnums=(1, 2, 3))
    def chain(x, tile_b, attn_rows, n):
        def body(h, _):
            h = fused_layer(h, seq_bias, ln1, wqkv, bqkv, wo, bo, ln2,
                            w1, b1, w2, b2, mask, n_heads=H, tile_b=tile_b,
                            attn_rows=attn_rows)
            return h, None
        h, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(h.astype(jnp.float32))

    def timed(tile_b, attn_rows=None, n=20, reps=3):
        np.asarray(chain(x, tile_b, attn_rows, 1))
        b1 = bn = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); np.asarray(chain(x, tile_b, attn_rows, 1))
            b1 = min(b1, time.perf_counter() - t0)
        for _ in range(reps):
            t0 = time.perf_counter(); np.asarray(chain(x, tile_b, attn_rows, 1 + n))
            bn = min(bn, time.perf_counter() - t0)
        return (bn - b1) / n

    # (tile_b, attn_rows): attn_rows=None couples attention to the full tile
    # (round-1 behavior); smaller attn_rows cut the packed score waste while
    # keeping big dense-matmul tiles
    combos = [(4, None), (8, None), (16, None), (32, None),
              (8, 128), (16, 128), (16, 256), (32, 128), (32, 256), (64, 128)]
    for tile_b, attn_rows in combos:
        try:
            t = timed(tile_b, attn_rows)
            print(f"tile_b={tile_b:<3d} rows={tile_b*S:<5d} "
                  f"attn_rows={attn_rows or tile_b*S:<5d} "
                  f"{t*1e3:7.3f} ms/layer  "
                  f"({B*S/t/1e6:.0f} Mtok/s)", flush=True)
        except Exception as e:
            print(f"tile_b={tile_b:<3d} attn_rows={attn_rows} FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
