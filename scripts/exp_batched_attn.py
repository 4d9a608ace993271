"""Batched-attention layer-kernel prototype: can rank-3 dot_general kill the
4x masked-lane softmax waste?

The production training kernel (ops/layer_vjp.py) computes attention on
[attn_rows=128, 128] score blocks where only the 32-wide block-diagonal is
valid: exp/max/sum run on 4x more lanes than needed, and
scripts/exp_layer_decomp.py measured softmax as the #1 non-MXU component
(0.23 ms fwd / 0.34 ms bwd per layer). Mosaic lowers batched (rank-3)
dot_general, so attention can instead run per sequence: scores
[n_seq, S, S], softmax width S=32.

This prototypes the FORWARD layer kernel both ways (rate=0, no injection)
and times them at flagship training shapes. If the batched form wins,
promote it into ops/layer_vjp.py (fwd + bwd).

Run on the chip: python scripts/exp_batched_attn.py
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.ops import layer_vjp as lv

    b, s, d, dff, heads = 1024, 32, 256, 512, 8
    hd = d // heads
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

    # ---- batched-attention forward kernel ----------------------------------
    def fwd_kernel_batched(
        x_ref, bias_ref, ln1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
        ln2_ref, w1_ref, b1_ref, w2_ref, b2_ref, mask_ref, out_ref,
        *, n_heads, seq_len, d_model, tile_b, causal,
    ):
        head_dim = d_model // n_heads
        rows = tile_b * seq_len
        scale = head_dim ** -0.5
        dtype = x_ref.dtype

        x0 = x_ref[:].reshape(rows, d_model).astype(jnp.float32)
        ln1 = ln1_ref[:].astype(jnp.float32)
        xn1_f, _, _ = lv._ln_fwd(x0, ln1[0:1], ln1[1:2])
        xn1 = xn1_f.astype(dtype)

        qkv = jnp.dot(xn1, wqkv_ref[:], preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(dtype)

        # additive key mask per sequence: [tile_b, 1, S]
        am = mask_ref[:].reshape(tile_b, 1, seq_len)
        if causal:
            r = jax.lax.broadcasted_iota(jnp.int32, (1, seq_len, seq_len), 1)
            c = jax.lax.broadcasted_iota(jnp.int32, (1, seq_len, seq_len), 2)
            am = am + jnp.where(c <= r, 0.0, -jnp.inf)

        ctx_heads = []
        for h in range(n_heads):
            q = qkv[:, h * head_dim:(h + 1) * head_dim]
            k = qkv[:, d_model + h * head_dim:d_model + (h + 1) * head_dim]
            v = qkv[:, 2 * d_model + h * head_dim:2 * d_model + (h + 1) * head_dim]
            qb = q.reshape(tile_b, seq_len, head_dim)
            kb = k.reshape(tile_b, seq_len, head_dim)
            vb = v.reshape(tile_b, seq_len, head_dim)
            sc = jax.lax.dot_general(
                qb, kb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale + am
            m = jnp.maximum(jnp.max(sc, axis=-1, keepdims=True), -1e30)
            e = jnp.exp(sc - m)
            den = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
            p = (e / den).astype(dtype)
            ctx_h = jax.lax.dot_general(
                p, vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            ctx_heads.append(ctx_h.astype(dtype).reshape(rows, head_dim))
        ctx = jnp.concatenate(ctx_heads, axis=1)

        a = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
        a = a + bo_ref[:].astype(jnp.float32)

        inj = bias_ref[:, 0, :].astype(jnp.float32)
        x1 = x0 + a + jnp.broadcast_to(
            inj[:, None, :], (tile_b, seq_len, d_model)).reshape(rows, d_model)

        ln2 = ln2_ref[:].astype(jnp.float32)
        xn2_f, _, _ = lv._ln_fwd(x1, ln2[0:1], ln2[1:2])
        xn2 = xn2_f.astype(dtype)
        hpre = jnp.dot(xn2, w1_ref[:], preferred_element_type=jnp.float32)
        hpre = hpre + b1_ref[:].astype(jnp.float32)
        h_act = jnp.maximum(hpre, 0.0)
        f = jnp.dot(h_act.astype(dtype), w2_ref[:],
                    preferred_element_type=jnp.float32)
        f = f + b2_ref[:].astype(jnp.float32)
        out_ref[:] = (x1 + f).astype(dtype).reshape(tile_b, seq_len, d_model)

    def fwd_call_batched(x, bias, *, tile_b):
        bsz, ss, dd = x.shape
        kernel = functools.partial(
            fwd_kernel_batched, n_heads=heads, seq_len=ss, d_model=dd,
            tile_b=tile_b, causal=False)
        full = lambda shp: pl.BlockSpec(
            shp, lambda i: tuple(0 for _ in shp), memory_space=pltpu.VMEM)
        grid_spec = pl.GridSpec(
            grid=(bsz // tile_b,),
            in_specs=[
                pl.BlockSpec((tile_b, ss, dd), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, 1, dd), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                full(ln.shape), full(wqkv.shape), full(bqkv.shape),
                full(wo.shape), full(bo.shape), full(ln.shape),
                full(w1.shape), full(b1.shape), full(w2.shape),
                full(b2.shape),
                pl.BlockSpec((tile_b, ss), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_b, ss, dd), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((bsz, ss, dd), x.dtype),
            grid_spec=grid_spec,
        )(x, bias.reshape(bsz, 1, dd), *weights, mask)

    # ---- timing -------------------------------------------------------------
    N_SHORT, N_LONG = 10, 110

    def timed(make_chain):
        f_s, f_l = make_chain(N_SHORT), make_chain(N_LONG)
        float(jnp.sum(f_s(x))); float(jnp.sum(f_l(x)))
        best_s = best_l = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(jnp.sum(f_s(x)))
            best_s = min(best_s, time.perf_counter() - t0)
            t0 = time.perf_counter(); float(jnp.sum(f_l(x)))
            best_l = min(best_l, time.perf_counter() - t0)
        return (best_l - best_s) / (N_LONG - N_SHORT) * 1e3

    def chain_current(tile_b):
        def make(n):
            @jax.jit
            def chain(x0):
                def body(c, _):
                    return lv._layer_fwd_call(
                        seed, c, bias, *weights, mask, heads, tile_b, False,
                        0.0, False), None
                out, _ = jax.lax.scan(body, x0, None, length=n)
                return out
            return chain
        return make

    def chain_batched(tile_b):
        def make(n):
            @jax.jit
            def chain(x0):
                def body(c, _):
                    return fwd_call_batched(c, bias, tile_b=tile_b), None
                out, _ = jax.lax.scan(body, x0, None, length=n)
                return out
            return chain
        return make

    results = {}
    t = timed(chain_current(8))
    results["current_tile8"] = round(t, 4)
    print(f"current  (256-row tile) fwd {t:7.3f} ms", flush=True)
    for tile_b in (8, 16, 32):
        try:
            t = timed(chain_batched(tile_b))
            results[f"batched_tile{tile_b}"] = round(t, 4)
            print(f"batched  ({tile_b*32}-row tile) fwd {t:7.3f} ms", flush=True)
        except Exception as e:  # lowering failures are a result too
            results[f"batched_tile{tile_b}"] = f"FAIL: {type(e).__name__}"
            print(f"batched  ({tile_b*32}-row tile) FAILED: {e}"[:300],
                  flush=True)

    # numerics check vs production kernel (rate 0 -> deterministic)
    ref = lv._layer_fwd_call(seed, x, bias, *weights, mask, heads, 8, False,
                             0.0, False)
    got = fwd_call_batched(x, bias, tile_b=8)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                ref.astype(jnp.float32))))
    print(f"max |batched - current| = {err:.3e}")
    results["max_abs_err_vs_current"] = err

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "batched_attn_fwd.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
