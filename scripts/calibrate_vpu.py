"""Calibrate the VPU floor constants with measured microbenchmarks.

docs/sol_table.json's VPU floor divides counted elementwise ops by a GUESSED
``peak_vpu_ops_estimate = 4e12`` (VERDICT r3: "the 'at the floor' claim rests
on an uncalibrated estimate"). This measures the actual per-element cost of
the three VPU-dominant stages of the fused training layer — LayerNorm,
softmax, dropout-mask generation — as standalone Pallas kernels at the
training tile shapes (256 packed rows resident in VMEM, bf16 in / f32 math,
exactly like ops/layer_vjp.py).

Method: each kernel applies its stage K times in a chained in-kernel loop
(iteration k feeds k+1, so nothing CSEs or parallelizes away), for K_LO and
K_HI; the cost of ONE application is the (K_HI - K_LO)-normalized slope —
HBM traffic and kernel launch are identical between the two and cancel.
The whole grid (128 tiles) runs per call so the measurement includes real
grid scheduling.

Writes docs/vpu_calibration.json:
  {"ln_fwd_ns_per_elem": ..., "ln_fwdbwd_ns_per_elem": ...,
   "softmax_fwd_ns_per_elem": ..., "softmax_fwdbwd_ns_per_elem": ...,
   "dropout_mask_ns_per_elem": ..., "implied_vpu_ops_per_s": {...}}

scripts/sol_table.py consumes this file when present (measured VPU floor);
without it the table falls back to the 4e12 estimate.

Run on the chip: python scripts/calibrate_vpu.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 256          # packed rows per tile, the production tile_b=8 x S=32
LANES = 256         # d_model; softmax runs at the score width it sees (S-pad)
N_TILES = 128       # whole-grid measurement: B*S rows / ROWS at flagship
# wide K span: the slope signal must clear the axon relay's per-call timing
# noise (~1 ms jitter even min-of-8: K=1..17 measured NEGATIVE slopes, and
# K=4..132's ~1.6 ms of LN signal was still unstable). The chain runs as an
# in-kernel lax.fori_loop so 2048 applications (~50 ms of signal) compile
# without unrolling.
K_LO, K_HI = 16, 2064


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.ops.layer_vjp import _ln_bwd, _ln_fwd

    interpret = jax.default_backend() == "cpu"

    def run_kernel(body_k, lanes, k):
        """Grid of N_TILES; each program loads one (ROWS, lanes) bf16 tile
        and applies ``body_k`` k times, chained."""
        def kernel(x_ref, o_ref):
            x = x_ref[:].astype(jnp.float32)
            x = jax.lax.fori_loop(0, k, lambda i, v: body_k(v, i), x)
            o_ref[:] = x.astype(o_ref.dtype)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N_TILES * ROWS, lanes),
                                           jnp.bfloat16),
            grid=(N_TILES,),
            in_specs=[pl.BlockSpec((ROWS, lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )

    def slope_ms(body_k, lanes, reps=8):
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (N_TILES * ROWS, lanes)) * 0.5, jnp.bfloat16)
        f_lo = jax.jit(run_kernel(body_k, lanes, K_LO))
        f_hi = jax.jit(run_kernel(body_k, lanes, K_HI))
        float(jnp.sum(f_lo(x).astype(jnp.float32)))
        float(jnp.sum(f_hi(x).astype(jnp.float32)))
        b_lo = b_hi = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(f_lo(x).astype(jnp.float32)))
            b_lo = min(b_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jnp.sum(f_hi(x).astype(jnp.float32)))
            b_hi = min(b_hi, time.perf_counter() - t0)
        return (b_hi - b_lo) / (K_HI - K_LO) * 1e3  # ms per application

    # scalar scale/bias (python floats broadcast in-kernel; passing arrays
    # would be captured constants, which pallas_call rejects)
    # --- LayerNorm forward: one application over (ROWS, LANES) -------------
    def ln_fwd_body(x, i):
        out, _, _ = _ln_fwd(x + i * jnp.float32(1e-3), 1.0, 0.0)
        return out

    # --- LayerNorm fwd+bwd math (what the recomputing backward pays) -------
    def ln_fwdbwd_body(x, i):
        out, xhat, rstd = _ln_fwd(x + i * jnp.float32(1e-3), 1.0, 0.0)
        dx, _, _ = _ln_bwd(out, xhat, rstd, 1.0)
        return dx

    # --- softmax forward over the last dim (guarded, like the kernels) -----
    def softmax_body(x, i):
        s = x + i * jnp.float32(1e-3)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
        e = jnp.exp(s - m)
        return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)

    # --- softmax fwd + bwd (ds = p * (dp - sum(dp*p))) ----------------------
    def softmax_fwdbwd_body(x, i):
        p = softmax_body(x, i)
        return p * (x - jnp.sum(x * p, axis=-1, keepdims=True))

    results = {}
    t = slope_ms(ln_fwd_body, LANES)
    results["ln_fwd_ns_per_elem"] = t * 1e6 / (N_TILES * ROWS * LANES)
    print(f"LN fwd:          {t:7.4f} ms/app  "
          f"{results['ln_fwd_ns_per_elem']*1e3:7.2f} ps/elem", flush=True)

    t = slope_ms(ln_fwdbwd_body, LANES)
    results["ln_fwdbwd_ns_per_elem"] = t * 1e6 / (N_TILES * ROWS * LANES)
    print(f"LN fwd+bwd:      {t:7.4f} ms/app  "
          f"{results['ln_fwdbwd_ns_per_elem']*1e3:7.2f} ps/elem", flush=True)

    # softmax at the attention score width the training kernel sees: the
    # sub-blocked form reduces over attn_rows=128 lanes, the batched form
    # over S=32 (padded); measure at 128 (production sub-block pick)
    for lanes, tag in ((128, "softmax_fwd"), (256, "softmax_fwd_256")):
        t = slope_ms(softmax_body, lanes)
        results[f"{tag}_ns_per_elem"] = t * 1e6 / (N_TILES * ROWS * lanes)
        print(f"{tag:16s} {t:7.4f} ms/app  "
              f"{results[f'{tag}_ns_per_elem']*1e3:7.2f} ps/elem", flush=True)

    t = slope_ms(softmax_fwdbwd_body, 128)
    results["softmax_fwdbwd_ns_per_elem"] = t * 1e6 / (N_TILES * ROWS * 128)
    print(f"softmax fwd+bwd: {t:7.4f} ms/app  "
          f"{results['softmax_fwdbwd_ns_per_elem']*1e3:7.2f} ps/elem",
          flush=True)

    # --- dropout mask generation (on-chip PRNG draw + threshold + scale) ---
    # separate kernel: prng_seed once, k chained draws at distinct sites
    def dropout_kernel(k):
        def kernel(seed_ref, x_ref, o_ref):
            pid = pl.program_id(0)

            def draw(i, x):
                if interpret:
                    r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
                    c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
                    u = jnp.sin((r * 12.9898 + c * 78.233
                                 + (seed_ref[0] * 131 + i) * 37.719)
                                .astype(jnp.float32)) * 43758.5453
                    u = u - jnp.floor(u)
                else:
                    pltpu.prng_seed(seed_ref[0], pid * 997 + i)
                    bits = pltpu.prng_random_bits(x.shape)
                    top24 = pltpu.bitcast(
                        pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
                    u = top24.astype(jnp.float32) * (1.0 / (1 << 24))
                return x * (u >= 0.1).astype(jnp.float32) * (1.0 / 0.9)

            x = jax.lax.fori_loop(0, k, draw, x_ref[:].astype(jnp.float32))
            o_ref[:] = x.astype(o_ref.dtype)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N_TILES,),
            in_specs=[pl.BlockSpec((ROWS, LANES), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N_TILES * ROWS, LANES),
                                           jnp.bfloat16),
            grid_spec=grid_spec,
            interpret=interpret,
        )

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (N_TILES * ROWS, LANES)) * 0.5, jnp.bfloat16)
    seed = jnp.asarray([7], jnp.int32)
    f_lo = jax.jit(dropout_kernel(K_LO))
    f_hi = jax.jit(dropout_kernel(K_HI))
    float(jnp.sum(f_lo(seed, x).astype(jnp.float32)))
    float(jnp.sum(f_hi(seed, x).astype(jnp.float32)))
    b_lo = b_hi = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        float(jnp.sum(f_lo(seed, x).astype(jnp.float32)))
        b_lo = min(b_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(jnp.sum(f_hi(seed, x).astype(jnp.float32)))
        b_hi = min(b_hi, time.perf_counter() - t0)
    t = (b_hi - b_lo) / (K_HI - K_LO) * 1e3
    results["dropout_mask_ns_per_elem"] = t * 1e6 / (N_TILES * ROWS * LANES)
    print(f"dropout mask:    {t:7.4f} ms/app  "
          f"{results['dropout_mask_ns_per_elem']*1e3:7.2f} ps/elem",
          flush=True)

    # implied effective VPU rates under sol_table's op-count conventions
    # (12 ops/elem LN, 10 softmax, 34 dropout) — how good the 4e12 guess was
    results["implied_vpu_ops_per_s"] = {
        "ln_fwd_at_12ops": 12 / (results["ln_fwd_ns_per_elem"] * 1e-9),
        "softmax_at_10ops": 10 / (results["softmax_fwd_ns_per_elem"] * 1e-9),
        "dropout_at_34ops": 34 / (results["dropout_mask_ns_per_elem"] * 1e-9),
    }
    results["shapes"] = {"rows": ROWS, "lanes": LANES, "n_tiles": N_TILES,
                         "k_lo": K_LO, "k_hi": K_HI}

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "vpu_calibration.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")
    print(json.dumps(results["implied_vpu_ops_per_s"], indent=1))


if __name__ == "__main__":
    main()
