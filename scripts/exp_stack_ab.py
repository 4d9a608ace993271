"""On-chip A/B: fused multi-layer STACK kernels (ops/stack_vjp.py) vs the
composed per-layer fused kernels at the flagship E2/D2 stage shapes.

Checks (1) the stack kernels COMPILE on the real chip (interpret mode does
not validate Mosaic lowerability — docs/NOTES.md), (2) fwd+grad parity vs
the composed single-layer ops at dropout 0, (3) fwd+bwd timing both ways
at B=128 and B=60 (chained-scan method).

Run on the chip: python scripts/exp_stack_ab.py
"""
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

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.ops.layer_vjp import fused_layer_train
    from deepsvg_tpu.ops.stack_vjp import fused_stack_train

    rng = np.random.default_rng(0)
    d, dff, L, H, s = 256, 512, 4, 8, 8
    res = {}

    for B in (60,):
        x = jnp.asarray(rng.standard_normal((B, s, d)) * 0.3, jnp.bfloat16)
        biases = jnp.asarray(rng.standard_normal((L, B, d)) * 0.1, jnp.bfloat16)
        f = lambda *sh: jnp.asarray(rng.standard_normal(sh) * 0.03, jnp.float32)
        layers = [dict(ln1=jnp.stack([jnp.ones(d), jnp.zeros(d)]),
                       wqkv=f(d, 3 * d), bqkv=f(3 * d), wo=f(d, d), bo=f(d),
                       ln2=jnp.stack([jnp.ones(d), jnp.zeros(d)]),
                       w1=f(d, dff), b1=f(dff), w2=f(dff, d), b2=f(d))
                  for _ in range(L)]
        mask = jnp.zeros((B, s), jnp.float32)
        seed = jnp.asarray([0], jnp.int32)
        stk = lambda k: jnp.stack([l[k] for l in layers])
        row = lambda k: jnp.stack([l[k] for l in layers])[:, None, :]
        sargs = (stk("ln1"), stk("wqkv"), row("bqkv"), stk("wo"), row("bo"),
                 stk("ln2"), stk("w1"), row("b1"), stk("w2"), row("b2"))

        def stack_loss(x, rate):
            return jnp.sum(fused_stack_train(
                x, biases, *sargs, mask, seed, H, False, rate).astype(jnp.float32) ** 2)

        def single_loss(x, rate):
            y = x
            for li, l in enumerate(layers):
                y = fused_layer_train(
                    y, biases[li], l["ln1"], l["wqkv"], l["bqkv"], l["wo"],
                    l["bo"], l["ln2"], l["w1"], l["b1"], l["w2"], l["b2"],
                    mask, seed, H, min(B, 32), False, rate)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        # parity at rate 0 (different dropout sites preclude rate>0 parity)
        gs = jax.jit(jax.grad(functools.partial(stack_loss, rate=0.0)))
        gl = jax.jit(jax.grad(functools.partial(single_loss, rate=0.0)))
        a, b = np.asarray(gs(x), np.float32), np.asarray(gl(x), np.float32)
        denom = max(np.abs(b).max(), 1e-6)
        rel = np.abs(a - b).max() / denom
        ls, ll = float(jax.jit(functools.partial(stack_loss, rate=0.0))(x)), \
                 float(jax.jit(functools.partial(single_loss, rate=0.0))(x))
        res[f"B{B}_grad_relmax"] = float(rel)
        res[f"B{B}_loss_rel"] = abs(ls - ll) / max(abs(ll), 1e-9)
        print(f"B={B}: loss stack {ls:.4f} vs single {ll:.4f}; "
              f"dgrad relmax {rel:.3e}", flush=True)

        # timing: fwd+bwd chained-scan difference (docs/PERFORMANCE.md)
        def chain(g, x0, n):
            def body(c, _):
                return c - jnp.asarray(1e-6, c.dtype) * g(c), None
            return jax.lax.scan(body, x0, None, length=n)[0]

        for name, lossf in (("stack", stack_loss), ("single", single_loss)):
            g = jax.grad(functools.partial(lossf, rate=0.1))
            cf = jax.jit(functools.partial(chain, g), static_argnums=(2,))
            run = lambda n: float(jnp.sum(cf(x, n).astype(jnp.float32)))
            run(1); run(33)  # compile both lengths
            b1 = bN = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); run(1)
                b1 = min(b1, time.perf_counter() - t0)
                t0 = time.perf_counter(); run(33)
                bN = min(bN, time.perf_counter() - t0)
            ms = (bN - b1) / 32 * 1e3
            res[f"B{B}_{name}_ms"] = round(ms, 4)
            print(f"B={B} {name}: {ms:.4f} ms fwd+bwd for the {L}L stack",
                  flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
