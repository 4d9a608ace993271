"""On-chip gradient check for the fused training layer after a kernel
change: fused_layer_train (Pallas fwd+bwd, dropout off) vs the plain XLA
formulation, at flagship training shapes. CPU equivalence is covered by
tests/test_ops.py::TestFusedLayerTrain — this validates the REAL Mosaic
lowering (interpret mode does not catch lowering-only bugs)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.models.layers import layer_norm
    from deepsvg_tpu.ops.attention import mha_reference
    from deepsvg_tpu.ops.layer_vjp import fused_layer_train

    b, s, d, dff, heads = 256, 32, 256, 512, 8
    rng = np.random.default_rng(0)
    f = jnp.float32
    x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.3, f)
    bias = jnp.asarray(rng.standard_normal((b, d)) * 0.1, f)
    ln1 = jnp.stack([jnp.ones(d), jnp.zeros(d)]).astype(f)
    ln2 = jnp.stack([1 + 0.1 * jnp.asarray(rng.standard_normal(d), f),
                     0.1 * jnp.asarray(rng.standard_normal(d), f)])
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, f)
    bqkv = jnp.zeros(3 * d, f)
    wo = jnp.asarray(rng.standard_normal((d, d)) * 0.05, f)
    bo = jnp.zeros(d, f)
    w1 = jnp.asarray(rng.standard_normal((d, dff)) * 0.05, f)
    b1 = jnp.zeros(dff, f)
    w2 = jnp.asarray(rng.standard_normal((dff, d)) * 0.05, f)
    b2 = jnp.zeros(d, f)
    keypad = np.zeros((b, s), np.float32)
    keypad[:, 28:] = -np.inf          # exercise key padding
    mask = jnp.asarray(keypad)
    seed = jnp.asarray([7], jnp.int32)

    weights = (wqkv, bqkv, wo, bo, w1, b1, w2, b2)

    @jax.jit
    def loss_fused(x, bias, weights):
        wqkv, bqkv, wo, bo, w1, b1, w2, b2 = weights
        out = fused_layer_train(x, bias, ln1, wqkv, bqkv, wo, bo, ln2,
                                w1, b1, w2, b2, mask, seed, heads, 8,
                                False, 0.0)
        return jnp.sum(out.astype(f) ** 2) * 1e-4

    @jax.jit
    def loss_xla(x, bias, weights):
        wqkv, bqkv, wo, bo, w1, b1, w2, b2 = weights
        xf = x.astype(f)
        xn = layer_norm(xf, ln1)
        a = mha_reference(xn, wqkv, bqkv, wo, bo, mask, heads, causal=False)
        xf = xf + a + bias[:, None, :].astype(f)
        xn2 = layer_norm(xf, ln2)
        h = jnp.maximum(xn2 @ w1 + b1, 0.0)
        out = xf + (h @ w2 + b2)
        return jnp.sum(out ** 2) * 1e-4

    import contextlib
    ctx = (jax.default_matmul_precision("float32")
           if __import__("os").environ.get("F32") else contextlib.nullcontext())
    with ctx:
        run_cmp(x, bias, weights, loss_fused, loss_xla)


def run_cmp(x, bias, weights, loss_fused, loss_xla):
    import jax
    import jax.numpy as jnp

    for name, fn in [("fused", loss_fused), ("xla  ", loss_xla)]:
        v, g = jax.value_and_grad(fn, argnums=(0, 1, 2))(x, bias, weights)
        print(f"{name} loss {float(v):.6f}")
        if name == "fused":
            vf, gf = v, g
        else:
            rel = lambda a, b: float(
                jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
            print("loss rel diff :", abs(float(vf - v)) / abs(float(v)))
            print("dx   rel diff :", rel(gf[0], g[0]))
            print("dbias rel diff:", rel(gf[1], g[1]))
            for i, nm in enumerate("wqkv bqkv wo bo w1 b1 w2 b2".split()):
                print(f"d{nm:5s} rel  :", rel(gf[2][i], g[2][i]))


if __name__ == "__main__":
    main()
