"""Account the sol-table "glue": full step minus the measured components.

docs/sol_table.json covers the seven big components (stacks, embedding,
args-CE head, optimizer); the full step runs ~3 ms past their sum
(VERDICT r3 Weak #2c / r4 Weak #3: "trace the glue"). This measures the
remaining model pieces DIRECTLY, same chained-scan method at flagship
shapes (B=128, G=8, S=30, bf16, pallas backend):

  fb_only       loss fwd+bwd without the optimizer update
  masks_pools   int masks (padding/visibility/key-pad) + the two masked
                mean-pools of the encoder, fwd+bwd through the pools
  neck          ResNet(4 dense) + linear bottleneck + D2 latent expansion
                glue (dense layers between the stacks), fwd+bwd
  heads_rest    const-embedding queries + HierarchFCN (visibility+latent)
                + cmd-head matmul + cmd/visibility CE + loss masking and
                normalizers — i.e. svg_loss minus the args-CE row, fwd+bwd

full − (components + these) is then pure dispatch/fusion-boundary overhead.
Writes docs/glue_decomp.json. Run on the chip: python scripts/glue_decomp.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, G, S, D, DZ, NL = 128, 8, 30, 256, 256, 4
N_ARGS, VOCAB, N_CMDS = 11, 257, 7


def timed(fn, args, n=10, reps=3):
    np.asarray(fn(*args, 1))
    best1 = bestn = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args, 1))
        best1 = min(best1, time.perf_counter() - t0)
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args, 1 + n))
        bestn = min(bestn, time.perf_counter() - t0)
    return (bestn - best1) / n


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.models.model import Bottleneck, HierarchFCN, ResNet
    import deepsvg_tpu.svgtensor.masks as M
    from deepsvg_tpu.training.trainer import (create_train_state,
                                              make_optimizer, train_step)
    from deepsvg_tpu.models.loss import svg_loss

    cfg = ModelConfig(encode_stages=2, decode_stages=2, use_vae=False,
                      compute_dtype="bfloat16", attention_impl="pallas",
                      dropout=0.1)
    model = SVGTransformer(cfg)
    model_args = ["commands", "args"] * 2
    rng = np.random.default_rng(0)
    b = generate_batch(rng, B, G, S)
    data = {"commands": jnp.asarray(b["commands"]),
            "args": jnp.asarray(b["args"])}
    optimizer = make_optimizer(optax.constant_schedule(1e-3))
    state = create_train_state(model, optimizer, data, model_args)
    weights = dict(kl_tolerance=0.1, loss_kl_weight=1.0,
                   loss_visibility_weight=1.0, loss_cmd_weight=1.0,
                   loss_args_weight=2.0)
    key = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    out = {}

    # ---- full step & loss-grad-only --------------------------------------
    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_full(st, d, n):
        def body(s, _):
            s, res = train_step(s, d, weights, model, optimizer, model_args)
            return s, res["loss"]
        _, losses = jax.lax.scan(body, st, None, length=n)
        return losses[-1]

    out["full_step_ms"] = timed(chain_full, (state, data)) * 1e3

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_fb(p, d, n):
        def body(carry, i):
            def lf(pp):
                o = model.apply(
                    {"params": pp}, *[d[k] for k in model_args],
                    deterministic=False,
                    rngs={"dropout": jax.random.fold_in(key, i)},
                    fused_ce=True)
                return svg_loss(o, weights, model.cfg)["loss"]
            l, g = jax.value_and_grad(lf)(p)
            gs = sum(jnp.sum(t.astype(jnp.float32))
                     for t in jax.tree.leaves(g))
            return carry + (l + gs) * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return acc

    out["fb_only_ms"] = timed(chain_fb, (state.params, data)) * 1e3

    # ---- masks + the two masked mean-pools --------------------------------
    mem1 = jnp.asarray(rng.standard_normal((B * G, S + 2, D)), bf)
    mem2 = jnp.asarray(rng.standard_normal((B, G, D)), bf)

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain_masks(c, m1, m2, n):
        def body(carry, _):
            m1c = m1 + carry.astype(m1.dtype)
            def lf(m1x, m2x):
                cf = c.reshape(B * G, S + 2)
                pad = M.padding_mask(cf)
                kp = M.key_padding_mask(cf)
                vis = M.visibility_mask(c.reshape(B, G, S + 2))
                z1 = (jnp.sum(m1x * pad[..., None], 1)
                      / jnp.maximum(jnp.sum(pad, 1, keepdims=True), 1.0))
                vf = vis.astype(m2x.dtype)
                z2 = (jnp.sum(m2x * vf[..., None], 1)
                      / jnp.maximum(jnp.sum(vf, 1, keepdims=True), 1.0))
                return (jnp.sum(z1.astype(jnp.float32))
                        + jnp.sum(z2.astype(jnp.float32))
                        + jnp.sum(kp.astype(jnp.float32))) * 1e-6
            l, gs = jax.value_and_grad(lf, argnums=(0, 1))(m1c, m2)
            g = sum(jnp.sum(t.astype(jnp.float32)) for t in gs)
            return (l + g) * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    cmds3 = data["commands"]
    out["masks_pools_ms"] = timed(
        chain_masks, (cmds3, mem1, mem2)) * 1e3

    # ---- resnet + bottleneck + D2 latent glue -----------------------------
    neck = ResNet(D, bf)
    neckp = neck.init(key, mem2[:, 0, :])
    bott = Bottleneck(DZ, bf)
    bottp = bott.init(key, mem2[:, 0, :])

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_neck(ps, x, n):
        def body(carry, _):
            x0 = x + carry.astype(x.dtype)
            def lf(pp):
                z = bott.apply(pp[1], neck.apply(pp[0], x0))
                return jnp.sum(z.astype(jnp.float32)) * 1e-6
            l, g = jax.value_and_grad(lf)(ps)
            gs = sum(jnp.sum(t.astype(jnp.float32))
                     for t in jax.tree.leaves(g))
            return (l + gs) * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    out["neck_ms"] = timed(chain_neck, ((neckp, bottp), mem2[:, 0, :])) * 1e3

    # ---- remaining heads: HierarchFCN + cmd head + cmd/vis CE -------------
    hfcn = HierarchFCN(DZ, bf)
    hp = hfcn.init(key, mem2)
    wc = jnp.asarray(rng.standard_normal((D, N_CMDS)), bf) * 0.02
    bc = jnp.zeros((N_CMDS,), bf)
    y1 = jnp.asarray(rng.standard_normal((B * G, S + 1, D)), bf)
    tgt_cmd = jnp.asarray(rng.integers(0, N_CMDS, (B * G, S + 1)), jnp.int32)
    tgt_vis = jnp.asarray(rng.integers(0, 2, (B, G)), jnp.int32)
    padw = jnp.asarray(rng.random((B * G, S + 1)) > 0.3, jnp.float32)

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain_heads(hp, y, m2, n):
        def body(carry, _):
            y0 = y + carry.astype(y.dtype)
            def lf(args_):
                hpp, yy = args_
                vis_l, zg = hfcn.apply(hpp, m2)
                cmd_l = yy @ wc + bc
                cl = cmd_l.astype(jnp.float32)
                ce_cmd = (optax.softmax_cross_entropy_with_integer_labels(
                    cl, tgt_cmd) * padw).sum() / jnp.maximum(padw.sum(), 1.)
                vl = vis_l.astype(jnp.float32)
                ce_vis = optax.softmax_cross_entropy_with_integer_labels(
                    vl, tgt_vis).mean()
                return (ce_cmd + ce_vis
                        + jnp.sum(zg.astype(jnp.float32)) * 1e-6)
            l, g = jax.value_and_grad(lf)((hp, y0))
            gs = sum(jnp.sum(t.astype(jnp.float32))
                     for t in jax.tree.leaves(g))
            return (l + gs) * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    out["heads_rest_ms"] = timed(chain_heads, (hp, y1, mem2)) * 1e3

    for k, v in out.items():
        out[k] = round(v, 3)
        print(f"{k:16s} {out[k]:8.3f} ms")
    out["opt_ms_from_sol_table"] = None
    try:
        sol = json.load(open(os.path.join(
            os.path.dirname(__file__), "..", "docs", "sol_table.json")))
        comp = {r["component"]: r["measured_ms"] for r in sol["rows"]}
        out["opt_ms_from_sol_table"] = comp.get("optimizer (AdamW+clip)")
        out["sol_components_sum_ms"] = sol["components_sum_ms"]
        out["sol_full_step_ms"] = sol["full_step_ms"]
        glue_measured = (out["masks_pools_ms"] + out["neck_ms"]
                         + out["heads_rest_ms"])
        out["glue_measured_ms"] = round(glue_measured, 3)
        out["glue_residual_ms"] = round(
            out["full_step_ms"] - sol["components_sum_ms"] - glue_measured, 3)
        print(f"{'glue measured':16s} {out['glue_measured_ms']:8.3f} ms  "
              f"(residual vs full step: {out['glue_residual_ms']:.3f} ms)")
    except Exception as e:
        print(f"sol_table cross-ref skipped: {e!r}")

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "glue_decomp.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
