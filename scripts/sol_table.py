"""Per-op speed-of-light table for the flagship TRAINING step.

Times each component of the 24-25 ms training step in isolation on the real
chip (chained-scan method, docs/PERFORMANCE.md "Timing methodology") and
compares it against three analytic floors:

- **MXU**: time-equivalent matmul FLOPs / 197 TF/s (v5e bf16 peak). Dense
  matmuls count 3x forward for training (fwd + input-grad + weight-grad);
  attention score/value matmuls count 3.5x (the flash-style backward
  recomputes the forward pass) AND carry the 4x head_dim=32 MXU
  quantization penalty that no packing can recover (PERFORMANCE.md
  "Speed-of-light accounting").
- **HBM**: bytes moved / 819 GB/s (v5e). Weights: fwd read + bwd read +
  grad write. Activations: 6 passes of each layer's token stream (fwd
  in/out, bwd in/out, saved-input read, input-grad write) — the fused
  layers save only their inputs and recompute internals.
- **VPU (estimate)**: elementwise ops / ~4e12 ops/s (8x128 vector unit,
  ~4 ALUs/lane at ~1 GHz — order-of-magnitude only). Counted: 2 layernorms
  (~12 ops/elem), softmax (~10 ops/elem over token x S x H scores), ReLU,
  residual adds, and — dominant in training — DROPOUT: threefry-2x32 is
  ~30 vector ops per 32-bit random, applied over every activation the
  reference drops (attention output, FF inner, FF output per layer).

A component near max(floors) is done; a component far above it is the next
target. Writes docs/sol_table.json and prints the table.

Run on the chip: python scripts/sol_table.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_MXU = 197e12       # v5e bf16 FLOPs/s
PEAK_HBM = 819e9        # v5e bytes/s
PEAK_VPU = 4e12         # elementwise ops/s, fallback estimate (see CAL)

# measured per-element VPU costs (scripts/calibrate_vpu.py — LN/softmax/
# dropout microbenches at the training tile shapes); replaces the 4e12
# guess when docs/vpu_calibration.json exists (VERDICT r3 #1b)
_CAL_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "vpu_calibration.json")
CAL = json.load(open(_CAL_PATH)) if os.path.exists(_CAL_PATH) else None

# flagship training shapes
B = 128
G, S = 8, 30            # groups, content length; padded seqs are S+2=32
D, DFF, H, NL, DZ = 256, 512, 8, 4, 256
N_ARGS, VOCAB = 11, 257


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


def floors(dense_macs_fwd, attn_macs_fwd, act_elems, weight_elems,
           vpu_ops, train=True):
    """-> dict of floor milliseconds. MACs are forward-pass; training
    multipliers applied here."""
    dense = dense_macs_fwd * (3 if train else 1)
    attn = attn_macs_fwd * (3.5 if train else 1) * 4       # 4x head_dim=32
    mxu = 2 * (dense + attn) / PEAK_MXU
    hbm = (act_elems * 2 * (6 if train else 2)              # bf16 activations
           + weight_elems * 4 * (3 if train else 1)) / PEAK_HBM
    vpu = vpu_ops / PEAK_VPU
    return {"mxu_ms": mxu * 1e3, "hbm_ms": hbm * 1e3, "vpu_ms": vpu * 1e3,
            "floor_ms": max(mxu, hbm, vpu) * 1e3}


def stack_floors(tokens, attn_len, n_layers, dz_inject=0, dropout=True,
                 train=True):
    dense_pt = 4 * D * D + 2 * D * DFF + dz_inject * D
    attn_pt = 2 * attn_len * D
    w = n_layers * (4 * D * D + 2 * D * DFF + dz_inject * D + 8 * D)
    act = n_layers * tokens * D
    # VPU: 2 LN (12 ops/elem over tokens*D), softmax 10 ops/elem over
    # tokens*attn_len*H, relu+residual ~4 ops/elem, dropout ~34 ops/elem
    # (threefry + mask + scale) over 2*tokens*D + tokens*DFF
    vpu = n_layers * (tokens * D * (2 * 12 + 4)
                      + tokens * attn_len * H * 10)
    if dropout and train:
        vpu += n_layers * 34 * (2 * tokens * D + tokens * DFF)
    if train:
        vpu *= 2.5   # backward re-runs LN/softmax/dropout-mask math
    fl = floors(n_layers * tokens * dense_pt, n_layers * tokens * attn_pt,
                act, w, vpu, train)
    if CAL is not None:
        # measured VPU time: per layer, 2 LNs over tokens*D (fwd kernel pays
        # a fwd; the bwd kernel recomputes both LNs AND takes their grads),
        # softmax over tokens*attn_len*H scores (fwd + the bwd's ds math;
        # with save-residuals the bwd skips the softmax recompute), dropout
        # masks drawn in fwd and regenerated in bwd over the four sites
        # (attn probs, attn out, FF hidden, FF out)
        ln_e = n_layers * tokens * D * 2
        sm_e = n_layers * tokens * attn_len * H
        do_e = n_layers * (2 * tokens * D + tokens * DFF
                           + tokens * attn_len * H)
        t = ln_e * CAL["ln_fwd_ns_per_elem"]
        t += sm_e * CAL["softmax_fwd_ns_per_elem"]
        if train:
            t += ln_e * CAL["ln_fwdbwd_ns_per_elem"]
            t += sm_e * (CAL["softmax_fwdbwd_ns_per_elem"]
                         - CAL["softmax_fwd_ns_per_elem"])
            if dropout:
                t += 2 * do_e * CAL["dropout_mask_ns_per_elem"]
        fl["vpu_cal_ms"] = t * 1e-9 * 1e3
        fl["floor_ms"] = max(fl["mxu_ms"], fl["hbm_ms"], fl["vpu_cal_ms"])
    return fl


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.models.layers import DecoderStack, EncoderStack
    from deepsvg_tpu.models.embeddings import SVGEmbedding
    from deepsvg_tpu.ops.ce import args_ce
    from deepsvg_tpu.training.trainer import (
        create_train_state, make_optimizer, train_step)

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
    rows = []

    def add(name, ms, fl, note=""):
        r = {"component": name, "measured_ms": round(ms * 1e3, 3),
             **{k: round(v, 3) for k, v in fl.items()}, "note": note}
        r["x_floor"] = round(r["measured_ms"] / max(r["floor_ms"], 1e-9), 2)
        rows.append(r)
        cal = (f" vpuCAL {r['vpu_cal_ms']:5.3f}" if "vpu_cal_ms" in r else "")
        print(f"{name:22s} {r['measured_ms']:7.3f} ms   floor "
              f"{r['floor_ms']:6.3f} (mxu {r['mxu_ms']:5.3f} hbm "
              f"{r['hbm_ms']:5.3f} vpu~{r['vpu_ms']:5.3f}{cal})  "
              f"x{r['x_floor']:.2f}  {note}")

    # ---- full train step --------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_full(st, d, n):
        def body(s, _):
            s, res = train_step(s, d, weights, model, optimizer, model_args)
            return s, res["loss"]
        _, losses = jax.lax.scan(body, st, None, length=n)
        return losses[-1]

    t_full = timed(chain_full, (state, data))

    # ---- transformer stacks ----------------------------------------------
    # chained-scan rules (docs/PERFORMANCE.md): the body must (a) depend on
    # the carry through its INPUT so iterations can't be hoisted/CSE'd, and
    # (b) consume the gradients in the output so the backward can't be DCE'd.
    def time_stack(mod, inputs):
        params = mod.init({"params": key, "dropout": key}, *inputs,
                          deterministic=False)

        @functools.partial(jax.jit, static_argnums=(2,))
        def chain(p, xs, n):
            def body(carry, i):
                x0 = xs[0] + carry.astype(xs[0].dtype)
                def lf(pp):
                    out = mod.apply(pp, x0, *xs[1:], deterministic=False,
                                    rngs={"dropout": jax.random.fold_in(key, i)})
                    return jnp.sum(out.astype(jnp.float32)) * 1e-6
                l, g = jax.value_and_grad(lf)(p)
                gs = sum(jnp.sum(t.astype(jnp.float32))
                         for t in jax.tree.leaves(g))
                return (l + gs) * 1e-20, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return acc
        return timed(chain, (params, inputs))

    bf = jnp.bfloat16
    x_big = jnp.asarray(rng.standard_normal((B * G, S + 2, D)), bf)
    x_sm = jnp.asarray(rng.standard_normal((B, G, D)), bf)
    z_big = jnp.asarray(rng.standard_normal((B * G, 1, D)), bf)
    z_sm = jnp.asarray(rng.standard_normal((B, 1, D)), bf)

    enc_big = EncoderStack(NL, D, H, DFF, 0.1, dtype=bf, attn_impl="pallas")
    t = time_stack(enc_big, (x_big,))
    add("E1 stack (4L, 32t)", t,
        stack_floors((B * G) * (S + 2), S + 2, NL))

    dec_big = DecoderStack(NL, D, H, DFF, 0.1, dtype=bf, attn_impl="pallas")
    t = time_stack(dec_big, (x_big, z_big))
    add("D1 stack (4L, 32t)", t,
        stack_floors((B * G) * (S + 2), S + 2, NL, dz_inject=DZ))

    enc_sm = EncoderStack(NL, D, H, DFF, 0.1, dtype=bf,
                          attn_impl=cfg.attn_impl_hier)
    t = time_stack(enc_sm, (x_sm,))
    add("E2 stack (4L, 8t)", t, stack_floors(B * G, G, NL))

    dec_sm = DecoderStack(NL, D, H, DFF, 0.1, dtype=bf,
                          attn_impl=cfg.attn_impl_hier)
    t = time_stack(dec_sm, (x_sm, z_sm))
    add("D2 stack (4L, 8t)", t, stack_floors(B * G, G, NL, dz_inject=DZ))

    # ---- embedding (fwd+bwd, one-hot-matmul kernels) ----------------------
    emb = SVGEmbedding(cfg, S, use_group=True)
    cmds = jnp.reshape(data["commands"], (B * G, S + 2))
    argt = jnp.reshape(data["args"], (B * G, S + 2, N_ARGS))
    grps = jnp.tile(jnp.arange(G, dtype=jnp.int32)[None].repeat(B, 0)
                    .reshape(B * G, 1), (1, S + 2))
    ep = emb.init({"params": key}, cmds, argt, grps)

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain_emb(p, c, a, n):
        def body(carry, i):
            # int inputs: the per-i dropout rng prevents hoisting; grads are
            # consumed through the carry so the backward survives DCE
            def lf(pp):
                out = emb.apply(pp, c, a, grps, deterministic=False,
                                rngs={"dropout": jax.random.fold_in(key, i)})
                return jnp.sum(out.astype(jnp.float32)) * 1e-6
            l, g = jax.value_and_grad(lf)(p)
            gs = sum(jnp.sum(t.astype(jnp.float32))
                     for t in jax.tree.leaves(g))
            return carry + l + gs * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return acc

    t = timed(chain_emb, (ep, cmds, argt))
    tokens = B * G * (S + 2)
    # one-hot algorithm: args = 11 slots of onehot(257) @ [257, D] per token
    add("embedding (1-hot mm)", t,
        floors(tokens * (N_ARGS * VOCAB * D + 7 * D), 0, tokens * D,
               N_ARGS * VOCAB * D, tokens * 34 * D * 2.5),
        "algorithmic MACs; gather impl would be HBM-bound instead")

    # ---- fused CE head -----------------------------------------------------
    rows_n = B * G * (S + 1)
    y = jnp.asarray(rng.standard_normal((rows_n, D)), bf)
    wa = jnp.asarray(rng.standard_normal((D, N_ARGS * VOCAB)), bf) * 0.02
    ba = jnp.zeros((N_ARGS * VOCAB,), bf)
    tg = jnp.asarray(rng.integers(0, VOCAB, (rows_n, N_ARGS)), jnp.int32)

    @functools.partial(jax.jit, static_argnums=(4,))
    def chain_ce(y, wa, ba, tg, n):
        def body(carry, _):
            yy0 = y + carry.astype(y.dtype)
            def lf(yy):
                return jnp.sum(args_ce(yy, wa, ba, tg)) * 1e-6
            l, g = jax.value_and_grad(lf)(yy0)
            return (l + jnp.sum(g.astype(jnp.float32))) * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    t = timed(chain_ce, (y, wa, ba, tg))
    # fwd: rows x D x 11*257 logits matmul; bwd: dlogits@W^T + y^T@dlogits
    ce_macs = rows_n * D * N_ARGS * VOCAB
    add("fused args-CE head", t,
        floors(ce_macs, 0, rows_n * N_ARGS * VOCAB, D * N_ARGS * VOCAB,
               rows_n * N_ARGS * VOCAB * 12 * 2))

    # ---- optimizer ---------------------------------------------------------
    grads = jax.tree.map(jnp.ones_like, state.params)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_opt(st, g, n):
        def body(s, _):
            upd, os_ = optimizer.update(g, s.opt_state, s.params)
            return s.replace(params=optax.apply_updates(s.params, upd),
                             opt_state=os_), None
        s, _ = jax.lax.scan(body, st, None, length=n)
        return jax.tree.leaves(s.params)[0].sum()

    t = timed(chain_opt, (state, grads))
    # AdamW+clip HBM: read p,m,v,g (+g for global norm) write p,m,v = 8 x 4B
    add("optimizer (AdamW+clip)", t,
        {"mxu_ms": 0.0, "hbm_ms": n_params * 4 * 8 / PEAK_HBM * 1e3,
         "vpu_ms": n_params * 30 / PEAK_VPU * 1e3,
         "floor_ms": max(n_params * 4 * 8 / PEAK_HBM,
                         n_params * 30 / PEAK_VPU) * 1e3},
        f"{n_params/1e6:.1f}M params, pure bandwidth; isolated bench "
        "INVALID (times below its own HBM floor: fixed grads hoist the "
        "clip norm) — in situ the phase costs ~2.2 ms, see "
        "docs/glue_decomp.json")

    covered = sum(r["measured_ms"] for r in rows)
    print("-" * 86)
    print(f"{'full train step':22s} {t_full*1e3:7.3f} ms   "
          f"components sum {covered:.3f} ms "
          f"(rest: stage glue, loss masks, resnet/bottleneck, heads)")
    out = {"B": B, "rows": rows,
           "full_step_ms": round(t_full * 1e3, 3),
           "components_sum_ms": round(covered, 3),
           "assumptions": {
               "peak_mxu_flops": PEAK_MXU, "peak_hbm_Bps": PEAK_HBM,
               "peak_vpu_ops_estimate": PEAK_VPU,
               "vpu_calibrated": CAL is not None,
               "train_mults": "dense x3, attention x3.5 x4(head_dim=32)",
               "act_passes_train": 6, "dropout_ops_per_elem": 34}}
    with open("docs/sol_table.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/sol_table.json")


if __name__ == "__main__":
    main()
