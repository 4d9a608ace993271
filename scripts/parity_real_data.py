"""Real-data end-to-end training parity: torch reference vs this framework.

The strongest possible correctness artifact: both frameworks train the
flagship model (hierarchical_ordered: two-stage, one-shot, use_vae=False) on
the SAME real SVG corpus — the reference's own in-repo fixtures
(docs/frames/*.svg + docs/imgs/dolphin.svg) — from IDENTICAL transplanted
initialization, with an IDENTICAL batch schedule and per-step learning rates,
and the loss curves are compared component-wise.

Pipeline (mirrors reference dataset/preprocess.py:12-32 + train.py:18-135):

  1. preprocess the corpus with the REFERENCE implementation
     (fill_(False) -> normalize -> zoom(0.9) -> canonicalize ->
     simplify_heuristic), writing simplified SVGs + meta CSV;
  2. tensorize deterministically (augmentation OFF, numericalize 256) with
     BOTH the reference SVGDataset (svg_dataset.py:157-215) and this
     framework's loader, asserting the tensors are IDENTICAL;
  3. train both sides N steps: AdamW(lr 1e-3, wd 0.01), grad clip 1.0,
     loss weights cmd 1 / args 2 / visibility 1 (default_icons.py:65-73),
     batch = the full mini-corpus every step. The torch side's actual
     per-step lr is recorded and replayed exactly on the optax side, so
     scheduler semantics cannot contribute drift;
  4. dump both curves to JSON and report max/mean relative deviation.

Determinism notes (documented decisions):
  - dropout 0 on both sides (the curve comparison needs determinism; the
    reference additionally hard-codes p=0.1 PE dropout that ignores
    cfg.dropout — see tests/test_torch_parity_grad.py).
  - the reference's UB loss mask is pinned to extend-by-3 on the torch side
    (tests/test_torch_parity_grad.py has the archaeology).

Usage:
  python scripts/parity_real_data.py --steps 300 --out docs/parity_curve_real.json
"""
from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return mod


def load_reference():
    """Import the reference with its render-only deps stubbed (same recipe as
    scripts/bench_preprocess_vs_reference.py)."""
    _stub("cairosvg", svg2png=lambda **kw: b"")
    _stub("IPython")
    _stub("IPython.display", SVG=object, Image=object, display=lambda *a: None)
    sys.modules["IPython"].display = sys.modules["IPython.display"]
    _stub("moviepy")
    _stub("moviepy.editor", ImageClip=object, concatenate_videoclips=None,
          ipython_display=None)
    # networkx is genuinely installed — stubbing it breaks torch's import
    shp = _stub("shapely")
    shp.__path__ = []
    _stub("shapely.geometry", Polygon=object)
    _stub("shapely.ops", unary_union=None)
    shp.geometry = sys.modules["shapely.geometry"]
    shp.ops = sys.modules["shapely.ops"]
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


CORPUS = sorted(glob.glob("/root/reference/docs/frames/*.svg")) + [
    "/root/reference/docs/imgs/dolphin.svg"
]

MAX_NUM_GROUPS, MAX_SEQ_LEN = 8, 30

WEIGHTS = {
    "kl_tolerance": 0.1,
    "loss_kl_weight": 1.0,       # unused: use_vae=False
    "loss_visibility_weight": 1.0,
    "loss_cmd_weight": 1.0,
    "loss_args_weight": 2.0,
}


def preprocess_corpus(workdir: str) -> list[str]:
    """Reference preprocessing pipeline over the corpus; returns kept ids.
    (dataset/preprocess.py:12-32 + the meta CSV schema.)"""
    from deepsvg.svglib.svg import SVG as RefSVG

    os.makedirs(workdir, exist_ok=True)
    rows, kept = [], []
    for path in CORPUS:
        icon_id = os.path.splitext(os.path.basename(path))[0]
        svg = RefSVG.load_svg(path)
        try:
            svg.fill_(False)
            svg.normalize()
            svg.zoom(0.9)
            svg.canonicalize()
            svg = svg.simplify_heuristic()
        except AttributeError as e:
            # the dataset/preprocess.py recipe transforms BEFORE lowering
            # primitives to paths (preprocess.py:17-20), so shape-primitive
            # files (circles, rects...) crash in the reference itself. Fall
            # back to the reference's OTHER recipe — SVGDataset.simplify
            # (svg_dataset.py:145-149: canonicalize first) — which handles
            # them; what matters for training parity is that both frameworks
            # consume the same simplified files.
            svg = RefSVG.load_svg(path)
            try:
                svg.fill_(False)
                svg.canonicalize(normalize=True)
                svg = svg.simplify_heuristic()
                svg = svg.normalize().zoom(0.9)
            except Exception as e2:
                print(f"  skipping {icon_id}: both reference recipes fail "
                      f"({e} / {e2})")
                continue
        svg.save_svg(os.path.join(workdir, f"{icon_id}.svg"))
        len_groups = [pg.total_len() for pg in svg.svg_path_groups]
        row = {
            "id": icon_id,
            "total_len": sum(len_groups),
            "nb_groups": len(len_groups),
            "len_groups": str(len_groups),
            "max_len_group": max(len_groups) if len_groups else 0,
        }
        rows.append(row)
        if (row["nb_groups"] <= MAX_NUM_GROUPS
                and row["max_len_group"] <= MAX_SEQ_LEN):
            kept.append(icon_id)
    meta = os.path.join(workdir, "meta.csv")
    with open(meta, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    return kept


def reference_tensors(workdir: str, ids: list[str]):
    """Deterministic (augment-off) tensors through the reference
    SVGDataset.get (svg_dataset.py:157-172)."""
    import numpy as np
    from deepsvg.svg_dataset import SVGDataset as RefDataset

    ds = RefDataset(workdir, os.path.join(workdir, "meta.csv"),
                    ["commands", "args"], MAX_NUM_GROUPS, MAX_SEQ_LEN)
    out = {}
    for icon_id in ids:
        idx = [i for i in range(len(ds.df)) if ds.idx_to_id(i) == icon_id][0]
        d = ds.get(idx, ["commands", "args"], random_aug=False)
        out[icon_id] = {k: d[k].numpy() for k in ("commands", "args")}
    return out


def our_tensors(workdir: str, ids: list[str]):
    """Same through this framework's SVGDataset (data/dataset.py)."""
    from deepsvg_tpu.data.dataset import SVGDataset

    ds = SVGDataset(workdir, os.path.join(workdir, "meta.csv"),
                    ["commands", "args"], MAX_NUM_GROUPS, MAX_SEQ_LEN)
    out = {}
    for icon_id in ids:
        idx = [i for i in range(len(ds.df)) if ds.idx_to_id(i) == icon_id][0]
        d = ds.get(idx, ["commands", "args"], random_aug=False)
        out[icon_id] = {k: __import__("numpy").asarray(d[k]) for k in
                        ("commands", "args")}
    return out


VARIANTS = {
    # kwargs applied on BOTH sides on top of the two-stage one-shot base.
    # All variants run use_vae=False for curve determinism (the reference
    # samples its VAE with torch RNG, ours with jax RNG — bit-matched curves
    # are impossible with sampling on; the VAE head itself has transplant
    # parity tests in tests/test_torch_parity_variants.py).
    "flagship": {},                                    # hierarchical_ordered
    "selfmatch": {"self_match": True},                 # HierarchicalSelfMatching
    "fonts": {"label_condition": True, "dim_z": 128},  # hierarchical_ordered_fonts
}


def train_torch(batch, steps: int, log_every: int = 1,
                variant: str = "flagship"):
    """Reference training loop (train.py:77-135) on a fixed batch; returns
    (curve, recorded per-step lr, initial state_dict)."""
    import numpy as np
    import torch
    import deepsvg.model.loss as ref_loss_mod
    import deepsvg.model.model as ref_model_mod
    from deepsvg.model.config import Hierarchical
    from deepsvg.model.loss import SVGLoss
    from deepsvg.model.model import SVGTransformer
    from deepsvg.schedulers.warmup import GradualWarmupScheduler
    import torch.optim.lr_scheduler as lr_scheduler

    # pin the UB loss mask to extend-by-3 (see module docstring)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_torch_parity_grad import _defined_padding_mask

    ref_loss_mod._get_padding_mask = _defined_padding_mask
    ref_model_mod._get_padding_mask = _defined_padding_mask

    cfg = Hierarchical()
    cfg.use_vae = False
    cfg.dropout = 0.0
    for k, v in VARIANTS[variant].items():
        assert hasattr(cfg, k), k
        setattr(cfg, k, v)
    torch.manual_seed(42)
    model = SVGTransformer(cfg).train()
    # cfg.dropout=0 does not reach the hard-coded p=0.1 dropout inside
    # PositionalEncodingLUT (positional_encoding.py:26-28); zero every
    # Dropout module so the torch forward is deterministic like ours
    for mod in model.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.p = 0.0
    init_sd = {k: v.detach().cpu().numpy().copy()
               for k, v in model.state_dict().items()}
    loss_fn = SVGLoss(cfg)

    opt = torch.optim.AdamW(model.parameters(), 1e-3)
    epoch_size = 1  # full-batch: one step per epoch-equivalent
    sched = lr_scheduler.StepLR(opt, step_size=int(2.5 * epoch_size * 1000),
                                gamma=0.9)
    warmup = GradualWarmupScheduler(opt, multiplier=1.0, total_epoch=500,
                                    after_scheduler=sched)

    tc = torch.tensor(batch["commands"])
    ta = torch.tensor(batch["args"])
    targs = [tc, ta, tc, ta]
    if cfg.label_condition:
        targs.append(torch.tensor(batch["label"]))
    curve, lrs = [], []
    for step in range(steps):
        lr_now = opt.param_groups[0]["lr"]
        lrs.append(lr_now)
        opt.zero_grad()
        out = model(*targs)
        loss_dict = loss_fn(out, None, WEIGHTS)
        loss_dict["loss"].backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        sched.step()
        warmup.step()
        curve.append({k: float(v.detach()) for k, v in loss_dict.items()})
        if step % max(log_every * 50, 1) == 0:
            print(f"  torch step {step}: loss={curve[-1]['loss']:.4f} lr={lr_now:.2e}")
    final_sd = {k: v.detach().cpu().numpy().copy()
                for k, v in model.state_dict().items()}
    return curve, lrs, init_sd, final_sd


def train_jax(batch, steps: int, lrs, init_sd, impl: str = "xla",
              dtype: str = "float32", resident_k: int = 0,
              variant: str = "flagship"):
    """This framework's jitted train step from the transplanted torch init,
    replaying the recorded torch lr sequence exactly.

    ``impl``/``dtype``/``resident_k`` select the execution path: the default
    (xla, float32, streaming) is the determinism-floor comparison; the
    PRODUCTION path (pallas, bfloat16, resident_k>0) is the shipped flagship
    composition — whole-layer fused VJPs + fused softmax-CE head +
    device-resident data gathered on device inside a K-step lax.scan
    (models/config.py hierarchical_ordered profile + data/resident.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.models.torch_import import state_dict_to_params
    from deepsvg_tpu.training.trainer import (
        TrainState, jit_train_resident_multi_step, jit_train_step,
        make_optimizer)

    cfg = ModelConfig(encode_stages=2, decode_stages=2, use_vae=False,
                      dropout=0.0, attention_impl=impl, compute_dtype=dtype,
                      **VARIANTS[variant])
    model = SVGTransformer(cfg)
    params = jax.tree.map(np.array, state_dict_to_params(init_sd, cfg))
    model_args = ["commands", "args", "commands", "args"]
    if cfg.label_condition:
        model_args.append("label")

    lr_table = jnp.asarray(np.asarray(lrs, np.float32))
    optimizer = make_optimizer(
        lambda step: lr_table[jnp.clip(step, 0, len(lrs) - 1)],
        grad_clip=1.0, weight_decay=0.01)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params),
                       rng=jax.random.PRNGKey(0))
    weights = {k: jnp.asarray(v, jnp.float32) for k, v in WEIGHTS.items()}
    keys = ("loss", "loss_cmd", "loss_args", "loss_visibility")
    curve = []

    if resident_k > 0:
        # production dispatch: wire-compressed corpus resident on device,
        # [K, B] indices the only per-dispatch transfer (full-batch corpus:
        # every step gathers all icons, preserving the torch schedule)
        from deepsvg_tpu.data.loader import compress_batch

        data = {k: jnp.asarray(v) for k, v in compress_batch(
            {k: batch[k] for k in model_args if k in batch}).items()}
        n = batch["commands"].shape[0]
        step_fn = jit_train_resident_multi_step(
            model, optimizer, model_args,
            weights_fn=lambda s: weights, n_augs=1, donate=False)
        idx = jnp.tile(jnp.arange(n, dtype=jnp.int32), (resident_k, 1))
        for d0 in range(0, steps, resident_k):
            k_eff = min(resident_k, steps - d0)
            state, res = step_fn(state, data, idx[:k_eff])
            for i in range(k_eff):
                curve.append({k: float(res[k][i]) for k in keys})
            if d0 % 50 < resident_k:
                print(f"  jax step {d0}: loss={curve[-1]['loss']:.4f}")
        return curve

    step_fn = jit_train_step(model, optimizer, model_args, donate=False)
    jb = {k: jnp.asarray(batch[k]) for k in set(model_args) if k in batch}
    for step in range(steps):
        state, res = step_fn(state, jb, weights)
        curve.append({k: float(res[k]) for k in keys})
        if step % 50 == 0:
            print(f"  jax step {step}: loss={curve[-1]['loss']:.4f}")
    return curve


def compare(torch_curve, jax_curve):
    import numpy as np

    report = {}
    for key in ("loss", "loss_cmd", "loss_args", "loss_visibility"):
        t = np.asarray([c[key] for c in torch_curve])
        j = np.asarray([c[key] for c in jax_curve])
        rel = np.abs(t - j) / np.maximum(np.abs(t), 1e-6)
        report[key] = {
            "torch_first": float(t[0]), "jax_first": float(j[0]),
            "torch_final": float(t[-1]), "jax_final": float(j[-1]),
            "max_rel": float(rel.max()), "mean_rel": float(rel.mean()),
            "final_rel": float(rel[-1]),
        }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--workdir", default="/tmp/parity_corpus")
    ap.add_argument("--out", default="docs/parity_curve_real.json")
    ap.add_argument("--variant", default="flagship",
                    choices=sorted(VARIANTS))
    ap.add_argument("--impl", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--resident-k", type=int, default=0,
                    help="K>0: device-resident data + K-step scan dispatch "
                         "(the production path)")
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"],
                    help="tpu = leave the ambient axon TPU backend in place "
                         "for the jax side (torch always runs on CPU)")
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    load_reference()
    import numpy as np

    print(f"[1/4] preprocessing {len(CORPUS)} SVGs with the reference pipeline")
    t0 = time.time()
    ids = preprocess_corpus(args.workdir)
    print(f"  kept {len(ids)}/{len(CORPUS)} after G<={MAX_NUM_GROUPS}, "
          f"S<={MAX_SEQ_LEN} filters ({time.time()-t0:.1f}s): {ids}")

    print("[2/4] tensorizing with both loaders + equivalence check")
    ref_t = reference_tensors(args.workdir, ids)
    our_t = our_tensors(args.workdir, ids)
    mismatches = []
    for icon_id in ids:
        for k in ("commands", "args"):
            if not np.array_equal(ref_t[icon_id][k], our_t[icon_id][k]):
                n_bad = int((ref_t[icon_id][k] != our_t[icon_id][k]).sum())
                mismatches.append(f"{icon_id}/{k}: {n_bad} cells differ")
    if mismatches:
        print("  TENSOR MISMATCHES:\n   " + "\n   ".join(mismatches))
    else:
        print(f"  all {len(ids)} icons tensorize identically in both loaders")

    batch = {
        "commands": np.stack([ref_t[i]["commands"] for i in ids]).astype(np.int64),
        "args": np.stack([ref_t[i]["args"] for i in ids]).astype(np.float32),
    }
    if args.variant == "fonts":
        # label-conditioned variant: the icon id IS the class (both sides
        # consume the identical labels — what matters for parity is the
        # label-injection machinery, reference improved_transformer.py:47-49)
        batch["label"] = np.arange(len(ids), dtype=np.int64)
    print(f"  batch: commands {batch['commands'].shape}, args {batch['args'].shape}")

    print(f"[3/4] training torch reference {args.steps} steps (CPU, "
          f"{args.variant})")
    t0 = time.time()
    torch_curve, lrs, init_sd, _ = train_torch(batch, args.steps,
                                               variant=args.variant)
    print(f"  done in {time.time()-t0:.0f}s")

    print(f"[4/4] training deepsvg_tpu {args.steps} steps "
          f"({args.device}/{args.impl}/{args.dtype}"
          f"{f'/resident K={args.resident_k}' if args.resident_k else ''}, "
          f"same init/lr)")
    t0 = time.time()
    jax_curve = train_jax(batch, args.steps, lrs, init_sd, impl=args.impl,
                          dtype=args.dtype, resident_k=args.resident_k,
                          variant=args.variant)
    print(f"  done in {time.time()-t0:.0f}s")

    report = compare(torch_curve, jax_curve)
    result = {
        "corpus": ids,
        "steps": args.steps,
        "config": {"impl": args.impl, "dtype": args.dtype,
                   "resident_k": args.resident_k, "device": args.device,
                   "variant": args.variant},
        "tensor_equivalence": not mismatches,
        "tensor_mismatches": mismatches,
        "report": report,
        "torch_curve": torch_curve,
        "jax_curve": jax_curve,
        "lrs": lrs,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(json.dumps({"report": report}, indent=2))


if __name__ == "__main__":
    main()
