"""Bounded fonts-recipe run: the reference's SECOND pretrained model family
(configs/deepsvg/hierarchical_ordered_fonts.py:8-24 — label-conditioned VAE,
dim_z=128, lr 2e-4, 62 glyph classes 0-9A-Za-z) exercised at scale on the
synthetic glyph-class distribution (VERDICT r4 next-step #8).

Orchestrates, like scripts/full_run.py but bounded:
  1. scripts/scale_rehearsal.py --config configs_tpu.hierarchical_ordered_fonts
     for --max-steps steps (default 50k) at B=60 over a label-conditioned
     100k x 10-variant corpus (per-icon class labels, aug-invariant);
  2. held-out reconstruction eval (deepsvg_tpu.evaluation) of the final
     checkpoint vs random init — fresh-seed corpus, disjoint classes stream;
  3. label-conditioned GENERATION grids: z ~ N(0, I) decoded under each of
     --grid-labels classes (the VAE prior x label embedding path the icons
     flagship never exercises), rendered to docs/artifacts/fonts_samples.png;
  4. writes docs/fonts_run.json + docs/FONTS_RUN.md.

Run on the chip (after the icons full run; ~20 min at 50k steps):
    python scripts/fonts_run.py [--max-steps 50000] [--skip-train]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG_DIR = "/tmp/fonts_run"
RUN, TAG = "fonts_run", "r05"
CONFIG = "configs_tpu.hierarchical_ordered_fonts"


def held_out_batches(model_args, label_range, n=1024, batch=64, seed=73111):
    """Fresh-seed labeled corpus, same generator family as training."""
    import numpy as np

    from deepsvg_tpu.data.synthetic import SyntheticAugmentedCorpus

    ds = SyntheticAugmentedCorpus(n, n_augs=1, seed=seed,
                                  label_range=label_range)
    keys = [k for k in model_args if k in ("commands", "args", "label")]
    for lo in range(0, n, batch):
        b = ds.get_batch_arrays(np.arange(lo, min(lo + batch, n)))
        yield {k: b[k] for k in keys if k in b}


def train_segments(max_steps, max_attempts=20):
    os.makedirs(LOG_DIR, exist_ok=True)
    segments = []
    for attempt in range(max_attempts):
        seg_out = os.path.join(LOG_DIR, f"segment_{attempt:02d}.json")
        cmd = [sys.executable, os.path.join(REPO, "scripts/scale_rehearsal.py"),
               "--config", CONFIG, "--max-steps", str(max_steps),
               "--run-name", RUN, "--tag", TAG,
               "--keep-last", "5", "--keep-every", "25000",
               "--log-dir", LOG_DIR, "--out", seg_out]
        ckpt_glob = os.path.join(LOG_DIR, "models", RUN, TAG, "*.ckpt")
        if attempt > 0 or glob.glob(ckpt_glob):
            cmd.append("--resume")
        print(f"[fonts_run] attempt {attempt}: {' '.join(cmd)}", flush=True)
        rc = subprocess.run(cmd).returncode
        if os.path.exists(seg_out):
            with open(seg_out) as f:
                segments.append(json.load(f))
        if rc == 0 and segments and segments[-1]["steps_run"] >= max_steps:
            return segments
        print(f"[fonts_run] attempt {attempt} rc={rc}; resuming", flush=True)
        time.sleep(30)
    raise RuntimeError("attempts exhausted")


def render_label_grid(model, variables, cfg_model, labels, per_label=6,
                      out_png=None, seed=0):
    """Decode z ~ N(0, I) under each class label -> one PIL grid image
    (rows = labels): the generation path conditioned purely on the label
    embedding — no encoder input involved."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepsvg_tpu.models.sample import flatten_groups_np, greedy_sample
    from deepsvg_tpu.svglib.geom import Bbox
    from deepsvg_tpu.svglib.svg import SVG
    from deepsvg_tpu.svglib.utils import make_grid_lines

    key = jax.random.PRNGKey(seed)
    rows = []
    n_ok = 0
    for li, lab in enumerate(labels):
        key, zk = jax.random.split(key)
        z = jax.random.normal(zk, (per_label, cfg_model.dim_z), jnp.float32)
        lab_arr = jnp.full((per_label,), int(lab), jnp.int32)
        c, a = greedy_sample(model, variables, z=z, label=lab_arr)
        row = []
        for cc, aa in flatten_groups_np(c, a):
            try:
                from deepsvg_tpu.svgtensor import cmd_args_to_data14

                svg = (SVG.from_tensor(cmd_args_to_data14(cc, aa),
                                       viewbox=Bbox(256), allow_empty=True)
                       .normalize().split_paths().set_color("random"))
                row.append(svg)
                n_ok += 1
            except Exception:
                row.append(SVG([], viewbox=Bbox(256)))
        rows.append(row)
    img = make_grid_lines(rows).render(width=per_label * 96)
    if out_png is not None:
        from PIL import Image

        os.makedirs(os.path.dirname(out_png), exist_ok=True)
        Image.fromarray(np.asarray(img)).save(out_png)
    return n_ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-steps", type=int, default=50_000)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--eval-n", type=int, default=1024)
    ap.add_argument("--grid-labels", type=int, default=8)
    args = ap.parse_args()

    t0 = time.time()
    segments = [] if args.skip_train else train_segments(args.max_steps)

    from deepsvg_tpu.evaluation import evaluate_batches
    from deepsvg_tpu.inference import load_session
    from deepsvg_tpu.training.checkpoint import latest_ckpt
    from deepsvg_tpu.training.config import load_config

    cfg = load_config(CONFIG, 1)
    label_range = min(int(cfg.model_cfg.n_labels), len(cfg.filter_uni))
    ckpt_dir = os.path.join(LOG_DIR, "models", RUN, TAG)
    ckpt = latest_ckpt(ckpt_dir)
    assert ckpt, f"no checkpoint under {ckpt_dir}"

    out = {"config": CONFIG, "checkpoint": ckpt,
           "max_steps": args.max_steps, "label_range": label_range,
           "segments": [{k: s.get(k) for k in
                         ("steps_run", "step_s", "wall_s_total")}
                        for s in segments]}
    if segments:
        curve = [p for s in segments for p in (s.get("curve") or [])]
        out["loss_first"], out["loss_last"] = curve[0], curve[-1]
        out["curve"] = curve

    print(f"[fonts_run] eval final: {ckpt}", flush=True)
    sess = load_session(CONFIG, ckpt)
    out["final"] = evaluate_batches(
        sess.model, sess.variables,
        held_out_batches(cfg.model_args, label_range, n=args.eval_n),
        verbose=True)

    print("[fonts_run] eval random-init baseline", flush=True)
    import jax
    import jax.numpy as jnp
    model = cfg.make_model()
    b0 = next(held_out_batches(cfg.model_args, label_range, n=64, batch=64))
    c0, a0 = jnp.asarray(b0["commands"]), jnp.asarray(b0["args"])
    variables = model.init(jax.random.PRNGKey(0), c0, a0, c0, a0,
                           label=jnp.asarray(b0["label"]))
    out["random_init"] = evaluate_batches(
        model, variables,
        held_out_batches(cfg.model_args, label_range, n=args.eval_n),
        verbose=True)

    print("[fonts_run] label-conditioned sample grids", flush=True)
    png = os.path.join(REPO, "docs", "artifacts", "fonts_samples.png")
    n_ok = render_label_grid(
        sess.model, sess.variables, sess.model.cfg,
        labels=list(range(args.grid_labels)), out_png=png)
    out["sample_grid"] = {"png": os.path.relpath(png, REPO),
                          "labels": args.grid_labels, "rendered": n_ok}
    out["wall_s"] = round(time.time() - t0, 1)

    path = os.path.join(REPO, "docs", "fonts_run.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(json.dumps({k: v for k, v in out.items() if k != "curve"},
                     indent=1, default=float))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
