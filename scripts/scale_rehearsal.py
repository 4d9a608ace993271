"""Scale rehearsal at icons_tensor-100k dimensions.

The real 100k-icon corpus (reference README.md:102-113: "100k icons,
pre-augmented tensor pickles, 3 GB zip") cannot be downloaded in this
environment, so every long training run so far was small-synthetic. This
script rehearses the reference training recipe AT THE REAL DATASET'S
DIMENSIONS with a synthetic pre-augmented corpus and the REAL runtime path:

- 100k icons x 10 precomputed augmentation variants, the ``SVGTensorDataset``
  contract (reference svgtensor_dataset.py:52,112,156) -> ~3 GB wire format,
  uploaded once and trained device-resident;
- the SHIPPED flagship config (``configs_tpu/hierarchical_ordered.py``, i.e.
  reference configs/deepsvg/default_icons.py:47-57): batch 60/device,
  AdamW + warmup/StepLR, KL ramp 0->10 over 10k steps (crossed in-run),
  visualize grids every val_every, checkpoints every ckpt_every;
- a multi-epoch segment through the real ``train()`` loop: epoch-boundary
  shuffles, resident build+upload (timed), K-step scan dispatch, sustained
  samples/s from the runtime's own step timer.

Writes ``docs/scale_rehearsal.json``; the prose report is
``docs/SCALE_REHEARSAL.md``.

Usage (on the TPU chip):
    python scripts/scale_rehearsal.py --icons 100000 --augs 10 \
        --max-steps 34000 --out docs/scale_rehearsal.json
"""
from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Tee(io.TextIOBase):
    """Mirror stdout into a buffer so the run log (resident-upload line,
    epoch banners, per-window loss) can be parsed into the report."""

    def __init__(self, inner):
        self.inner = inner
        self.buf = io.StringIO()

    def write(self, s):
        self.inner.write(s)
        self.buf.write(s)
        return len(s)

    def flush(self):
        self.inner.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--icons", type=int, default=100_000)
    ap.add_argument("--augs", type=int, default=10)
    ap.add_argument("--max-steps", type=int, default=34_000,
                    help="two full epochs of the aug-multiplied index space "
                         "(2 x 1M/60) + margin: crosses two epoch-boundary "
                         "shuffles and the 10k-step KL ramp")
    ap.add_argument("--config", default="configs_tpu.hierarchical_ordered")
    ap.add_argument("--log-dir", default="/tmp/scale_rehearsal")
    ap.add_argument("--out", default="docs/scale_rehearsal.json")
    ap.add_argument("--run-name", default="scale_rehearsal")
    ap.add_argument("--tag", default="r03")
    ap.add_argument("--keep-last", type=int, default=None,
                    help="checkpoint retention: keep newest N "
                         "(cfg.ckpt_keep_last); None keeps all")
    ap.add_argument("--keep-every", type=int, default=None,
                    help="also keep step multiples of this")
    ap.add_argument("--resume", action="store_true", default=False,
                    help="resume from the latest checkpoint under --log-dir "
                         "(relay-outage recovery for multi-hour runs)")
    args = ap.parse_args()

    from deepsvg_tpu.data.synthetic import SyntheticAugmentedCorpus
    from deepsvg_tpu.training.config import load_config
    from deepsvg_tpu.training.train import (
        enable_compilation_cache, set_seed, train)

    set_seed(42)
    enable_compilation_cache()

    cfg = load_config(args.config, 1)
    # label-conditioned configs (fonts): per-icon class labels at the
    # config's label count, aug-invariant (a glyph's class survives zoom/
    # translate) — the synthetic stand-in for the fonts corpus' label column
    label_range = None
    if getattr(cfg.model_cfg, "label_condition", False):
        # embedding table has n_labels slots (reference model/config.py:28
        # keeps 100 for fonts); the DATA uses one class per filtered glyph
        # (62 for 0-9A-Za-z), mirroring the real corpus' label column
        label_range = int(cfg.model_cfg.n_labels)
        if getattr(cfg, "filter_uni", None):
            label_range = min(label_range, len(cfg.filter_uni))

    print(f"[1/3] building corpus: {args.icons} icons x {args.augs} augs"
          + (f" ({label_range} classes)" if label_range else ""))
    t0 = time.time()
    dataset = SyntheticAugmentedCorpus(
        args.icons, n_augs=args.augs, seed=42,
        max_num_groups=cfg.max_num_groups, max_seq_len=cfg.max_seq_len,
        max_total_len=cfg.max_total_len, label_range=label_range)
    t_corpus = time.time() - t0
    print(f"  built in {t_corpus:.0f}s "
          f"({len(dataset)} variants)")
    # the recipe prints lr/time only (reference config.py stats_to_print);
    # add loss so the run log carries the curve for the report
    cfg.stats_to_print["train"] = ["loss", "lr", "time"]
    cfg.ckpt_keep_last = args.keep_last
    cfg.ckpt_keep_every = args.keep_every
    # wedged-relay protection: hard-exit so the orchestrator resumes
    # (r4 full run hung forever in a checkpoint fetch without this)
    cfg.stall_watchdog_s = 300.0
    steps_per_epoch = len(dataset) // cfg.batch_size

    print(f"[2/3] training {args.max_steps} steps through train() "
          f"(B={cfg.batch_size}, {steps_per_epoch} steps/epoch, "
          f"val_every={cfg.val_every}, ckpt_every={cfg.ckpt_every})")
    tee = _Tee(sys.stdout)
    sys.stdout = tee
    t0 = time.time()
    try:
        state, stats = train(cfg, args.run_name, args.tag,
                             log_dir=args.log_dir, dataset=dataset,
                             max_steps=args.max_steps, resume=args.resume)
    finally:
        sys.stdout = tee.inner
    t_train = time.time() - t0
    log = tee.buf.getvalue()

    print("[3/3] report")
    tstat = stats.stats["train"]["time"]
    # median of the trailing log windows: the first windows carry the jit
    # compiles (~45 s through the relay) and would skew a mean
    step_s = tstat.median
    final_step = int(state.step)
    resident_line = next(
        (ln for ln in log.splitlines() if "device-resident dataset" in ln), "")
    m = re.search(r"build ([\d.]+)s, upload ([\d.]+)s, (\d+) MB/s",
                  log)
    epochs_seen = len(re.findall(r"^Epoch \d+", log, re.M))
    curve = [
        {"step": int(s), "loss": float(l)}
        for s, l in re.findall(r"step (\d+)/\S+.*?loss: ([\d.]+)", log)
    ]
    if len(curve) > 2000:  # full-recipe runs log ~40k windows; thin the
        keep = max(len(curve) // 2000, 1)  # report but keep the endpoints
        curve = curve[::keep] + curve[-1:]
    ckpts = sorted(os.listdir(os.path.join(
        args.log_dir, "models", args.run_name, args.tag)))

    import jax

    from deepsvg_tpu.utils.flops import flops_per_sample, peak_flops_per_chip

    fps = flops_per_sample(cfg.model_cfg)
    peak = peak_flops_per_chip(jax.devices()[0].device_kind)
    sps = cfg.batch_size / step_s if step_s else 0.0
    report = {
        "corpus": {"icons": args.icons, "augs": args.augs,
                   "build_s": round(t_corpus, 1),
                   "resident_line": resident_line.strip()},
        "config": args.config,
        "batch_size": cfg.batch_size,
        "steps_per_epoch": steps_per_epoch,
        "steps_run": final_step,
        "epochs_crossed": epochs_seen,
        "wall_s_total": round(t_train, 1),
        "step_s_sustained": round(step_s, 5),
        "samples_per_s_sustained": round(sps, 1),
        "train_mfu": (round(sps * 3 * fps / peak, 4) if peak else None),
        "loss_first": curve[0] if curve else None,
        "loss_last": curve[-1] if curve else None,
        "kl_ramp_crossed_10k": final_step >= 10_000,
        "checkpoints": ckpts,
        "curve": curve,
        "extrapolation": {
            "epoch_samples": len(dataset),
            "recipe_50_epochs_h": round(
                50 * steps_per_epoch * step_s / 3600, 2),
            "note": "epoch = n_icons x n_augs samples (the reference "
                    "__len__ contract, svgtensor_dataset.py:112); the "
                    "PERFORMANCE.md 1.8h figure assumed 100k samples/epoch "
                    "- that recipe is 50*100000/B steps:",
            "recipe_50x100k_h": round(
                50 * (args.icons / cfg.batch_size) * step_s / 3600, 2),
        },
    }
    if m:
        report["corpus"]["resident_build_s"] = float(m.group(1))
        report["corpus"]["resident_upload_s"] = float(m.group(2))
        report["corpus"]["resident_upload_mb_s"] = int(m.group(3))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "curve"},
                     indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
