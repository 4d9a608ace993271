"""Throughput of the raw-SVG STREAMING training path (reference
svg_dataset.py:109-156): on-the-fly parse + canonicalize/simplify +
continuous augmentation per access — the documented fallback for corpora
without pre-tensorized pickles. Resident mode cannot cover it (augmentation
is a continuous transform, data/resident.py docstring), so the input
pipeline is host-bound python; this measures how host-bound, end to end.

Stages measured:
1. per-item ``get()`` rate, already_preprocessed True (parse+augment+
   numericalize) and False (adds canonicalize + simplify_heuristic);
2. ``DataLoader`` batch rate, thread vs process workers (this host: 1 core);
3. sustained end-to-end ``train()`` samples/s on the chip with the flagship
   config forced onto the streaming pipeline (device_resident off).

Corpus: the reference repo's in-tree SVGs (docs/frames + dolphin),
preprocessed by our CLI — the same fixtures the parity harness uses.

Writes a JSON report; the PERFORMANCE.md section quotes it.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(workdir: str):
    from deepsvg_tpu.data.preprocess import run as preprocess_main

    src = os.path.join(workdir, "svgs")
    out = os.path.join(workdir, "simplified")
    meta = os.path.join(workdir, "meta.csv")
    if os.path.exists(meta):
        return out, meta
    os.makedirs(src, exist_ok=True)
    os.makedirs(out, exist_ok=True)
    files = sorted(glob.glob("/root/reference/docs/frames/*.svg"))
    files += sorted(glob.glob("/root/reference/docs/imgs/dolphin.svg"))
    for f in files:
        shutil.copy(f, src)
    preprocess_main(argparse.Namespace(
        data_folder=src, output_folder=out, output_meta_file=meta, workers=1))
    return out, meta


def bench_items(ds, n: int, label: str) -> float:
    t0 = time.time()
    for i in range(n):
        ds[i % len(ds)]
    rate = n / (time.time() - t0)
    print(f"  {label}: {rate:.1f} items/s")
    return rate


def bench_loader(ds, batch_size: int, n_batches: int, workers: int,
                 mode: str) -> float:
    from deepsvg_tpu.data.loader import DataLoader

    loader = DataLoader(ds, batch_size=batch_size, num_workers=workers,
                        worker_mode=mode)
    it = iter(loader)
    next(it)  # warm (spawns the pool in process mode)
    t0 = time.time()
    got = 1
    for _ in range(n_batches - 1):
        try:
            next(it)
            got += 1
        except StopIteration:
            it = iter(loader)
    rate = got * batch_size / (time.time() - t0)
    loader.close()
    print(f"  loader B={batch_size} workers={workers} ({mode}): "
          f"{rate:.1f} samples/s")
    return rate


def bench_train_e2e(out_dir: str, meta: str, steps: int) -> dict:
    """The real train() loop, streaming pipeline forced (no resident)."""
    from deepsvg_tpu.data.dataset import SVGDataset
    from deepsvg_tpu.training.config import load_config
    from deepsvg_tpu.training.train import enable_compilation_cache, train

    enable_compilation_cache()
    cfg = load_config("configs_tpu.hierarchical_ordered", 1)
    cfg.device_resident = False          # the point of this bench
    cfg.log_every = 20
    cfg.val_every = 10**9
    cfg.ckpt_every = 10**9
    # nb_augmentations multiplies the index space (reference
    # svg_dataset len contract) so B=60 epochs are non-degenerate over the
    # 14-icon fixture corpus; each access still draws a fresh continuous
    # augmentation
    ds = SVGDataset(out_dir, meta, cfg.model_args, cfg.max_num_groups,
                    cfg.model_cfg.max_seq_len,
                    max_total_len=cfg.max_total_len,
                    already_preprocessed=True, nb_augmentations=200)
    print(f"  dataset: {len(ds)} icons, B={cfg.batch_size}")
    t0 = time.time()
    state, stats = train(cfg, "bench_raw", "stream",
                         log_dir="/tmp/bench_raw_svg", debug=True,
                         dataset=ds, max_steps=steps)
    wall = time.time() - t0
    sv = stats.stats["train"]["time"]
    step_s = sv.global_avg           # includes the first-step compiles
    steady_s = sv.median             # last-window median: steady state
    return {
        "steps": int(state.step),
        "wall_s": round(wall, 1),
        "step_s_incl_compile": round(step_s, 4),
        "steady_step_s": round(steady_s, 4),
        "steady_samples_per_s": (
            round(cfg.batch_size / steady_s, 1) if steady_s else None),
        "batch_size": cfg.batch_size,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/raw_svg_bench")
    ap.add_argument("--items", type=int, default=60)
    ap.add_argument("--train-steps", type=int, default=60)
    ap.add_argument("--out", default="docs/raw_svg_stream.json")
    args = ap.parse_args()

    from deepsvg_tpu.data.dataset import SVGDataset

    print("[1/4] corpus (reference in-tree SVGs through our preprocess CLI)")
    out_dir, meta = build_corpus(args.workdir)

    g, s = 8, 30
    ds = SVGDataset(out_dir, meta, ["commands", "args"], g, s,
                    max_total_len=50, already_preprocessed=True,
                    nb_augmentations=200)
    ds_full = SVGDataset(out_dir, meta, ["commands", "args"], g, s,
                         max_total_len=50, already_preprocessed=False,
                         nb_augmentations=200)
    print(f"[2/4] per-item get() ({len(ds.df)} icons)")
    report = {"n_icons": len(ds.df)}
    report["items_per_s_preprocessed"] = round(
        bench_items(ds, args.items, "preprocessed (parse+augment+numericalize)"), 1)
    report["items_per_s_full"] = round(
        bench_items(ds_full, max(args.items // 4, 8),
                    "full (adds canonicalize+simplify_heuristic)"), 1)

    print("[3/4] DataLoader")
    report["loader"] = {}
    for workers, mode in [(1, "thread"), (4, "thread"), (4, "process")]:
        report["loader"][f"{mode}{workers}"] = round(
            bench_loader(ds, 60, 6, workers, mode), 1)

    print("[4/4] end-to-end train() on the chip, streaming pipeline")
    report["train_e2e"] = bench_train_e2e(out_dir, meta, args.train_steps)
    print(json.dumps(report, indent=1))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
