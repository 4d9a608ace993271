"""Render docs/FULL_RUN.md from the full-run artifacts.

Inputs (written by scripts/full_run.py):
  docs/full_run.json       merged training report (curve, wall time, attempts)
  docs/full_run_eval.json  held-out end-state eval (final vs random-init)
Optional:
  --tb-root                TensorBoard event root (default /tmp/full_run/
                           tensorboard/full). When present, the LR staircase
                           is extracted and embedded into docs/full_run.json
                           (key "lr_decays") so the schedule evidence is
                           committed alongside the curve.

The report documents the COMPLETE reference recipe (50 epochs at B=60 over
the 1M-variant corpus, reference configs/deepsvg/default_icons.py:47-57)
executed end to end — the deliverable VERDICT r3 "Missing #3" asked for.
"""
from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(REPO, "docs")


def read_lr_decays(tb_root, tag="train/lr"):
    """The lr staircase as (step, lr) change points, from TB events."""
    import glob

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    by_step = {}
    for d in sorted(glob.glob(os.path.join(tb_root, "*"))):
        try:
            ea = EventAccumulator(d, size_guidance={"scalars": 0})
            ea.Reload()
            if tag not in ea.Tags().get("scalars", []):
                continue
            for ev in ea.Scalars(tag):
                by_step[int(ev.step)] = float(ev.value)
        except Exception as e:
            print(f"[report] tb read failed for {d}: {e}")
    if not by_step:
        return []
    # keep the post-warmup staircase: change points after the lr peak
    # (warmup ramps every step; TB medians also smear decay boundaries,
    # so use a relative threshold)
    items = sorted(by_step.items())
    peak_i = max(range(len(items)), key=lambda i: items[i][1])
    decays, prev = [], None
    for s, v in items[peak_i:]:
        if prev is None or abs(v - prev) > 0.005 * prev:
            decays.append({"step": s, "lr": v})
            prev = v
    return decays


def sample_curve(curve, n=12):
    """~n evenly spaced points of the loss curve, endpoints pinned."""
    if len(curve) <= n:
        return curve
    idx = [round(i * (len(curve) - 1) / (n - 1)) for i in range(n)]
    return [curve[i] for i in sorted(set(idx))]


def fmt(v, nd=4):
    return f"{v:.{nd}f}" if isinstance(v, float) else str(v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tb-root", default="/tmp/full_run/tensorboard/full")
    ap.add_argument("--out", default=os.path.join(DOCS, "FULL_RUN.md"))
    args = ap.parse_args()

    with open(os.path.join(DOCS, "full_run.json")) as f:
        run = json.load(f)
    with open(os.path.join(DOCS, "full_run_eval.json")) as f:
        ev = json.load(f)

    if os.path.isdir(args.tb_root):
        decays = read_lr_decays(args.tb_root)
        if decays:
            run["lr_decays"] = decays
            with open(os.path.join(DOCS, "full_run.json"), "w") as f:
                json.dump(run, f, indent=1)
    decays = run.get("lr_decays") or []

    steps = run["steps_run"]
    spe = run["steps_per_epoch"]
    b = run["batch_size"]
    wall_pure = run["wall_s_total"]
    wall_out = run.get("wall_s_with_outages")
    curve = run.get("curve") or []

    lines = []
    a = lines.append
    a("# FULL_RUN — the complete 50-epoch reference recipe, end to end")
    a("")
    a("The reference's deliverable is a trained model: 50 epochs at B=60 "
      "over the ~1M-variant icons corpus "
      "(reference `configs/deepsvg/default_icons.py:47-57` — epochs=50, "
      f"~{spe:,} steps/epoch -> ~{50*spe:,} steps, every StepLR decay, the "
      "KL ramp at its cap for 99% of training, continuous checkpoint "
      "rotation and visualize cycles). VERDICT r3 'Missing #3' noted this "
      "schedule had never executed. This run executed it on one real TPU "
      "chip, at icons_tensor-100k dimensions over the synthetic corpus "
      "(the real corpus is not downloadable here — see "
      "`scripts/run_real_parity.sh` for the networked-host runbook).")
    a("")
    a("## Schedule & throughput")
    a("")
    a("| quantity | value |")
    a("|---|---|")
    a(f"| config | `{run['config']}` (flagship hierarchical-ordered) |")
    a(f"| corpus | {run['corpus']['icons']:,} icons x "
      f"{run['corpus']['augs']} aug variants, device-resident in HBM |")
    a(f"| batch / steps-per-epoch | {b} / {spe:,} |")
    a(f"| steps completed | **{steps:,}** "
      f"({steps/spe:.1f} epochs, {run['epochs_crossed']} epoch crossings "
      "observed) |")
    est_chip_h = steps * run["step_s_sustained"] / 3600
    a(f"| pure chip time (steps x sustained step) | **{est_chip_h:.2f} h** |")
    a(f"| measured segment wall time | {wall_pure/3600:.2f} h over "
      f"{run.get('attempts', 1)} clean segment(s) (killed attempts — relay "
      "outages, session restarts — log to TB only; their wall time shows "
      "in the row below) |")
    if wall_out:
        a(f"| final-instance wall incl. outages | {wall_out/3600:.2f} h |")
    if run.get("wall_clock_first_to_last_s"):
        a(f"| first step to last artifact (wall clock, "
          f"{run.get('orchestrator_instances', 1)} orchestrator instance(s) "
          "across relay outages) | "
          f"{run['wall_clock_first_to_last_s']/3600:.2f} h |")
    a(f"| sustained step time | {run['step_s_sustained']*1e3:.2f} ms |")
    a(f"| sustained throughput | **{run['samples_per_s_sustained']:,.0f} "
      "samples/s/chip** |")
    if run.get("train_mfu") is not None:
        a(f"| train MFU at the recipe batch (B={b}) | "
          f"{100*run['train_mfu']:.1f}% |")
    a(f"| KL ramp crossed its 10k-step cap | "
      f"{run.get('kl_ramp_crossed_10k')} |")
    a(f"| checkpoints retained | {len(run.get('checkpoints', []))} "
      "(last 20 + every 50k-step milestone) |")
    a("")
    a("## Loss curve (TensorBoard `train/loss`, all segments merged)")
    a("")
    a("| step | loss |")
    a("|---|---|")
    for p in sample_curve(curve):
        a(f"| {p['step']:,} | {p['loss']:.4f} |")
    a("")
    if decays:
        a(f"## LR schedule — warmup + {len(decays)-1} change points "
          "observed (StepLR x0.9, double-stepped bit-exactly like the "
          "reference — `training/schedulers.py`)")
        a("")
        a("| step | lr |")
        a("|---|---|")
        show = decays if len(decays) <= 24 else (
            decays[:4] + [{"step": "...", "lr": "..."}] + decays[-18:])
        for d in show:
            s = d["step"]
            a(f"| {s if isinstance(s, str) else format(s, ',')} | "
            + (d["lr"] if isinstance(d["lr"], str)
               else f"{d['lr']:.6f}") + " |")
        a("")
    a("## End-state eval — held-out reconstruction "
      "(`deepsvg_tpu/evaluation.py`)")
    a("")
    a("Fresh-seed synthetic corpus (disjoint icons, same generator "
      "family), greedy encode->decode reconstruction vs ground truth; "
      "random-init same-architecture baseline for scale. The reference "
      "has no quantitative equivalent (its quality check is eyeballing "
      "TB grids, `default_icons.py:79-97`).")
    a("")
    a("| metric | final checkpoint | random init |")
    a("|---|---|---|")
    fin, rnd = ev["final"], ev["random_init"]
    rows = [("visibility accuracy", "vis_acc", 4),
            ("command-type accuracy", "cmd_acc", 4),
            ("args MAE (grid units)", "args_mae", 3),
            ("chamfer (canonical units)", "chamfer", 5),
            ("EMD (canonical units)", "emd", 5)]
    for label, k, nd in rows:
        a(f"| {label} | **{fin[k]:.{nd}f}** | {rnd[k]:.{nd}f} |")
    a(f"| groups scored (EMD) | {fin['n_groups_emd']:.0f} | "
      f"{rnd['n_groups_emd']:.0f} |")
    a("")
    a(f"Final checkpoint: `{ev['checkpoint']}`.")
    a("")
    mil_path = os.path.join(DOCS, "full_run_milestone_eval.json")
    if os.path.exists(mil_path):
        with open(mil_path) as f:
            mil = json.load(f)
        a("## Training progress — same eval at mid-run milestones")
        a("")
        a("| checkpoint step | cmd_acc | args_mae | chamfer | emd |")
        a("|---|---|---|---|---|")
        for m in mil["milestones"]:
            a(f"| {m['step']:,} | {m['cmd_acc']:.4f} | "
              f"{m['args_mae']:.3f} | {m['chamfer']:.5f} | "
              f"{m['emd']:.5f} |")
        a("")
    sc_path = os.path.join(DOCS, "artifacts", "showcase.json")
    if os.path.exists(sc_path):
        with open(sc_path) as f:
            sc = json.load(f)
        a("## Qualitative showcase (held-out icons, final weights)")
        a("")
        a(f"![reconstructions]({os.path.join('artifacts', os.path.basename(sc['recon_png']))})")
        a("")
        a(f"Rows: ground truth | greedy reconstruction "
          f"({sc['n_recon']} held-out icons).")
        a("")
        a(f"![interpolations]({os.path.join('artifacts', os.path.basename(sc['interp_png']))})")
        a("")
        a(f"Latent interpolation strips between {sc['n_pairs']} held-out "
          "icon pairs (endpoints included). Rendered by "
          "`scripts/trained_showcase.py`.")
        a("")
    a("## Stability incidents")
    a("")
    a("See docs/NOTES.md 'Round 4' for the incident log (relay outages, "
      "the pytest-contention poisoning of a live attempt, and the "
      "checkpoint-save batching that keeps save pauses ~1 s). Every "
      "incident was recovered by the orchestrator's resume-from-latest "
      "logic (`scripts/full_run.py train_with_retries`).")
    a("")
    a("Regenerate: `python scripts/report_full_run.py` (artifacts: "
      "`docs/full_run.json`, `docs/full_run_eval.json`).")
    a("")

    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
