"""The FULL 50-epoch reference recipe at icons_tensor-100k dimensions
(VERDICT r3 "Missing #3": the complete schedule has never executed — all
~20 StepLR decays, KL at cap for 99% of training, 400+ visualize cycles,
checkpoint rotation, multi-hour thermal/relay stability).

Orchestrates:
  1. scripts/scale_rehearsal.py --max-steps 833300 (= 50 epochs x 16,666
     steps at B=60 over the 1M-variant corpus, reference
     configs/deepsvg/default_icons.py:47 epochs=50) with checkpoint
     retention (keep last 20 + every 50k-step milestone);
  2. the quantitative end-state eval (deepsvg_tpu.evaluation) on a
     HELD-OUT synthetic corpus (fresh icon seed, same generator family),
     final checkpoint vs random init;
  3. writes docs/full_run_eval.json (the curve/wall data lands in
     docs/full_run.json from step 1). docs/FULL_RUN.md is the prose report.

Run on the chip (takes ~3.5 h):
    python scripts/full_run.py [--max-steps N] [--skip-train]

Relay-outage hardened: the axon relay goes UNAVAILABLE for >1 h stretches
(docs/NOTES.md), so the schedule runs as resumable segments — each attempt
picks up from the latest checkpoint (train() --resume), the orchestrator
probes the chip between attempts, and segment reports are merged into
docs/full_run.json (curve concatenated, wall time split into pure-train vs
with-outages).
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
LOG_DIR = "/tmp/full_run"
RUN, TAG = "full_run", "r04"


def held_out_batches(cfg_model_args, n=1024, batch=64, seed=90210):
    """Fresh-seed corpus: same generator family as training (seed 42),
    disjoint icons — a true held-out split for the synthetic distribution."""
    import numpy as np

    from deepsvg_tpu.data.synthetic import SyntheticAugmentedCorpus

    ds = SyntheticAugmentedCorpus(n, n_augs=1, seed=seed)
    keys = [k for k in cfg_model_args if k in ("commands", "args", "label")]
    for lo in range(0, n, batch):
        b = ds.get_batch_arrays(np.arange(lo, min(lo + batch, n)))
        yield {k: b[k] for k in keys if k in b}


def wait_for_chip(probe_timeout=120, sleep_s=180, max_wait_s=6 * 3600):
    """Block until the TPU relay answers (it goes UNAVAILABLE for >1 h
    stretches — docs/NOTES.md). Probes in a subprocess under a hard timeout
    because backend init can hang rather than raise."""
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        r = subprocess.run(
            ["timeout", str(probe_timeout), sys.executable,
             os.path.join(REPO, "scripts/probe_chip.py")],
            capture_output=True, text=True)
        if r.returncode == 0:
            print(f"[full_run] chip up: {r.stdout.strip()}", flush=True)
            return
        print(f"[full_run] chip down ({r.stdout.strip() or 'probe hang'}); "
              f"retry in {sleep_s}s", flush=True)
        time.sleep(sleep_s)
    raise RuntimeError(f"chip unavailable for {max_wait_s}s")


def curve_from_tensorboard(tb_root, tag="train/loss", max_points=2000):
    """Reconstruct the full loss curve from TensorBoard event files — the
    authoritative record across attempts: a segment killed mid-run (relay
    outage, orchestrator restart) never writes its JSON report, but its TB
    events are already on disk. Dedups by step (later attempts win), sorted;
    downsampled to ~max_points keeping the endpoints."""
    import glob as _glob

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    by_step = {}
    for d in sorted(_glob.glob(os.path.join(tb_root, "*"))):
        try:
            ea = EventAccumulator(d, size_guidance={"scalars": 0})
            ea.Reload()
            if tag not in ea.Tags().get("scalars", []):
                continue
            for ev in ea.Scalars(tag):
                by_step[int(ev.step)] = float(ev.value)
        except Exception as e:  # one corrupt event file must not kill the report
            print(f"[full_run] tb read failed for {d}: {e}", flush=True)
    curve = [{"step": s, "loss": round(v, 5)}
             for s, v in sorted(by_step.items())]
    if len(curve) > max_points:
        keep = len(curve) // max_points + 1
        curve = curve[::keep] + curve[-1:]
    return curve


def merge_segments(segments):
    """Merge per-attempt scale_rehearsal reports into one run report:
    last segment's config/ckpt fields, summed pure-train wall time and
    epoch crossings, concatenated loss curve."""
    merged = dict(segments[-1])
    merged["wall_s_total"] = round(sum(s["wall_s_total"] for s in segments), 1)
    merged["attempts"] = len(segments)
    merged["epochs_crossed"] = sum(s["epochs_crossed"] for s in segments)
    curve = []
    for s in segments:
        curve.extend(s.get("curve") or [])
    merged["curve"] = curve
    merged["loss_first"] = curve[0] if curve else None
    merged["loss_last"] = curve[-1] if curve else None
    return merged


def train_with_retries(max_steps, max_attempts=60):
    """Run the training schedule to completion across relay outages: each
    attempt resumes from the latest checkpoint; segment reports are merged
    into docs/full_run.json."""
    os.makedirs(LOG_DIR, exist_ok=True)
    segments = []
    t0 = time.time()
    for attempt in range(max_attempts):
        seg_out = os.path.join(LOG_DIR, f"segment_{attempt:02d}.json")
        cmd = [sys.executable, os.path.join(REPO, "scripts/scale_rehearsal.py"),
               "--max-steps", str(max_steps),
               "--run-name", RUN, "--tag", TAG,
               "--keep-last", "20", "--keep-every", "50000",
               "--log-dir", LOG_DIR, "--out", seg_out]
        # resume whenever a checkpoint already exists — not just on attempt>0:
        # the orchestrator itself may be relaunched mid-run (session restart),
        # and a fresh attempt 0 must not restart training from step 0
        ckpt_glob = os.path.join(LOG_DIR, "models", RUN, TAG, "*.ckpt")
        if attempt > 0 or glob.glob(ckpt_glob):
            cmd.append("--resume")
        print(f"[full_run] attempt {attempt}: {' '.join(cmd)}", flush=True)
        rc = subprocess.run(cmd).returncode
        if os.path.exists(seg_out):
            with open(seg_out) as f:
                segments.append(json.load(f))
        if rc == 0:
            steps = segments[-1]["steps_run"] if segments else 0
            if steps >= max_steps:
                break
            print(f"[full_run] exited clean at step {steps} < {max_steps}; "
                  "resuming", flush=True)
        else:
            print(f"[full_run] attempt {attempt} died rc={rc}; waiting for "
                  "the chip before resuming", flush=True)
            wait_for_chip()
    else:
        raise RuntimeError(f"{max_attempts} attempts exhausted")

    merged = merge_segments(segments)
    # train.py writes events under tensorboard/full/<run>_<tag>_<datetime>
    tb_curve = curve_from_tensorboard(os.path.join(LOG_DIR, "tensorboard",
                                                   "full"))
    if tb_curve:  # segment reports miss killed attempts; TB has everything
        merged["curve"] = tb_curve
        merged["loss_first"] = tb_curve[0]
        merged["loss_last"] = tb_curve[-1]
    merged["wall_s_with_outages"] = round(time.time() - t0, 1)
    path = os.path.join(REPO, "docs", "full_run.json")
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"[full_run] training done in {(time.time()-t0)/3600:.2f} h "
          f"({len(segments)} attempt(s)); wrote {path}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-steps", type=int, default=833_300)
    ap.add_argument("--skip-train", action="store_true",
                    help="only run the end-state eval against an existing "
                         f"{LOG_DIR} checkpoint tree")
    ap.add_argument("--eval-n", type=int, default=1024)
    args = ap.parse_args()

    if not args.skip_train:
        train_with_retries(args.max_steps)

    # ---- end-state eval ----------------------------------------------------
    from deepsvg_tpu.evaluation import evaluate_batches
    from deepsvg_tpu.inference import load_session
    from deepsvg_tpu.training.config import load_config

    ckpt_dir = os.path.join(LOG_DIR, "models", RUN, TAG)
    from deepsvg_tpu.training.checkpoint import latest_ckpt
    ckpt = latest_ckpt(ckpt_dir)
    assert ckpt, f"no checkpoint under {ckpt_dir}"
    cfg = load_config("configs_tpu.hierarchical_ordered", 1)

    out = {"checkpoint": ckpt}
    print(f"[full_run] eval final: {ckpt}", flush=True)
    sess = load_session("configs_tpu.hierarchical_ordered", ckpt)
    out["final"] = evaluate_batches(
        sess.model, sess.variables,
        held_out_batches(cfg.model_args, n=args.eval_n), verbose=True)

    print("[full_run] eval random-init baseline", flush=True)
    import jax
    import jax.numpy as jnp
    model = cfg.make_model()
    b0 = next(held_out_batches(cfg.model_args, n=64, batch=64))
    c0, a0 = jnp.asarray(b0["commands"]), jnp.asarray(b0["args"])
    variables = model.init(jax.random.PRNGKey(0), c0, a0, c0, a0)
    out["random_init"] = evaluate_batches(
        model, variables,
        held_out_batches(cfg.model_args, n=args.eval_n), verbose=True)

    path = os.path.join(REPO, "docs", "full_run_eval.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(json.dumps(out, indent=1, default=float))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
