"""Held-out reconstruction eval at mid-run milestone checkpoints: the
training-progress counterpart to full_run.py's final-vs-random eval
(VERDICT r4 next-step #1: "final checkpoint vs random init AND vs a
mid-run milestone"). Same held-out corpus (seed 90210) and metrics as the
end-state eval, so the rows are directly comparable.

Writes docs/full_run_milestone_eval.json, which report_full_run.py embeds
as the "Training progress" table.

Run on the chip (after the full run):
    python scripts/milestone_eval.py [--steps 100000 400000 700000] [--n 512]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="/tmp/full_run/models/full_run/r04")
    ap.add_argument("--config-module",
                    default="configs_tpu.hierarchical_ordered")
    ap.add_argument("--steps", type=int, nargs="*", default=None,
                    help="milestone steps to eval (default: ~4 spread over "
                         "the retained milestones)")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "full_run_milestone_eval.json"))
    args = ap.parse_args()

    from full_run import held_out_batches

    from deepsvg_tpu.evaluation import evaluate_batches
    from deepsvg_tpu.inference import load_session
    from deepsvg_tpu.training.config import load_config

    cfg = load_config(args.config_module, 1)

    ckpts = {}
    for p in glob.glob(os.path.join(args.ckpt_dir, "*.ckpt")):
        m = re.fullmatch(r"(\d{6})\.ckpt", os.path.basename(p))
        if m:
            ckpts[int(m.group(1))] = p
    assert ckpts, f"no step checkpoints under {args.ckpt_dir}"

    steps = args.steps
    if not steps:
        avail = sorted(ckpts)
        want = [avail[round(i * (len(avail) - 1) / 3)] for i in range(4)]
        steps = sorted(set(want))

    out = {"held_out_n": args.n, "milestones": []}
    for want in steps:
        step = min(ckpts, key=lambda s: abs(s - want))
        path = ckpts[step]
        print(f"[milestone_eval] step {step}: {path}", flush=True)
        sess = load_session(args.config_module, path)
        res = evaluate_batches(
            sess.model, sess.variables,
            held_out_batches(cfg.model_args, n=args.n), verbose=True)
        res["step"] = step
        res["checkpoint"] = path
        out["milestones"].append(res)

    out["milestones"].sort(key=lambda m: m["step"])
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(json.dumps(out, indent=1, default=float))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
