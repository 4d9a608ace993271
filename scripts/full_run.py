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
"""
from __future__ import annotations

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-steps", type=int, default=833_300)
    ap.add_argument("--skip-train", action="store_true",
                    help="only run the end-state eval against an existing "
                         f"{LOG_DIR} checkpoint tree")
    ap.add_argument("--eval-n", type=int, default=1024)
    args = ap.parse_args()

    if not args.skip_train:
        cmd = [sys.executable, os.path.join(REPO, "scripts/scale_rehearsal.py"),
               "--max-steps", str(args.max_steps),
               "--run-name", RUN, "--tag", TAG,
               "--keep-last", "20", "--keep-every", "50000",
               "--log-dir", LOG_DIR,
               "--out", os.path.join(REPO, "docs", "full_run.json")]
        print("[full_run] launching:", " ".join(cmd), flush=True)
        t0 = time.time()
        subprocess.run(cmd, check=True)
        print(f"[full_run] training done in {(time.time()-t0)/3600:.2f} h",
              flush=True)

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
