"""Extract the weights-only end-state artifact from the full run's final
checkpoint (the 124 MB train checkpoints carry AdamW state; the committed
artifact is the f32 params alone via ``training.checkpoint.save_model``,
loadable with ``inference.load_session(..., weights_only=...)`` /
``load_model``).

Usage: python scripts/extract_final_params.py [--ckpt-dir DIR] [--out PATH]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir",
                    default="/tmp/full_run/models/full_run/r04")
    ap.add_argument("--config", default="configs_tpu.hierarchical_ordered")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "artifacts", "full_run_final_params.msgpack"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # no chip needed to repack

    from deepsvg_tpu.inference import load_session
    from deepsvg_tpu.training.checkpoint import latest_ckpt, save_model

    ckpt = latest_ckpt(args.ckpt_dir)
    assert ckpt, f"no checkpoint under {args.ckpt_dir}"
    sess = load_session(args.config, ckpt)
    save_model(args.out, sess.variables["params"])
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB) "
          f"from {ckpt}")


if __name__ == "__main__":
    main()
