"""Qualitative showcase from a TRAINED checkpoint: reconstruction and
latent-interpolation grids on held-out icons (VERDICT r4 next-step #4 —
"put the trained model to work": the reference's only quality mechanism is
eyeballed TB grids, reference configs/deepsvg/default_icons.py:79-97; this
renders the equivalent evidence from the committed end-state weights, next
to the numeric eval in docs/full_run_eval.json).

Outputs (default docs/artifacts/):
  showcase_recon.png    rows of [ground truth | greedy reconstruction]
  showcase_interp.png   rows of latent interpolations between icon pairs
  showcase.json         what was rendered, from which checkpoint

Run on the chip:
    python scripts/trained_showcase.py --checkpoint /tmp/full_run/models/full_run/r04/best.ckpt
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config-module",
                    default="configs_tpu.hierarchical_ordered")
    ap.add_argument("--out-dir", default=os.path.join(REPO, "docs",
                                                      "artifacts"))
    ap.add_argument("--n-recon", type=int, default=8,
                    help="held-out icons in the reconstruction grid")
    ap.add_argument("--n-pairs", type=int, default=4,
                    help="icon pairs in the interpolation grid")
    ap.add_argument("--interp-steps", type=int, default=6)
    ap.add_argument("--seed", type=int, default=90210,
                    help="held-out corpus seed (full_run.py eval default)")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                    help="force a jax platform BEFORE backend init (the "
                         "JAX_PLATFORMS env var alone does not override "
                         "this host's sitecustomize)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    from PIL import Image

    from deepsvg_tpu.data.synthetic import SyntheticAugmentedCorpus
    from deepsvg_tpu.inference import load_session
    from deepsvg_tpu.svglib.utils import make_grid_lines

    from deepsvg_tpu.training.config import load_config

    sess = load_session(args.config_module, args.checkpoint)
    # corpus dims from the TRAIN config (its max_total_len is the DATA
    # budget, e.g. 50 for the icons recipe — the model config's property is
    # the G*S packing bound, a different quantity)
    tcfg = load_config(args.config_module, 1)
    ds = SyntheticAugmentedCorpus(
        max(args.n_recon, 2 * args.n_pairs), n_augs=1, seed=args.seed,
        max_num_groups=tcfg.max_num_groups, max_seq_len=tcfg.max_seq_len,
        max_total_len=tcfg.max_total_len)
    os.makedirs(args.out_dir, exist_ok=True)

    def gt_svg(idx):
        from deepsvg_tpu.svglib.geom import Bbox
        from deepsvg_tpu.svglib.svg import SVG
        from deepsvg_tpu.svgtensor import cmd_args_to_data14

        item = ds.get_item_aug(idx, 0)
        rows = []
        for g in range(item["commands"].shape[0]):
            c, a = item["commands"][g], item["args"][g]
            real = (c != 4) & (c != 3)  # not EOS, not SOS
            if real.any():
                rows.append(cmd_args_to_data14(c[real], a[real]))
        t = np.concatenate(rows, axis=0)
        return (SVG.from_tensor(t, viewbox=Bbox(256)).normalize()
                .split_paths().set_color("random"))

    # --- reconstruction grid: [gt | recon] per row -----------------------
    batch = ds.get_batch_arrays(np.arange(args.n_recon))
    z = sess.encode(batch)
    recon = sess.decode(z, colored=True)
    rows = [[gt_svg(i), recon[i]] for i in range(args.n_recon)]
    img = make_grid_lines(rows).render(width=2 * 128)
    recon_png = os.path.join(args.out_dir, "showcase_recon.png")
    Image.fromarray(np.asarray(img)).save(recon_png)
    print(f"wrote {recon_png}")

    # --- interpolation grid: one strip per icon pair ---------------------
    strips = []
    for p in range(args.n_pairs):
        z1, z2 = z[2 * p % len(z)], z[(2 * p + 1) % len(z)]
        svgs = sess.interpolate(z1, z2, n=args.interp_steps,
                                include_endpoints=True)
        strips.append([s.copy().set_color("random").split_paths()
                       for s in svgs])
    img = make_grid_lines(strips).render(width=(args.interp_steps + 2) * 96)
    interp_png = os.path.join(args.out_dir, "showcase_interp.png")
    Image.fromarray(np.asarray(img)).save(interp_png)
    print(f"wrote {interp_png}")

    meta = {
        "checkpoint": args.checkpoint,
        "config": args.config_module,
        "held_out_seed": args.seed,
        "recon_png": os.path.relpath(recon_png, REPO),
        "interp_png": os.path.relpath(interp_png, REPO),
        "n_recon": args.n_recon,
        "n_pairs": args.n_pairs,
    }
    with open(os.path.join(args.out_dir, "showcase.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta, indent=1))


if __name__ == "__main__":
    main()
