"""CLI reconstruction eval: held-out quantitative metrics for a checkpoint.

The quantitative "done" criterion the reference lacks (its quality check is
eyeballing TB grids): runs the deepsvg_tpu.evaluation harness over a
held-out slice of the config's dataset and prints one JSON line.

    python scripts/eval_recon.py --config-module configs_tpu.hierarchical_ordered \\
        --checkpoint runs/.../ckpt --n 1024 [--out docs/eval_recon.json]

With no --checkpoint, evaluates randomly initialized weights (smoke mode).
"""
from __future__ import annotations

import argparse
import importlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS before first backend use: the ambient sitecustomize
# registers a remote-TPU plugin and re-points jax_platforms at it, so the
# env var alone is ignored — and when the relay is down, backend init HANGS
# (docs/NOTES.md). jax.config.update before first use is the only override
# that works.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def iter_batches(dataset, cfg, n, batch_size, seed=1234):
    """Deterministic held-out slice: the LAST ``n`` indices of the dataset
    (training samples uniformly at random from the front under the synthetic
    loaders; for real corpora pass a dedicated val meta split instead)."""
    total = len(dataset)
    n = min(n, total)
    start = total - n
    idx = np.arange(start, total)
    keys = [k for k in cfg.model_args if k in ("commands", "args", "label")]
    for lo in range(0, n, batch_size):
        sel = idx[lo : lo + batch_size]
        if hasattr(dataset, "get_batch_arrays"):
            b = dataset.get_batch_arrays(sel)
        else:
            items = [dataset[int(i)] for i in sel]
            b = {k: np.stack([it[k] for it in items]) for k in items[0]}
        yield {k: b[k] for k in keys if k in b}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config-module", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--dataset-module", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--emd-points", type=int, default=48)
    ap.add_argument("--match-groups", action="store_true", default=False,
                    help="Hungarian-match groups by pairwise EMD before "
                         "scoring (self-match / permutation-invariant "
                         "models; index matching is wrong for those)")
    args = ap.parse_args(argv)

    from deepsvg_tpu.evaluation import evaluate_batches
    from deepsvg_tpu.training.config import load_config

    cfg = load_config(args.config_module, 1)
    if args.dataset_module:
        cfg.dataloader_module = args.dataset_module
    dataset = importlib.import_module(cfg.dataloader_module).load_dataset(cfg)

    if args.checkpoint:
        from deepsvg_tpu.inference import load_session

        session = load_session(args.config_module, args.checkpoint)
        model, variables = session.model, session.variables
    else:
        import jax
        import jax.numpy as jnp

        model = cfg.make_model()
        b = next(iter_batches(dataset, cfg, args.batch_size, args.batch_size))
        c0, a0 = jnp.asarray(b["commands"]), jnp.asarray(b["args"])
        kw = {}
        if "label" in b:
            kw["label"] = jnp.asarray(b["label"])
        variables = model.init(jax.random.PRNGKey(0), c0, a0, c0, a0, **kw)

    res = evaluate_batches(
        model, variables,
        iter_batches(dataset, cfg, args.n, args.batch_size),
        emd_points=args.emd_points, match_groups=args.match_groups,
        verbose=True,
    )
    res["config"] = args.config_module
    res["checkpoint"] = args.checkpoint or "(random init)"
    line = json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                       for k, v in res.items()})
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
