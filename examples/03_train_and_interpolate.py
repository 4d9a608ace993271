"""Train + latent interpolation — parity with notebooks/interpolation.ipynb
and latent_ops.ipynb, self-contained on synthetic data.

Trains a small hierarchical model for a few hundred steps, then:
- reconstructs icons from latents,
- interpolates between two icons (one batched decode),
- applies a latent direction.
"""
import os
import sys

try:
    import deepsvg_tpu  # noqa: F401  (installed via `pip install -e .`)
except ImportError:  # running from a source checkout without installing
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from deepsvg_tpu.data.loader import DataLoader
from deepsvg_tpu.data.synthetic import SyntheticIconDataset
from deepsvg_tpu.inference import InferenceSession
from deepsvg_tpu.models import ModelConfig, SVGTransformer
from deepsvg_tpu.svglib.utils import make_grid
from deepsvg_tpu.training.schedulers import warmup_step_decay
from deepsvg_tpu.training.trainer import create_train_state, jit_train_step, make_optimizer

OUT = os.path.join(os.path.dirname(__file__), "out")

WEIGHTS = dict(
    kl_tolerance=0.1, loss_kl_weight=1.0, loss_visibility_weight=1.0,
    loss_cmd_weight=1.0, loss_args_weight=2.0,
)


def main(steps=300):
    os.makedirs(OUT, exist_ok=True)

    cfg = ModelConfig(
        encode_stages=2, decode_stages=2, use_vae=False,
        max_num_groups=4, max_seq_len=12, d_model=96, dim_feedforward=192,
        dim_z=48, n_layers=2, n_layers_decode=2, dropout=0.0,
    )
    model = SVGTransformer(cfg)
    model_args = cfg.get_model_args()

    ds = SyntheticIconDataset(n=256, max_num_groups=cfg.max_num_groups,
                              max_seq_len=cfg.max_seq_len)
    loader = DataLoader(ds, batch_size=32, num_workers=2)

    batch0 = next(iter(loader))
    batch0 = {k: v for k, v in batch0.items() if k in set(model_args)}
    optimizer = make_optimizer(warmup_step_decay(2e-3, 50, 10_000))
    state = create_train_state(model, optimizer, batch0, model_args)
    step_fn = jit_train_step(model, optimizer, model_args)

    step = 0
    while step < steps:
        for batch in loader:
            batch = {k: v for k, v in batch.items() if k in set(model_args)}
            state, res = step_fn(state, batch, WEIGHTS)
            step += 1
            if step % 50 == 0:
                print(f"step {step}: loss {float(res['loss']):.4f} "
                      f"cmd {float(res['loss_cmd']):.4f} args {float(res['loss_args']):.4f}")
            if step >= steps:
                break

    session = InferenceSession(model, {"params": state.params}, cfg=None)

    # encode two icons and interpolate (one batched decode)
    import jax.numpy as jnp

    b = ds.get_batch([0, 1])
    z = session.encode({k: jnp.asarray(v) for k, v in b.items() if k in ("commands", "args")})
    svgs = session.interpolate(z[0], z[1], n=8, ease=True)
    grid = make_grid([s.copy().set_color("random").split_paths() for s in svgs], num_cols=4)
    grid.save_png(os.path.join(OUT, "interpolation.png"))
    print("wrote", os.path.join(OUT, "interpolation.png"))

    # latent direction between the two icons, applied in steps
    direction = z[1] - z[0]
    svgs2 = session.apply_direction(z[0], direction, [0.0, 0.33, 0.66, 1.0])
    make_grid(svgs2, num_cols=4).save_png(os.path.join(OUT, "latent_direction.png"))
    print("wrote", os.path.join(OUT, "latent_direction.png"))


if __name__ == "__main__":
    main(steps=int(os.environ.get("DEEPSVG_EXAMPLE_STEPS", "300")))
