"""Label-conditioned glyph generation — parity with notebooks/fonts.ipynb.

Trains a tiny label-conditioned model on synthetic "glyphs" (each class has a
distinct shape family), then samples each class and builds a font grid.
"""
import os
import sys

try:
    import deepsvg_tpu  # noqa: F401  (installed via `pip install -e .`)
except ImportError:  # running from a source checkout without installing
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


class LabeledSynthetic(SyntheticIconDataset):
    """Synthetic glyphs: label = number of paths (a visible class signal)."""

    def __getitem__(self, idx):
        item = dict(super().__getitem__(idx))
        from deepsvg_tpu.svgtensor import visibility_mask
        import jax.numpy as jnp

        n_vis = int(np.asarray(visibility_mask(jnp.asarray(item["commands"]))).sum())
        item["label"] = np.int32(n_vis - 1)
        return item


def main(steps=200):
    os.makedirs(OUT, exist_ok=True)

    cfg = ModelConfig(
        encode_stages=2, decode_stages=2, use_vae=False, label_condition=True,
        n_labels=4, max_num_groups=4, max_seq_len=10, d_model=64,
        dim_feedforward=128, dim_z=32, n_layers=2, n_layers_decode=2, dropout=0.0,
    )
    model = SVGTransformer(cfg)
    model_args = cfg.get_model_args()

    ds = LabeledSynthetic(n=128, max_num_groups=4, max_seq_len=10)
    loader = DataLoader(ds, batch_size=16, num_workers=2)

    batch0 = next(iter(loader))
    batch0 = {k: v for k, v in batch0.items() if k in set(model_args)}
    optimizer = make_optimizer(warmup_step_decay(2e-3, 20, 10_000))
    state = create_train_state(model, optimizer, batch0, model_args)
    step_fn = jit_train_step(model, optimizer, model_args)

    step = 0
    while step < steps:
        for batch in loader:
            batch = {k: v for k, v in batch.items() if k in set(model_args)}
            state, res = step_fn(state, batch, WEIGHTS)
            step += 1
            if step % 50 == 0:
                print(f"step {step}: loss {float(res['loss']):.4f}")
            if step >= steps:
                break

    session = InferenceSession(model, {"params": state.params})

    # sample a grid: one row per class
    import jax

    rows = []
    for label in range(cfg.n_labels):
        rows.append(session.sample_class(label, n=4, key=jax.random.PRNGKey(label)))
    from deepsvg_tpu.svglib.utils import make_grid_lines

    grid = make_grid_lines(rows)
    grid.save_png(os.path.join(OUT, "font_grid.png"))
    print("wrote", os.path.join(OUT, "font_grid.png"))


if __name__ == "__main__":
    main(steps=int(os.environ.get("DEEPSVG_EXAMPLE_STEPS", "200")))
