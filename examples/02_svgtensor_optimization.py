"""Differentiable SVG optimization — parity with notebooks/svgtensor.ipynb.

Gradient-descend a circle's control points onto a target shape (the dolphin)
using the differentiable EMD loss — the classic DeepSVG demo, here as a
single jitted update loop.
"""
import os
import sys

try:
    import deepsvg_tpu  # noqa: F401  (installed via `pip install -e .`)
except ImportError:  # running from a source checkout without installing
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepsvg_tpu.difflib import sample_points, svg_emd_loss
from deepsvg_tpu.svglib import SVG
from deepsvg_tpu.svgtensor import data14_to_cmd_args

OUT = os.path.join(os.path.dirname(__file__), "out")
DOLPHIN = "/root/reference/docs/imgs/dolphin.svg"


def main():
    os.makedirs(OUT, exist_ok=True)

    # target: dolphin outline points
    target_svg = SVG.load_svg(DOLPHIN).canonicalize(normalize=True)
    target_pts = jnp.asarray(
        np.concatenate([p.sample_points(0.3) for p in target_svg.paths]),
        jnp.float32,
    )

    # source: unit circle as cubics, scaled to the 24-viewbox
    circle = SVG.unit_circle().normalize()
    cmds_np, args_np = data14_to_cmd_args(circle.to_tensor())
    cmds = jnp.asarray(cmds_np)
    args = jnp.asarray(args_np)

    # which rows are curves is static -> hoist the mask out of the jit
    from deepsvg_tpu.svgtensor import CMD_C, CMD_L

    valid_np = np.asarray((cmds_np == CMD_L) | (cmds_np == CMD_C))

    def loss_fn(args_):
        from deepsvg_tpu.difflib import sample_points_padded

        points, _ = sample_points_padded(cmds, args_, n=8)
        pts = points[valid_np].reshape(-1, 2)
        return svg_emd_loss(pts, target_pts)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    lr = 10.0
    n_steps = int(os.environ.get("DEEPSVG_EXAMPLE_STEPS", "300"))
    for step in range(n_steps):
        loss, g = grad_fn(args)
        args = args - lr * g
        if step % 50 == 0:
            print(f"step {step}: emd loss {float(loss):.4f}")

    print(f"final loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
