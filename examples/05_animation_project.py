"""Animation project — parity with notebooks/animation.ipynb and the GUI's
interpolation flow: keyframes -> (finetune) -> latent in-betweens -> GIF.
"""
import os
import sys

try:
    import deepsvg_tpu  # noqa: F401  (installed via `pip install -e .`)
except ImportError:  # running from a source checkout without installing
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from deepsvg_tpu.animate import DeepSVGProject, Frame, compute_interpolation
from deepsvg_tpu.inference import InferenceSession
from deepsvg_tpu.models import ModelConfig, SVGTransformer
from deepsvg_tpu.svglib import SVG, Bbox

OUT = os.path.join(os.path.dirname(__file__), "out")


def main():
    os.makedirs(OUT, exist_ok=True)

    cfg = ModelConfig(
        encode_stages=2, decode_stages=2, use_vae=False,
        max_num_groups=4, max_seq_len=10, d_model=64, dim_feedforward=128,
        dim_z=32, n_layers=2, n_layers_decode=2, dropout=0.0,
    )
    model = SVGTransformer(cfg)

    from deepsvg_tpu.data.synthetic import generate_batch
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b = generate_batch(rng, 1, cfg.max_num_groups, cfg.max_seq_len)
    cmds, args = jnp.asarray(b["commands"]), jnp.asarray(b["args"])
    variables = model.init({"params": jax.random.PRNGKey(0)}, cmds, args, cmds, args)

    # a packer so encode_svg works without a real dataset
    class Packer:
        def get(self, model_args=None, svg=None, **kw):
            t_sep = svg.to_tensor(concat_groups=False)
            from deepsvg_tpu.svgtensor import pack_groups

            return pack_groups(t_sep, cfg.max_num_groups, cfg.max_seq_len,
                               cfg.max_total_len, fillings=svg.to_fillings())

    session = InferenceSession(model, variables, dataset=Packer())

    svg1 = SVG.unit_circle().normalize(Bbox(256)).numericalize(256)
    svg2 = SVG.unit_square().normalize(Bbox(256)).numericalize(256)

    project = DeepSVGProject(name="demo", root_dir=OUT)
    project.frames = [
        Frame(0, keyframe=True, svg=svg1),
        Frame(1), Frame(2), Frame(3),
        Frame(4, keyframe=True, svg=svg2),
    ]

    compute_interpolation(session, project, finetune=False)
    project.save_project()
    gif = project.export_to_gif(os.path.join(OUT, "animation.gif"), width=128)
    print("wrote", gif)


if __name__ == "__main__":
    main()
