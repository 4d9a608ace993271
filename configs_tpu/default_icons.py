"""Icons training config (reference: configs/deepsvg/default_icons.py).

Hierarchical two-stage model, 50 epochs, batch 60 x devices, lr 1e-3 x devices,
KL ramp 0 -> 10 over 10k steps, reconstruction grids to TensorBoard at each
validation step.
"""
import dataclasses
import random

import numpy as np

from deepsvg_tpu.models.config import hierarchical, tpu_fast
from deepsvg_tpu.training.config import TrainConfig
from deepsvg_tpu.training.schedulers import linear_ramp


def make_model_config():
    return tpu_fast(hierarchical())


class Config(TrainConfig):
    def __init__(self, num_devices=1):
        super().__init__(num_devices=num_devices)

        # model
        self.model_cfg = make_model_config()
        self.model_args = self.model_cfg.get_model_args()

        # dataset
        self.filter_category = None
        self.train_ratio = 1.0
        self.max_num_groups = 8
        self.max_total_len = 50

        # dataloader
        self.loader_num_workers = 4 * num_devices

        # training
        self.num_epochs = 50
        self.val_every = 1000

        # optimization (reference scales both by device count)
        self.learning_rate = 1e-3 * num_devices
        self.batch_size = 60 * num_devices
        self.grad_clip = 1.0

    def get_weights(self, step, epoch):
        return {
            "kl_tolerance": 0.1,
            "loss_kl_weight": linear_ramp(0, 10000, 0.0, 10.0)(step),
            "loss_hierarch_weight": 1.0,
            "loss_cmd_weight": 1.0,
            "loss_args_weight": 2.0,
            "loss_visibility_weight": 1.0,
        }

    def set_train_vars(self, train_vars, dataset):
        ids = random.sample(range(len(dataset)), k=min(10, len(dataset)))
        train_vars.x_inputs_train = [
            dataset.get(idx, [*self.model_args, "tensor"]) for idx in ids
        ]

    def visualize(self, model, variables, train_vars, step, epoch,
                  summary_writer, visualization_dir):
        """Render reconstruction grids to TensorBoard
        (reference default_icons.py:79-97)."""
        import jax.numpy as jnp

        from deepsvg_tpu.models.sample import flatten_groups_np, greedy_sample
        from deepsvg_tpu.svglib.geom import Bbox
        from deepsvg_tpu.svglib.svg import SVG
        from deepsvg_tpu.svglib.utils import make_grid
        from deepsvg_tpu.svgtensor import cmd_args_to_data14

        items = [d for d in train_vars.x_inputs_train
                 if all(k in d for k in self.model_args[:2])]
        if not items:
            return
        # ONE batched greedy_sample for all sample icons: per-icon calls
        # cost a full relay round trip each (~1.5 s x 10 icons per val
        # cycle measured in the r4 full run — the visualize hook was ~60%
        # of a 26 s val stall)
        stacked = [jnp.asarray(np.stack([np.asarray(d[k]) for d in items]))
                   for k in self.model_args[:2]]
        kw = {}
        if "label" in self.model_args and all("label" in d for d in items):
            # label-conditioned models (fonts) cannot encode without their
            # class labels — the sample items carry them via model_args
            kw["label"] = jnp.asarray(
                np.stack([np.asarray(d["label"]) for d in items]))
        commands_y, args_y = greedy_sample(model, variables, *stacked, **kw)
        flat = flatten_groups_np(commands_y, args_y)
        for i, (data, (c, a)) in enumerate(zip(items, flat)):
            try:
                data14 = cmd_args_to_data14(c, a)
                svg_sample = (
                    SVG.from_tensor(data14, viewbox=Bbox(256), allow_empty=True)
                    .normalize().split_paths().set_color("random")
                )
            except Exception:
                continue
            try:
                gt14 = np.concatenate([np.asarray(t) for t in data["tensor"]], axis=0)
                svg_gt = (
                    SVG.from_tensor(gt14, viewbox=Bbox(256))
                    .normalize().split_paths().set_color("random")
                )
                img = make_grid([svg_sample, svg_gt]).render(width=200)
                summary_writer.add_image(
                    f"reconstructions_train/{i}",
                    np.asarray(img).transpose(2, 0, 1), step,
                )
            except Exception:
                continue
