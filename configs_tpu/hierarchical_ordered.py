"""The flagship config (reference: configs/deepsvg/hierarchical_ordered.py):
hierarchical ordered model with a deterministic linear bottleneck
(use_vae=False — the documented reference gotcha, SURVEY.md §7)."""
import dataclasses

from deepsvg_tpu.models.config import hierarchical, tpu_fast

from .default_icons import Config as IconsConfig


def make_model_config():
    return tpu_fast(dataclasses.replace(hierarchical(), label_condition=False, use_vae=False))


class Config(IconsConfig):
    def __init__(self, num_devices=2):
        super().__init__(num_devices=num_devices)

        self.model_cfg = make_model_config()
        self.model_args = self.model_cfg.get_model_args()

        self.filter_category = None

        self.learning_rate = 1e-3 * num_devices
        self.batch_size = 60 * num_devices

        self.val_every = 2000
