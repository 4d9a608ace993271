"""Sketchformer baseline: one-stage autoregressive transformer with relative
targets (reference model/config.py:74-80). Decoding uses the KV-cached scan."""
from deepsvg_tpu.models.config import sketchformer, tpu_fast

from .default_icons import Config as IconsConfig


def make_model_config():
    return tpu_fast(sketchformer())


class Config(IconsConfig):
    def __init__(self, num_devices=1):
        super().__init__(num_devices=num_devices)
        self.model_cfg = make_model_config()
        self.model_args = self.model_cfg.get_model_args()
