"""One-stage one-shot baseline (reference model/config.py:83-89)."""
from deepsvg_tpu.models.config import one_stage_one_shot, tpu_fast

from .default_icons import Config as IconsConfig


def make_model_config():
    return tpu_fast(one_stage_one_shot())


class Config(IconsConfig):
    def __init__(self, num_devices=1):
        super().__init__(num_devices=num_devices)
        self.model_cfg = make_model_config()
        self.model_args = self.model_cfg.get_model_args()
