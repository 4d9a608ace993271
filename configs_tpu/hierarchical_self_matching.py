"""Hungarian self-matching variant (reference model/config.py:101-108
HierarchicalSelfMatching): two-stage one-shot with on-device optimal
assignment of predicted groups to targets."""
import dataclasses

from deepsvg_tpu.models.config import hierarchical_self_matching, tpu_fast

from .default_icons import Config as IconsConfig


def make_model_config():
    return tpu_fast(hierarchical_self_matching())


class Config(IconsConfig):
    def __init__(self, num_devices=1):
        super().__init__(num_devices=num_devices)
        self.model_cfg = make_model_config()
        self.model_args = self.model_cfg.get_model_args()
