"""Label-conditioned fonts config
(reference: configs/deepsvg/hierarchical_ordered_fonts.py):
dim_z=128, label conditioning on 62 glyph classes, filter to 0-9A-Za-z."""
import dataclasses

from deepsvg_tpu.models.config import hierarchical, tpu_fast

from .defaults_fonts import Config as FontsConfig


def make_model_config():
    return tpu_fast(dataclasses.replace(hierarchical(), label_condition=True, dim_z=128))


class Config(FontsConfig):
    def __init__(self, num_devices=2):
        super().__init__(num_devices=num_devices)

        self.model_cfg = make_model_config()
        self.model_args = self.model_cfg.get_model_args()

        # 0-9, A-Z, a-z codepoints
        self.filter_uni = [
            *range(48, 58), *range(65, 91), *range(97, 123),
        ]

        self.learning_rate = 2e-4 * num_devices
        self.batch_size = 60 * num_devices

        self.val_every = 2000
