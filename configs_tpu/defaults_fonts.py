"""Fonts dataset defaults (reference: configs/deepsvg/defaults_fonts.py)."""
from .default_icons import Config as IconsConfig


class Config(IconsConfig):
    def __init__(self, num_devices=1):
        super().__init__(num_devices=num_devices)

        self.data_dir = "./dataset/fonts_tensor/"
        self.meta_filepath = "./dataset/fonts_meta.csv"
