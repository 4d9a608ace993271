"""Dataset loaders for the icons/fonts tensor datasets and raw SVG dirs.

Reference: deepsvg/svgtensor_dataset.py + deepsvg/svg_dataset.py. Same meta-CSV
filter semantics (uni / platform / category / nb_groups / max_len_group /
total_len), same label mappings, same per-item packing contract — but emitting
numpy arrays through ``svgtensor.pack_groups`` (no torch in the data path).
"""
from __future__ import annotations

import os
import pickle
import random
from typing import List, Optional

import numpy as np

from ..svglib.geom import Point
from ..svglib.svg import SVG
from ..svgtensor.tensor import pack_groups

ICON_CATEGORIES = [
    "characters", "free-icons", "logos", "alphabet", "animals", "arrows",
    "astrology", "baby", "beauty", "business", "cinema", "city", "clothing",
    "computer-hardware", "crime", "cultures", "data", "diy", "drinks",
    "ecommerce", "editing", "files", "finance", "folders", "food", "gaming",
    "hands", "healthcare", "holidays", "household", "industry", "maps",
    "media-controls", "messaging", "military", "mobile", "music", "nature",
    "network", "photo-video", "plants", "printing", "profile", "programming",
    "science", "security", "shopping", "social-networks", "sports",
    "time-and-date", "transport", "travel", "user-interface", "users",
    "weather", "flags", "emoji", "men", "women",
]


def uni_to_label(uni: int) -> int:
    """Unicode codepoint -> class id: 0-9 digits, 10-35 upper, 36-61 lower
    (reference svgtensor_dataset.py:61-68)."""
    if 48 <= uni <= 57:
        return uni - 48
    if 65 <= uni <= 90:
        return uni - 65 + 10
    return uni - 97 + 36


def label_to_uni(label_id: int) -> int:
    if 0 <= label_id <= 9:
        return label_id + 48
    if 10 <= label_id <= 35:
        return label_id + 65 - 10
    return label_id + 97 - 36


def category_to_label(category: str) -> int:
    return ICON_CATEGORIES.index(category)


class SVGDatasetBase:
    """Shared meta-CSV handling + packing (both loaders)."""

    def __init__(self, data_dir, meta_filepath, model_args, max_num_groups,
                 max_seq_len, max_total_len=None, filter_uni=None,
                 filter_platform=None, filter_category=None, train_ratio=1.0,
                 df=None, PAD_VAL=-1, nb_augmentations=1):
        import pandas as pd

        self.data_dir = data_dir
        self.MAX_NUM_GROUPS = max_num_groups
        self.MAX_SEQ_LEN = max_seq_len
        self.MAX_TOTAL_LEN = max_total_len or max_num_groups * max_seq_len

        if df is None:
            df = pd.read_csv(meta_filepath)

        if len(df) > 0:
            if filter_uni is not None:
                df = df[df.uni.isin(filter_uni)]
            if filter_platform is not None:
                df = df[df.platform.isin(filter_platform)]
            if filter_category is not None:
                df = df[df.category.isin(filter_category)]
            df = df[(df.nb_groups <= max_num_groups) & (df.max_len_group <= max_seq_len)]
            if max_total_len is not None:
                df = df[df.total_len <= max_total_len]

        self.df = df.sample(frac=train_ratio) if train_ratio < 1.0 else df
        self.model_args = model_args
        self.PAD_VAL = PAD_VAL
        self.nb_augmentations = nb_augmentations

    # --- meta / labels ----------------------------------------------------
    def search_name(self, name):
        return self.df[self.df.commonName.str.contains(name)]

    def get_label(self, idx=0, entry=None):
        if entry is None:
            if len(self.df) == 0:  # packer-only instantiation (no metadata)
                return None
            entry = self.df.iloc[idx]
        if "uni" in self.df.columns:
            return np.int32(uni_to_label(int(entry.uni)))
        if "category" in self.df.columns:
            return np.int32(category_to_label(entry.category))
        return None

    def idx_to_id(self, idx):
        return self.df.iloc[idx].id

    def entry_from_id(self, id):
        return self.df[self.df.id == str(id)].iloc[0]

    def __len__(self):
        return len(self.df) * self.nb_augmentations

    def random_icon(self):
        return self[random.randrange(0, len(self))]

    def random_id(self):
        return self.idx_to_id(random.randrange(0, len(self)) % len(self.df))

    def random_id_by_uni(self, uni):
        return self.df[self.df.uni == uni].id.sample().iloc[0]

    def __getitem__(self, idx):
        return self.get(idx, self.model_args)

    # --- packing ----------------------------------------------------------
    def get_data(self, t_sep: List[np.ndarray], fillings, model_args=None, label=None):
        """Per-item packing (reference svgtensor_dataset.py:164-205) built on
        ``pack_groups``; emits only the keys the model consumes."""
        if model_args is None:
            model_args = self.model_args
        packed = pack_groups(
            t_sep, self.MAX_NUM_GROUPS, self.MAX_SEQ_LEN, self.MAX_TOTAL_LEN,
            fillings=fillings,
        )
        res = {}
        for arg in set(model_args):
            if arg == "label":
                res["label"] = label
            elif arg in packed:
                res[arg] = packed[arg]
            elif arg == "tensor":
                res["tensor"] = t_sep
        return res


class SVGTensorDataset(SVGDatasetBase):
    """Pre-tensorized dataset: one pickle per icon with pre-augmented tensor
    variants (reference svgtensor_dataset.py:17-205)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.nb_augmentations = len(self._load_tensor(self.idx_to_id(0))[0])

    def _load_tensor(self, icon_id):
        with open(os.path.join(self.data_dir, f"{icon_id}.pkl"), "rb") as f:
            data = pickle.load(f)
        tensors = [np.asarray(t, dtype=np.float32) for t in data["tensors"]]
        # stored as either concatenated rows or per-group lists
        if tensors and tensors[0].ndim == 3:
            tensors = [[np.asarray(g) for g in t] for t in data["tensors"]]
        return tensors, data["fillings"]

    @staticmethod
    def _augment(svg: SVG, mean=False) -> SVG:
        dx, dy = (0, 0) if mean else (5 * random.random() - 2.5, 5 * random.random() - 2.5)
        factor = 0.7 if mean else 0.2 * random.random() + 0.6
        return svg.zoom(factor).translate(Point(dx, dy))

    @staticmethod
    def simplify(svg: SVG, normalize=True) -> SVG:
        svg.canonicalize(normalize=normalize)
        svg = svg.simplify_heuristic()
        return svg.normalize()

    @staticmethod
    def preprocess(svg: SVG, augment=True, numericalize=True, mean=False) -> SVG:
        if augment:
            svg = SVGTensorDataset._augment(svg, mean=mean)
        if numericalize:
            return svg.numericalize(256)
        return svg

    def get_item_aug(self, icon_idx: int, aug_idx: int, model_args=None):
        """One SPECIFIC (icon, augmentation-variant) item — the enumerable
        access device-resident mode needs (data/resident.py). ``get`` draws
        the variant randomly (reference svgtensor_dataset.py:156); here the
        caller picks it, so every variant can be materialized exactly once."""
        icon_idx = int(icon_idx) % len(self.df)
        tensors, fillings = self._load_tensor(self.idx_to_id(icon_idx))
        t_sep = _split_tensor_groups(tensors[int(aug_idx) % len(tensors)])
        return self.get_data(t_sep, fillings, model_args=model_args,
                             label=self.get_label(icon_idx))

    def get(self, idx=0, model_args=None, random_aug=True, id=None, svg: Optional[SVG] = None):
        if id is None:
            idx = idx % len(self.df)
            id = self.idx_to_id(idx)

        if svg is None:
            tensors, fillings = self._load_tensor(id)
            t_sep = random.choice(tensors) if random_aug else tensors[0]
            t_sep = _split_tensor_groups(t_sep)
        else:
            t_sep = svg.to_tensor(concat_groups=False, PAD_VAL=self.PAD_VAL)
            fillings = svg.to_fillings()

        label = self.get_label(idx)
        return self.get_data(t_sep, fillings, model_args=model_args, label=label)


def _split_tensor_groups(t):
    """A stored per-icon tensor may be one concatenated [n, 14] array or a
    list of per-group arrays; normalize to a per-group list by splitting at
    moveto rows."""
    if isinstance(t, (list, tuple)):
        return [np.asarray(g, dtype=np.float32) for g in t]
    t = np.asarray(t, dtype=np.float32)
    starts = np.nonzero(t[:, 0] == 0)[0]  # moveto rows
    if len(starts) == 0 or starts[0] != 0:
        return [t]
    return [t[a:b] for a, b in zip(starts, list(starts[1:]) + [len(t)])]


class SVGDataset(SVGDatasetBase):
    """Raw ``.svg``-file dataset with on-the-fly preprocessing/augmentation
    (reference svg_dataset.py:17-215)."""

    def __init__(self, *args, already_preprocessed=True, **kwargs):
        super().__init__(*args, **kwargs)
        self.already_preprocessed = already_preprocessed

    def _load_svg(self, icon_id) -> SVG:
        svg = SVG.load_svg(os.path.join(self.data_dir, f"{icon_id}.svg"))
        if not self.already_preprocessed:
            svg.fill_(False)
            svg.normalize().zoom(0.9)
            svg.canonicalize()
            svg = svg.simplify_heuristic()
        return svg

    _augment = SVGTensorDataset._augment
    preprocess = SVGTensorDataset.preprocess
    simplify = SVGTensorDataset.simplify

    def get(self, idx=0, model_args=None, random_aug=True, id=None, svg: Optional[SVG] = None):
        if id is None and svg is None:
            idx = idx % len(self.df)
            id = self.idx_to_id(idx)
        if svg is None:
            svg = self._load_svg(id)
            svg = SVGDataset.preprocess(svg, augment=random_aug)
        t_sep = svg.to_tensor(concat_groups=False, PAD_VAL=self.PAD_VAL)
        fillings = svg.to_fillings()
        label = self.get_label(idx)
        return self.get_data(t_sep, fillings, model_args=model_args, label=label)


class SVGFinetuneDataset:
    """Mix-in finetuning wrapper: fraction ``frac`` of items come from a list
    of user SVGs (augmented), the rest from the original dataset
    (reference svgtensor_dataset.py:208-227)."""

    def __init__(self, original_dataset: SVGDatasetBase, svg_list: List[SVG],
                 frac: float = 0.5, nb_augmentations: int = 20):
        import math

        self.original_dataset = original_dataset
        self.svg_list = svg_list
        self.frac = frac
        self.nb_augmentations = nb_augmentations
        self._cycle = math.ceil(len(svg_list) / frac)

    def __len__(self):
        return self._cycle * self.nb_augmentations

    def __getitem__(self, idx):
        i = idx % self._cycle
        if i < len(self.svg_list):
            return self.original_dataset.get(svg=self.svg_list[i].copy())
        return self.original_dataset.random_icon()


def load_dataset(cfg, already_preprocessed=True):
    """Entry point matching the reference module-level loaders; dispatches on
    ``cfg.data_dir`` content (pickles -> tensor dataset, svgs -> raw)."""
    kind = getattr(cfg, "dataset_kind", None)
    if kind is None:
        try:
            has_pkl = any(f.endswith(".pkl") for f in os.listdir(cfg.data_dir)[:100])
        except OSError:
            has_pkl = True
        kind = "tensor" if has_pkl else "svg"
    common = dict(
        data_dir=cfg.data_dir, meta_filepath=cfg.meta_filepath,
        model_args=cfg.model_args, max_num_groups=cfg.max_num_groups,
        max_seq_len=cfg.max_seq_len, max_total_len=cfg.max_total_len,
        filter_uni=cfg.filter_uni, filter_platform=cfg.filter_platform,
        filter_category=cfg.filter_category, train_ratio=cfg.train_ratio,
    )
    if kind == "tensor":
        return SVGTensorDataset(**common)
    return SVGDataset(
        **common, nb_augmentations=getattr(cfg, "nb_augmentations", 1),
        already_preprocessed=already_preprocessed,
    )
