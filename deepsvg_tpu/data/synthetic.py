"""Synthetic icon-like SVG tensor data for tests and benchmarks.

Generates random multi-path "icons" (closed polygons / Bézier blobs) directly
in the canonical 14-column command-row format, numericalized to the
``[0, ARGS_DIM)`` grid — the same contract real datasets produce after
preprocessing (SURVEY.md §3.4). No SVG parsing involved, so it runs anywhere.
"""
from __future__ import annotations

import numpy as np

from ..svgtensor.constants import ARGS_DIM, CMD_C, CMD_L, CMD_M, Index
from ..svgtensor.tensor import pack_groups


def _random_path(rng: np.random.Generator, n_cmds: int, use_curves: bool = True) -> np.ndarray:
    """One path: moveto + (n_cmds-1) line/cubic commands tracing a noisy
    closed-ish contour, coordinates on the 8-bit grid."""
    center = rng.uniform(64, 192, size=2)
    radius = rng.uniform(20, 60)
    angles = np.sort(rng.uniform(0, 2 * np.pi, size=n_cmds))
    pts = center + radius * np.stack([np.cos(angles), np.sin(angles)], -1)
    pts += rng.normal(0, 4, pts.shape)
    pts = np.clip(np.round(pts), 0, ARGS_DIM - 1)

    # canonical 14-col contract (reference difflib/tensor.py): every unused
    # slot is PAD_VAL=-1, so arg validity follows CMD_ARGS_MASK exactly —
    # the loader's uint8 masked-args wire format depends on this
    rows = np.full((n_cmds, 14), -1.0, np.float32)
    rows[0, Index.COMMAND] = CMD_M
    rows[0, Index.END_POS] = pts[0]
    for i in range(1, n_cmds):
        start, end = pts[i - 1], pts[i]
        if use_curves and rng.random() < 0.5:
            rows[i, Index.COMMAND] = CMD_C
            c1 = np.clip(np.round(start + (end - start) * 0.3 + rng.normal(0, 3, 2)), 0, ARGS_DIM - 1)
            c2 = np.clip(np.round(start + (end - start) * 0.7 + rng.normal(0, 3, 2)), 0, ARGS_DIM - 1)
            rows[i, Index.CONTROL1] = c1
            rows[i, Index.CONTROL2] = c2
        else:
            rows[i, Index.COMMAND] = CMD_L
        rows[i, Index.START_POS] = start
        rows[i, Index.END_POS] = end
    return rows


def generate_icon(
    rng: np.random.Generator,
    max_num_groups: int = 8,
    max_seq_len: int = 30,
    max_total_len: int = 240,
    return_tensors: bool = False,
):
    """One packed sample dict (same keys as the dataset loaders).

    ``return_tensors=True`` also returns the raw per-group ``[n, 14]`` row
    tensors (the ``"tensor"`` key of the real loaders' ``get``)."""
    budget = max_total_len
    n_groups = int(rng.integers(1, max_num_groups + 1))
    tensors = []
    for _ in range(n_groups):
        n_cmds = int(rng.integers(3, max_seq_len + 1))
        n_cmds = min(n_cmds, budget)
        if n_cmds < 3:
            break
        tensors.append(_random_path(rng, n_cmds))
        budget -= n_cmds
    packed = pack_groups(tensors, max_num_groups, max_seq_len, max_total_len)
    if return_tensors:
        return packed, tensors
    return packed


def generate_batch(
    rng: np.random.Generator,
    batch_size: int,
    max_num_groups: int = 8,
    max_seq_len: int = 30,
    max_total_len: int | None = None,
    label_range: int | None = None,
) -> dict[str, np.ndarray]:
    """Stacked batch of packed samples; optionally adds random class labels."""
    if max_total_len is None:
        max_total_len = max_num_groups * max_seq_len
    samples = [
        generate_icon(rng, max_num_groups, max_seq_len, max_total_len)
        for _ in range(batch_size)
    ]
    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    if label_range is not None:
        batch["label"] = rng.integers(0, label_range, size=batch_size).astype(np.int32)
    return batch


class SyntheticIconDataset:
    """Finite, reproducible synthetic dataset with the loader interface used by
    the training runtime (``__len__`` / ``get_batch``)."""

    def __init__(self, n: int = 1024, seed: int = 0, max_num_groups: int = 8,
                 max_seq_len: int = 30, max_total_len: int | None = None,
                 label_range: int | None = None):
        self.n = n
        self.seed = seed
        self.max_num_groups = max_num_groups
        self.max_seq_len = max_seq_len
        self.max_total_len = max_total_len or max_num_groups * max_seq_len
        self.label_range = label_range
        self._cache: dict[int, tuple[dict, list]] = {}
        self._cols: dict | None = None

    # items are pure functions of the index -> eligible for device-resident
    # training (data/resident.py)
    deterministic_items = True

    def __len__(self):
        return self.n

    def _generate(self, idx: int) -> tuple[dict, list]:
        idx = int(idx) % self.n
        if idx not in self._cache:
            rng = np.random.default_rng(self.seed * 1_000_003 + idx)
            packed, tensors = generate_icon(
                rng, self.max_num_groups, self.max_seq_len, self.max_total_len,
                return_tensors=True,
            )
            if self.label_range is not None:
                packed["label"] = np.int32(int(rng.integers(0, self.label_range)))
            self._cache[idx] = (packed, tensors)
        return self._cache[idx]

    def __getitem__(self, idx: int) -> dict:
        return self._generate(idx)[0]

    def get(self, idx=0, model_args=None, random_aug=True, id=None, svg=None):
        """Same surface as the real loaders' ``get`` (dataset.py:182) so the
        experiment configs' ``set_train_vars``/``visualize`` hooks work
        unchanged; ``"tensor"`` returns the raw per-group row tensors."""
        packed, tensors = self._generate(idx)
        keys = set(model_args) if model_args is not None else set(packed)
        res = {k: v for k, v in packed.items() if k in keys}
        if "tensor" in keys:
            res["tensor"] = tensors
        return res

    def get_batch(self, indices) -> dict:
        samples = [self[i] for i in indices]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    def _columnar(self) -> dict:
        """All items stacked once into big per-key arrays (the dataset is
        deterministic per index, so this is just a materialized cache)."""
        if not hasattr(self, "_cols") or self._cols is None:
            items = [self[i] for i in range(self.n)]
            self._cols = {k: np.stack([it[k] for it in items])
                          for k in items[0]}
        return self._cols

    def get_batch_arrays(self, indices) -> dict:
        """Loader fast path: one C-level fancy-index per key per batch."""
        cols = self._columnar()
        idx = np.asarray(indices, np.int64)
        return {k: v[idx] for k, v in cols.items()}


def load_dataset(cfg):
    """CLI hook (reference svgtensor_dataset.py:230 ``load_dataset``): a
    self-contained synthetic dataset so every experiment config trains out of
    the box — the real icons/fonts archives are external downloads
    (BASELINE.md). Select with
    ``cfg.dataloader_module = "deepsvg_tpu.data.synthetic"``; optional
    ``cfg.synthetic_size`` (default 2048) and ``cfg.synthetic_seed`` (42)."""
    model_cfg = cfg.model_cfg
    label_range = None
    if model_cfg is not None and model_cfg.label_condition:
        label_range = model_cfg.n_labels
    return SyntheticIconDataset(
        n=getattr(cfg, "synthetic_size", 2048),
        seed=getattr(cfg, "synthetic_seed", 42),
        max_num_groups=cfg.max_num_groups,
        max_seq_len=cfg.max_seq_len,
        max_total_len=cfg.max_total_len,
        label_range=label_range,
    )
