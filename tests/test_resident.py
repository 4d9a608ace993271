"""Device-resident dataset mode (deepsvg_tpu/data/resident.py): build,
epoch-order equivalence with the streaming DataLoader, and bit-exact
train() agreement between the resident and streaming pipelines."""
import os
import pickle

import numpy as np
import pytest

from deepsvg_tpu.data.loader import DataLoader
from deepsvg_tpu.data.resident import (
    build_resident_arrays,
    epoch_icon_permutation,
    estimate_resident_bytes,
)
from deepsvg_tpu.data.synthetic import SyntheticIconDataset

from test_runtime import TinyConfig, tiny_dataset


class TestBuild:
    def test_synthetic_columnar(self):
        ds = tiny_dataset()
        built = build_resident_arrays(ds, ["commands", "args"])
        assert built is not None
        data, n_icons, n_augs = built
        assert n_icons == len(ds) and n_augs == 1
        assert data["commands"].shape[0] == len(ds)
        assert data["commands"].dtype == np.int8  # wire format
        assert data["args"].dtype == np.uint8  # masked-args wire
        # row i is exactly item i
        item = ds[3]
        np.testing.assert_array_equal(data["commands"][3], item["commands"])

    def test_byte_budget_rejects(self):
        ds = tiny_dataset()
        assert build_resident_arrays(ds, ["commands", "args"],
                                     max_bytes=16) is None
        est = estimate_resident_bytes(ds, ["commands", "args"])
        assert est is not None and est > 16

    def test_unsupported_dataset_returns_none(self):
        class Opaque:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                return {"commands": np.zeros((3, 8), np.int32)}

        assert build_resident_arrays(Opaque(), ["commands"]) is None

    def test_tensor_dataset_enumerates_augs(self, tmp_path):
        """SVGTensorDataset: each (icon, aug) variant lands at
        flat = icon * n_augs + aug."""
        import pandas as pd

        from deepsvg_tpu.data.dataset import SVGTensorDataset
        from deepsvg_tpu.data.synthetic import _random_path

        data_dir = tmp_path / "tensors"
        data_dir.mkdir()
        rng = np.random.default_rng(0)
        rows = []
        for i in range(5):
            variants = [_random_path(rng, 4) for _ in range(3)]
            with open(data_dir / f"ic{i}.pkl", "wb") as f:
                pickle.dump({"tensors": variants, "fillings": [0]}, f)
            rows.append({"id": f"ic{i}", "total_len": 5, "nb_groups": 1,
                         "max_len_group": 5})
        meta = tmp_path / "meta.csv"
        pd.DataFrame(rows).to_csv(meta, index=False)

        ds = SVGTensorDataset(str(data_dir), str(meta), ["commands", "args"],
                              3, 6, 18)
        assert ds.nb_augmentations == 3
        built = build_resident_arrays(ds, ["commands", "args"])
        assert built is not None
        data, n_icons, n_augs = built
        assert (n_icons, n_augs) == (5, 3)
        assert data["commands"].shape[0] == 15
        for icon in (0, 4):
            for aug in (0, 2):
                item = ds.get_item_aug(icon, aug)
                np.testing.assert_array_equal(
                    data["commands"][icon * 3 + aug], item["commands"])


class TestAugmentedCorpus:
    """SyntheticAugmentedCorpus — the icons_tensor-100k scale-rehearsal
    stand-in (scripts/scale_rehearsal.py): vectorized generation must be
    item-for-item identical to the per-item getter path, honor the packed
    wire contract, and serve the resident columnar fast path."""

    def test_columnar_fast_path_matches_per_item(self):
        from deepsvg_tpu.data.loader import collate, compress_batch
        from deepsvg_tpu.data.resident import _resident_spec
        from deepsvg_tpu.data.synthetic import SyntheticAugmentedCorpus

        ds = SyntheticAugmentedCorpus(40, n_augs=3, seed=9)
        assert len(ds) == 120 and ds.nb_augmentations == 3
        built = build_resident_arrays(ds, ["commands", "args"])
        assert built is not None
        data, n_icons, n_augs = built
        assert (n_icons, n_augs) == (40, 3)
        assert data["commands"].dtype == np.int8
        assert data["args"].dtype == np.uint8

        n_items, _, getter = _resident_spec(ds)
        assert n_items == 120
        idx = np.random.default_rng(0).integers(0, n_items, 20)
        ref = compress_batch(collate([getter(int(i)) for i in idx]))
        for k in data:
            np.testing.assert_array_equal(data[k][idx], ref[k], err_msg=k)

    def test_wire_and_budget_invariants(self):
        from deepsvg_tpu.data.synthetic import SyntheticAugmentedCorpus
        from deepsvg_tpu.svgtensor.constants import (
            CMD_ARGS_MASK_NP, CMD_EOS, CMD_SOS)

        ds = SyntheticAugmentedCorpus(30, n_augs=2, seed=5, max_total_len=50)
        item = ds.get_item_aug(7, 1)
        mask = CMD_ARGS_MASK_NP[item["commands"]].astype(bool)
        assert (item["args"][~mask] == -1).all()
        assert (item["args"][mask] >= 0).all()
        assert (item["args"][mask] <= 255).all()

        data, _, _ = build_resident_arrays(ds, ["commands", "args"])
        real = ((data["commands"] != CMD_EOS)
                & (data["commands"] != CMD_SOS)).reshape(len(ds), -1).sum(1)
        assert real.max() <= 50 and real.min() >= 3
        # aug 0 is the identity variant
        np.testing.assert_array_equal(
            np.maximum(ds.get_item_aug(3, 0)["args"], 0),
            np.maximum(ds._args[3], 0))

    def test_dataset_surface(self):
        from deepsvg_tpu.data.synthetic import SyntheticAugmentedCorpus

        ds = SyntheticAugmentedCorpus(10, n_augs=2, seed=1)
        g = ds.get(3, ["commands", "args", "tensor"])
        assert g["tensor"] and all(t.shape[1] == 14 for t in g["tensor"])
        b = ds.get_batch_arrays(np.arange(25))  # flat idx wraps: idx % n_icons
        assert b["commands"].shape[0] == 25
        item = ds[13]
        assert set(item) == {"commands", "args"}


class TestEpochOrder:
    def test_permutation_matches_dataloader(self):
        """Same epoch number -> identical batch membership and order as the
        streaming DataLoader's shuffle."""
        ds = tiny_dataset()
        loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                            num_workers=1, seed=0)
        # advance the loader's epoch counter the way train() does (init batch)
        next(iter(loader))
        streamed = list(loader)  # epoch 2
        batches = epoch_icon_permutation(len(ds), len(ds), 8, seed=0, epoch=2)
        assert batches.shape == (4, 8)
        for b_idx, idx_row in zip(streamed, batches):
            expect = ds.get_batch_arrays(idx_row)
            np.testing.assert_array_equal(b_idx["commands"],
                                          expect["commands"])

    def test_aug_space_reduced_to_icons(self):
        batches = epoch_icon_permutation(12, 4, 4, seed=0, epoch=1)
        assert batches.max() < 4 and batches.min() >= 0
        assert batches.shape == (3, 4)


class TestMeshResident:
    def test_parallel_resident_matches_single_device(self, tmp_path):
        """DP resident training (data replicated per shard, idx sharded)
        agrees with the single-device resident run — same data order, same
        step count; only float reduction order differs (psum of shard
        sums)."""
        import jax

        from deepsvg_tpu.training.train import train

        def run(n_devices):
            cfg = TinyConfig(n_devices)
            cfg.device_resident = True
            cfg.steps_per_dispatch = 2
            cfg.num_epochs = 2
            cfg.loader_num_workers = 1
            ds = tiny_dataset()
            state, _ = train(cfg, "mres", f"d{n_devices}",
                             log_dir=str(tmp_path), debug=True, dataset=ds,
                             max_steps=4)
            return state

        s1 = run(1)
        s2 = run(2)
        assert int(s1.step) == int(s2.step) == 4
        # psum-of-shard-sums vs single-device reduction order perturbs grads
        # at ~1e-7; AdamW's eps-normalized update amplifies that to ~1e-4 on
        # early steps — loose atol, same criterion as the loss-level DP
        # equivalence test (test_training.py::test_parallel_loss_matches)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3)


class TestTrainParity:
    def test_resident_train_equals_streaming(self, tmp_path):
        """train() with the resident pipeline produces bit-identical params
        to the streaming pipeline: same shuffle order, same RNG chain, the
        only difference is WHERE the batch is gathered."""
        import jax

        from deepsvg_tpu.training.train import train

        def run(resident: bool):
            cfg = TinyConfig()
            cfg.num_epochs = 2
            cfg.device_resident = resident
            cfg.steps_per_dispatch = 2 if resident else 1
            ds = tiny_dataset()
            state, _ = train(cfg, "res", "a" if resident else "b",
                             log_dir=str(tmp_path), debug=True, dataset=ds,
                             max_steps=6)
            return state

        s_res = run(True)
        s_str = run(False)
        assert int(s_res.step) == int(s_str.step) == 6
        flat_r = jax.tree_util.tree_leaves(s_res.params)
        flat_s = jax.tree_util.tree_leaves(s_str.params)
        for a, b in zip(flat_r, flat_s):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
