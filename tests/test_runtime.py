"""Training runtime tests: loader, stats, checkpointing, the full config-driven
train() loop with resume, on synthetic data."""
import json
import os

import numpy as np
import pytest

from deepsvg_tpu.data.loader import DataLoader, collate
from deepsvg_tpu.data.synthetic import SyntheticIconDataset
from deepsvg_tpu.training.checkpoint import (
    latest_ckpt,
    load_ckpt,
    load_model,
    save_ckpt,
    save_model,
)
from deepsvg_tpu.training.stats import SmoothedValue, Stats, TrainVars
from deepsvg_tpu.training.train import train


class TinyConfig:
    """Minimal experiment config over synthetic data."""

    def __new__(cls, num_devices=1):
        import dataclasses

        from deepsvg_tpu.models.config import ModelConfig
        from deepsvg_tpu.training.config import TrainConfig

        cfg = TrainConfig(num_devices)
        cfg.model_cfg = ModelConfig(
            encode_stages=2, decode_stages=2, use_vae=False,
            max_num_groups=3, max_seq_len=6, d_model=32, dim_feedforward=64,
            dim_z=16, n_layers=1, n_layers_decode=1, n_heads=4, dropout=0.0,
        )
        cfg.model_args = cfg.model_cfg.get_model_args()
        cfg.max_num_groups = 3
        cfg.max_seq_len = 6
        cfg.batch_size = 8
        cfg.num_epochs = 1
        cfg.log_every = 2
        cfg.val_every = 10_000
        cfg.ckpt_every = 4
        cfg.warmup_steps = 2
        cfg.loader_num_workers = 1
        # exercise the stall-watchdog thread (threshold far above any CI
        # pause, so it never fires here — the wedged-RPC exit is by design
        # untestable in-process)
        cfg.stall_watchdog_s = 600.0
        cfg.get_weights = lambda step, epoch: {
            "kl_tolerance": 0.1, "loss_kl_weight": 1.0,
            "loss_visibility_weight": 1.0, "loss_cmd_weight": 1.0,
            "loss_args_weight": 2.0,
        }
        return cfg


def tiny_dataset():
    return SyntheticIconDataset(n=32, max_num_groups=3, max_seq_len=6)


class TestLoader:
    def test_epoch_iteration(self):
        ds = tiny_dataset()
        loader = DataLoader(ds, batch_size=8, num_workers=2, seed=1)
        batches = list(loader)
        assert len(batches) == 4
        assert batches[0]["commands"].shape == (8, 3, 8)

    def test_shuffle_differs_between_epochs(self):
        ds = tiny_dataset()
        loader = DataLoader(ds, batch_size=8, num_workers=1, seed=1)
        b1 = next(iter(loader))
        b2 = next(iter(loader))
        assert not (b1["commands"] == b2["commands"]).all()

    def test_collate_skips_none(self):
        out = collate([{"a": np.zeros(2), "label": None}] * 3)
        assert "a" in out and "label" not in out

    def test_prefetch_to_device_stacked(self):
        """stack_steps=K: batches arrive [K, B, ...]-stacked, in order, with
        the ragged tail dropped — exercised across several stager threads."""
        from deepsvg_tpu.data.loader import prefetch_to_device

        ds = tiny_dataset()  # 32 items -> 4 batches of 8 -> 2 stacks, 0 tail
        host = list(DataLoader(ds, batch_size=8, num_workers=1,
                               shuffle=False))
        dev = list(prefetch_to_device(
            DataLoader(ds, batch_size=8, num_workers=1, shuffle=False),
            size=1, keys={"commands"}, stack_steps=3, num_threads=4,
        ))
        assert len(dev) == 1  # 4 batches // 3 = 1 full stack, tail dropped
        assert dev[0]["commands"].shape == (3,) + host[0]["commands"].shape
        for k in range(3):
            np.testing.assert_array_equal(np.asarray(dev[0]["commands"][k]),
                                          host[k]["commands"])

    def test_prefetch_propagates_stager_error(self):
        """An exception inside staging surfaces in the consumer, not a hang."""
        from deepsvg_tpu.data.loader import prefetch_to_device

        def bad_batches():
            yield {"commands": np.zeros((2, 2), np.int32)}
            yield {"commands": object()}  # np.stack-able but not device-able

        import pytest

        with pytest.raises(Exception):
            list(prefetch_to_device(bad_batches(), size=1, num_threads=2))

    def test_multiworker_iter_consumed_from_multiple_threads(self):
        """Regression: the num_workers>1 thread path used to yield while
        holding ``results_cv``; when the generator was resumed from a
        DIFFERENT thread (exactly what prefetch_to_device's stagers do,
        taking turns under their claim lock) the `with` exit released a lock
        owned by another thread -> "cannot release un-acquired lock"."""
        import threading

        class PerItem:  # no get_batch_arrays -> forces the per-item path
            def __len__(self):
                return 32

            def __getitem__(self, i):
                return {"commands": np.full((3, 8), i, np.int32)}

        it = iter(DataLoader(PerItem(), batch_size=8, num_workers=2,
                             shuffle=False))
        out: list = []
        errs: list = []

        def pull_one():
            try:
                out.append(next(it, None))
            except BaseException as e:  # pragma: no cover - the regression
                errs.append(e)

        # alternate next() across fresh threads: each resume happens in a
        # different thread than the previous suspend
        for _ in range(5):  # 4 batches + exhaustion signal
            t = threading.Thread(target=pull_one)
            t.start()
            t.join(timeout=30)
            assert not t.is_alive()
        assert not errs, errs
        assert [b is None for b in out] == [False] * 4 + [True]
        assert out[0]["commands"][0, 0, 0] == 0

    def test_prefetch_to_device(self):
        """Device prefetch: yields every batch in order, on device, filtered
        to the requested keys."""
        from deepsvg_tpu.data.loader import prefetch_to_device

        ds = tiny_dataset()
        loader = DataLoader(ds, batch_size=8, num_workers=1, shuffle=False)
        host = list(loader)
        dev = list(prefetch_to_device(
            DataLoader(ds, batch_size=8, num_workers=1, shuffle=False),
            size=2, keys={"commands", "args"},
        ))
        assert len(dev) == len(host)
        for h, d in zip(host, dev):
            assert set(d) == {"commands", "args"}
            assert hasattr(d["commands"], "devices")  # jax array
            np.testing.assert_array_equal(np.asarray(d["commands"]),
                                          h["commands"])


class TestStats:
    def test_smoothed_value(self):
        s = SmoothedValue(window_size=3)
        for v in [1, 2, 3, 4]:
            s.update(v)
        assert s.median == 3
        assert s.global_avg == 2.5
        assert s.value == 4

    def test_stats_summary(self):
        st = Stats(num_epochs=2, steps_per_epoch=10)
        st.update("train", 5, 0, {"loss": 1.5, "time": 0.1})
        s = st.get_summary("train")
        assert "step 5/20" in s and "loss" in s

    def test_train_vars(self):
        tv = TrainVars()
        tv.foo = [1, 2]
        assert tv.foo == [1, 2]
        assert tv.missing is None
        tv2 = TrainVars()
        tv2.load_dict(tv.to_dict())
        assert tv2.foo == [1, 2]


class TestCheckpoint:
    def _make_state(self):
        import jax

        from deepsvg_tpu.models import SVGTransformer
        from deepsvg_tpu.training.schedulers import warmup_step_decay
        from deepsvg_tpu.training.trainer import create_train_state, make_optimizer

        cfg = TinyConfig()
        ds = tiny_dataset()
        batch = ds.get_batch(range(4))
        batch = {k: v for k, v in batch.items() if k in set(cfg.model_args)}
        model = SVGTransformer(cfg.model_cfg)
        opt = make_optimizer(warmup_step_decay(1e-3, 2, 100))
        state = create_train_state(model, opt, batch, cfg.model_args)
        return cfg, state

    def test_round_trip(self, tmp_path):
        import jax

        cfg, state = self._make_state()
        state = state.replace(step=state.step + 7)
        path = save_ckpt(str(tmp_path), state, cfg)
        assert os.path.basename(path) == "000007.ckpt"
        assert os.path.exists(os.path.join(tmp_path, "best.ckpt"))

        restored, found = load_ckpt(str(tmp_path), state)
        assert found
        assert int(restored.step) == 7
        # 0-d leaves must stay 0-d (ascontiguousarray promotes to (1,) —
        # int(jax 1-d array) then raises at the next save)
        assert np.asarray(restored.step).ndim == 0
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_load_v1_npz_checkpoint(self, tmp_path):
        """Pre-r4 checkpoints (npz + msgpack state) still load: load_ckpt
        sniffs the v2 magic and falls back to the v1 reader."""
        import jax
        from flax import serialization

        cfg, state = self._make_state()
        state = state.replace(step=state.step + 5)
        payload = {
            "state": serialization.to_bytes(
                jax.tree.map(np.asarray, state)),
            "meta": json.dumps({"step": 5, "cfg": None, "stats": None,
                                "train_vars": None}).encode(),
        }
        path = os.path.join(tmp_path, "000005.ckpt")
        with open(path, "wb") as f:
            np.savez(f, **payload)
        restored, found = load_ckpt(path, state)
        assert found and int(restored.step) == 5
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_device_snapshot_matches_device_get(self):
        """device_snapshot (O(dtypes) batched checkpoint fetch — each relay
        RPC is ~74 ms, so per-leaf to_bytes cost ~25 s/checkpoint in the r4
        full run) must return bit-identical numpy leaves for mixed
        dtypes/shapes, pass scalars and non-jax leaves through, and keep the
        tree structure."""
        import jax
        import jax.numpy as jnp

        from deepsvg_tpu.training.checkpoint import device_snapshot

        tree = {
            "w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4) * 0.5,
            "b": jnp.ones((7,), jnp.bfloat16),
            "n": jnp.asarray(3, jnp.int32),
            "nested": [jnp.full((2, 2, 2), -2.5, jnp.float32),
                       jnp.arange(5, dtype=jnp.int32)],
            "host": np.arange(4.0),  # non-jax leaf: passthrough
            "py": 17,
        }
        snap = device_snapshot(tree)
        ref = jax.tree.map(
            lambda l: np.asarray(l) if isinstance(l, jax.Array) else l, tree)
        assert jax.tree_util.tree_structure(snap) == \
            jax.tree_util.tree_structure(ref)
        for a, b in zip(jax.tree.leaves(snap), jax.tree.leaves(ref)):
            if isinstance(a, np.ndarray):
                assert a.dtype == b.dtype and a.shape == b.shape
                np.testing.assert_array_equal(a, b)
            else:
                assert a == b
        # host-only tree: exact no-op
        assert device_snapshot({"x": np.ones(3), "k": 1})["k"] == 1

    def test_device_snapshot_sharded(self):
        """Sharded train-state leaves (the mesh DP path) snapshot correctly:
        the jitted packer gathers across the 8-device CPU mesh."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from deepsvg_tpu.parallel.mesh import make_mesh
        from deepsvg_tpu.training.checkpoint import device_snapshot

        if jax.device_count() < 2:
            import pytest
            pytest.skip("needs multi-device")
        mesh = make_mesh(jax.device_count())
        x = jnp.arange(jax.device_count() * 6, dtype=jnp.float32)
        xs = jax.device_put(x, NamedSharding(mesh, P(mesh.axis_names[0])))
        snap = device_snapshot({"x": xs, "y": jnp.asarray(2, jnp.int32)})
        np.testing.assert_array_equal(snap["x"], np.asarray(x))
        assert snap["y"] == 2

    def test_train_vars_with_arrays(self, tmp_path):
        """The flagship config's set_train_vars stores numpy model-arg arrays
        in train_vars (default_icons.py); save_ckpt must serialize them
        (caught live by the scale rehearsal: the first flagship-config
        checkpoint save crashed json.dumps on ndarray)."""
        from deepsvg_tpu.training.stats import TrainVars

        cfg, state = self._make_state()
        tv = TrainVars()
        tv.x_inputs_train = [
            {"commands": np.zeros((2, 8), np.int32),
             "args": np.zeros((2, 8, 11), np.float32),
             "tensor": [np.zeros((3, 14), np.float32)],
             "label": np.int32(3)}
        ]
        path = save_ckpt(str(tmp_path), state, cfg, train_vars=tv)
        tv2 = TrainVars()
        _, found = load_ckpt(path, state, train_vars=tv2)
        assert found
        got = tv2.x_inputs_train[0]
        np.testing.assert_array_equal(
            np.asarray(got["commands"]), tv.x_inputs_train[0]["commands"])
        assert np.asarray(got["tensor"][0]).shape == (3, 14)

    def test_latest_selection(self, tmp_path):
        cfg, state = self._make_state()
        save_ckpt(str(tmp_path), state.replace(step=state.step + 3), cfg)
        save_ckpt(str(tmp_path), state.replace(step=state.step + 9), cfg)
        assert latest_ckpt(str(tmp_path)).endswith("000009.ckpt")

    def test_prune_retention(self, tmp_path):
        """prune_ckpts: keeps the newest keep_last + keep_every milestones,
        never best.ckpt; keep_last=None is a no-op (reference keep-all)."""
        from deepsvg_tpu.training.checkpoint import prune_ckpts

        cfg, state = self._make_state()
        for step in (1000, 2000, 2500, 3000, 3500, 4000):
            save_ckpt(str(tmp_path), state.replace(step=step), cfg)

        assert prune_ckpts(str(tmp_path), None) == []
        deleted = prune_ckpts(str(tmp_path), keep_last=2, keep_every=2000)
        names = sorted(os.path.basename(p) for p in deleted)
        # milestones are the FIRST checkpoint of each keep_every bucket
        # (1000 -> bucket 0, 2000 -> bucket 1, 4000 -> bucket 2)
        assert names == ["002500.ckpt", "003000.ckpt"]
        kept = sorted(os.listdir(tmp_path))
        assert kept == ["001000.ckpt", "002000.ckpt", "003500.ckpt",
                        "004000.ckpt", "best.ckpt"]
        # resume still finds the newest survivor
        assert latest_ckpt(str(tmp_path)).endswith("004000.ckpt")

    def test_prune_retention_misaligned_cadence(self, tmp_path):
        """The real-run regression: the checkpoint cadence is snapped to the
        K-step dispatch (e.g. every 1002 steps), so steps NEVER equal a
        keep_every multiple — milestones must still be retained (first
        checkpoint at/after each boundary), and retention must be stable
        across repeated prunes."""
        from deepsvg_tpu.training.checkpoint import prune_ckpts

        cfg, state = self._make_state()
        steps = list(range(1002, 13 * 1002, 1002))  # 1002 .. 12024
        for step in steps:
            save_ckpt(str(tmp_path), state.replace(step=step), cfg)

        prune_ckpts(str(tmp_path), keep_last=3, keep_every=5000)
        kept = sorted(p for p in os.listdir(tmp_path) if p != "best.ckpt")
        # buckets 0/1/2 first-crossings: 1002, 5010, 10020; last 3:
        # 10020, 11022, 12024
        assert kept == ["001002.ckpt", "005010.ckpt", "010020.ckpt",
                        "011022.ckpt", "012024.ckpt"]
        # idempotent: pruning again deletes nothing
        assert prune_ckpts(str(tmp_path), keep_last=3, keep_every=5000) == []
        assert sorted(p for p in os.listdir(tmp_path)
                      if p != "best.ckpt") == kept

    def test_weights_only(self, tmp_path):
        cfg, state = self._make_state()
        p = str(tmp_path / "weights.bin")
        save_model(p, state.params)
        restored = load_model(p, state.params)
        import jax

        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTrainLoop:
    def test_end_to_end_with_resume(self, tmp_path):
        cfg = TinyConfig()
        ds = tiny_dataset()
        state, stats = train(
            cfg, "tiny", "t1", log_dir=str(tmp_path), dataset=ds, max_steps=4
        )
        assert int(state.step) == 4
        ckpt_dir = os.path.join(str(tmp_path), "models", "tiny", "t1")
        assert latest_ckpt(ckpt_dir) is not None

        # resume continues from step 4
        state2, _ = train(
            cfg, "tiny", "t1", log_dir=str(tmp_path), dataset=ds,
            resume=True, max_steps=6,
        )
        assert int(state2.step) == 6

    def test_resume_misaligned_step_still_checkpoints(self, tmp_path):
        """Resuming at a step that is not a multiple of the new dispatch K
        must keep log/val/ckpt cadences alive. Caught live in the r4 full
        run: resume at 23000 with K=6 made every `step % every == 0` check
        unreachable — no logs, no checkpoints, host free-running. Cadences
        now fire on window crossing (step % every < K)."""
        cfg = TinyConfig()
        ds = tiny_dataset()
        train(cfg, "tiny", "mis", log_dir=str(tmp_path), dataset=ds,
              max_steps=5)
        # resume: remaining budget 8 -> K=4; steps 9 and 13 are never
        # ≡ 0 (mod ckpt_every=4)
        state, _ = train(cfg, "tiny", "mis", log_dir=str(tmp_path),
                         dataset=ds, resume=True, max_steps=13)
        assert int(state.step) == 13
        ckpt_dir = os.path.join(str(tmp_path), "models", "tiny", "mis")
        assert os.path.exists(os.path.join(ckpt_dir, "000009.ckpt")), \
            sorted(os.listdir(ckpt_dir))

    def test_profiler_trace_capture(self, tmp_path):
        """--profile equivalent: a jax.profiler device trace of steps
        [start, stop) lands under <log_dir>/profile/."""
        cfg = TinyConfig()
        ds = tiny_dataset()
        train(cfg, "tiny", "prof", log_dir=str(tmp_path), dataset=ds,
              max_steps=4, profile_steps=(2, 4))
        prof_root = os.path.join(str(tmp_path), "profile")
        assert os.path.isdir(prof_root)
        traces = [f for _, _, fs in os.walk(prof_root) for f in fs]
        assert any(f.endswith((".pb", ".json.gz", ".trace.json.gz"))
                   for f in traces), traces

    def test_config_serialization(self):
        cfg = TinyConfig()
        d = cfg.to_dict()
        assert d["batch_size"] == 8
        cfg2 = TinyConfig()
        cfg2.batch_size = 99
        cfg2.load_dict(d)
        assert cfg2.batch_size == 8
        # nested model dataclass round trip
        assert cfg2.model_cfg.d_model == 32


class TestRawSVGPipeline:
    """End-to-end raw-SVG path: preprocess CLI + SVGDataset with on-the-fly
    simplification, on the reference repo's in-tree SVG fixtures."""

    def test_preprocess_cli(self, tmp_path):
        import argparse
        import glob
        import shutil

        import pandas as pd

        from deepsvg_tpu.data.preprocess import run as preprocess_main

        src = tmp_path / "svgs"
        out = tmp_path / "simplified"
        src.mkdir(); out.mkdir()
        for f in sorted(glob.glob("/root/reference/docs/frames/*.svg"))[:4]:
            shutil.copy(f, src)
        meta = tmp_path / "meta.csv"
        args = argparse.Namespace(
            data_folder=str(src), output_folder=str(out),
            output_meta_file=str(meta), workers=1,
        )
        preprocess_main(args)
        df = pd.read_csv(meta)
        assert len(df) == 4
        assert {"id", "total_len", "nb_groups", "max_len_group"} <= set(df.columns)
        assert (df.total_len > 0).all()
        assert len(glob.glob(str(out / "*.svg"))) == 4

    def test_svg_dataset_from_preprocessed(self, tmp_path):
        import argparse
        import glob
        import shutil

        from deepsvg_tpu.data.dataset import SVGDataset
        from deepsvg_tpu.data.preprocess import run as preprocess_main

        src = tmp_path / "svgs"; out = tmp_path / "simplified"
        src.mkdir(); out.mkdir()
        for f in sorted(glob.glob("/root/reference/docs/frames/*.svg"))[:4]:
            shutil.copy(f, src)
        meta = tmp_path / "meta.csv"
        preprocess_main(argparse.Namespace(
            data_folder=str(src), output_folder=str(out),
            output_meta_file=str(meta), workers=1,
        ))

        g, s = 8, 30
        ds = SVGDataset(
            str(out), str(meta), ["commands", "args"], g, s,
            already_preprocessed=True,
        )
        if len(ds) == 0:
            pytest.skip("fixtures exceed sequence budget")
        item = ds[0]
        assert item["commands"].shape == (g, s + 2)
        assert item["args"].shape == (g, s + 2, 11)
        # quantized coordinates
        a = item["args"]
        assert a[a != -1].min() >= 0 and a[a != -1].max() <= 255


class TestCLI:
    def test_train_cli_subprocess(self, tmp_path):
        """The reference-style CLI end to end: config module selected by path,
        dataset loaded via cfg.dataloader_module, a few steps, checkpoint."""
        import subprocess
        import sys
        import pickle

        import pandas as pd

        from deepsvg_tpu.data.synthetic import _random_path

        # tiny on-disk tensor dataset
        data_dir = tmp_path / "tensors"; data_dir.mkdir()
        rng = np.random.default_rng(0)
        rows = []
        for i in range(16):
            t = _random_path(rng, 5)
            with open(data_dir / f"i{i}.pkl", "wb") as f:
                pickle.dump({"tensors": [t], "fillings": [0]}, f)
            rows.append({"id": f"i{i}", "total_len": 6, "nb_groups": 1,
                         "max_len_group": 6})
        meta = tmp_path / "meta.csv"
        pd.DataFrame(rows).to_csv(meta, index=False)

        # experiment config module
        cfg_dir = tmp_path / "cfgs"; cfg_dir.mkdir()
        (cfg_dir / "__init__.py").write_text("")
        (cfg_dir / "tiny.py").write_text(f'''
from deepsvg_tpu.models.config import ModelConfig
from deepsvg_tpu.training.config import TrainConfig

class Config(TrainConfig):
    def __init__(self, num_devices=1):
        super().__init__(num_devices)
        self.model_cfg = ModelConfig(
            encode_stages=2, decode_stages=2, use_vae=False,
            max_num_groups=2, max_seq_len=6, d_model=32, dim_feedforward=64,
            dim_z=16, n_layers=1, n_layers_decode=1, n_heads=4, dropout=0.0)
        self.model_args = self.model_cfg.get_model_args()
        self.data_dir = {str(data_dir)!r}
        self.meta_filepath = {str(meta)!r}
        self.max_num_groups = 2
        self.max_seq_len = 6
        self.batch_size = 4
        self.num_steps = 3
        self.num_epochs = 100
        self.log_every = 1
        self.val_every = 1000
        self.ckpt_every = 2
        self.warmup_steps = 1
        self.loader_num_workers = 1

    def get_weights(self, step, epoch):
        return {{"kl_tolerance": 0.1, "loss_kl_weight": 1.0,
                "loss_visibility_weight": 1.0, "loss_cmd_weight": 1.0,
                "loss_args_weight": 2.0}}
''')
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = f"{tmp_path}:/root/repo:" + env.get("PYTHONPATH", "")
        # force cpu via a sitecustomize-resistant wrapper
        runner = tmp_path / "run.py"
        runner.write_text(
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import sys\n"
            "from deepsvg_tpu.training.train import main\n"
            "sys.argv = ['train', '--config-module', 'cfgs.tiny',\n"
            f"            '--log-dir', {str(tmp_path / 'logs')!r}]\n"
            "main()\n"
        )
        out = subprocess.run(
            [sys.executable, str(runner)], env=env, capture_output=True,
            text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "[train] step" in out.stdout
        from deepsvg_tpu.training.checkpoint import latest_ckpt

        ckpt_dir = tmp_path / "logs" / "models" / "cfgs" / "tiny"
        assert latest_ckpt(str(ckpt_dir)) is not None

    def test_train_cli_mesh_resume(self, tmp_path):
        """The real CLI on a virtual 8-device mesh with a mid-run checkpoint
        and --resume: restoring replicated state under a shard_map'd step
        (reference semantics: train.py:60-65 + nn.DataParallel wrap at :74).
        The second invocation must pick up the latest checkpoint, replicate
        it over the mesh and continue to the step budget."""
        import pickle
        import subprocess
        import sys

        import pandas as pd

        from deepsvg_tpu.data.synthetic import _random_path

        data_dir = tmp_path / "tensors"; data_dir.mkdir()
        rng = np.random.default_rng(0)
        rows = []
        for i in range(16):
            t = _random_path(rng, 5)
            with open(data_dir / f"i{i}.pkl", "wb") as f:
                pickle.dump({"tensors": [t], "fillings": [0]}, f)
            rows.append({"id": f"i{i}", "total_len": 6, "nb_groups": 1,
                         "max_len_group": 6})
        meta = tmp_path / "meta.csv"
        pd.DataFrame(rows).to_csv(meta, index=False)

        cfg_dir = tmp_path / "cfgs"; cfg_dir.mkdir()
        (cfg_dir / "__init__.py").write_text("")
        (cfg_dir / "tiny8.py").write_text(f'''
from deepsvg_tpu.models.config import ModelConfig
from deepsvg_tpu.training.config import TrainConfig

class Config(TrainConfig):
    def __init__(self, num_devices=8):        # DP over the 8-device mesh
        super().__init__(num_devices)
        self.model_cfg = ModelConfig(
            encode_stages=2, decode_stages=2, use_vae=False,
            max_num_groups=2, max_seq_len=6, d_model=32, dim_feedforward=64,
            dim_z=16, n_layers=1, n_layers_decode=1, n_heads=4, dropout=0.0)
        self.model_args = self.model_cfg.get_model_args()
        self.data_dir = {str(data_dir)!r}
        self.meta_filepath = {str(meta)!r}
        self.max_num_groups = 2
        self.max_seq_len = 6
        self.batch_size = 8
        self.num_steps = None          # budget via --max-steps (an argument,
        self.num_epochs = 100          # NOT clobbered by the resume cfg
        self.log_every = 1             # restore — reference semantics)
        self.val_every = 1000
        self.ckpt_every = 2
        self.warmup_steps = 1
        self.loader_num_workers = 1

    def get_weights(self, step, epoch):
        return {{"kl_tolerance": 0.1, "loss_kl_weight": 1.0,
                "loss_visibility_weight": 1.0, "loss_cmd_weight": 1.0,
                "loss_args_weight": 2.0}}
''')
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8").strip()
        env["PYTHONPATH"] = f"{tmp_path}:/root/repo:" + env.get("PYTHONPATH", "")

        def run(extra_argv):
            runner = tmp_path / "run.py"
            runner.write_text(
                "import jax\n"
                "jax.config.update('jax_platforms', 'cpu')\n"
                "import sys\n"
                "from deepsvg_tpu.training.train import main\n"
                "sys.argv = ['train', '--config-module', 'cfgs.tiny8',\n"
                f"            '--log-dir', {str(tmp_path / 'logs')!r}"
                f"{extra_argv}]\n"
                "main()\n"
            )
            return subprocess.run(
                [sys.executable, str(runner)], env=env, capture_output=True,
                text=True, timeout=600,
            )

        out = run(", '--max-steps', '3'")
        assert out.returncode == 0, out.stderr[-2000:]
        from deepsvg_tpu.training.checkpoint import latest_ckpt

        ckpt_dir = tmp_path / "logs" / "models" / "cfgs" / "tiny8"
        first = latest_ckpt(str(ckpt_dir))
        assert first is not None and first.endswith("000003.ckpt"), first

        out2 = run(", '--resume', '--max-steps', '5'")
        assert out2.returncode == 0, out2.stderr[-2000:]
        assert "Resuming model at step 3" in out2.stdout
        last = latest_ckpt(str(ckpt_dir))
        assert last is not None and last.endswith("000005.ckpt"), last


class TestWireFormat:
    """Narrow-integer wire format for host->device transfer (loader.py
    compress_batch/decompress_batch): exact round trip, applied by prefetch,
    inverted inside the jitted step."""

    def test_compress_roundtrip_exact(self):
        import jax.numpy as jnp

        from deepsvg_tpu.data.loader import compress_batch, decompress_batch

        ds = tiny_dataset()
        batch = collate([ds[i] for i in range(8)])
        wire = compress_batch(batch)
        assert wire["commands"].dtype == np.int8
        # with the matching commands tensor in-batch, -1 pad slots are implied
        # by CMD_ARGS_MASK and absolute args ship as pure uint8
        assert wire["args"].dtype == np.uint8
        assert wire["commands"].nbytes * 4 == batch["commands"].astype(np.int32).nbytes
        # without the commands key the -1s can't be reconstructed -> int16
        solo = compress_batch({"args": batch["args"]})
        assert solo["args"].dtype == np.int16
        back = decompress_batch({k: jnp.asarray(v) for k, v in wire.items()})
        assert back["args"].dtype == jnp.float32
        assert back["commands"].dtype == jnp.int32
        for k in ("commands", "args"):
            np.testing.assert_array_equal(np.asarray(back[k]), batch[k])

    def test_decompress_is_noop_on_canonical(self):
        import jax.numpy as jnp

        from deepsvg_tpu.data.loader import decompress_batch

        batch = {"commands": jnp.zeros((2, 3), jnp.int32),
                 "args": jnp.zeros((2, 3, 11), jnp.float32)}
        out = decompress_batch(batch)
        assert out["commands"].dtype == jnp.int32
        assert out["args"].dtype == jnp.float32

    def test_train_step_accepts_wire_batches(self):
        """A step fed int8/int16 wire batches produces the identical loss to
        one fed canonical float batches."""
        import jax.numpy as jnp

        from deepsvg_tpu.data.loader import compress_batch
        from deepsvg_tpu.models import ModelConfig, SVGTransformer
        from deepsvg_tpu.training.trainer import (
            create_train_state, jit_train_step, make_optimizer)

        cfg = ModelConfig(encode_stages=2, decode_stages=2, use_vae=False,
                          max_num_groups=3, max_seq_len=6, d_model=32,
                          dim_feedforward=64, dim_z=16, n_layers=1,
                          n_layers_decode=1, n_heads=4, dropout=0.0)
        model = SVGTransformer(cfg)
        model_args = cfg.get_model_args()
        ds = tiny_dataset()
        batch = collate([ds[i] for i in range(8)])
        jb = {k: jnp.asarray(batch[k]) for k in set(model_args)}
        wb = {k: jnp.asarray(v) for k, v in compress_batch(
            {k: batch[k] for k in set(model_args)}).items()}
        weights = {"kl_tolerance": 0.1, "loss_kl_weight": 1.0,
                   "loss_visibility_weight": 1.0, "loss_cmd_weight": 1.0,
                   "loss_args_weight": 2.0}
        optimizer = make_optimizer(lambda s: 1e-3)
        state = create_train_state(model, optimizer, jb, model_args)
        step = jit_train_step(model, optimizer, model_args, donate=False)
        _, res_f = step(state, jb, weights)
        _, res_w = step(state, wb, weights)
        np.testing.assert_allclose(float(res_f["loss"]), float(res_w["loss"]),
                                   rtol=1e-6)

    def test_process_worker_mode_matches_thread_mode(self):
        ds = tiny_dataset()
        kw = dict(batch_size=8, shuffle=True, seed=3)
        thread = list(DataLoader(ds, num_workers=2, **kw))
        proc_loader = DataLoader(ds, num_workers=2, worker_mode="process", **kw)
        try:
            proc = list(proc_loader)
        finally:
            proc_loader.close()
        assert len(proc) == len(thread)
        for a, b in zip(thread, proc):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


class TestVisualizeHook:
    def test_reconstruction_grid_written_to_tensorboard(self, tmp_path):
        """The real config path's visualize hook (configs_tpu/default_icons.py
        -> greedy_sample -> make_grid -> TB images) runs during train() at
        val_every cadence and writes image summaries (reference
        default_icons.py:79-97 + train.py:124-132)."""
        import dataclasses
        import glob as _glob

        from configs_tpu.default_icons import Config
        from deepsvg_tpu.training.train import train

        cfg = Config(1)
        cfg.model_cfg = dataclasses.replace(
            cfg.model_cfg, d_model=32, dim_feedforward=64, dim_z=16,
            n_layers=1, n_layers_decode=1, n_heads=4, max_num_groups=3,
            max_seq_len=6, dropout=0.0, compute_dtype="float32",
            attention_impl="xla",
        )
        cfg.model_args = cfg.model_cfg.get_model_args()
        cfg.batch_size = 8
        cfg.num_epochs = 1
        cfg.val_every = 2
        cfg.log_every = 100
        cfg.ckpt_every = 100
        cfg.loader_num_workers = 1

        ds = SyntheticIconDataset(n=16, max_num_groups=3, max_seq_len=6)
        log_dir = str(tmp_path / "logs")
        train(cfg, "viz", "test", log_dir=log_dir, debug=True, dataset=ds,
              max_steps=2)

        events = _glob.glob(
            os.path.join(log_dir, "tensorboard", "**", "events.*"),
            recursive=True)
        assert events, "no tensorboard event files written"
        # scan the raw event files for the reconstruction image tag bytes
        blob = b"".join(open(f, "rb").read() for f in events)
        assert b"reconstructions_train" in blob, \
            "visualize hook wrote no reconstruction image summaries"

    def test_visualize_label_conditioned(self, tmp_path):
        """The visualize hook must pass class labels through to the encoder
        for label-conditioned (fonts) models — encoding without them fails
        (configs_tpu/default_icons.py visualize kw['label'])."""
        import dataclasses
        import glob as _glob

        from configs_tpu.hierarchical_ordered_fonts import Config
        from deepsvg_tpu.training.train import train

        cfg = Config(1)
        cfg.model_cfg = dataclasses.replace(
            cfg.model_cfg, d_model=32, dim_feedforward=64, dim_z=16,
            n_layers=1, n_layers_decode=1, n_heads=4, max_num_groups=3,
            max_seq_len=6, dropout=0.0, compute_dtype="float32",
            attention_impl="xla", n_labels=5,
        )
        cfg.model_args = cfg.model_cfg.get_model_args()
        assert "label" in cfg.model_args
        cfg.batch_size = 8
        cfg.num_epochs = 1
        cfg.val_every = 2
        cfg.log_every = 100
        cfg.ckpt_every = 100
        cfg.loader_num_workers = 1

        ds = SyntheticIconDataset(n=16, max_num_groups=3, max_seq_len=6,
                                  label_range=5)
        log_dir = str(tmp_path / "logs")
        train(cfg, "fviz", "test", log_dir=log_dir, dataset=ds, max_steps=2)

        events = _glob.glob(
            os.path.join(log_dir, "tensorboard", "**", "events.*"),
            recursive=True)
        blob = b"".join(open(f, "rb").read() for f in events)
        assert b"reconstructions_train" in blob, \
            "label-conditioned visualize wrote no reconstruction summaries"

    def test_visualize_async_background_worker(self, tmp_path):
        """With async_host_io (the default outside debug) the visualize hook
        runs on a background worker over a device-side params COPY (the
        train step donates state); train() drains the worker before
        returning, so the TB images are complete afterwards."""
        import dataclasses
        import glob as _glob

        from configs_tpu.default_icons import Config
        from deepsvg_tpu.training.train import train

        cfg = Config(1)
        cfg.model_cfg = dataclasses.replace(
            cfg.model_cfg, d_model=32, dim_feedforward=64, dim_z=16,
            n_layers=1, n_layers_decode=1, n_heads=4, max_num_groups=3,
            max_seq_len=6, dropout=0.0, compute_dtype="float32",
            attention_impl="xla",
        )
        cfg.model_args = cfg.model_cfg.get_model_args()
        cfg.batch_size = 8
        cfg.num_epochs = 1
        cfg.val_every = 2
        cfg.log_every = 100
        cfg.ckpt_every = 2          # also exercise the write-behind saves
        cfg.loader_num_workers = 1
        assert cfg.async_host_io   # default on

        ds = SyntheticIconDataset(n=16, max_num_groups=3, max_seq_len=6)
        log_dir = str(tmp_path / "logs")
        state, _ = train(cfg, "aviz", "test", log_dir=log_dir, dataset=ds,
                         max_steps=4)
        assert int(state.step) == 4

        events = _glob.glob(
            os.path.join(log_dir, "tensorboard", "**", "events.*"),
            recursive=True)
        blob = b"".join(open(f, "rb").read() for f in events)
        assert b"reconstructions_train" in blob, \
            "async visualize wrote no reconstruction image summaries"
        # write-behind checkpoints landed too (cadence + final)
        ckpt_dir = os.path.join(log_dir, "models", "aviz", "test")
        assert latest_ckpt(ckpt_dir) is not None


class TestFullRunOrchestrator:
    def test_merge_segments(self):
        """full_run.py merges resumable-segment reports: summed pure-train
        wall time, concatenated curve, last segment's terminal fields."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "full_run", os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "scripts", "full_run.py"))
        full_run = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(full_run)

        seg0 = {"steps_run": 100, "wall_s_total": 10.0, "epochs_crossed": 1,
                "curve": [{"step": 16, "loss": 13.0},
                          {"step": 96, "loss": 9.0}],
                "checkpoints": ["000100.ckpt"]}
        seg1 = {"steps_run": 200, "wall_s_total": 7.5, "epochs_crossed": 1,
                "curve": [{"step": 160, "loss": 8.0},
                          {"step": 200, "loss": 7.0}],
                "checkpoints": ["000100.ckpt", "000200.ckpt"]}
        m = full_run.merge_segments([seg0, seg1])
        assert m["steps_run"] == 200
        assert m["attempts"] == 2
        assert m["wall_s_total"] == 17.5
        assert m["epochs_crossed"] == 2
        assert [p["step"] for p in m["curve"]] == [16, 96, 160, 200]
        assert m["loss_first"] == {"step": 16, "loss": 13.0}
        assert m["loss_last"] == {"step": 200, "loss": 7.0}
        assert m["checkpoints"] == ["000100.ckpt", "000200.ckpt"]
