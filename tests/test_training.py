"""End-to-end training tests: the jitted train step descends on synthetic data,
single-device and sharded over the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsvg_tpu.data.synthetic import SyntheticIconDataset, generate_batch
from deepsvg_tpu.models import ModelConfig, SVGTransformer
from deepsvg_tpu.parallel.mesh import make_mesh, make_parallel_train_step, shard_batch
from deepsvg_tpu.training.schedulers import warmup_step_decay
from deepsvg_tpu.training.trainer import (
    create_train_state,
    jit_eval_step,
    jit_train_step,
    make_optimizer,
)

WEIGHTS = dict(
    kl_tolerance=0.1, loss_kl_weight=1.0, loss_visibility_weight=1.0,
    loss_cmd_weight=1.0, loss_args_weight=2.0,
)


def tiny_cfg(**kw):
    base = dict(
        encode_stages=2, decode_stages=2, use_vae=False,
        max_num_groups=3, max_seq_len=6, d_model=48, dim_feedforward=96,
        dim_z=24, n_layers=2, n_layers_decode=2, n_heads=4, dropout=0.0,
    )
    return ModelConfig(**{**base, **kw})


def device_batch(batch, model_args):
    return {k: jnp.asarray(batch[k]) for k in set(model_args) & set(batch)}


class TestSchedulers:
    def test_warmup_then_decay(self):
        """Reference-exact semantics (see schedulers.py docstring +
        test_torch_parity_grad.py::TestLRScheduleParity): step 0 at lr=0,
        base reached AT warmup_steps, decay boundaries every decay_every/2
        post-warmup (the reference double-steps its StepLR)."""
        sched = warmup_step_decay(1e-3, warmup_steps=10, decay_every=100, gamma=0.5)
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(9)), 9e-4, rtol=1e-5)
        np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)
        np.testing.assert_allclose(float(sched(50)), 1e-3, rtol=1e-5)
        # boundary: 2*(s-10)+9 >= 100  =>  s = 56
        np.testing.assert_allclose(float(sched(55)), 1e-3, rtol=1e-5)
        np.testing.assert_allclose(float(sched(56)), 5e-4, rtol=1e-5)
        np.testing.assert_allclose(float(sched(115)), 2.5e-4, rtol=1e-5)


class TestTrainStep:
    def test_loss_descends(self, rng):
        cfg = tiny_cfg()
        model = SVGTransformer(cfg)
        model_args = cfg.get_model_args()
        batch = device_batch(
            generate_batch(rng, 16, cfg.max_num_groups, cfg.max_seq_len), model_args
        )
        optimizer = make_optimizer(warmup_step_decay(2e-3, 5, 10_000))
        state = create_train_state(model, optimizer, batch, model_args)
        step = jit_train_step(model, optimizer, model_args)

        losses = []
        for _ in range(30):
            state, res = step(state, batch, WEIGHTS)
            losses.append(float(res["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses[::10]
        assert int(state.step) == 30

    def test_eval_step_deterministic(self, rng):
        cfg = tiny_cfg(use_vae=True)
        model = SVGTransformer(cfg)
        model_args = cfg.get_model_args()
        batch = device_batch(
            generate_batch(rng, 4, cfg.max_num_groups, cfg.max_seq_len), model_args
        )
        optimizer = make_optimizer(warmup_step_decay(1e-3, 5, 1000))
        state = create_train_state(model, optimizer, batch, model_args)
        evalf = jit_eval_step(model, model_args)
        r1 = evalf(state, batch, WEIGHTS)
        r2 = evalf(state, batch, WEIGHTS)
        assert float(r1["loss"]) == float(r2["loss"])

    def test_kl_ramp_no_recompile(self, rng):
        """Loss weights are traced values: changing them must not retrigger
        compilation (checked via jit cache stats)."""
        cfg = tiny_cfg(use_vae=True)
        model = SVGTransformer(cfg)
        model_args = cfg.get_model_args()
        batch = device_batch(
            generate_batch(rng, 4, cfg.max_num_groups, cfg.max_seq_len), model_args
        )
        optimizer = make_optimizer(warmup_step_decay(1e-3, 5, 1000))
        state = create_train_state(model, optimizer, batch, model_args)
        step = jit_train_step(model, optimizer, model_args)
        for i in range(3):
            w = dict(WEIGHTS, loss_kl_weight=jnp.float32(i * 0.5))
            state, _ = step(state, batch, w)
        assert step._cache_size() == 1


class TestParallel:
    def test_mesh_sharded_training(self, rng):
        """Full DP train step over the virtual 8-device mesh: state replicated,
        batch sharded, loss matches the single-device step."""
        assert jax.device_count() >= 8
        cfg = tiny_cfg()
        model = SVGTransformer(cfg)
        model_args = cfg.get_model_args()
        batch = device_batch(
            generate_batch(rng, 16, cfg.max_num_groups, cfg.max_seq_len), model_args
        )
        optimizer = make_optimizer(warmup_step_decay(1e-3, 5, 1000))

        # single-device reference
        state1 = create_train_state(model, optimizer, batch, model_args)
        step1 = jit_train_step(model, optimizer, model_args, donate=False)
        _, res1 = step1(state1, batch, WEIGHTS)

        mesh = make_mesh(8)
        state8 = create_train_state(model, optimizer, batch, model_args)
        pstep = make_parallel_train_step(model, optimizer, model_args, mesh)
        sharded = shard_batch(batch, mesh)
        state8, res8 = pstep(state8, sharded, WEIGHTS)
        np.testing.assert_allclose(
            float(res1["loss"]), float(res8["loss"]), rtol=2e-4
        )

        # a few more steps run fine and descend
        losses = [float(res8["loss"])]
        for _ in range(10):
            state8, res8 = pstep(state8, sharded, WEIGHTS)
            losses.append(float(res8["loss"]))
        assert losses[-1] < losses[0]

    def test_mesh_self_match_variant(self, rng):
        """Hungarian (self-match) training under shard_map: the fused
        pairwise-cost path + on-device exact assignment must partition
        correctly (the reference trains this variant via DataParallel,
        deepsvg/train.py:74). Sharded loss must match single-device."""
        assert jax.device_count() >= 8
        cfg = tiny_cfg(self_match=True)
        model = SVGTransformer(cfg)
        model_args = cfg.get_model_args()
        batch = device_batch(
            generate_batch(rng, 16, cfg.max_num_groups, cfg.max_seq_len),
            model_args)
        optimizer = make_optimizer(warmup_step_decay(1e-3, 5, 1000))

        state1 = create_train_state(model, optimizer, batch, model_args)
        step1 = jit_train_step(model, optimizer, model_args, donate=False)
        _, res1 = step1(state1, batch, WEIGHTS)

        mesh = make_mesh(8)
        state8 = create_train_state(model, optimizer, batch, model_args)
        pstep = make_parallel_train_step(model, optimizer, model_args, mesh)
        state8, res8 = pstep(state8, shard_batch(batch, mesh), WEIGHTS)
        np.testing.assert_allclose(
            float(res1["loss"]), float(res8["loss"]), rtol=2e-4)
        for _ in range(3):
            state8, res8 = pstep(state8, shard_batch(batch, mesh), WEIGHTS)
            assert np.isfinite(float(res8["loss"]))

    def test_mesh_label_conditioned_variant(self, rng):
        """Label-conditioned (fonts recipe) training + greedy sampling under
        the mesh: the label operand shards with the batch."""
        assert jax.device_count() >= 8
        cfg = tiny_cfg(label_condition=True, n_labels=16)
        model = SVGTransformer(cfg)
        model_args = cfg.get_model_args()
        raw = generate_batch(rng, 16, cfg.max_num_groups, cfg.max_seq_len,
                             label_range=cfg.n_labels)
        batch = device_batch(raw, model_args)
        assert "label" in batch
        optimizer = make_optimizer(warmup_step_decay(1e-3, 5, 1000))

        state1 = create_train_state(model, optimizer, batch, model_args)
        step1 = jit_train_step(model, optimizer, model_args, donate=False)
        _, res1 = step1(state1, batch, WEIGHTS)

        mesh = make_mesh(8)
        state8 = create_train_state(model, optimizer, batch, model_args)
        pstep = make_parallel_train_step(model, optimizer, model_args, mesh)
        sharded = shard_batch(batch, mesh)
        state8, res8 = pstep(state8, sharded, WEIGHTS)
        np.testing.assert_allclose(
            float(res1["loss"]), float(res8["loss"]), rtol=2e-4)

        from deepsvg_tpu.models.sample import one_shot_sample
        from deepsvg_tpu.parallel.mesh import replicated

        @jax.jit
        def sample_fn(params, c, a, lab):
            return one_shot_sample(model, {"params": params},
                                   commands_enc=c, args_enc=a, label=lab)

        oc, oa = sample_fn(jax.device_put(state8.params, replicated(mesh)),
                           sharded["commands"], sharded["args"],
                           sharded["label"])
        assert oc.shape[0] == 16

    def test_dataset_batching(self):
        ds = SyntheticIconDataset(n=32, max_num_groups=3, max_seq_len=6)
        b = ds.get_batch(range(8))
        assert b["commands"].shape == (8, 3, 8)
        # reproducible
        b2 = ds.get_batch(range(8))
        assert (b["commands"] == b2["commands"]).all()


class TestPrefetch:
    def test_prefetch_to_device_mesh(self):
        """Device prefetch with a mesh: batches come back sharded over the
        data axis and in order."""
        import numpy as np

        from deepsvg_tpu.data.loader import DataLoader, prefetch_to_device
        from deepsvg_tpu.data.synthetic import SyntheticIconDataset

        mesh = make_mesh(8)
        ds = SyntheticIconDataset(n=32, max_num_groups=3, max_seq_len=6)
        loader = DataLoader(ds, batch_size=16, num_workers=1, shuffle=False)
        host = list(loader)
        dev = list(prefetch_to_device(
            DataLoader(ds, batch_size=16, num_workers=1, shuffle=False),
            size=2, mesh=mesh, keys={"commands", "args"},
        ))
        assert len(dev) == len(host)
        for h, d in zip(host, dev):
            assert len(d["commands"].sharding.device_set) == 8
            np.testing.assert_array_equal(np.asarray(d["commands"]),
                                          h["commands"])


class TestMultiHostInput:
    def test_global_batch_single_host_degrades_to_shard(self, rng):
        from deepsvg_tpu.parallel.mesh import global_batch_from_local, make_mesh

        mesh = make_mesh(8)
        batch = {"x": np.arange(32, dtype=np.float32).reshape(32, 1)}
        out = global_batch_from_local(batch, mesh)
        assert out["x"].shape == (32, 1)
        np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])

    def test_mesh_2d(self):
        from deepsvg_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, model_axis="model", n_model=2)
        assert mesh.shape == {"data": 4, "model": 2}


class TestTensorParallel:
    def test_tp_matches_single_device(self, rng):
        """GSPMD tensor-parallel step on a 2x4 (data x model) mesh: Megatron
        weight shardings really distribute the layer kernels, and the
        loss/updated params match the single-device step."""
        from deepsvg_tpu.parallel.mesh import make_mesh, shard_batch
        from deepsvg_tpu.parallel.tp import (
            make_tp_train_step,
            shard_state_tp,
            state_tp_shardings,
        )

        assert jax.device_count() >= 8
        cfg = tiny_cfg(attention_impl="xla")
        model = SVGTransformer(cfg)
        model_args = cfg.get_model_args()
        batch = device_batch(
            generate_batch(rng, 16, cfg.max_num_groups, cfg.max_seq_len),
            model_args)
        optimizer = make_optimizer(warmup_step_decay(1e-3, 5, 1000))

        state1 = create_train_state(model, optimizer, batch, model_args)
        step1 = jit_train_step(model, optimizer, model_args, donate=False)
        ref_state, res1 = step1(state1, batch, WEIGHTS)

        mesh = make_mesh(8, model_axis="model", n_model=4)
        state_tp = shard_state_tp(
            create_train_state(model, optimizer, batch, model_args), mesh)
        # the rules actually shard: a QKV kernel is split over 'model'
        sh = state_tp_shardings(state_tp, mesh)
        flat = jax.tree_util.tree_flatten_with_path(sh)[0]
        qkv = [s for p, s in flat if "'wqkv'" in jax.tree_util.keystr(p)]
        assert qkv and all(tuple(s.spec) == (None, "model") for s in qkv)
        step_tp = make_tp_train_step(model, optimizer, model_args, mesh,
                                     state_tp, donate=False)
        sharded = shard_batch(batch, mesh)
        state_tp, res_tp = step_tp(state_tp, sharded, WEIGHTS)
        np.testing.assert_allclose(
            float(res1["loss"]), float(res_tp["loss"]), rtol=2e-4)

        # params after one update agree leaf-wise with the single-device step
        ref_leaves = jax.tree.leaves(ref_state.params)
        tp_leaves = jax.tree.leaves(state_tp.params)
        for a, b in zip(ref_leaves, tp_leaves):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6)

        # keeps descending over further steps
        losses = [float(res_tp["loss"])]
        for _ in range(5):
            state_tp, res_tp = step_tp(state_tp, sharded, WEIGHTS)
            losses.append(float(res_tp["loss"]))
        assert losses[-1] < losses[0]


class TestDelayedStart:
    def test_optimizer_start_gating(self):
        """delayed_start reproduces the reference optimizer_starts semantics
        (train.py:97-106): zero updates AND frozen optimizer state before the
        start step, normal stepping after."""
        import optax

        from deepsvg_tpu.training.trainer import delayed_start

        base = optax.adam(1e-2)
        opt = delayed_start(base, start_step=3)
        params = {"w": jnp.ones((4,))}
        state = opt.init(params)
        grads = {"w": jnp.full((4,), 0.5)}

        for step in range(3):
            updates, state = opt.update(grads, state, params)
            assert float(jnp.abs(updates["w"]).max()) == 0.0, step
        # inner adam moments must still be zero (frozen, not accumulated)
        inner, count = state
        assert int(count) == 3
        mu = jax.tree.leaves(inner)
        assert all(float(jnp.abs(m).max()) == 0.0 for m in mu if hasattr(m, "max"))

        updates, state = opt.update(grads, state, params)
        assert float(jnp.abs(updates["w"]).max()) > 0.0
        # first live step == a fresh optimizer's first step
        fresh_updates, _ = base.update(grads, base.init(params), params)
        np.testing.assert_allclose(np.asarray(updates["w"]),
                                   np.asarray(fresh_updates["w"]), rtol=1e-6)

    def test_multi_optimizer_list_hook(self, rng):
        """make_optimizers = the reference's multi-optimizer LIST with
        per-optimizer optimizer_starts (train.py:91-112): parameter
        partitions step under their own optimizer, the delayed partition
        stays EXACTLY frozen until its start step, and the whole thing drives
        the ordinary jitted train_step."""
        import optax

        from deepsvg_tpu.training.trainer import make_optimizers, train_step

        cfg = tiny_cfg()
        model = SVGTransformer(cfg)
        model_args = cfg.get_model_args()
        batch = device_batch(
            generate_batch(rng, 4, cfg.max_num_groups, cfg.max_seq_len),
            model_args)

        def labels(params):
            return {k: ("enc" if k == "encoder" else "rest")
                    for k in params}

        optimizer = make_optimizers(
            {
                "enc": dict(lr_schedule=optax.constant_schedule(1e-3),
                            start_step=2),
                "rest": dict(lr_schedule=optax.constant_schedule(1e-3)),
            },
            labels,
        )
        state = create_train_state(model, optimizer, batch, model_args)
        enc0 = jax.tree.map(np.asarray, state.params["encoder"])
        dec0 = jax.tree.map(np.asarray, state.params["decoder"])

        def diff(a, b):
            return max(float(jnp.abs(x - jnp.asarray(y)).max())
                       for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

        for step in range(2):  # encoder frozen, rest training
            state, _ = train_step(state, batch, WEIGHTS, model, optimizer,
                                  model_args)
            assert diff(state.params["encoder"], enc0) == 0.0, step
        assert diff(state.params["decoder"], dec0) > 0.0
        dec_after_2 = jax.tree.map(np.asarray, state.params["decoder"])

        state, _ = train_step(state, batch, WEIGHTS, model, optimizer,
                              model_args)  # step 2: encoder starts
        assert diff(state.params["encoder"], enc0) > 0.0
        assert diff(state.params["decoder"], dec_after_2) > 0.0


class TestMultiStepDispatch:
    def test_k_steps_equal_k_single_steps(self, rng):
        """jit_train_multi_step over a [K, B, ...] stacked batch produces the
        same final state and per-step losses as K sequential single steps
        with the same per-step weights."""
        from deepsvg_tpu.training.trainer import jit_train_multi_step
        from deepsvg_tpu.training.schedulers import linear_ramp

        cfg = tiny_cfg()
        model = SVGTransformer(cfg)
        model_args = cfg.get_model_args()
        K = 4
        batches = [
            device_batch(
                generate_batch(np.random.default_rng(100 + i), 8,
                               cfg.max_num_groups, cfg.max_seq_len),
                model_args,
            )
            for i in range(K)
        ]
        optimizer = make_optimizer(warmup_step_decay(1e-3, 5, 1000))

        ramp = linear_ramp(0, 10, 0.5, 2.0)

        def weights_fn(step):
            return dict(WEIGHTS, loss_args_weight=ramp(step))

        # K single steps
        s1 = create_train_state(model, optimizer, batches[0], model_args)
        step1 = jit_train_step(model, optimizer, model_args, donate=False)
        singles = []
        for i in range(K):
            s1, res = step1(s1, batches[i], weights_fn(s1.step))
            singles.append(float(res["loss"]))

        # one K-step dispatch
        s2 = create_train_state(model, optimizer, batches[0], model_args)
        multi = jit_train_multi_step(model, optimizer, model_args, weights_fn,
                                     donate=False)
        stacked = {
            k: jnp.stack([b[k] for b in batches]) for k in batches[0]
        }
        s2, res = multi(s2, stacked)
        np.testing.assert_allclose(np.asarray(res["loss"]),
                                   np.asarray(singles), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        assert int(s2.step) == K


class TestParallelMultiStep:
    def test_mesh_k_steps_equal_k_single(self, rng):
        """make_parallel_multi_step over the virtual 8-device mesh == K
        sequential shard_map'd steps."""
        from deepsvg_tpu.parallel.mesh import (
            make_parallel_multi_step, shard_batch)

        cfg = tiny_cfg()
        model = SVGTransformer(cfg)
        model_args = cfg.get_model_args()
        K = 3
        batches = [
            device_batch(
                generate_batch(np.random.default_rng(300 + i), 16,
                               cfg.max_num_groups, cfg.max_seq_len),
                model_args,
            )
            for i in range(K)
        ]
        optimizer = make_optimizer(warmup_step_decay(1e-3, 5, 1000))
        mesh = make_mesh(8)

        def weights_fn(step):
            return dict(WEIGHTS)

        # K single parallel steps
        s1 = create_train_state(model, optimizer, batches[0], model_args)
        pstep = make_parallel_train_step(model, optimizer, model_args, mesh)
        singles = []
        for i in range(K):
            s1, res = pstep(s1, shard_batch(batches[i], mesh), WEIGHTS)
            singles.append(float(res["loss"]))

        # one K-step parallel dispatch
        s2 = create_train_state(model, optimizer, batches[0], model_args)
        multi = make_parallel_multi_step(model, optimizer, model_args, mesh,
                                         weights_fn)
        stacked = shard_batch(
            {k: np.stack([np.asarray(b[k]) for b in batches])
             for k in batches[0]},
            mesh, batch_dim=1,
        )
        s2, res = multi(s2, stacked)
        np.testing.assert_allclose(np.asarray(res["loss"]),
                                   np.asarray(singles), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
