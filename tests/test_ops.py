"""Tests for TPU kernels (run interpreted on the CPU backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsvg_tpu.ops.attention import fused_mha, mha_reference, pick_tile_b


def rand_inputs(rng, b, s, d):
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * d) * 0.05, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)
    return x, wqkv, bqkv, wo, bo


class TestFusedMHA:
    @pytest.mark.parametrize("s", [8, 31, 32])
    def test_matches_reference(self, rng, s):
        b, d, h = 16, 64, 4
        x, wqkv, bqkv, wo, bo = rand_inputs(rng, b, s, d)
        mask = np.zeros((b, s), np.float32)
        mask[:, max(s - 6, 1):] = -np.inf
        mask = jnp.asarray(mask)
        ref = mha_reference(x, wqkv, bqkv, wo, bo, mask, h)
        out = fused_mha(x, wqkv, bqkv, wo, bo, mask, n_heads=h,
                        tile_b=pick_tile_b(b, s))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_overflow_clamp_stays_finite(self, rng):
        """Inference kernels clamp scores at 85 (exp overflow guard, see
        ops/layer.py): with QKV scaled so q.k >> f32 exp range, output is
        finite; at moderate scale (scores < 85) it is still exact."""
        b, s, d, h = 8, 8, 64, 4
        x, wqkv, bqkv, wo, bo = rand_inputs(rng, b, s, d)
        mask = jnp.zeros((b, s), jnp.float32)
        out = fused_mha(x, wqkv * 100.0, bqkv, wo, bo, mask, n_heads=h,
                        tile_b=4)
        assert np.isfinite(np.asarray(out)).all()
        ref = mha_reference(x, wqkv * 3.0, bqkv, wo, bo, mask, h)
        out2 = fused_mha(x, wqkv * 3.0, bqkv, wo, bo, mask, n_heads=h,
                         tile_b=4)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                                   atol=5e-5, rtol=1e-5)

    def test_causal_matches_reference(self, rng):
        b, s, d, h = 8, 16, 64, 4
        x, wqkv, bqkv, wo, bo = rand_inputs(rng, b, s, d)
        mask = jnp.zeros((b, s), jnp.float32)
        ref = mha_reference(x, wqkv, bqkv, wo, bo, mask, h, causal=True)
        out = fused_mha(x, wqkv, bqkv, wo, bo, mask, n_heads=h, tile_b=4,
                        causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_no_cross_sequence_leakage(self, rng):
        """Changing sequence j must not affect sequence i within a tile."""
        b, s, d, h = 8, 8, 32, 2
        x, wqkv, bqkv, wo, bo = rand_inputs(rng, b, s, d)
        mask = jnp.zeros((b, s), jnp.float32)
        out1 = np.asarray(fused_mha(x, wqkv, bqkv, wo, bo, mask, n_heads=h, tile_b=4))
        x2 = x.at[1].set(x[1] * 100.0)  # perturb sequence 1 (same tile as 0)
        out2 = np.asarray(fused_mha(x2, wqkv, bqkv, wo, bo, mask, n_heads=h, tile_b=4))
        np.testing.assert_allclose(out1[0], out2[0], atol=1e-5)
        assert not np.allclose(out1[1], out2[1])

    def test_pick_tile_b(self):
        assert pick_tile_b(4096, 32) == 8
        assert pick_tile_b(4096, 8) == 32
        assert pick_tile_b(6, 32) == 2
        assert pick_tile_b(7, 32) == 1


class TestModelWithPallasAttention:
    def test_forward_equivalence(self, rng):
        """Full model forward: pallas attention == xla attention."""
        import dataclasses
        import sys

        sys.path.insert(0, "tests")
        from test_model import init_and_forward, make_batch, small_cfg

        cfg_x = small_cfg(encode_stages=2, decode_stages=2, use_vae=False)
        cfg_p = dataclasses.replace(cfg_x, attention_impl="pallas")
        cmds, args = make_batch(rng, cfg_x)
        from deepsvg_tpu.models import SVGTransformer

        model_x = SVGTransformer(cfg_x)
        variables = model_x.init({"params": jax.random.PRNGKey(0)}, cmds, args, cmds, args)
        out_x = model_x.apply(variables, cmds, args, cmds, args)
        out_p = SVGTransformer(cfg_p).apply(variables, cmds, args, cmds, args)
        np.testing.assert_allclose(
            np.asarray(out_p["command_logits"]), np.asarray(out_x["command_logits"]),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_p["args_logits"]), np.asarray(out_x["args_logits"]),
            atol=1e-4,
        )


    def test_hierarchical_impl_override(self, rng):
        """``attention_impl_hierarchical`` routes ONLY the stage-2 stacks:
        same params, same outputs as all-pallas (A/B'd on chip —
        scripts/exp_hier_stack_impl.py; Pallas wins, the knob remains for
        experiments)."""
        import dataclasses
        import sys

        sys.path.insert(0, "tests")
        from test_model import make_batch, small_cfg

        cfg_p = small_cfg(encode_stages=2, decode_stages=2, use_vae=False)
        cfg_p = dataclasses.replace(cfg_p, attention_impl="pallas")
        assert cfg_p.attn_impl_hier == "pallas"
        cfg_h = dataclasses.replace(cfg_p, attention_impl_hierarchical="xla")
        assert cfg_h.attn_impl_hier == "xla"
        cmds, args = make_batch(rng, cfg_p)
        from deepsvg_tpu.models import SVGTransformer

        model_p = SVGTransformer(cfg_p)
        variables = model_p.init(
            {"params": jax.random.PRNGKey(0)}, cmds, args, cmds, args)
        out_p = model_p.apply(variables, cmds, args, cmds, args)
        out_h = SVGTransformer(cfg_h).apply(variables, cmds, args, cmds, args)
        np.testing.assert_allclose(
            np.asarray(out_h["command_logits"]),
            np.asarray(out_p["command_logits"]), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out_h["args_logits"]),
            np.asarray(out_p["args_logits"]), atol=1e-4)


class TestHungarianBruteforce:
    def test_matches_scipy_optimal_cost(self, rng):
        from scipy.optimize import linear_sum_assignment

        from deepsvg_tpu.models.matching import assign_bruteforce

        for _ in range(10):
            g = int(rng.integers(2, 8))
            n_vis = int(rng.integers(1, g + 1))
            cost = rng.random((1, g, g)).astype(np.float32)
            vis = np.zeros((1, g), bool)
            vis[0, :n_vis] = True  # visible prefix, like packed data
            assign = np.asarray(assign_bruteforce(jnp.asarray(cost), jnp.asarray(vis)))[0]
            # permutation property
            assert sorted(assign.tolist()) == list(range(g))
            # optimal over visible rows
            _, ref = linear_sum_assignment(cost[0][:n_vis])
            got_cost = cost[0][np.arange(n_vis), assign[:n_vis]].sum()
            ref_cost = cost[0][np.arange(n_vis), ref].sum()
            np.testing.assert_allclose(got_cost, ref_cost, atol=1e-6)
            # invisible tail receives remaining proposals in ascending order
            remaining = sorted(set(range(g)) - set(assign[:n_vis].tolist()))
            assert assign[n_vis:].tolist() == remaining


class TestFusedHeadArgmax:
    def test_matches_xla_argmax(self, rng):
        from deepsvg_tpu.ops.head import fused_head_argmax

        R, D, NC, NA, V = 64, 32, 7, 5, 17
        x = jnp.asarray(rng.standard_normal((R, D)), jnp.float32)
        wc = jnp.asarray(rng.standard_normal((D, NC)) * 0.1, jnp.float32)
        bc = jnp.asarray(rng.standard_normal(NC) * 0.1, jnp.float32)
        wa = jnp.asarray(rng.standard_normal((D, NA * V)) * 0.1, jnp.float32)
        ba = jnp.asarray(rng.standard_normal(NA * V) * 0.1, jnp.float32)
        ids = np.asarray(fused_head_argmax(x, wc, bc, wa, ba, n_commands=NC,
                                           n_args=NA, tile_rows=16))
        ref_cmd = np.argmax(np.asarray(x @ wc + bc), axis=-1)
        ref_args = np.argmax(
            np.asarray(x @ wa + ba).reshape(R, NA, V), axis=-1
        )
        assert (ids[:, 0] == ref_cmd).all()
        assert (ids[:, 1:] == ref_args).all()

    def test_model_greedy_sample_same_with_either_head(self, rng):
        """one_shot greedy output identical with fused-argmax vs logits+argmax."""
        import dataclasses
        import sys

        sys.path.insert(0, "tests")
        from test_model import init_and_forward, make_batch, small_cfg

        from deepsvg_tpu.models import SVGTransformer
        from deepsvg_tpu.models.sample import one_shot_sample

        cfg_x = small_cfg(encode_stages=2, decode_stages=2, use_vae=False)
        cfg_p = dataclasses.replace(cfg_x, attention_impl="pallas")
        cmds, args = make_batch(rng, cfg_x)
        model_x = SVGTransformer(cfg_x)
        variables = model_x.init({"params": jax.random.PRNGKey(0)}, cmds, args, cmds, args)
        c1, a1 = one_shot_sample(model_x, variables, commands_enc=cmds, args_enc=args)
        model_p = SVGTransformer(cfg_p)
        c2, a2 = one_shot_sample(model_p, variables, commands_enc=cmds, args_enc=args)
        assert (np.asarray(c1) == np.asarray(c2)).all()
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))


class TestBlockpackedMHA:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_reference(self, rng, causal):
        from deepsvg_tpu.ops.attention import mha_blockpacked, mha_reference

        b, s, d, h = 16, 8, 32, 4
        x, wqkv, bqkv, wo, bo = rand_inputs(rng, b, s, d)
        mask = np.zeros((b, s), np.float32)
        mask[:, 6:] = -np.inf
        mask = jnp.asarray(mask)
        ref = mha_reference(x, wqkv, bqkv, wo, bo, mask, h, causal=causal)
        got = mha_blockpacked(x, wqkv, bqkv, wo, bo, mask, h, causal=causal, tile_b=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_gradients_match(self, rng):
        from deepsvg_tpu.ops.attention import mha_blockpacked, mha_reference

        b, s, d, h = 8, 8, 32, 4
        x, wqkv, bqkv, wo, bo = rand_inputs(rng, b, s, d)
        mask = jnp.zeros((b, s), jnp.float32)

        g_ref = jax.grad(lambda x_: jnp.sum(mha_reference(x_, wqkv, bqkv, wo, bo, mask, h) ** 2))(x)
        g_bp = jax.grad(lambda x_: jnp.sum(mha_blockpacked(x_, wqkv, bqkv, wo, bo, mask, h, tile_b=4) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_bp), np.asarray(g_ref), atol=2e-4)


class TestFusedMHATrain:
    def test_value_and_grads_match_reference(self, rng):
        from deepsvg_tpu.ops.attention import mha_reference
        from deepsvg_tpu.ops.attention_vjp import fused_mha_train

        b, s, d, h = 8, 8, 32, 4
        x, wqkv, bqkv, wo, bo = rand_inputs(rng, b, s, d)
        mask = np.zeros((b, s), np.float32)
        mask[:, 6:] = -np.inf
        mask = jnp.asarray(mask)
        seed = jnp.asarray([0], jnp.int32)

        out = fused_mha_train(x, wqkv, bqkv, wo, bo, mask, seed, h, 4, False, 0.0)
        ref = mha_reference(x, wqkv, bqkv, wo, bo, mask, h)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

        gf = jax.grad(
            lambda *a: jnp.sum(fused_mha_train(*a, mask, seed, h, 4, False, 0.0) ** 2),
            argnums=(0, 1, 2, 3, 4),
        )(x, wqkv, bqkv, wo, bo)
        gr = jax.grad(
            lambda *a: jnp.sum(mha_reference(*a, mask, h) ** 2),
            argnums=(0, 1, 2, 3, 4),
        )(x, wqkv, bqkv, wo, bo)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)

    def test_causal_grads(self, rng):
        from deepsvg_tpu.ops.attention import mha_reference
        from deepsvg_tpu.ops.attention_vjp import fused_mha_train

        b, s, d, h = 8, 8, 32, 4
        x, wqkv, bqkv, wo, bo = rand_inputs(rng, b, s, d)
        mask = jnp.zeros((b, s), jnp.float32)
        seed = jnp.asarray([0], jnp.int32)
        gf = jax.grad(
            lambda x_: jnp.sum(fused_mha_train(x_, wqkv, bqkv, wo, bo, mask, seed, h, 4, True, 0.0) ** 2)
        )(x)
        gr = jax.grad(
            lambda x_: jnp.sum(mha_reference(x_, wqkv, bqkv, wo, bo, mask, h, causal=True) ** 2)
        )(x)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-5)

    def test_dropout_mask_consistent_fwd_bwd(self, rng):
        """With dropout, grads must correspond to the SAME mask the forward
        used: finite-difference check through the custom_vjp."""
        from deepsvg_tpu.ops.attention_vjp import fused_mha_train

        b, s, d, h = 4, 8, 32, 4
        x, wqkv, bqkv, wo, bo = rand_inputs(rng, b, s, d)
        mask = jnp.zeros((b, s), jnp.float32)
        seed = jnp.asarray([7], jnp.int32)
        rate = 0.3

        def f(x_):
            return jnp.sum(fused_mha_train(x_, wqkv, bqkv, wo, bo, mask, seed, h, 4, False, rate) ** 2)

        g = jax.grad(f)(x)
        # directional finite difference
        v = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        eps = 1e-3
        fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
        analytic = jnp.sum(g * v)
        np.testing.assert_allclose(float(analytic), float(fd), rtol=2e-2)

    def test_training_step_with_pallas_backend(self, rng):
        """Full train step with attn_impl=pallas (fused fwd+bwd) descends."""
        import dataclasses

        from deepsvg_tpu.data.synthetic import generate_batch
        from deepsvg_tpu.models import ModelConfig, SVGTransformer
        from deepsvg_tpu.training.schedulers import warmup_step_decay
        from deepsvg_tpu.training.trainer import (
            create_train_state,
            jit_train_step,
            make_optimizer,
        )

        cfg = ModelConfig(
            encode_stages=2, decode_stages=2, use_vae=False,
            max_num_groups=3, max_seq_len=6, d_model=32, dim_feedforward=64,
            dim_z=16, n_layers=1, n_layers_decode=1, n_heads=4, dropout=0.1,
            attention_impl="pallas",
        )
        model = SVGTransformer(cfg)
        margs = cfg.get_model_args()
        batch = generate_batch(rng, 8, cfg.max_num_groups, cfg.max_seq_len)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k in set(margs)}
        opt = make_optimizer(warmup_step_decay(2e-3, 2, 1000))
        state = create_train_state(model, opt, batch, margs)
        step = jit_train_step(model, opt, margs)
        weights = dict(kl_tolerance=0.1, loss_kl_weight=1.0,
                       loss_visibility_weight=1.0, loss_cmd_weight=1.0,
                       loss_args_weight=2.0)
        losses = []
        for _ in range(15):
            state, res = step(state, batch, weights)
            losses.append(float(res["loss"]))
        assert losses[-1] < losses[0]


class TestLabelConditionedFused:
    def test_label_model_fused_matches_xla(self, rng):
        """Label-conditioned model: fused layers (label bias folded into the
        per-sequence injection) match the XLA path."""
        import dataclasses
        import sys

        sys.path.insert(0, "tests")
        from test_model import init_and_forward, make_batch, small_cfg

        from deepsvg_tpu.models import SVGTransformer

        cfg_x = small_cfg(encode_stages=2, decode_stages=2, use_vae=False,
                          label_condition=True, n_labels=10)
        cfg_p = dataclasses.replace(cfg_x, attention_impl="pallas")
        cmds, args = make_batch(rng, cfg_x)
        label = jnp.asarray([1, 3])
        model_x = SVGTransformer(cfg_x)
        variables = model_x.init({"params": jax.random.PRNGKey(0)}, cmds, args,
                                 cmds, args, label=label)
        out_x = model_x.apply(variables, cmds, args, cmds, args, label=label)
        out_p = SVGTransformer(cfg_p).apply(variables, cmds, args, cmds, args,
                                            label=label)
        np.testing.assert_allclose(
            np.asarray(out_p["command_logits"]), np.asarray(out_x["command_logits"]),
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_p["args_logits"]), np.asarray(out_x["args_logits"]),
            atol=2e-4,
        )


class TestFusedArgsCE:
    def test_args_ce_matches_optax(self, rng):
        import optax

        from deepsvg_tpu.ops.ce import args_ce

        R, D, n_args, V = 70, 64, 11, 257  # forces row padding at tile 32
        y = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
        wa = jnp.asarray(rng.normal(size=(D, n_args * V)) * 0.05, jnp.float32)
        ba = jnp.asarray(rng.normal(size=(n_args * V,)) * 0.1, jnp.float32)
        tgt = jnp.asarray(rng.integers(0, V, (R, n_args)), jnp.int32)
        gw = jnp.asarray(rng.uniform(0.1, 1.0, (R, n_args)), jnp.float32)

        def ref_loss(y, wa, ba):
            lg = (y @ wa + ba).reshape(R, n_args, V)
            return jnp.sum(
                optax.softmax_cross_entropy_with_integer_labels(lg, tgt) * gw
            )

        def fused_loss(y, wa, ba):
            return jnp.sum(args_ce(y, wa, ba, tgt, tile_rows=32) * gw)

        np.testing.assert_allclose(
            float(ref_loss(y, wa, ba)), float(fused_loss(y, wa, ba)), rtol=1e-6
        )
        g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(y, wa, ba)
        g_fused = jax.grad(fused_loss, argnums=(0, 1, 2))(y, wa, ba)
        for a, b in zip(g_ref, g_fused):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_args_ce_pairwise_matches_optax(self, rng):
        """Pairwise kernel (self-match cost path) against the broadcast
        optax formulation, including row padding."""
        import optax

        from deepsvg_tpu.ops.ce import args_ce_pairwise

        R, D, n_args, V, G = 70, 64, 5, 33, 3
        y = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
        wa = jnp.asarray(rng.normal(size=(D, n_args * V)) * 0.05, jnp.float32)
        ba = jnp.asarray(rng.normal(size=(n_args * V,)) * 0.1, jnp.float32)
        tgt = jnp.asarray(rng.integers(0, V, (R, G, n_args)), jnp.int32)

        lg = (y @ wa + ba).reshape(R, 1, n_args, V)
        ref = optax.softmax_cross_entropy_with_integer_labels(
            jnp.broadcast_to(lg, (R, G, n_args, V)), tgt
        )                                                     # [R, G, n_args]
        got = args_ce_pairwise(
            y, wa, ba, tgt.reshape(R, G * n_args), G, tile_rows=32
        ).reshape(R, G, n_args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_fused_matching_equals_logits_matching(self, rng):
        """fused_perfect_matching (states + head weights, pairwise kernel)
        returns the same assignment as perfect_matching on materialized
        logits."""
        import sys

        sys.path.insert(0, "tests")
        from test_model import make_batch, small_cfg

        from deepsvg_tpu.models.matching import (
            fused_perfect_matching, perfect_matching)

        cfg = small_cfg(encode_stages=2, decode_stages=2, use_vae=False,
                        self_match=True)
        n, p, s = 3, cfg.n_groups_prop, cfg.max_seq_len + 1
        d = cfg.d_model
        cmds, args = make_batch(rng, cfg, n=n)
        states = jnp.asarray(rng.normal(size=(n, p, s, d)), jnp.float32)
        wa = jnp.asarray(rng.normal(size=(d, cfg.n_args * cfg.args_dim_out)) * 0.05,
                         jnp.float32)
        ba = jnp.asarray(rng.normal(size=(cfg.n_args * cfg.args_dim_out,)) * 0.1,
                         jnp.float32)
        cmd_logits = jnp.asarray(rng.normal(size=(n, p, s, cfg.n_commands)),
                                 jnp.float32)
        vis_logits = jnp.asarray(rng.normal(size=(n, p, 2)), jnp.float32)
        args_logits = (states.reshape(-1, d) @ wa + ba).reshape(
            n, p, s, cfg.n_args, cfg.args_dim_out
        )
        a_ref = perfect_matching(cmd_logits, args_logits, vis_logits,
                                 cmds, args, cfg)
        a_fused = fused_perfect_matching(states, wa, ba, cmd_logits, vis_logits,
                                         cmds, args, cfg)
        np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_fused))

    def test_train_step_fused_ce_matches_xla(self, rng):
        """Full train step: fused-CE (pallas) grads/losses match the stock
        lowering (xla) from identical params."""
        import dataclasses
        import sys

        import optax as _optax

        sys.path.insert(0, "tests")
        from test_model import make_batch, small_cfg

        from deepsvg_tpu.models import SVGTransformer
        from deepsvg_tpu.training.trainer import (
            create_train_state, jit_train_step, make_optimizer)

        cfg_x = small_cfg(encode_stages=2, decode_stages=2, use_vae=False)
        cfg_p = dataclasses.replace(cfg_x, attention_impl="pallas")
        cmds, args = make_batch(rng, cfg_x)
        batch = {"commands_enc": cmds, "args_enc": args,
                 "commands_dec": cmds, "args_dec": args}
        model_args = list(batch)
        weights = {"loss_visibility_weight": 1.0, "loss_cmd_weight": 1.0,
                   "loss_args_weight": 2.0}
        # SGD so the param check reflects grads directly (Adam's g/sqrt(v)
        # amplifies backend-level noise on near-zero grads to ~lr scale)
        opt = _optax.sgd(1e-2)

        results = {}
        for name, cfg in [("xla", cfg_x), ("pallas", cfg_p)]:
            model = SVGTransformer(cfg)
            state = create_train_state(model, opt, batch, model_args)
            step = jit_train_step(model, opt, model_args, donate=False)
            new_state, res = step(state, batch, weights)
            results[name] = (new_state, res)

        res_x, res_p = results["xla"][1], results["pallas"][1]
        np.testing.assert_allclose(
            float(res_p["loss_args"]), float(res_x["loss_args"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(res_p["loss"]), float(res_x["loss"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(res_p["grad_norm"]), float(res_x["grad_norm"]), rtol=2e-3
        )
        # updated params agree (dropout=0 in small_cfg -> fully deterministic)
        pt_x = jax.tree.leaves(results["xla"][0].params)
        pt_p = jax.tree.leaves(results["pallas"][0].params)
        for a, b in zip(pt_x, pt_p):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


class TestFusedEmbeddingVJP:
    def test_embedding_grads_match_gather(self, rng):
        from deepsvg_tpu.ops.embedding import fused_embedding_train

        B, S, n_args, V, D, NC, GV = 12, 10, 11, 257, 64, 7, 10
        cmds = jnp.asarray(rng.integers(0, NC, (B, S)), jnp.int32)
        args = jnp.asarray(rng.integers(-1, V - 1, (B, S, n_args)), jnp.int32)
        groups = jnp.asarray(rng.integers(0, GV, (B, S)), jnp.int32)
        ct = jnp.asarray(rng.normal(size=(NC, D)), jnp.float32)
        at = jnp.asarray(rng.normal(size=(n_args * V, D)), jnp.float32)
        gt = jnp.asarray(rng.normal(size=(GV, D)), jnp.float32)
        pt = jnp.asarray(rng.normal(size=(S, D)), jnp.float32)
        co = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)

        def fused(ct, at, gt, pt):
            out = fused_embedding_train(cmds, args, groups, ct, at, gt, pt,
                                        4, True, jnp.float32, False)
            return jnp.sum(out * co)

        def ref(ct, at, gt, pt):
            cmd_emb = jnp.take(ct, cmds, axis=0)
            a1 = args + 1
            arg_emb = sum(
                jnp.take(at[i * V : (i + 1) * V], a1[..., i], axis=0)
                for i in range(n_args)
            )
            out = cmd_emb + arg_emb + jnp.take(gt, groups, axis=0) + pt[None]
            return jnp.sum(out * co)

        np.testing.assert_allclose(float(ref(ct, at, gt, pt)),
                                   float(fused(ct, at, gt, pt)), rtol=1e-5)
        g_ref = jax.grad(ref, argnums=(0, 1, 2, 3))(ct, at, gt, pt)
        g_fused = jax.grad(fused, argnums=(0, 1, 2, 3))(ct, at, gt, pt)
        for a, b in zip(g_ref, g_fused):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestFusedLayerTrain:
    """Whole-layer fused forward+backward (ops/layer_vjp.py)."""

    @staticmethod
    def _ref_layer(x, bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2,
                   mask, n_heads, causal):
        from deepsvg_tpu.models.layers import layer_norm
        from deepsvg_tpu.ops.attention import mha_reference

        xf = x.astype(jnp.float32)
        xn = layer_norm(xf, ln1)
        a = mha_reference(xn, wqkv, bqkv, wo, bo, mask, n_heads, causal=causal)
        xf = xf + a + bias[:, None, :].astype(jnp.float32)
        xn2 = layer_norm(xf, ln2)
        h = jnp.maximum(xn2 @ w1 + b1, 0.0)
        return xf + (h @ w2 + b2)

    def _inputs(self, rng, b=8, s=8, d=32, dff=64):
        x, wqkv, bqkv, wo, bo = rand_inputs(rng, b, s, d)
        ln1 = jnp.stack([jnp.ones(d), jnp.zeros(d)]).astype(jnp.float32)
        ln2 = jnp.stack([1 + 0.1 * jnp.asarray(rng.standard_normal(d), jnp.float32),
                         0.1 * jnp.asarray(rng.standard_normal(d), jnp.float32)])
        w1 = jnp.asarray(rng.standard_normal((d, dff)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(dff) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((dff, d)) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((b, d)) * 0.1, jnp.float32)
        return x, bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2

    @pytest.mark.parametrize("causal", [False, True])
    def test_forward_matches_reference(self, rng, causal):
        from deepsvg_tpu.ops.layer_vjp import fused_layer_train

        b, s = 8, 8
        args = self._inputs(rng, b=b, s=s)
        mask = np.zeros((b, s), np.float32)
        mask[:, 6:] = -np.inf
        mask = jnp.asarray(mask)
        seed = jnp.asarray([0], jnp.int32)
        out = fused_layer_train(*args[:12], mask, seed, 4, 4, causal, 0.0)
        ref = self._ref_layer(*args, mask, 4, causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_grads_match_reference(self, rng):
        from deepsvg_tpu.ops.layer_vjp import fused_layer_train

        b, s = 8, 8
        args = self._inputs(rng, b=b, s=s)
        mask = np.zeros((b, s), np.float32)
        mask[:, 6:] = -np.inf
        mask = jnp.asarray(mask)
        seed = jnp.asarray([0], jnp.int32)

        argnums = tuple(range(12))
        gf = jax.grad(
            lambda *a: jnp.sum(
                fused_layer_train(*a, mask, seed, 4, 4, False, 0.0) ** 2
            ),
            argnums=argnums,
        )(*args)
        gr = jax.grad(
            lambda *a: jnp.sum(self._ref_layer(*a, mask, 4, False) ** 2),
            argnums=argnums,
        )(*args)
        names = ["x", "bias", "ln1", "wqkv", "bqkv", "wo", "bo", "ln2",
                 "w1", "b1", "w2", "b2"]
        for n, a, b_ in zip(names, gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-4,
                err_msg=f"grad mismatch: {n}",
            )

    def test_sub_blocked_attention_matches_reference(self, rng):
        """tile_b large enough that the kernels split attention into multiple
        ~128-row sub-blocks (layer_vjp._auto_attn_rows): forward and every
        gradient must still match the XLA reference — masked-out cross-block
        scores contribute exact zeros, so sub-blocking is a pure reshape of
        the computation."""
        from deepsvg_tpu.ops.layer_vjp import _auto_attn_rows, fused_layer_train

        b, s, tile_b = 64, 8, 64  # rows=512 -> attn 128 -> 4 sub-blocks
        attn_rows = _auto_attn_rows(tile_b, s)
        assert attn_rows < tile_b * s and (tile_b * s) % attn_rows == 0
        args = self._inputs(rng, b=b, s=s)
        mask = np.zeros((b, s), np.float32)
        mask[:, 6:] = -np.inf
        mask = jnp.asarray(mask)
        seed = jnp.asarray([0], jnp.int32)

        out = fused_layer_train(*args[:12], mask, seed, 4, tile_b, False, 0.0)
        ref = self._ref_layer(*args, mask, 4, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

        # explicit attn_rows override: any multiple of s dividing the tile
        for ar in (s, 4 * s, tile_b * s):
            out_ar = fused_layer_train(*args[:12], mask, seed, 4, tile_b,
                                       False, 0.0, ar)
            np.testing.assert_allclose(
                np.asarray(out_ar), np.asarray(ref), atol=2e-5,
                err_msg=f"attn_rows={ar}")

        argnums = (0, 3, 8)  # x, wqkv, w1 — covers both sides of attention
        gf = jax.grad(
            lambda *a: jnp.sum(
                fused_layer_train(*a, mask, seed, 4, tile_b, False, 0.0) ** 2
            ),
            argnums=argnums,
        )(*args)
        gr = jax.grad(
            lambda *a: jnp.sum(self._ref_layer(*a, mask, 4, False) ** 2),
            argnums=argnums,
        )(*args)
        for n, a, b_ in zip(["x", "wqkv", "w1"], gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-4,
                err_msg=f"grad mismatch: {n}",
            )

    @pytest.mark.parametrize("causal", [False, True])
    def test_batched_attention_matches_reference(self, rng, causal):
        """batched=True (rank-3 per-sequence attention, _attn_fwd_batched):
        forward and every gradient must match the XLA reference for both
        causal settings — the form changes only the score layout (no
        cross-sequence waste), not the math."""
        from deepsvg_tpu.ops.layer_vjp import fused_layer_train

        b, s, tile_b = 16, 8, 8
        args = self._inputs(rng, b=b, s=s)
        mask = np.zeros((b, s), np.float32)
        mask[:, 6:] = -np.inf
        mask = jnp.asarray(mask)
        seed = jnp.asarray([0], jnp.int32)

        out = fused_layer_train(*args[:12], mask, seed, 4, tile_b, causal,
                                0.0, None, True)
        ref = self._ref_layer(*args, mask, 4, causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

        argnums = tuple(range(12))
        gf = jax.grad(
            lambda *a: jnp.sum(
                fused_layer_train(*a, mask, seed, 4, tile_b, causal, 0.0,
                                  None, True) ** 2
            ),
            argnums=argnums,
        )(*args)
        gr = jax.grad(
            lambda *a: jnp.sum(self._ref_layer(*a, mask, 4, causal) ** 2),
            argnums=argnums,
        )(*args)
        names = ["x", "bias", "ln1", "wqkv", "bqkv", "wo", "bo", "ln2",
                 "w1", "b1", "w2", "b2"]
        for n, a, b_ in zip(names, gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-4,
                err_msg=f"grad mismatch (batched, causal={causal}): {n}",
            )

    @pytest.mark.parametrize("batched", [False, True])
    @pytest.mark.parametrize("rate", [0.0, 0.3])
    def test_save_residuals_matches_recompute(self, rng, batched, rate):
        """save_residuals=True (forward stashes pre-dropout attention probs +
        FF hidden; backward reads them instead of recomputing): output and
        every gradient must match the default recompute path. On CPU the
        saves round through f32 (the activation dtype here), so agreement is
        exact up to f32 accumulation noise. Covers both kernel forms and
        dropout on/off (the keep-masks are PRNG-regenerated per site, so they
        must agree across modes by construction)."""
        from deepsvg_tpu.ops.layer_vjp import fused_layer_train

        b, s, tile_b = 16, 8, 8
        args = self._inputs(rng, b=b, s=s)
        mask = np.zeros((b, s), np.float32)
        mask[:, 6:] = -np.inf
        mask = jnp.asarray(mask)
        seed = jnp.asarray([3], jnp.int32)

        def loss(save):
            def f(*a):
                return jnp.sum(
                    fused_layer_train(*a, mask, seed, 4, tile_b, False,
                                      rate, None, batched, save) ** 2)
            return f

        out_r = fused_layer_train(*args, mask, seed, 4, tile_b, False, rate,
                                  None, batched, False)
        out_s = fused_layer_train(*args, mask, seed, 4, tile_b, False, rate,
                                  None, batched, True)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                                   atol=1e-6)

        argnums = tuple(range(12))
        g_r = jax.grad(loss(False), argnums=argnums)(*args)
        g_s = jax.grad(loss(True), argnums=argnums)(*args)
        names = ["x", "bias", "ln1", "wqkv", "bqkv", "wo", "bo", "ln2",
                 "w1", "b1", "w2", "b2"]
        for n, a, b_ in zip(names, g_s, g_r):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-5,
                err_msg=f"grad mismatch (save, batched={batched}, "
                        f"rate={rate}): {n}",
            )

    def test_batched_dropout_mask_consistent_fwd_bwd(self, rng):
        """With dropout on, the batched-form fwd and bwd kernels must draw the
        SAME masks. Checked against a pure-JAX replica of the batched forward
        that reuses ``_site_mask`` with the kernels' traced scalars: the fused
        forward must match it to rounding noise (a flipped dropout bit would
        show up as an O(1) element error) and every fused gradient must match
        ``jax.grad`` of the replica (one consistent autodiff graph) to f32
        noise. (A finite-difference check is invalid here: at sum(out**2)~2e4
        the f32 rounding of f alone, ~1e-3, divided by 2*eps swamps the
        directional derivative.)"""
        from deepsvg_tpu.ops.layer_vjp import (
            _SITE_ATTN_OUT, _SITE_FF_HIDDEN, _SITE_FF_OUT, _ln_fwd,
            _site_mask, fused_layer_train)

        b, s, d, dff, n_heads, tile_b = 8, 8, 32, 64, 4, 4
        rate = 0.3
        args = self._inputs(rng, b=b, s=s)
        mask = jnp.zeros((b, s), jnp.float32)
        seed = jnp.asarray([7], jnp.int32)

        def replica(x, bias, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2):
            head_dim = d // n_heads
            scale = head_dim ** -0.5
            kp = 1.0 / (1.0 - rate)
            rows = tile_b * s
            outs = []
            for pid_py in range(b // tile_b):
                pid = jnp.int32(pid_py)
                seed_val = seed[0]
                x0 = x[pid_py * tile_b:(pid_py + 1) * tile_b].reshape(rows, d)
                xn1, _, _ = _ln_fwd(x0, ln1[0:1], ln1[1:2])
                qkv = xn1 @ wqkv + bqkv
                heads = []
                for h in range(n_heads):
                    q = qkv[:, h * head_dim:(h + 1) * head_dim]
                    k = qkv[:, d + h * head_dim:d + (h + 1) * head_dim]
                    v = qkv[:, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim]
                    q, k, v = (t.reshape(tile_b, s, head_dim) for t in (q, k, v))
                    sc = jnp.einsum("bqd,bkd->bqk", q, k) * scale
                    m = jnp.maximum(jnp.max(sc, axis=-1, keepdims=True), -1e30)
                    e = jnp.exp(sc - m)
                    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
                    keep = _site_mask((rows, s), rate, True, seed_val, pid, h)
                    p = p * keep.reshape(tile_b, s, s) * kp
                    heads.append(
                        jnp.einsum("bqk,bkd->bqd", p, v).reshape(rows, head_dim))
                a = jnp.concatenate(heads, axis=1) @ wo + bo
                a = a * _site_mask((rows, d), rate, True, seed_val, pid,
                                   _SITE_ATTN_OUT) * kp
                inj = bias[pid_py * tile_b:(pid_py + 1) * tile_b]
                x1 = x0 + a + jnp.repeat(inj, s, axis=0)
                xn2, _, _ = _ln_fwd(x1, ln2[0:1], ln2[1:2])
                h_act = jnp.maximum(xn2 @ w1 + b1, 0.0)
                h_act = h_act * _site_mask((rows, dff), rate, True, seed_val,
                                           pid, _SITE_FF_HIDDEN) * kp
                f = h_act @ w2 + b2
                f = f * _site_mask((rows, d), rate, True, seed_val, pid,
                                   _SITE_FF_OUT) * kp
                outs.append((x1 + f).reshape(tile_b, s, d))
            return jnp.concatenate(outs, axis=0)

        out_k = fused_layer_train(*args, mask, seed, n_heads, tile_b, False,
                                  rate, None, True)
        out_r = jax.jit(replica)(*args)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   atol=1e-5)

        argnums = tuple(range(12))
        gk = jax.grad(
            lambda *a: jnp.sum(
                fused_layer_train(*a, mask, seed, n_heads, tile_b, False,
                                  rate, None, True) ** 2),
            argnums=argnums)(*args)
        gr = jax.grad(lambda *a: jnp.sum(replica(*a) ** 2),
                      argnums=argnums)(*args)
        names = ["x", "bias", "ln1", "wqkv", "bqkv", "wo", "bo", "ln2",
                 "w1", "b1", "w2", "b2"]
        for n, a_, b_ in zip(names, gk, gr):
            scale_ = float(jnp.max(jnp.abs(b_))) + 1e-12
            np.testing.assert_allclose(
                np.asarray(a_) / scale_, np.asarray(b_) / scale_, atol=1e-5,
                err_msg=f"dropout grad mismatch (batched): {n}")

    def test_softmax_overflow_regression(self, rng):
        """exp-overflow regression (flagship self-match NaN'd at step ~380 on
        chip): with QKV weights scaled so q.k far exceeds exp's f32 range,
        the fused layer must stay finite and match the (max-subtracting) XLA
        reference. LN bounds x, NOT q.k — max-subtraction is mandatory."""
        from deepsvg_tpu.ops.layer_vjp import fused_layer_train

        b, s = 8, 8
        args = list(self._inputs(rng, b=b, s=s))
        args[3] = args[3] * 100.0  # wqkv: scores ~O(1e4) >> 88
        mask = jnp.zeros((b, s), jnp.float32)
        seed = jnp.asarray([0], jnp.int32)
        out = fused_layer_train(*args[:12], mask, seed, 4, 4, False, 0.0)
        ref = self._ref_layer(*args, mask, 4, False)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
        g = jax.grad(
            lambda x_: jnp.sum(
                fused_layer_train(x_, *args[1:12], mask, seed, 4, 4, False, 0.0) ** 2
            )
        )(args[0])
        assert np.isfinite(np.asarray(g)).all()

    def test_dropout_mask_consistent_fwd_bwd(self, rng):
        """Finite-difference check through the custom VJP with dropout on:
        forward and backward must see the SAME masks."""
        from deepsvg_tpu.ops.layer_vjp import fused_layer_train

        b, s = 4, 8
        args = self._inputs(rng, b=b, s=s)
        mask = jnp.zeros((b, s), jnp.float32)
        seed = jnp.asarray([7], jnp.int32)
        rate = 0.3
        x = args[0]
        rest = args[1:]

        def f(x_):
            return jnp.sum(
                fused_layer_train(x_, *rest, mask, seed, 4, 4, False, rate) ** 2
            )

        g = jax.grad(f)(x)
        v = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        eps = 1e-3
        fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
        np.testing.assert_allclose(float(jnp.sum(g * v)), float(fd), rtol=2e-2)

    def test_model_train_step_fused_layers(self, rng):
        """Full model train step routes through the fused layer kernels
        (attn_impl=pallas, deterministic=False) and descends."""
        from deepsvg_tpu.data.synthetic import generate_batch
        from deepsvg_tpu.models import ModelConfig, SVGTransformer
        from deepsvg_tpu.training.schedulers import warmup_step_decay
        from deepsvg_tpu.training.trainer import (
            create_train_state, jit_train_step, make_optimizer)

        cfg = ModelConfig(
            encode_stages=2, decode_stages=2, use_vae=False,
            max_num_groups=3, max_seq_len=6, d_model=32, dim_feedforward=64,
            dim_z=16, n_layers=1, n_layers_decode=1, n_heads=4, dropout=0.1,
            attention_impl="pallas",
        )
        model = SVGTransformer(cfg)
        margs = cfg.get_model_args()
        batch = generate_batch(rng, 8, cfg.max_num_groups, cfg.max_seq_len)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k in set(margs)}
        opt = make_optimizer(warmup_step_decay(2e-3, 2, 1000))
        state = create_train_state(model, opt, batch, margs)
        step = jit_train_step(model, opt, margs)
        weights = dict(kl_tolerance=0.1, loss_kl_weight=1.0,
                       loss_visibility_weight=1.0, loss_cmd_weight=1.0,
                       loss_args_weight=2.0)
        losses = []
        for _ in range(15):
            state, res = step(state, batch, weights)
            losses.append(float(res["loss"]))
        assert losses[-1] < losses[0]

    def test_model_grads_match_xla_path(self, rng):
        """dropout=0: gradients of the pallas (fused-layer) model equal the
        XLA-path model's gradients on identical params."""
        import dataclasses

        from deepsvg_tpu.data.synthetic import generate_batch
        from deepsvg_tpu.models import ModelConfig, SVGTransformer
        from deepsvg_tpu.models.loss import svg_loss

        cfg_x = ModelConfig(
            encode_stages=2, decode_stages=2, use_vae=False,
            max_num_groups=3, max_seq_len=6, d_model=32, dim_feedforward=64,
            dim_z=16, n_layers=1, n_layers_decode=1, n_heads=4, dropout=0.0,
        )
        cfg_p = dataclasses.replace(cfg_x, attention_impl="pallas")
        margs = cfg_x.get_model_args()
        batch = generate_batch(rng, 8, cfg_x.max_num_groups, cfg_x.max_seq_len)
        data = [jnp.asarray(batch[k]) for k in margs]
        model_x, model_p = SVGTransformer(cfg_x), SVGTransformer(cfg_p)
        variables = model_x.init({"params": jax.random.PRNGKey(0)}, *data)
        weights = dict(kl_tolerance=0.1, loss_kl_weight=1.0,
                       loss_visibility_weight=1.0, loss_cmd_weight=1.0,
                       loss_args_weight=2.0)

        def loss_of(model):
            def f(params):
                out = model.apply(
                    {"params": params}, *data, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)},
                )
                return svg_loss(out, weights, model.cfg)["loss"]
            return f

        lx, gx = jax.value_and_grad(loss_of(model_x))(variables["params"])
        lp, gp = jax.value_and_grad(loss_of(model_p))(variables["params"])
        np.testing.assert_allclose(float(lx), float(lp), rtol=1e-5)
        flat_x = jax.tree_util.tree_leaves_with_path(gx)
        flat_p = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(gp)}
        for k, v in flat_x:
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(flat_p[jax.tree_util.keystr(k)]),
                atol=2e-4, err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
            )


class TestFusedDecodeStep:
    """Fused whole-stack KV-cached decode (ops/decode.py + sample.py)."""

    def _ar_model(self, rng, **kw):
        import sys
        sys.path.insert(0, "tests")
        from test_model import init_and_forward, make_batch, small_cfg

        cfg = small_cfg(encode_stages=1, decode_stages=1, use_vae=False,
                        pred_mode="autoregressive", rel_targets=False,
                        max_num_groups=2, max_seq_len=5, **kw)
        cmds, args = make_batch(rng, cfg, grouped=True)
        from deepsvg_tpu.models import SVGTransformer
        model = SVGTransformer(cfg)
        variables = model.init({"params": jax.random.PRNGKey(0)}, cmds, args,
                               cmds, args)
        z = model.apply(variables, cmds, args, None, None, encode_mode=True)
        return model, variables, z

    def test_fused_matches_cached(self, rng):
        """The fused decode must bit-match the einsum KV-cached scan."""
        import dataclasses

        from deepsvg_tpu.models import SVGTransformer
        from deepsvg_tpu.models.sample import (
            autoregressive_sample_cached, autoregressive_sample_fused)

        model, variables, z = self._ar_model(rng)
        c1, a1 = autoregressive_sample_cached(model, variables, z)
        cfg_p = dataclasses.replace(model.cfg, attention_impl="pallas")
        model_p = SVGTransformer(cfg_p)
        c2, a2 = autoregressive_sample_fused(model_p, variables, z)
        assert (np.asarray(c1) == np.asarray(c2)).all()
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)

    def test_greedy_sample_backend_equivalence(self, rng):
        """greedy_sample AR output is identical across backends (both use the
        einsum cached scan — the fused decode kernel measured slower on chip
        and is not dispatched; see docs/PERFORMANCE.md)."""
        import dataclasses

        from deepsvg_tpu.models import SVGTransformer
        from deepsvg_tpu.models.sample import greedy_sample

        model, variables, z = self._ar_model(rng)
        c1, a1 = greedy_sample(model, variables, z=z)
        cfg_p = dataclasses.replace(model.cfg, attention_impl="pallas")
        c2, a2 = greedy_sample(SVGTransformer(cfg_p), variables, z=z)
        assert (np.asarray(c1) == np.asarray(c2)).all()
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)


class TestLabelConditionedFusedTrain:
    def test_label_model_train_grads_match_xla(self, rng):
        """Label-conditioned model, dropout=0: fused-train-layer gradients
        (label injection folded into seq_bias) equal the XLA path's."""
        import dataclasses
        import sys

        sys.path.insert(0, "tests")
        from test_model import make_batch, small_cfg

        from deepsvg_tpu.models import SVGTransformer
        from deepsvg_tpu.models.loss import svg_loss

        cfg_x = small_cfg(encode_stages=2, decode_stages=2, use_vae=False,
                          label_condition=True, n_labels=10, dropout=0.0)
        cfg_p = dataclasses.replace(cfg_x, attention_impl="pallas")
        cmds, args = make_batch(rng, cfg_x)
        label = jnp.asarray([1, 3])
        data = (cmds, args, cmds, args, label)
        model_x, model_p = SVGTransformer(cfg_x), SVGTransformer(cfg_p)
        variables = model_x.init({"params": jax.random.PRNGKey(0)}, *data)
        weights = dict(kl_tolerance=0.1, loss_kl_weight=1.0,
                       loss_visibility_weight=1.0, loss_cmd_weight=1.0,
                       loss_args_weight=2.0)

        def loss_of(model):
            def f(params):
                out = model.apply(
                    {"params": params}, *data, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)},
                )
                return svg_loss(out, weights, model.cfg)["loss"]
            return f

        lx, gx = jax.value_and_grad(loss_of(model_x))(variables["params"])
        lp, gp = jax.value_and_grad(loss_of(model_p))(variables["params"])
        np.testing.assert_allclose(float(lx), float(lp), rtol=1e-5)
        flat_p = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(gp)}
        for k, v in jax.tree_util.tree_leaves_with_path(gx):
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(flat_p[jax.tree_util.keystr(k)]),
                atol=3e-4, err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
            )


class TestSubBlockedAttention:
    def test_attn_rows_matches_full_tile(self):
        """Sub-blocked attention (attn_rows < rows) is bit-equivalent to the
        coupled kernel: the off-diagonal blocks it skips are fully masked."""
        import numpy as np

        from deepsvg_tpu.ops.layer import fused_layer

        rng = np.random.default_rng(0)
        B, S, D, H, DFF = 32, 8, 128, 4, 256
        x = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)

        def init(*s):
            return jnp.asarray(rng.normal(size=s) * 0.05, jnp.float32)

        wqkv, bqkv = init(D, 3 * D), init(3 * D)
        wo, bo = init(D, D), init(D)
        w1, b1 = init(D, DFF), init(DFF)
        w2, b2 = init(DFF, D), init(D)
        ln = jnp.stack([jnp.ones((D,)), jnp.zeros((D,))]).astype(jnp.float32)
        mask = jnp.where(jnp.arange(S)[None, :] >= 6, -jnp.inf, 0.0)
        mask = jnp.broadcast_to(mask, (B, S)).astype(jnp.float32)

        args = (x, None, ln, wqkv, bqkv, wo, bo, ln, w1, b1, w2, b2, mask)
        base = fused_layer(*args, n_heads=H, tile_b=16)
        for attn_rows in (8, 16, 32, 64):
            sub = fused_layer(*args, n_heads=H, tile_b=16, attn_rows=attn_rows)
            np.testing.assert_allclose(np.asarray(sub), np.asarray(base),
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=str(attn_rows))
