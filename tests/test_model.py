"""Tests for the SVG Transformer family: all architecture variants, loss,
gradients, Hungarian matching, and greedy sampling."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsvg_tpu.models import (
    ModelConfig,
    SVGTransformer,
    autoregressive_sample,
    flatten_groups_np,
    greedy_sample,
    one_shot_sample,
    svg_loss,
)
from deepsvg_tpu.svgtensor import (
    CMD_ARGS_MASK_NP,
    CMD_EOS,
    CMD_L,
    CMD_M,
    CMD_SOS,
    N_ARGS,
    PAD_VAL,
)

WEIGHTS = dict(
    kl_tolerance=0.1, loss_kl_weight=1.0, loss_visibility_weight=1.0,
    loss_cmd_weight=1.0, loss_args_weight=2.0,
)

SMALL = dict(
    max_num_groups=4, max_seq_len=8, d_model=32, dim_feedforward=64,
    dim_z=16, n_layers=2, n_layers_decode=2, n_heads=4, dropout=0.0,
)


def small_cfg(**kw):
    return ModelConfig(**{**SMALL, **kw})


def make_batch(rng, cfg, n=2, grouped=False, rel=False):
    """Random valid packed batch: [N, G, S+2] commands / [N, G, S+2, 11] args."""
    from deepsvg_tpu.svgtensor import pack_groups

    batches_c, batches_a = [], []
    for _ in range(n):
        n_groups = int(rng.integers(1, cfg.max_num_groups + 1))
        tensors = []
        for _ in range(n_groups):
            n_cmds = int(rng.integers(1, cfg.max_seq_len + 1))
            # a group is one path: a single leading moveto, then draw commands
            t = np.zeros((n_cmds, 14), np.float32)
            t[:, 0] = CMD_L
            t[0, 0] = CMD_M
            t[:, 1:] = rng.integers(0, cfg.args_dim, size=(n_cmds, 13))
            tensors.append(t)
        d = pack_groups(tensors, cfg.max_num_groups, cfg.max_seq_len, cfg.max_total_len)
        if grouped:
            key_c = "commands_grouped"
            key_a = "args_rel_grouped" if rel else "args_grouped"
        else:
            key_c, key_a = "commands", ("args_rel" if rel else "args")
        batches_c.append(d[key_c])
        batches_a.append(d[key_a])
    return jnp.asarray(np.stack(batches_c)), jnp.asarray(np.stack(batches_a))


def init_and_forward(cfg, cmds, args, label=None, **kw):
    return init_and_forward_enc_dec(cfg, cmds, args, cmds, args, label=label, **kw)


def init_and_forward_enc_dec(cfg, cmds_e, args_e, cmds_d, args_d, label=None, **kw):
    model = SVGTransformer(cfg)
    rngs = {"params": jax.random.key(0)}
    if cfg.use_vae:
        rngs["vae"] = jax.random.key(1)
    variables = model.init(rngs, cmds_e, args_e, cmds_d, args_d, label=label)
    apply_rngs = {"vae": jax.random.key(2)} if cfg.use_vae else None
    out = model.apply(variables, cmds_e, args_e, cmds_d, args_d, label=label,
                      rngs=apply_rngs, **kw)
    return model, variables, out


class TestVariants:
    def test_hierarchical(self, rng):
        cfg = small_cfg(encode_stages=2, decode_stages=2, use_vae=False)
        cmds, args = make_batch(rng, cfg)
        _, _, out = init_and_forward(cfg, cmds, args)
        n, g, s = cmds.shape
        assert out["command_logits"].shape == (n, g, cfg.max_seq_len + 1, cfg.n_commands)
        assert out["args_logits"].shape == (n, g, cfg.max_seq_len + 1, N_ARGS, cfg.args_dim + 1)
        assert out["visibility_logits"].shape == (n, g, 2)
        res = svg_loss(out, WEIGHTS, cfg)
        assert np.isfinite(float(res["loss"]))

    def test_hierarchical_vae(self, rng):
        cfg = small_cfg(encode_stages=2, decode_stages=2, use_vae=True)
        cmds, args = make_batch(rng, cfg)
        _, _, out = init_and_forward(cfg, cmds, args)
        assert out["mu"].shape == (2, cfg.dim_z)
        res = svg_loss(out, WEIGHTS, cfg)
        assert np.isfinite(float(res["loss_kl"]))

    def test_one_stage_one_shot(self, rng):
        cfg = small_cfg(encode_stages=1, decode_stages=1, use_vae=False)
        cmds, args = make_batch(rng, cfg, grouped=True)
        assert cmds.shape[1] == 1
        _, _, out = init_and_forward(cfg, cmds, args)
        assert out["command_logits"].shape == (2, 1, cfg.max_total_len + 1, cfg.n_commands)
        assert "visibility_logits" not in out
        res = svg_loss(out, WEIGHTS, cfg)
        assert np.isfinite(float(res["loss"]))

    def test_sketchformer_autoregressive(self, rng):
        cfg = small_cfg(encode_stages=1, decode_stages=1, use_vae=True,
                        pred_mode="autoregressive", rel_targets=True)
        # encoder consumes absolute args, decoder relative ones
        # (model/config.py:47-60 get_model_args)
        cmds, args_rel = make_batch(rng, cfg, grouped=True, rel=True)
        rng2 = np.random.default_rng(42)
        _, args_abs = make_batch(rng2, cfg, grouped=True, rel=False)
        _, _, out = init_and_forward_enc_dec(cfg, cmds, args_abs, cmds, args_rel)
        # AR logits: one per input position (targets minus last)
        s_in = cmds.shape[-1] - 1
        assert out["command_logits"].shape == (2, 1, s_in, cfg.n_commands)
        assert out["args_logits"].shape[-1] == 2 * cfg.args_dim
        res = svg_loss(out, WEIGHTS, cfg)
        assert np.isfinite(float(res["loss"]))

    def test_sketchrnn_lstm(self, rng):
        cfg = small_cfg(encode_stages=1, decode_stages=1, use_vae=True,
                        model_type="lstm", pred_mode="autoregressive",
                        rel_targets=True)
        cmds, args_rel = make_batch(rng, cfg, grouped=True, rel=True)
        rng2 = np.random.default_rng(42)
        _, args_abs = make_batch(rng2, cfg, grouped=True, rel=False)
        _, _, out = init_and_forward_enc_dec(cfg, cmds, args_abs, cmds, args_rel)
        res = svg_loss(out, WEIGHTS, cfg)
        assert np.isfinite(float(res["loss"]))

    def test_label_condition(self, rng):
        cfg = small_cfg(encode_stages=2, decode_stages=2, use_vae=False,
                        label_condition=True, n_labels=10)
        cmds, args = make_batch(rng, cfg)
        label = jnp.asarray([1, 3])
        _, _, out = init_and_forward(cfg, cmds, args, label=label)
        res = svg_loss(out, WEIGHTS, cfg)
        assert np.isfinite(float(res["loss"]))

    def test_self_match(self, rng):
        cfg = small_cfg(encode_stages=2, decode_stages=2, use_vae=False,
                        self_match=True)
        cmds, args = make_batch(rng, cfg)
        _, _, out = init_and_forward(cfg, cmds, args)
        res = svg_loss(out, WEIGHTS, cfg)
        assert np.isfinite(float(res["loss"]))

    def test_self_match_improves_over_worst_ordering(self, rng):
        """The Hungarian gather must choose a (visible-row) assignment no worse
        than identity."""
        from deepsvg_tpu.models.matching import matching_cost, perfect_matching

        cfg = small_cfg(encode_stages=2, decode_stages=2, use_vae=False,
                        self_match=True)
        cmds, args = make_batch(rng, cfg)
        # init+apply an *ordered* twin to get raw (un-gathered) decoder outputs
        cfg_ord = dataclasses.replace(cfg, self_match=False)
        model = SVGTransformer(cfg_ord)
        variables = model.init({"params": jax.random.key(0)}, cmds, args, cmds, args)
        out = model.apply(variables, cmds, args, cmds, args)
        cost, vis = matching_cost(
            out["command_logits"], out["args_logits"], out["visibility_logits"],
            cmds, args, cfg,
        )
        assign = perfect_matching(
            out["command_logits"], out["args_logits"], out["visibility_logits"],
            cmds, args, cfg,
        )
        cost_np, vis_np, assign_np = map(np.asarray, (cost, vis, assign))
        for i in range(cost_np.shape[0]):
            v = vis_np[i].astype(bool)
            hung = cost_np[i][v, assign_np[i][: v.sum()]].sum()
            ident = np.trace(cost_np[i][v][:, : v.sum()]) if v.sum() else 0.0
            assert hung <= ident + 1e-5
            # assignment is a permutation
            assert sorted(assign_np[i].tolist()) == list(range(cfg.n_groups_prop))

    def test_self_match_fused_matches_reference_path(self, rng):
        """The fused self-match path (pairwise-cost kernel + target
        permutation + fused CE head, no argument logits anywhere) must produce
        the same loss AND gradients as the reference-style path (full logits,
        Hungarian, logits permutation, standard CE)."""
        cfg = small_cfg(encode_stages=2, decode_stages=2, use_vae=False,
                        self_match=True)
        cmds, args = make_batch(rng, cfg, n=3)
        model = SVGTransformer(cfg)
        variables = model.init({"params": jax.random.key(0)}, cmds, args, cmds, args)

        def loss_fn(params, fused):
            out = model.apply({"params": params}, cmds, args, cmds, args,
                              fused_ce=fused)
            return svg_loss(out, WEIGHTS, cfg)["loss"]

        l0, g0 = jax.value_and_grad(lambda p: loss_fn(p, False))(variables["params"])
        l1, g1 = jax.value_and_grad(lambda p: loss_fn(p, True))(variables["params"])
        assert abs(float(l0) - float(l1)) < 1e-5
        md = max(jax.tree.leaves(
            jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))), g0, g1)
        ))
        assert md < 1e-4, md

    def test_self_match_fused_output_contract(self, rng):
        """Fused self-match output dict: args_ce instead of args_logits, and
        permuted targets whose pairing equals the reference's permuted-logits
        pairing."""
        cfg = small_cfg(encode_stages=2, decode_stages=2, use_vae=False,
                        self_match=True)
        cmds, args = make_batch(rng, cfg, n=2)
        model = SVGTransformer(cfg)
        variables = model.init({"params": jax.random.key(0)}, cmds, args, cmds, args)
        out = model.apply(variables, cmds, args, cmds, args, fused_ce=True)
        assert "args_ce" in out and "args_logits" not in out
        # permuted targets hold the same multiset of rows per sample
        tc = np.asarray(out["tgt_commands"])
        for i in range(tc.shape[0]):
            orig = sorted(map(tuple, np.asarray(cmds)[i].tolist()))
            perm = sorted(map(tuple, tc[i].tolist()))
            assert orig == perm


class TestGradients:
    def test_grad_finite_hierarchical(self, rng):
        cfg = small_cfg(encode_stages=2, decode_stages=2, use_vae=True)
        cmds, args = make_batch(rng, cfg)
        model = SVGTransformer(cfg)
        variables = model.init(
            {"params": jax.random.key(0), "vae": jax.random.key(1)},
            cmds, args, cmds, args,
        )

        def loss_fn(params):
            out = model.apply(
                {"params": params}, cmds, args, cmds, args,
                rngs={"vae": jax.random.key(2)},
            )
            return svg_loss(out, WEIGHTS, cfg)["loss"]

        g = jax.jit(jax.grad(loss_fn))(variables["params"])
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # every parameter receives gradient somewhere
        nonzero = sum(float(np.abs(np.asarray(l)).sum()) > 0 for l in leaves)
        assert nonzero > len(leaves) * 0.8


class TestSampling:
    def test_one_shot_sample(self, rng):
        cfg = small_cfg(encode_stages=2, decode_stages=2, use_vae=False)
        cmds, args = make_batch(rng, cfg)
        model, variables, _ = init_and_forward(cfg, cmds, args)
        out_c, out_a = one_shot_sample(model, variables, commands_enc=cmds, args_enc=args)
        assert out_c.shape == (2, cfg.max_num_groups, cfg.max_seq_len + 1)
        assert out_a.shape == (2, cfg.max_num_groups, cfg.max_seq_len + 1, N_ARGS)
        # valid outputs: invalid args are PAD
        mask = CMD_ARGS_MASK_NP[np.asarray(out_c)].astype(bool)
        assert (np.asarray(out_a)[~mask] == PAD_VAL).all()

    def test_one_shot_deterministic(self, rng):
        cfg = small_cfg(encode_stages=2, decode_stages=2, use_vae=False)
        cmds, args = make_batch(rng, cfg)
        model, variables, _ = init_and_forward(cfg, cmds, args)
        c1, a1 = one_shot_sample(model, variables, commands_enc=cmds, args_enc=args)
        c2, a2 = one_shot_sample(model, variables, commands_enc=cmds, args_enc=args)
        assert (np.asarray(c1) == np.asarray(c2)).all()
        assert (np.asarray(a1) == np.asarray(a2)).all()

    def test_autoregressive_sample(self, rng):
        cfg = small_cfg(encode_stages=1, decode_stages=1, use_vae=False,
                        pred_mode="autoregressive", rel_targets=True,
                        max_num_groups=2, max_seq_len=5)
        cmds, args_rel = make_batch(rng, cfg, grouped=True, rel=True)
        rng2 = np.random.default_rng(42)
        _, args_abs = make_batch(rng2, cfg, grouped=True, rel=False)
        model, variables, _ = init_and_forward_enc_dec(cfg, cmds, args_abs, cmds, args_rel)
        z = model.apply(variables, cmds, args_abs, None, None, encode_mode=True)
        out_c, out_a = autoregressive_sample(model, variables, z)
        assert out_c.shape == (2, 1, cfg.max_total_len)
        assert out_a.shape == (2, 1, cfg.max_total_len, N_ARGS)

    def test_greedy_sample_dispatch_and_flatten(self, rng):
        cfg = small_cfg(encode_stages=2, decode_stages=2, use_vae=False)
        cmds, args = make_batch(rng, cfg)
        model, variables, _ = init_and_forward(cfg, cmds, args)
        out_c, out_a = greedy_sample(model, variables, commands_enc=cmds, args_enc=args)
        flat = flatten_groups_np(out_c, out_a)
        assert len(flat) == 2
        for c, a in flat:
            assert c.ndim == 1 and a.shape == (len(c), N_ARGS)
            assert (c != CMD_EOS).all()  # padding dropped

    def test_encode_mode(self, rng):
        cfg = small_cfg(encode_stages=2, decode_stages=2, use_vae=False)
        cmds, args = make_batch(rng, cfg)
        model, variables, _ = init_and_forward(cfg, cmds, args)
        z = model.apply(variables, cmds, args, None, None, encode_mode=True)
        assert z.shape == (2, cfg.dim_z)
        # latent decode round trip
        out_c, _ = one_shot_sample(model, variables, z=z)
        assert out_c.shape == (2, cfg.max_num_groups, cfg.max_seq_len + 1)


class TestKVCache:
    def test_cached_matches_full_ar(self, rng):
        """KV-cached greedy decode must bit-match the full re-forward scan."""
        from deepsvg_tpu.models.sample import (
            autoregressive_sample,
            autoregressive_sample_cached,
        )

        cfg = small_cfg(encode_stages=1, decode_stages=1, use_vae=False,
                        pred_mode="autoregressive", rel_targets=True,
                        max_num_groups=2, max_seq_len=5)
        cmds, args_rel = make_batch(rng, cfg, grouped=True, rel=True)
        rng2 = np.random.default_rng(7)
        _, args_abs = make_batch(rng2, cfg, grouped=True, rel=False)
        model, variables, _ = init_and_forward_enc_dec(cfg, cmds, args_abs, cmds, args_rel)
        z = model.apply(variables, cmds, args_abs, None, None, encode_mode=True)
        c1, a1 = autoregressive_sample(model, variables, z)
        c2, a2 = autoregressive_sample_cached(model, variables, z)
        assert (np.asarray(c1) == np.asarray(c2)).all()
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)

    def test_cached_absolute_targets(self, rng):
        from deepsvg_tpu.models.sample import (
            autoregressive_sample,
            autoregressive_sample_cached,
        )

        cfg = small_cfg(encode_stages=1, decode_stages=1, use_vae=False,
                        pred_mode="autoregressive", rel_targets=False,
                        max_num_groups=2, max_seq_len=5)
        cmds, args = make_batch(rng, cfg, grouped=True)
        model, variables, _ = init_and_forward(cfg, cmds, args)
        z = model.apply(variables, cmds, args, None, None, encode_mode=True)
        c1, a1 = autoregressive_sample(model, variables, z)
        c2, a2 = autoregressive_sample_cached(model, variables, z)
        assert (np.asarray(c1) == np.asarray(c2)).all()
