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
