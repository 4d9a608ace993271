"""Fused multi-layer STACK kernels (ops/stack_vjp.py) — the one-kernel
E2/D2 path: forward/grad parity against the composed single-layer fused
ops and against a pure-jnp reference, plus the model-level gate."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsvg_tpu.ops.layer_vjp import fused_layer_train
from deepsvg_tpu.ops.stack_vjp import fused_stack_train


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _layer_inputs(rng, d=32, dff=64):
    f = lambda *shape: jnp.asarray(rng.standard_normal(shape) * 0.05,
                                   jnp.float32)
    return dict(
        ln1=jnp.stack([jnp.ones(d), jnp.zeros(d)]),
        wqkv=f(d, 3 * d), bqkv=f(3 * d), wo=f(d, d), bo=f(d),
        ln2=jnp.stack([1 + 0.1 * jnp.asarray(rng.standard_normal(d),
                                             jnp.float32),
                       0.1 * jnp.asarray(rng.standard_normal(d),
                                         jnp.float32)]),
        w1=f(d, dff), b1=f(dff), w2=f(dff, d), b2=f(d),
    )


def _stacked(layers, key):
    return jnp.stack([l[key] for l in layers])


def _row(layers, key):
    return jnp.stack([l[key] for l in layers])[:, None, :]


def _stack_args(layers):
    return (_stacked(layers, "ln1"), _stacked(layers, "wqkv"),
            _row(layers, "bqkv"), _stacked(layers, "wo"),
            _row(layers, "bo"), _stacked(layers, "ln2"),
            _stacked(layers, "w1"), _row(layers, "b1"),
            _stacked(layers, "w2"), _row(layers, "b2"))


def _compose_single(x, biases, layers, mask, seed, n_heads, causal, rate):
    for li, l in enumerate(layers):
        x = fused_layer_train(
            x, biases[li], l["ln1"], l["wqkv"], l["bqkv"], l["wo"], l["bo"],
            l["ln2"], l["w1"], l["b1"], l["w2"], l["b2"], mask, seed,
            n_heads, min(x.shape[0], 4), causal, rate)
    return x


class TestStackForward:
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("L", [2, 4])
    def test_matches_composed_single_layer(self, rng, causal, L):
        b, s, d = 8, 8, 32
        x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.3, jnp.float32)
        biases = jnp.asarray(rng.standard_normal((L, b, d)) * 0.1,
                             jnp.float32)
        layers = [_layer_inputs(rng, d=d) for _ in range(L)]
        mask = np.zeros((b, s), np.float32)
        mask[:, 6:] = -np.inf
        mask = jnp.asarray(mask)
        seed = jnp.asarray([0], jnp.int32)

        out = fused_stack_train(x, biases, *_stack_args(layers), mask, seed,
                                4, causal, 0.0)
        ref = _compose_single(x, biases, layers, mask, seed, 4, causal, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)

    def test_grads_match_composed(self, rng):
        b, s, d, L = 8, 8, 32, 3
        x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.3, jnp.float32)
        biases = jnp.asarray(rng.standard_normal((L, b, d)) * 0.1,
                             jnp.float32)
        layers = [_layer_inputs(rng, d=d) for _ in range(L)]
        mask = jnp.zeros((b, s), jnp.float32)
        seed = jnp.asarray([0], jnp.int32)
        sargs = _stack_args(layers)

        def loss_stack(x, biases, *sargs):
            return jnp.sum(
                fused_stack_train(x, biases, *sargs, mask, seed, 4, False,
                                  0.0) ** 2)

        def loss_single(x, biases, *sargs):
            # rebuild per-layer dicts from the stacked args
            keys = ("ln1", "wqkv", "bqkv", "wo", "bo", "ln2", "w1", "b1",
                    "w2", "b2")
            rows = {"bqkv", "bo", "b1", "b2"}
            ls = [
                {k: (a[li, 0] if k in rows else a[li])
                 for k, a in zip(keys, sargs)}
                for li in range(L)
            ]
            return jnp.sum(
                _compose_single(x, biases, ls, mask, seed, 4, False,
                                0.0) ** 2)

        g_stack = jax.grad(loss_stack, argnums=tuple(range(2 + len(sargs))))(
            x, biases, *sargs)
        g_single = jax.grad(loss_single,
                            argnums=tuple(range(2 + len(sargs))))(
            x, biases, *sargs)
        for a, b_, name in zip(
                g_stack, g_single,
                ("x", "bias", "ln1", "wqkv", "bqkv", "wo", "bo", "ln2",
                 "w1", "b1", "w2", "b2")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-4, err_msg=name)

    def test_dropout_structure(self, rng):
        """With dropout on, the stack output is (a) deterministic given the
        seed, (b) different across seeds, (c) an unbiased estimate: mean
        over seeds approaches the rate-0 forward."""
        b, s, d, L = 8, 8, 32, 2
        x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.3, jnp.float32)
        biases = jnp.zeros((L, b, d), jnp.float32)
        layers = [_layer_inputs(rng, d=d) for _ in range(L)]
        mask = jnp.zeros((b, s), jnp.float32)
        sargs = _stack_args(layers)

        f = lambda seed, rate: fused_stack_train(  # noqa: E731
            x, biases, *sargs, mask, jnp.asarray([seed], jnp.int32), 4,
            False, rate)
        o1, o1b, o2 = f(3, 0.3), f(3, 0.3), f(4, 0.3)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o1b))
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
        base = f(0, 0.0)
        mean = np.mean([np.asarray(f(i, 0.3)) for i in range(24)], axis=0)
        corr = np.corrcoef(mean.ravel(), np.asarray(base).ravel())[0, 1]
        assert corr > 0.98, corr


class TestModelStackGate:
    def test_hierarchical_stage2_uses_stack_and_trains(self, rng):
        """A hierarchical model's E2/D2 stages (G=8 tokens) route through
        the stack-fused path in training and produce finite grads; the
        one-shot output matches the per-layer path's shape/dtype."""
        from deepsvg_tpu.data.synthetic import generate_batch
        from deepsvg_tpu.models import ModelConfig, SVGTransformer

        cfg = ModelConfig(
            encode_stages=2, decode_stages=2, use_vae=False,
            max_num_groups=8, max_seq_len=6, d_model=32, dim_feedforward=64,
            dim_z=16, n_layers=2, n_layers_decode=2, n_heads=4, dropout=0.1,
            attention_impl="pallas", compute_dtype="float32",
        )
        model = SVGTransformer(cfg)
        b = generate_batch(np.random.default_rng(0), 4, cfg.max_num_groups,
                           cfg.max_seq_len)
        c, a = jnp.asarray(b["commands"]), jnp.asarray(b["args"])
        variables = model.init(jax.random.PRNGKey(0), c, a, c, a)

        from deepsvg_tpu.models.layers import _use_stack_fused
        assert _use_stack_fused("pallas", False, 2, 4, cfg.max_num_groups)
        assert not _use_stack_fused("pallas", False, 2, 4, 32)  # big stage

        def loss(params):
            out = model.apply(
                {"params": params}, c, a, c, a, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)})
            return (jnp.mean(out["command_logits"] ** 2)
                    + jnp.mean(out["args_logits"] ** 2))

        val, grads = jax.value_and_grad(loss)(variables["params"])
        assert np.isfinite(float(val))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # stage-2 (hierarchical) layer params received gradient signal
        flat_named = jax.tree_util.tree_flatten_with_path(grads)[0]
        hier = [v for path, v in flat_named
                if any("hierarchical_encoder" in str(k) for k in path)]
        assert hier, "no hierarchical_encoder grads found in the tree"
        g_norm = sum(float(jnp.sum(jnp.abs(v))) for v in hier)
        assert g_norm > 0.0
