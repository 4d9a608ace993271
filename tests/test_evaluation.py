"""Tests for the quantitative reconstruction eval harness
(deepsvg_tpu/evaluation.py) — the numeric quality metric the reference
lacks (its only check is eyeballing TB grids)."""
import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsvg_tpu.data.synthetic import generate_batch
from deepsvg_tpu.evaluation import evaluate_batches, recon_metrics
from deepsvg_tpu.models import ModelConfig, SVGTransformer
from deepsvg_tpu.svgtensor.constants import CMD_EOS


def _batch(n=4, g=3, s=6, seed=0):
    rng = np.random.default_rng(seed)
    b = generate_batch(rng, n, g, s)
    return (jnp.asarray(b["commands"], jnp.int32),
            jnp.asarray(b["args"], jnp.float32))


class TestReconMetrics:
    def test_perfect_reconstruction(self):
        c, a = _batch()
        gt_c, gt_a = c[..., 1:], a[..., 1:, :]
        m = recon_metrics(gt_c, gt_a, gt_c, gt_a)
        assert float(m["cmd_hit"]) == float(m["cmd_cnt"]) > 0
        assert float(m["vis_hit"]) == float(m["vis_cnt"])
        assert float(m["mae_sum"]) == 0.0
        assert float(m["chamfer_sum"]) / max(float(m["chamfer_cnt"]), 1) < 1e-3
        # EMD has a small arc-length-resampling noise floor (~0.1 quantized
        # units) even at identity; see evaluation.py docstring
        assert float(m["emd_sum"]) / max(float(m["emd_cnt"]), 1) < 0.3
        assert float(m["emd_cnt"]) > 0

    def test_perturbation_increases_metrics(self):
        c, a = _batch()
        gt_c, gt_a = c[..., 1:], a[..., 1:, :]
        # shift every valid coordinate by +9 quantized units
        pr_a = jnp.where(gt_a >= 0, jnp.clip(gt_a + 9, 0, 255), gt_a)
        m = recon_metrics(gt_c, gt_a, gt_c, pr_a)
        mae = float(m["mae_sum"]) / float(m["mae_cnt"])
        assert 5.0 < mae <= 9.0 + 1e-6
        cham = float(m["chamfer_sum"]) / float(m["chamfer_cnt"])
        assert cham > 1.0  # a rigid translation moves the whole cloud

    def test_matched_emd_recovers_permuted_groups(self):
        # permute the prediction's group order: index matching scores the
        # permutation as a large error; Hungarian matching must recover the
        # identity pairing (the self-match-model case, VERDICT r4 Weak #6)
        c, a = _batch(n=3, g=3, s=6, seed=1)
        gt_c, gt_a = c[..., 1:], a[..., 1:, :]
        perm = jnp.asarray([2, 0, 1])
        pr_c, pr_a = gt_c[:, perm], gt_a[:, perm]

        m_idx = recon_metrics(gt_c, gt_a, pr_c, pr_a)
        m_mat = recon_metrics(gt_c, gt_a, pr_c, pr_a, match_groups=True)
        emd_idx = float(m_idx["emd_sum"]) / max(float(m_idx["emd_cnt"]), 1)
        emd_mat = float(m_mat["emd_sum"]) / max(float(m_mat["emd_cnt"]), 1)
        # matched mode: identity-quality scores on every metric
        assert emd_mat < 0.3 < emd_idx
        assert float(m_mat["cmd_hit"]) == float(m_mat["cmd_cnt"]) > 0
        assert float(m_mat["mae_sum"]) == 0.0
        assert float(m_idx["mae_sum"]) > 0.0

    def test_matched_emd_identity_on_ordered(self):
        # on an already-ordered prediction both modes agree
        c, a = _batch(n=2, g=3, s=6, seed=2)
        gt_c, gt_a = c[..., 1:], a[..., 1:, :]
        m_idx = recon_metrics(gt_c, gt_a, gt_c, gt_a)
        m_mat = recon_metrics(gt_c, gt_a, gt_c, gt_a, match_groups=True)
        for k in ("emd_sum", "emd_cnt", "cmd_hit", "mae_sum"):
            assert float(m_idx[k]) == pytest.approx(float(m_mat[k]), abs=1e-4)

    def test_dropped_group_hits_visibility(self):
        c, a = _batch(n=2, g=3, s=6, seed=3)
        gt_c, gt_a = c[..., 1:], a[..., 1:, :]
        # predict the first group empty (all EOS)
        pr_c = gt_c.at[:, 0, :].set(CMD_EOS)
        m = recon_metrics(gt_c, gt_a, pr_c, gt_a)
        assert float(m["vis_hit"]) < float(m["vis_cnt"])
        # cmd accuracy also drops (EOS where gt had content)
        assert float(m["cmd_hit"]) < float(m["cmd_cnt"])


class TestEvaluateBatches:
    def test_end_to_end_tiny_model(self):
        cfg = ModelConfig(
            encode_stages=2, decode_stages=2, use_vae=False,
            max_num_groups=3, max_seq_len=6, d_model=32, dim_feedforward=64,
            dim_z=16, n_layers=1, n_layers_decode=1, n_heads=4, dropout=0.0,
        )
        model = SVGTransformer(cfg)
        rng = np.random.default_rng(0)
        b = generate_batch(rng, 4, cfg.max_num_groups, cfg.max_seq_len)
        c0, a0 = jnp.asarray(b["commands"]), jnp.asarray(b["args"])
        variables = model.init(jax.random.PRNGKey(0), c0, a0, c0, a0)
        batches = [
            {"commands": generate_batch(rng, 4, 3, 6)["commands"],
             "args": generate_batch(rng, 4, 3, 6)["args"]}
            for _ in range(2)
        ]
        res = evaluate_batches(model, variables, batches)
        assert res["n_samples"] == 8
        for k in ("vis_acc", "cmd_acc", "args_mae", "chamfer", "emd"):
            assert np.isfinite(res[k]), (k, res)
        assert 0.0 <= res["vis_acc"] <= 1.0
        assert 0.0 <= res["cmd_acc"] <= 1.0


class TestCLI:
    def test_eval_recon_cli_smoke(self, tmp_path):
        out = tmp_path / "eval.json"
        r = subprocess.run(
            [sys.executable, "scripts/eval_recon.py",
             "--config-module", "configs_tpu.test_tiny",
             "--n", "8", "--batch-size", "4", "--out", str(out)],
            capture_output=True, text=True, timeout=600,
            env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-2000:]
        res = json.loads(out.read_text())
        assert res["n_samples"] == 8
        assert np.isfinite(res["chamfer"])
