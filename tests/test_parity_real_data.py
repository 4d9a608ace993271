"""Real-data end-to-end parity guard (short version of
scripts/parity_real_data.py — see docs/PARITY_CURVE.md for the 300-step
artifact).

Asserts, on the reference's own in-repo SVG corpus:
  1. the reference preprocessing pipeline + BOTH loaders produce
     bit-identical model tensors for every kept icon, and
  2. torch and deepsvg_tpu training trajectories from identical init agree
     to 1e-4 relative over a short horizon (where deviation is
     implementation error, not fp32 chaos).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import parity_real_data as P

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference unavailable"
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    P.load_reference()
    workdir = str(tmp_path_factory.mktemp("parity_corpus"))
    ids = P.preprocess_corpus(workdir)
    return workdir, ids


class TestPreprocessEquivalence:
    def test_corpus_coverage(self, corpus):
        _, ids = corpus
        # 14 of the 15 in-repo fixtures survive the standard meta filters
        assert len(ids) >= 12, ids

    def test_loaders_tensorize_identically(self, corpus):
        workdir, ids = corpus
        ref = P.reference_tensors(workdir, ids)
        ours = P.our_tensors(workdir, ids)
        for icon_id in ids:
            for k in ("commands", "args"):
                np.testing.assert_array_equal(
                    ref[icon_id][k], ours[icon_id][k],
                    err_msg=f"{icon_id}/{k}")


class TestShortCurveParity:
    def test_loss_curves_agree(self, corpus):
        workdir, ids = corpus
        ref = P.reference_tensors(workdir, ids)
        ids = ids[:8]  # subset: keeps the test under ~2 min
        batch = {
            "commands": np.stack([ref[i]["commands"] for i in ids]).astype(np.int64),
            "args": np.stack([ref[i]["args"] for i in ids]).astype(np.float32),
        }
        steps = 12
        torch_curve, lrs, init_sd = P.train_torch(batch, steps)
        jax_curve = P.train_jax(batch, steps, lrs, init_sd)
        for key in ("loss", "loss_cmd", "loss_args", "loss_visibility"):
            t = np.asarray([c[key] for c in torch_curve])
            j = np.asarray([c[key] for c in jax_curve])
            np.testing.assert_allclose(j, t, rtol=1e-4, atol=1e-5,
                                       err_msg=key)
