"""Numerical parity against the PyTorch reference implementation.

Transplants the torch reference model's weights into this framework's flax
parameter tree, runs both on the same batch, and compares logits and losses.
This is the strongest correctness check available: it validates the entire
forward semantics (embeddings, masks, pre-LN layers, latent injection,
pooling, heads) end to end, not just shapes.

Requires the read-only reference checkout at /root/reference (torch CPU).
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

try:
    from deepsvg.model.config import Hierarchical as TorchHierarchical
    from deepsvg.model.loss import SVGLoss as TorchSVGLoss
    from deepsvg.model.model import SVGTransformer as TorchSVGTransformer

    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")

import jax
import jax.numpy as jnp

from deepsvg_tpu.models import ModelConfig, SVGTransformer, svg_loss


def torch_cfg():
    cfg = TorchHierarchical()
    cfg.dropout = 0.0
    cfg.use_vae = False
    return cfg


def jax_cfg():
    return ModelConfig(
        encode_stages=2, decode_stages=2, use_vae=False, dropout=0.0,
    )


def _t(x):  # torch tensor -> numpy
    return x.detach().cpu().numpy()


def transplant(torch_model) -> dict:
    """Map the torch state_dict onto the flax param tree — through the
    library importer (deepsvg_tpu.models.torch_import), so every parity test
    below also validates the user-facing checkpoint-import path."""
    from deepsvg_tpu.models.torch_import import state_dict_to_params

    sd = {k: _t(v) for k, v in torch_model.state_dict().items()}
    return state_dict_to_params(sd, jax_cfg())


@pytest.fixture(scope="module")
def models_and_batch():
    torch.manual_seed(0)
    tm = TorchSVGTransformer(torch_cfg()).eval()
    jcfg = jax_cfg()
    jm = SVGTransformer(jcfg)
    params = transplant(tm)

    sys.path.insert(0, "tests")
    from test_model import make_batch

    rng = np.random.default_rng(3)
    cmds, args = make_batch(rng, jcfg, n=3)
    return tm, jm, params, np.asarray(cmds), np.asarray(args)


class TestForwardParity:
    def test_param_count_matches(self, models_and_batch):
        tm, jm, params, cmds, args = models_and_batch
        n_torch = sum(
            p.numel() for n, p in tm.named_parameters() if "cmd_args_mask" not in n
        )
        n_jax = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        assert n_jax == n_torch

    def test_encode_parity(self, models_and_batch):
        tm, jm, params, cmds, args = models_and_batch
        with torch.no_grad():
            z_t = tm(
                torch.tensor(cmds), torch.tensor(args),
                torch.tensor(cmds), torch.tensor(args), encode_mode=True,
            )
        z_j = jm.apply({"params": params}, jnp.asarray(cmds), jnp.asarray(args),
                       None, None, encode_mode=True)
        # torch z: [1, 1, N, dz] seq-first; mine [N, dz]
        np.testing.assert_allclose(
            np.asarray(z_j), _t(z_t)[0, 0], atol=2e-4, rtol=1e-3
        )

    def test_logits_parity(self, models_and_batch):
        tm, jm, params, cmds, args = models_and_batch
        with torch.no_grad():
            out_t = tm(
                torch.tensor(cmds), torch.tensor(args),
                torch.tensor(cmds), torch.tensor(args),
            )
        out_j = jm.apply({"params": params}, jnp.asarray(cmds), jnp.asarray(args),
                         jnp.asarray(cmds), jnp.asarray(args))
        np.testing.assert_allclose(
            np.asarray(out_j["command_logits"]), _t(out_t["command_logits"]),
            atol=5e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out_j["args_logits"]), _t(out_t["args_logits"]),
            atol=5e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out_j["visibility_logits"]),
            _t(out_t["visibility_logits"])[:, :, 0],
            atol=5e-4, rtol=1e-3,
        )

    def test_loss_parity(self, models_and_batch):
        """loss_args / loss_visibility match exactly.

        loss_cmd gets a looser tolerance: the reference's 'extended' padding
        mask is computed with an overlapping in-place ``narrow().add_()``
        (model/utils.py:28) whose result is UNDEFINED — torch 2.13 raises on
        some shapes, extends the mask by 3 on others, and cascades chunk-wise
        on others. This framework defines the semantic cleanly as
        extend-by-3 (svgtensor/masks.py), so the command CE can differ on a
        few tail positions of near-max-length sequences.

        Full archaeology + the exact-parity version of this test (reference
        mask pinned to extend-by-3, all components at 5e-5):
        tests/test_torch_parity_grad.py."""
        tm, jm, params, cmds, args = models_and_batch
        weights = {
            "kl_tolerance": 0.1, "loss_kl_weight": 1.0,
            "loss_visibility_weight": 1.0, "loss_cmd_weight": 1.0,
            "loss_args_weight": 2.0,
        }
        with torch.no_grad():
            out_t = tm(
                torch.tensor(cmds), torch.tensor(args),
                torch.tensor(cmds), torch.tensor(args),
            )
            loss_t = TorchSVGLoss(torch_cfg())(out_t, None, weights)
        out_j = jm.apply({"params": params}, jnp.asarray(cmds), jnp.asarray(args),
                         jnp.asarray(cmds), jnp.asarray(args))
        loss_j = svg_loss(out_j, weights, jax_cfg())
        for k in ("loss_args", "loss_visibility"):
            np.testing.assert_allclose(
                float(loss_j[k]), float(loss_t[k]), atol=1e-3, rtol=1e-3,
            )
        np.testing.assert_allclose(
            float(loss_j["loss_cmd"]), float(loss_t["loss_cmd"]), rtol=0.05,
        )

    def test_cmd_ce_matches_under_same_mask(self, models_and_batch):
        """With an identical mask, the command cross-entropy math is exact —
        isolating the UB mask divergence documented above."""
        import optax

        from deepsvg_tpu.svgtensor import masks as M

        tm, jm, params, cmds, args = models_and_batch
        with torch.no_grad():
            out_t = tm(
                torch.tensor(cmds), torch.tensor(args),
                torch.tensor(cmds), torch.tensor(args),
            )
        out_j = jm.apply({"params": params}, jnp.asarray(cmds), jnp.asarray(args),
                         jnp.asarray(cmds), jnp.asarray(args))

        vis = M.visibility_mask(jnp.asarray(cmds))
        pad = M.padding_mask(jnp.asarray(cmds), extended=True) * vis[..., None].astype(jnp.float32)
        pad = np.asarray(pad)[..., 1:]
        tgt = cmds[..., 1:]

        # torch CE with MY mask
        sel = pad.astype(bool)
        ce_t = torch.nn.functional.cross_entropy(
            out_t["command_logits"][torch.tensor(sel)].reshape(-1, 7),
            torch.tensor(tgt)[torch.tensor(sel)].reshape(-1).long(),
        )
        ce_j = optax.softmax_cross_entropy_with_integer_labels(
            jnp.asarray(np.asarray(out_j["command_logits"])), jnp.asarray(tgt)
        )
        ce_j = float((jnp.asarray(pad) * ce_j).sum() / jnp.asarray(pad).sum())
        np.testing.assert_allclose(ce_j, float(ce_t), atol=1e-4, rtol=1e-4)

    def test_greedy_sample_parity(self, models_and_batch):
        """Greedy (T->0) reconstruction: identical commands, near-identical
        argmax args."""
        tm, jm, params, cmds, args = models_and_batch
        from deepsvg_tpu.models.sample import one_shot_sample

        with torch.no_grad():
            c_t, a_t = tm.greedy_sample(
                torch.tensor(cmds), torch.tensor(args),
                torch.tensor(cmds), torch.tensor(args),
                concat_groups=False,
            )
        c_j, a_j = one_shot_sample(
            jm, {"params": params}, commands_enc=jnp.asarray(cmds),
            args_enc=jnp.asarray(args),
        )
        agree = (np.asarray(c_j) == _t(c_t)).mean()
        assert agree > 0.99, f"command agreement {agree}"
        # args can differ on near-ties of untrained logits; require high overlap
        args_agree = (np.asarray(a_j) == _t(a_t)).mean()
        assert args_agree > 0.97, f"args agreement {args_agree}"


class TestCheckpointImport:
    def test_load_pth_tar_roundtrip(self, models_and_batch, tmp_path):
        """A reference-format .pth.tar ({'model': state_dict, 'cfg': ...})
        loads through load_torch_checkpoint into the identical param tree
        (incl. the DataParallel 'module.' prefix case)."""
        from deepsvg_tpu.models.torch_import import load_torch_checkpoint

        tm, jm, params, cmds, args = models_and_batch
        for prefix in ("", "module."):
            sdict = {prefix + k: v for k, v in tm.state_dict().items()}
            path = tmp_path / f"ckpt{bool(prefix)}.pth.tar"
            torch.save({"model": sdict, "cfg": {"some": "dict"}}, str(path))
            loaded = load_torch_checkpoint(str(path), jax_cfg())
            flat_a = jax.tree.leaves(params)
            flat_b = jax.tree.leaves(loaded)
            assert len(flat_a) == len(flat_b)
            for a, b in zip(flat_a, flat_b):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_load_session_accepts_pth_tar(self, models_and_batch, tmp_path):
        """InferenceSession built straight from a reference-format checkpoint
        (the notebooks/GUI entry path for the published pretrained files)."""
        from deepsvg_tpu.inference import load_session

        tm, jm, params, cmds, args = models_and_batch
        path = tmp_path / "pretrained.pth.tar"
        torch.save({"model": tm.state_dict()}, str(path))
        sess = load_session("configs_tpu.hierarchical_ordered", str(path))
        z_sess = sess.encode({"commands": jnp.asarray(cmds),
                              "args": jnp.asarray(args)})
        z_direct = jm.apply({"params": params}, jnp.asarray(cmds),
                            jnp.asarray(args), None, None, encode_mode=True)
        np.testing.assert_allclose(np.asarray(z_sess), np.asarray(z_direct),
                                   atol=2e-2)

    def test_label_conditioned_mapping(self):
        """Fonts-style config (label_condition): label embeddings and the
        per-layer linear_global2 injections map over."""
        import dataclasses

        from deepsvg.model.config import Hierarchical as TorchHierarchical
        from deepsvg.model.model import SVGTransformer as TorchSVGTransformer
        from deepsvg_tpu.models.torch_import import state_dict_to_params

        tcfg = TorchHierarchical()
        tcfg.dropout = 0.0
        tcfg.use_vae = True
        tcfg.label_condition = True
        tcfg.n_labels = 12
        torch.manual_seed(1)
        tm = TorchSVGTransformer(tcfg).eval()
        jcfg = dataclasses.replace(
            jax_cfg(), use_vae=True, label_condition=True, n_labels=12
        )
        sd = {k: _t(v) for k, v in tm.state_dict().items()}
        params = state_dict_to_params(sd, jcfg)
        # structure check: flax init accepts the imported tree verbatim
        jm = SVGTransformer(jcfg)
        cmds = jnp.zeros((2, jcfg.max_num_groups, jcfg.max_seq_len + 2), jnp.int32)
        args_ = jnp.full(cmds.shape + (11,), -1.0)
        label = jnp.asarray([1, 2])
        ref = jm.init({"params": jax.random.key(0), "vae": jax.random.key(1)},
                      cmds, args_, cmds, args_, label=label)["params"]
        ref_paths = {jax.tree_util.keystr(p)
                     for p, _ in jax.tree_util.tree_leaves_with_path(ref)}
        got_paths = {jax.tree_util.keystr(p)
                     for p, _ in jax.tree_util.tree_leaves_with_path(params)}
        assert ref_paths == got_paths, (
            sorted(ref_paths - got_paths), sorted(got_paths - ref_paths))
