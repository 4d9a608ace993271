"""Gradient + optimizer-step parity against the PyTorch reference.

Extends forward parity (test_torch_parity.py) to the full training step:
transplanted identical weights, identical batch, one backward + clipped AdamW
update in both frameworks (reference train.py:98-106), comparing

  1. per-parameter gradients (transplanted through the same linear
     state_dict mapping the weights use), and
  2. the updated parameters after one optimizer step.

This catches masking / CE-reduction / weight-decay bugs the forward test
cannot.

The extended padding mask UB
----------------------------
The reference computes its loss mask with an overlapping in-place
``narrow().add_()`` (model/utils.py:28) whose result is UNDEFINED: the answer
depends on element processing order. Empirically (see
``test_reference_mask_is_undefined_behavior``) torch 2.13 CPU *raises* on
contiguous [1,1,S] inputs and produces a vector-width-dependent partial
cascade (neither clean extend-by-3 nor a full cascade) on batched [N,G,S]
inputs. On CUDA — where the published checkpoints were actually trained — a
racing elementwise kernel reads pre-update values, i.e. clean extend-by-3.
This framework therefore pins the semantics to extend-by-3
(svgtensor/masks.py), and these tests monkeypatch the reference's mask to the
same well-defined form so that everything downstream of the mask is compared
exactly.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "tests")

try:
    from deepsvg.model.loss import SVGLoss as TorchSVGLoss
    from deepsvg.model.model import SVGTransformer as TorchSVGTransformer
    import deepsvg.model.loss as ref_loss_mod
    import deepsvg.model.model as ref_model_mod

    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")

import jax
import jax.numpy as jnp
import optax

from deepsvg_tpu.models import svg_loss
from deepsvg_tpu.models.torch_import import state_dict_to_params
from deepsvg_tpu.training.trainer import make_optimizer

from test_torch_parity import jax_cfg, torch_cfg, transplant, _t

EOS = 4

WEIGHTS = {
    "kl_tolerance": 0.1,
    "loss_kl_weight": 1.0,
    "loss_visibility_weight": 1.0,
    "loss_cmd_weight": 1.0,
    "loss_args_weight": 2.0,
}


def _defined_padding_mask(commands, seq_dim=0, extended=False):
    """Well-defined extend-by-3 replacement for the reference's UB in-place
    mask (model/utils.py:20-32). Matches deepsvg_tpu.svgtensor.masks."""
    with torch.no_grad():
        m = ((commands == EOS).cumsum(dim=seq_dim) == 0).float()
        if extended:
            S = commands.size(seq_dim)
            shifted = torch.zeros_like(m)
            dst = [slice(None)] * m.ndim
            src = [slice(None)] * m.ndim
            dst[seq_dim] = slice(3, S)
            src[seq_dim] = slice(0, S - 3)
            shifted[tuple(dst)] = m[tuple(src)]
            m = (m + shifted).clamp(max=1)
        if seq_dim == 0:
            return m.unsqueeze(-1)
        return m


@pytest.fixture()
def patched_ref_mask(monkeypatch):
    """Pin the reference's loss/cost-matrix mask to extend-by-3 (both modules
    bind the name at import time)."""
    monkeypatch.setattr(ref_loss_mod, "_get_padding_mask", _defined_padding_mask)
    monkeypatch.setattr(ref_model_mod, "_get_padding_mask", _defined_padding_mask)


@pytest.fixture()
def setup():
    # .eval(): the reference hard-codes p=0.1 dropout inside
    # PositionalEncodingLUT (positional_encoding.py:26-28) regardless of
    # cfg.dropout, so train() mode is stochastic even at cfg.dropout=0.
    # (This framework ties PE dropout to cfg.dropout instead; real configs
    # use dropout=0.1 everywhere, where the two agree.)
    torch.manual_seed(0)
    tm = TorchSVGTransformer(torch_cfg()).eval()
    jcfg = jax_cfg()
    # transplant returns numpy VIEWS of the torch storage — copy, or the
    # in-place torch optimizer step would silently mutate our baseline
    params = jax.tree.map(np.array, transplant(tm))

    from test_model import make_batch
    from deepsvg_tpu.models import SVGTransformer

    rng = np.random.default_rng(7)
    cmds, args = make_batch(rng, jcfg, n=4)
    jm = SVGTransformer(jcfg)
    return tm, jm, params, np.asarray(cmds), np.asarray(args)


def torch_backward(tm, cmds, args):
    """Forward + loss + backward on the reference; returns (loss_dict, grads
    as a state_dict-shaped numpy dict)."""
    tc, ta = torch.tensor(cmds), torch.tensor(args)
    tm.zero_grad()
    out = tm(tc, ta, tc, ta)
    loss_dict = TorchSVGLoss(torch_cfg())(out, None, WEIGHTS)
    loss_dict["loss"].backward()
    grads = {}
    for k, p in tm.named_parameters():
        if "cmd_args_mask" in k:
            continue
        g = p.grad if p.grad is not None else torch.zeros_like(p)
        grads[k] = g.detach().cpu().numpy().copy()
    return loss_dict, grads


def jax_loss_fn(jm, cmds, args):
    jc, ja = jnp.asarray(cmds), jnp.asarray(args)

    def f(p):
        out = jm.apply({"params": p}, jc, ja, jc, ja)
        res = svg_loss(out, WEIGHTS, jm.cfg)
        return res["loss"], res

    return f


def _compare_trees(ref_tree, got_tree, atol, rtol, skip_paths=()):
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_tree)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(got_tree)[0]
    assert len(flat_ref) == len(flat_got)
    bad = []
    for (path_r, a), (path_g, b) in zip(flat_ref, flat_got):
        name = jax.tree_util.keystr(path_r)
        assert name == jax.tree_util.keystr(path_g)
        if any(s in name for s in skip_paths):
            continue
        a, b = np.asarray(a), np.asarray(b)
        if not np.allclose(a, b, atol=atol, rtol=rtol):
            err = np.max(np.abs(a - b))
            rel = err / (np.max(np.abs(a)) + 1e-12)
            bad.append(f"{name}: max_abs={err:.3e} rel={rel:.3e}")
    assert not bad, "mismatched leaves:\n" + "\n".join(bad[:20])


class TestMaskArchaeology:
    """Evidence for the pinned extend-by-3 semantics (VERDICT round 1 #10)."""

    def test_reference_mask_is_undefined_behavior(self):
        """The reference's overlapping in-place add is UB under torch 2.13
        CPU: it raises on contiguous inputs and, when it runs, matches
        neither clean extend-by-3 nor a full sequential cascade — the result
        is vector-width-dependent. This justifies pinning a defined
        semantic rather than chasing a host-specific bit pattern."""

        def ref_mask(commands, seq_dim=-1):
            m = ((commands == EOS).cumsum(dim=seq_dim) == 0).float()
            S = commands.size(seq_dim)
            torch.narrow(m, seq_dim, 3, S - 3).add_(
                torch.narrow(m, seq_dim, 0, S - 3)
            ).clamp_(max=1)
            return m

        # contiguous single sequence: torch 2.13 detects the overlap, raises
        c = torch.full((1, 1, 32), 1, dtype=torch.long)
        c[0, 0, 9:] = EOS
        with pytest.raises(RuntimeError):
            ref_mask(c)

        # batched [N, G, S]: runs, but partial-cascades past extend-by-3
        rng = np.random.default_rng(0)
        L = rng.integers(1, 32, size=(60, 8))
        cm = np.full((60, 8, 32), 1, dtype=np.int64)
        for n in range(60):
            for g in range(8):
                cm[n, g, L[n, g]:] = EOS
        t = torch.tensor(cm)
        r = ref_mask(t)
        e3 = _defined_padding_mask(t, seq_dim=-1, extended=True)
        # full sequential cascade reference
        casc = ((t == EOS).cumsum(dim=-1) == 0).float().numpy()
        for i in range(3, 32):
            casc[..., i] = np.clip(casc[..., i] + casc[..., i - 3], 0, 1)
        assert not torch.equal(r, e3)
        assert not np.array_equal(r.numpy(), casc)
        # and the defined form is a subset of what torch produced (extend-by-3
        # positions are always included; cascade only ever ADDS positions)
        assert float((e3 - r).max()) <= 0.0

    def test_our_mask_matches_defined_semantics(self):
        from deepsvg_tpu.svgtensor import masks as M

        rng = np.random.default_rng(1)
        L = rng.integers(1, 32, size=(5, 8))
        cm = np.full((5, 8, 32), 1, dtype=np.int64)
        for n in range(5):
            for g in range(8):
                cm[n, g, L[n, g]:] = EOS
        ours = np.asarray(M.padding_mask(jnp.asarray(cm), extended=True))
        theirs = _defined_padding_mask(torch.tensor(cm), seq_dim=-1,
                                       extended=True).numpy()
        np.testing.assert_array_equal(ours, theirs)


class TestGradientParity:
    def test_loss_exact_under_defined_mask(self, setup, patched_ref_mask):
        """With the UB mask pinned, every loss component matches tightly —
        the 5% loss_cmd tolerance in test_torch_parity.py is purely the UB."""
        tm, jm, params, cmds, args = setup
        with torch.no_grad():
            tc, ta = torch.tensor(cmds), torch.tensor(args)
            loss_t = TorchSVGLoss(torch_cfg())(tm(tc, ta, tc, ta), None, WEIGHTS)
        _, loss_j = jax_loss_fn(jm, cmds, args)(params)
        for k in ("loss", "loss_cmd", "loss_args", "loss_visibility"):
            np.testing.assert_allclose(
                float(loss_j[k]), float(loss_t[k]), atol=5e-5, rtol=5e-5,
                err_msg=k,
            )

    def test_gradient_parity(self, setup, patched_ref_mask):
        """Per-parameter gradients match after transplanting the torch grads
        through the (linear) state_dict mapping."""
        tm, jm, params, cmds, args = setup
        _, tgrads = torch_backward(tm, cmds, args)
        ref = state_dict_to_params(tgrads, jm.cfg)
        (_, _), jgrads = jax.value_and_grad(
            jax_loss_fn(jm, cmds, args), has_aux=True
        )(params)
        _compare_trees(ref, jgrads, atol=2e-5, rtol=2e-3)

    def test_adamw_step_parity(self, setup, patched_ref_mask):
        """One clipped AdamW step (reference train.py:98-106: backward ->
        clip_grad_norm_(1.0) -> AdamW(lr, wd=0.01).step()) produces the same
        updated parameters in both frameworks."""
        tm, jm, params, cmds, args = setup
        lr = 1e-3

        opt_t = torch.optim.AdamW(tm.parameters(), lr=lr)
        torch_backward(tm, cmds, args)
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 1.0)
        opt_t.step()
        new_sd = {k: _t(v) for k, v in tm.state_dict().items()}
        ref_new = state_dict_to_params(new_sd, jm.cfg)

        optimizer = make_optimizer(lambda s: lr, grad_clip=1.0, weight_decay=0.01)
        opt_state = optimizer.init(params)
        (_, _), grads = jax.value_and_grad(
            jax_loss_fn(jm, cmds, args), has_aux=True
        )(params)
        updates, _ = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # Compare the UPDATES (new - old). At step 1 the Adam update is
        # ~ lr * sign(g) for every element with |g| >> eps, so float-noise
        # sign flips on near-zero gradients blow up to 2*lr — compare only
        # elements whose gradient is comfortably above noise (the gradients
        # themselves are already matched exactly by test_gradient_parity).
        delta_ref = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                                 ref_new, params)
        delta_got = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                                 new_params, params)
        flat_ref = jax.tree_util.tree_flatten_with_path(delta_ref)[0]
        flat_got = jax.tree.leaves(delta_got)
        flat_g = jax.tree.leaves(grads)
        assert len(flat_ref) == len(flat_got) == len(flat_g)
        n_checked = n_total = 0
        bad = []
        for (path, dr), dg, g in zip(flat_ref, flat_got, flat_g):
            sel = np.abs(np.asarray(g)) > 1e-4
            n_checked += int(sel.sum())
            n_total += sel.size
            if not sel.any():
                continue
            a, b = np.asarray(dr)[sel], np.asarray(dg)[sel]
            if not np.allclose(a, b, atol=2e-2 * lr, rtol=2e-2):
                bad.append(f"{jax.tree_util.keystr(path)}: "
                           f"max_abs={np.max(np.abs(a - b)):.3e}")
        assert n_checked > 0.5 * n_total, "mask dropped too many elements"
        assert not bad, "mismatched updates:\n" + "\n".join(bad[:20])


class TestLRScheduleParity:
    def test_effective_schedule_matches_reference(self):
        """warmup_step_decay bit-matches the reference's EFFECTIVE lr
        sequence — including the two quirks it deliberately reproduces:
        iteration 0 at lr=0, and post-warmup decay boundaries every
        decay_every/2 iterations (train.py:103-106 advances StepLR twice per
        iteration: once directly, once through GradualWarmupScheduler)."""
        from deepsvg.schedulers.warmup import GradualWarmupScheduler
        import torch.optim.lr_scheduler as lr_scheduler

        from deepsvg_tpu.training.schedulers import warmup_step_decay

        base, warm, decay_every, gamma = 1e-3, 500, 2083, 0.9
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.AdamW([p], base)
        sched = lr_scheduler.StepLR(opt, step_size=decay_every, gamma=gamma)
        warmup = GradualWarmupScheduler(opt, multiplier=1.0, total_epoch=warm,
                                        after_scheduler=sched)
        ref = []
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            for _ in range(6000):
                ref.append(opt.param_groups[0]["lr"])
                sched.step()
                warmup.step()

        ours = warmup_step_decay(base, warm, decay_every, gamma)
        got = np.asarray([float(ours(s)) for s in range(6000)])
        np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-6, atol=1e-12)
