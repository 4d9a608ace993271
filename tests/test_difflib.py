"""Tests for differentiable geometry: Bézier sampling and losses.

The EMD loss is differential-tested against a direct numpy re-derivation of the
reference algorithm (difflib/loss.py:21-51) including its Python shift loop.
"""
import jax
import jax.numpy as jnp
import numpy as np

from deepsvg_tpu.difflib import (
    chamfer_loss,
    continuity_loss,
    get_length,
    is_clockwise,
    make_clockwise,
    resample_uniform,
    sample_points,
    sample_points_padded,
    svg_emd_loss,
    svg_length_loss,
)
from deepsvg_tpu.svgtensor import CMD_C, CMD_EOS, CMD_L, CMD_M, CMD_SOS, IndexArgs, N_ARGS


def make_args(rows):
    """rows: list of (cmd, c1, c2, end). Builds commands/args arrays."""
    cmds = np.array([r[0] for r in rows], np.int32)
    args = np.full((len(rows), N_ARGS), -1.0, np.float32)
    for i, (_, c1, c2, end) in enumerate(rows):
        args[i, IndexArgs.CONTROL1] = c1
        args[i, IndexArgs.CONTROL2] = c2
        args[i, IndexArgs.END_POS] = end
    return jnp.asarray(cmds), jnp.asarray(args)


class TestSampling:
    def test_line_samples(self):
        cmds, args = make_args([(CMD_L, (0, 0), (0, 0), (2.0, 0.0))])
        p = np.asarray(sample_points(cmds, args, n=5))
        # line from implicit start (0,0) to (2,0): 5 uniform samples
        np.testing.assert_allclose(p[:, 0], [0, 0.5, 1.0, 1.5, 2.0], atol=1e-6)
        np.testing.assert_allclose(p[:, 1], 0, atol=1e-6)

    def test_cubic_matches_de_casteljau(self, rng):
        c1, c2, end = rng.random(2), rng.random(2), rng.random(2)
        cmds, args = make_args([(CMD_C, c1, c2, end)])
        p = np.asarray(sample_points(cmds, args, n=7))
        p0 = np.zeros(2)
        for i, t in enumerate(np.linspace(0, 1, 7)):
            b = ((1 - t) ** 3 * p0 + 3 * (1 - t) ** 2 * t * c1
                 + 3 * (1 - t) * t**2 * c2 + t**3 * end)
            np.testing.assert_allclose(p[i], b, atol=1e-5)

    def test_chained_segments_share_endpoints(self):
        """Consecutive commands chain start positions; reference drops the
        duplicated joint point (difflib/tensor.py:227-228)."""
        cmds, args = make_args([
            (CMD_L, (0, 0), (0, 0), (1.0, 0.0)),
            (CMD_L, (0, 0), (0, 0), (1.0, 1.0)),
        ])
        p = np.asarray(sample_points(cmds, args, n=3))
        # 2 segments * (3-1) + 1 = 5 points
        assert p.shape == (5, 2)
        np.testing.assert_allclose(p, [[0, 0], [0.5, 0], [1, 0], [1, 0.5], [1, 1]], atol=1e-6)

    def test_padded_skips_non_curve_commands(self):
        cmds, args = make_args([
            (CMD_SOS, (0, 0), (0, 0), (0, 0)),
            (CMD_M, (0, 0), (0, 0), (1.0, 1.0)),
            (CMD_L, (0, 0), (0, 0), (2.0, 1.0)),
            (CMD_EOS, (0, 0), (0, 0), (0, 0)),
        ])
        points, valid = sample_points_padded(cmds, args, n=4)
        assert points.shape == (4, 4, 2)
        assert (np.asarray(valid) == [False, False, True, False]).all()
        # the line starts at the moveto's end position
        np.testing.assert_allclose(np.asarray(points)[2, 0], [1, 1], atol=1e-6)

    def test_resample_uniform(self):
        # polyline with very uneven spacing
        p = jnp.asarray([[0, 0], [0.1, 0], [10.0, 0]], jnp.float32)
        out = np.asarray(resample_uniform(p, 3))
        assert out.shape == (3, 2)
        np.testing.assert_allclose(out[0], [0, 0], atol=1e-6)
        np.testing.assert_allclose(out[-1], [10, 0], atol=1e-6)


class TestPointUtils:
    def test_clockwise(self):
        # screen coords (y down): counter-clockwise in math = clockwise on screen
        square = jnp.asarray([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], jnp.float32)
        cw = bool(is_clockwise(square))
        flipped = make_clockwise(square)
        assert bool(is_clockwise(flipped if not cw else square))

    def test_get_length(self):
        p = jnp.asarray([[0, 0], [3, 4], [3, 4]], jnp.float32)
        assert float(get_length(p)) == 5.0


class TestLosses:
    def test_chamfer_zero_for_identical(self, rng):
        x = jnp.asarray(rng.random((12, 2)), jnp.float32)
        assert float(chamfer_loss(x, x)) < 1e-5

    def test_chamfer_symmetric(self, rng):
        x = jnp.asarray(rng.random((12, 2)), jnp.float32)
        y = jnp.asarray(rng.random((7, 2)), jnp.float32)
        np.testing.assert_allclose(float(chamfer_loss(x, y)), float(chamfer_loss(y, x)), atol=1e-6)

    def test_continuity(self):
        p = jnp.asarray([[0, 0], [1, 0], [2, 0]], jnp.float32)
        assert float(continuity_loss(p)) == 1.0

    def test_length_loss(self):
        a = jnp.asarray([[0, 0], [1, 0]], jnp.float32)
        b = jnp.asarray([[0, 0], [2, 0]], jnp.float32)
        np.testing.assert_allclose(float(svg_length_loss(a, b)), 0.5, atol=1e-6)

    def ref_emd(self, p_pred, p_target):
        """Direct numpy re-derivation of reference svg_emd_loss."""
        def is_cw(p):
            s, e = p[:-1], p[1:]
            return (s[:, 0] * e[:, 1] - s[:, 1] * e[:, 0]).sum() > 0

        if not is_cw(p_target):
            p_target = p_target[::-1].copy()
        n = len(p_pred)
        distr_pred = np.linspace(0, 1, n)
        seg = np.linalg.norm(p_target[1:] - p_target[:-1], axis=-1)
        distr = np.concatenate([[0], np.cumsum(seg)])
        distr = distr / distr[-1]
        matching = np.abs(distr_pred[:, None] - distr[None, :]).argmin(-1)
        sub = p_target[matching]
        means = [np.linalg.norm(p_pred - np.roll(sub, -i, axis=0), axis=-1).mean() for i in range(n)]
        i = int(np.argmin(means))
        return np.linalg.norm(p_pred - np.roll(sub, -i, axis=0), axis=-1).mean()

    def test_emd_matches_reference(self, rng):
        for _ in range(5):
            p_pred = rng.random((16, 2)).astype(np.float32)
            p_target = rng.random((24, 2)).astype(np.float32)
            expected = self.ref_emd(p_pred, p_target)
            got = float(svg_emd_loss(jnp.asarray(p_pred), jnp.asarray(p_target)))
            np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_emd_zero_for_identical_contour(self):
        t = np.linspace(0, 2 * np.pi, 17)[:-1]
        circle = np.stack([np.cos(t), np.sin(t)], -1).astype(np.float32)
        loss = float(svg_emd_loss(jnp.asarray(circle), jnp.asarray(circle)))
        assert loss < 1e-3

    def test_emd_differentiable_and_jittable(self, rng):
        p_pred = jnp.asarray(rng.random((16, 2)), jnp.float32)
        p_target = jnp.asarray(rng.random((16, 2)), jnp.float32)
        g = jax.jit(jax.grad(svg_emd_loss))(p_pred, p_target)
        assert g.shape == p_pred.shape
        assert np.isfinite(np.asarray(g)).all()

    def test_emd_optimization_descends(self, rng):
        """Mini version of the svgtensor notebook demo: gradient descent of a
        noisy contour onto a circle decreases the EMD loss."""
        t = np.linspace(0, 2 * np.pi, 33)[:-1]
        target = jnp.asarray(np.stack([np.cos(t), np.sin(t)], -1), jnp.float32)
        pred = jnp.asarray(rng.random((32, 2)) * 2 - 1, jnp.float32)
        loss_grad = jax.jit(jax.value_and_grad(svg_emd_loss))
        l0, _ = loss_grad(pred, target)
        # loss is a mean of distances -> per-point grad magnitude ~ 1/n,
        # so scale the step by n for unit-speed descent
        for _ in range(100):
            l, g = loss_grad(pred, target)
            pred = pred - 1.0 * g
        assert float(l) < float(l0) * 0.5
