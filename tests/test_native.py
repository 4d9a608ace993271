"""Tests for the native (C++) geometry engine: differential against the
Python implementations, plus a speed sanity check."""
import time

import numpy as np
import pytest

from deepsvg_tpu import native
from deepsvg_tpu.svglib import path_fitting

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def noisy_contour(rng, n=200):
    t = np.linspace(0, 2 * np.pi, n)
    pts = np.stack([10 + 5 * np.cos(t), 10 + 5 * np.sin(t)], -1)
    return pts + rng.normal(0, 0.01, pts.shape)


class TestNativeFit:
    def test_fit_cubics_matches_python(self, rng):
        pts = noisy_contour(rng)
        py = path_fitting.fit_cubics(pts, 0.1)
        cc = native.fit_cubics(pts, 0.1)
        assert len(py) == len(cc)
        for a, b in zip(py, cc):
            assert a[0] == b[0]
            for va, vb in zip(a[1:], b[1:]):
                np.testing.assert_allclose(va, vb, atol=1e-9)

    def test_rdp_matches_python(self, rng):
        pts = rng.random((150, 2)) * np.array([100, 3])
        py = path_fitting.rdp(pts, 1.0)
        cc = native.rdp(pts, 1.0)
        assert len(py) == len(cc)
        for a, b in zip(py, cc):
            for va, vb in zip(a[1:], b[1:]):
                np.testing.assert_allclose(va, vb, atol=1e-9)

    def test_sample_cubics(self, rng):
        curves = rng.random((5, 8))
        out = native.sample_cubics(curves, 10)
        assert out.shape == (5, 10, 2)
        # endpoints exact
        np.testing.assert_allclose(out[:, 0], curves[:, 0:2], atol=1e-12)
        np.testing.assert_allclose(out[:, -1], curves[:, 6:8], atol=1e-12)

    def test_path_simplify_uses_native(self, rng):
        from deepsvg_tpu.svglib import SVGPath

        t = np.linspace(0, 2 * np.pi, 100)
        d = "M " + " L ".join(f"{10+5*np.cos(a):.4f} {10+5*np.sin(a):.4f}" for a in t)
        p_native = SVGPath.from_str(d).path.split(n=1)
        p_py = p_native.copy()
        p_native.simplify(tolerance=0.1, force_smooth=True, use_native=True)
        p_py.simplify(tolerance=0.1, force_smooth=True, use_native=False)
        assert len(p_native.path_commands) == len(p_py.path_commands)
        for a, b in zip(p_native.path_commands, p_py.path_commands):
            np.testing.assert_allclose(a.end_pos.pos, b.end_pos.pos, atol=1e-8)

    def test_native_is_faster(self, rng):
        pts = noisy_contour(rng, n=2000)
        t0 = time.perf_counter()
        for _ in range(3):
            path_fitting.fit_cubics(pts, 0.01)
        t_py = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            native.fit_cubics(pts, 0.01)
        t_cc = time.perf_counter() - t0
        assert t_cc < t_py  # typically 20-100x faster
