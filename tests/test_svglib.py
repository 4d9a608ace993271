"""Tests for the CPU SVG library: parsing, transforms, canonicalization,
simplification, tensor bridge, rendering. Uses the reference repo's in-tree
SVG files as fixtures (read-only)."""
import numpy as np
import pytest

from deepsvg_tpu.svglib import (
    SVG,
    Angle,
    Bbox,
    Flag,
    Point,
    Radius,
    SVGCircle,
    SVGCommandArc,
    SVGCommandBezier,
    SVGCommandLine,
    SVGPath,
    SVGRectangle,
)
from deepsvg_tpu.svgtensor import CMD_C, CMD_L, CMD_M, CMD_Z

DOLPHIN = "/root/reference/docs/imgs/dolphin.svg"
FRAMES_DIR = "/root/reference/docs/frames"


class TestGeom:
    def test_point_ops(self):
        p = Point(3, 4)
        assert p.norm() == 5
        assert (p + Point(1, 1)).tolist() == [4, 5]
        assert (2 * p).tolist() == [6, 8]
        assert p.dist(Point(0, 0)) == 5

    def test_rotate(self):
        p = Point(1, 0).rotate(Angle(90))
        np.testing.assert_allclose(p.pos, [0, 1], atol=1e-12)

    def test_bbox(self):
        b = Bbox(24)
        assert b.wh.tolist() == [24, 24]
        assert b.center.tolist() == [12, 12]
        b2 = Bbox(Point(0, 0), Point(10, 5))
        assert b2.area() == 50
        u = b2.union(Bbox(Point(5, 0), Point(20, 3)))
        assert u.wh.tolist() == [20, 5]

    def test_bbox_overlap(self):
        a = Bbox(Point(0, 0), Point(10, 10))
        b = Bbox(Point(5, 5), Point(15, 15))
        assert a.overlap(b) == 0.25


class TestParsing:
    def test_parse_simple_path(self):
        g = SVGPath.from_str("M 0 0 L 10 0 L 10 10 Z")
        assert len(g.svg_paths) == 1
        path = g.path
        assert path.closed
        assert len(path.path_commands) == 2
        assert path.start_pos.tolist() == [0, 0]

    def test_relative_commands(self):
        g = SVGPath.from_str("m 1 1 l 2 0 l 0 2")
        path = g.path
        assert path.path_commands[0].end_pos.tolist() == [3, 1]
        assert path.path_commands[1].end_pos.tolist() == [3, 3]

    def test_hv_commands(self):
        g = SVGPath.from_str("M 0 0 H 5 V 7 h -2 v -3")
        ends = [c.end_pos.tolist() for c in g.path.path_commands]
        assert ends == [[5, 0], [5, 7], [3, 7], [3, 4]]

    def test_quadratic_promotion(self):
        g = SVGPath.from_str("M 0 0 Q 1 2 2 0")
        cmd = g.path.path_commands[0]
        assert isinstance(cmd, SVGCommandBezier)
        # q->c: both controls equal the quadratic control in this promotion
        assert cmd.control1.tolist() == [1, 2]

    def test_smooth_reflection(self):
        g = SVGPath.from_str("M 0 0 C 1 1 2 1 3 0 S 5 -1 6 0")
        c2 = g.path.path_commands[1]
        # reflected control: 2*end - prev control2 = 2*(3,0)-(2,1) = (4,-1)
        assert c2.control1.tolist() == [4, -1]

    def test_implicit_lineto_after_moveto(self):
        g = SVGPath.from_str("M 0 0 5 5 10 0")
        cmds = g.path.path_commands
        assert len(cmds) == 2
        assert all(isinstance(c, SVGCommandLine) for c in cmds)

    def test_multiple_subpaths(self):
        g = SVGPath.from_str("M 0 0 L 1 0 M 5 5 L 6 5")
        assert len(g.svg_paths) == 2

    def test_load_reference_fixture(self):
        svg = SVG.load_svg(DOLPHIN)
        assert len(svg) > 0
        assert svg.viewbox.wh.x > 0
        assert svg.total_length() > 10


class TestPrimitives:
    def test_rect_to_path(self):
        r = SVGRectangle(Point(1, 2), Point(3, 4))
        g = r.to_path()
        assert len(g.path.path_commands) == 4
        assert g.path.closed
        pts = g.path.to_points()
        np.testing.assert_allclose(pts[0], [1, 2])

    def test_circle_to_path_approximates_circle(self):
        c = SVGCircle(Point(10, 10), Radius(5.0))
        g = c.to_path()
        path = g.path.simplify_arcs()
        pts = path.sample_points(max_dist=0.1)
        radii = np.linalg.norm(pts - np.array([10, 10]), axis=-1)
        np.testing.assert_allclose(radii, 5.0, atol=0.05)


class TestArcToBezier:
    def test_arc_bezier_accuracy(self):
        arc = SVGCommandArc(
            Point(5, 0), Radius(5.0), Angle(0), Flag(0), Flag(1), Point(-5, 0)
        )
        beziers = arc.to_beziers()
        assert len(beziers) >= 2
        for b in beziers:
            pts = b.sample_points(n=20, return_array=True)
            radii = np.linalg.norm(pts, axis=-1)
            np.testing.assert_allclose(radii, 5.0, atol=0.02)

    def test_arc_reverse(self):
        arc = SVGCommandArc(
            Point(5, 0), Radius(5.0), Angle(0), Flag(0), Flag(1), Point(-5, 0)
        )
        rev = arc.reverse()
        assert rev.start_pos.tolist() == [-5, 0]
        assert rev.sweep_flag.flag == 0


class TestBezier:
    def test_split_preserves_shape(self):
        b = SVGCommandBezier(Point(0, 0), Point(1, 2), Point(3, 2), Point(4, 0))
        n = 4
        pieces = b.split(n)
        # piece i covers t in [i/n, (i+1)/n]: compare parametrically
        for i, piece in enumerate(pieces):
            for tau in np.linspace(0, 1, 7):
                t_global = (i + tau) / n
                np.testing.assert_allclose(
                    piece.eval(tau).pos, b.eval(t_global).pos, atol=1e-9
                )

    def test_length(self):
        line_like = SVGCommandBezier(Point(0, 0), Point(1, 0), Point(2, 0), Point(3, 0))
        np.testing.assert_allclose(line_like.length(), 3.0, atol=1e-6)

    def test_bbox_includes_extrema(self):
        b = SVGCommandBezier(Point(0, 0), Point(0, 2), Point(3, 2), Point(3, 0))
        bb = b.bbox()
        assert bb.xy2.y > 1.0  # curve bulges above endpoints


class TestTransformsAndCanonicalize:
    def test_translate_scale(self):
        g = SVGPath.from_str("M 0 0 L 10 0 L 10 10 Z")
        path = g.path.copy()
        path.translate(Point(5, 5))
        assert path.start_pos.tolist() == [5, 5]
        path.scale(2)
        assert path.start_pos.tolist() == [10, 10]

    def test_shared_points_translated_once(self):
        g = SVGPath.from_str("M 0 0 L 10 0 L 10 10")
        path = g.path
        path.translate(Point(1, 1))
        # middle point shared by both lines must move exactly once
        assert path.path_commands[0].end_pos.tolist() == [11, 1]
        assert path.path_commands[1].start_pos.tolist() == [11, 1]

    def test_canonicalize_pipeline(self):
        svg = SVG.load_svg(DOLPHIN)
        svg.canonicalize(normalize=True)
        assert not svg.empty()
        # all commands are now m/l/c (no arcs), viewbox 24
        t = svg.to_tensor()
        assert set(np.unique(t[:, 0].astype(int))) <= {CMD_M, CMD_L, CMD_C}
        assert svg.viewbox.wh.tolist() == [24, 24]

    def test_numericalize(self):
        svg = SVG.load_svg(DOLPHIN).canonicalize(normalize=True)
        svg.numericalize(256)
        t = svg.to_tensor()
        coords = t[:, 6:]
        coords = coords[coords != -1]
        assert coords.min() >= 0 and coords.max() <= 255
        assert np.allclose(coords, np.round(coords))

    def test_orientation(self):
        cw = SVGPath.from_str("M 0 0 L 10 0 L 10 10 L 0 10 Z").path
        ccw = cw.copy().reverse()
        assert cw.is_clockwise() != ccw.is_clockwise()
        assert ccw.set_orientation(cw.is_clockwise()).is_clockwise() == cw.is_clockwise()


class TestSimplify:
    def test_rdp_collinear(self):
        # many collinear points -> single line
        pts = " L ".join(f"{i} 0" for i in range(1, 20))
        path = SVGPath.from_str(f"M 0 0 L {pts}").path
        path.simplify(epsilon=0.01)
        assert len(path.path_commands) == 1
        assert isinstance(path.path_commands[0], SVGCommandLine)

    def test_rdp_corner_preserved(self):
        path = SVGPath.from_str(
            "M 0 0 " + " ".join(f"L {i} 0" for i in range(1, 6))
            + " " + " ".join(f"L 5 {i}" for i in range(1, 6))
        ).path
        path.simplify(epsilon=0.01)
        assert len(path.path_commands) == 2
        corners = [c.end_pos.tolist() for c in path.path_commands]
        assert corners == [[5, 0], [5, 5]]

    def test_schneider_fit_circle(self):
        """Dense circle polyline -> few cubics within tolerance."""
        t = np.linspace(0, 2 * np.pi, 100)
        d = "M " + " L ".join(f"{10+5*np.cos(a):.4f} {10+5*np.sin(a):.4f}" for a in t)
        path = SVGPath.from_str(d).path
        # make them curves so the fitter path is taken
        path.split(n=1)
        n_before = len(path.path_commands)
        path.simplify(tolerance=0.1, epsilon=0.2, angle_threshold=150, force_smooth=True)
        assert len(path.path_commands) < n_before / 3
        pts = path.sample_points(max_dist=0.1)
        radii = np.linalg.norm(pts - np.array([10, 10]), axis=-1)
        assert np.abs(radii - 5).max() < 0.3

    def test_simplify_heuristic_reference_fixture(self):
        svg = SVG.load_svg(DOLPHIN).canonicalize(normalize=True)
        n_before = svg.total_length()
        simplified = svg.simplify_heuristic()
        assert not simplified.empty()
        # shape preserved: sampled points still within viewbox and close to original
        pts_o = np.concatenate([p.sample_points(0.2) for p in svg.paths])
        pts_s = np.concatenate([p.sample_points(0.2) for p in simplified.paths])
        d = np.array([np.min(np.linalg.norm(pts_s[i] - pts_o, axis=-1))
                      for i in range(0, len(pts_s), 10)])
        assert d.max() < 1.0


class TestTensorBridge:
    def test_round_trip(self):
        g = SVGPath.from_str("M 1 2 L 5 2 C 6 3 7 4 8 2")
        t = g.path.to_tensor()
        assert t.shape == (3, 14)  # moveto + line + cubic
        restored = SVGPath.from_tensor(t)
        assert restored.path.start_pos.tolist() == [1, 2]
        assert restored.path.path_commands[0].end_pos.tolist() == [5, 2]
        assert isinstance(restored.path.path_commands[1], SVGCommandBezier)

    def test_svg_from_tensor(self):
        svg = SVG.load_svg(DOLPHIN).canonicalize(normalize=True)
        t = svg.to_tensor()
        restored = SVG.from_tensor(t)
        assert not restored.empty()
        np.testing.assert_allclose(restored.to_tensor(), t, atol=1e-4)


class TestRendering:
    def test_render_not_blank(self):
        svg = SVG.load_svg(DOLPHIN).canonicalize(normalize=True)
        img = svg.render(width=100)
        arr = np.asarray(img)
        assert arr.shape == (100, 100, 3)
        assert arr.std() > 1.0  # not a blank canvas

    def test_save_png(self, tmp_path):
        svg = SVG.unit_circle()
        f = str(tmp_path / "circle.png")
        svg.save_png(f)
        from PIL import Image

        assert Image.open(f).size[0] > 0

    def test_animate_gif(self, tmp_path):
        svg = SVG.unit_square().normalize()
        f = str(tmp_path / "anim.gif")
        frames = svg.animate(file_path=f)
        assert len(frames) > 2
        import os

        assert os.path.getsize(f) > 0


class TestFilling:
    def test_compute_filling_nested(self):
        """Outer square + inner square -> inner becomes ERASE (depth parity)."""
        from deepsvg_tpu.svglib.svg_path import Filling

        outer = SVGPath.from_str("M 0 0 L 20 0 L 20 20 L 0 20 Z", add_closing=True).path
        inner = SVGPath.from_str("M 5 5 L 15 5 L 15 15 L 5 15 Z", add_closing=True).path
        inner.reverse()  # opposite orientation
        from deepsvg_tpu.svglib.svg_primitive import SVGPathGroup

        group = SVGPathGroup([outer, inner], fill=True)
        group.compute_filling()
        assert outer.filling == Filling.FILL
        assert inner.filling == Filling.ERASE

    def test_overlap_graph(self):
        from deepsvg_tpu.svglib.svg_primitive import SVGPathGroup

        outer = SVGPath.from_str("M 0 0 L 20 0 L 20 20 L 0 20 Z", add_closing=True).path
        inner = SVGPath.from_str("M 5 5 L 15 5 L 15 15 L 5 15 Z", add_closing=True).path
        far = SVGPath.from_str("M 100 100 L 110 100 L 110 110 Z", add_closing=True).path
        group = SVGPathGroup([outer, inner, far], fill=True)
        G = group.overlap_graph()
        assert G.has_edge(0, 1)      # inner contained in outer
        assert not G.has_edge(0, 2)  # far not contained


class TestGrid:
    def test_make_grid(self):
        from deepsvg_tpu.svglib.utils import make_grid

        svgs = [SVG.unit_circle().normalize() for _ in range(4)]
        grid = make_grid(svgs, num_cols=2)
        assert grid.viewbox.wh.tolist() == [48, 48]
        assert len(grid) == 4


class TestSmoothing:
    def test_smooth_interpolates_knots(self):
        """Thomas-algorithm smoothing keeps knots and produces cubics."""
        path = SVGPath.from_str(
            "M 0 0 L 5 8 L 10 0 L 15 8 L 20 0"
        ).path
        knots_before = [c.end_pos.tolist() for c in path.path_commands]
        path.smooth()
        assert all(isinstance(c, SVGCommandBezier) for c in path.path_commands)
        knots_after = [c.end_pos.tolist() for c in path.path_commands]
        assert knots_after == knots_before
        # tangent continuity at interior knots: out-handle mirrors in-handle
        for c1, c2 in zip(path.path_commands[:-1], path.path_commands[1:]):
            t1 = (c1.end_pos - c1.control2).normalize()
            t2 = (c2.control1 - c2.start_pos).normalize()
            assert t1.dot(t2) > 0.99

    def test_filter_duplicates(self):
        path = SVGPath.from_str(
            "M 0 0 L 0.05 0 L 0.1 0 L 5 0 L 5.05 0 L 10 0"
        ).path
        n_before = len(path.path_commands)
        path.filter_duplicates(min_dist=0.2)
        assert len(path.path_commands) < n_before

    def test_duplicate_extremities(self):
        path = SVGPath.from_str("M 0 0 L 5 5").path
        path.duplicate_extremities()
        assert len(path.path_commands) == 3
        assert path.path_commands[0].start_pos.isclose(path.path_commands[0].end_pos)


class TestSplineSet:
    def test_load_splineset(self):
        spline = (
            "Foo: Bar\nSplineSet\n"
            "100 200 m 0\n"
            " 300 200 l 1\n"
            " 250 100 250 80 100 200 c 1\n"
            "EndSplineSet\n"
        )
        svg = SVG.load_splineset(spline, width=400, height=400)
        assert not svg.empty()
        path = svg[0].path
        # y-flip applied: 200 -> 200 (400 - 200)
        assert path.start_pos.tolist() == [100.0, 200.0]
        assert isinstance(path.path_commands[-1], SVGCommandBezier)


class TestDocumentOps:
    def test_to_points_sorted_unique(self):
        svg = SVG.load_svg(DOLPHIN).canonicalize(normalize=True)
        pts = svg.to_points(sort=True)
        assert pts.ndim == 2 and pts.shape[1] == 2
        # lexicographically sorted by (y, x)
        keys = pts[:, 1] * 1e6 + pts[:, 0]
        assert (np.diff(keys) > 0).all()

    def test_group_overlapping_paths(self):
        outer = SVGPath.from_str("M 0 0 L 20 0 L 20 20 L 0 20 Z", add_closing=True)
        inner = SVGPath.from_str("M 5 5 L 15 5 L 15 15 L 5 15 Z", add_closing=True)
        outer.path.set_filling(True)   # FILL
        inner.path.set_filling(False)  # ERASE
        svg = SVG([outer, inner], viewbox=Bbox(24))
        grouped = svg.group_overlapping_paths()
        # the erase hole is folded into the fill path's group
        assert len(grouped) == 1
        assert len(grouped[0].svg_paths) == 2

    def test_add_path_group_chains_origin(self):
        svg = SVG([], viewbox=Bbox(24))
        g1 = SVGPath.from_str("M 1 1 L 2 2")
        g2 = SVGPath.from_str("M 5 5 L 6 6")
        svg.add_path_group(g1)
        svg.add_path_group(g2)
        assert len(svg) == 2
        assert g2.origin.isclose(g1.end_pos)

    def test_unit_shapes(self):
        c = SVG.unit_circle()
        s = SVG.unit_square()
        assert c.viewbox.wh.tolist() == [1, 1]
        pts = c[0].path.sample_points(max_dist=0.01)
        radii = np.linalg.norm(pts - 0.5, axis=-1)
        np.testing.assert_allclose(radii, 0.5, atol=0.01)
        assert s.total_length() > 0
