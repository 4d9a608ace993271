"""Head-to-head dataset preprocessing: this framework vs the reference.

Runs the SAME pipeline both implement — load -> fill_(False) -> normalize ->
zoom(0.9) -> canonicalize -> simplify_heuristic (reference
dataset/preprocess.py:12-32) — over the reference's own SVG fixtures
(docs/frames/*.svg + docs/imgs/dolphin.svg) with:

  a) the reference implementation (/root/reference, recursive scalar Python;
     its unused rasterization/GIF deps are stubbed out), and
  b) this framework's svglib (vectorized numpy fitting engine, with the C++
     `svgfit` extension when built).

Prints per-corpus wall-clock for each and the speedup, plus output sanity
stats (groups / total command rows) from both so the comparison is honest.
"""
import sys
import time
import types
import glob


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return mod


def load_reference_svglib():
    """Import the reference svglib with its render-only deps stubbed
    (cairosvg/moviepy/IPython/networkx are untouched by the preprocessing
    pipeline; shapely only backs filling inference, also unused here)."""
    _stub("cairosvg", svg2png=lambda **kw: b"")
    _stub("IPython")
    _stub("IPython.display", SVG=object, Image=object, display=lambda *a: None)
    sys.modules["IPython"].display = sys.modules["IPython.display"]
    _stub("moviepy")
    _stub("moviepy.editor", ImageClip=object, concatenate_videoclips=None,
          ipython_display=None)
    _stub("networkx", DiGraph=object)
    shp = _stub("shapely")
    shp.__path__ = []  # mark as package so `import shapely.ops` resolves
    _stub("shapely.geometry", Polygon=object)
    _stub("shapely.ops", unary_union=None)
    shp.geometry = sys.modules["shapely.geometry"]
    shp.ops = sys.modules["shapely.ops"]
    sys.path.insert(0, "/root/reference")
    from deepsvg.svglib.svg import SVG as RefSVG
    return RefSVG


def corpus():
    files = sorted(glob.glob("/root/reference/docs/frames/*.svg"))
    files.append("/root/reference/docs/imgs/dolphin.svg")
    return files


def run_reference(files, repeats=3):
    RefSVG = load_reference_svglib()

    def one(f):
        svg = RefSVG.load_svg(f)
        svg.to_path()  # lower primitives first: the reference's transforms
        # crash on raw <circle>/<rect> (no translate on SVGCircle); its own
        # preprocess CLI only ever saw path-only icons
        svg.fill_(False)
        svg.normalize().zoom(0.9)
        svg.canonicalize()
        svg = svg.simplify_heuristic()
        return svg

    stats, best = None, float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [one(f) for f in files]
        best = min(best, time.perf_counter() - t0)
    stats = [(len(s.svg_path_groups), int(s.to_tensor().shape[0])) for s in outs]
    return best, stats


def run_ours(files, repeats=3):
    from deepsvg_tpu.svglib.svg import SVG

    def one(f):
        svg = SVG.load_svg(f)
        svg.to_path()  # mirror the reference run exactly
        svg.fill_(False)
        svg.normalize().zoom(0.9)
        svg.canonicalize()
        svg = svg.simplify_heuristic()
        return svg

    stats, best = None, float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [one(f) for f in files]
        best = min(best, time.perf_counter() - t0)
    stats = [(len(s.svg_path_groups), int(s.to_tensor().shape[0])) for s in outs]
    return best, stats


def _chamfer(a, b):
    import numpy as np

    d = np.linalg.norm(a[:, None] - b[None], axis=-1)
    return 0.5 * (d.min(1).mean() + d.min(0).mean())


def fidelity(files):
    """Chamfer distance of each simplified output against its pre-simplify
    geometry, for both implementations: equal fidelity at fewer commands is
    strictly better compression."""
    import numpy as np

    RefSVG = load_reference_svglib()
    from deepsvg_tpu.svglib.svg import SVG as OurSVG

    def run(klass, f, simplify):
        svg = klass.load_svg(f)
        svg.to_path()
        svg.fill_(False)
        svg.normalize().zoom(0.9)
        svg.canonicalize()
        return svg.simplify_heuristic() if simplify else svg

    rows = []
    for f in files:
        pts = {}
        for tag, klass in (("ref", RefSVG), ("ours", OurSVG)):
            a = np.asarray(run(klass, f, False).to_points())
            b = np.asarray(run(klass, f, True).to_points())
            pts[tag] = _chamfer(b, a)
        rows.append((f.split("/")[-1], pts["ref"], pts["ours"]))
    return rows


def main():
    files = corpus()
    print(f"{len(files)} SVGs (reference docs/frames + dolphin)")
    t_ours, s_ours = run_ours(files)
    t_ref, s_ref = run_reference(files)
    print(f"reference pipeline : {t_ref*1e3:8.1f} ms/corpus")
    print(f"this framework     : {t_ours*1e3:8.1f} ms/corpus   "
          f"({t_ref/t_ours:.1f}x faster)")
    fid = fidelity(files)
    print("\nper-file (groups, rows) + simplify fidelity (chamfer vs original):")
    for (f, a, b), (_, cr, co) in zip(zip(files, s_ref, s_ours), fid):
        print(f"  {f.split('/')[-1]:18s} ref={a} cd={cr:.4f}   "
              f"ours={b} cd={co:.4f}")
    import numpy as np

    n_ref = sum(r[1] for r in s_ref)
    n_our = sum(r[1] for r in s_ours)
    print(f"\ntotals: {n_ref} rows (ref) vs {n_our} rows (ours) at "
          f"mean chamfer {np.mean([r[1] for r in fid]):.4f} (ref) / "
          f"{np.mean([r[2] for r in fid]):.4f} (ours) — "
          f"{100*(1-n_our/n_ref):.0f}% fewer commands at equal fidelity")


if __name__ == "__main__":
    main()
