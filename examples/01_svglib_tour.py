"""svglib tour — parity with notebooks/svglib.ipynb.

Parse an SVG, canonicalize/simplify it, apply transforms, rasterize, and
export an animation, using only deepsvg_tpu.
"""
import os
import sys

try:
    import deepsvg_tpu  # noqa: F401  (installed via `pip install -e .`)
except ImportError:  # running from a source checkout without installing
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepsvg_tpu.svglib import SVG, Angle, Point
from deepsvg_tpu.svglib.utils import make_grid

OUT = os.path.join(os.path.dirname(__file__), "out")
DOLPHIN = "/root/reference/docs/imgs/dolphin.svg"


def main():
    os.makedirs(OUT, exist_ok=True)

    svg = SVG.load_svg(DOLPHIN)
    print("loaded:", len(svg), "path groups,", svg.total_length(), "commands")

    svg.canonicalize(normalize=True)
    print("canonicalized:", svg.total_length(), "commands (m/l/c only)")

    simplified = svg.simplify_heuristic()
    print("simplified:", simplified.total_length(), "commands")

    # transforms
    rotated = simplified.copy().rotate(Angle(30))
    translated = simplified.copy().translate(Point(3, 3))

    grid = make_grid([svg, simplified, rotated, translated], num_cols=2)
    grid.save_png(os.path.join(OUT, "svglib_tour.png"))
    print("wrote", os.path.join(OUT, "svglib_tour.png"))

    # quantize to the model grid and round trip through the tensor format
    simplified.numericalize(256)
    tensor = simplified.to_tensor()
    print("tensor:", tensor.shape)
    restored = SVG.from_tensor(tensor)
    restored.save_png(os.path.join(OUT, "svglib_restored.png"))

    # progressive-draw animation
    simplified.copy().normalize().animate(
        file_path=os.path.join(OUT, "svglib_anim.gif")
    )
    print("wrote", os.path.join(OUT, "svglib_anim.gif"))


if __name__ == "__main__":
    main()
