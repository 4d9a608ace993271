"""GUI-compatible API surface (reference: deepsvg/gui/).

The reference ships a Kivy-based vector-animation editor; its entire
model-facing surface is ``gui/interpolate.py`` (encode_svg / decode /
interpolate_svg / finetune_model / compute_interpolation) plus the project
state (``gui/state/project.py``) and freehand digitization (``gui/utils.py``).
Kivy is display chrome over those functions and is not available in this
environment; this module re-exports the complete headless equivalents so a
reference user finds everything under the familiar entry point:

    from deepsvg_tpu import gui
    session = gui.load_session("configs_tpu.hierarchical_ordered", weights)
    z = gui.encode_svg(session, svg)
    frames = gui.interpolate_svg(session, svg1, svg2, n=10)
    gui.compute_interpolation(session, project, cfg=cfg)

A display layer (Kivy or otherwise) can be built on these primitives
unchanged — see ``examples/05_animation_project.py`` for the headless flow.
"""
from __future__ import annotations

from .animate import (
    DeepSVGProject,
    Frame,
    LoopMode,
    compute_interpolation,
    finetune_model,
    preprocess_svg_path,
)
from .inference import InferenceSession, easein_easeout, load_session


def encode_svg(session: InferenceSession, svg):
    """SVG -> latent (reference gui/interpolate.py:37-42)."""
    return session.encode_svg(svg)


def decode(session: InferenceSession, z, **kwargs):
    """Latent -> SVG (reference gui/interpolate.py:30-34)."""
    return session.decode_one(z, **kwargs)


def interpolate_svg(session: InferenceSession, svg1, svg2, n: int = 10,
                    ease: bool = True):
    """Latent-interpolated in-betweens (reference gui/interpolate.py:45-55)."""
    return session.interpolate_svg(svg1, svg2, n=n, ease=ease)


__all__ = [
    "DeepSVGProject", "Frame", "LoopMode", "InferenceSession",
    "compute_interpolation", "decode", "easein_easeout", "encode_svg",
    "finetune_model", "interpolate_svg", "load_session", "preprocess_svg_path",
]
