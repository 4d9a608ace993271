"""Browser-based front-end for the vector-animation editor.

The reference's editor is a Kivy desktop app (deepsvg/gui/main.py); its
interaction state machine is re-implemented headlessly in
``deepsvg_tpu.editor``. This package is the display chrome over that core:
a zero-dependency HTTP server (stdlib ``http.server``) exposing the editor
as a JSON API, plus a canvas UI (static HTML/JS) that binds pointer events
to it 1:1 — pen/pencil/move tools, Bézier control-point editing, timeline
with keyframes, ease-paced playback, model interpolation and GIF export.

Run::

    python -m deepsvg_tpu.webgui [--port 8640] [--project file.dsvg]
        [--config configs_tpu.hierarchical_ordered --weights ckpt]

and open http://localhost:8640/.
"""
from .server import EditorAPI, make_server, run

__all__ = ["EditorAPI", "make_server", "run"]
