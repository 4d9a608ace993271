"""Web editor front-end (deepsvg_tpu/webgui/) — the display chrome over the
headless editor core, exercised end-to-end through real HTTP.

The reference's equivalent surface is the Kivy app shell
(deepsvg/gui/main.py: window, toolbar, canvas touch handlers, timeline
strip); here every widget action is an HTTP call against a live
ThreadingHTTPServer on an ephemeral port."""
import json
import math
import threading
import urllib.request

import pytest

from deepsvg_tpu.webgui import make_server


@pytest.fixture()
def server():
    srv = make_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    def call(route, body=None, method="POST"):
        if body is None and method == "POST":
            body = {}
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            f"{base}{route}", data=data, method=method,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as res:
                return res.status, json.loads(res.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    call.base = base
    yield call
    srv.shutdown()
    srv.server_close()


def circle(cx=128, cy=128, r=60, n=40):
    return [[cx + r * math.cos(2 * math.pi * t / n),
             cy + r * math.sin(2 * math.pi * t / n)] for t in range(n + 1)]


def test_index_and_static_served(server):
    for path, ctype, marker in [
        ("/", "text/html", b"<canvas"),
        ("/static/app.js", "text/javascript", b"/api/"),
        ("/static/style.css", "text/css", b"#canvas"),
    ]:
        with urllib.request.urlopen(server.base + path) as res:
            assert res.status == 200
            assert res.headers["Content-Type"] == ctype
            assert marker in res.read()
    # path traversal out of static/ is refused
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(server.base + "/../server.py")


def test_state_snapshot_shape(server):
    code, state = server("/api/state", method="GET", body=None)
    assert code == 200
    assert state["timeline"]["frames"] == [False]
    assert state["paths"] == []
    assert state["tool"] == 0


def test_pencil_stroke_digitizes_over_http(server):
    server("/api/tool", {"tool": 2})
    pts = circle()
    server("/api/pointer", {"type": "down", "pos": pts[0]})
    for p in pts[1:]:
        server("/api/pointer", {"type": "move", "pos": p})
    code, res = server("/api/pointer", {"type": "up"})
    assert code == 200
    st = res["state"]
    assert len(st["paths"]) == 1
    segs = st["paths"][0]["segments"]
    # smooth-fit digitization: far fewer segments than input samples
    assert 1 <= len(segs) < len(pts)
    assert st["paths"][0]["selected"]
    # digitizing marks the frame as a keyframe (editor._add_digitized)
    assert st["timeline"]["frames"][0] is True


def test_pen_flow_and_control_point_drag(server):
    server("/api/tool", {"tool": 1})
    server("/api/pointer", {"type": "down", "pos": [50, 50]})
    server("/api/pointer", {"type": "up"})
    server("/api/pointer", {"type": "down", "pos": [150, 50]})
    server("/api/pointer", {"type": "drag", "pos": [150, 120]})
    server("/api/pointer", {"type": "up"})
    code, res = server("/api/pen/finish")
    assert code == 200
    assert len(res["state"]["paths"]) == 1

    # switch to MOVE and drag a control point of the digitized path
    server("/api/tool", {"tool": 0})
    _, res = server("/api/state", method="GET", body=None)
    seg0 = res["paths"][0]["segments"][0]
    anchor = seg0["p1"]
    server("/api/pointer", {"type": "down", "pos": anchor})
    target = [anchor[0] + 2, anchor[1] + 2]
    server("/api/pointer", {"type": "move", "pos": target})
    _, res = server("/api/pointer", {"type": "up"})
    moved = res["state"]["paths"][0]["segments"][0]["p1"]
    assert moved == pytest.approx(target)


def test_timeline_keyframes_and_playback(server):
    server("/api/frame/add", {})
    server("/api/frame/add", {})
    _, res = server("/api/frame/keyframe", {"value": True})
    st = res["state"]
    assert st["timeline"]["selected"] == 2
    assert st["timeline"]["frames"] == [False, False, True]

    server("/api/frame/select", {"index": 0})
    server("/api/playback", {"loop_mode": 2, "playback_mode": 1, "delay": 0.05})
    seen = []
    for _ in range(6):
        code, res = server("/api/play/next")
        assert code == 200
        assert res["delay"] > 0
        seen.append(res["index"])
    # 3 frames, ping-pong from 0: 1 2 1 0 1 2
    assert seen == [1, 2, 1, 0, 1, 2]


def test_copy_paste_layers(server):
    server("/api/tool", {"tool": 2})
    pts = circle(r=40)
    server("/api/pointer", {"type": "down", "pos": pts[0]})
    for p in pts[1:]:
        server("/api/pointer", {"type": "move", "pos": p})
    server("/api/pointer", {"type": "up"})
    server("/api/path/copy")
    _, res = server("/api/path/paste")
    st = res["state"]
    assert len(st["paths"]) == 2
    assert st["paths"][1]["selected"] and not st["paths"][0]["selected"]


def test_save_load_export_roundtrip(server, tmp_path):
    server("/api/tool", {"tool": 2})
    pts = circle(r=50)
    server("/api/pointer", {"type": "down", "pos": pts[0]})
    for p in pts[1:]:
        server("/api/pointer", {"type": "move", "pos": p})
    server("/api/pointer", {"type": "up"})

    code, res = server("/api/project/save", {"dir": str(tmp_path)})
    assert code == 200
    saved = res["saved"]
    assert saved.startswith(str(tmp_path))

    code, res = server("/api/export/gif", {})
    assert code == 200
    assert res["gif"].endswith(".gif")

    # load it back into a fresh editor over the same server
    code, res = server("/api/project/load", {"path": saved})
    assert code == 200
    st = res["state"]
    assert len(st["paths"]) == 1


def test_scripted_session_draw_interpolate_gif_content(tmp_path):
    """One full scripted browser session against a model-backed server —
    draw on frame 0, keyframe a second pose, /api/interpolate, /api/export/gif
    — asserting the RENDERED GIF's content (frame count, dimensions, nonblank
    keyframe pixels), not just route status codes. The reference's equivalent
    flow is the Kivy GUI + gui/interpolate.py:109-126 driven by hand."""
    import jax
    import numpy as np
    from PIL import Image

    from deepsvg_tpu.inference import InferenceSession
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.data.synthetic import generate_batch

    cfg = ModelConfig(encode_stages=2, decode_stages=2, use_vae=False,
                      max_num_groups=4, max_seq_len=12, d_model=32,
                      dim_feedforward=64, dim_z=16, n_layers=1,
                      n_layers_decode=1, n_heads=4, dropout=0.0)
    model = SVGTransformer(cfg)
    b = generate_batch(np.random.default_rng(0), 2, cfg.max_num_groups,
                       cfg.max_seq_len)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           b["commands"], b["args"],
                           b["commands"], b["args"])
    session = InferenceSession(model, variables)

    srv = make_server(port=0, session=session)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    def call(route, body=None, method="POST"):
        data = json.dumps(body if body is not None else {}).encode()
        req = urllib.request.Request(
            f"{base}{route}", data=data if method == "POST" else None,
            method=method, headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as res:
            return res.status, json.loads(res.read())

    try:
        # frame 0: pencil-draw a circle (digitize -> keyframe)
        call("/api/tool", {"tool": 2})
        pts = circle(r=60)
        call("/api/pointer", {"type": "down", "pos": pts[0]})
        for p in pts[1:]:
            call("/api/pointer", {"type": "move", "pos": p})
        call("/api/pointer", {"type": "up"})

        # two more frames; draw a second pose on the last (auto-keyframe)
        call("/api/frame/add")
        call("/api/frame/add")
        pts2 = circle(cx=160, cy=100, r=35)
        call("/api/pointer", {"type": "down", "pos": pts2[0]})
        for p in pts2[1:]:
            call("/api/pointer", {"type": "move", "pos": p})
        code, res = call("/api/pointer", {"type": "up"})
        assert res["state"]["timeline"]["frames"] == [True, False, True]

        code, res = call("/api/interpolate")
        assert code == 200, res

        gif = str(tmp_path / "session.gif")
        code, res = call("/api/export/gif", {"path": gif})
        assert code == 200 and res["gif"] == gif
    finally:
        srv.shutdown()
        srv.server_close()

    with Image.open(gif) as im:
        assert im.n_frames == 3
        w, h = im.size
        assert w == 200 and 20 <= h <= 400
        mins, means = [], []
        for i in range(im.n_frames):
            im.seek(i)
            l = np.asarray(im.convert("L"), dtype=np.float64)
            mins.append(l.min())
            means.append(l.mean())
        # keyframes carry drawn strokes: dark pixels on a light background
        assert mins[0] < 128 and mins[2] < 128, mins
        assert means[0] > 128 and means[2] > 128, means


def test_interpolate_without_session_is_a_clean_400(server):
    code, res = server("/api/interpolate")
    assert code == 400
    assert "session" in res["error"]


def test_unknown_route_404(server):
    code, res = server("/api/nope")
    assert code == 404


def test_client_bindings_consistent():
    """Static cross-check of the JS client against the server and the page
    (no JS engine in this environment): every DOM id the client looks up
    exists in index.html, and every API route it calls is handled."""
    import re
    from deepsvg_tpu.webgui.server import STATIC_DIR

    js = (STATIC_DIR / "app.js").read_text()
    html = (STATIC_DIR / "index.html").read_text()
    server_py = (STATIC_DIR.parent / "server.py").read_text()

    for dom_id in set(re.findall(r"getElementById\(\"([\w-]+)\"\)", js)):
        assert f'id="{dom_id}"' in html, f"app.js references missing #{dom_id}"

    handled = set(re.findall(r'route == "([\w/]+)"', server_py))
    handled |= {"state"}
    for route in set(re.findall(r'api\("([\w/]+)"', js)):
        assert route in handled, f"app.js calls unhandled /api/{route}"
