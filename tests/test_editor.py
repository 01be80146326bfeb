"""Editor app drive: panels + edit endpoints end-to-end (headless).

Starts the real HTTP server with the demo scene at tiny resolution and
exercises every endpoint the browser page uses: state snapshot, live
image, instance TRS+material edit (incl. Euler rotation), camera move,
material property edit, and render-settings change. The render loop
runs for real on the CPU backend — responses reflect the functionally
edited scene (SceneHierarchyPanel/MetricsPanel parity surface,
SceneHierarchyPanel.cpp:117-212, MetricsPanel.cpp:62-85).
"""

import json
import threading
import time
import urllib.error
import urllib.request

import pytest

PORT = 8977


@pytest.fixture(scope="module")
def server(request):
    from nexus_tpu.apps import editor

    th = threading.Thread(
        target=lambda: editor.main(
            ["--cpu", "--res", "24", "--bounces", "2",
             "--port", str(PORT), "--batch", "1"]),
        daemon=True)
    th.start()
    base = f"http://localhost:{PORT}"

    def _shutdown():
        # Clean /quit stops the render loop outside a jax call; a
        # daemon thread killed mid-dispatch at interpreter exit
        # aborts the process ("terminate called ...").
        try:
            urllib.request.urlopen(urllib.request.Request(
                base + "/quit", method="POST"), timeout=10)
            th.join(timeout=60)
        except Exception:
            pass

    request.addfinalizer(_shutdown)
    deadline = time.time() + 120
    last = None
    while time.time() < deadline:
        try:
            st = json.loads(urllib.request.urlopen(
                base + "/state", timeout=10).read())
            if st["samples"] > 0:
                return base
            last = st
        except Exception as e:
            last = e
        time.sleep(1)
    pytest.fail(f"editor never produced a sample: {last}")


def _post(base, path):
    req = urllib.request.Request(base + path, method="POST")
    return json.loads(urllib.request.urlopen(req, timeout=60).read())


def test_state_and_image(server):
    st = json.loads(urllib.request.urlopen(server + "/state",
                                           timeout=10).read())
    assert st["instances"] and st["material_props"]
    assert {"pos", "look", "fov"} <= set(st["camera"])
    assert {"bounces", "mis", "bg"} <= set(st["settings"])
    png = urllib.request.urlopen(server + "/image?t=1", timeout=10).read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_edit_endpoints(server):
    assert _post(server, "/edit?inst=0&tx=-1.2&ty=0.3&tz=0&s=1.1"
                         "&rx=10&ry=45&rz=0&mat=2")["ok"]
    assert _post(server, "/edit_camera?px=0&py=2&pz=6&lx=0&ly=0&lz=0"
                         "&fov=48")["ok"]
    assert _post(server, "/edit_material?mat=2&al0=0.1&al1=0.7&al2=0.2"
                         "&ro=0.5&io=1.4&em0=0&em1=0&em2=0&inten=0"
                         "&op=1")["ok"]
    assert _post(server, "/edit_settings?bounces=3&mis=1&bg=1.25")["ok"]
    st = json.loads(urllib.request.urlopen(server + "/state",
                                           timeout=10).read())
    assert st["camera"]["fov"] == 48.0
    assert st["settings"]["bounces"] == 3
    assert st["material_props"][2]["albedo"] == [0.1, 0.7, 0.2]
    assert st["instances"][0]["r"] == [10.0, 45.0, 0.0]
    # a bad edit surfaces an error, not a 500 crash
    req = urllib.request.Request(
        server + "/edit_material?mat=999&al0=0&al1=0&al2=0&ro=0&io=1"
                 "&em0=0&em1=0&em2=0&inten=0&op=1", method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_camera_defocus_and_screenshot(server, tmp_path):
    """Defocus/focus camera fields (MetricsPanel.cpp:62-85) and the
    save-screenshot endpoint (Renderer.cpp:183-215)."""
    import os

    assert _post(server, "/edit_camera?px=0&py=2&pz=6&lx=0&ly=0&lz=0"
                         "&fov=48&defocus=2.5&focus=5.0")["ok"]
    st = json.loads(urllib.request.urlopen(server + "/state",
                                           timeout=10).read())
    assert st["camera"]["defocus"] == 2.5
    assert st["camera"]["focus"] == 5.0

    # wait for a frame under the new camera, then save it
    deadline = time.time() + 90
    while time.time() < deadline:
        s = json.loads(urllib.request.urlopen(server + "/state",
                                              timeout=10).read())
        if s["samples"] > 0:
            break
        time.sleep(1)
    r = _post(server, "/screenshot")
    assert r["ok"] and r["path"].endswith(".png")
    assert os.path.exists(r["path"]) and os.path.getsize(r["path"]) > 100
    os.remove(r["path"])


def test_pick_endpoint(server):
    """Viewport click-to-pick (the reference's pixel query,
    Renderer.cpp:131-142): center pixel of the demo cornell scene hits
    an instance; the response carries instance/material/t."""
    out = json.loads(urllib.request.urlopen(
        server + "/pick?x=12&y=12", timeout=60).read())
    assert out["pixel"] == [12, 12]
    assert out["hit"] is True
    assert out["instance"] >= 0 and out["material"] >= 0
    assert out["t"] > 0
    # Out-of-range pixel surfaces a clean error, not a 500.
    try:
        urllib.request.urlopen(server + "/pick?x=9999&y=0", timeout=30)
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
