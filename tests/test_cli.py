"""CLI renderer smoke test: render → PNG+metrics, checkpoint → resume
is bit-identical to an unbroken render (the RNG is keyed on
(pixel, sample), so accumulation state + counter fully determine the
remainder — SURVEY.md §5.4)."""

import json

import numpy as np

from nexus_tpu.apps.render import main

GLB = ("/root/reference/Nexus/assets/demo_scenes/cornell_box/"
       "cornell_box.glb")


def test_render_resume_bitexact(tmp_path):
    out = tmp_path / "a.png"
    ck = tmp_path / "state.npz"
    metrics = tmp_path / "m.json"
    base = [GLB, "--width", "24", "--height", "24", "--bounces", "2",
            "--camera-pos", "0", "1", "3.4", "--camera-lookat", "0", "1",
            "0"]

    # 2 spp, checkpointed.
    assert main(base + ["--out", str(out), "--spp", "2",
                        "--checkpoint", str(ck),
                        "--metrics", str(metrics)]) == 0
    assert out.exists()
    m = json.loads(metrics.read_text())
    assert m["rays_per_sample"] > 0 and m["n_lights"] == 1

    # Resume to 4 spp.
    assert main(base + ["--out", str(out), "--spp", "4",
                        "--checkpoint", str(ck), "--resume"]) == 0
    resumed = np.load(ck)["acc"]

    # One-shot 4 spp.
    ck2 = tmp_path / "state2.npz"
    assert main(base + ["--out", str(out), "--spp", "4",
                        "--checkpoint", str(ck2)]) == 0
    oneshot = np.load(ck2)["acc"]
    np.testing.assert_allclose(resumed, oneshot, rtol=1e-6, atol=1e-7)


def test_query_pixel(capsys):
    """--query prints hit info and exits without rendering
    (Renderer.cpp:131-142 click-to-pick analog)."""
    assert main([GLB, "--width", "32", "--height", "32",
                 "--camera-pos", "0", "1", "3.4",
                 "--camera-lookat", "0", "1", "0",
                 "--query", "16", "2"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["hit"] is True
    # Top image rows look at the ceiling (y = 2).
    assert info["position"][1] > 1.9
    assert info["instance"] == 0 and info["material"] >= 0

    assert main([GLB, "--width", "32", "--height", "32",
                 "--camera-pos", "0", "1", "3.4",
                 "--camera-lookat", "0", "1", "0",
                 "--query", "16", "30"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["hit"] is False          # exits through the open front


def test_progressive_updates_png(tmp_path, capsys):
    out = tmp_path / "p.png"
    assert main([GLB, "--width", "16", "--height", "16", "--bounces", "2",
                 "--camera-pos", "0", "1", "3.4",
                 "--camera-lookat", "0", "1", "0",
                 "--out", str(out), "--spp", "4",
                 "--progressive", "2"]) == 0
    assert out.exists()
    logs = capsys.readouterr().out
    assert "[2/4 spp]" in logs and "[4/4 spp]" in logs


def test_viewer_serves_png(tmp_path):
    """The live viewer serves the page and the current PNG."""
    import threading
    import urllib.request

    from nexus_tpu.apps import viewer

    png = tmp_path / "r.png"
    png.write_bytes(b"\x89PNG\r\n\x1a\nfakepng")
    srv = viewer.make_server(png, port=0)
    port = srv.server_port
    t = threading.Thread(target=srv.handle_request)
    t.start()
    page = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/", timeout=10).read()
    t.join(timeout=10)
    assert b"nexus_tpu live render" in page
    t = threading.Thread(target=srv.handle_request)
    t.start()
    img = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/image?t=1", timeout=10).read()
    t.join(timeout=10)
    srv.server_close()
    assert img.startswith(b"\x89PNG")
