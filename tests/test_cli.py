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
