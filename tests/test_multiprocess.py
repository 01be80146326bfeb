"""True multi-PROCESS distribution: 2 jax.distributed processes on CPU
render the demo scene sharded over a global mesh and must bit-match the
single-process render (VERDICT r2 missing #6 — the in-repo 8-device
tests exercise multi-DEVICE sharding; this exercises the
jax.distributed.initialize() + global-mesh + allgather path of
nexus_tpu/dist/launch.py)."""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys, json
    import numpy as np
    sys.path.insert(0, {repo!r})
    # Force CPU BEFORE jax init (the session env pins the axon TPU).
    import jax
    jax.config.update("jax_platforms", "cpu")
    from nexus_tpu.dist import launch
    launch.initialize({coord!r}, 2, int(sys.argv[1]), local_devices=2)
    assert jax.device_count() == 4, jax.devices()
    assert jax.process_count() == 2

    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.scenes import glass_scene
    scene = glass_scene(24, 24)
    settings = RenderSettings(width=24, height=24, path_length=3)
    img = launch.render_multihost(scene, settings, n_samples=2)
    np.save({out!r} + sys.argv[1] + ".npy", img)
    print("proc", sys.argv[1], "done", float(img.mean()))
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_render_matches_single(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    out = str(tmp_path / "img")
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=_REPO, coord=coord, out=out))

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]

    img0 = np.load(out + "0.npy")
    img1 = np.load(out + "1.npy")
    # Every process allgathers the same full image.
    np.testing.assert_array_equal(img0, img1)

    # And it matches the single-process sharded render bit-exactly
    # (counter-based RNG keyed on (pixel, sample) -> shard-invariant).
    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.dist import sharding as dist
    from nexus_tpu.scenes import glass_scene

    scene = glass_scene(24, 24)
    settings = RenderSettings(width=24, height=24, path_length=3)
    ref = np.asarray(dist.render_sharded(scene, settings, 2))
    np.testing.assert_allclose(img0, ref, rtol=0, atol=0)
