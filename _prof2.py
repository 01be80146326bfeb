import time
import numpy as np
import jax
import jax.numpy as jnp

from nexus_tpu.core.config import RenderSettings
from nexus_tpu.io.loader import add_model
from nexus_tpu.scene.scene import SceneBuilder
from nexus_tpu.render.megakernel import render_pixels as mega_render
from nexus_tpu.render.wavefront import render_pixels as wave_render

W = H = 256
b = SceneBuilder()
add_model(b, "/root/reference/Nexus/assets/demo_scenes/cornell_box_sphere/cornell_box_sphere.glb")
b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
             hfov_deg=50.0, width=W, height=H)
scene = b.build()
n = W * H
pix = jnp.arange(n, dtype=jnp.int32)


def bench(label, f, *args, iters=5):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.2f} ms")
    return dt


for pl_ in (1, 2, 4):
    S = RenderSettings(width=W, height=H, path_length=pl_)
    f = jax.jit(lambda s, p, i, S=S: wave_render(s, S, p, i))
    bench(f"wavefront bounces={pl_} mis=on", f, scene, pix, jnp.uint32(0))

for pl_ in (1, 4):
    S = RenderSettings(width=W, height=H, path_length=pl_, use_mis=False)
    f = jax.jit(lambda s, p, i, S=S: wave_render(s, S, p, i))
    bench(f"wavefront bounces={pl_} mis=OFF", f, scene, pix, jnp.uint32(0))
