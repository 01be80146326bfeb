import time
import numpy as np
import jax
import jax.numpy as jnp

from nexus_tpu.core.config import RenderSettings
from nexus_tpu.io.loader import add_model
from nexus_tpu.scene.scene import SceneBuilder
from nexus_tpu.render.megakernel import render_pixels as mega_render
from nexus_tpu.render.wavefront import render_pixels as wave_render
from nexus_tpu.kernels import trace as ktrace
from nexus_tpu.scene import view

print("backend:", jax.default_backend(), jax.devices())

W = H = 256
b = SceneBuilder()
add_model(b, "/root/reference/Nexus/assets/demo_scenes/cornell_box_sphere/cornell_box_sphere.glb")
b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
             hfov_deg=50.0, width=W, height=H)
scene = b.build()
S = RenderSettings(width=W, height=H, path_length=4)
print("tris:", scene.bvh.v0.shape[0], "blocks:", scene.blocked.n_blocks if scene.blocked is not None else None)

n = W * H
pix = jnp.arange(n, dtype=jnp.int32)

def bench(label, f, *args, iters=10):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.2f} ms")
    return dt

# raw trace kernel on primary rays
from nexus_tpu.core import rng
from nexus_tpu.scene.camera import generate_rays
state = rng.init_state(pix.astype(jnp.uint32), jnp.uint32(0))
us = []
for _ in range(4):
    state, u = rng.rand(state)
    us.append(u)
ray = generate_rays(scene.camera, pix, jnp.stack(us, axis=-1))

ch = jax.jit(lambda o, d: ktrace.closest_hit_blocks(scene.blocked, o, d))
dt = bench("pallas closest_hit 65k rays", ch, ray.origin, ray.direction)
print(f"  -> {n/dt/1e6:.1f} Mrays/s raw kernel")

ah = jax.jit(lambda o, d: ktrace.any_hit_blocks(scene.blocked, o, d, jnp.full((n,), 1.0)))
dt = bench("pallas any_hit 65k rays", ah, ray.origin, ray.direction)
print(f"  -> {n/dt/1e6:.1f} Mrays/s raw anyhit")

vch = jax.jit(lambda o, d: view.closest_hit(scene, o, d))
bench("view.closest_hit (incl refine)", vch, ray.origin, ray.direction)

mr = jax.jit(lambda s, p, i: mega_render(s, S, p, i))
dt = bench("megakernel render 4 bounces", mr, scene, pix, jnp.uint32(0), iters=5)
wr = jax.jit(lambda s, p, i: wave_render(s, S, p, i))
dt2 = bench("wavefront render 4 bounces", wr, scene, pix, jnp.uint32(0), iters=5)
