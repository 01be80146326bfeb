"""Multi-chip distribution: pixel/ray sharding over a device mesh.

The reference is single-GPU (SURVEY.md §2.7 — no NCCL/MPI anywhere);
this layer is the net-new TPU-native scaling story: shard the pixel/ray
dimension across chips with `shard_map` over a 1-D mesh, replicate the
scene (BVH + materials are small relative to HBM), and let collectives
ride ICI:
  - forward render: zero collectives (pixels are independent — the
    embarrassingly-parallel axis the reference exploits per-thread,
    PathTracer.cpp:96-107, becomes the mesh axis),
  - image assembly: the output stays sharded; only host readback gathers,
  - gradients (inverse rendering): `jax.grad` through shard_map inserts
    the psum over scene-parameter grads automatically (replicated params,
    sharded batch = data parallelism).

Multi-host runs reuse this unchanged: jax.distributed.initialize() makes
jax.devices() span hosts and the same NamedSharding covers DCN+ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nexus_tpu.core.config import RenderSettings
from nexus_tpu.render import megakernel
from nexus_tpu.scene.scene import SceneData

RAY_AXIS = "rays"


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices; axis name 'rays'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def render_sharded(scene: SceneData, settings: RenderSettings,
                   n_samples: int, mesh: Mesh | None = None,
                   sample_offset: int = 0) -> jnp.ndarray:
    """Progressive render with pixels sharded across the mesh.

    Each chip traces H*W/n_chips pixels per sample; the scene pytree is
    replicated. Returns the (H, W, 3) HDR image (sharded on rows until
    read back).
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    n_pix = scene.camera.width * scene.camera.height
    # Pad the pixel axis to a device multiple (720p on 7 devices etc.);
    # pad lanes re-trace pixel 0 and are sliced off after the render.
    n_pad = -(-n_pix // n_dev) * n_dev

    pixel_sharding = NamedSharding(mesh, P(RAY_AXIS))
    replicated = NamedSharding(mesh, P())

    @functools.partial(jax.jit, out_shardings=pixel_sharding,
                       static_argnames=("n_samples",))
    def run(scene, pixel_idx, n_samples, sample_offset):
        def body(acc, s):
            return acc + megakernel.render_pixels(
                scene, settings, pixel_idx, sample_offset + s), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((pixel_idx.shape[0], 3), jnp.float32),
            jnp.arange(n_samples, dtype=jnp.uint32))
        return acc / n_samples

    from nexus_tpu.core.zorder import zorder_inverse_jnp, zorder_pixels

    scene_r = jax.device_put(scene, replicated)
    # Z-order enumeration (core/zorder.py): each chip's shard is a run
    # of compact pixel blocks, so trace tiles cull well on every chip.
    zp = zorder_pixels(scene.camera.width, scene.camera.height)
    pixel_idx = jax.device_put(
        jnp.where(jnp.arange(n_pad) < n_pix,
                  jnp.asarray(np.concatenate(
                      [zp, np.zeros(n_pad - n_pix, np.int32)])), 0),
        pixel_sharding)

    acc = run(scene_r, pixel_idx, n_samples, jnp.uint32(sample_offset))
    inv = zorder_inverse_jnp(scene.camera.width, scene.camera.height)
    return acc[:n_pix][inv].reshape(
        scene.camera.height, scene.camera.width, 3)


def train_step(scene: SceneData, settings: RenderSettings,
               pixel_idx: jnp.ndarray, target: jnp.ndarray,
               sample_idx, lr: float = 0.05):
    """One stateless inverse-rendering step (SGD on materials).

    Kept as the minimal jittable example of the data-parallel pattern
    (sharded forward render, backward through trace+shade, jax.grad's
    cross-chip psum on replicated parameter grads). The PRODUCT
    optimizer — Adam with state, parameter-group selection,
    checkpoint/resume, correlated sampling — lives in
    nexus_tpu.diff.optim (fit/make_step) and runs over a mesh via the
    same shardings (optim.fit(mesh=...)).
    """
    from nexus_tpu.diff import optim

    def loss_fn(materials):
        s = scene.replace(materials=materials)
        return optim.image_loss(s, settings, pixel_idx, target,
                                jnp.asarray(sample_idx, jnp.uint32))

    # allow_int: the Materials pytree carries int32 tags (mtype, texture
    # ids) alongside the float parameters; their "grads" are float0 and
    # the update below skips them.
    loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(scene.materials)
    new_mats = jax.tree_util.tree_map(
        lambda p, g: (p - lr * g).astype(p.dtype) if jnp.issubdtype(
            p.dtype, jnp.floating) else p,
        scene.materials, grads)
    return scene.replace(materials=new_mats), loss
