"""Multi-host launcher: jax.distributed + global-mesh rendering.

The reference has no distributed backend at all (SURVEY.md §5.8 — no
NCCL/MPI/sockets; single implicit device). This is the TPU-native
equivalent layer: every host process calls :func:`initialize`, after
which ``jax.devices()`` spans all hosts and the SAME sharded renderer
(dist/sharding.py) covers ICI within a slice and DCN across hosts —
the collectives are inserted by XLA from the shardings, never hand-
written (SURVEY.md §2.7).

Launch (one command per host / process):

    python -m nexus_tpu.dist.launch --coordinator host0:8476 \
        --num-processes 2 --process-id 0 --width 256 --height 256 \
        --spp 8 --out out.png

or via env (NEXUS_COORD / NEXUS_NPROCS / NEXUS_PROC_ID). On a real
multi-host TPU slice, omit all three — jax.distributed.initialize()
autodetects from the TPU metadata. A 2-process CPU bring-up is tested
in tests/test_multiprocess.py (renders bit-identical to 1-process —
the counter-based RNG keyed on (pixel, sample) makes shard-invariance
exact, SURVEY.md §4).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_devices: int | None = None) -> None:
    """jax.distributed.initialize with env-var fallbacks.

    NEXUS_COORD (host:port), NEXUS_NPROCS, NEXUS_PROC_ID. On TPU pods
    all of these autodetect; on CPU/GPU fleets they are required.
    `local_devices` forces N virtual CPU devices per process (test
    rigs)."""
    import jax

    coordinator = coordinator or os.environ.get("NEXUS_COORD")
    if num_processes is None and os.environ.get("NEXUS_NPROCS"):
        num_processes = int(os.environ["NEXUS_NPROCS"])
    if process_id is None and os.environ.get("NEXUS_PROC_ID"):
        process_id = int(os.environ["NEXUS_PROC_ID"])
    if local_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{local_devices}").strip()
    kwargs = {}
    if coordinator:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)


def render_multihost(scene, settings, n_samples: int,
                     sample_offset: int = 0) -> np.ndarray:
    """Sharded render over the GLOBAL (multi-host) mesh; returns the
    full (H, W, 3) image on every process (allgathered)."""
    import jax
    from jax.experimental import multihost_utils

    from nexus_tpu.dist import sharding as dist

    mesh = dist.make_mesh(jax.devices())   # global mesh
    img = dist.render_sharded(scene, settings, n_samples, mesh=mesh,
                              sample_offset=sample_offset)
    # One allgather to assemble the full image everywhere (host
    # readback of a sharded array is process-local otherwise).
    return np.asarray(multihost_utils.process_allgather(
        img.reshape(-1, 3), tiled=True)).reshape(
            scene.camera.height, scene.camera.width, 3)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--cpu-devices", type=int, default=None,
                    help="force N virtual CPU devices (test rigs)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--scene", default=None, help="model file (default: "
                    "the demo Cornell glass box)")
    ap.add_argument("--out", default="out.npy",
                    help=".npy/.png output (process 0 writes)")
    args = ap.parse_args(argv)

    initialize(args.coordinator, args.num_processes, args.process_id,
               args.cpu_devices)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.scene.scene import SceneBuilder

    if args.scene:
        from nexus_tpu.io.loader import add_model

        b = SceneBuilder()
        add_model(b, args.scene)
        b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                     hfov_deg=50.0, width=args.width, height=args.height)
        scene = b.build()
    else:
        from nexus_tpu.scenes import glass_scene

        scene = glass_scene(args.width, args.height)
    settings = RenderSettings(width=args.width, height=args.height,
                              path_length=args.bounces)

    img = render_multihost(scene, settings, args.spp)
    if jax.process_index() == 0:
        if args.out.endswith(".npy"):
            np.save(args.out, img)
        else:
            from nexus_tpu.io.image import write_png

            write_png(args.out, img)
        print(f"proc 0/{jax.process_count()}: wrote {args.out} "
              f"mean={float(img.mean()):.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
