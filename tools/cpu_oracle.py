"""CPU-backend oracle for the large-scene on-chip gate (tools/tpu_check.py).

Runs in a SUBPROCESS pinned to the XLA:CPU backend, rebuilds the
deterministic 983k-triangle interior scene, and produces:

  - closest-hit (t, tri) for the ray set the parent computed ON THE TPU
    (read from the input npz) via the skip-link traversal
    (accel/traverse_links.py) — an implementation independent of the
    Pallas blocked kernel;
  - a small-resolution CPU reference render of the same scene.

The parent compares both against the TPU results. Why a subprocess: the
axon plugin pins the in-process default backend to the TPU; per-op
device placement would still trace the Pallas path (scene/view.py
dispatches on jax.default_backend()).

Usage: python tools/cpu_oracle.py <rays.npz> <out.npz>
  rays.npz: o (N,3), d (N,3), res_w, res_h, spp, bounces, target_tris
"""

import sys


def main(rays_path: str, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from nexus_tpu import scenes
    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.render import megakernel
    from nexus_tpu.scene import view

    z = np.load(rays_path)
    w, h = int(z["res_w"]), int(z["res_h"])
    scene = scenes.interior_scene(w, h, target_tris=int(z["target_tris"]))
    assert scene.blocked is None or jax.default_backend() == "cpu"

    isect = view.closest_hit(scene, jnp.asarray(z["o"]),
                             jnp.asarray(z["d"]))
    st = RenderSettings(width=w, height=h, path_length=int(z["bounces"]))
    img = megakernel.render(scene, st, n_samples=int(z["spp"]))

    np.savez(out_path,
             t=np.asarray(isect.t), tri=np.asarray(isect.tri_idx),
             img=np.asarray(img), tris=int(scene.tri_count))


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    main(sys.argv[1], sys.argv[2])
