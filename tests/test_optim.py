"""Inverse-rendering subsystem tests (diff/optim.py).

End-to-end recovery (VERDICT r3 next-step #4): perturb Cornell's wall
albedo and the light's intensity, then recover both from rendered
targets to < 5% error with the production Adam loop. Plus
checkpoint/resume equivalence (including optimizer state) and parameter
selection round-trips.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.core.config import RenderSettings
from nexus_tpu.diff import optim
from nexus_tpu.io.loader import add_model
from nexus_tpu.render import megakernel
from nexus_tpu.scene.scene import SceneBuilder

RES = 24
GLB = ("/root/reference/Nexus/assets/demo_scenes/cornell_box/"
       "cornell_box.glb")


@pytest.fixture(scope="module")
def cornell():
    b = SceneBuilder()
    add_model(b, GLB)
    b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                 hfov_deg=50.0, width=RES, height=RES)
    return b.build()


@pytest.fixture(scope="module")
def settings():
    return RenderSettings(width=RES, height=RES, path_length=3)


def _target(scene, settings, spp=8):
    acc = jnp.zeros((RES * RES, 3), jnp.float32)
    pix = jnp.arange(RES * RES, dtype=jnp.int32)
    for s in range(spp):
        acc = acc + megakernel.render_pixels(scene, settings, pix,
                                             jnp.uint32(1000 + s))
    return acc / spp


def test_select_inject_roundtrip(cornell):
    params = optim.select_params(cornell, ("materials", "camera",
                                           "background"))
    s2 = optim.inject_params(cornell, params)
    np.testing.assert_array_equal(np.asarray(s2.materials.albedo),
                                  np.asarray(cornell.materials.albedo))
    np.testing.assert_array_equal(np.asarray(s2.camera.position),
                                  np.asarray(cornell.camera.position))
    with pytest.raises(ValueError):
        optim.select_params(cornell, ("nonsense",))


def _perturbed_scene(cornell):
    mats = cornell.materials
    true_albedo = np.asarray(mats.albedo).copy()
    true_intensity = np.asarray(mats.intensity).copy()
    emissive = (np.asarray(mats.emission).max(axis=1)
                * true_intensity) > 0
    light_ids = np.nonzero(emissive)[0]
    assert light_ids.size > 0
    # Perturb every non-emissive albedo and the light intensity.
    pert_albedo = np.clip(true_albedo * 0.45 + 0.3, 0, 1)
    pert_albedo[light_ids] = true_albedo[light_ids]
    pert_intensity = true_intensity.copy()
    pert_intensity[light_ids] *= 1.9

    perturbed = cornell.replace(materials=mats.replace(
        albedo=jnp.asarray(pert_albedo),
        intensity=jnp.asarray(pert_intensity)))
    return perturbed, true_albedo, true_intensity, emissive, light_ids


def _run_recovery(cornell, settings, steps):
    # Fully correlated sampling (n_samples == cycle == the target's
    # spp): the loss is deterministic with its zero at the true
    # parameters, so Adam can resolve the intensity x albedo valley.
    target = _target(cornell, settings)
    (perturbed, true_albedo, true_intensity,
     emissive, light_ids) = _perturbed_scene(cornell)
    recovered, losses = optim.fit(
        perturbed, settings, target, groups=("materials",),
        steps=steps, lr=4e-2, n_samples=8, sample_offset=1000,
        sample_cycle=8)

    assert losses[-1] < losses[0], (losses[0], losses[-1])
    rec_albedo = np.asarray(recovered.materials.albedo)
    rec_intensity = np.asarray(recovered.materials.intensity)
    # Error over the materials that matter (significant true albedo,
    # non-emissive) and the light intensity.
    sig = (~emissive) & (true_albedo.max(axis=1) > 0.05)
    alb_err = np.abs(rec_albedo[sig] - true_albedo[sig]).max()
    int_err = np.abs(
        rec_intensity[light_ids] - true_intensity[light_ids]) \
        / np.maximum(true_intensity[light_ids], 1e-6)
    return alb_err, float(int_err.max()), losses


def test_recovery_converges(cornell, settings):
    """Default-suite variant: 60 Adam steps must already recover the
    perturbed albedo/intensity most of the way (perturbation starts at
    up to ~0.3 absolute albedo error and 1.9x intensity; measured at
    60 steps: 0.068 / 0.053). The full <5% contract runs in the slow
    variant below."""
    alb_err, int_err, losses = _run_recovery(cornell, settings, 60)
    assert alb_err < 0.10, f"albedo error {alb_err:.3f}"
    assert int_err < 0.10, f"intensity error {int_err:.3f}"


@pytest.mark.slow
def test_recovery_albedo_and_intensity(cornell, settings):
    """Recover a perturbed wall albedo AND light intensity to <5%."""
    alb_err, int_err, losses = _run_recovery(cornell, settings, 120)
    assert alb_err < 0.05, \
        f"albedo error {alb_err:.3f} (losses {losses[::20]})"
    assert int_err < 0.05, f"intensity error {int_err}"


def test_checkpoint_resume_bit_identical(cornell, settings, tmp_path):
    """Interrupted-and-resumed training equals uninterrupted training
    (step counter, params, AND Adam moments restored)."""
    target = _target(cornell, settings, spp=4)
    perturbed = cornell.replace(materials=cornell.materials.replace(
        albedo=jnp.clip(cornell.materials.albedo * 0.5 + 0.2, 0, 1)))

    ck = str(tmp_path / "opt.npz")
    # One shot: 6 steps (bit-identity is step-count-independent; 3+3
    # through the checkpoint keeps Adam moments mid-flight).
    s_full, l_full = optim.fit(perturbed, settings, target, steps=6,
                               lr=3e-2)
    # Two shots through a checkpoint: 3 + 3.
    optim.fit(perturbed, settings, target, steps=3, lr=3e-2,
              checkpoint=ck, checkpoint_every=3)
    s_res, l_res = optim.fit(perturbed, settings, target, steps=6,
                             lr=3e-2, checkpoint=ck, checkpoint_every=3)
    np.testing.assert_array_equal(
        np.asarray(s_full.materials.albedo),
        np.asarray(s_res.materials.albedo))
    assert os.path.exists(ck)


def test_fit_sharded_matches_single(cornell, settings):
    """The same fit over an 8-device mesh is numerically equivalent."""
    from nexus_tpu.dist.sharding import make_mesh

    target = _target(cornell, settings, spp=2)
    perturbed = cornell.replace(materials=cornell.materials.replace(
        albedo=jnp.clip(cornell.materials.albedo * 0.6 + 0.1, 0, 1)))
    s1, l1 = optim.fit(perturbed, settings, target, steps=3, lr=3e-2)
    s8, l8 = optim.fit(perturbed, settings, target, steps=3, lr=3e-2,
                       mesh=make_mesh())
    np.testing.assert_allclose(np.asarray(s1.materials.albedo),
                               np.asarray(s8.materials.albedo),
                               rtol=2e-4, atol=2e-5)


def test_checkpoint_treedef_repr_change_warns_not_raises(tmp_path):
    """A treedef-REPR difference with identical leaf shapes/dtypes is
    a library-version artifact (optax state class reprs change across
    releases): restore positionally with a warning. A real shape
    mismatch must still raise."""
    params = {"a": jnp.ones((2,)), "b": jnp.zeros((3,))}
    opt_state = (jnp.ones((2,)),)
    path = str(tmp_path / "ck.npz")
    optim.save_checkpoint(path, 5, params, opt_state)

    z = dict(np.load(path))
    sig = str(z["sig_p"])
    z["sig_p"] = np.asarray("UpgradedTreeDef|" + sig.rsplit("|", 1)[-1])
    np.savez(path, **z)
    with pytest.warns(UserWarning, match="treedef repr"):
        step, p2, _ = optim.load_checkpoint(path, params, opt_state)
    assert step == 5
    np.testing.assert_array_equal(np.asarray(p2["a"]),
                                  np.asarray(params["a"]))

    optim.save_checkpoint(path, 5, params, opt_state)
    bad = {"a": jnp.ones((4,)), "b": jnp.zeros((3,))}
    with pytest.raises(optim.CheckpointMismatchError):
        optim.load_checkpoint(path, bad, opt_state)
