"""Trace-queue compaction (render/compact.py): index-map properties and
result equivalence of the compacted closest/any-hit wrappers — the TPU
re-expression of the reference's wavefront queue compaction
(Nexus/src/Cuda/PathTracer/PathTracer.cu:302-306)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nexus_tpu.accel import bvh2, traverse2
from nexus_tpu.kernels import trace_hbm
from nexus_tpu.render import compact


def _rays(r, seed=1, span=4.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-span, span, (r, 3)).astype(np.float32)
    d = rng.normal(0, 1, (r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("pattern", ["mixed", "none", "all", "tail"])
def test_compact_src_stable_partition(pattern):
    r = 97
    rng = np.random.default_rng(11)
    live = {
        "mixed": rng.random(r) < 0.3,
        "none": np.zeros(r, bool),
        "all": np.ones(r, bool),
        "tail": np.arange(r) >= 60,
    }[pattern]
    src, pos = compact.compact_src(jnp.asarray(live))
    src, pos = np.asarray(src), np.asarray(pos)
    n_live = int(live.sum())
    # Head of src = live lanes in ORIGINAL order (stable partition).
    np.testing.assert_array_equal(src[:n_live], np.nonzero(live)[0])
    assert (src[n_live:] == -1).all()
    # pos inverts src on the live set.
    if n_live:
        np.testing.assert_array_equal(src[pos[live]], np.nonzero(live)[0])


@pytest.mark.parametrize("frac", [0.0, 0.17, 0.8, 1.0])
def test_compacted_matches_direct(frac):
    """Compacted closest/any-hit == direct full-width trace on the
    live set, on an interpret-mode blocked scene."""
    rng = np.random.default_rng(5)
    c = rng.uniform(-2, 2, (210, 3)).astype(np.float32)
    v0 = c + rng.normal(0, 0.2, (210, 3)).astype(np.float32)
    v1 = c + rng.normal(0, 0.2, (210, 3)).astype(np.float32)
    v2 = c + rng.normal(0, 0.2, (210, 3)).astype(np.float32)
    bvh = bvh2.build(v0, v1, v2, leaf_size=4)
    bs = trace_hbm.build_blocked_flat(v0, v1, v2, bvh.tri_order)
    o, d = _rays(300)
    live = jnp.asarray(rng.random(300) < frac)

    closest = lambda oo, dd: trace_hbm.closest_hit_scene(
        bs, oo, dd, interpret=True)
    t_ref, tri_ref, inst_ref = closest(o, d)
    t, tri, inst = compact.compacted_closest_hit(closest, o, d, live)
    lv = np.asarray(live)
    np.testing.assert_allclose(np.asarray(t)[lv], np.asarray(t_ref)[lv])
    np.testing.assert_array_equal(np.asarray(tri)[lv],
                                  np.asarray(tri_ref)[lv])
    assert (np.asarray(tri)[~lv] == -1).all()
    assert (np.asarray(t)[~lv] >= 1e29).all()

    tmax = jnp.full((300,), 2.5, jnp.float32)
    anyhit = lambda oo, dd, tm: trace_hbm.any_hit_scene(
        bs, oo, dd, tm, interpret=True)
    hit_ref = anyhit(o, d, tmax)
    hit = compact.compacted_any_hit(anyhit, o, d, tmax, live)
    np.testing.assert_array_equal(np.asarray(hit)[lv],
                                  np.asarray(hit_ref)[lv])
    assert not np.asarray(hit)[~lv].any()


@pytest.mark.parametrize("frac", [0.17, 0.95])
def test_adaptive_routes_match(frac):
    """adaptive_* picks compacted or direct by occupancy; both routes
    must agree on the live set (thresholds 0.0 / 1.1 force each)."""
    rng = np.random.default_rng(6)
    c = rng.uniform(-2, 2, (150, 3)).astype(np.float32)
    v0 = c + rng.normal(0, 0.2, (150, 3)).astype(np.float32)
    v1 = c + rng.normal(0, 0.2, (150, 3)).astype(np.float32)
    v2 = c + rng.normal(0, 0.2, (150, 3)).astype(np.float32)
    bvh = bvh2.build(v0, v1, v2, leaf_size=4)
    bs = trace_hbm.build_blocked_flat(v0, v1, v2, bvh.tri_order)
    o, d = _rays(200)
    live = jnp.asarray(rng.random(200) < frac)
    lv = np.asarray(live)

    closest = lambda oo, dd: trace_hbm.closest_hit_scene(
        bs, oo, dd, interpret=True)
    outs = [compact.adaptive_closest_hit(closest, o, d, live, thresh=th)
            for th in (0.0, 1.1)]
    for a, b in zip(*outs):
        np.testing.assert_allclose(np.asarray(a)[lv], np.asarray(b)[lv])

    anyhit = lambda oo, dd, tm: trace_hbm.any_hit_scene(
        bs, oo, dd, tm, interpret=True)
    tmax = jnp.full((200,), 2.0, jnp.float32)
    h0 = compact.adaptive_any_hit(anyhit, o, d, tmax, live, thresh=0.0)
    h1 = compact.adaptive_any_hit(anyhit, o, d, tmax, live, thresh=1.1)
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))


def test_render_equivalent_with_and_without_compaction():
    """End-to-end: compact_queues on/off renders the same image on the
    non-Pallas (CPU) path — the flag only changes queue routing."""
    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.render import megakernel
    from nexus_tpu.scenes.procedural import glass_scene

    scene = glass_scene(width=24, height=24)
    s_on = RenderSettings(width=24, height=24, path_length=3,
                          compact_queues=True)
    s_off = RenderSettings(width=24, height=24, path_length=3,
                           compact_queues=False)
    a = megakernel.render(scene, s_on, 2)
    b = megakernel.render(scene, s_off, 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-7)


def test_bucketed_launch_matches_direct():
    """Very sparse queues on bucket-aligned widths route to the sliced
    R/4 launch (render/compact.py _route); results must match the
    full-width trace on the live set."""
    rng = np.random.default_rng(12)
    c = rng.uniform(-2, 2, (180, 3)).astype(np.float32)
    v0 = c + rng.normal(0, 0.2, (180, 3)).astype(np.float32)
    v1 = c + rng.normal(0, 0.2, (180, 3)).astype(np.float32)
    v2 = c + rng.normal(0, 0.2, (180, 3)).astype(np.float32)
    bvh = bvh2.build(v0, v1, v2, leaf_size=4)
    bs = trace_hbm.build_blocked_flat(v0, v1, v2, bvh.tri_order)
    o, d = _rays(1024)            # 1024 % (128*4) == 0 -> bucketable
    live = jnp.asarray(rng.random(1024) < 0.1)   # ~10% -> R/4 slice
    assert int(compact._route(live, 0.85)) == 2
    lv = np.asarray(live)

    closest = lambda oo, dd: trace_hbm.closest_hit_scene(
        bs, oo, dd, interpret=True)
    t_ref, tri_ref, _ = closest(o, d)
    t, tri, inst = compact.adaptive_closest_hit(closest, o, d, live)
    np.testing.assert_allclose(np.asarray(t)[lv],
                               np.asarray(t_ref)[lv])
    np.testing.assert_array_equal(np.asarray(tri)[lv],
                                  np.asarray(tri_ref)[lv])
    assert (np.asarray(tri)[~lv] == -1).all()

    anyhit = lambda oo, dd, tm: trace_hbm.any_hit_scene(
        bs, oo, dd, tm, interpret=True)
    tmax = jnp.full((1024,), 2.5, jnp.float32)
    h_ref = anyhit(o, d, jnp.where(live, tmax, 0.0))
    h = compact.adaptive_any_hit(anyhit, o, d, tmax, live)
    np.testing.assert_array_equal(np.asarray(h)[lv],
                                  np.asarray(h_ref)[lv])
    assert not np.asarray(h)[~lv].any()


@pytest.mark.parametrize("r", [300, 256, 1024])
def test_route_pinned_thresh_never_direct(r):
    """A gate pinned past 1 (the always-compact entry points) must
    never route direct. Regression: int32(thresh * r) truncated, so
    thresh=1.001 with r=300 gave nl >= 300 at full occupancy and the
    'always-compact' wrappers silently validated the direct path."""
    live = jnp.ones((r,), bool)
    assert int(compact._route(live, 1.001)) != 0
