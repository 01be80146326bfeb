"""HBM-resident trace kernel (kernels/trace_hbm.py) vs reference
traversals, interpret mode. Covers flat + instanced scenes, closest +
any hit, dead-lane padding, and the in-kernel global-id extraction."""

import numpy as np
import jax.numpy as jnp
import pytest

from nexus_tpu.accel import bvh2, tlas as tlas_mod, traverse2, traverse_tlas
from nexus_tpu.kernels import trace_hbm


def _tri_soup(n, seed=0, span=2.0, size=0.15):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-span, span, (n, 3)).astype(np.float32)
    v0 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    v1 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    v2 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    return v0, v1, v2


def _rays(r, seed=1, span=4.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-span, span, (r, 3)).astype(np.float32)
    d = rng.normal(0, 1, (r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.fixture(scope="module")
def flat():
    v0, v1, v2 = _tri_soup(333)
    bvh = bvh2.build(v0, v1, v2, leaf_size=4)
    arrs = traverse2.device_arrays(bvh, v0, v1, v2)
    bs = trace_hbm.build_blocked_flat(v0, v1, v2, bvh.tri_order)
    return arrs, bs


@pytest.fixture(scope="module")
def instanced():
    v0, v1, v2 = _tri_soup(97, seed=3, span=1.0, size=0.2)
    blas = tlas_mod.build_blas(v0, v1, v2, leaf_size=4)
    rng = np.random.default_rng(7)
    transforms = []
    for _ in range(5):
        m = np.eye(4, dtype=np.float32)
        ang = rng.uniform(0, 6.28)
        rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                        [np.sin(ang), np.cos(ang), 0],
                        [0, 0, 1]], np.float32)
        m[:3, :3] = rot * rng.uniform(0.5, 1.6)
        m[:3, 3] = rng.uniform(-3, 3, 3)
        transforms.append(m)
    tl = tlas_mod.build_tlas([blas], [0] * 5, transforms, [0] * 5)
    bs = trace_hbm.build_blocked_tlas(tl)
    return tl, bs


def test_flat_closest_matches_bvh2(flat):
    arrs, bs = flat
    o, d = _rays(300)
    ref = traverse2.closest_hit(arrs, o, d)
    t, slot, inst = trace_hbm.closest_hit_scene(bs, o, d, interpret=True)
    slot = np.asarray(slot)
    ref_t = np.asarray(ref.t)
    hit = ref_t < 1e29
    assert ((slot < 0) == ~hit).all()
    np.testing.assert_allclose(np.asarray(t)[hit], ref_t[hit],
                               rtol=1e-4, atol=1e-5)
    tri = np.maximum(slot, 0)   # kernel returns global tri ids
    assert (tri[hit] == np.asarray(ref.tri_idx)[hit]).all()
    assert (np.asarray(inst) == 0).all()


def test_flat_anyhit_matches_bvh2(flat):
    arrs, bs = flat
    o, d = _rays(260)
    for tmax in (0.5, 3.0):
        ref = traverse2.any_hit(arrs, o, d, jnp.full((o.shape[0],), tmax))
        got = trace_hbm.any_hit_scene(bs, o, d,
                                      jnp.full((o.shape[0],), tmax),
                                      interpret=True)
        assert (np.asarray(got) == np.asarray(ref)).all()


def test_instanced_closest_matches_tlas(instanced):
    tl, bs = instanced
    o, d = _rays(300, seed=2)
    ref = traverse_tlas.closest_hit(tl, o, d)
    t, slot, inst = trace_hbm.closest_hit_scene(bs, o, d, interpret=True)
    slot = np.asarray(slot)
    ref_t = np.asarray(ref.t)
    hit = ref_t < 1e29
    assert ((slot < 0) == ~hit).all()
    np.testing.assert_allclose(np.asarray(t)[hit], ref_t[hit],
                               rtol=1e-4, atol=1e-4)
    tri = np.maximum(slot, 0)   # kernel returns global tri ids
    assert (tri[hit] == np.asarray(ref.tri_idx)[hit]).all()
    assert (np.asarray(inst)[hit] == np.asarray(ref.inst_idx)[hit]).all()


def test_instanced_anyhit_matches_tlas(instanced):
    tl, bs = instanced
    o, d = _rays(260, seed=4)
    ref = traverse_tlas.any_hit(tl, o, d, jnp.full((o.shape[0],), 2.5))
    got = trace_hbm.any_hit_scene(bs, o, d,
                                  jnp.full((o.shape[0],), 2.5),
                                  interpret=True)
    assert (np.asarray(got) == np.asarray(ref)).all()


def test_nonmultiple_ray_count(flat):
    """Ray counts that don't divide TILE_R exercise the valid-lane
    padding (padded lanes must not contribute to tile intervals)."""
    arrs, bs = flat
    o, d = _rays(131)
    ref = traverse2.closest_hit(arrs, o, d)
    t, slot, _ = trace_hbm.closest_hit_scene(bs, o, d, interpret=True)
    hit = np.asarray(ref.t) < 1e29
    assert ((np.asarray(slot) < 0) == ~hit).all()
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(ref.t)[hit],
                               rtol=1e-4, atol=1e-5)


def test_shared_blocks_between_instances(instanced):
    """Triangle blocks are stored once per BLAS, not per instance —
    the instancing memory win (SURVEY.md §2 #13-14)."""
    tl, bs = instanced
    # 5 instances of one 97-tri BLAS: 1 block stored, 5 entries.
    assert bs.n_blocks == 1
    assert bs.n_entries == 5


@pytest.fixture(scope="module")
def flat_woop():
    v0, v1, v2 = _tri_soup(333)
    bvh = bvh2.build(v0, v1, v2, leaf_size=4)
    arrs = traverse2.device_arrays(bvh, v0, v1, v2)
    bs = trace_hbm.build_blocked_flat(v0, v1, v2, bvh.tri_order,
                                      woop=True)
    return arrs, bs


def test_woop_flat_closest_matches_bvh2(flat_woop):
    """MXU Woop-matmul layout (13-row blocks) agrees with the BVH2
    reference on hits, t and tri ids (same contract as the MT path)."""
    arrs, bs = flat_woop
    assert bs.tri.shape[1] == 13
    o, d = _rays(300)
    ref = traverse2.closest_hit(arrs, o, d)
    t, slot, inst = trace_hbm.closest_hit_scene(bs, o, d, interpret=True)
    slot = np.asarray(slot)
    ref_t = np.asarray(ref.t)
    hit = ref_t < 1e29
    assert ((slot < 0) == ~hit).all()
    np.testing.assert_allclose(np.asarray(t)[hit], ref_t[hit],
                               rtol=1e-4, atol=1e-4)
    assert (np.maximum(slot, 0)[hit] == np.asarray(ref.tri_idx)[hit]).all()


def test_woop_flat_anyhit_matches_bvh2(flat_woop):
    arrs, bs = flat_woop
    o, d = _rays(260)
    for tmax in (0.5, 3.0):
        ref = traverse2.any_hit(arrs, o, d, jnp.full((o.shape[0],), tmax))
        got = trace_hbm.any_hit_scene(bs, o, d,
                                      jnp.full((o.shape[0],), tmax),
                                      interpret=True)
        assert (np.asarray(got) == np.asarray(ref)).all()


def test_woop_instanced_matches_tlas(instanced):
    tl, _ = instanced
    bs = trace_hbm.build_blocked_tlas(tl, woop=True)
    o, d = _rays(300, seed=2)
    ref = traverse_tlas.closest_hit(tl, o, d)
    t, slot, inst = trace_hbm.closest_hit_scene(bs, o, d, interpret=True)
    slot = np.asarray(slot)
    ref_t = np.asarray(ref.t)
    hit = ref_t < 1e29
    assert ((slot < 0) == ~hit).all()
    np.testing.assert_allclose(np.asarray(t)[hit], ref_t[hit],
                               rtol=1e-4, atol=1e-4)
    assert (np.maximum(slot, 0)[hit] == np.asarray(ref.tri_idx)[hit]).all()
    assert (np.asarray(inst)[hit] == np.asarray(ref.inst_idx)[hit]).all()


@pytest.mark.parametrize("woop", [False, True])
def test_pair_pops_match_reference(woop):
    """blocks_per_entry=2 (pair pops: two Morton blocks per DMA/entry,
    round-5 fixed-cost-per-pop optimization) must agree with the BVH2
    reference exactly like the bpe=1 layout."""
    v0, v1, v2 = _tri_soup(700, seed=9)
    bvh = bvh2.build(v0, v1, v2, leaf_size=4)
    arrs = traverse2.device_arrays(bvh, v0, v1, v2)
    bs = trace_hbm.build_blocked_flat(v0, v1, v2, bvh.tri_order,
                                      woop=woop, blocks_per_entry=2)
    assert bs.blocks_per_entry == 2
    assert bs.tri.shape[0] % 2 == 0
    o, d = _rays(300)
    ref = traverse2.closest_hit(arrs, o, d)
    t, slot, inst = trace_hbm.closest_hit_scene(bs, o, d, interpret=True)
    slot = np.asarray(slot)
    ref_t = np.asarray(ref.t)
    hit = ref_t < 1e29
    assert ((slot < 0) == ~hit).all()
    np.testing.assert_allclose(np.asarray(t)[hit], ref_t[hit],
                               rtol=1e-4, atol=1e-4)
    assert (np.maximum(slot, 0)[hit] == np.asarray(ref.tri_idx)[hit]).all()
    for tmax in (0.5, 3.0):
        refa = traverse2.any_hit(arrs, o, d, jnp.full((300,), tmax))
        got = trace_hbm.any_hit_scene(bs, o, d, jnp.full((300,), tmax),
                                      interpret=True)
        assert (np.asarray(got) == np.asarray(refa)).all()


def test_pair_pops_instanced(instanced):
    tl, _ = instanced
    bs = trace_hbm.build_blocked_tlas(tl, blocks_per_entry=2)
    assert bs.blocks_per_entry == 2
    o, d = _rays(260, seed=2)
    ref = traverse_tlas.closest_hit(tl, o, d)
    t, slot, inst = trace_hbm.closest_hit_scene(bs, o, d, interpret=True)
    slot = np.asarray(slot)
    ref_t = np.asarray(ref.t)
    hit = ref_t < 1e29
    assert ((slot < 0) == ~hit).all()
    np.testing.assert_allclose(np.asarray(t)[hit], ref_t[hit],
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(inst)[hit] == np.asarray(ref.inst_idx)[hit]).all()


def test_vmem_resident_matches_hbm(flat):
    """VMEM-resident variant (no per-pop DMA, zero-staleness select —
    kernels/trace_hbm.py _vmem_tris_auto) is bit-identical to the
    HBM+DMA kernel on closest and any hit."""
    _arrs, bs = flat
    o, d = _rays(300, seed=9)
    t0, s0, i0 = trace_hbm.closest_hit_scene(
        bs, o, d, interpret=True, vmem_tris=False)
    t1, s1, i1 = trace_hbm.closest_hit_scene(
        bs, o, d, interpret=True, vmem_tris=True)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    h0 = trace_hbm.any_hit_scene(bs, o, d, 1.5, interpret=True,
                                 vmem_tris=False)
    h1 = trace_hbm.any_hit_scene(bs, o, d, 1.5, interpret=True,
                                 vmem_tris=True)
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))


def test_vmem_resident_instanced(instanced):
    tl, bs = instanced
    o, d = _rays(300, seed=11)
    t0, s0, i0 = trace_hbm.closest_hit_scene(
        bs, o, d, interpret=True, vmem_tris=False)
    t1, s1, i1 = trace_hbm.closest_hit_scene(
        bs, o, d, interpret=True, vmem_tris=True)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_vmem_auto_threshold():
    """Auto policy: small scenes resident, the 1M-tri class is not."""
    v0, v1, v2 = _tri_soup(200)
    bs = trace_hbm.build_blocked_flat(v0, v1, v2, np.arange(200))
    assert trace_hbm._vmem_tris_auto(bs)
    big = bs.replace(tri=jnp.zeros((16384, 10, 128), jnp.float32))
    assert not trace_hbm._vmem_tris_auto(big)
