"""Native C++ builders must be IDENTICAL to the NumPy reference
implementations (same algorithm, same tie-breaking — accel/bvh2.py and
accel/links.py are the executable spec)."""

import os

import numpy as np
import pytest

from nexus_tpu import native
from nexus_tpu.accel import bvh2 as bvh2_mod
from nexus_tpu.accel import links as links_mod

from test_tlas import _random_mesh

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


def _numpy_build(v0, v1, v2, **kw):
    os.environ["NEXUS_NO_NATIVE"] = "1"
    native._lib, native._tried = None, False
    try:
        return bvh2_mod.build(v0, v1, v2, **kw)
    finally:
        del os.environ["NEXUS_NO_NATIVE"]
        native._lib, native._tried = None, False


def _numpy_links(b):
    os.environ["NEXUS_NO_NATIVE"] = "1"
    native._lib, native._tried = None, False
    try:
        return links_mod.build_links(b.bmin, b.bmax, b.left_first, b.count)
    finally:
        del os.environ["NEXUS_NO_NATIVE"]
        native._lib, native._tried = None, False


@pytest.mark.parametrize("seed,n,kw", [
    (0, 37, dict(leaf_size=4)),
    (1, 500, dict(leaf_size=4)),
    (2, 211, dict(force_leaf_one=True)),
    (3, 64, dict(leaf_size=1)),
])
def test_bvh2_identical(seed, n, kw):
    rng = np.random.default_rng(seed)
    v0, v1, v2 = _random_mesh(rng, n)
    a = _numpy_build(v0, v1, v2, **kw)
    b = bvh2_mod.build(v0, v1, v2, **kw)  # native path
    assert a.node_count == b.node_count
    np.testing.assert_array_equal(a.left_first, b.left_first)
    np.testing.assert_array_equal(a.count, b.count)
    np.testing.assert_array_equal(a.tri_order, b.tri_order)
    np.testing.assert_array_equal(a.bmin, b.bmin)
    np.testing.assert_array_equal(a.bmax, b.bmax)


def test_degenerate_same_centroid():
    """All-identical centroids exercise the halving fallback."""
    v0 = np.zeros((16, 3), np.float32)
    v1 = np.full((16, 3), 0.5, np.float32)
    v2 = np.full((16, 3), (0.5, 0.0, 0.0), np.float32)
    a = _numpy_build(v0, v1, v2, force_leaf_one=True)
    b = bvh2_mod.build(v0, v1, v2, force_leaf_one=True)
    np.testing.assert_array_equal(a.left_first, b.left_first)
    np.testing.assert_array_equal(a.count, b.count)
    np.testing.assert_array_equal(a.tri_order, b.tri_order)


@pytest.mark.parametrize("seed,n", [(0, 123), (4, 999)])
def test_links_identical(seed, n):
    rng = np.random.default_rng(seed)
    v0, v1, v2 = _random_mesh(rng, n)
    b = bvh2_mod.build(v0, v1, v2, leaf_size=3)
    la = _numpy_links(b)
    lb = links_mod.build_links(b.bmin, b.bmax, b.left_first, b.count)
    np.testing.assert_array_equal(la.hit, lb.hit)
    np.testing.assert_array_equal(la.miss, lb.miss)
