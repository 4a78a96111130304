"""Pallas packet tracer vs the XLA reference tracer (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh import build_bvh_sah
from tpurt.bvh.flat import tri_aabbs
from tpurt.kernels.traverse import make_traversal_geom, trace_any, trace_closest
from tpurt.kernels.traverse_pallas import (
    fits_smem,
    trace_any_packets,
    trace_closest_packets,
)
from tpurt.passes.rays import camera_rays
from tpurt.scene.camera import Camera

from test_bvh import random_tris

H = W = 64


@pytest.fixture(scope="module")
def setup():
    v0, v1, v2 = random_tris(200, seed=7, spread=3.0, size=1.5)
    amin, amax = tri_aabbs(v0, v1, v2)
    bvh = build_bvh_sah(amin, amax)
    geom = make_traversal_geom(v0, v1, v2, bvh.tri_order)
    tree = jax.tree.map(jnp.asarray, bvh.as_pytree())

    cam = Camera(aspect=1.0)
    cam.set_pos([0.0, 0.0, -10.0])
    cam.set_dir([0.0, 0.0, 1.0])
    o, d = camera_rays(cam.uniform(), W, H)
    return tree, geom, o, d


def test_fits_smem_budget():
    assert fits_smem(1000, 1000)
    assert not fits_smem(10_000_000, 10_000_000)


@pytest.mark.parametrize("tables", ["smem", "vmem", "hbm"])
def test_packet_closest_matches_xla(setup, tables):
    tree, geom, o, d = setup
    ref = trace_closest(tree, geom, o, d, 1e-3, 1e4, max_leaf=4)
    got = trace_closest_packets(tree, geom, o, d, 1e-3, 1e4,
                                height=H, width=W, interpret=True,
                                tables=tables)
    np.testing.assert_array_equal(np.asarray(got["tri"]), np.asarray(ref["tri"]))
    hit = np.asarray(ref["tri"]) >= 0
    assert hit.sum() > 100
    np.testing.assert_allclose(np.asarray(got["t"])[hit],
                               np.asarray(ref["t"])[hit], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["u"])[hit],
                               np.asarray(ref["u"])[hit], atol=1e-5)


@pytest.mark.parametrize("tables", ["smem", "hbm"])
def test_packet_any_matches_xla(setup, tables):
    tree, geom, o, d = setup
    ref = trace_any(tree, geom, o, d, 1e-3, 1e4, max_leaf=4)
    got = trace_any_packets(tree, geom, o, d, 1e-3, 1e4,
                            height=H, width=W, interpret=True, tables=tables)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_packet_unaligned_resolution(setup):
    """Non-32-aligned images are edge-padded internally (1080p support)."""
    tree, geom, _, _ = setup
    from tpurt.scene.camera import Camera

    cam = Camera(aspect=60 / 44)
    cam.set_pos([0.0, 0.0, -10.0])
    cam.set_dir([0.0, 0.0, 1.0])
    o, d = camera_rays(cam.uniform(), 60, 44)
    ref = trace_closest(tree, geom, o, d, 1e-3, 1e4, max_leaf=4)
    got = trace_closest_packets(tree, geom, o, d, 1e-3, 1e4,
                                height=44, width=60, interpret=True)
    np.testing.assert_array_equal(np.asarray(got["tri"]), np.asarray(ref["tri"]))


def test_packet_inactive_lanes(setup):
    """Lanes with t_max = 0 (masked shadow rays) must report unoccluded."""
    tree, geom, o, d = setup
    n = o.shape[0]
    t_max = np.full(n, 1e4, np.float32)
    t_max[::2] = 0.0
    got = trace_any_packets(tree, geom, o, d, 1e-2, jnp.asarray(t_max),
                            height=H, width=W, interpret=True)
    assert not np.asarray(got)[::2].any()


def test_hbm_tiny_scene_leaf_dma_in_bounds():
    """A scene with fewer triangles than max_leaf must not DMA past the HBM
    triangle table (the table is padded; the clamp can't go negative)."""
    v0, v1, v2 = random_tris(2, seed=11, spread=1.0, size=2.0)
    amin, amax = tri_aabbs(v0, v1, v2)
    bvh = build_bvh_sah(amin, amax)
    geom = make_traversal_geom(v0, v1, v2, bvh.tri_order)
    tree = jax.tree.map(jnp.asarray, bvh.as_pytree())

    cam = Camera(aspect=1.0)
    cam.set_pos([0.0, 0.0, -10.0])
    cam.set_dir([0.0, 0.0, 1.0])
    o, d = camera_rays(cam.uniform(), 32, 32)

    ref = trace_closest(tree, geom, o, d, 1e-3, 1e4, max_leaf=4)
    got = trace_closest_packets(tree, geom, o, d, 1e-3, 1e4,
                                height=32, width=32, interpret=True,
                                max_leaf=4, tables="hbm")
    np.testing.assert_array_equal(np.asarray(got["tri"]), np.asarray(ref["tri"]))
    occ_ref = trace_any(tree, geom, o, d, 1e-3, 1e4, max_leaf=4)
    occ = trace_any_packets(tree, geom, o, d, 1e-3, 1e4, height=32, width=32,
                            interpret=True, max_leaf=4, tables="hbm")
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))


def test_deep_bvh_raises_at_build_time():
    """A BVH deeper than the traversal stack budget must fail loudly at
    build time, not silently corrupt the packet kernel's stack."""
    from tpurt.bvh.flat import FlatBVH, bvh_max_depth, check_traversal_depth

    # hand-build a right-leaning chain: node i is internal with children
    # (leaf, chain) laid out depth-first
    depth = 250
    m = 2 * depth + 1
    entry = np.full(m, -1, np.int32)
    skip = np.full(m, -1, np.int32)
    first = np.full(m, -1, np.int32)
    count = np.zeros(m, np.int32)
    for i in range(depth):
        n = 2 * i
        entry[n] = n + 1          # left leaf
        skip[n + 1] = n + 2       # right = rest of the chain
        first[n + 1] = i
        count[n + 1] = 1
    first[m - 1] = depth
    count[m - 1] = 1
    zeros = np.zeros((m, 3), np.float32)
    bvh = FlatBVH(aabb_min=zeros, aabb_max=zeros + 1, entry=entry, skip=skip,
                  first_tri=first, tri_count=count,
                  tri_order=np.arange(depth + 1, dtype=np.int32))
    assert bvh_max_depth(entry, skip, count) == depth
    with pytest.raises(ValueError, match="stack budget"):
        check_traversal_depth(bvh)


@pytest.fixture(scope="module")
def setup8(setup):
    """BVH8 collapse of the shared random scene."""
    from tpurt.bvh.wide import collapse8

    tree, geom, o, d = setup
    nodes8, depth = collapse8(jax.tree.map(np.asarray, tree))
    assert depth >= 2
    tree8 = dict(tree, nodes8=jnp.asarray(nodes8))
    return tree8, geom, o, d


def test_bvh8_closest_matches_xla(setup8):
    tree8, geom, o, d = setup8
    ref = trace_closest(tree8, geom, o, d, 1e-3, 1e4, max_leaf=4)
    got = trace_closest_packets(tree8, geom, o, d, 1e-3, 1e4,
                                height=H, width=W, interpret=True,
                                tables="bvh8")
    np.testing.assert_array_equal(np.asarray(got["tri"]),
                                  np.asarray(ref["tri"]))
    hit = np.asarray(ref["tri"]) >= 0
    assert hit.sum() > 100
    np.testing.assert_allclose(np.asarray(got["t"])[hit],
                               np.asarray(ref["t"])[hit], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["u"])[hit],
                               np.asarray(ref["u"])[hit], atol=1e-5)


def test_bvh8_any_matches_xla(setup8):
    tree8, geom, o, d = setup8
    ref = trace_any(tree8, geom, o, d, 1e-3, 1e4, max_leaf=4)
    got = trace_any_packets(tree8, geom, o, d, 1e-3, 1e4,
                            height=H, width=W, interpret=True,
                            tables="bvh8")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bvh8_inactive_lanes(setup8):
    tree8, geom, o, d = setup8
    n = o.shape[0]
    t_max = np.full(n, 1e4, np.float32)
    t_max[::2] = 0.0
    got = trace_any_packets(tree8, geom, o, d, 1e-2, jnp.asarray(t_max),
                            height=H, width=W, interpret=True,
                            tables="bvh8")
    assert not np.asarray(got)[::2].any()


def test_bvh8_tiny_scene():
    """Root-is-leaf and fewer-than-max_leaf triangle scenes."""
    from tpurt.bvh.wide import collapse8

    v0, v1, v2 = random_tris(2, seed=11, spread=1.0, size=2.0)
    amin, amax = tri_aabbs(v0, v1, v2)
    bvh = build_bvh_sah(amin, amax)
    geom = make_traversal_geom(v0, v1, v2, bvh.tri_order)
    nodes8, _ = collapse8(bvh.as_pytree())
    tree8 = dict(jax.tree.map(jnp.asarray, bvh.as_pytree()),
                 nodes8=jnp.asarray(nodes8))

    cam = Camera(aspect=1.0)
    cam.set_pos([0.0, 0.0, -10.0])
    cam.set_dir([0.0, 0.0, 1.0])
    o, d = camera_rays(cam.uniform(), 32, 32)
    ref = trace_closest(tree8, geom, o, d, 1e-3, 1e4, max_leaf=4)
    got = trace_closest_packets(tree8, geom, o, d, 1e-3, 1e4,
                                height=32, width=32, interpret=True,
                                tables="bvh8")
    np.testing.assert_array_equal(np.asarray(got["tri"]),
                                  np.asarray(ref["tri"]))

