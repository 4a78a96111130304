"""BVH builders (host SAH + jittable LBVH) and traversal vs brute force."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh import build_bvh_sah, build_lbvh, morton_codes_3d
from tpurt.bvh.flat import tri_aabbs
from tpurt.kernels.traverse import (
    make_traversal_geom,
    trace_any,
    trace_closest,
    trace_closest_brute,
)


def random_tris(n, seed=0, spread=10.0, size=0.8):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    v0 = base
    v1 = base + rng.uniform(-size, size, (n, 3)).astype(np.float32)
    v2 = base + rng.uniform(-size, size, (n, 3)).astype(np.float32)
    return v0, v1, v2


def random_rays(n, seed=1, spread=12.0, targets=None):
    """Rays from random origins; if `targets` given, aim at random targets
    (jittered) so a useful fraction of rays actually hit the scene."""
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    if targets is None:
        d = rng.normal(size=(n, 3)).astype(np.float32)
    else:
        aim = targets[rng.integers(0, len(targets), n)]
        aim = aim + rng.normal(scale=0.2, size=(n, 3)).astype(np.float32)
        d = (aim - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_morton_orders_locality():
    pts = jnp.array([[0.0, 0, 0], [1, 1, 1], [0.01, 0, 0]])
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    codes = np.asarray(morton_codes_3d(pts, lo, hi))
    assert codes[0] < codes[2] < codes[1]


@pytest.mark.parametrize("n", [1, 2, 3, 7, 64, 257])
def test_lbvh_structure(n):
    v0, v1, v2 = random_tris(n, seed=n)
    amin, amax = tri_aabbs(v0, v1, v2)
    bvh = build_lbvh(amin, amax)
    bvh.validate_host(amin, amax)


@pytest.mark.parametrize("n", [1, 5, 64, 300])
def test_sah_structure(n):
    v0, v1, v2 = random_tris(n, seed=100 + n)
    amin, amax = tri_aabbs(v0, v1, v2)
    bvh = build_bvh_sah(amin, amax)
    bvh.validate_host(amin, amax)


def test_lbvh_duplicate_centroids():
    # all identical boxes: degenerate Morton codes must still build a
    # valid (index-tie-broken) tree
    v0 = np.zeros((33, 3), np.float32)
    v1 = np.ones((33, 3), np.float32)
    v2 = np.full((33, 3), 0.5, np.float32)
    amin, amax = tri_aabbs(v0, v1, v2)
    bvh = build_lbvh(amin, amax)
    bvh.validate_host(amin, amax)


@pytest.mark.parametrize("builder", ["sah", "lbvh"])
def test_traversal_matches_brute_force(builder):
    v0, v1, v2 = random_tris(200, seed=7)
    amin, amax = tri_aabbs(v0, v1, v2)
    if builder == "sah":
        bvh = build_bvh_sah(amin, amax)
        max_leaf = 4
    else:
        bvh = build_lbvh(amin, amax)
        max_leaf = 1
    geom = make_traversal_geom(v0, v1, v2, bvh.tri_order)
    o, d = random_rays(256, targets=(v0 + v1 + v2) / 3)

    bvh_tree = jax.tree.map(jnp.asarray, bvh.as_pytree())
    got = trace_closest(bvh_tree, geom, o, d, 1e-3, 1e4, max_leaf=max_leaf)
    ref = trace_closest_brute(geom, o, d, 1e-3, 1e4)

    np.testing.assert_array_equal(np.asarray(got["tri"]), np.asarray(ref["tri"]))
    hit = np.asarray(ref["tri"]) >= 0
    np.testing.assert_allclose(np.asarray(got["t"])[hit],
                               np.asarray(ref["t"])[hit], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["u"])[hit],
                               np.asarray(ref["u"])[hit], atol=1e-5)
    assert hit.sum() > 10, "test scene must produce hits"


def test_any_hit_matches_closest_occlusion():
    v0, v1, v2 = random_tris(150, seed=9)
    amin, amax = tri_aabbs(v0, v1, v2)
    bvh = build_bvh_sah(amin, amax)
    geom = make_traversal_geom(v0, v1, v2, bvh.tri_order)
    o, d = random_rays(200, seed=3, targets=(v0 + v1 + v2) / 3)
    bvh_tree = jax.tree.map(jnp.asarray, bvh.as_pytree())
    occluded = trace_any(bvh_tree, geom, o, d, 1e-3, 1e4, max_leaf=4)
    ref = trace_closest_brute(geom, o, d, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(occluded), np.asarray(ref["tri"]) >= 0)


def test_lbvh_jits_end_to_end():
    v0, v1, v2 = random_tris(64, seed=11)
    amin, amax = tri_aabbs(v0, v1, v2)

    @jax.jit
    def build_and_trace(amin, amax, o, d):
        bvh = build_lbvh(amin, amax)
        geom = make_traversal_geom(v0, v1, v2, bvh.tri_order)
        return trace_closest(bvh.as_pytree(), geom, o, d, 1e-3, 1e4, max_leaf=1)

    o, d = random_rays(64, seed=12)
    got = build_and_trace(jnp.asarray(amin), jnp.asarray(amax), o, d)
    geom_ref = make_traversal_geom(v0, v1, v2, np.arange(64))
    ref = trace_closest_brute(geom_ref, o, d, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(got["tri"]), np.asarray(ref["tri"]))


def test_degenerate_triangles_do_not_poison_traversal():
    """Zero-area triangles (all three verts equal / collinear) must neither
    crash the builders nor produce spurious hits or NaNs."""
    v0, v1, v2 = random_tris(64, seed=33)
    # make a quarter of the triangles degenerate
    v1[::4] = v0[::4]
    v2[::8] = v0[::8]
    amin, amax = tri_aabbs(v0, v1, v2)

    for bvh, max_leaf in [(build_bvh_sah(amin, amax), 4),
                          (build_lbvh(amin, amax), 1)]:
        geom = make_traversal_geom(v0, v1, v2, bvh.tri_order)
        o, d = random_rays(128, seed=4, targets=(v0 + v1 + v2) / 3)
        tree = jax.tree.map(jnp.asarray, bvh.as_pytree())
        got = trace_closest(tree, geom, o, d, 1e-3, 1e4, max_leaf=max_leaf)
        ref = trace_closest_brute(geom, o, d, 1e-3, 1e4)
        np.testing.assert_array_equal(np.asarray(got["tri"]),
                                      np.asarray(ref["tri"]))
        assert np.isfinite(np.asarray(got["t"])).all()
        # degenerate tris never win a hit
        hit_tris = np.asarray(got["tri"])
        hit_tris = hit_tris[hit_tris >= 0]
        assert not np.isin(hit_tris, np.arange(0, 64, 4)).any()
