"""Native C++ host kernels vs their numpy/JAX counterparts.

Mirrors the reference's scalar-vs-SSSE3-vs-AVX2 equivalence test
(gltf_model_reader.rs:735-750): every native kernel must agree with the
portable implementation.
"""
import numpy as np
import pytest

from tpurt.native import (
    get_lib,
    native_build_sah,
    native_morton3d,
    native_permute_pixels,
)
from tpurt.scene.gltf import permute_pixels

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def test_native_permute_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, 4 * 1024, dtype=np.uint8)
    for src_ts, dst_ts, cmap in [
        (4, 4, {0: 2, 1: 0, 2: 1, 3: 3}),
        (3, 4, {0: 0, 1: 1, 2: 2}),
        (4, 3, {0: 2, 1: 1, 2: 0}),
    ]:
        usable = (src.size // src_ts) * src_ts
        ref = permute_pixels(src[:usable], src_ts, cmap, dst_ts)
        got = native_permute_pixels(src[:usable], src_ts, cmap, dst_ts)
        np.testing.assert_array_equal(ref, got)


def test_native_morton_matches_jax():
    import jax.numpy as jnp

    from tpurt.bvh import morton_codes_3d

    rng = np.random.default_rng(1)
    pts = rng.uniform(-5, 5, (512, 3)).astype(np.float32)
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    ref = np.asarray(morton_codes_3d(jnp.asarray(pts), jnp.asarray(lo),
                                     jnp.asarray(hi)))
    got = native_morton3d(pts, lo, hi)
    np.testing.assert_array_equal(ref, got)


def test_native_sah_valid_and_traces():
    import jax
    import jax.numpy as jnp

    from tpurt.bvh.flat import FlatBVH, tri_aabbs
    from tpurt.kernels.traverse import (
        make_traversal_geom,
        trace_closest,
        trace_closest_brute,
    )
    from test_bvh import random_rays, random_tris

    v0, v1, v2 = random_tris(300, seed=21)
    amin, amax = tri_aabbs(v0, v1, v2)
    out = native_build_sah(amin, amax, 4)
    assert out is not None
    bvh = FlatBVH(**out)
    bvh.validate_host(amin, amax)

    geom = make_traversal_geom(v0, v1, v2, bvh.tri_order)
    o, d = random_rays(128, seed=5, targets=(v0 + v1 + v2) / 3)
    tree = jax.tree.map(jnp.asarray, bvh.as_pytree())
    got = trace_closest(tree, geom, o, d, 1e-3, 1e4, max_leaf=4)
    ref = trace_closest_brute(geom, o, d, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(got["tri"]), np.asarray(ref["tri"]))
