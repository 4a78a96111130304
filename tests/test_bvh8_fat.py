"""Fat-packet invariance: fat>1 merges adjacent 32x32 tiles into one
(8*fat, 128) packet behind a single stack (kernels/traverse_bvh8.py,
FAT_DEFAULT/FAT_ANY_DEFAULT). Per-lane results must be bit-identical to
fat=1: packet traversal visits every node any lane's slab test passes,
so each lane's candidate-triangle set only grows with fat, and the
strict (tk < t) MT update makes the winner order-invariant.

Own small scene + odd tile count (96x96 = 9 tiles) so the dead-packet
padding of every fat path is exercised.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh import build_bvh_sah
from tpurt.bvh.flat import tri_aabbs
from tpurt.bvh.wide import collapse8
from tpurt.kernels.traverse import make_traversal_geom
from tpurt.kernels.traverse_bvh8 import (trace_any_bvh8, trace_any_bvh8_multi,
                                         trace_closest_bvh8)
from tpurt.passes.rays import camera_rays
from tpurt.scene.camera import Camera

from test_bvh import random_tris

H = W = 96  # 9 tiles: odd, so fat=2/4 pad with dead packets


@pytest.fixture(scope="module")
def setup_fat():
    v0, v1, v2 = random_tris(200, seed=11, spread=3.0, size=1.5)
    amin, amax = tri_aabbs(v0, v1, v2)
    bvh = build_bvh_sah(amin, amax)
    geom = make_traversal_geom(v0, v1, v2, bvh.tri_order)
    tree = jax.tree.map(jnp.asarray, bvh.as_pytree())
    nodes8, depth = collapse8(jax.tree.map(np.asarray, bvh.as_pytree()))
    assert depth >= 2
    tree8 = dict(tree, nodes8=jnp.asarray(nodes8))

    cam = Camera(aspect=1.0)
    cam.set_pos([0.0, 0.0, -10.0])
    cam.set_dir([0.0, 0.0, 1.0])
    o, d = camera_rays(cam.uniform(), W, H)
    return tree8, geom, o, d


@pytest.mark.parametrize("fat", [2, 4])
def test_fat_closest_bit_identical(setup_fat, fat):
    tree8, geom, o, d = setup_fat
    ref = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True)
    got = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True, fat=fat)
    for k in ("t", "tri", "u", "v"):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]))


@pytest.mark.parametrize("fat", [2, 4])
def test_fat_any_hit_bit_identical(setup_fat, fat):
    tree8, geom, o, d = setup_fat
    ref = trace_any_bvh8(tree8, geom, o, d, 1e-3, 8.0,
                         height=H, width=W, interpret=True)
    got = trace_any_bvh8(tree8, geom, o, d, 1e-3, 8.0,
                         height=H, width=W, interpret=True, fat=fat)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("fat", [2])
def test_fat_any_multi_bit_identical(setup_fat, fat):
    tree8, geom, o, d = setup_fat
    dirs = [d, jnp.asarray(np.asarray(d)[:, [1, 0, 2]])]
    t_maxs = [jnp.full((H * W,), 8.0), jnp.full((H * W,), 6.0)]
    ref = trace_any_bvh8_multi(tree8, geom, o, dirs, 1e-3, t_maxs,
                               height=H, width=W, interpret=True)
    got = trace_any_bvh8_multi(tree8, geom, o, dirs, 1e-3, t_maxs,
                               height=H, width=W, interpret=True, fat=fat)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_fat_count_steps_diagnostic(setup_fat):
    """count_steps on the single-packet kernel: t/tri stay correct, u/v
    return per-packet pop counters replicated over the packet's lanes;
    fat=2 counters are shared by the merged tile pair and bounded by the
    pair's separate counts (union <= sum, >= max)."""
    tree8, geom, o, d = setup_fat
    ref = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True)
    c1 = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                            height=H, width=W, interpret=True,
                            count_steps=True)
    np.testing.assert_array_equal(np.asarray(ref["t"]), np.asarray(c1["t"]))
    np.testing.assert_array_equal(np.asarray(ref["tri"]),
                                  np.asarray(c1["tri"]))
    c2 = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                            height=H, width=W, interpret=True,
                            count_steps=True, fat=2)
    np.testing.assert_array_equal(np.asarray(ref["t"]), np.asarray(c2["t"]))

    def tile_counts(img):
        return np.asarray(img).reshape(H // 32, 32, W // 32, 32)[:, 0, :, 0]

    for key in ("u", "v"):
        single = tile_counts(c1[key]).ravel()
        fat2 = tile_counts(c2[key]).ravel()
        # tiles are paired in row-major tile order
        for p in range(len(single) // 2):
            a, b = single[2 * p], single[2 * p + 1]
            un = fat2[2 * p]
            assert fat2[2 * p] == fat2[2 * p + 1]
            assert max(a, b) <= un <= a + b


@pytest.mark.parametrize("fat", [1, 2])
def test_when_push_bit_identical(setup_fat, fat):
    """Predicated pushes (when_push: children + sort + stack writes under
    @pl.when(is_node), sp through an SMEM cell) must match the lax.cond +
    unconditional-push step bit-for-bit on closest, any-hit and the fused
    multi-set tour — dead pushes never advanced sp, so skipping them is
    unobservable."""
    tree8, geom, o, d = setup_fat
    ref = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True, fat=fat)
    got = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True, fat=fat,
                             when_push=True)
    for k in ("t", "tri", "u", "v"):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]))
    refa = trace_any_bvh8(tree8, geom, o, d, 1e-3, 8.0,
                          height=H, width=W, interpret=True, fat=fat)
    gota = trace_any_bvh8(tree8, geom, o, d, 1e-3, 8.0,
                          height=H, width=W, interpret=True, fat=fat,
                          when_push=True)
    np.testing.assert_array_equal(np.asarray(refa), np.asarray(gota))
    dirs = [d, jnp.asarray(np.asarray(d)[:, [1, 0, 2]])]
    t_maxs = [jnp.full((H * W,), 8.0), jnp.full((H * W,), 6.0)]
    refm = trace_any_bvh8_multi(tree8, geom, o, dirs, 1e-3, t_maxs,
                                height=H, width=W, interpret=True, fat=fat)
    gotm = trace_any_bvh8_multi(tree8, geom, o, dirs, 1e-3, t_maxs,
                                height=H, width=W, interpret=True, fat=fat,
                                when_push=True)
    np.testing.assert_array_equal(np.asarray(refm), np.asarray(gotm))
