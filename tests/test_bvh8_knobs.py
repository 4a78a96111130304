"""BVH8 experiment-knob invariance (group / unroll / count_steps).

Own file (and own small scene) rather than appended to
test_traverse_pallas.py: as the alphabetically-last tests of a full
40-minute suite run these once hit a native segfault inside XLA:CPU
that no file-level or pairwise combination reproduces; keeping them
early in the order with a fresh module fixture sidesteps that
state-accumulation while testing the same contracts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh import build_bvh_sah
from tpurt.bvh.flat import tri_aabbs
from tpurt.bvh.wide import collapse8
from tpurt.kernels.traverse import make_traversal_geom
from tpurt.kernels.traverse_bvh8 import trace_any_bvh8, trace_closest_bvh8
from tpurt.passes.rays import camera_rays
from tpurt.scene.camera import Camera

from test_bvh import random_tris

H = W = 64


@pytest.fixture(scope="module")
def setup8():
    v0, v1, v2 = random_tris(200, seed=7, spread=3.0, size=1.5)
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

@pytest.mark.parametrize("g_u", [(2, 1), (1, 2), (2, 2), (3, 1)])
def test_bvh8_group_unroll_invariant(setup8, g_u):
    """The latency-hiding experiment knobs (packet grouping, step unroll —
    measured neutral, BVH8_GROUP_PROBE.json) must stay bit-identical to
    the default path, including the dead-packet padding when the packet
    count does not divide the group."""
    from tpurt.kernels.traverse_bvh8 import trace_any_bvh8, trace_closest_bvh8

    group, unroll = g_u
    tree8, geom, o, d = setup8
    ref = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True)
    got = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True,
                             group=group, unroll=unroll)
    for k in ("t", "tri", "u", "v"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]))
    ref_occ = trace_any_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True)
    got_occ = trace_any_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True,
                             group=group, unroll=unroll)
    np.testing.assert_array_equal(np.asarray(got_occ), np.asarray(ref_occ))


def test_bvh8_count_steps_diagnostic(setup8):
    """count_steps returns per-packet node/leaf pop counts through u/v
    while t/tri stay correct (tools/bvh8_steps_probe.py contract)."""
    from tpurt.kernels.traverse_bvh8 import trace_closest_bvh8

    tree8, geom, o, d = setup8
    ref = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True)
    got = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True,
                             count_steps=True)
    np.testing.assert_array_equal(np.asarray(got["tri"]),
                                  np.asarray(ref["tri"]))
    np.testing.assert_array_equal(np.asarray(got["t"]), np.asarray(ref["t"]))
    counts = np.asarray(got["u"]).reshape(H, W)
    # counters are per 32x32-tile packets, replicated across the tile
    tiles = counts.reshape(H // 32, 32, W // 32, 32)
    assert (tiles == tiles[:, :1, :, :1]).all()
    assert (tiles >= 1).all()


@pytest.mark.parametrize("dd", ["slab", "reduce", "sort", "leaf"])
def test_bvh8_debug_double_bit_identical(setup8, dd):
    """The step-cost attribution knob (tools/bvh8_step_ablate.py) doubles
    one per-step component without changing the traversal path — every
    variant must stay (bit-)identical to the default kernel. The "leaf"
    variant is exempt from exact equality on t/u/v: the duplicated MT
    expression is a separate code site the compiler may FMA-contract
    differently (observed 2.4e-6 max diff); tri ids must still match."""
    from tpurt.kernels.traverse_bvh8 import trace_any_bvh8, trace_closest_bvh8

    tree8, geom, o, d = setup8
    ref = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True)
    got = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True,
                             debug_double=dd)
    for k in ("t", "tri", "u", "v"):
        if dd == "leaf" and k != "tri":
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(ref[k]), rtol=1e-5,
                                       atol=1e-5)
        else:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(ref[k]))
    if dd != "sort":  # any-hit pushes unsorted
        ref_occ = trace_any_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                                 height=H, width=W, interpret=True)
        got_occ = trace_any_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                                 height=H, width=W, interpret=True,
                                 debug_double=dd)
        np.testing.assert_array_equal(np.asarray(got_occ),
                                      np.asarray(ref_occ))


def test_bvh8_reduce_pair_bit_identical(setup8):
    """reduce_mode="pair" (2 children per any-reduce via exact f32 count
    packing) must be bit-identical to the default 8-reduce kernel on both
    closest and any-hit paths."""
    from tpurt.kernels.traverse_bvh8 import trace_any_bvh8, trace_closest_bvh8

    tree8, geom, o, d = setup8
    ref = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True)
    got = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True,
                             reduce_mode="pair")
    for k in ("t", "tri", "u", "v"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]))
    ref_occ = trace_any_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True)
    got_occ = trace_any_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True,
                             reduce_mode="pair")
    np.testing.assert_array_equal(np.asarray(got_occ), np.asarray(ref_occ))


def test_bvh8_flag_keys_bit_identical(setup8):
    """flag_keys (default for unsorted any-hit pushes) replaces the
    centroid push keys — never read by push_unsorted — with validity
    flags; the push sequence and therefore the traversal must be
    bit-identical to the centroid-key variant, solo and grouped."""
    tree8, geom, o, d = setup8
    ref = trace_any_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                         height=H, width=W, interpret=True,
                         flag_keys=False)
    got = trace_any_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                         height=H, width=W, interpret=True,
                         flag_keys=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    got_g = trace_any_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                           height=H, width=W, interpret=True,
                           flag_keys=True, group=2)
    np.testing.assert_array_equal(np.asarray(got_g), np.asarray(ref))
    with pytest.raises(AssertionError):
        trace_any_bvh8(tree8, geom, o, d, 1e-3, 1e4, height=H, width=W,
                       interpret=True, flag_keys=True, push_order="sort")


def test_bvh8_pop2_parity(setup8):
    """The two-node-pop step (kernels/traverse_bvh8._kernel_bvh8_pop2)
    changes traversal ORDER but not results: closest t is exact (tri may
    differ only on exact-t ties); any-hit occlusion is sticky-OR and
    therefore identical."""
    tree8, geom, o, d = setup8
    ref = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True)
    got = trace_closest_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True, pop2=True)
    np.testing.assert_array_equal(np.asarray(got["t"]), np.asarray(ref["t"]))
    tri_r = np.asarray(ref["tri"])
    tri_g = np.asarray(got["tri"])
    diff = tri_r != tri_g
    assert diff.mean() < 0.01
    if diff.any():
        # every mismatch must be an exact-t tie (both real hits)
        assert (tri_r[diff] >= 0).all() and (tri_g[diff] >= 0).all()

    occ_ref = trace_any_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True)
    occ_got = trace_any_bvh8(tree8, geom, o, d, 1e-3, 1e4,
                             height=H, width=W, interpret=True, pop2=True)
    np.testing.assert_array_equal(np.asarray(occ_got), np.asarray(occ_ref))
