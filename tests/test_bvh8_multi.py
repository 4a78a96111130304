"""Fused multi-set any-hit BVH8 traversal vs per-set launches.

The fused kernel (kernels/traverse_bvh8._kernel_bvh8_any_multi) replaces
the reference's per-light shadow traceRayEXT loop
(raytrace.rgen.glsl:164-182) with ONE launch per frame; its contract is
bit-identical occlusion per set.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.bvh import build_bvh_sah
from tpurt.bvh.flat import tri_aabbs
from tpurt.kernels.traverse import make_traversal_geom
from tpurt.kernels.traverse_pallas import trace_any_packets
from tpurt.kernels.traverse_bvh8 import trace_any_bvh8_multi
from tpurt.passes.rays import camera_rays
from tpurt.scene.camera import Camera

from test_bvh import random_tris

H = W = 64

# three "light" positions around the scene
LIGHTS = np.array([[4.0, 3.0, -2.0],
                   [-5.0, 1.0, 2.5],
                   [0.0, -6.0, 1.0]], np.float32)


@pytest.fixture(scope="module")
def setup8():
    from tpurt.bvh.wide import collapse8

    v0, v1, v2 = random_tris(200, seed=7, spread=3.0, size=1.5)
    amin, amax = tri_aabbs(v0, v1, v2)
    bvh = build_bvh_sah(amin, amax)
    geom = make_traversal_geom(v0, v1, v2, bvh.tri_order)
    nodes8, _ = collapse8(bvh.as_pytree())
    tree8 = dict(jax.tree.map(jnp.asarray, bvh.as_pytree()),
                 nodes8=jnp.asarray(nodes8))

    cam = Camera(aspect=1.0)
    cam.set_pos([0.0, 0.0, -10.0])
    cam.set_dir([0.0, 0.0, 1.0])
    o, d = camera_rays(cam.uniform(), W, H)
    # shadow-like rays: origins = points along the primary rays (a fake
    # "hit surface"), one direction set per light
    org = np.asarray(o) + np.asarray(d) * 6.0
    dirs = []
    tmaxs = []
    for lp in LIGHTS:
        nn = lp[None, :] - org
        ln = np.linalg.norm(nn, axis=-1)
        dirs.append(nn / np.maximum(ln, 1e-20)[:, None])
        tmaxs.append(ln.astype(np.float32))
    return (tree8, geom, jnp.asarray(org),
            jnp.asarray(np.stack(dirs)), jnp.asarray(np.stack(tmaxs)))


def test_fused_matches_per_set(setup8):
    tree8, geom, org, dirs, tmaxs = setup8
    fused = trace_any_bvh8_multi(tree8, geom, org, dirs, 1e-2, tmaxs,
                                 height=H, width=W, interpret=True)
    assert fused.shape == (3, H * W)
    any_occ = False
    for s in range(3):
        solo = trace_any_packets(tree8, geom, org, dirs[s], 1e-2, tmaxs[s],
                                 height=H, width=W, interpret=True,
                                 tables="bvh8")
        np.testing.assert_array_equal(np.asarray(fused[s]),
                                      np.asarray(solo), err_msg=f"set {s}")
        any_occ = any_occ or bool(np.asarray(solo).any())
    assert any_occ, "scene produced no occlusion at all - test is vacuous"


def test_fused_parked_lanes(setup8):
    """Lanes parked with tmax=0 (the shade pass's inactive-light form)
    must never report occlusion, per set independently."""
    tree8, geom, org, dirs, tmaxs = setup8
    t = np.asarray(tmaxs).copy()
    t[0, ::2] = 0.0     # park half of set 0
    t[2, :] = 0.0       # park ALL of set 2
    fused = trace_any_bvh8_multi(tree8, geom, org, dirs, 1e-2,
                                 jnp.asarray(t), height=H, width=W,
                                 interpret=True)
    f = np.asarray(fused)
    assert not f[0, ::2].any()
    assert not f[2].any()
    # unparked sets still match their solo launches
    solo1 = trace_any_packets(tree8, geom, org, dirs[1], 1e-2, tmaxs[1],
                              height=H, width=W, interpret=True,
                              tables="bvh8")
    np.testing.assert_array_equal(f[1].astype(bool), np.asarray(solo1))


def test_fused_two_sets(setup8):
    """n_sets is static shape-driven; S=2 exercises a different block."""
    tree8, geom, org, dirs, tmaxs = setup8
    fused = trace_any_bvh8_multi(tree8, geom, org, dirs[:2], 1e-2,
                                 tmaxs[:2], height=H, width=W,
                                 interpret=True)
    for s in range(2):
        solo = trace_any_packets(tree8, geom, org, dirs[s], 1e-2, tmaxs[s],
                                 height=H, width=W, interpret=True,
                                 tables="bvh8")
        np.testing.assert_array_equal(np.asarray(fused[s]), np.asarray(solo))


def test_multi_pop2_bit_identical(setup8):
    """The two-pop multi-set kernel must produce identical occlusion for
    every set (sticky-OR updates are order-invariant)."""
    tree8, geom, org, dirs, tmaxs = setup8
    ref = trace_any_bvh8_multi(tree8, geom, org, list(dirs), 0.01,
                               list(tmaxs), height=H, width=W,
                               interpret=True)
    got = trace_any_bvh8_multi(tree8, geom, org, list(dirs), 0.01,
                               list(tmaxs), height=H, width=W,
                               interpret=True, pop2=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
