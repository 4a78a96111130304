"""uv payload from the BVH8 closest-hit kernel (VERDICT r4 #5).

With uv_payload=True the kernel emits texu/texv/img/texh/texw from the
winning triangle's tris128 payload columns (scene.py geom['uvp'] ->
pack_tris_hbm cols 10:19), so the shade pass's texture-quad gather no
longer waits on the tri_attr gather (GATHER_TRIGGER_PROBE.json measured
independent dtype-mixed gathers overlapping perfectly).

Contract: t/tri/u/v bit-identical to the default kernel; the payload
values equal the attr-derived ones on hit lanes (same interpolation
expression — bit-exact in interpret mode); the shaded frame matches.
"""
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from golden_scenes import spotarea_renderer

from tpurt.kernels.traverse_bvh8 import trace_closest_bvh8
from tpurt.passes.rays import camera_rays
from tpurt.passes.shade import shade

H = W = 128


@pytest.fixture(scope="module")
def setup():
    r = spotarea_renderer()
    scene = r.scene
    cam = r.camera.uniform()
    o, d = camera_rays(cam, W, H)
    bvh = {k: jnp.asarray(v) for k, v in scene.bvh.items()}
    geom = {k: jnp.asarray(v) for k, v in scene.geom.items()}
    hits_ref = trace_closest_bvh8(bvh, geom, o, d, 1e-3, 1e4,
                                  height=H, width=W, interpret=True,
                                  uv_payload=False)
    hits_uvp = trace_closest_bvh8(bvh, geom, o, d, 1e-3, 1e4,
                                  height=H, width=W, interpret=True,
                                  uv_payload=True)
    return r, cam, o, d, hits_ref, hits_uvp


def test_traversal_bit_identical(setup):
    _, _, _, _, hits_ref, hits_uvp = setup
    for k in ("t", "tri", "u", "v"):
        np.testing.assert_array_equal(np.asarray(hits_uvp[k]),
                                      np.asarray(hits_ref[k]))


def test_payload_matches_attr_rows(setup):
    """texu/texv/img/texh/texw == the values shade derives from the
    tri_attr gather, on hit lanes."""
    r, _, _, _, hits_ref, hits_uvp = setup
    attr = np.asarray(r.scene.tri_attr)
    tri = np.asarray(hits_ref["tri"])
    hit = tri >= 0
    assert hit.any() and (~hit).any()
    rows = attr[np.maximum(tri, 0)]
    u = np.asarray(hits_ref["u"])
    v = np.asarray(hits_ref["v"])
    w = 1.0 - u - v
    for name, col in (("texu", 0), ("texv", 1)):
        want = (rows[:, 3 + col] * w + rows[:, 15 + col] * u
                + rows[:, 27 + col] * v)
        got = np.asarray(hits_uvp[name])
        np.testing.assert_allclose(got[hit], want[hit], rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(hits_uvp["img"])[hit],
                                  rows[hit, 39])
    np.testing.assert_array_equal(np.asarray(hits_uvp["texh"])[hit],
                                  rows[hit, 37])
    np.testing.assert_array_equal(np.asarray(hits_uvp["texw"])[hit],
                                  rows[hit, 38])
    # miss lanes carry the safe init (extent 1, not 0): no div/mod-by-zero
    # can reach the shade index math
    assert (np.asarray(hits_uvp["texh"])[~hit] == 1.0).all()
    assert (np.asarray(hits_uvp["texw"])[~hit] == 1.0).all()


def test_shade_matches(setup):
    """The shaded G-buffer through the payload path equals the attr path
    (the only difference is which tensor feeds the quad index math)."""
    r, cam, o, d, hits_ref, hits_uvp = setup
    import jax

    scene_pt = jax.tree.map(jnp.asarray, r.scene.as_pytree())
    lights = r.lights.shader_arrays()
    g_ref = shade(scene_pt, cam, lights, hits_ref, o, d,
                  height=H, width=W)
    g_uvp = shade(scene_pt, cam, lights, hits_uvp, o, d,
                  height=H, width=W)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_uvp[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=0, atol=2e-5, err_msg=k)
