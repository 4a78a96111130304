"""Mip-chain atlas + trilinear sampling + the multi-material workload
(reference sampler: vk_rt_descriptor_set.rs:76-97; 256-slot bindless array
analogue at scale)."""
import math

import jax.numpy as jnp
import numpy as np

from tpurt.engine import Renderer, RendererConfig
from tpurt.passes.gtao import GtaoSettings
from tpurt.passes.shade import sample_bilinear, sample_trilinear
from tpurt.scene.lights import DirectionalLight, PointLight
from tpurt.scene.procedural import material_field
from tpurt.scene.scene import build_mip_atlas


def _stack_and_sizes():
    rng = np.random.default_rng(0)
    # 2 prims: 32x32 and 8x16 extents, 3 layers each
    stack = np.zeros((6, 32, 32, 4), np.uint8)
    stack[0:3, :32, :32] = rng.integers(0, 256, (3, 32, 32, 4), dtype=np.uint8)
    stack[3:6, :8, :16] = rng.integers(0, 256, (3, 8, 16, 4), dtype=np.uint8)
    sizes = np.array([[32, 32], [8, 16]], np.int32)
    return stack, sizes


def test_mip_atlas_structure():
    stack, sizes = _stack_and_sizes()
    atlas, offsets, msizes = build_mip_atlas(stack, sizes)
    assert msizes.shape[1] == 6  # 32 -> 1 = 6 levels
    np.testing.assert_array_equal(msizes[0, 0], [32, 32])
    np.testing.assert_array_equal(msizes[0, 1], [16, 16])
    np.testing.assert_array_equal(msizes[0, 5], [1, 1])
    np.testing.assert_array_equal(msizes[1, 0], [8, 16])
    np.testing.assert_array_equal(msizes[1, 3], [1, 2])
    np.testing.assert_array_equal(msizes[1, 4], [1, 1])
    # level 0 texels are the original image
    img0 = atlas[offsets[0, 0]:offsets[0, 0] + 32 * 32].reshape(32, 32, 4)
    np.testing.assert_array_equal(img0, stack[0, :32, :32])
    # level 1 is the rounded 2x2 box average
    img1 = atlas[offsets[0, 1]:offsets[0, 1] + 16 * 16].reshape(16, 16, 4)
    q = stack[0].astype(np.uint16).reshape(16, 2, 16, 2, 4)
    expect = ((q.sum(axis=(1, 3)) + 2) // 4).astype(np.uint8)
    np.testing.assert_array_equal(img1, expect)


def test_trilinear_lod0_matches_bilinear():
    stack, sizes = _stack_and_sizes()
    atlas, offsets, msizes = build_mip_atlas(stack, sizes)
    n = 64
    rng = np.random.default_rng(1)
    uv = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    prim = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    for layer in range(3):
        bil = sample_bilinear(jnp.asarray(stack), jnp.asarray(sizes), prim,
                              layer, uv)
        tri = sample_trilinear(jnp.asarray(atlas), jnp.asarray(offsets),
                               jnp.asarray(msizes), prim, layer, uv,
                               jnp.zeros(n))
        np.testing.assert_allclose(np.asarray(tri), np.asarray(bil),
                                   atol=1e-6)


def test_trilinear_high_lod_converges_to_mean():
    stack, sizes = _stack_and_sizes()
    atlas, offsets, msizes = build_mip_atlas(stack, sizes)
    n = 16
    uv = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (n, 2)),
                     jnp.float32)
    prim = jnp.zeros(n, jnp.int32)
    out = sample_trilinear(jnp.asarray(atlas), jnp.asarray(offsets),
                           jnp.asarray(msizes), prim, 0, uv,
                           jnp.full(n, 10.0))
    mean = stack[0].astype(np.float64).mean(axis=(0, 1)) / 255.0
    np.testing.assert_allclose(np.asarray(out), np.tile(mean, (n, 1)),
                               atol=0.02)


def _material_scene(mipmaps: bool):
    cfg = RendererConfig(width=96, height=96,
                         gtao=GtaoSettings(1, 2, denoise=0),
                         enable_gtao=False, enable_tonemap=True,
                         mipmaps=mipmaps)
    r = Renderer(cfg)
    r.models.append(material_field(nx=6, nz=6, subdiv=2))
    r.camera_mut().set_pos([0.0, -2.5, -6.5])
    d = np.array([0.0, 0.35, 1.0])
    r.camera_mut().set_dir(d / np.linalg.norm(d))
    r.lights_mut().directional_lights.append(DirectionalLight(
        dir=np.array([0.3, 0.9, 0.3]) / np.linalg.norm([0.3, 0.9, 0.3]),
        color=[1.5, 1.4, 1.3], casts_shadows=True))
    r.lights_mut().point_lights.append(PointLight(
        pos=[0.0, -4.0, -2.0], color=[8.0, 8.0, 8.0], falloff_distance=20.0,
        casts_shadows=False))
    r.prepare_first_frame()
    return r


def test_material_field_end_to_end_36_materials():
    """>= 32 distinct materials through the bindless-equivalent texture
    stack, rendered end-to-end with and without mip sampling."""
    r = _material_scene(mipmaps=False)
    assert r.scene.num_prims == 36
    img_flat = np.asarray(r.render()["image"])
    assert (img_flat.sum(-1) > 0).mean() > 0.15

    rm = _material_scene(mipmaps=True)
    assert rm.scene.tex_atlas is not None
    img_mip = np.asarray(rm.render()["image"])
    # same scene, so broadly similar...
    assert abs(float(img_mip.mean()) - float(img_flat.mean())) < 12.0
    # ...but minification must actually engage coarser mips somewhere
    assert (img_mip != img_flat).mean() > 0.01


def test_material_field_matches_oracle():
    """The texture path at scale (36 materials, varied extents) passes the
    independent-oracle RMSE gate (mip sampling off = reference behavior)."""
    from oracle import oracle_render

    r = _material_scene(mipmaps=False)
    from tpurt.engine.frame import render_sample_hdr

    cam = r.camera.uniform()
    lights = r.lights.shader_arrays()
    scene = r.scene.as_pytree()
    ours = np.asarray(render_sample_hdr(
        scene, cam, lights, np.zeros(2, np.float32), width=96, height=96),
        np.float64)
    full = r.scene.as_full_pytree()
    ref = oracle_render(
        {k: np.asarray(v) for k, v in full.items()
         if k not in ("bvh", "geom")},
        {k: np.asarray(v) for k, v in cam.items()}, lights, 96, 96)
    err = ours - ref["color"]
    rel = math.sqrt(float(np.mean(err * err))) / float(ref["color"].max())
    assert rel <= 0.01, f"RMSE {rel:.4%} exceeds the 1% gate"


def test_aniso_one_tap_is_trilinear():
    """sample_anisotropic(taps=1) must reduce to a centered trilinear tap."""
    from tpurt.passes.shade import sample_anisotropic

    stack, sizes = _stack_and_sizes()
    atlas, offsets, msizes = build_mip_atlas(stack, sizes)
    n = 64
    rng = np.random.default_rng(3)
    uv = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    prim = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    lod = jnp.asarray(rng.uniform(0, 3, n), jnp.float32)
    duv = jnp.asarray(rng.normal(0, 0.2, (n, 2)), jnp.float32)
    tri = sample_trilinear(jnp.asarray(atlas), jnp.asarray(offsets),
                           jnp.asarray(msizes), prim, 0, uv, lod)
    one = sample_anisotropic(jnp.asarray(atlas), jnp.asarray(offsets),
                             jnp.asarray(msizes), prim, 0, uv, lod, duv,
                             taps=1)
    np.testing.assert_allclose(np.asarray(one), np.asarray(tri), atol=1e-6)


def test_aniso_cone_geometry():
    """ray_cone_aniso: normal incidence -> unit anisotropy (tiny major
    axis); grazing incidence -> elongated major axis along the projected
    view direction, minor LOD unchanged."""
    from tpurt.passes.shade import ray_cone_aniso, ray_cone_lod

    # unit square in the xz plane (y up is -1 in this engine), uv = xz
    p0 = jnp.asarray([[0.0, 0.0, 0.0]] * 2)
    p1 = jnp.asarray([[1.0, 0.0, 0.0]] * 2)
    p2 = jnp.asarray([[0.0, 0.0, 1.0]] * 2)
    uv0 = jnp.asarray([[0.0, 0.0]] * 2)
    uv1 = jnp.asarray([[1.0, 0.0]] * 2)
    uv2 = jnp.asarray([[0.0, 1.0]] * 2)
    N = jnp.asarray([[0.0, -1.0, 0.0]] * 2)
    s2 = 1.0 / np.sqrt(2.0)
    direction = jnp.asarray([[0.0, 1.0, 0.0],       # straight down
                             [s2 * 0.999, s2, 0.0]])  # 45 deg toward +x
    t = jnp.asarray([2.0, 2.0])
    tex = jnp.asarray([256.0, 256.0])
    spread = 0.002

    lod_minor, duv_major = ray_cone_aniso(t, direction, N, p0, p1, p2,
                                          uv0, uv1, uv2, tex, tex, spread)
    lod_iso = ray_cone_lod(t, direction, N, p0, p1, p2, uv0, uv1, uv2,
                           tex, tex, spread)
    m = np.asarray(duv_major)
    # normal incidence: circular footprint -> degenerate major direction
    # (taps coincide at the center; the minor LOD covers the footprint)
    assert np.linalg.norm(m[0]) < 1e-6
    # grazing 45deg: elongated major axis along the projected view dir (+u)
    assert np.linalg.norm(m[1]) > 1.3 * t[1] * spread
    assert abs(m[1][1]) < 1e-3 and abs(m[1][0]) > 0.0
    # minor LOD <= the isotropic LOD (which folds the 1/cos elongation in)
    ml = np.asarray(lod_minor)
    il = np.asarray(lod_iso)
    assert ml[1] <= il[1] + 1e-4


def test_aniso_end_to_end():
    """aniso_taps renders and sharpens grazing surfaces vs trilinear."""
    r_tri = _material_scene(mipmaps=True)
    img_tri = np.asarray(r_tri.render()["image"])

    cfg = RendererConfig(width=96, height=96,
                         gtao=GtaoSettings(1, 2, denoise=0),
                         enable_gtao=False, enable_tonemap=True,
                         mipmaps=True, aniso_taps=4)
    r = Renderer(cfg)
    r.models.append(material_field(nx=6, nz=6, subdiv=2))
    r.camera_mut().set_pos([0.0, -2.5, -6.5])
    d = np.array([0.0, 0.35, 1.0])
    r.camera_mut().set_dir(d / np.linalg.norm(d))
    r.lights_mut().directional_lights.append(DirectionalLight(
        dir=np.array([0.3, 0.9, 0.3]) / np.linalg.norm([0.3, 0.9, 0.3]),
        color=[1.5, 1.4, 1.3], casts_shadows=True))
    r.lights_mut().point_lights.append(PointLight(
        pos=[0.0, -4.0, -2.0], color=[8.0, 8.0, 8.0], falloff_distance=20.0,
        casts_shadows=False))
    r.prepare_first_frame()
    img_aniso = np.asarray(r.render()["image"])

    assert np.isfinite(img_aniso.astype(np.float64)).all()
    # same scene, broadly similar exposure...
    assert abs(float(img_aniso.mean()) - float(img_tri.mean())) < 12.0
    # ...but oblique ground tiles resolve differently with 4 aniso taps
    assert (img_aniso != img_tri).mean() > 0.005


def test_quad_mip_atlas_matches_per_layer():
    """The quad-packed mip atlas path (2 gathers) is bit-identical to the
    per-layer atlas path (24 gathers) for trilinear fetches."""
    from tpurt.passes.shade import sample_trilinear_quad
    from tpurt.scene.scene import build_mip_quad_atlas

    stack, sizes = _stack_and_sizes()
    atlas, offsets, msizes = build_mip_atlas(stack, sizes)
    qatlas, qoffsets, qsizes = build_mip_quad_atlas(stack, sizes)
    np.testing.assert_array_equal(np.asarray(msizes), np.asarray(qsizes))

    n = 96
    rng = np.random.default_rng(7)
    uv = jnp.asarray(rng.uniform(-0.2, 1.2, (n, 2)), jnp.float32)
    prim = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    lod = jnp.asarray(rng.uniform(0, 5, n), jnp.float32)

    packed = sample_trilinear_quad(jnp.asarray(qatlas), jnp.asarray(qoffsets),
                                   jnp.asarray(msizes), prim, uv, lod)
    for layer in range(3):
        ref = sample_trilinear(jnp.asarray(atlas), jnp.asarray(offsets),
                               jnp.asarray(msizes), prim, layer, uv, lod)
        np.testing.assert_array_equal(
            np.asarray(packed[:, layer * 4:layer * 4 + 4]), np.asarray(ref))


def test_aniso_degenerate_triangle_falls_back_isotropic():
    """Near-parallel triangle edges (degenerate UV Gram system) must not
    explode the major axis — duv falls back to 0 (isotropic tap)."""
    from tpurt.passes.shade import ray_cone_aniso

    p0 = jnp.asarray([[0.0, 0.0, 0.0]])
    p1 = jnp.asarray([[1.0, 0.0, 0.0]])
    p2 = jnp.asarray([[2.0, 0.0, 1e-9]])     # almost collinear
    uv0 = jnp.asarray([[0.0, 0.0]])
    uv1 = jnp.asarray([[1.0, 0.0]])
    uv2 = jnp.asarray([[0.0, 1.0]])
    N = jnp.asarray([[0.0, -1.0, 0.0]])
    s2 = 1.0 / np.sqrt(2.0)
    direction = jnp.asarray([[s2, s2, 0.0]])
    lod, duv = ray_cone_aniso(jnp.asarray([2.0]), direction, N, p0, p1, p2,
                              uv0, uv1, uv2, jnp.asarray([256.0]),
                              jnp.asarray([256.0]), 0.002)
    assert np.isfinite(np.asarray(lod)).all()
    assert np.linalg.norm(np.asarray(duv)) < 1e-6
