"""XeGTAO pass unit tests (synthetic G-buffers)."""
import jax.numpy as jnp
import numpy as np

from tpurt.passes.gtao import (
    GtaoSettings,
    _hilbert_lut_64,
    compute_ao,
    gtao_constants,
    pack_edges,
    prefilter_depths,
    spatio_temporal_noise,
    unpack_edges,
)

H = W = 64


def consts():
    return gtao_constants(W, H, 0.1, 1000.0, float(np.pi / 2), 1.0)


def test_hilbert_lut_is_permutation():
    lut = _hilbert_lut_64()
    assert sorted(lut.reshape(-1).tolist()) == list(range(64 * 64))


def test_noise_in_unit_range_and_temporal():
    n0x, n0y = spatio_temporal_noise(8, 8, 0)
    n1x, _ = spatio_temporal_noise(8, 8, 1)
    for n in (n0x, n0y, n1x):
        a = np.asarray(n)
        assert (a >= 0).all() and (a < 1).all()
    assert not np.array_equal(np.asarray(n0x), np.asarray(n1x))


def test_prefilter_constant_depth():
    d = jnp.full((H, W), 5.0)
    mips = prefilter_depths(d, consts())
    assert len(mips) == 5
    shapes = [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4)]
    for m, s in zip(mips, shapes):
        assert m.shape == s
        np.testing.assert_allclose(np.asarray(m), 5.0, rtol=1e-3)


def test_edges_pack_unpack_roundtrip():
    vals = jnp.array([[[0.0, 1 / 3, 2 / 3, 1.0]]])
    packed = pack_edges(vals)
    un = unpack_edges(packed)
    np.testing.assert_allclose(np.asarray(un), np.asarray(vals), atol=1e-6)


def test_flat_plane_is_unoccluded():
    """A flat camera-facing wall must stay (nearly) fully visible after the
    full chain (occlusion-term scale restores ~1.0 at final apply)."""
    depth = jnp.full((H, W), 5.0)
    # camera-facing normal encodes to (0.5, 0.5, 0) (y/z negated encoding)
    normal_enc = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.0]), (H, W, 3))
    settings = GtaoSettings(slice_count=2, steps_per_slice=2, denoise=1)
    ao = compute_ao(depth, normal_enc, consts(), settings, noise_index=0)
    inner = np.asarray(ao)[8:-8, 8:-8]
    assert inner.min() >= 230, f"flat plane over-occluded: {inner.min()}"


def test_trench_is_occluded():
    """A narrow trench (recessed strip within the effect radius) must be
    darker than the surrounding floor."""
    d = np.full((H, W), 2.0, np.float32)
    d[:, 30:34] = 2.15
    depth = jnp.asarray(d)
    normal_enc = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.0]), (H, W, 3))
    settings = GtaoSettings(slice_count=3, steps_per_slice=3, denoise=1)
    ao = compute_ao(depth, normal_enc, consts(), settings, noise_index=0)
    a = np.asarray(ao)
    trench = a[H // 2, 30:34].mean()
    floor = a[H // 2, 5:15].mean()
    assert trench < floor - 15, f"trench {trench} not darker than floor {floor}"


def test_denoise_levels_pass_counts():
    assert GtaoSettings(denoise=0).num_denoise_passes == 1
    assert GtaoSettings(denoise=1).num_denoise_passes == 1
    assert GtaoSettings(denoise=2).num_denoise_passes == 2
    assert GtaoSettings(denoise=3).num_denoise_passes == 3
    assert GtaoSettings(denoise=0).denoise_blur_beta == 1e4
    assert GtaoSettings(denoise=1).denoise_blur_beta == 1.2


def test_bent_normals_flat_plane_faces_camera():
    """On a camera-facing flat wall the bent normal must be ~the view
    direction (view-space -z)."""
    import jax.numpy as jnp
    from tpurt.passes.gtao import ao_bent_normals, ao_visibility_u8

    depth = jnp.full((H, W), 5.0)
    normal_enc = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.0]), (H, W, 3))
    settings = GtaoSettings(slice_count=3, steps_per_slice=2, denoise=1,
                            bent_normals=True)
    ao = compute_ao(depth, normal_enc, consts(), settings, noise_index=0)
    vis = np.asarray(ao_visibility_u8(ao, settings))
    bn = np.asarray(ao_bent_normals(ao, settings))
    inner = vis[8:-8, 8:-8]
    assert inner.min() >= 220, f"flat plane over-occluded: {inner.min()}"
    bz = bn[8:-8, 8:-8, 2]
    assert bz.max() < -0.9, f"bent normal should face the camera, got z {bz.max()}"


def test_visibility_bent_encode_roundtrip():
    import jax.numpy as jnp
    from tpurt.passes.gtao import (
        decode_visibility_bent_normal,
        encode_visibility_bent_normal,
    )

    rng = np.random.default_rng(0)
    bn = rng.normal(size=(64, 3)).astype(np.float32)
    bn /= np.linalg.norm(bn, axis=1, keepdims=True)
    vis = rng.uniform(0, 1, 64).astype(np.float32)
    packed = encode_visibility_bent_normal(jnp.asarray(vis), jnp.asarray(bn))
    v2, b2 = decode_visibility_bent_normal(packed)
    np.testing.assert_allclose(np.asarray(v2), vis, atol=1 / 255 + 1e-6)
    np.testing.assert_allclose(np.asarray(b2), bn, atol=2 / 255 + 1e-6)


def test_fp16_pipeline_close_but_distinct():
    """precision="fp16" emulates the reference's min16float pipeline
    (XE_GTAO_USE_HALF_FLOAT_PRECISION, prefilter_depths.comp.hlsl:1-3):
    the AO term must stay finite and within a few final-term units of the
    f32 path, while actually exercising f16 arithmetic (some pixels must
    differ — if none do, the knob is dead)."""
    rng = np.random.default_rng(7)
    d = (2.0 + 0.3 * rng.random((H, W))).astype(np.float32)
    d[:, 30:34] += 0.15
    depth = jnp.asarray(d)
    normal_enc = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.0]), (H, W, 3))
    s32 = GtaoSettings(slice_count=3, steps_per_slice=3, denoise=1)
    s16 = GtaoSettings(slice_count=3, steps_per_slice=3, denoise=1,
                       precision="fp16")
    ao32 = np.asarray(compute_ao(depth, normal_enc, consts(), s32,
                                 noise_index=0)).astype(np.float32)
    ao16 = np.asarray(compute_ao(depth, normal_enc, consts(), s16,
                                 noise_index=0)).astype(np.float32)
    assert np.isfinite(ao16).all()
    rmse = float(np.sqrt(np.mean((ao32 - ao16) ** 2)))
    assert rmse < 8.0, f"fp16 AO too far from f32: rmse {rmse}"
    assert np.any(ao32 != ao16), "fp16 knob produced bit-identical AO"


def test_fp16_prefilter_mip0_identical_deeper_mips_f16():
    """Mip 0 is ClampDepth only (identical under both precisions); deeper
    mips re-run the weighted filter in f16 and may differ, but all stay
    R16F-representable (storage format unchanged)."""
    rng = np.random.default_rng(3)
    depth = jnp.asarray((1.0 + 4.0 * rng.random((H, W))).astype(np.float32))
    m32 = prefilter_depths(depth, consts())
    m16 = prefilter_depths(depth, consts(), fp16=True)
    assert np.array_equal(np.asarray(m32[0]), np.asarray(m16[0]))
    for a, b in zip(m32[1:], m16[1:]):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        assert np.isfinite(b).all()
        # R16F round-trip is the identity on stored values
        assert np.array_equal(b, b.astype(np.float16).astype(np.float32))
        assert float(np.max(np.abs(a - b))) < 0.05


def test_debug_images():
    """The debug-build RGBA16F debug image (vk_xe_gtao.rs:314-323 +
    XeGTAO.hlsli XE_GTAO_SHOW_NORMALS/_EDGES): right shape/dtype/range,
    and edges light up at a depth discontinuity."""
    from tpurt.passes.gtao import gtao_debug_image

    d = np.full((H, W), 2.0, np.float32)
    d[:, W // 2:] = 3.5
    depth = jnp.asarray(d)
    normal_enc = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.0]), (H, W, 3))
    settings = GtaoSettings(slice_count=2, steps_per_slice=2, denoise=1)
    for mode in ("normals", "edges", "ao"):
        img = np.asarray(gtao_debug_image(depth, normal_enc, consts(),
                                          settings, 0, mode))
        assert img.shape == (H, W, 4) and img.dtype == np.float16
        assert np.isfinite(img).all()
    edges = np.asarray(gtao_debug_image(depth, normal_enc, consts(),
                                        settings, 0, "edges")).astype(
        np.float32)
    # interior flat: edges viz ~0 in rgb; at the seam the left/right
    # channel saturates toward 1
    assert edges[H // 2, 8, :3].max() <= 0.05
    assert edges[H // 2, W // 2, 0] >= 0.9 or edges[H // 2, W // 2 - 1, 0] >= 0.9
