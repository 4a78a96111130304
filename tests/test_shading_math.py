"""Unit tests for BRDF, light, encoding and LPM tonemap math."""
import math

import jax.numpy as jnp
import numpy as np

from tpurt.passes import brdf, light as lightlib
from tpurt.passes.encodings import (
    pack_unorm8,
    quantize_r11g11b10f,
    quantize_r16f,
    r11g11b10_unorm_pack,
    r11g11b10_unorm_unpack,
    srgb_approx,
)
from tpurt.passes.tonemap import LpmParams, lpm_filter, lpm_setup
from tpurt.scene.lights import (
    LIGHT_TYPE_AREA,
    LIGHT_TYPE_DIRECTIONAL,
    LIGHT_TYPE_POINT,
    LIGHT_TYPE_SPOT,
)


def _light(ltype, **kw):
    d = dict(pos=np.zeros(3, np.float32), light_type=np.int32(ltype),
             dir=np.array([0, 0, 1], np.float32), casts_shadows=np.int32(1),
             color=np.ones(3, np.float32), falloff_distance=np.float32(0.0),
             area_pos2=np.zeros(3, np.float32), penumbra_angle=np.float32(0.0),
             area_pos3=np.zeros(3, np.float32), umbra_angle=np.float32(0.0))
    d.update({k: np.asarray(v, np.float32) if not k.endswith("type") else v
              for k, v in kw.items()})
    return {k: jnp.asarray(v) for k, v in d.items()}


# ---------------------------------------------------------------- BRDF ----

def test_d_ggx_scalar():
    # reference formula evaluated by hand
    r, noh = 0.25, 0.9
    one_minus = 1 - noh * noh
    a = noh * r
    k = r / (one_minus + a * a)
    expect = k * k / math.pi
    got = float(brdf.d_ggx(jnp.float32(r), jnp.float32(noh)))
    assert abs(got - expect) < 1e-6


def test_smith_fast_vs_exact_close_at_low_roughness():
    nv = jnp.float32(0.8)
    nl = jnp.float32(0.6)
    fast = float(brdf.v_smith_ggx_correlated_fast(jnp.float32(0.05), nv, nl))
    exact = float(brdf.v_smith_ggx_correlated(jnp.float32(0.05), nv, nl))
    assert abs(fast - exact) / exact < 0.1


def test_f_schlick_endpoints():
    F0 = jnp.array([0.04, 0.04, 0.04])
    assert np.allclose(np.asarray(brdf.f_schlick(F0, jnp.float32(1.0))), 0.04)
    assert np.allclose(np.asarray(brdf.f_schlick(F0, jnp.float32(0.0))), 1.0, atol=1e-6)


def test_burley_local_sss_matches_plain_formula():
    r, ncv, ncl, ldh, ratio = 0.3, 0.7, 0.5, 0.6, 0.4
    F_SS90 = r * ldh * ldh
    fs = lambda f0, x, f90: f0 + (f90 - f0) * (1 - x) ** 5
    F_SS = fs(1.0, ncl, F_SS90) * fs(1.0, ncv, F_SS90)
    f_ss = (1.0 / (ncv * ncl) - 0.5) * F_SS + 0.5
    local_sss = 1.25 * ratio * f_ss
    f90 = 0.5 + 2 * F_SS90
    diffuse = (1 - ratio) * fs(1.0, ncl, f90) * fs(1.0, ncv, f90)
    expect = ncv * (diffuse + local_sss) / math.pi
    got = float(brdf.burley_diffuse_local_sss(
        jnp.float32(r), jnp.float32(ncv), jnp.float32(ncv), jnp.float32(ncl),
        jnp.float32(ldh), 0.4))
    assert abs(got - expect) < 1e-5


# --------------------------------------------------------------- lights ---

def test_point_light_L_and_falloff():
    lt = _light(LIGHT_TYPE_POINT, pos=[0, 2, 0], falloff_distance=4.0)
    pos = jnp.array([[0.0, 0.0, 0.0]])
    L = lightlib.get_unnormalized_L_vec(lt, pos)
    np.testing.assert_allclose(np.asarray(L), [[0, 2, 0]], atol=1e-6)
    rad = lightlib.get_light_radiance(lt, pos, L / jnp.linalg.norm(L))
    expect = max(1 - (2 / 4) ** 2, 0) ** 2
    np.testing.assert_allclose(np.asarray(rad), expect, rtol=1e-6)


def test_directional_light_L():
    lt = _light(LIGHT_TYPE_DIRECTIONAL, dir=[0, -1, 0])
    L = lightlib.get_unnormalized_L_vec(lt, jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(L), [[0, 10, 0]], atol=1e-6)


def test_spot_umbra_penumbra():
    # light at origin pointing -y; receiver below; vary angle
    lt = _light(LIGHT_TYPE_SPOT, pos=[0, 1, 0], dir=[0, -1, 0],
                penumbra_angle=math.radians(30), umbra_angle=math.radians(45))
    # directly below: theta_s = 0 -> t = clamp((0-u)/(p-u)) = clamp(3) = 1
    pos = jnp.array([[0.0, 0.0, 0.0]])
    L = lightlib.get_unnormalized_L_vec(lt, pos)
    Ln = L / jnp.linalg.norm(L, axis=-1, keepdims=True)
    rad = lightlib.get_light_radiance(lt, pos, Ln)
    np.testing.assert_allclose(np.asarray(rad)[0], 1.0, rtol=1e-5)
    # at 60 degrees off-axis: theta_s > umbra -> t = 0
    pos = jnp.array([[math.tan(math.radians(60)), 0.0, 0.0]])
    L = lightlib.get_unnormalized_L_vec(lt, pos)
    Ln = L / jnp.linalg.norm(L, axis=-1, keepdims=True)
    rad = lightlib.get_light_radiance(lt, pos, Ln)
    np.testing.assert_allclose(np.asarray(rad)[0], 0.0, atol=1e-6)


def test_area_light_closest_point_inside_and_clamped():
    # rectangle spanning (0,0,0),(1,0,0),(1,1,0) -> 4th corner (0,1,0)
    lt = _light(LIGHT_TYPE_AREA, pos=[0, 0, 0], area_pos2=[1, 0, 0],
                area_pos3=[1, 1, 0], dir=[0, 0, 1])
    # receiver in front of the middle of the rect: closest point = projection
    pos = jnp.array([[0.5, 0.5, 1.0]])
    L = lightlib.get_unnormalized_L_vec(lt, pos)
    np.testing.assert_allclose(np.asarray(L), [[0, 0, -1]], atol=1e-5)
    # receiver beyond the +x edge: clamps to edge x=1
    pos = jnp.array([[2.0, 0.5, 1.0]])
    L = lightlib.get_unnormalized_L_vec(lt, pos)
    np.testing.assert_allclose(np.asarray(L), [[-1.0, 0, -1]], atol=1e-5)
    # receiver beyond the corner diagonal: clamps to corner (0,1,0) region
    pos = jnp.array([[-1.0, 2.0, 1.0]])
    L = lightlib.get_unnormalized_L_vec(lt, pos)
    np.testing.assert_allclose(np.asarray(L), [[1.0, -1.0, -1]], atol=1e-5)


# ------------------------------------------------------------ encodings ---

def test_r11g11b10f_roundtrip_error_bounds():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 100, size=(256, 3)).astype(np.float32)
    q = np.asarray(quantize_r11g11b10f(jnp.asarray(x)))
    # 6 mantissa bits -> relative error <= 2^-7 (r, g); 5 bits -> 2^-6 (b)
    rel = np.abs(q - x) / np.maximum(x, 1e-6)
    assert rel[:, 0].max() < 2 ** -6.9
    assert rel[:, 1].max() < 2 ** -6.9
    assert rel[:, 2].max() < 2 ** -5.9
    # negatives clamp to 0
    q = np.asarray(quantize_r11g11b10f(jnp.array([[-1.0, -0.5, -2.0]])))
    assert np.all(q == 0)


def test_r16f_roundtrip():
    x = jnp.array([0.1, 1.0, 10000.0], jnp.float32)
    q = np.asarray(quantize_r16f(x))
    assert abs(q[0] - 0.1) < 1e-4 and q[1] == 1.0 and abs(q[2] - 10000.0) < 8


def test_unorm_pack():
    assert int(pack_unorm8(jnp.float32(1.0))) == 255
    assert int(pack_unorm8(jnp.float32(0.0))) == 0
    v = jnp.array([[0.25, 0.5, 1.0]])
    p = r11g11b10_unorm_pack(v)
    u = np.asarray(r11g11b10_unorm_unpack(p))
    np.testing.assert_allclose(u, np.asarray(v), atol=1e-3)


# -------------------------------------------------------------- tonemap ---

def _lpm_map_scalar(color, d):
    """Direct scalar transliteration of LpmMap (ffx_lpm.h:746-811) for the
    709_709 path, as an independent oracle."""
    sat01 = lambda v: min(max(v, 0.0), 1.0)
    r, g, b = color
    m = max(r, g, b)
    if m <= 0.0:
        return (0.0, 0.0, 0.0)
    ratio = [r / m, g / m, b / m]
    ratio = [ratio[i] ** d["saturation"][i] for i in range(3)]
    luma_t = d["luma_t"]
    luma = r * luma_t[0] + g * luma_t[1] + b * luma_t[2]
    luma = luma ** d["contrast"]
    luma = luma / (luma * d["tone_scale_bias"][0] + d["tone_scale_bias"][1])
    luma_ratio = sum(ratio[i] * luma_t[i] for i in range(3))
    ratio_scale = sat01(luma / luma_ratio)
    col = [sat01(ratio[i] * ratio_scale) for i in range(3)]
    cap = [-d["crosstalk"][i] * col[i] + d["crosstalk"][i] for i in range(3)]
    luma_add = sat01(luma - sum(col[i] * luma_t[i] for i in range(3)))
    t = luma_add / sum(cap[i] * luma_t[i] for i in range(3))
    col = [sat01(t * cap[i] + col[i]) for i in range(3)]
    luma_add = sat01(luma - sum(col[i] * luma_t[i] for i in range(3)))
    col = [sat01(luma_add * d["rcp_luma_t"][i] + col[i]) for i in range(3)]
    return tuple(col)


def test_lpm_control_block_values():
    ctl, derived = lpm_setup()
    # contrast = 0.25 + 1
    assert np.float32(1.25).view(np.uint32) == ctl[0, 3]
    # saturation = contrast broadcast
    assert np.allclose(derived["saturation"], 1.25)
    # Rec.709 luma coefficients (normalized Y row of the RGB->XYZ matrix)
    np.testing.assert_allclose(derived["luma_t"], [0.2126, 0.7152, 0.0722], atol=1e-4)
    # unused matrices must be zero for 709_709
    assert np.all(derived["con"] == 0) and np.all(derived["con2"] == 0)
    # packed f16 mirror of saturation
    assert ctl[16, 0] == ((np.float16(1.25).view(np.uint16).astype(np.uint32) << 16)
                          | np.float16(1.25).view(np.uint16))


def test_lpm_filter_matches_scalar_oracle():
    _, derived = lpm_setup()
    d = {k: np.asarray(v, np.float64) for k, v in derived.items()}
    rng = np.random.default_rng(1)
    colors = rng.uniform(0, 32, size=(64, 3)).astype(np.float32)
    got = np.asarray(lpm_filter(jnp.asarray(colors), derived))
    for i in range(len(colors)):
        expect = _lpm_map_scalar(colors[i].astype(np.float64), d)
        np.testing.assert_allclose(got[i], expect, atol=2e-5)


def test_lpm_filter_black_and_bright():
    _, derived = lpm_setup()
    out = np.asarray(lpm_filter(jnp.zeros((4, 3)), derived))
    assert np.all(out == 0.0), "black input must stay black (no NaNs)"
    out = np.asarray(lpm_filter(jnp.full((1, 3), 10000.0), derived))
    assert np.all(out <= 1.0) and np.all(out > 0.97)


def test_srgb_approx():
    np.testing.assert_allclose(
        np.asarray(srgb_approx(jnp.array([0.5]))),
        np.float32(0.5) ** (np.float32(1) / np.float32(2.2)), rtol=1e-5)


def test_lpm_hdr_and_gamut_configs():
    """Non-default LPM prefabs: HDR10RAW_709 (con2+clip into Rec.2020) and
    709_P3 (soft gamut mapping from P3 working space)."""
    from tpurt.passes.tonemap import (
        LPM_COLORS_709_P3,
        LPM_COLORS_HDR10RAW_709,
        LPM_CONFIG_709_P3,
        LPM_CONFIG_HDR10RAW_709,
        lpm_hdr10_raw_scalar,
    )

    _, d = lpm_setup(LpmParams(), LPM_CONFIG_HDR10RAW_709,
                     LPM_COLORS_HDR10RAW_709,
                     scale_c=lpm_hdr10_raw_scalar(1000.0))
    assert np.any(d["con2"] != 0), "HDR10 container conversion must be set"
    out = np.asarray(lpm_filter(jnp.full((4, 3), 0.5), d,
                                config=LPM_CONFIG_HDR10RAW_709))
    assert np.isfinite(out).all() and (out >= 0).all() and (out <= 1).all()
    # grey stays grey through the 709->2020 conversion
    assert np.allclose(out[0, 0], out[0, 1], atol=2e-3)
    assert np.allclose(out[0, 1], out[0, 2], atol=2e-3)

    _, d = lpm_setup(LpmParams(soft_gap=0.02), LPM_CONFIG_709_P3,
                     LPM_COLORS_709_P3)
    assert np.any(d["con"] != 0), "P3->709 conversion must be set"
    out = np.asarray(lpm_filter(jnp.asarray([[4.0, 0.1, 0.1]]), d,
                                config=LPM_CONFIG_709_P3))
    assert np.isfinite(out).all()
    assert out[0, 0] > out[0, 1], "red must dominate after gamut mapping"


def test_ffx_transfer_functions():
    """ffx_a.h output transfer functions (ffx_a.h:1869-1893): spec anchor
    values + to/from round trips."""
    from tpurt.passes.tonemap import (
        a_from_709, a_from_gamma, a_from_pq, a_from_srgb, a_from_two,
        a_to_709, a_to_gamma, a_to_pq, a_to_srgb, a_to_two,
    )

    # start above the linear-segment knee: the reference's min/max-trick
    # inverses (AFrom709F1 etc.) are deliberately not exact below it
    x = jnp.asarray(np.linspace(0.05, 1.0, 257, dtype=np.float32))
    for to, frm, tol in ((a_to_709, a_from_709, 1e-3),
                         (a_to_pq, a_from_pq, 2e-3),
                         (a_to_srgb, a_from_srgb, 1e-3),
                         (a_to_two, a_from_two, 1e-6)):
        rt = np.asarray(frm(to(x)))
        np.testing.assert_allclose(rt, np.asarray(x), atol=tol)
    rt = np.asarray(a_from_gamma(a_to_gamma(x, 1.0 / 2.2), 2.2))
    np.testing.assert_allclose(rt, np.asarray(x), atol=1e-5)

    # PQ (SMPTE ST 2084) anchors: 1.0 -> 1.0; 100 nits (0.01) -> ~0.508
    assert abs(float(a_to_pq(jnp.float32(1.0))) - 1.0) < 1e-3
    assert abs(float(a_to_pq(jnp.float32(0.01))) - 0.5081) < 2e-3
    # BT.709 OETF linear-segment boundary behaves per spec
    assert abs(float(a_to_709(jnp.float32(0.001))) - 0.0045) < 1e-4
    # sRGB transfer matches the exact-form encoder at mid grey
    assert abs(float(a_to_srgb(jnp.float32(0.5))) - 0.73536) < 1e-3


def test_tonemap_frame_hdr10():
    """HDR10RAW_709 composite path: PQ-coded output in [0,1], AO-modulated,
    monotone in luminance."""
    from tpurt.passes.tonemap import lpm_setup_hdr10, tonemap_frame_hdr10

    _, derived = lpm_setup_hdr10(display_max_nits=1000.0)
    color = jnp.asarray(
        np.random.default_rng(7).uniform(0, 16, (8, 8, 3)).astype(np.float32))
    ao = jnp.full((8, 8), 255, jnp.uint8)
    out = np.asarray(tonemap_frame_hdr10(color, ao, derived))
    assert out.shape == (8, 8, 3)
    assert np.isfinite(out).all() and (out >= 0).all() and (out <= 1).all()
    # AO scaling: half AO must darken the PQ-coded result
    out_half = np.asarray(tonemap_frame_hdr10(color, ao // 2, derived))
    assert (out_half <= out + 1e-6).all() and out_half.mean() < out.mean()
