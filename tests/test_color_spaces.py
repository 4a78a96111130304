"""passes/color_spaces.py vs an independent scalar re-derivation of
color_spaces.glsl (tobspr) plus analytic fixed points."""
import numpy as np

from tpurt.passes import color_spaces as cs


def _scalar_linear_to_srgb(c):
    """color_spaces.glsl:79-84, scalar python."""
    if c <= 0.0031308:
        return 12.92 * c
    return 1.055 * c ** (1 / 2.4) - 0.055


def _scalar_rgb_to_hcv(rgb):
    """color_spaces.glsl:151-159, scalar python."""
    r, g, b = rgb
    p = (b, g, -1.0, 2.0 / 3.0) if g < b else (g, b, 0.0, -1.0 / 3.0)
    q = (p[0], p[1], p[3], r) if r < p[0] else (r, p[1], p[2], p[0])
    c = q[0] - min(q[3], q[1])
    h = abs((q[3] - q[1]) / (6 * c + 1e-10) + q[2])
    return h, c, q[0]


def test_srgb_transfer_matches_scalar():
    xs = np.linspace(0.0, 1.0, 257)
    ours = np.asarray(cs.linear_to_srgb(xs))
    ref = np.array([_scalar_linear_to_srgb(float(x)) for x in xs])
    assert np.abs(ours - ref).max() < 1e-6
    back = np.asarray(cs.srgb_to_linear(ours))
    assert np.abs(back - xs).max() < 1e-6


def test_hcv_matches_scalar():
    rng = np.random.default_rng(0)
    cols = rng.random((200, 3)).astype(np.float32)
    ours = np.asarray(cs.rgb_to_hcv(cols))
    ref = np.array([_scalar_rgb_to_hcv(c) for c in cols])
    assert np.abs(ours - ref).max() < 1e-5


def test_xyz_fixed_points():
    # D65 white of the sRGB matrix set
    white = np.asarray(cs.rgb_to_xyz(np.array([1.0, 1.0, 1.0])))
    assert np.abs(white - [0.9505, 1.0, 1.089]).max() < 1e-3
    rt = np.asarray(cs.xyz_to_rgb(cs.rgb_to_xyz(np.array([0.2, 0.5, 0.8]))))
    assert np.abs(rt - [0.2, 0.5, 0.8]).max() < 1e-4


def test_hue_wheel_and_hsv_roundtrip():
    assert np.allclose(cs.hue_to_rgb(np.float32(0.0)), [1, 0, 0])
    assert np.allclose(cs.hue_to_rgb(np.float32(1 / 3)), [0, 1, 0])
    assert np.allclose(cs.hue_to_rgb(np.float32(2 / 3)), [0, 0, 1])

    rng = np.random.default_rng(1)
    cols = rng.random((100, 3)).astype(np.float32)
    rt = np.asarray(cs.hsv_to_rgb(cs.rgb_to_hsv(cols)))
    assert np.abs(rt - cols).max() < 1e-4
    rt = np.asarray(cs.hsl_to_rgb(cs.rgb_to_hsl(cols)))
    assert np.abs(rt - cols).max() < 1e-4
    rt = np.asarray(cs.hcy_to_rgb(cs.rgb_to_hcy(cols)))
    assert np.abs(rt - cols).max() < 2e-4


def test_ycbcr_and_xyY():
    g = np.array([0.0, 1.0, 0.0])
    y = np.asarray(cs.rgb_to_ycbcr(g))
    assert abs(y[0] - 0.587) < 1e-6
    rt = np.asarray(cs.xyY_to_rgb(cs.rgb_to_xyY(np.array([0.3, 0.6, 0.1]))))
    assert np.abs(rt - [0.3, 0.6, 0.1]).max() < 1e-4


def test_pipeline_alias_matches_encodings():
    """rgb_to_srgb_approx here == encodings.srgb_approx (the one function
    the reference pipeline actually calls, tonemap.comp.glsl:37)."""
    from tpurt.passes.encodings import srgb_approx

    x = np.random.default_rng(2).random((50, 3)).astype(np.float32)
    assert np.array_equal(np.asarray(cs.rgb_to_srgb_approx(x)),
                          np.asarray(srgb_approx(x)))
