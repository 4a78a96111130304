"""Area-light closest-point construction vs dense grid search.

The closest-point-on-bounded-rectangle math (light.glsl:50-124) is the
trickiest light-path code; verify it against brute-force minimization over a
dense sampling of the rectangle for random receiver positions.
"""
import numpy as np
import jax.numpy as jnp

from tpurt.passes.light import get_unnormalized_L_vec
from tpurt.scene.lights import AreaLight


def test_area_light_L_matches_grid_search():
    rng = np.random.default_rng(42)
    pos = np.array([0.3, -0.2, 0.1], np.float32)
    pos2 = np.array([1.3, 0.1, 0.2], np.float32)
    pos3 = np.array([1.2, 1.1, 0.3], np.float32)
    light_obj = AreaLight(pos, pos2, pos3, False, [1, 1, 1], 0.0,
                          (1.0, 1.1), True)
    d = light_obj.shader_data()
    light = {k: jnp.asarray(v) for k, v in d.items()}

    # rectangle corners: pos, pos2, pos3 and pos4 = pos - pos2 + pos3
    pos4 = pos - pos2 + pos3
    u = np.linspace(0, 1, 201)
    v = np.linspace(0, 1, 201)
    uu, vv = np.meshgrid(u, v)
    # bilinear patch over [pos, pos2; pos4, pos3] spans the (planar) rect
    rect = ((1 - uu)[..., None] * ((1 - vv)[..., None] * pos
                                   + vv[..., None] * pos4)
            + uu[..., None] * ((1 - vv)[..., None] * pos2
                               + vv[..., None] * pos3))
    rect = rect.reshape(-1, 3)

    receivers = rng.normal(scale=2.0, size=(32, 3)).astype(np.float32)
    L = np.asarray(get_unnormalized_L_vec(light, jnp.asarray(receivers)))

    for i, p in enumerate(receivers):
        d2 = ((rect - p) ** 2).sum(axis=1)
        best = rect[np.argmin(d2)]
        expect = best - p
        got = L[i]
        # grid resolution limits precision; compare distances
        assert np.linalg.norm(got) <= np.sqrt(d2.min()) + 2e-2, (
            f"receiver {i}: closest-point farther than grid optimum")
        assert abs(np.linalg.norm(got) - np.sqrt(d2.min())) < 2e-2
