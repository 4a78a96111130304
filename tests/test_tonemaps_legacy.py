"""Legacy tonemap curves (tonemaps.glsl ports)."""
import numpy as np
import jax.numpy as jnp

from tpurt.passes.tonemaps_legacy import (
    aces_film,
    aces_fitted,
    tonemap_lottes,
    tonemap_uchimura,
)


def test_lottes_midpoint_and_range():
    # curve maps midIn 0.18 -> midOut 0.267 by construction
    assert abs(float(tonemap_lottes(jnp.float32(0.18))) - 0.267) < 1e-3
    x = jnp.linspace(0.0, 8.0, 64)
    y = np.asarray(tonemap_lottes(x))
    assert (np.diff(y) >= -1e-6).all(), "must be monotonic"


def test_uchimura_linear_section():
    # inside the linear section [m, m+l0]: T(x) = m + a*(x - m)
    x = jnp.float32(0.3)
    assert abs(float(tonemap_uchimura(x)) - (0.22 + (0.3 - 0.22))) < 1e-5
    assert float(tonemap_uchimura(jnp.float32(100.0))) <= 1.0 + 1e-5


def test_aces_film_range():
    x = jnp.linspace(0, 100, 128)
    y = np.asarray(aces_film(x))
    assert (y >= 0).all() and (y <= 1).all()
    assert y[-1] > 0.99


def test_aces_fitted_grey_in_range():
    out = np.asarray(aces_fitted(jnp.full((1, 3), 0.18)))
    assert (out > 0.0).all() and (out < 1.0).all()
