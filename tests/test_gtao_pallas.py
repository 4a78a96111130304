"""Fused Pallas denoise chain vs the XLA denoise chain.

Parity bar: identical float math in identical order; the only tolerated
difference is a 1-step u8 rounding flip on <0.1% of pixels caused by
executor-level FMA contraction at exact quantization boundaries (see the
kernel docstring)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.kernels.gtao_pallas import denoise_chain_pallas
from tpurt.passes.gtao import GtaoSettings, denoise_pass


def _assert_u8_parity(got, ref):
    d = np.abs(np.asarray(got).astype(int) - np.asarray(ref).astype(int))
    assert d.max() <= 1, f"max u8 diff {d.max()} > 1"
    assert (d > 0).mean() <= 1e-3, f"diff fraction {(d > 0).mean():.5f}"


def _random_inputs(h, w, seed=0):
    rng = np.random.default_rng(seed)
    ao = rng.integers(0, 256, (h, w), dtype=np.uint8)
    edges = rng.integers(0, 256, (h, w), dtype=np.uint8)
    return jnp.asarray(ao), jnp.asarray(edges)


@pytest.mark.parametrize("denoise", [0, 1, 2, 3])
@pytest.mark.parametrize("shape", [(64, 128), (50, 70), (130, 257)])
def test_denoise_chain_parity(denoise, shape):
    settings = GtaoSettings(1, 2, denoise=denoise)
    ao, edges = _random_inputs(*shape, seed=denoise)

    ref = ao
    n = settings.num_denoise_passes
    for i in range(n):
        ref = denoise_pass(ref, edges, settings, final_apply=(i == n - 1))

    got = denoise_chain_pallas(ao, edges, n_passes=n,
                               blur_beta=settings.denoise_blur_beta,
                               interpret=True)
    _assert_u8_parity(got, ref)


def test_compute_ao_pallas_denoise_matches_xla():
    """Full GTAO chain with the Pallas denoise routed in == XLA chain."""
    from tpurt.passes.gtao import compute_ao, gtao_constants

    rng = np.random.default_rng(3)
    h = w = 96
    depth = jnp.asarray(rng.uniform(0.5, 20.0, (h, w)), jnp.float32)
    n = rng.normal(size=(h, w, 3))
    n[..., 2] = -np.abs(n[..., 2])
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    normal_enc = jnp.asarray(n * 0.5 + 0.5, jnp.float32)
    consts = gtao_constants(w, h, 0.1, 100.0, np.pi / 2, 1.0)

    ref = compute_ao(depth, normal_enc, consts,
                     GtaoSettings(2, 2, denoise=2), jnp.int32(7))
    got = compute_ao(depth, normal_enc, consts,
                     GtaoSettings(2, 2, denoise=2, pallas_denoise=True),
                     jnp.int32(7))
    _assert_u8_parity(got, ref)


def test_renderer_frame_with_pallas_denoise():
    """End-to-end frame parity with pallas_denoise on (the AO difference
    passes through tonemapping, so compare the final image at the same
    tolerance)."""
    from test_frame import make_renderer

    r = make_renderer()
    base = np.asarray(r.render()["image"]).astype(int)
    r2 = make_renderer()
    s = r2.config.gtao
    r2.config.gtao = GtaoSettings(s.slice_count, s.steps_per_slice,
                                  denoise=s.denoise, pallas_denoise=True)
    got = np.asarray(r2.render()["image"]).astype(int)
    d = np.abs(got - base)
    assert d.max() <= 2
    assert (d > 0).mean() <= 3e-3
