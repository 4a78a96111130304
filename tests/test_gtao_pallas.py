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


def _gbuffer(h, w, seed=3):
    rng = np.random.default_rng(seed)
    depth = jnp.asarray(rng.uniform(0.5, 20.0, (h, w)), jnp.float32)
    n = rng.normal(size=(h, w, 3))
    n[..., 2] = -np.abs(n[..., 2])
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return depth, jnp.asarray(n * 0.5 + 0.5, jnp.float32)


@pytest.mark.parametrize("shape,quality", [((64, 128), (2, 2)),
                                           ((96, 96), (9, 3)),
                                           ((50, 70), (3, 3))])
def test_main_pass_pallas_parity(shape, quality):
    """The MXU one-hot-gather main pass vs the XLA gather main pass."""
    from tpurt.kernels.gtao_main_pallas import consts_to_vec, main_pass_pallas
    from tpurt.passes.gtao import (gtao_constants, main_pass, noise_maps_64,
                                   prefilter_depths)

    h, w = shape
    depth, normal_enc = _gbuffer(h, w)
    consts = gtao_constants(w, h, 0.1, 100.0, np.pi / 2, w / h)
    settings = GtaoSettings(*quality, denoise=1)
    mips = prefilter_depths(depth, consts)

    ref_ao, ref_edges = main_pass(mips, normal_enc, consts, settings,
                                  jnp.int32(5))
    got_ao, got_edges = main_pass_pallas(
        mips, normal_enc, consts_to_vec(consts), noise_maps_64(jnp.int32(5)),
        width=w, height=h, slice_count=settings.slice_count,
        steps_per_slice=settings.steps_per_slice, interpret=True,
        precision="exact")

    np.testing.assert_array_equal(np.asarray(got_edges),
                                  np.asarray(ref_edges))
    d = np.abs(np.asarray(got_ao).astype(int) - np.asarray(ref_ao).astype(int))
    # mip-boundary rounding (log vs log2 lowering) + FMA contraction can
    # move single samples; the integrated AO must stay within 2 u8 steps
    # on a tiny pixel fraction
    assert d.max() <= 2, f"max u8 diff {d.max()}"
    assert (d > 0).mean() <= 2e-2, f"diff fraction {(d > 0).mean():.5f}"

    # opt-in half precision: single bf16 matmul per fetch. bf16's 8
    # mantissa bits (vs R16F's 11) perturb the horizon integral — bound
    # the error loosely; this documents the trade-off, default is "exact"
    half_ao, half_edges = main_pass_pallas(
        mips, normal_enc, consts_to_vec(consts), noise_maps_64(jnp.int32(5)),
        width=w, height=h, slice_count=settings.slice_count,
        steps_per_slice=settings.steps_per_slice, interpret=True,
        precision="half")
    np.testing.assert_array_equal(np.asarray(half_edges),
                                  np.asarray(ref_edges))
    dh = np.abs(np.asarray(half_ao).astype(int)
                - np.asarray(ref_ao).astype(int))
    assert dh.max() <= 64, f"half-mode max u8 diff {dh.max()}"
    assert dh.mean() <= 8.0, f"half-mode mean u8 diff {dh.mean():.4f}"


def test_compute_ao_pallas_main_matches_xla():
    from tpurt.passes.gtao import compute_ao, gtao_constants

    h = w = 96
    depth, normal_enc = _gbuffer(h, w, seed=9)
    consts = gtao_constants(w, h, 0.1, 100.0, np.pi / 2, 1.0)
    ref = compute_ao(depth, normal_enc, consts,
                     GtaoSettings(2, 2, denoise=1), jnp.int32(7))
    got = compute_ao(depth, normal_enc, consts,
                     GtaoSettings(2, 2, denoise=1, pallas_main=True,
                                  pallas_denoise=True, precision="exact"),
                     jnp.int32(7))
    d = np.abs(np.asarray(got).astype(int) - np.asarray(ref).astype(int))
    assert d.max() <= 2
    assert (d > 0).mean() <= 2e-2


def test_main_pass_unroll_slices_bit_identical():
    """unroll_slices (measured slower on TPU, GTAO_UNROLL_PROBE.json —
    kept as a recorded experiment) must stay bit-identical to the fori
    default."""
    from tpurt.kernels.gtao_main_pallas import consts_to_vec, main_pass_pallas
    from tpurt.passes.gtao import gtao_constants, noise_maps_64, \
        prefilter_depths

    h, w = 64, 128
    depth, normal_enc = _gbuffer(h, w)
    consts = gtao_constants(w, h, 0.1, 100.0, np.pi / 2, w / h)
    mips = prefilter_depths(depth, consts)
    kw = dict(width=w, height=h, slice_count=3, steps_per_slice=2,
              interpret=True, precision="exact")
    ao_f, e_f = main_pass_pallas(mips, normal_enc, consts_to_vec(consts),
                                 noise_maps_64(jnp.int32(5)), **kw)
    ao_u, e_u = main_pass_pallas(mips, normal_enc, consts_to_vec(consts),
                                 noise_maps_64(jnp.int32(5)),
                                 unroll_slices=True, **kw)
    np.testing.assert_array_equal(np.asarray(ao_f), np.asarray(ao_u))
    np.testing.assert_array_equal(np.asarray(e_f), np.asarray(e_u))


def test_main_pass_batch_schedule_bit_identical():
    """schedule="batch" reorders the slice body (all steps' vector math +
    range reduces before the cond chains, horizons last) without changing
    any value — must stay bit-identical to the step schedule."""
    from tpurt.kernels.gtao_main_pallas import consts_to_vec, main_pass_pallas
    from tpurt.passes.gtao import gtao_constants, noise_maps_64, \
        prefilter_depths

    h, w = 64, 128
    depth, normal_enc = _gbuffer(h, w)
    consts = gtao_constants(w, h, 0.1, 100.0, np.pi / 2, w / h)
    mips = prefilter_depths(depth, consts)
    kw = dict(width=w, height=h, slice_count=3, steps_per_slice=2,
              interpret=True, precision="exact")
    ao_s, e_s = main_pass_pallas(mips, normal_enc, consts_to_vec(consts),
                                 noise_maps_64(jnp.int32(5)), **kw)
    ao_b, e_b = main_pass_pallas(mips, normal_enc, consts_to_vec(consts),
                                 noise_maps_64(jnp.int32(5)),
                                 schedule="batch", **kw)
    np.testing.assert_array_equal(np.asarray(ao_s), np.asarray(ao_b))
    np.testing.assert_array_equal(np.asarray(e_s), np.asarray(e_b))


def test_main_pass_dyn_schedule_bit_identical():
    """schedule="dyn" (the recorded dynamic-mip-loop experiment: traced
    fori over [mip_min, mip_max], scratch-staged planes, uniform windows
    — measured SLOWER on real Mosaic, GTAO_DYN_PROBE.json, default stays
    batch) must remain bit-identical, exact and half precisions."""
    from tpurt.kernels.gtao_main_pallas import consts_to_vec, main_pass_pallas
    from tpurt.passes.gtao import gtao_constants, noise_maps_64, \
        prefilter_depths

    h, w = 64, 128
    depth, normal_enc = _gbuffer(h, w)
    consts = gtao_constants(w, h, 0.1, 100.0, np.pi / 2, w / h)
    mips = prefilter_depths(depth, consts)
    for precision in ("exact", "half"):
        kw = dict(width=w, height=h, slice_count=3, steps_per_slice=2,
                  interpret=True, precision=precision)
        ao_b, e_b = main_pass_pallas(mips, normal_enc, consts_to_vec(consts),
                                     noise_maps_64(jnp.int32(5)),
                                     schedule="batch", **kw)
        ao_d, e_d = main_pass_pallas(mips, normal_enc, consts_to_vec(consts),
                                     noise_maps_64(jnp.int32(5)),
                                     schedule="dyn", **kw)
        np.testing.assert_array_equal(np.asarray(ao_b), np.asarray(ao_d),
                                      err_msg=precision)
        np.testing.assert_array_equal(np.asarray(e_b), np.asarray(e_d))


def test_main_pass_noise_hoist_bit_identical():
    """noise_hoist precomputes the noise-only slice/step transcendentals
    (cos/sin of the slice angle, pow of the sample-distribution curve)
    as 4 quadrant-variant planes selected per tile by the BlockSpec
    index_map — a pure value-preserving hoist (the pre-kernel runs the
    SAME expressions through the same lowering), so it must stay
    bit-identical on the full-frame, banded, and unroll paths."""
    from tpurt.kernels.gtao_main_pallas import consts_to_vec, main_pass_pallas
    from tpurt.passes.gtao import gtao_constants, noise_maps_64, \
        prefilter_depths

    h, w = 96, 96   # 3x3 tiles: exercises both quadrant parities + wrap
    depth, normal_enc = _gbuffer(h, w)
    consts = gtao_constants(w, h, 0.1, 100.0, np.pi / 2, w / h)
    mips = prefilter_depths(depth, consts)
    cv = consts_to_vec(consts)
    nm = noise_maps_64(jnp.int32(5))
    kw = dict(width=w, height=h, slice_count=3, steps_per_slice=2,
              interpret=True, precision="exact", schedule="batch")
    ao_0, e_0 = main_pass_pallas(mips, normal_enc, cv, nm, **kw)
    ao_h, e_h = main_pass_pallas(mips, normal_enc, cv, nm,
                                 noise_hoist=True, **kw)
    np.testing.assert_array_equal(np.asarray(ao_0), np.asarray(ao_h))
    np.testing.assert_array_equal(np.asarray(e_0), np.asarray(e_h))
    # banded (traced row_start: the variant index_map must use ABSOLUTE
    # tile coordinates via the scalar-prefetch row0)
    rs = jnp.int32(32)
    b_0, be_0 = main_pass_pallas(mips, normal_enc, cv, nm,
                                 row_start=rs, num_rows=64, **kw)
    b_h, be_h = main_pass_pallas(mips, normal_enc, cv, nm, noise_hoist=True,
                                 row_start=rs, num_rows=64, **kw)
    np.testing.assert_array_equal(np.asarray(b_0), np.asarray(b_h))
    np.testing.assert_array_equal(np.asarray(be_0), np.asarray(be_h))
    np.testing.assert_array_equal(np.asarray(b_h), np.asarray(ao_0)[32:])
    # unrolled slices (python-int slice index into the hoisted planes)
    u_0, _ = main_pass_pallas(mips, normal_enc, cv, nm,
                              unroll_slices=True, **kw)
    u_h, _ = main_pass_pallas(mips, normal_enc, cv, nm, noise_hoist=True,
                              unroll_slices=True, **kw)
    np.testing.assert_array_equal(np.asarray(u_0), np.asarray(u_h))


def test_main_pass_thin_zero_bit_identical():
    """thin_zero statically elides the falloff_base sqrt: with
    thinOccluderCompensation == 0 (the reference default, XeGTAO.h:111),
    dz*(1.0+0.0) == dz and x**2 == x*x are IEEE-exact so
    falloff_base == dist bit-for-bit."""
    from tpurt.kernels.gtao_main_pallas import consts_to_vec, main_pass_pallas
    from tpurt.passes.gtao import gtao_constants, noise_maps_64, \
        prefilter_depths

    h, w = 64, 128
    depth, normal_enc = _gbuffer(h, w)
    consts = gtao_constants(w, h, 0.1, 100.0, np.pi / 2, w / h)
    assert consts["thin_occluder_compensation"] == 0.0
    mips = prefilter_depths(depth, consts)
    cv = consts_to_vec(consts)
    nm = noise_maps_64(jnp.int32(5))
    kw = dict(width=w, height=h, slice_count=3, steps_per_slice=2,
              interpret=True, precision="exact", schedule="batch")
    ao_0, e_0 = main_pass_pallas(mips, normal_enc, cv, nm, **kw)
    ao_t, e_t = main_pass_pallas(mips, normal_enc, cv, nm,
                                 thin_zero=True, **kw)
    np.testing.assert_array_equal(np.asarray(ao_0), np.asarray(ao_t))
    np.testing.assert_array_equal(np.asarray(e_0), np.asarray(e_t))
