"""Compact mip tiers (VERDICT r3 #4 / r4 #7 — texture HBM amplification):
the pair tier (2 gathers, 2.67x source) and block4 tier (4 gathers,
1.33x) must sample bit-identically to the quad tier (1 gather, 5.33x),
and the automatic budget cutover must walk quad -> pair -> block4 while
shipping exactly one texel table to the device."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.passes.shade import (sample_trilinear_block4,
                                sample_trilinear_pair,
                                sample_trilinear_quad)
from tpurt.scene.scene import (MIP_QUAD_BUDGET_BYTES, build_mip_block4_atlas,
                               build_mip_pair_atlas, build_mip_quad_atlas,
                               mip_pair_bytes, mip_quad_bytes)


def _stack(rng, sizes):
    hmax = max(h for h, w in sizes)
    wmax = max(w for h, w in sizes)
    stack = np.zeros((len(sizes) * 3, hmax, wmax, 4), np.uint8)
    for p, (h, w) in enumerate(sizes):
        for l in range(3):
            stack[p * 3 + l, :h, :w] = rng.integers(
                0, 256, (h, w, 4), dtype=np.uint8)
    return stack, np.asarray(sizes, np.int32)


@pytest.mark.parametrize("sizes", [
    [(16, 16), (8, 32)],
    [(13, 7), (5, 5), (1, 1)],     # odd extents exercise block padding
])
def test_block4_matches_quad_bitexact(sizes):
    rng = np.random.default_rng(11)
    stack, tex_size = _stack(rng, sizes)
    img_of_prim = np.arange(len(sizes), dtype=np.int32)
    uniq = list(range(len(sizes)))

    quad, qoff, qsizes = build_mip_quad_atlas(stack, tex_size,
                                              img_of_prim, uniq)
    b4, boff, bsizes = build_mip_block4_atlas(stack, tex_size,
                                              img_of_prim, uniq)
    np.testing.assert_array_equal(qsizes, bsizes)

    n = 512
    prim = jnp.asarray(rng.integers(0, len(sizes), n).astype(np.int32))
    uv = jnp.asarray(rng.uniform(-1.5, 2.5, (n, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(-1.0, 9.0, n).astype(np.float32))

    a = sample_trilinear_quad(jnp.asarray(quad), jnp.asarray(qoff),
                              jnp.asarray(qsizes), prim, uv, lod)
    b = sample_trilinear_block4(jnp.asarray(b4), jnp.asarray(boff),
                                jnp.asarray(bsizes), prim, uv, lod)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    pr, poff, psizes = build_mip_pair_atlas(stack, tex_size,
                                            img_of_prim, uniq)
    np.testing.assert_array_equal(qsizes, psizes)
    c = sample_trilinear_pair(jnp.asarray(pr), jnp.asarray(poff),
                              jnp.asarray(psizes), prim, uv, lod)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    # the advertised compression: block rows ~1/4, pair rows ~1/2 the quad
    assert b4.shape[0] <= quad.shape[0] // 4 + len(sizes) * 12
    assert pr.shape[0] <= quad.shape[0] // 2 + len(sizes) * 12
    assert mip_pair_bytes(tex_size, uniq) == pr.nbytes


def test_block4_gather_seam_matches_direct():
    """The injected-gather path (sharded tables) batches all 8 corner
    indices in one call and must stay bit-identical."""
    rng = np.random.default_rng(5)
    stack, tex_size = _stack(rng, [(16, 16), (8, 8)])
    img_of_prim = np.arange(2, dtype=np.int32)
    b4, boff, bsizes = build_mip_block4_atlas(stack, tex_size,
                                              img_of_prim, [0, 1])
    n = 257
    prim = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    uv = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(0, 5, n).astype(np.float32))
    tbl = jnp.asarray(b4)

    direct = sample_trilinear_block4(tbl, jnp.asarray(boff),
                                     jnp.asarray(bsizes), prim, uv, lod)
    calls = []

    def gather(flat):
        calls.append(flat.shape)
        return tbl[flat]

    via = sample_trilinear_block4(tbl, jnp.asarray(boff),
                                  jnp.asarray(bsizes), prim, uv, lod,
                                  gather=gather)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(via))
    assert calls == [(8 * n,)], "all 8 corner index sets must batch"


def test_auto_cutover_and_one_tier_shipped():
    """flatten_scene walks quad -> pair -> block4 as the budgets shrink,
    ships exactly one texel table, and the rendered frames are
    identical across all three tiers."""
    import tpurt.scene.scene as scene_mod
    from test_frame import make_renderer

    r_quad = make_renderer(mipmaps=True)
    sc = r_quad.scene
    assert sc.tex_mip_quad is not None and sc.tex_mip_block4 is None \
        and sc.tex_mip_pair is None
    pt = sc.as_pytree()
    for dead in ("tex_stack", "tex_atlas", "tex_quad48", "tex_mip_block4",
                 "tex_mip_pair"):
        assert dead not in pt, f"{dead} must not ship for mip scenes"
    img_quad = np.asarray(r_quad.render()["image"])

    old_q = scene_mod.MIP_QUAD_BUDGET_BYTES
    scene_mod.MIP_QUAD_BUDGET_BYTES = 0   # force the pair tier
    try:
        r_pr = make_renderer(mipmaps=True)
    finally:
        scene_mod.MIP_QUAD_BUDGET_BYTES = old_q
    sc_pr = r_pr.scene
    assert sc_pr.tex_mip_pair is not None and sc_pr.tex_mip_quad is None
    pt_pr = sc_pr.as_pytree()
    assert "tex_mip_quad" not in pt_pr and "tex_stack" not in pt_pr
    img_pr = np.asarray(r_pr.render()["image"])
    np.testing.assert_array_equal(img_quad, img_pr)

    old_p = scene_mod.MIP_PAIR_BUDGET_BYTES
    scene_mod.MIP_QUAD_BUDGET_BYTES = 0   # force the block4 tier
    scene_mod.MIP_PAIR_BUDGET_BYTES = 0
    try:
        r_b4 = make_renderer(mipmaps=True)
    finally:
        scene_mod.MIP_QUAD_BUDGET_BYTES = old_q
        scene_mod.MIP_PAIR_BUDGET_BYTES = old_p
    sc4 = r_b4.scene
    assert sc4.tex_mip_block4 is not None and sc4.tex_mip_quad is None
    pt4 = sc4.as_pytree()
    assert "tex_mip_quad" not in pt4 and "tex_stack" not in pt4
    img_b4 = np.asarray(r_b4.render()["image"])
    np.testing.assert_array_equal(img_quad, img_b4)

    # the cutover estimate matches the built table exactly
    est = mip_quad_bytes(np.asarray(sc.tex_size),
                         list(np.unique(np.asarray(sc.tex_img_of_prim),
                                        return_index=True)[1]))
    assert est == sc.tex_mip_quad.nbytes
    assert MIP_QUAD_BUDGET_BYTES > 0


def test_pair_gather_seam_matches_direct():
    """The injected-gather path batches all 4 pair-row index vectors in
    one call and must stay bit-identical."""
    rng = np.random.default_rng(6)
    stack, tex_size = _stack(rng, [(16, 16), (13, 7)])
    img_of_prim = np.arange(2, dtype=np.int32)
    pr, poff, psizes = build_mip_pair_atlas(stack, tex_size,
                                            img_of_prim, [0, 1])
    n = 193
    prim = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    uv = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(0, 5, n).astype(np.float32))
    tbl = jnp.asarray(pr)

    direct = sample_trilinear_pair(tbl, jnp.asarray(poff),
                                   jnp.asarray(psizes), prim, uv, lod)
    calls = []

    def gather(flat):
        calls.append(flat.shape)
        return tbl[flat]

    via = sample_trilinear_pair(tbl, jnp.asarray(poff),
                                jnp.asarray(psizes), prim, uv, lod,
                                gather=gather)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(via))
    assert calls == [(4 * n,)], "all 4 pair index sets must batch"
