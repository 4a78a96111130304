"""Pallas XeGTAO denoise chain — the tiled-stencil GTAO kernel
(SURVEY.md §2.3: "XeGTAO prefilter/main/denoise -> Pallas tiled kernels").

The denoise chain is N edge-aware 3x3 blur passes over the AO term
(XeGTAO_Denoise, XeGTAO.hlsli:744-838; pass count vk_xe_gtao.rs:1099-1139).
As XLA ops each pass is a full HBM round-trip of the frame; this kernel
fuses ALL N passes into one pass over row blocks with an N-row halo
(overlapped-stencil fusion): each grid step DMAs a (R + 2N, W) window of
the AO/edges images into VMEM, runs the whole chain on-chip (the halo
shrinks one row per pass), and writes the exact R-row result.

Everything is dense VPU math — clamped shifts are pltpu.roll plus an edge
fix, so there are no gathers anywhere (Mosaic's per-lane gather limitation
is what keeps the *main pass*, with its noise-jittered per-pixel mip
sampling, on the XLA gather path — see passes/gtao.py).

Exactness: the XLA chain stores u8 between passes; the kernel replicates
that quantization (floor(x*255+0.5)/255) and the image-boundary clamp
between passes, matching passes.gtao.denoise_pass chained N times except
for executor-level FMA-contraction differences that can flip the final u8
rounding by 1 step on ~0.003-0.03%% of pixels (the float math is
identically ordered; the flip is a sub-ULP scheduling artifact between the
Pallas executor and the fused XLA program — measured across shapes and
pass counts in tests/test_gtao_pallas.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 64
XE_GTAO_OCCLUSION_TERM_SCALE = 1.5  # XeGTAO.hlsli:66
DIAG_WEIGHT = 0.85 * 0.5            # :762
LEAK_THRESHOLD = 2.5                # :782
LEAK_STRENGTH = 0.5


def _shift(img, dy: int, dx: int, rows: int, cols: int):
    """out[y, x] = img[y+dy, x+dx], clamped at the tile borders — the
    in-kernel twin of passes.gtao._shift_clamp. Tile-border row clamping is
    only consumed in halo rows that later passes discard; column clamping
    is exact because blocks span the full image width."""
    out = img
    if dy:
        rolled = pltpu.roll(out, (-dy) % rows, 0)  # roll wants shift >= 0
        rids = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
        if dy > 0:
            rolled = jnp.where(rids >= rows - dy, out[rows - 1:rows], rolled)
        else:
            rolled = jnp.where(rids < -dy, out[0:1], rolled)
        out = rolled
    if dx:
        # the column clamp must read the row-shifted intermediate, or
        # corner pixels clamp to the wrong diagonal source
        rolled = pltpu.roll(out, (-dx) % cols, 1)
        cids = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        if dx > 0:
            rolled = jnp.where(cids >= cols - dx, out[:, cols - 1:cols],
                               rolled)
        else:
            rolled = jnp.where(cids < -dx, out[:, 0:1], rolled)
        out = rolled
    return out


def _unpack4(p):
    """XeGTAO_UnpackEdges (:696-706) on an i32 image -> 4 planes in
    {0, 1/3, 2/3, 1} (LRTB). True division, not reciprocal-multiply, so the
    values match the XLA path bit for bit (3 * fl(1/3) != 1.0)."""
    return (((p >> 6) & 3).astype(jnp.float32) / 3.0,
            ((p >> 4) & 3).astype(jnp.float32) / 3.0,
            ((p >> 2) & 3).astype(jnp.float32) / 3.0,
            (p & 3).astype(jnp.float32) / 3.0)


def _denoise_once(vis, edges_i32, blur: float, final_apply: bool,
                  rows: int, cols: int):
    """One XeGTAO_Denoise pass on a (rows, cols) tile; returns the
    u8-quantized value scaled back to [0, 1] (matching the XLA chain's u8
    store between passes) and the raw u8-equivalent integer value."""
    sh = partial(_shift, rows=rows, cols=cols)

    ec_l, ec_r, ec_t, ec_b = _unpack4(edges_i32)
    el = _unpack4(sh(edges_i32, 0, -1))
    er = _unpack4(sh(edges_i32, 0, 1))
    et = _unpack4(sh(edges_i32, -1, 0))
    eb = _unpack4(sh(edges_i32, 1, 0))

    # symmetry enforcement (:780)
    ec_l = ec_l * el[1]
    ec_r = ec_r * er[0]
    ec_t = ec_t * et[3]
    ec_b = ec_b * eb[2]
    # AO leak for 3-4 edge pixels (:782-786); sequential add order matches
    # XLA's jnp.sum(edges, -1) lowering bit for bit
    esum = ec_l + ec_r + ec_t + ec_b
    edginess = (jnp.clip(4.0 - LEAK_THRESHOLD - esum, 0.0, 1.0)
                / (4.0 - LEAK_THRESHOLD)) * LEAK_STRENGTH
    ec_l = jnp.clip(ec_l + edginess, 0.0, 1.0)
    ec_r = jnp.clip(ec_r + edginess, 0.0, 1.0)
    ec_t = jnp.clip(ec_t + edginess, 0.0, 1.0)
    ec_b = jnp.clip(ec_b + edginess, 0.0, 1.0)

    w_tl = DIAG_WEIGHT * (ec_l * el[2] + ec_t * et[0])
    w_tr = DIAG_WEIGHT * (ec_t * et[1] + ec_r * er[2])
    w_bl = DIAG_WEIGHT * (ec_b * eb[0] + ec_l * el[3])
    w_br = DIAG_WEIGHT * (ec_r * er[3] + ec_b * eb[1])

    sum_weight = jnp.full(vis.shape, jnp.float32(blur))
    total = vis * sum_weight
    for dydx, w in (((0, -1), ec_l), ((0, 1), ec_r), ((-1, 0), ec_t),
                    ((1, 0), ec_b), ((-1, -1), w_tl), ((-1, 1), w_tr),
                    ((1, -1), w_bl), ((1, 1), w_br)):
        total = total + sh(vis, *dydx) * w
        sum_weight = sum_weight + w
    out = total / sum_weight
    if final_apply:
        # XeGTAO_Output (:729-731): ×1.5 then `uint(v*255+0.5)` with NO
        # saturate (R32_UINT store) — final values reach ~383
        out = out * XE_GTAO_OCCLUSION_TERM_SCALE
        q = jnp.floor(jnp.maximum(out, 0.0) * 255.0 + 0.5)
    else:
        q = jnp.floor(jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5)  # u8 store
    return q / 255.0, q


def _chain_kernel(ao_hbm, edges_hbm, out_ref, ao_buf, ed_buf, sems, *,
                  n_passes: int, blur_beta: float, rows: int, cols: int,
                  out_rows: int, last_pos: int, halo: int, last_col: int):
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    cp_a = pltpu.make_async_copy(
        ao_hbm.at[pl.ds(i * out_rows, rows)], ao_buf, sems.at[0])
    cp_e = pltpu.make_async_copy(
        edges_hbm.at[pl.ds(i * out_rows, rows)], ed_buf, sems.at[1])
    cp_a.start()
    cp_e.start()
    cp_a.wait()
    cp_e.wait()

    # Mosaic has no direct u8 <-> f32 casts; widen through i32
    vis = ao_buf[:].astype(jnp.int32).astype(jnp.float32) / 255.0
    edges = ed_buf[:].astype(jnp.int32)
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    q = None
    for p in range(n_passes):
        final = p == n_passes - 1
        vis, q = _denoise_once(vis, edges,
                               blur_beta if final else blur_beta / 5.0,
                               final, rows, cols)
        if not final:
            # re-establish image-boundary clamp semantics for the next
            # pass: the pre-pad only replicates INPUT rows/cols; after a
            # pass, padding beyond the image must mirror the boundary
            # row/column's fresh value (XLA's _shift_clamp reads the
            # boundary pixel itself)
            vis = jnp.where((i == 0) & (rid < halo), vis[halo:halo + 1],
                            vis)
            vis = jnp.where((i == nblk - 1) & (rid > last_pos),
                            vis[last_pos:last_pos + 1], vis)
            if last_col < cols - 1:
                vis = jnp.where(cid > last_col,
                                vis[:, last_col:last_col + 1], vis)
    out_ref[:] = q[halo:halo + out_rows].astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_passes", "blur_beta", "interpret"))
def denoise_chain_pallas(ao_u8, edges_u8, *, n_passes: int,
                         blur_beta: float, interpret: bool | None = None):
    """Run the full N-pass GTAO denoise chain as ONE fused Pallas kernel.
    ao_u8/edges_u8: (H, W) u8. Returns (H, W) u16 in the reference's
    unclamped final-AO range (0..~383, XeGTAO.hlsli:729-731), bit-identical
    to chaining passes.gtao.denoise_pass N times (non-bent-normals path)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    h, w = ao_u8.shape
    # Mosaic DMA slice heights must be 8-aligned: allocate the halo in
    # multiples of 4 so BLOCK_ROWS + 2*halo stays a multiple of 8 (extra
    # halo rows are just wasted context, never read into the output)
    halo = ((n_passes + 3) // 4) * 4
    hp = pl.cdiv(h, BLOCK_ROWS) * BLOCK_ROWS
    wp = pl.cdiv(w, 128) * 128  # Mosaic DMA slices: lanes 128-aligned
    # pre-pad with edge rows/cols: interior halos come from the real
    # neighbor rows; image-boundary padding replicates the edge pixel =
    # clamp semantics (re-established between passes inside the kernel)
    ao_p = jnp.pad(ao_u8, ((halo, hp - h + halo), (0, wp - w)), mode="edge")
    ed_p = jnp.pad(edges_u8, ((halo, hp - h + halo), (0, wp - w)),
                   mode="edge")

    rows = BLOCK_ROWS + 2 * halo
    n_blocks = hp // BLOCK_ROWS
    # tile-local index of the image's last row within the LAST block
    last_pos = halo + (h - 1) - (n_blocks - 1) * BLOCK_ROWS
    kernel = partial(_chain_kernel, n_passes=n_passes, blur_beta=blur_beta,
                     rows=rows, cols=wp, out_rows=BLOCK_ROWS,
                     last_pos=last_pos, halo=halo, last_col=w - 1)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec((BLOCK_ROWS, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((rows, wp), jnp.uint8),
            pltpu.VMEM((rows, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ao_p, ed_p)
    return out[:h, :w].astype(jnp.uint16)
