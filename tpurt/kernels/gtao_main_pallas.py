"""Pallas XeGTAO main pass — MXU one-hot gather over per-tile mip windows.

The XLA main pass (passes/gtao.py:main_pass) costs ~460 ms of a 680 ms
frame at 800x800 ULTRA on TPU v5e: its 54 per-pixel depth-pyramid samples
lower to XLA gathers at ~8.5 ms each. Mosaic forbids per-lane vector
gathers outright, so this kernel re-expresses each sample as dense MXU
math (measured 0.167 ms per sample over the full image — ~50x):

  * the image is processed in 32x32 tiles (8x128 packets, the same swizzle
    as the traversal kernel); per-pixel inputs arrive pre-packeted,
  * per-tile mip windows are cut OUTSIDE the kernel with static indices
    (XLA row gathers) and ride in as pipelined BlockSpec operands — Pallas
    double-buffers the next tile's windows behind this tile's math, and no
    DMA-alignment tax applies (the old in-kernel HBM DMA forced 128-column
    alignment: 72x192/56x256 windows for 64x48-texel footprints; now they
    are exactly (wy, 128)). Sample offsets assigned to mip m are bounded by
    2^(m+3.8) px (= <16 mip-m texels, passes/gtao.py mip selection); mip 4
    (the clamped top level) is resident in full,
  * windows ride as f32 and split into exact (hi, lo) bf16 pairs in-kernel
    (bf16 *operands* mis-lower under Mosaic — see sample_depth),
  * a depth fetch at per-pixel (y, x) becomes, per 128-lane row:
      C = window @ onehot_cols   (wy x 128) @ (128 x 128) on the MXU
      v = sum(C * onehot_rows)   VPU mask-reduce over wy sublanes
    — an exact gather (one-hot matmul copies bits), no gathers,
  * per-lane mip selection = compute from each window, jnp.where-select.

Slice/step loops run as lax.fori_loop (compile-size), directions and mip
levels unroll. Bent normals stay on the XLA path (packed-u32 blur).
Parity vs main_pass: identical math order; executor FMA contraction can
flip the final u8 rounding on a tiny pixel fraction (same caveat as
kernels/gtao_pallas.py).

Reference: XeGTAO.hlsli:246-576 (XeGTAO_MainPass), main_pass.comp.hlsl.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..passes.encodings import quantize_r16f

TILE = 32
HALO = 16               # max |rounded sample offset| in mip-m texels (2^3.8)
PI = 3.1415926535897932384626433832795
PI_HALF = 1.5707963267948966192313216916398
XE_GTAO_DEPTH_MIP_LEVELS = 5
XE_GTAO_OCCLUSION_TERM_SCALE = 1.5

# consts vector layout (SMEM scalar-prefetch operand)
_CK = ("pixel_size_x", "pixel_size_y", "ndc_mul_x", "ndc_mul_y",
       "ndc_add_x", "ndc_add_y", "effect_radius", "radius_multiplier",
       "sample_distribution_power", "thin_occluder_compensation",
       "falloff_range_k", "final_value_power", "depth_mip_sampling_offset",
       "ndc_mul_x_pix")


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _fast_sqrt(x):
    """XeGTAO_FastSqrt (bit trick) — pltpu.bitcast keeps Mosaic happy."""
    xi = pltpu.bitcast(x, jnp.int32)
    return pltpu.bitcast(jnp.int32(0x1FBD1DF5) + (xi >> 1), jnp.float32)


def _fast_acos(x):
    ax = jnp.abs(x)
    res = -0.156583 * ax + PI_HALF
    res = res * _fast_sqrt(jnp.maximum(1.0 - ax, 0.0))
    return jnp.where(x >= 0, res, PI - res)


def _bf16_rn(x):
    """f32 -> f32-holding-a-bf16-value via integer-domain round-to-
    nearest-even. Used for the hi/lo split so the single-plane
    (recentered) fast path's exactness proof rests on arithmetic Mosaic
    cannot legally transform: the split point is pinned by bit ops
    instead of relying on the semantics of the f32->bf16 cast (verified
    on-chip: with this split, one-plane and two-plane fetches are
    bit-identical over the whole bench frame)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    rnd = jax.lax.shift_right_logical(bits, 16) & 1
    hib = (bits + rnd + 0x7FFF) & jnp.int32(-65536)
    return jax.lax.bitcast_convert_type(hib, jnp.float32)


def _gather_window(stacked, nparts, rely, relx, wy: int, wx: int,
                   iotas=None):
    """Per-pixel fetch win[rely, relx] for an (8, 128) packet via one-hot
    MXU matmuls + mask-reduce per sublane row. `stacked` is (nparts*wy, wx)
    bf16 row-planes that SUM to the fetched value: the exact mode passes
    the (hi, lo) split pair (two stacked planes, reconstructing R16F
    depths bit-exactly — each one-hot output is a single product, so the
    matmul copies bf16 parts exactly and the f32 sum is lossless); the
    recentered-fast and half modes pass a single plane. Planes pre-stack
    along rows (hoisted once per level) so each sublane costs ONE
    (nparts*wy, wx) @ (wx, 128) matmul. `iotas` = the loop-invariant
    (col_iota (wx,128), row_iota (wy,128)) hoisted once per kernel — the
    selector construction (these iotas + compares) is the dominant fetch
    cost (GTAO_SCAFFOLD_PROBE: sharedsel vs exact), so they must not be
    rebuilt per sublane per step."""
    dims = (((1,), (0,)), ((), ()))
    if iotas is None:
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (wx, 128), 0)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (wy, 128), 0)
    else:
        col_iota, row_iota = iotas
    # (measured dead end: int8 selector compares — 4x lanes/op — fail to
    # compile on real Mosaic: arith.cmpi on vector<8x128x4xi8> is
    # unsupported, remote compile HTTP 500. i32 compares stay.)
    rows = []
    for s in range(8):
        onehot_c = (col_iota == relx[s:s + 1]).astype(jnp.bfloat16)
        cs = jax.lax.dot_general(stacked, onehot_c, dims,
                                 preferred_element_type=jnp.float32)
        val = cs[:wy]
        for k in range(1, nparts):
            val = val + cs[k * wy:(k + 1) * wy]
        mask_r = (row_iota == rely[s:s + 1]).astype(jnp.float32)
        rows.append(jnp.sum(val * mask_r, axis=0, keepdims=True))
    return jnp.concatenate(rows, axis=0)


def _plan_windows(mip_shapes, width, height):
    """Static per-mip window plan: (wy, wx, full) per level. Window rows
    cover tile_extent + 2*HALO rounded to the bf16 sublane tile (16);
    columns are one 128-lane row (the footprint is <= 64 texels and the
    windows are cut by gathers, so no DMA alignment slop applies). The top
    level is resident in full — sample offsets clamp INTO it with
    unbounded length (requires mip-4 width <= 128, i.e. frames <= 2048 px
    wide; wider frames take the XLA main pass)."""
    plan = []
    for m, (hm, wm) in enumerate(mip_shapes):
        ext = max(TILE >> m, 1)
        if m == len(mip_shapes) - 1:
            wy, wx, full = _round_up(hm, 16), _round_up(wm, 128), True
        else:
            wy = min(_round_up(ext + 2 * HALO, 16), _round_up(hm, 16))
            # columns: one 128-lane row. The footprint (tile extent +
            # 2*HALO) fits 64 for every non-top level, but wx=64 measured
            # a WASH (scene main 17.6->18.2 ms @800², 62.6->60.5 @1080p) —
            # the MXU pads K to 128 anyway, so halving the contraction
            # dim buys nothing; keep the simple full-row window
            wx = 128
            full = False
        plan.append((wy, wx, full))
    return plan


def _window_starts(plan, mip_shapes, tiles_y: int, tiles_x: int):
    """Static per-tile window origins (y0s (Ty,), x0s (Tx,)) per mip."""
    starts = []
    for m, ((wy, wx, full), (hm, wm)) in enumerate(zip(plan, mip_shapes)):
        if full:
            y0s = np.zeros(tiles_y, np.int32)
            x0s = np.zeros(tiles_x, np.int32)
        else:
            ty = np.arange(tiles_y, dtype=np.int64) * TILE
            tx = np.arange(tiles_x, dtype=np.int64) * TILE
            y0s = np.clip((ty >> m) - HALO, 0, max(hm - wy, 0)).astype(np.int32)
            x0s = np.clip((tx >> m) - HALO, 0, max(wm - wx, 0)).astype(np.int32)
        starts.append((y0s, x0s))
    return starts


def _cut_windows(mip, y0s, x0s, wy: int, wx: int):
    """Cut per-tile (wy, wx) windows from one mip with separable indices:
    rows by tile row (static OR traced — the banded path's origins depend
    on the traced band start), columns by tile column (static,
    edge-clamped; the clamped duplicates are never selected by the
    in-kernel one-hots). Returns (Ty*Tx, wy, wx) f32, row-major tiles."""
    hm, wm = mip.shape
    rows = jnp.clip(jnp.asarray(y0s)[:, None] + jnp.arange(wy)[None, :],
                    0, hm - 1)
    cols = np.clip(np.asarray(x0s)[:, None] + np.arange(wx)[None, :],
                   0, wm - 1)
    n_ty = rows.shape[0]
    r = mip[rows.reshape(-1)]                       # (Ty*wy, wm)
    r = r.reshape(n_ty, wy, wm)
    w = r[:, :, jnp.asarray(cols.reshape(-1))]      # (Ty, wy, Tx*wx)
    w = w.reshape(n_ty, wy, x0s.shape[0], wx)
    return w.transpose(0, 2, 1, 3).reshape(-1, wy, wx)


def _window_minmax(mip, y0s, x0s, wy: int, wx: int):
    """Per-tile (min, max) over the SAME texels _cut_windows would cut
    (identical clip semantics), computed separably — two small gathers
    instead of materializing the (T, wy, wx) windows twice. Returns
    row-major (Ty*Tx,) arrays matching the window/tile order."""
    hm, wm = mip.shape
    cols = np.clip(np.asarray(x0s)[:, None] + np.arange(wx), 0, wm - 1)
    byx = mip[:, jnp.asarray(cols.reshape(-1))].reshape(hm, -1, wx)
    cmin = byx.min(axis=2)                          # (hm, Tx)
    cmax = byx.max(axis=2)
    rows = jnp.clip(jnp.asarray(y0s)[:, None] + jnp.arange(wy), 0, hm - 1)
    n_ty = rows.shape[0]
    rmin = cmin[rows.reshape(-1)].reshape(n_ty, wy, -1).min(axis=1)
    rmax = cmax[rows.reshape(-1)].reshape(n_ty, wy, -1).max(axis=1)
    return rmin.reshape(-1), rmax.reshape(-1)


def _recenter_scalars(mn, mx, windows=None):
    """Per-(tile, level) recentering constant + single-plane eligibility.

    With c = bf16(midrange) and an eligible flag, every window texel v
    satisfies bf16(v - c) + c == v EXACTLY, so a single-bf16-plane gather
    of (win - c) plus the f32 add-back reconstructs the R16F depth
    bit-for-bit — half the one-hot matmul rows of the (hi, lo) pair.

    Eligibility: when `windows` (T, wy, wx) is given — the very texels the
    kernel will fetch — the flag is DIRECT VERIFICATION: evaluate the
    kernel's exact expression bf16_rn(v - c) + c == v over the window
    (same _bf16_rn bit arithmetic, so the predicate IS the property).
    Round 3's analytic span bound (kept as the windowless fallback) proved
    the same property from R16F quantum alignment but had to be
    conservative: it admitted 44-57% of executed fetch rows on the bench
    scene; direct verification admits every tile that is actually exact
    (~97% of level-0 tiles there — GTAO_MIP_STATS.json elig_frac vs
    elig_direct_frac). Ineligible tiles ride c = 0, the classic exact
    (hi, lo) split pair.

    Analytic proof sketch (fallback): mips are R16F-quantized, so every v
    in [mn, mx] is a multiple of the quantum g = 2^(floor(log2 mn) - 10)
    > mn * 2^-11 (mn above the half-float normal range). c is bf16 with
    exponent >= mn's, so c is a multiple of g; v - c is a multiple of g
    bounded to 8 significand bits by the span test -> exact in bf16, and
    the add-back rounds to the representable v itself."""
    c = ((mn + mx) * 0.5).astype(jnp.bfloat16).astype(jnp.float32)
    if windows is not None:
        rec = windows - c[:, None, None]
        ok = jnp.all(_bf16_rn(rec) + c[:, None, None] == windows,
                     axis=(1, 2))
    else:
        ok = (((mx - mn) * 0.5 + jnp.abs(c) * (2.0 ** -8)
               <= 255.0 * mn * (2.0 ** -11))
              & (mn >= 6.2e-5))
    return jnp.where(ok, c, 0.0), ok.astype(jnp.int32)


def _noise_hoist_kernel(sdp_ref, nsl_ref, nsm_ref, out_ref, *,
                        slice_count: int, steps_per_slice: int):
    """Precompute every slice/step quantity that depends ONLY on the 64x64
    noise maps: cos/sin of the slice angle and the pow() of the sample-
    distribution curve — the exact expressions of _kernel.slice_body /
    step_coords, evaluated ONCE per noise quadrant instead of once per
    tile (625x at 800²). Runs as its own one-instance Pallas kernel so the
    transcendentals take the SAME Mosaic lowering as the in-kernel ops
    they replace (XLA's cos/sin/pow are NOT bit-identical to Mosaic's —
    TRANS_EQUIV_PROBE.json: up to 8192 ulp on pow). Inputs: the packeted
    64x64 noise maps (32, 128); output (n_q, 32, 128) where per slice the
    rows are [cos, sin, pow(step 0..S-1)]."""
    nsl = nsl_ref[:]
    nsm = nsm_ref[:]
    sdp = sdp_ref[0]
    i = 0
    for s in range(slice_count):
        sf = jnp.float32(s)
        slice_k = (sf + nsl) / float(slice_count)
        phi = slice_k * PI
        out_ref[i] = jnp.cos(phi)
        out_ref[i + 1] = jnp.sin(phi)
        i += 2
        for st in range(steps_per_slice):
            stf = jnp.float32(st)
            step_base_noise = ((sf + stf * float(steps_per_slice))
                               * 0.6180339887498948482)
            step_noise = jnp.mod(nsm + step_base_noise, 1.0)
            s0 = (stf + step_noise) / float(steps_per_slice)
            out_ref[i] = jnp.power(s0, sdp)
            i += 1


def _noise_hoist_planes(noise_maps, consts_vec, slice_count: int,
                        steps_per_slice: int, interpret: bool):
    """(4, n_q*8, 128) variant planes for the noise-periodic hoist.

    The noise maps tile the image with period 64 px and the kernel's
    tiles are 32x32, so a tile's packeted noise content is one of FOUR
    (8, 128) quadrant variants — variant (ty%2)*2 + (tx%2) in tile
    coordinates. The per-(slice, step) noise-derived planes therefore
    take 4 values frame-wide; the main kernel selects its variant via
    the BlockSpec index_map (scalar-prefetch row0 + program id)."""
    from .traverse_pallas import _to_packets

    n_q = slice_count * (2 + steps_per_slice)
    nsl_pk = _to_packets(jnp.asarray(noise_maps[0]).reshape(-1),
                         height=64, width=64)
    nsm_pk = _to_packets(jnp.asarray(noise_maps[1]).reshape(-1),
                         height=64, width=64)
    sdp = consts_vec[_CK.index("sample_distribution_power")].reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((32, 128), lambda i, *r: (0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((n_q, 32, 128), lambda i, *r: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_noise_hoist_kernel, slice_count=slice_count,
                steps_per_slice=steps_per_slice),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_q, 32, 128), jnp.float32),
        interpret=interpret,
    )(sdp, nsl_pk, nsm_pk)
    # (n_q, 4 variants, 8, 128) -> (4, n_q*8, 128)
    return out.reshape(n_q, 4, 8, 128).transpose(1, 0, 2, 3) \
              .reshape(4, n_q * 8, 128)


def _kernel(consts_ref, row0_ref, flags_ref, centers_ref,  # scalar prefetch
            *rest,                 # [mipmeta] + 12 packeted + windows + outs
            plan, mip_shapes, width, height, tiles_x,
            slice_count: int, steps_per_slice: int, precision: str,
            unroll_slices: bool = False, schedule: str = "step",
            iota_hoist: bool = True, noise_hoist: bool = False,
            thin_zero: bool = False):
    dyn = schedule == "dyn"
    if dyn:
        # dynamic-mip mode: per-level metadata rides in SMEM (traced level
        # index), windows arrive pre-stacked as ONE (5*wy_u, 128) block,
        # and the hoisted bf16 planes are STAGED INTO VMEM SCRATCH so the
        # traced level can pl.ds them (Mosaic has no dynamic_slice on
        # values, but dynamic ref slices are first-class)
        mipmeta_ref = rest[0]
        rest = rest[1:]
    (spx_r, spy_r, vz_r, pl_r, pr_r, pt_r, pb_r,
     nx_r, ny_r, nz_r, nsl_r, nsm_r) = rest[:12]
    if dyn:
        w_all = rest[12]
        ao_out, edges_out = rest[13:15]
        scratch = rest[15:]
        planes_scr = scratch[0]
        planes_hi_scr = scratch[1] if precision == "exact" else None
        wy_u = plan[0][0]
        wins = tuple(w_all[0, m * wy_u:(m + 1) * wy_u] for m in range(5))
    else:
        wins = rest[12:17]
        wins = tuple(w[0] for w in wins)
        if noise_hoist:
            nh_ref = rest[17]
            ao_out, edges_out = rest[18:20]
        else:
            ao_out, edges_out = rest[17:19]
    i = pl.program_id(0)
    # row0_ref holds the band's first tile row (0 for full frames): tile
    # coordinates — and therefore window origins — are ABSOLUTE image
    # coordinates even when only a band of rows is computed
    ty = (row0_ref[0] + i // tiles_x) * TILE
    tx = (i % tiles_x) * TILE
    # per-tile window origins — the same static formula _window_starts
    # used when cutting the windows outside
    win_offs = []
    for m in range(5):
        wy, wx, full = plan[m]
        hm, wm = mip_shapes[m]
        if full:
            win_offs.append((jnp.int32(0), jnp.int32(0)))
        else:
            win_offs.append((
                jnp.clip((ty >> m) - HALO, 0, max(hm - wy, 0)),
                jnp.clip((tx >> m) - HALO, 0, max(wm - wx, 0))))

    # hoisted per-LEVEL recentering + bf16 planes: every step touching
    # level m reuses them (the per-body hi/lo split redid this ~8x —
    # bodies/levels ~= 39/5 on the bench scene). The (hi, lo) bf16 pair
    # reconstructs R16F depths exactly (11 mantissa bits <= 8 + 8; the
    # MXU truncates f32 matmul inputs to bf16, so the exact gather runs
    # as stacked default-precision rows instead of one 3-pass HIGHEST
    # matmul). Recentering (subtracting the per-tile scalar c) costs one
    # VPU pass per level and makes the single-plane gather bit-exact
    # wherever flags_ref says so (see _recenter_scalars); ineligible
    # tiles ride c = 0, i.e. the classic exact (hi, lo) pair.
    # loop-invariant selector iotas: one column iota (wx = 128 for every
    # level) + one row iota per distinct window height (iota_hoist=False
    # rebuilds them per gather — A/B knob)
    if iota_hoist:
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        row_iotas = {wy: jax.lax.broadcasted_iota(jnp.int32, (wy, 128), 0)
                     for wy, _, _ in plan}

    planes = [None] * 5
    planes_hi = [None] * 5
    flags = [None] * 5
    centers = [None] * 5
    if precision in ("exact", "half", "debug_sharedsel"):
        for m in range(5):
            wy, _, _ = plan[m]
            cm = centers_ref[i * 5 + m]
            rec = wins[m] - cm
            if precision == "half":
                planes[m] = rec.astype(jnp.bfloat16)
            else:
                hi_f32 = _bf16_rn(rec)
                hi = hi_f32.astype(jnp.bfloat16)
                lo = _bf16_rn(rec - hi_f32).astype(jnp.bfloat16)
                planes[m] = jnp.concatenate([hi, lo], axis=0)
                planes_hi[m] = hi
            flags[m] = flags_ref[i * 5 + m]
            centers[m] = cm

    if dyn:
        # stage the per-level planes into scratch at static offsets; the
        # fetch loop reads them back with traced-level pl.ds (offsets are
        # wy_u multiples -> sublane-tile aligned for bf16)
        nrows = (2 if precision == "exact" else 1) * plan[0][0]
        for m in range(5):
            planes_scr[m * nrows:(m + 1) * nrows] = planes[m]
            if precision == "exact":
                planes_hi_scr[m * plan[0][0]:(m + 1) * plan[0][0]] = \
                    planes_hi[m]

    # ---- dense per-pixel setup (identical math to passes/gtao.main_pass)
    c = lambda k: consts_ref[_CK.index(k)]  # noqa: E731
    pix_x = c("pixel_size_x")
    pix_y = c("pixel_size_y")
    ndc_mul_x = c("ndc_mul_x")
    ndc_mul_y = c("ndc_mul_y")
    ndc_add_x = c("ndc_add_x")
    ndc_add_y = c("ndc_add_y")

    sp_x = spx_r[:]
    sp_y = spy_r[:]
    viewspace_z = vz_r[:]
    # edges (XeGTAO_CalculateEdges) -> packed u8
    e_l = pl_r[:] - viewspace_z
    e_r = pr_r[:] - viewspace_z
    e_t = pt_r[:] - viewspace_z
    e_b = pb_r[:] - viewspace_z
    slope_lr = (e_r - e_l) * 0.5
    slope_tb = (e_b - e_t) * 0.5
    el2 = jnp.minimum(jnp.abs(e_l), jnp.abs(e_l + slope_lr))
    er2 = jnp.minimum(jnp.abs(e_r), jnp.abs(e_r - slope_lr))
    et2 = jnp.minimum(jnp.abs(e_t), jnp.abs(e_t + slope_tb))
    eb2 = jnp.minimum(jnp.abs(e_b), jnp.abs(e_b - slope_tb))
    denom = viewspace_z * 0.011

    def eq(e):
        return jnp.round(jnp.clip(1.25 - e / denom, 0.0, 1.0) * 2.9)

    packed = (eq(el2) * 64 + eq(er2) * 16 + eq(et2) * 4 + eq(eb2))
    edges_out[:] = packed.astype(jnp.int32).astype(jnp.uint8)

    # decode normals
    nx = nx_r[:] * 2.0 - 1.0
    ny = ny_r[:] * 2.0 - 1.0
    nz = nz_r[:] * 2.0 - 1.0
    nlen = jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-20)
    nx = nx / nlen
    ny = ny / nlen
    nz = nz / nlen

    viewspace_z = viewspace_z * 0.99920

    def view_pos(spx, spy, z):
        return ((ndc_mul_x * spx + ndc_add_x) * z,
                (ndc_mul_y * spy + ndc_add_y) * z, z)

    px, py, pz = view_pos(sp_x, sp_y, viewspace_z)
    plen = jnp.maximum(jnp.sqrt(px * px + py * py + pz * pz), 1e-20)
    vx = -px / plen
    vy = -py / plen
    vz = -pz / plen

    effect_radius = c("effect_radius") * c("radius_multiplier")
    sdp = c("sample_distribution_power")
    thin = c("thin_occluder_compensation")
    falloff_k = c("falloff_range_k")      # effect_falloff_range
    falloff_range = falloff_k * effect_radius
    falloff_from = effect_radius * (1.0 - falloff_k)
    falloff_mul = -1.0 / falloff_range
    falloff_add = falloff_from / falloff_range + 1.0

    noise_slice = nsl_r[:]
    noise_sample = nsm_r[:]

    pixel_dir_rb = viewspace_z * c("ndc_mul_x_pix")
    screenspace_radius = effect_radius / pixel_dir_rb
    visibility0 = jnp.clip((10.0 - screenspace_radius) / 100.0,
                           0.0, 1.0) * 0.5
    min_s = 1.3 / screenspace_radius

    mip_off = c("depth_mip_sampling_offset")

    def sample_depth2_dyn(sx_a, sy_a, sx_b, sy_b, mip, mip_min=None,
                          mip_max=None):
        """Dynamic-mip variant of sample_depth2 ("design B"): ONE
        fori_loop over the executed range [mip_min, mip_max] (mean span
        1.44 of 5 levels, GTAO_MIP_STATS.json) replaces the 5-branch cond
        chain. Windows are uniform (wy_u, 128); the hoisted planes stage
        into VMEM scratch so the TRACED level can pl.ds them; per-level
        extents ride in SMEM (mipmeta_ref). Bit-identical to the chain.

        MEASURED OUTCOME (recorded experiment, like the grouped traversal
        kernel): SLOWER — 17.4 vs 16.9 ms @800², 58.4 vs 49.3 @1080p
        (GTAO_DYN_PROBE.json). Mosaic's statically-predicated cond chain
        costs less than the dynamic loop's carry + scratch staging, and
        the uniform windows inflate levels 1-3 from 48 to 64/80 matmul
        rows. The conds+coords layer (4.3 ms @800² / 14.5 @1080p by the
        debug_nofetch/noconds decomposition) is dominated by the EXECUTED
        levels' coordinate math, not by the untaken branches this loop
        removes. Default stays schedule="batch"."""
        sz_a = jnp.zeros_like(sx_a)
        sz_b = jnp.zeros_like(sx_b)
        ux_a = jnp.clip(sx_a, 0.0, 1.0)
        uy_a = jnp.clip(sy_a, 0.0, 1.0)
        ux_b = jnp.clip(sx_b, 0.0, 1.0)
        uy_b = jnp.clip(sy_b, 0.0, 1.0)
        if mip_min is None:
            mip_min = jnp.min(mip)
            mip_max = jnp.max(mip)
        iotas = ((col_iota, row_iotas[wy_u]) if iota_hoist else None)

        def body(m, carry):
            sz_a, sz_b = carry
            use = mip == m
            hm = mipmeta_ref[m]
            wm = mipmeta_ref[5 + m]
            y0 = jnp.clip(jax.lax.shift_right_logical(ty, m) - HALO, 0,
                          jnp.maximum(hm - wy_u, 0))
            x0 = jnp.clip(jax.lax.shift_right_logical(tx, m) - HALO, 0,
                          jnp.maximum(wm - 128, 0))
            hm_f = hm.astype(jnp.float32)
            wm_f = wm.astype(jnp.float32)

            def rel(ux, uy):
                tex_x = jnp.clip((ux * wm_f).astype(jnp.int32), 0, wm - 1)
                tex_y = jnp.clip((uy * hm_f).astype(jnp.int32), 0, hm - 1)
                return (jnp.clip(tex_y - y0, 0, wy_u - 1),
                        jnp.clip(tex_x - x0, 0, 127))

            rely_a, relx_a = rel(ux_a, uy_a)
            rely_b, relx_b = rel(ux_b, uy_b)
            cm = centers_ref[i * 5 + m]
            if precision == "half":
                pl_m = planes_scr[pl.ds(m * wy_u, wy_u)]
                val_a = _gather_window(pl_m, 1, rely_a, relx_a, wy_u, 128,
                                       iotas)
                val_b = _gather_window(pl_m, 1, rely_b, relx_b, wy_u, 128,
                                       iotas)
            else:
                def one_plane(_):
                    hi_m = planes_hi_scr[pl.ds(m * wy_u, wy_u)]
                    return (_gather_window(hi_m, 1, rely_a, relx_a, wy_u,
                                           128, iotas),
                            _gather_window(hi_m, 1, rely_b, relx_b, wy_u,
                                           128, iotas))

                def two_plane(_):
                    pl_m = planes_scr[pl.ds(m * 2 * wy_u, 2 * wy_u)]
                    return (_gather_window(pl_m, 2, rely_a, relx_a, wy_u,
                                           128, iotas),
                            _gather_window(pl_m, 2, rely_b, relx_b, wy_u,
                                           128, iotas))

                val_a, val_b = jax.lax.cond(flags_ref[i * 5 + m] == 1,
                                            one_plane, two_plane, 0)
            return (jnp.where(use, val_a + cm, sz_a),
                    jnp.where(use, val_b + cm, sz_b))

        return jax.lax.fori_loop(mip_min, mip_max + 1, body, (sz_a, sz_b))

    def sample_depth2(sx_a, sy_a, sx_b, sy_b, mip, mip_min=None,
                      mip_max=None):
        """_sample_mip_point for BOTH horizon samples of one step at once:
        the mip selector depends only on the step's offset length, so the
        two fetches share it exactly — one lax.cond per level per STEP
        (instead of two) and one hi/lo window split per taken branch.
        Per-level predication skips the matmuls for untouched levels
        (typical tiles touch 1-2 levels per step). The batch schedule
        passes mip_min/mip_max precomputed (same values, hoisted)."""
        sz_a = jnp.zeros_like(sx_a)
        sz_b = jnp.zeros_like(sx_b)
        if precision == "debug_noconds":
            # diagnostic (wrong AO): skip the per-level cond chain AND the
            # range reduces entirely — isolates the pure vector scaffold
            # (slice/step math + horizons) from conds+reduces+fetch
            return sz_a, sz_b
        ux_a = jnp.clip(sx_a, 0.0, 1.0)
        uy_a = jnp.clip(sy_a, 0.0, 1.0)
        ux_b = jnp.clip(sx_b, 0.0, 1.0)
        uy_b = jnp.clip(sy_b, 0.0, 1.0)
        # TWO vector reduces per step instead of five: the per-level cond
        # predicates become scalar range tests on [mip_min, mip_max]
        # (GTAO_SCAFFOLD_PROBE.json: the 135 any()+branch pairs per tile
        # were ~60% of the whole kernel)
        if mip_min is None:
            mip_min = jnp.min(mip)
            mip_max = jnp.max(mip)
        for m in range(5):
            hm, wm = mip_shapes[m]
            wy, wx, _ = plan[m]
            y0, x0 = win_offs[m]
            win_ref = wins[m]
            use = mip == m

            def fetch(carry, win_ref=win_ref, y0=y0, x0=x0, hm=hm, wm=wm,
                      wy=wy, wx=wx, use=use, m=m):
                # per-STEP work lives inside the cond — round 3 found the
                # texel/window coordinate math for every level of every
                # step (eagerly hoisted out of the conds) was ~60% of the
                # whole kernel; typical tiles take 1-2 of 5 levels. The
                # per-LEVEL bf16 planes are hoisted (5 instances, not 39)
                # — still built in-kernel: bf16 *operands* mis-lower under
                # Mosaic (measured: ~12-20% of pixels wrong while the
                # interpreter was exact); f32 windows + in-kernel casts
                # are safe
                sz_a, sz_b = carry

                def rel(ux, uy):
                    tex_x = jnp.clip((ux * float(wm)).astype(jnp.int32),
                                     0, wm - 1)
                    tex_y = jnp.clip((uy * float(hm)).astype(jnp.int32),
                                     0, hm - 1)
                    return (jnp.clip(tex_y - y0, 0, wy - 1),
                            jnp.clip(tex_x - x0, 0, wx - 1))

                rely_a, relx_a = rel(ux_a, uy_a)
                rely_b, relx_b = rel(ux_b, uy_b)
                if precision == "debug_nofetch":
                    # diagnostic: skip the gather entirely (wrong AO) —
                    # isolates the slice/step scaffold + window pipeline
                    v = (jnp.sum(win_ref[:1, :128])
                         + jnp.sum(rely_a[:1, :1].astype(jnp.float32))
                         + jnp.sum(relx_b[:1, :1].astype(jnp.float32))
                         ) * 1e-6
                    return (jnp.where(use, sz_a + v, sz_a),
                            jnp.where(use, sz_b + v, sz_b))
                if precision == "debug_sharedsel":
                    # diagnostic: one shared selector for all sublanes
                    # (wrong AO) — isolates one-hot-construction cost
                    relx_a = jnp.broadcast_to(relx_a[:1], relx_a.shape)
                    rely_a = jnp.broadcast_to(rely_a[:1], rely_a.shape)
                    relx_b = relx_a
                    rely_b = rely_a
                cm = centers[m]      # zeros for half/sharedsel modes
                iotas = ((col_iota, row_iotas[wy]) if iota_hoist
                         else None)
                gw = _gather_window
                if precision == "half":
                    val_a = gw(planes[m], 1, rely_a, relx_a, wy, wx, iotas)
                    val_b = gw(planes[m], 1, rely_b, relx_b, wy, wx, iotas)
                elif precision == "debug_sharedsel":
                    val_a = gw(planes[m], 2, rely_a, relx_a, wy, wx, iotas)
                    val_b = gw(planes[m], 2, rely_b, relx_b, wy, wx, iotas)
                else:
                    # recentered fast path: where _recenter_scalars proved
                    # single-plane exactness, spend HALF the matmul rows
                    # (~44-57% of executed fetch rows on the bench scene)
                    def one_plane(_):
                        return (
                            gw(planes_hi[m], 1, rely_a, relx_a, wy, wx,
                               iotas),
                            gw(planes_hi[m], 1, rely_b, relx_b, wy, wx,
                               iotas))

                    def two_plane(_):
                        return (
                            gw(planes[m], 2, rely_a, relx_a, wy, wx,
                               iotas),
                            gw(planes[m], 2, rely_b, relx_b, wy, wx,
                               iotas))

                    val_a, val_b = jax.lax.cond(flags[m] == 1, one_plane,
                                                two_plane, 0)
                return (jnp.where(use, val_a + cm, sz_a),
                        jnp.where(use, val_b + cm, sz_b))

            sz_a, sz_b = jax.lax.cond((mip_min <= m) & (m <= mip_max),
                                      fetch, lambda s: s, (sz_a, sz_b))
        return sz_a, sz_b

    def slice_body(slice_i, visibility):
        sf = slice_i.astype(jnp.float32)
        if noise_hoist:
            # noise-periodic hoist: cos/sin of the slice angle (and the
            # per-step pow below) depend only on the tiled 64x64 noise
            # maps, so they take 4 quadrant-variant values frame-wide —
            # precomputed by _noise_hoist_kernel (same Mosaic lowering)
            # and selected per tile by the nh BlockSpec index_map
            qb = slice_i * (8 * (2 + steps_per_slice))
            cos_phi = nh_ref[0, pl.ds(qb, 8)]
            sin_phi = nh_ref[0, pl.ds(qb + 8, 8)]
        else:
            slice_k = (sf + noise_slice) / float(slice_count)
            phi = slice_k * PI
            cos_phi = jnp.cos(phi)
            sin_phi = jnp.sin(phi)
        omega_x0 = cos_phi * screenspace_radius
        omega_y0 = -sin_phi * screenspace_radius

        dvx = cos_phi
        dvy = sin_phi
        # ortho_direction_vec = direction - (direction . view) * view
        dd = dvx * vx + dvy * vy
        ox = dvx - dd * vx
        oy = dvy - dd * vy
        oz = -dd * vz
        # axis = normalize(cross(ortho, view))
        ax_ = oy * vz - oz * vy
        ay_ = oz * vx - ox * vz
        az_ = ox * vy - oy * vx
        alen = jnp.maximum(jnp.sqrt(ax_ * ax_ + ay_ * ay_ + az_ * az_),
                           1e-20)
        ax_ = ax_ / alen
        ay_ = ay_ / alen
        az_ = az_ / alen

        na = nx * ax_ + ny * ay_ + nz * az_
        pnx = nx - na * ax_
        pny = ny - na * ay_
        pnz = nz - na * az_
        sign_norm = jnp.sign(ox * pnx + oy * pny + oz * pnz)
        projected_normal_len = jnp.sqrt(pnx * pnx + pny * pny + pnz * pnz)
        cos_norm = jnp.clip(
            (pnx * vx + pny * vy + pnz * vz)
            / jnp.maximum(projected_normal_len, 1e-20), 0.0, 1.0)
        n_angle = sign_norm * _fast_acos(cos_norm)

        low0 = jnp.cos(n_angle + PI_HALF)
        low1 = jnp.cos(n_angle - PI_HALF)

        def step_coords(step):
            """Per-step sample coordinates + per-pixel mip (pure vector
            math, no reduces/branches — batchable across steps)."""
            stf = step.astype(jnp.float32)
            if noise_hoist:
                s = nh_ref[0, pl.ds(qb + 16 + step * 8, 8)] + min_s
            else:
                step_base_noise = ((sf + stf * float(steps_per_slice))
                                   * 0.6180339887498948482)
                step_noise = jnp.mod(noise_sample + step_base_noise, 1.0)
                s = (stf + step_noise) / float(steps_per_slice)
                s = jnp.power(s, sdp) + min_s

            so_x0 = s * omega_x0
            so_y0 = s * omega_y0
            so_len = jnp.sqrt(so_x0 * so_x0 + so_y0 * so_y0)
            mip_level = jnp.clip(
                (jnp.log(jnp.maximum(so_len, 1e-20))
                 * 1.4426950408889634) - mip_off,
                0, XE_GTAO_DEPTH_MIP_LEVELS)
            mip = jnp.clip(jnp.round(mip_level).astype(jnp.int32), 0,
                           XE_GTAO_DEPTH_MIP_LEVELS - 1)

            so_x = jnp.round(so_x0) * pix_x
            so_y = jnp.round(so_y0) * pix_y
            return (sp_x + so_x, sp_y + so_y,
                    sp_x - so_x, sp_y - so_y, mip)

        def _horizon(sx, sy, sz, low, h):
            qx, qy, qz = view_pos(sx, sy, sz)
            dx_ = qx - px
            dy_ = qy - py
            dz_ = qz - pz
            dist = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
            inv = 1.0 / jnp.maximum(dist, 1e-20)
            if thin_zero:
                # thinOccluderCompensation == 0 (the reference default,
                # XeGTAO.h:111): dz*(1.0+0.0) == dz and x**2 == x*x are
                # IEEE-exact, so falloff_base == dist bit-for-bit — the
                # static specialization elides the second sqrt of every
                # horizon evaluation (2 per step per side, 54/px at ULTRA)
                falloff_base = dist
            else:
                falloff_base = jnp.sqrt(
                    dx_ * dx_ + dy_ * dy_
                    + (dz_ * (1.0 + thin)) ** 2)
            weight = jnp.clip(falloff_base * falloff_mul + falloff_add,
                              0.0, 1.0)
            shc = (dx_ * vx + dy_ * vy + dz_ * vz) * inv
            shc = low + (shc - low) * weight
            return jnp.maximum(h, shc)

        def step_body(step, carry):
            h0, h1 = carry
            sxa, sya, sxb, syb, mip = step_coords(step)
            sz0, sz1 = sample_depth2(sxa, sya, sxb, syb, mip)
            h0 = _horizon(sxa, sya, sz0, low0, h0)
            h1 = _horizon(sxb, syb, sz1, low1, h1)
            return h0, h1

        if schedule in ("batch", "dyn"):
            # traversal-kernel lesson (BVH8_STEP_ABLATE.json): emission
            # ORDER beats op count. Phase A issues every step's vector
            # math AND its two range reduces back-to-back (they pipeline
            # instead of each stalling a scalar branch); phase B runs the
            # cond chains on ready scalars; phase C applies the horizons
            # in the original step order. Bit-identical values.
            pre = []
            for step in range(steps_per_slice):
                sxa, sya, sxb, syb, mip = step_coords(jnp.int32(step))
                pre.append((sxa, sya, sxb, syb, mip,
                            jnp.min(mip), jnp.max(mip)))
            sampler = sample_depth2_dyn if dyn else sample_depth2
            szs = [sampler(sxa, sya, sxb, syb, mip, mn, mx)
                   for (sxa, sya, sxb, syb, mip, mn, mx) in pre]
            h0, h1 = low0, low1
            for (sxa, sya, sxb, syb, _, _, _), (sz0, sz1) in zip(pre, szs):
                h0 = _horizon(sxa, sya, sz0, low0, h0)
                h1 = _horizon(sxb, syb, sz1, low1, h1)
        else:
            # steps unroll (static count, typically 3): no loop-carry
            # overhead and Mosaic can overlap consecutive steps' matmuls
            carry = (low0, low1)
            for step in range(steps_per_slice):
                carry = step_body(jnp.int32(step), carry)
            h0, h1 = carry

        pnl = projected_normal_len + (1.0 - projected_normal_len) * 0.05
        hh0 = -_fast_acos(jnp.clip(h1, -1.0, 1.0))
        hh1 = _fast_acos(jnp.clip(h0, -1.0, 1.0))
        sin_n = jnp.sin(n_angle)
        iarc0 = (cos_norm + 2.0 * hh0 * sin_n
                 - jnp.cos(2.0 * hh0 - n_angle)) / 4.0
        iarc1 = (cos_norm + 2.0 * hh1 * sin_n
                 - jnp.cos(2.0 * hh1 - n_angle)) / 4.0
        return visibility + pnl * (iarc0 + iarc1)

    if unroll_slices:
        # static unroll: drops the loop carry and lets Mosaic overlap
        # consecutive slices' matmuls (the step loop already unrolls)
        visibility = visibility0
        for s in range(slice_count):
            visibility = slice_body(jnp.int32(s), visibility)
    else:
        visibility = jax.lax.fori_loop(0, slice_count, slice_body,
                                       visibility0)

    visibility = visibility / float(slice_count)
    visibility = jnp.power(jnp.maximum(visibility, 0.0),
                           c("final_value_power"))
    visibility = jnp.maximum(0.03, visibility)
    vis_packed = jnp.clip(visibility / XE_GTAO_OCCLUSION_TERM_SCALE,
                          0.0, 1.0)
    ao_out[:] = (vis_packed * 255.0 + 0.5).astype(jnp.int32
                                                  ).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("width", "height", "slice_count",
                                   "steps_per_slice", "interpret",
                                   "precision", "num_rows",
                                   "unroll_slices", "schedule",
                                   "iota_hoist", "recenter", "noise_hoist",
                                   "thin_zero"))
def main_pass_pallas(depth_mips, normal_enc, consts_vec, noise_maps, *,
                     width: int, height: int, slice_count: int,
                     steps_per_slice: int, interpret: bool | None = None,
                     precision: str = "exact", row_start=0,
                     num_rows: int | None = None,
                     unroll_slices: bool = False, schedule: str = "step",
                     iota_hoist: bool = True, recenter: str = "direct",
                     noise_hoist: bool = False, thin_zero: bool = False):
    """Pallas main pass over pre-packeted inputs. depth_mips: list of 5
    (H_m, W_m) f32 mips (R16F-quantized values); normal_enc: (H, W, 3);
    consts_vec: (len(_CK),) f32; noise_maps: (nx, ny) each (64, 64) f32.

    Banded output (the multi-chip path, passes/gtao.compute_ao_band):
    num_rows (static, multiple of 32) restricts the OUTPUT to
    [row_start, row_start + num_rows) — row_start may be TRACED (each
    chip's band origin is `axis_index * band` inside shard_map) but must
    be 32-aligned and within [0, height - num_rows]; sampling still sees
    the full depth pyramid and all coordinates stay absolute.

    Returns (ao_u8, edges_u8), each (num_rows or H, W)."""
    from .traverse_pallas import _from_packets, _to_packets

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    full_frame = num_rows is None
    rows_out = height if full_frame else num_rows
    assert rows_out % TILE == 0 or full_frame
    d0 = depth_mips[0]
    mip_shapes = tuple((int(m.shape[0]), int(m.shape[1]))
                      for m in depth_mips)
    plan = tuple(_plan_windows(mip_shapes, width, height))
    dyn = schedule == "dyn"
    assert not (dyn and noise_hoist), \
        "noise_hoist is not supported with schedule='dyn'"
    if dyn:
        # dynamic-mip loop: uniform window rows so a traced level can
        # dynamic-slice the plane hoists; the full top level is cut per
        # tile like the rest (its start formula degenerates to 0)
        assert precision in ("exact", "half"), \
            "schedule='dyn' supports exact/half only"
        wy_u = max(wy for wy, _, _ in plan)
        plan = tuple((wy_u, 128, full) for _, _, full in plan)

    tiles_x = -(-width // TILE)
    # ceil: _to_packets edge-pads non-TILE-aligned frames, so the grid has
    # ceil(rows/TILE) tile rows and every one needs a cut window — flooring
    # here made the last tile row's window BlockSpec index out of bounds
    # (1080p = 33.75 tile rows faulted the TPU worker; banded rows_out is
    # asserted TILE-aligned so the band path is unaffected)
    tiles_y = -(-rows_out // TILE)
    row0 = jnp.asarray(row_start, jnp.int32)
    row0_tiles = row0 // TILE

    # per-tile windows (full top level: one shared window, constant block
    # index). Band origins are traced; _cut_windows handles both.
    win_ops = []
    win_specs = []
    centers_l = []
    flags_l = []
    for m, (wy, wx, full) in enumerate(plan):
        hm, wm = mip_shapes[m]
        if full and not dyn:
            w = _cut_windows(depth_mips[m], np.zeros(1, np.int32),
                             np.zeros(1, np.int32), wy, wx)
            idx = lambda i, *refs: (0, 0, 0)
        else:
            ty_abs = (row0_tiles + jnp.arange(tiles_y)) * TILE
            tx_abs = np.arange(tiles_x, dtype=np.int64) * TILE
            y0s = jnp.clip((ty_abs >> m) - HALO, 0, max(hm - wy, 0))
            x0s = np.clip((tx_abs >> m) - HALO, 0,
                          max(wm - wx, 0)).astype(np.int32)
            w = _cut_windows(depth_mips[m], y0s, x0s, wy, wx)
            idx = lambda i, *refs: (i, 0, 0)
        win_ops.append(w)
        win_specs.append(pl.BlockSpec((1, wy, wx), idx,
                                      memory_space=pltpu.VMEM))
        # per-(tile, level) recentering scalars (exact mode): cheap
        # separable min/max over the SAME texels the window cut takes;
        # other modes read zeros (no recentering)
        n_tiles = tiles_y * tiles_x
        if precision == "exact":
            # candidate c from the cut windows' own min/max, eligibility
            # by DIRECT verification over the same texels the kernel
            # fetches (widest possible single-plane coverage)
            mn = w.min(axis=(1, 2))
            mx = w.max(axis=(1, 2))
            if recenter == "off":
                c = jnp.zeros_like(mn)
                fl = jnp.zeros(mn.shape, jnp.int32)
            else:
                c, fl = _recenter_scalars(
                    mn, mx, windows=w if recenter == "direct" else None)
            if full and not dyn:
                c = jnp.broadcast_to(c, (n_tiles,))
                fl = jnp.broadcast_to(fl, (n_tiles,))
        else:
            c = jnp.zeros((n_tiles,), jnp.float32)
            fl = jnp.zeros((n_tiles,), jnp.int32)
        centers_l.append(c)
        flags_l.append(fl)

    flags5 = jnp.stack(flags_l, axis=1).reshape(-1)      # (T*5,) i32
    centers5 = jnp.stack(centers_l, axis=1).reshape(-1)  # (T*5,) f32

    pk = partial(_to_packets, height=rows_out, width=width)

    def shift_clamp(img, dy, dx):
        h, w = img.shape
        ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
        xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
        return img[ys][:, xs]

    def band(img):
        if full_frame:
            return img
        return jax.lax.dynamic_slice(img, (row0, jnp.int32(0)),
                                     (rows_out, width))

    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    ys = (row0.astype(jnp.float32)
          + jnp.arange(rows_out, dtype=jnp.float32) + 0.5) / height
    sp_x, sp_y = jnp.meshgrid(xs, ys)

    # tile the 64x64 noise maps across the frame (dense, no gathers)
    reps_y = -(-height // 64)
    reps_x = -(-width // 64)
    nsl = band(jnp.tile(noise_maps[0], (reps_y, reps_x))[:height, :width])
    nsm = band(jnp.tile(noise_maps[1], (reps_y, reps_x))[:height, :width])

    packeted = [pk(a.reshape(-1)) for a in (
        sp_x, sp_y, band(d0),
        band(shift_clamp(d0, 0, -1)), band(shift_clamp(d0, 0, 1)),
        band(shift_clamp(d0, -1, 0)), band(shift_clamp(d0, 1, 0)),
        band(normal_enc[..., 0]), band(normal_enc[..., 1]),
        band(normal_enc[..., 2]), nsl, nsm)]

    n_sub = packeted[0].shape[0]
    grid = (n_sub // 8,)
    # every grid step must own a cut window: an OOB window block index is
    # silently clamped by the interpreter but hard-faults the TPU worker
    assert grid[0] == tiles_y * tiles_x, (grid, tiles_y, tiles_x)

    # index_map receives the scalar-prefetch refs as trailing args
    ray_spec = pl.BlockSpec((8, 128), lambda i, *refs: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = partial(_kernel, plan=plan, mip_shapes=mip_shapes, width=width,
                     height=height, tiles_x=tiles_x, slice_count=slice_count,
                     steps_per_slice=steps_per_slice, precision=precision,
                     unroll_slices=unroll_slices, schedule=schedule,
                     iota_hoist=iota_hoist, noise_hoist=noise_hoist,
                     thin_zero=thin_zero)
    scalar_ops = [consts_vec, row0_tiles.reshape(1), flags5, centers5]
    if noise_hoist:
        # 4 quadrant-variant planes of every noise-only slice/step value;
        # the variant is picked per tile from the ABSOLUTE tile coords
        # (scalar-prefetch row0 + program id) — refs[1] is row0_tiles
        nh = _noise_hoist_planes(noise_maps, consts_vec, slice_count,
                                 steps_per_slice, interpret)
        n_qr = nh.shape[1]
        win_ops = win_ops + [nh]
        win_specs = win_specs + [pl.BlockSpec(
            (1, n_qr, 128),
            lambda i, *refs: (((refs[1][0] + i // tiles_x) % 2) * 2
                              + (i % tiles_x) % 2, 0, 0),
            memory_space=pltpu.VMEM)]
    if dyn:
        # one stacked (T, 5*wy_u, 128) window operand + per-level extents
        # in SMEM for the traced-level loop
        win_ops = [jnp.concatenate(win_ops, axis=1)]
        win_specs = [pl.BlockSpec((1, 5 * wy_u, 128),
                                  lambda i, *refs: (i, 0, 0),
                                  memory_space=pltpu.VMEM)]
        mipmeta = jnp.asarray([hm for hm, _ in mip_shapes]
                              + [wm for _, wm in mip_shapes], jnp.int32)
        scalar_ops.append(mipmeta)
    scratch_shapes = []
    if dyn:
        nrows = (2 if precision == "exact" else 1) * wy_u
        scratch_shapes.append(pltpu.VMEM((5 * nrows, 128), jnp.bfloat16))
        if precision == "exact":
            scratch_shapes.append(pltpu.VMEM((5 * wy_u, 128),
                                             jnp.bfloat16))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalar_ops),
        grid=grid,
        in_specs=[ray_spec] * 12 + win_specs,
        scratch_shapes=scratch_shapes,
        out_specs=[
            pl.BlockSpec((8, 128), lambda i, *refs: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, *refs: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    ao_pk, edges_pk = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_sub, 128), jnp.uint8),
                   jax.ShapeDtypeStruct((n_sub, 128), jnp.uint8)],
        interpret=interpret,
    )(*scalar_ops, *packeted, *win_ops)

    unpk = partial(_from_packets, height=rows_out, width=width)
    return (unpk(ao_pk).reshape(rows_out, width),
            unpk(edges_pk).reshape(rows_out, width))


def consts_to_vec(consts: dict) -> jnp.ndarray:
    """Pack the gtao_constants dict into the kernel's consts vector."""
    vals = [consts["viewport_pixel_size"][0], consts["viewport_pixel_size"][1],
            consts["ndc_to_view_mul"][0], consts["ndc_to_view_mul"][1],
            consts["ndc_to_view_add"][0], consts["ndc_to_view_add"][1],
            consts["effect_radius"], consts["radius_multiplier"],
            consts["sample_distribution_power"],
            consts["thin_occluder_compensation"],
            consts["effect_falloff_range"], consts["final_value_power"],
            consts["depth_mip_sampling_offset"],
            consts["ndc_to_view_mul_x_pixel_size"][0]]
    return jnp.asarray(vals, jnp.float32)
