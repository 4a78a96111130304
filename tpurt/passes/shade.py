"""Primary-hit shading: the fused XLA pass over the hit G-buffer.

Re-implements the reference's raygen shading loop
(raytrace.rgen.glsl:106-199) as one vectorized program over all pixels:

* barycentric interpolation of pos/uv/normal/tangent (:116-126),
* Gram-Schmidt TBN with bitangent handedness from v0's tangent.w (:128-131),
* bindless-equivalent texture fetches: layer 0 albedo (sRGB->linear pow 2.2),
  layer 1 ORM (g=roughness, b=metallic), layer 2 normal map (:132-137),
* F0 = mix(0.04, albedo, metallic), roughness^2 (:140-141),
* per light: Cook-Torrance GGX specular + Burley local-SSS diffuse (:146-162),
* shadow ray per shadow-casting light with attenuation 0.05 (:164-182),
* radiance * NdotL accumulation (:184-186),
* outputs: color, view depth = -(view * P).z, view normal encoded
  *0.5+0.5 with y,z negated (:188-199).

Shadow rays are wavefront-batched: one trace_any launch per light over the
whole pixel set, with inactive lanes given tmax = 0 so they exit the BVH in a
single step (the compaction analogue for this 1-bounce pipeline).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..kernels.traverse import trace_any
from . import brdf
from .light import (get_light_radiance, get_unnormalized_L_vec,
                    light_radiance_p, unnormalized_L_vec_p)

LOCAL_SSS_RATIO = 0.4
SHADOW_T_MIN = 0.01
SHADOW_ATTENUATION = 0.05
MISS_DEPTH = 10000.0


def _normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def sample_bilinear(tex_stack, tex_size, prim, layer: int, uv,
                    images_per_prim: int = 3):
    """Bilinear texture fetch with REPEAT addressing from the stacked
    per-primitive texture array. The reference's sampler is trilinear
    anisotropic, but every texture has one mip level
    (gltf copy info image_mip_levels=1), so it reduces to bilinear.

    tex_stack: (P*images_per_prim, H, W, C) u8; tex_size: (P, 2) i32;
    prim: (N,) i32; uv: (N, 2). Returns (N, C) float in [0, 1].
    images_per_prim=1 addresses the packed 12-channel stack directly.
    """
    size = tex_size[prim].astype(jnp.float32)  # (N, 2) = (h, w)
    h = size[:, 0]
    w = size[:, 1]
    px = uv[:, 0] * w - 0.5
    py = uv[:, 1] * h - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0

    hi = tex_size[prim][:, 0]
    wi = tex_size[prim][:, 1]
    x0i = jnp.mod(x0.astype(jnp.int32), wi)
    y0i = jnp.mod(y0.astype(jnp.int32), hi)
    x1i = jnp.mod(x0i + 1, wi)
    y1i = jnp.mod(y0i + 1, hi)

    img = prim * images_per_prim + layer
    t00 = tex_stack[img, y0i, x0i].astype(jnp.float32)
    t10 = tex_stack[img, y0i, x1i].astype(jnp.float32)
    t01 = tex_stack[img, y1i, x0i].astype(jnp.float32)
    t11 = tex_stack[img, y1i, x1i].astype(jnp.float32)
    fx = fx[:, None]
    fy = fy[:, None]
    out = ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
           + (t01 * (1 - fx) + t11 * fx) * fy)
    return out / 255.0


def sample_bilinear_quad(quad, hw, prim, uv):
    """Bilinear REPEAT fetch in ONE gather: quad (P, H, W, 64) u8 rows carry
    the full 2x2 footprint of their texel across the 3 packed layers in
    bytes 0..47 (REPEAT wrap baked in at scene-flatten time, scene.py; rows
    padded to 64 for the fast power-of-two gather path), so the fetch is
    a single flat row gather + the standard lerp. hw: (N, 2) f32 valid
    (h, w) extents. Bit-identical to 4x sample_bilinear on the 12-stack."""
    h = hw[:, 0]
    w = hw[:, 1]
    px = uv[:, 0] * w - 0.5
    py = uv[:, 1] * h - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0)[:, None]
    fy = (py - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), w.astype(jnp.int32))
    y0i = jnp.mod(y0.astype(jnp.int32), h.astype(jnp.int32))
    P, H, W, C = quad.shape
    flat = (prim * H + y0i) * W + x0i
    row = quad.reshape(P * H * W, C)[flat].astype(jnp.float32)
    t00, t10, t01, t11 = (row[:, 0:12], row[:, 12:24],
                          row[:, 24:36], row[:, 36:48])
    out = ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
           + (t01 * (1 - fx) + t11 * fx) * fy)
    return out / 255.0


def _sample_mip_bilinear(atlas, offsets, sizes, prim, layer: int, uv, level):
    """Bilinear REPEAT fetch at an integer mip `level` (per-pixel) from the
    flat mip atlas. atlas (N,4) u8; offsets (P*3,L) i32; sizes (P,L,2)."""
    img = prim * 3 + layer
    hw = sizes[prim, level]                  # (N, 2)
    h = hw[:, 0]
    w = hw[:, 1]
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    px = uv[:, 0] * wf - 0.5
    py = uv[:, 1] * hf - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0)[:, None]
    fy = (py - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    x1i = jnp.mod(x0i + 1, w)
    y1i = jnp.mod(y0i + 1, h)
    base = offsets[img, level]

    def tap(yi, xi):
        return atlas[base + yi * w + xi].astype(jnp.float32)

    out = ((tap(y0i, x0i) * (1 - fx) + tap(y0i, x1i) * fx) * (1 - fy)
           + (tap(y1i, x0i) * (1 - fx) + tap(y1i, x1i) * fx) * fy)
    return out / 255.0


def sample_trilinear(atlas, offsets, sizes, prim, layer: int, uv, lod):
    """Trilinear fetch: bilinear at floor/ceil mip levels, lerped by the
    fractional lod. The TPU analogue of the reference's immutable
    LINEAR/LINEAR/LINEAR sampler (vk_rt_descriptor_set.rs:76-97)."""
    levels = sizes.shape[1]
    lod = jnp.clip(lod, 0.0, float(levels - 1))
    l0 = jnp.floor(lod)
    frac = (lod - l0)[:, None]
    l0i = l0.astype(jnp.int32)
    l1i = jnp.minimum(l0i + 1, levels - 1)
    s0 = _sample_mip_bilinear(atlas, offsets, sizes, prim, layer, uv, l0i)
    s1 = _sample_mip_bilinear(atlas, offsets, sizes, prim, layer, uv, l1i)
    return s0 * (1 - frac) + s1 * frac


def _sample_mip_bilinear_quad(qatlas, qoffsets, sizes, prim, uv, level):
    """Bilinear REPEAT fetch of ALL THREE layers at an integer mip `level`
    in ONE row gather: qatlas (N, 64) u8 quad rows (scene.py
    build_mip_quad_atlas), qoffsets (P, L) i32, sizes (P, L, 2).
    Returns (N, 12) floats [albedo4 | orm4 | normal4]. Bit-identical to
    3x _sample_mip_bilinear."""
    hw = sizes[prim, level]                  # (N, 2)
    h = hw[:, 0]
    w = hw[:, 1]
    px = uv[:, 0] * w.astype(jnp.float32) - 0.5
    py = uv[:, 1] * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0)[:, None]
    fy = (py - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    row = qatlas[qoffsets[prim, level] + y0i * w + x0i].astype(jnp.float32)
    t00, t10, t01, t11 = (row[:, 0:12], row[:, 12:24],
                          row[:, 24:36], row[:, 36:48])
    out = ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
           + (t01 * (1 - fx) + t11 * fx) * fy)
    return out / 255.0


def sample_trilinear_quad(qatlas, qoffsets, sizes, prim, uv, lod):
    """Trilinear fetch of all three layers in TWO row gathers (vs 24
    narrow ones through the per-layer atlas) — same lerp structure as
    sample_trilinear, bit-identical per layer."""
    levels = sizes.shape[1]
    lod = jnp.clip(lod, 0.0, float(levels - 1))
    l0 = jnp.floor(lod)
    frac = (lod - l0)[:, None]
    l0i = l0.astype(jnp.int32)
    l1i = jnp.minimum(l0i + 1, levels - 1)
    s0 = _sample_mip_bilinear_quad(qatlas, qoffsets, sizes, prim, uv, l0i)
    s1 = _sample_mip_bilinear_quad(qatlas, qoffsets, sizes, prim, uv, l1i)
    return s0 * (1 - frac) + s1 * frac


def sample_anisotropic_quad(qatlas, qoffsets, sizes, prim, uv, lod_minor,
                            duv_major, taps: int):
    """Anisotropic filtering through the quad mip atlas: `taps` trilinear
    quad fetches along the footprint's major axis, averaged."""
    acc = None
    for i in range(taps):
        f = (i + 0.5) / taps - 0.5
        s = sample_trilinear_quad(qatlas, qoffsets, sizes, prim,
                                  uv + duv_major * f, lod_minor)
        acc = s if acc is None else acc + s
    return acc / taps


def ray_cone_lod(t, direction, N, p0, p1, p2, uv0, uv1, uv2, tex_w, tex_h,
                 spread):
    """Texture LOD from the ray-cone footprint (Akenine-Moeller et al.,
    "Texture Level of Detail Strategies for Real-Time Ray Tracing"): cone
    diameter at the hit projected onto the surface, converted to texels via
    the triangle's uv-per-world-area density."""
    cone_diam = t * spread
    cos_in = jnp.abs(jnp.sum(N * direction, axis=-1))
    footprint = cone_diam / jnp.maximum(cos_in, 0.25)  # bounded anisotropy
    e1 = p1 - p0
    e2 = p2 - p0
    world_area = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    duv1 = uv1 - uv0
    duv2 = uv2 - uv0
    uv_area = 0.5 * jnp.abs(duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
    texel_per_world = jnp.sqrt(
        uv_area * tex_w * tex_h / jnp.maximum(world_area, 1e-12))
    return jnp.log2(jnp.maximum(footprint * texel_per_world, 1e-6))


def ray_cone_aniso(t, direction, N, p0, p1, p2, uv0, uv1, uv2, tex_w, tex_h,
                   spread, max_aniso: int = 16):
    """Elliptical ray-cone footprint for anisotropic filtering (the
    reference's immutable sampler has max_anisotropy=16,
    vk_rt_descriptor_set.rs:76-97). The cone's circular cross-section
    elongates by 1/|N.D| along the view direction projected into the
    surface plane; the minor axis stays the cone diameter. Returns
    (lod_minor, duv_major): the minor-axis mip level and the FULL
    major-axis extent in UV space (to distribute taps along)."""
    cone_diam = t * spread
    d_dot_n = jnp.sum(N * direction, axis=-1)
    cos_in = jnp.abs(d_dot_n)

    # minor-axis footprint in texels -> base LOD (no 1/cos elongation)
    e1 = p1 - p0
    e2 = p2 - p0
    world_area = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    duv1 = uv1 - uv0
    duv2 = uv2 - uv0
    uv_area = 0.5 * jnp.abs(duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
    texel_per_world = jnp.sqrt(
        uv_area * tex_w * tex_h / jnp.maximum(world_area, 1e-12))
    lod_minor = jnp.log2(jnp.maximum(cone_diam * texel_per_world, 1e-6))

    # major-axis direction: D projected into the surface plane
    proj = direction - d_dot_n[:, None] * N
    plen = jnp.linalg.norm(proj, axis=-1)
    pdir = proj / jnp.maximum(plen, 1e-20)[:, None]
    aniso = jnp.clip(1.0 / jnp.maximum(cos_in, 1e-4), 1.0, float(max_aniso))
    major_len = cone_diam * aniso

    # world direction -> UV direction: solve pdir = a*e1 + b*e2 in the
    # triangle plane (2x2 Gram system), then duv = a*duv1 + b*duv2
    g11 = jnp.sum(e1 * e1, axis=-1)
    g12 = jnp.sum(e1 * e2, axis=-1)
    g22 = jnp.sum(e2 * e2, axis=-1)
    r1 = jnp.sum(pdir * e1, axis=-1)
    r2 = jnp.sum(pdir * e2, axis=-1)
    det = g11 * g22 - g12 * g12
    # degenerate triangles (near-parallel edges) make the Gram solve blow
    # up — fall back to an isotropic tap (duv = 0) instead of sampling
    # across the whole texture. Relative test: det/(g11*g22) = sin^2(angle)
    ok = (det > 1e-8 * g11 * g22)[:, None]
    inv_det = 1.0 / jnp.maximum(det, 1e-30)
    a = (r1 * g22 - r2 * g12) * inv_det
    b = (g11 * r2 - g12 * r1) * inv_det
    duv_per_world = a[:, None] * duv1 + b[:, None] * duv2
    duv_major = jnp.where(ok, duv_per_world * major_len[:, None], 0.0)
    return lod_minor, duv_major


def sample_anisotropic(atlas, offsets, sizes, prim, layer: int, uv,
                       lod_minor, duv_major, taps: int):
    """Anisotropic filtering as `taps` trilinear taps spread along the
    footprint's major axis (each at the minor-axis LOD), averaged — the
    software analogue of the reference sampler's anisotropy=16."""
    acc = None
    for i in range(taps):
        f = (i + 0.5) / taps - 0.5
        s = sample_trilinear(atlas, offsets, sizes, prim, layer,
                             uv + duv_major * f, lod_minor)
        acc = s if acc is None else acc + s
    return acc / taps


# ----------------------------------------------------------------- planes --
# SoA (component-plane) shading core. On TPU the minor axis of an (N, 3)
# array maps to the 128-lane vector axis, so AoS elementwise math runs at
# 3/128 lane occupancy; the plane forms below run the identical float ops
# (same order — results are bit-identical) on (N,) planes at full width.
# Measured ~4x on the shade elementwise block (SHADE_LAYOUT_PROBE.json).

def _norm3_p(x, y, z, eps=1e-20):
    n = jnp.maximum(jnp.sqrt(x * x + y * y + z * z), eps)
    return x / n, y / n, z / n


def _bilerp_planes(rowt, fx, fy):
    """rowt: (64, N) f32 quad-row planes (quad layout: 4 corners x 12
    channels, scene.py); fx/fy: (N,). Returns (12, N) lerped planes —
    the plane form of sample_bilinear_quad's lerp."""
    t00, t10 = rowt[0:12], rowt[12:24]
    t01, t11 = rowt[24:36], rowt[36:48]
    out = ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
           + (t01 * (1 - fx) + t11 * fx) * fy)
    return out / 255.0


def _quad48_fetch_p(quad, h, w, prim, tcu, tcv):
    """sample_bilinear_quad in planes: one row gather + plane lerp.
    Returns (12, N) [albedo4 | orm4 | normal4] planes."""
    px = tcu * w - 0.5
    py = tcv * h - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0i = jnp.mod(x0.astype(jnp.int32), w.astype(jnp.int32))
    y0i = jnp.mod(y0.astype(jnp.int32), h.astype(jnp.int32))
    P, H, W, C = quad.shape
    flat = (prim * H + y0i) * W + x0i
    row = quad.reshape(P * H * W, C)[flat]          # (N, 64)
    return _bilerp_planes(row.T.astype(jnp.float32), fx, fy)


def _mip_quad_fetch_p(qatlas, qoffsets, sizes, prim, tcu, tcv, level):
    """_sample_mip_bilinear_quad in planes. Returns (12, N)."""
    hw = sizes[prim, level]
    h = hw[:, 0]
    w = hw[:, 1]
    px = tcu * w.astype(jnp.float32) - 0.5
    py = tcv * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    row = qatlas[qoffsets[prim, level] + y0i * w + x0i]
    return _bilerp_planes(row.T.astype(jnp.float32), fx, fy)


def _trilinear_quad_p(qatlas, qoffsets, sizes, prim, tcu, tcv, lod):
    """sample_trilinear_quad in planes: two mip fetches + plane lerp."""
    levels = sizes.shape[1]
    lod = jnp.clip(lod, 0.0, float(levels - 1))
    l0 = jnp.floor(lod)
    frac = lod - l0
    l0i = l0.astype(jnp.int32)
    l1i = jnp.minimum(l0i + 1, levels - 1)
    s0 = _mip_quad_fetch_p(qatlas, qoffsets, sizes, prim, tcu, tcv, l0i)
    s1 = _mip_quad_fetch_p(qatlas, qoffsets, sizes, prim, tcu, tcv, l1i)
    return s0 * (1 - frac) + s1 * frac


def _aniso_quad_p(qatlas, qoffsets, sizes, prim, tcu, tcv, lod_minor,
                  duv_mx, duv_my, taps: int):
    """sample_anisotropic_quad in planes."""
    acc = None
    for i in range(taps):
        f = (i + 0.5) / taps - 0.5
        s = _trilinear_quad_p(qatlas, qoffsets, sizes, prim,
                              tcu + duv_mx * f, tcv + duv_my * f, lod_minor)
        acc = s if acc is None else acc + s
    return acc / taps


def _ray_cone_common_p(t, spread, nx, ny, nz, dx, dy, dz,
                       e1x, e1y, e1z, e2x, e2y, e2z,
                       duv1x, duv1y, duv2x, duv2y, tex_w, tex_h):
    """Shared ray-cone quantities in planes (cone diameter, |N.D|,
    texels-per-world density) — same float order as ray_cone_lod/aniso."""
    cone_diam = t * spread
    d_dot_n = nx * dx + ny * dy + nz * dz
    cos_in = jnp.abs(d_dot_n)
    cx = e1y * e2z - e1z * e2y
    cy = e1z * e2x - e1x * e2z
    cz = e1x * e2y - e1y * e2x
    world_area = 0.5 * jnp.sqrt(cx * cx + cy * cy + cz * cz)
    uv_area = 0.5 * jnp.abs(duv1x * duv2y - duv1y * duv2x)
    texel_per_world = jnp.sqrt(
        uv_area * tex_w * tex_h / jnp.maximum(world_area, 1e-12))
    return cone_diam, d_dot_n, cos_in, texel_per_world


def shade(scene: dict, camera: dict, lights: dict, hits: dict,
          origin, direction, *, pallas_tables: str = "",
          height: int = 0, width: int = 0, max_leaf: int = 4,
          shadow_trace_fn=None, aniso_taps: int = 1, image_rows: int = 0):
    """Shade one batch of primary hits.

    Returns dict(color (N,3), depth (N,), normal_enc (N,3)) — the unquantized
    G-buffer; the engine applies format quantization (B10G11R11F / R16F).
    With pallas_tables set, shadow rays go through the packet tracer (shadow
    rays inherit the pixel tiling, so the swizzle stays coherent).
    shadow_trace_fn overrides the occlusion tracer entirely —
    (origin, dir, tmin, tmax) -> bool mask; the sharded-geometry mode
    passes its ring all-to-all tracer here (dist/geometry.py).
    image_rows: the FULL image height, used for the ray-cone spread — pass
    it when `height` is only a band of the frame (multi-chip path), or the
    cone comes out mesh-size× too wide.

    Internally all elementwise math runs on component PLANES (see the SoA
    note above); outputs are restacked once at the end. Float op order
    matches the reference formulas (raytrace.rgen.glsl:106-199) exactly.
    """
    if pallas_tables:
        from ..kernels.traverse_pallas import trace_any_packets
    tri = hits["tri"]
    valid = tri >= 0
    tidx = jnp.maximum(tri, 0)

    u = hits["u"]
    v = hits["v"]
    w = 1.0 - u - v

    def lerp(a0, a1, a2):
        return a0 * w + a1 * u + a2 * v

    texh = texw = None
    if "tri_attr" in scene:
        # gather-optimized path: ONE wide gather fetches all three
        # corners' attributes plus [prim, tex_h, tex_w] (TPU gather cost
        # scales with rows, not row width), then ONE transpose turns the
        # (N, 39) rows into 39 full-lane planes
        at = scene["tri_attr"][tidx].T        # (39, N)
        p0x, p0y, p0z, uv0x, uv0y = at[0], at[1], at[2], at[3], at[4]
        n0x, n0y, n0z = at[5], at[6], at[7]
        t0x, t0y, t0z, t0w = at[8], at[9], at[10], at[11]
        p1x, p1y, p1z, uv1x, uv1y = at[12], at[13], at[14], at[15], at[16]
        n1x, n1y, n1z = at[17], at[18], at[19]
        t1x, t1y, t1z = at[20], at[21], at[22]
        p2x, p2y, p2z, uv2x, uv2y = at[24], at[25], at[26], at[27], at[28]
        n2x, n2y, n2z = at[29], at[30], at[31]
        t2x, t2y, t2z = at[32], at[33], at[34]
        prim = at[36].astype(jnp.int32)       # exact small floats
        texh, texw = at[37], at[38]
    else:
        prim = scene["tri_prim"][tidx]        # (N,)
        vids = scene["tri_vertex"][tidx]      # (N, 3)
        pt = [scene["vtx_pos"][vids[:, k]].T for k in range(3)]
        uvt = [scene["vtx_uv"][vids[:, k]].T for k in range(3)]
        nt = [scene["vtx_normal"][vids[:, k]].T for k in range(3)]
        tt = [scene["vtx_tangent"][vids[:, k]].T for k in range(3)]
        p0x, p0y, p0z = pt[0]
        p1x, p1y, p1z = pt[1]
        p2x, p2y, p2z = pt[2]
        uv0x, uv0y = uvt[0]
        uv1x, uv1y = uvt[1]
        uv2x, uv2y = uvt[2]
        n0x, n0y, n0z = nt[0]
        n1x, n1y, n1z = nt[1]
        n2x, n2y, n2z = nt[2]
        t0x, t0y, t0z, t0w = tt[0]
        t1x, t1y, t1z = tt[1][0], tt[1][1], tt[1][2]
        t2x, t2y, t2z = tt[2][0], tt[2][1], tt[2][2]

    posx, posy, posz = lerp(p0x, p1x, p2x), lerp(p0y, p1y, p2y), \
        lerp(p0z, p1z, p2z)
    tcu, tcv = lerp(uv0x, uv1x, uv2x), lerp(uv0y, uv1y, uv2y)
    wnx, wny, wnz = _norm3_p(lerp(n0x, n1x, n2x), lerp(n0y, n1y, n2y),
                             lerp(n0z, n1z, n2z))
    wtx, wty, wtz = _norm3_p(lerp(t0x, t1x, t2x), lerp(t0y, t1y, t2y),
                             lerp(t0z, t1z, t2z))
    # Gram-Schmidt re-orthogonalization; handedness from v0's tangent.w
    tn = wtx * wnx + wty * wny + wtz * wnz
    wtx, wty, wtz = _norm3_p(wtx - tn * wnx, wty - tn * wny, wtz - tn * wnz)
    wbx = (wny * wtz - wnz * wty) * t0w
    wby = (wnz * wtx - wnx * wtz) * t0w
    wbz = (wnx * wty - wny * wtx) * t0w

    if "tex_atlas" in scene:
        # trilinear mip sampling: LOD from the ray-cone footprint; pixel
        # cone spread angle recovered from proj[1][1] = 1/tan(fovy/2)
        rows = image_rows or height or int(round(float(
            np.sqrt(hits["t"].shape[0]))))
        spread = 2.0 / (camera["proj"][1, 1] * rows)
        hw0 = scene["tex_mip_sizes"][prim, 0].astype(jnp.float32)
        texh, texw = hw0[:, 0], hw0[:, 1]
        quad_mips = scene.get("tex_mip_quad") is not None
        dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
        e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
        e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
        duv1x, duv1y = uv1x - uv0x, uv1y - uv0y
        duv2x, duv2y = uv2x - uv0x, uv2y - uv0y
        cone_diam, d_dot_n, cos_in, texel_per_world = _ray_cone_common_p(
            hits["t"], spread, wnx, wny, wnz, dx, dy, dz,
            e1x, e1y, e1z, e2x, e2y, e2z, duv1x, duv1y, duv2x, duv2y,
            texw, texh)
        if aniso_taps > 1:
            # ray_cone_aniso in planes (same float order)
            lod_minor = jnp.log2(jnp.maximum(cone_diam * texel_per_world,
                                             1e-6))
            prx = dx - d_dot_n * wnx
            pry = dy - d_dot_n * wny
            prz = dz - d_dot_n * wnz
            plen = jnp.sqrt(prx * prx + pry * pry + prz * prz)
            pl = jnp.maximum(plen, 1e-20)
            pdx, pdy, pdz = prx / pl, pry / pl, prz / pl
            aniso = jnp.clip(1.0 / jnp.maximum(cos_in, 1e-4), 1.0, 16.0)
            major_len = cone_diam * aniso
            g11 = e1x * e1x + e1y * e1y + e1z * e1z
            g12 = e1x * e2x + e1y * e2y + e1z * e2z
            g22 = e2x * e2x + e2y * e2y + e2z * e2z
            r1 = pdx * e1x + pdy * e1y + pdz * e1z
            r2 = pdx * e2x + pdy * e2y + pdz * e2z
            det = g11 * g22 - g12 * g12
            ok = det > 1e-8 * g11 * g22
            inv_det = 1.0 / jnp.maximum(det, 1e-30)
            a = (r1 * g22 - r2 * g12) * inv_det
            b = (g11 * r2 - g12 * r1) * inv_det
            duv_mx = jnp.where(ok, (a * duv1x + b * duv2x) * major_len, 0.0)
            duv_my = jnp.where(ok, (a * duv1y + b * duv2y) * major_len, 0.0)
            if quad_mips:
                packed = _aniso_quad_p(
                    scene["tex_mip_quad"], scene["tex_mip_quad_offsets"],
                    scene["tex_mip_sizes"], prim, tcu, tcv, lod_minor,
                    duv_mx, duv_my, aniso_taps)
            else:
                uv = jnp.stack([tcu, tcv], axis=-1)
                duv = jnp.stack([duv_mx, duv_my], axis=-1)
                packed = jnp.concatenate([
                    sample_anisotropic(
                        scene["tex_atlas"], scene["tex_mip_offsets"],
                        scene["tex_mip_sizes"], prim, layer, uv,
                        lod_minor, duv, aniso_taps)
                    for layer in range(3)], axis=-1).T
        else:
            # ray_cone_lod in planes: bounded-anisotropy footprint
            footprint = cone_diam / jnp.maximum(cos_in, 0.25)
            lod = jnp.log2(jnp.maximum(footprint * texel_per_world, 1e-6))
            if quad_mips:
                packed = _trilinear_quad_p(
                    scene["tex_mip_quad"], scene["tex_mip_quad_offsets"],
                    scene["tex_mip_sizes"], prim, tcu, tcv, lod)
            else:
                uv = jnp.stack([tcu, tcv], axis=-1)
                packed = jnp.concatenate([
                    sample_trilinear(scene["tex_atlas"],
                                     scene["tex_mip_offsets"],
                                     scene["tex_mip_sizes"], prim,
                                     layer, uv, lod)
                    for layer in range(3)], axis=-1).T
    elif "tex_quad48" in scene and texh is not None:
        # quad rows: ONE gather fetches the whole 2x2 bilinear footprint of
        # albedo+ORM+normal at once
        packed = _quad48_fetch_p(scene["tex_quad48"], texh, texw, prim,
                                 tcu, tcv)
    elif "tex_stack12" in scene:
        # packed layers: 4 bilinear taps fetch albedo+ORM+normal together
        packed = sample_bilinear(scene["tex_stack12"], scene["tex_size"],
                                 prim, 0, jnp.stack([tcu, tcv], axis=-1),
                                 images_per_prim=1).T
    else:
        uv = jnp.stack([tcu, tcv], axis=-1)
        packed = jnp.concatenate([
            sample_bilinear(scene["tex_stack"], scene["tex_size"], prim,
                            layer, uv) for layer in range(3)], axis=-1).T

    # packed: (12, N) planes = [albedo4 | orm4 | normal4]
    tsx, tsy, tsz = _norm3_p(packed[8] * 2.0 - 1.0, packed[9] * 2.0 - 1.0,
                             packed[10] * 2.0 - 1.0)
    Nx, Ny, Nz = _norm3_p(tsx * wtx + tsy * wbx + tsz * wnx,
                          tsx * wty + tsy * wby + tsz * wny,
                          tsx * wtz + tsy * wbz + tsz * wnz)

    alb = (jnp.power(packed[0], 2.2), jnp.power(packed[1], 2.2),
           jnp.power(packed[2], 2.2))
    roughness = packed[5]
    metallic = packed[6]

    camera_pos = camera["camera_pos"]
    Vx, Vy, Vz = _norm3_p(camera_pos[0] - posx, camera_pos[1] - posy,
                          camera_pos[2] - posz)
    one_minus_metal = 1.0 - metallic
    F0 = tuple(0.04 * one_minus_metal + alb[c] * metallic for c in range(3))
    corrected_roughness = roughness * roughness

    nc_NdotV = Nx * Vx + Ny * Vy + Nz * Vz
    NdotV = jnp.clip(nc_NdotV, 1e-5, 1.0)

    num_lights = lights["pos"].shape[0]
    rho = [jnp.zeros_like(roughness) for _ in range(3)]
    for i in range(num_lights):
        light = {k: arr[i] for k, arr in lights.items()}
        nnx, nny, nnz = unnormalized_L_vec_p(light, posx, posy, posz)
        L_len = jnp.sqrt(nnx * nnx + nny * nny + nnz * nnz)
        safe_len = jnp.maximum(L_len, 1e-20)
        Lx, Ly, Lz = nnx / safe_len, nny / safe_len, nnz / safe_len
        Hx, Hy, Hz = _norm3_p(Vx + Lx, Vy + Ly, Vz + Lz)

        nc_NdotL = Nx * Lx + Ny * Ly + Nz * Lz
        NdotL = jnp.clip(nc_NdotL, 0.0, 1.0)
        NdotH = jnp.clip(Nx * Hx + Ny * Hy + Nz * Hz, 0.0, 1.0)
        LdotH = jnp.clip(Lx * Hx + Ly * Hy + Lz * Hz, 0.0, 1.0)

        DG = brdf.d_ggx(corrected_roughness, NdotH) \
            * brdf.v_smith_ggx_correlated_fast(corrected_roughness,
                                               NdotV, NdotL)
        burley = brdf.burley_diffuse_local_sss(
            corrected_roughness, NdotV, nc_NdotV, nc_NdotL, LdotH,
            LOCAL_SSS_RATIO)

        shadow_attenuation = jnp.ones_like(NdotL)
        wants_shadow = valid & (light["casts_shadows"] > 0) & (nc_NdotL > 0)
        # inactive lanes get tmax=0 -> they leave the BVH on the first step
        t_max = jnp.where(wants_shadow, L_len, 0.0)
        world_pos = jnp.stack([posx, posy, posz], axis=-1)
        L = jnp.stack([Lx, Ly, Lz], axis=-1)
        if shadow_trace_fn is not None:
            occluded = shadow_trace_fn(world_pos, L, SHADOW_T_MIN, t_max)
        elif pallas_tables:
            occluded = trace_any_packets(scene["bvh"], scene["geom"],
                                         world_pos, L, SHADOW_T_MIN, t_max,
                                         height=height, width=width,
                                         max_leaf=max_leaf,
                                         tables=pallas_tables)
        else:
            occluded = trace_any(scene["bvh"], scene["geom"], world_pos, L,
                                 SHADOW_T_MIN, t_max, max_leaf=max_leaf)
        shadow_attenuation = jnp.where(wants_shadow & occluded,
                                       SHADOW_ATTENUATION, shadow_attenuation)

        rad = light_radiance_p(light, posx, posy, posz, Lx, Ly, Lz)
        active = light.get("active", jnp.float32(1.0))
        s = shadow_attenuation * NdotL * active
        for c in range(3):
            Ks_c = brdf.f_schlick(F0[c], LdotH)
            rho_s_c = DG * Ks_c
            rho_d_c = one_minus_metal * alb[c] * burley
            rho[c] = rho[c] + (rho_s_c + rho_d_c) * rad[c] * s

    out_color = jnp.stack(
        [jnp.where(valid, rho[c], 0.0) for c in range(3)], axis=-1)

    view = camera["view"]
    view_z = posx * view[2, 0] + posy * view[2, 1] + posz * view[2, 2] \
        + view[2, 3]
    out_depth = jnp.where(valid, -view_z, MISS_DEPTH)

    nvx = view[0, 0] * Nx + view[0, 1] * Ny + view[0, 2] * Nz
    nvy = -(view[1, 0] * Nx + view[1, 1] * Ny + view[1, 2] * Nz)
    nvz = -(view[2, 0] * Nx + view[2, 1] * Ny + view[2, 2] * Nz)
    nvx, nvy, nvz = _norm3_p(nvx, nvy, nvz)
    out_normal = jnp.stack(
        [jnp.where(valid, nvx * 0.5 + 0.5, 0.5),
         jnp.where(valid, nvy * 0.5 + 0.5, 0.5),
         jnp.where(valid, nvz * 0.5 + 0.5, 0.5)], axis=-1)

    return dict(color=out_color, depth=out_depth, normal_enc=out_normal)
