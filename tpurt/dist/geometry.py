"""Sharded-geometry rendering: BVH partitioned across chips + ray ring
all-to-all over ICI.

The replicated-BVH mode (dist/sharding.py) assumes the whole scene fits one
chip's HBM. This mode removes that ceiling (SURVEY.md §2.4 / §7.2 step 7 —
no reference counterpart; the reference is single-GPU): triangles are
partitioned into D spatially-coherent shards (contiguous runs of the global
SAH build's depth-first triangle order), each chip owns ONE shard's BVH +
triangle tables, and rays visit every shard by rotating around the ICI ring
(`jax.lax.ppermute`), keeping a running closest-hit (or any-hit) carry:

    for step in range(D):
        carry = trace_local(shard, carry)      # dense local traversal
        carry = ppermute(carry, +1)            # ride the ring

After D rotations every ray is back on its origin chip with the global
result — the classic distributed-ray-tracing ring schedule, mapped onto
XLA collectives instead of explicit sends. Shading-attribute tables
(vertices/uv/normals/textures) stay replicated in this prototype; the
traversal tables (the dominant memory) are what shard.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..bvh import build_bvh_sah
from ..bvh.flat import tri_aabbs
from ..passes.encodings import pack_unorm8, quantize_r11g11b10f, quantize_r16f
from ..passes.gtao import (GtaoSettings, ao_visibility_u8, compute_ao_band)
from ..passes.rays import T_MAX, T_MIN, camera_rays
from ..passes.shade import shade
from ..passes.tonemap import tonemap_frame
from ..kernels.traverse import trace_any, trace_closest

MAX_LEAF = 4


def shard_geometry(scene: dict, n_shards: int) -> dict:
    """Host-side: partition the flattened scene's triangles into n_shards
    contiguous runs of the global BVH's depth-first order (spatially
    coherent), build one SAH BVH per shard, pad all shards to equal shapes,
    and stack with a leading shard axis.

    Returns dict(bvh={... (D, Mmax, ...)}, geom={... (D, Tmax, ...)}) whose
    tri_id entries stay GLOBAL triangle indices, so hits shade against the
    replicated attribute tables unchanged."""
    geom = {k: np.asarray(v) for k, v in scene["geom"].items()}
    order = geom["tri_id"]                       # global ids in BVH order
    t = len(order)
    bounds = np.linspace(0, t, n_shards + 1).astype(np.int64)

    shards = []
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        v0 = geom["v0"][lo:hi]
        e1 = geom["e1"][lo:hi]
        e2 = geom["e2"][lo:hi]
        gid = order[lo:hi]
        amin, amax = tri_aabbs(v0, v0 + e1, v0 + e2)
        bvh = build_bvh_sah(amin, amax, max_leaf_size=MAX_LEAF)
        ro = np.asarray(bvh.tri_order)
        shards.append((bvh, dict(v0=v0[ro], e1=e1[ro], e2=e2[ro],
                                 tri_id=gid[ro].astype(np.int32))))

    m_max = max(s[0].num_nodes for s in shards)
    t_max = max(max(len(s[1]["v0"]) for s in shards), 1)

    def pad_rows(a, rows, fill=0):
        out = np.full((rows,) + a.shape[1:], fill, a.dtype)
        out[:len(a)] = a
        return out

    bvh_stack = {k: [] for k in ("aabb_min", "aabb_max", "entry", "skip",
                                 "first_tri", "tri_count")}
    geom_stack = {k: [] for k in ("v0", "e1", "e2", "tri_id")}
    for bvh, g in shards:
        tree = bvh.as_pytree()
        # padded nodes are unreachable (traversal exits via skip == -1)
        bvh_stack["aabb_min"].append(pad_rows(np.asarray(tree["aabb_min"]), m_max))
        bvh_stack["aabb_max"].append(pad_rows(np.asarray(tree["aabb_max"]), m_max))
        bvh_stack["entry"].append(pad_rows(np.asarray(tree["entry"]), m_max, -1))
        bvh_stack["skip"].append(pad_rows(np.asarray(tree["skip"]), m_max, -1))
        bvh_stack["first_tri"].append(pad_rows(np.asarray(tree["first_tri"]), m_max))
        bvh_stack["tri_count"].append(pad_rows(np.asarray(tree["tri_count"]), m_max))
        for k in geom_stack:
            geom_stack[k].append(pad_rows(g[k], t_max))
    return dict(
        bvh={k: np.stack(v) for k, v in bvh_stack.items()},
        geom={k: np.stack(v) for k, v in geom_stack.items()},
    )


def _ring_trace_closest(bvh, geom, origin, direction, t_min, t_max, axis, n):
    """Ray-ring closest hit: the ray block (with its running best hit)
    makes a full tour of the ring, tracing against each chip's local shard;
    after n steps it is home with the global closest hit."""
    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), origin.shape[:1])
    carry = (origin, direction, t0,
             jnp.full(origin.shape[:1], -1, jnp.int32),
             jnp.zeros(origin.shape[:1], jnp.float32),
             jnp.zeros(origin.shape[:1], jnp.float32))
    perm = [(i, (i + 1) % n) for i in range(n)]

    def rotate(tree):
        return jax.tree.map(lambda x: jax.lax.ppermute(x, axis, perm), tree)

    for _ in range(n):
        o, d, t, tri, u, v = carry
        hits = trace_closest(bvh, geom, o, d, t_min, t, max_leaf=MAX_LEAF)
        # trace_closest returns t == incoming t_max on miss; closer wins
        better = hits["t"] < t
        t = jnp.where(better, hits["t"], t)
        tri = jnp.where(better, hits["tri"], tri)
        u = jnp.where(better, hits["u"], u)
        v = jnp.where(better, hits["v"], v)
        carry = rotate((o, d, t, tri, u, v))
    o, d, t, tri, u, v = carry
    return dict(t=t, tri=tri, u=u, v=v)


def _ring_trace_any(bvh, geom, origin, direction, t_min, t_max, axis, n):
    """Ray-ring occlusion: early-out lanes park with tmax = tmin."""
    occ = jnp.zeros(origin.shape[:1], bool)
    carry = (origin, direction,
             jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                              origin.shape[:1]), occ)
    perm = [(i, (i + 1) % n) for i in range(n)]
    for _ in range(n):
        o, d, tm, occ = carry
        tm_live = jnp.where(occ, 0.0, tm)  # occluded lanes exit immediately
        hit = trace_any(bvh, geom, o, d, t_min, tm_live, max_leaf=MAX_LEAF)
        occ = occ | hit
        carry = jax.tree.map(lambda x: jax.lax.ppermute(x, axis, perm),
                             (o, d, tm, occ))
    return carry[3]


@partial(jax.jit, static_argnames=("width", "height", "gtao_settings",
                                   "mesh", "axis", "enable_gtao",
                                   "enable_tonemap"))
def render_frame_sharded_geometry(scene: dict, shards: dict, camera: dict,
                                  lights: dict, gtao_consts: dict,
                                  lpm_derived: dict, noise_index, *,
                                  width: int, height: int,
                                  gtao_settings: GtaoSettings, mesh: Mesh,
                                  axis: str = "x", enable_gtao: bool = True,
                                  enable_tonemap: bool = True):
    """One frame with geometry sharded across the mesh: primary AND shadow
    rays ride the ICI ring; G-buffer post passes run like the replicated
    mode. `scene` carries the replicated attribute tables (its bvh/geom are
    unused here); `shards` comes from shard_geometry()."""
    n = mesh.shape[axis]
    assert height % n == 0, f"height {height} not divisible by mesh size {n}"
    band = height // n
    shards = jax.tree.map(jnp.asarray, shards)

    def per_chip(scene, shards, camera, lights, gtao_consts, lpm_derived,
                 noise_index):
        me = jax.lax.axis_index(axis)
        row0 = me * band
        bvh = {k: v[0] for k, v in shards["bvh"].items()}
        geom = {k: v[0] for k, v in shards["geom"].items()}

        origin, direction = camera_rays(camera, width, height,
                                        row_start=row0, num_rows=band)
        hits = _ring_trace_closest(bvh, geom, origin, direction,
                                   T_MIN, T_MAX, axis, n)

        def ring_shadows(o, d, tmin, tmax):
            return _ring_trace_any(bvh, geom, o, d, tmin, tmax, axis, n)

        g = shade(scene, camera, lights, hits, origin, direction,
                  shadow_trace_fn=ring_shadows)

        color = quantize_r11g11b10f(g["color"]).reshape(band, width, 3)
        depth = quantize_r16f(g["depth"]).reshape(band, width)
        normal = quantize_r11g11b10f(g["normal_enc"]).reshape(band, width, 3)

        if enable_gtao:
            depth_full = jax.lax.all_gather(depth, axis, axis=0, tiled=True)
            normal_full = jax.lax.all_gather(normal, axis, axis=0, tiled=True)
            ao = ao_visibility_u8(
                compute_ao_band(depth_full, normal_full, gtao_consts,
                                gtao_settings, noise_index, row0, band),
                gtao_settings)
        else:
            ao = jnp.full((band, width), 255, jnp.uint16)

        if enable_tonemap:
            image = pack_unorm8(tonemap_frame(color, ao, lpm_derived))
        else:
            image = pack_unorm8(jnp.clip(color, 0.0, 1.0))
        return dict(image=image, color=color, depth=depth, normal=normal,
                    ao=ao)

    out_spec = dict(image=P(axis, None, None), color=P(axis, None, None),
                    depth=P(axis, None), normal=P(axis, None, None),
                    ao=P(axis, None))
    scene_rep = {k: v for k, v in scene.items() if k not in ("bvh", "geom")}
    # shade() never touches scene bvh/geom when shadow_trace_fn overrides
    # the occlusion tracer; 1-row placeholders keep the pytree complete
    # WITHOUT replicating the full traversal tables (the whole point of
    # this mode)
    scene_rep["bvh"] = jax.tree.map(
        lambda a: jnp.zeros((1,) + jnp.shape(a)[1:], jnp.asarray(a).dtype),
        scene["bvh"])
    scene_rep["geom"] = jax.tree.map(
        lambda a: jnp.zeros((1,) + jnp.shape(a)[1:], jnp.asarray(a).dtype),
        scene["geom"])
    fn = shard_map(
        per_chip, mesh=mesh,
        in_specs=(P(), dict(bvh={k: P(axis) for k in shards["bvh"]},
                            geom={k: P(axis) for k in shards["geom"]}),
                  P(), P(), P(), P(), P()),
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(scene_rep, shards, camera, lights, gtao_consts, lpm_derived,
              jnp.asarray(noise_index))
