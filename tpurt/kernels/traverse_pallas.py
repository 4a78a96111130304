"""Pallas packet BVH traversal — the hot-path replacement for the XLA
while-loop tracer on TPU.

Design (see /opt/skills/guides/pallas_guide.md): rays are processed in
(8, 128) = 1024-ray packets, one grid step per packet, with the image
pre-swizzled so a packet is a coherent 32x32 pixel tile. The whole packet
traverses the BVH together behind a single *scalar* stack in SMEM (classic
packet traversal): a node is entered when ANY lane's slab test passes, and
every per-node operation is a dense (8, 128) VPU op — there are **zero
gathers** anywhere in the kernel. Node and triangle tables ride in as
scalar-prefetch (SMEM) operands, so node fetches are scalar loads that
broadcast into vector registers.

Compared to the XLA tracer (kernels/traverse.py), which is per-lane
independent but pays a dynamic gather per node visit, the packet kernel
exploits primary/shadow-ray coherence: the union of packet paths costs dense
vector math instead of scattered memory traffic — the right trade on a
machine whose gathers are slow and whose VPU is wide.

Table tiers (auto-cascaded by scene size, all parity-tested):
  "smem" — tables as scalar-prefetch operands (~5k tris budget); node
           fetches are raw scalar loads. Ordered near-child-first descent.
  "vmem" — tables as VMEM operands read with dynamic-sublane scalar loads
           (Mosaic forbids dynamic-lane and vector gathers); ~5x capacity,
           forceable but not auto-picked (scoped-VMEM OOM at large operand
           sizes).
  "hbm"  — 128-lane-row tables in HBM; one row DMA per step with the next
           stack top speculatively in flight (latency hidden behind the
           packet's vector math). Unbounded capacity, ~same speed as vmem.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32                 # image tiles are TILE x TILE = 1024 rays
PACKET_SUBLANES = 8
PACKET_LANES = 128
STACK_DEPTH = 192
# conservative SMEM budget for node+tri tables (bytes)
SMEM_BUDGET = 256 * 1024


def _resolve_interpret(interpret) -> bool:
    """interpret=None -> auto: run Mosaic on TPU-class backends, the Pallas
    interpreter elsewhere (CPU tests exercise the same kernel code path)."""
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu", "axon")


def fits_smem(num_nodes: int, num_tris: int) -> bool:
    nodes = num_nodes * (6 * 4 + 4 * 4)
    tris = num_tris * (9 * 4)
    return nodes + tris + STACK_DEPTH * 4 + 4096 < SMEM_BUDGET


# VMEM tables: each (M, c<=9) row pads to a full 128-lane row (512 B).
VMEM_BUDGET = 96 * 1024 * 1024


def fits_vmem(num_nodes: int, num_tris: int) -> bool:
    rows = 2 * num_nodes + 2 * num_tris  # aabb+meta per node, tri+tri_id
    return rows * 512 + (1 << 20) < VMEM_BUDGET


def table_mode(num_nodes: int, num_tris: int):
    """Pick the table tier for a scene size: smem, else hbm.

    The VMEM tier remains forceable but is not auto-selected: with the
    speculative prefetch the HBM tier matches its speed, has no capacity
    cliff, and avoids scoped-VMEM OOMs at high resolutions (the padded
    tables count against the 16 MB scoped limit at some operand sizes)."""
    if fits_smem(num_nodes, num_tris):
        return "smem"
    return "hbm"


def pack_tables(bvh: dict, geom: dict):
    """Node/tri tables in the kernel's scalar-prefetch layout."""
    aabb = jnp.concatenate([
        jnp.asarray(bvh["aabb_min"], jnp.float32),
        jnp.asarray(bvh["aabb_max"], jnp.float32),
    ], axis=1)                                              # (M, 6)
    meta = jnp.stack([
        jnp.asarray(bvh["entry"], jnp.int32),
        jnp.asarray(bvh["skip"], jnp.int32),
        jnp.asarray(bvh["first_tri"], jnp.int32),
        jnp.asarray(bvh["tri_count"], jnp.int32),
    ], axis=1)                                              # (M, 4)
    tri = jnp.concatenate([
        jnp.asarray(geom["v0"], jnp.float32),
        jnp.asarray(geom["e1"], jnp.float32),
        jnp.asarray(geom["e2"], jnp.float32),
    ], axis=1)                                              # (T, 9)
    # (T, 1): 1-D arrays land in the lane dimension, which cannot be
    # dynamically indexed by scalars; a trailing unit lane keeps the node
    # index on the (dynamically indexable) sublane dimension.
    tri_id = jnp.asarray(geom["tri_id"], jnp.int32).reshape(-1, 1)
    return aabb, meta, tri, tri_id


class _Rays:
    """Per-packet ray registers + the shared intersection math."""

    def __init__(self, ox, oy, oz, dx, dy, dz, tmn, tmx):
        self.o_x, self.o_y, self.o_z = ox[:], oy[:], oz[:]
        self.d_x, self.d_y, self.d_z = dx[:], dy[:], dz[:]
        self.inv_x = 1.0 / self.d_x
        self.inv_y = 1.0 / self.d_y
        self.inv_z = 1.0 / self.d_z
        self.t_min = tmn[:]
        self.t_max0 = tmx[:]

    def slab(self, bminx, bminy, bminz, bmaxx, bmaxy, bmaxz, tfar):
        tx0 = (bminx - self.o_x) * self.inv_x
        tx1 = (bmaxx - self.o_x) * self.inv_x
        ty0 = (bminy - self.o_y) * self.inv_y
        ty1 = (bmaxy - self.o_y) * self.inv_y
        tz0 = (bminz - self.o_z) * self.inv_z
        tz1 = (bmaxz - self.o_z) * self.inv_z
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                        jnp.minimum(ty0, ty1)),
                            jnp.maximum(jnp.minimum(tz0, tz1), self.t_min))
        tfar_ = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.minimum(jnp.maximum(tz0, tz1), tfar))
        return tnear <= tfar_

    def mt(self, tri_row, tfar):
        """tri_row: callable c -> scalar for the 9 packed triangle floats."""
        v0x, v0y, v0z = tri_row(0), tri_row(1), tri_row(2)
        e1x, e1y, e1z = tri_row(3), tri_row(4), tri_row(5)
        e2x, e2y, e2z = tri_row(6), tri_row(7), tri_row(8)
        d_x, d_y, d_z = self.d_x, self.d_y, self.d_z
        px = d_y * e2z - d_z * e2y
        py = d_z * e2x - d_x * e2z
        pz = d_x * e2y - d_y * e2x
        det = e1x * px + e1y * py + e1z * pz
        valid = jnp.abs(det) > 1e-12
        inv_det = 1.0 / jnp.where(valid, det, 1.0)
        tx = self.o_x - v0x
        ty = self.o_y - v0y
        tz = self.o_z - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (d_x * qx + d_y * qy + d_z * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = (valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & (t > self.t_min) & (t < tfar))
        return hit, t, u, v


def _packet_kernel(aabb_ref, meta_ref, tri_ref, tri_id_ref,
                   ox, oy, oz, dx, dy, dz, tmn, tmx,
                   t_out, tri_out, u_out, v_out,
                   stack, *, max_leaf: int, any_hit: bool):
    rays = _Rays(ox, oy, oz, dx, dy, dz, tmn, tmx)
    t_min = rays.t_min
    t_max0 = rays.t_max0
    num_tris = tri_ref.shape[0]

    stack[0] = jnp.int32(0)

    def slab(bminx, bminy, bminz, bmaxx, bmaxy, bmaxz, tfar):
        return rays.slab(bminx, bminy, bminz, bmaxx, bmaxy, bmaxz, tfar)

    def mt_test(ti, tfar):
        return rays.mt(lambda c: tri_ref[ti, c], tfar)

    if any_hit:
        # occlusion carried as f32 0/1 — Mosaic mishandles i1 loop carries
        init = (jnp.int32(1), jnp.zeros_like(t_min))

        def cond(c):
            sp, occ = c
            inactive = t_max0 <= t_min
            return (sp > 0) & jnp.logical_not(
                jnp.all((occ > 0.0) | inactive))

        def body(c):
            sp, occ = c
            node = stack[sp - 1]
            sp = sp - 1
            tfar = jnp.where(occ > 0.0, t_min, t_max0)  # occluded lanes drop out
            hit_box = slab(aabb_ref[node, 0], aabb_ref[node, 1],
                           aabb_ref[node, 2], aabb_ref[node, 3],
                           aabb_ref[node, 4], aabb_ref[node, 5], tfar)
            any_lane = jnp.any(hit_box)
            count = meta_ref[node, 3]
            first = meta_ref[node, 2]
            is_leaf = count > 0

            def leaf_body(k, occ):
                ti = jnp.minimum(first + k, num_tris - 1)
                h, _, _, _ = mt_test(ti, jnp.where(occ > 0.0, t_min, t_max0))
                upd = h & hit_box & (k < count)
                return jnp.where(upd, 1.0, occ)

            occ = jax.lax.cond(
                is_leaf & any_lane,
                lambda o: jax.lax.fori_loop(0, max_leaf, leaf_body, o),
                lambda o: o, occ)

            push = any_lane & jnp.logical_not(is_leaf)
            left = meta_ref[node, 0]
            left_c = jnp.maximum(left, 0)
            right = meta_ref[left_c, 1]
            stack[jnp.minimum(sp, STACK_DEPTH - 2)] = right
            stack[jnp.minimum(sp + 1, STACK_DEPTH - 1)] = left_c
            sp = jnp.where(push, jnp.minimum(sp + 2, STACK_DEPTH), sp)
            return sp, occ

        _, occluded = jax.lax.while_loop(cond, body, init)
        t_out[:] = occluded
    else:
        # packet mean direction — drives near-child-first ordering so the
        # shrinking t bound can cull the far subtree (ordered traversal)
        md_x = jnp.sum(rays.d_x)
        md_y = jnp.sum(rays.d_y)
        md_z = jnp.sum(rays.d_z)

        init = (jnp.int32(1), t_max0,
                jnp.full(t_min.shape, -1, jnp.int32),
                jnp.zeros_like(t_min), jnp.zeros_like(t_min))

        def cond(c):
            return c[0] > 0

        num_nodes = aabb_ref.shape[0]

        def child_key(n):
            """Projection of the child's AABB centroid onto the packet's
            mean direction (smaller = nearer). Index clamped: for leaves the
            speculative 'right' can be -1 (value unused, push is false)."""
            n = jnp.clip(n, 0, num_nodes - 1)
            cx = aabb_ref[n, 0] + aabb_ref[n, 3]
            cy = aabb_ref[n, 1] + aabb_ref[n, 4]
            cz = aabb_ref[n, 2] + aabb_ref[n, 5]
            return cx * md_x + cy * md_y + cz * md_z

        def body(c):
            sp, t, tri, u, v = c
            node = stack[sp - 1]
            sp = sp - 1
            hit_box = slab(aabb_ref[node, 0], aabb_ref[node, 1],
                           aabb_ref[node, 2], aabb_ref[node, 3],
                           aabb_ref[node, 4], aabb_ref[node, 5], t)
            any_lane = jnp.any(hit_box)
            count = meta_ref[node, 3]
            first = meta_ref[node, 2]
            is_leaf = count > 0

            def leaf_body(k, carry):
                t, tri, u, v = carry
                ti = jnp.minimum(first + k, num_tris - 1)
                h, tk, uk, vk = mt_test(ti, t)
                upd = h & hit_box & (k < count)
                t = jnp.where(upd, tk, t)
                tri = jnp.where(upd, tri_id_ref[ti, 0], tri)
                u = jnp.where(upd, uk, u)
                v = jnp.where(upd, vk, v)
                return t, tri, u, v

            t, tri, u, v = jax.lax.cond(
                is_leaf & any_lane,
                lambda carry: jax.lax.fori_loop(0, max_leaf, leaf_body, carry),
                lambda carry: carry, (t, tri, u, v))

            push = any_lane & jnp.logical_not(is_leaf)
            left = meta_ref[node, 0]
            left_c = jnp.maximum(left, 0)
            right = meta_ref[left_c, 1]
            # ordered: push far child first so the near one is popped first
            left_near = child_key(left_c) <= child_key(right)
            far = jnp.where(left_near, right, left_c)
            near = jnp.where(left_near, left_c, right)
            stack[jnp.minimum(sp, STACK_DEPTH - 2)] = far
            stack[jnp.minimum(sp + 1, STACK_DEPTH - 1)] = near
            sp = jnp.where(push, jnp.minimum(sp + 2, STACK_DEPTH), sp)
            return sp, t, tri, u, v

        _, t, tri, u, v = jax.lax.while_loop(cond, body, init)
        t_out[:] = t
        tri_out[:] = tri
        u_out[:] = u
        v_out[:] = v


def pack_tables_hbm(bvh: dict, geom: dict):
    """HBM-tier packing: one 128-lane f32 row per node / per triangle (DMA
    slices must be 128-aligned on the lane dimension).

    Node row: [aabb_min.xyz, aabb_max.xyz, entry, skip, first, count,
    right_child, left_centroid.xyz, right_centroid.xyz] — indices stored as
    exact small floats (< 2^24); the right child (= skip[entry]) and both
    children's centroids are precomputed so a step needs ONE row DMA and
    near-child ordering costs nothing extra.
    Tri row: [v0, e1, e2, tri_id]."""
    aabb_min = jnp.asarray(bvh["aabb_min"], jnp.float32)
    aabb_max = jnp.asarray(bvh["aabb_max"], jnp.float32)
    m = aabb_min.shape[0]
    entry = jnp.asarray(bvh["entry"], jnp.int32)
    skip = jnp.asarray(bvh["skip"], jnp.int32)
    left_c = jnp.clip(entry, 0, m - 1)
    right = skip[left_c]
    right_c = jnp.clip(right, 0, m - 1)
    centroid = (aabb_min + aabb_max) * 0.5
    nodes = jnp.zeros((m, 128), jnp.float32)
    nodes = nodes.at[:, 0:3].set(aabb_min)
    nodes = nodes.at[:, 3:6].set(aabb_max)
    nodes = nodes.at[:, 6].set(entry.astype(jnp.float32))
    nodes = nodes.at[:, 7].set(skip.astype(jnp.float32))
    nodes = nodes.at[:, 8].set(jnp.asarray(bvh["first_tri"], jnp.float32))
    nodes = nodes.at[:, 9].set(jnp.asarray(bvh["tri_count"], jnp.float32))
    nodes = nodes.at[:, 10].set(right.astype(jnp.float32))
    nodes = nodes.at[:, 11:14].set(centroid[left_c])
    nodes = nodes.at[:, 14:17].set(centroid[right_c])

    return nodes, pack_tris_hbm(geom)


def pack_tris_hbm(geom: dict, uv_payload: bool = False):
    """Triangle rows for the HBM/BVH8 tiers: [v0, e1, e2, tri_id] per
    128-lane f32 row. Padded to >= 8 rows so the leaf block DMA (max_leaf
    rows at a clamped offset) can never read past the table for tiny
    scenes (< max_leaf tris); padding rows are degenerate (e1 = e2 = 0 ->
    det 0, no hit) and excluded by the kernel's in_range mask anyway.

    uv_payload=True additionally writes geom['uvp'] (scene.py flatten:
    [uv0, uv1, uv2, img, tex_h, tex_w]) into cols 10:19 for the payload
    closest kernel (traverse_bvh8). Gated, not unconditional: the pack
    runs in-graph per launch and the extra column writes cost a measured
    0.87 ms per closest trace at 800^2 when nothing reads them
    (PACK_UVP_PROBE.json)."""
    from ..bvh.wide import LEAF8_MAX

    t = geom["v0"].shape[0]
    tp = max(t, 8, LEAF8_MAX)
    tris = jnp.zeros((tp, 128), jnp.float32)
    tris = tris.at[:t, 0:3].set(jnp.asarray(geom["v0"], jnp.float32))
    tris = tris.at[:t, 3:6].set(jnp.asarray(geom["e1"], jnp.float32))
    tris = tris.at[:t, 6:9].set(jnp.asarray(geom["e2"], jnp.float32))
    tris = tris.at[:t, 9].set(jnp.asarray(geom["tri_id"], jnp.float32))
    if uv_payload:
        tris = tris.at[:t, 10:19].set(jnp.asarray(geom["uvp"], jnp.float32))
    return tris


def _packet_kernel_hbm(nodes_ref, tris_ref,
                       ox, oy, oz, dx, dy, dz, tmn, tmx,
                       t_out, tri_out, u_out, v_out,
                       stack, node_buf, tri_buf, sems,
                       *, max_leaf: int, any_hit: bool):
    """HBM-table variant: node/tri tables stay in HBM (unbounded scene
    size); each step DMAs one 512 B node row into VMEM scratch, and leaves
    DMA their triangle block under a predicated region. Slower per step
    than the SMEM/VMEM tiers, but capacity-unbounded."""
    rays = _Rays(ox, oy, oz, dx, dy, dz, tmn, tmx)
    t_min = rays.t_min
    t_max0 = rays.t_max0
    num_tris = tris_ref.shape[0]
    num_nodes = nodes_ref.shape[0]

    stack[0] = jnp.int32(0)

    def tri_row_maker(k):
        def row(c):
            return tri_buf[k, c]
        return row

    # Speculative pipeline: the row for the node about to be popped is
    # always already in flight — each step waits for it, then immediately
    # launches the fetch for the *next* stack top, overlapping that DMA
    # with this step's vector math.
    def start_fetch(node):
        pltpu.make_async_copy(
            nodes_ref.at[pl.ds(jnp.clip(node, 0, num_nodes - 1), 1)],
            node_buf, sems.at[0]).start()

    def wait_fetch():
        pltpu.make_async_copy(nodes_ref.at[pl.ds(0, 1)], node_buf,
                              sems.at[0]).wait()

    start_fetch(jnp.int32(0))

    # packet mean direction for near-child-first ordering (closest-hit);
    # the children's centroids ride in the node row, so ordering is free.
    md_x = jnp.sum(rays.d_x)
    md_y = jnp.sum(rays.d_y)
    md_z = jnp.sum(rays.d_z)

    def step_common(tfar_for_box):
        wait_fetch()
        hit_box = rays.slab(node_buf[0, 0], node_buf[0, 1], node_buf[0, 2],
                            node_buf[0, 3], node_buf[0, 4], node_buf[0, 5],
                            tfar_for_box)
        any_lane = jnp.any(hit_box)
        entry = node_buf[0, 6].astype(jnp.int32)
        first = node_buf[0, 8].astype(jnp.int32)
        count = node_buf[0, 9].astype(jnp.int32)
        right = node_buf[0, 10].astype(jnp.int32)
        key_l = (node_buf[0, 11] * md_x + node_buf[0, 12] * md_y
                 + node_buf[0, 13] * md_z)
        key_r = (node_buf[0, 14] * md_x + node_buf[0, 15] * md_y
                 + node_buf[0, 16] * md_z)
        left_near = key_l <= key_r
        is_leaf = count > 0
        do_leaf = is_leaf & any_lane
        # lo > hi would make jnp.clip return hi (negative) — guard tiny scenes
        first_c = jnp.clip(first, 0, jnp.maximum(num_tris - max_leaf, 0))

        @pl.when(do_leaf)
        def _():
            cp_t = pltpu.make_async_copy(
                tris_ref.at[pl.ds(first_c, max_leaf)], tri_buf, sems.at[1])
            cp_t.start()
            cp_t.wait()

        # offset of the real first triangle inside the clamped DMA window
        k_off = first - first_c
        return (hit_box, any_lane, entry, right, count, is_leaf, do_leaf,
                k_off, left_near)

    def push_children_and_prefetch(sp, push, entry, right, left_near):
        left_c = jnp.maximum(entry, 0)
        far = jnp.where(left_near, right, left_c)
        near = jnp.where(left_near, left_c, right)
        stack[jnp.minimum(sp, STACK_DEPTH - 2)] = far
        stack[jnp.minimum(sp + 1, STACK_DEPTH - 1)] = near
        sp = jnp.where(push, jnp.minimum(sp + 2, STACK_DEPTH), sp)
        start_fetch(stack[jnp.maximum(sp - 1, 0)])
        return sp

    if any_hit:
        init = (jnp.int32(1), jnp.zeros_like(t_min))

        def cond(c):
            sp, occ = c
            return (sp > 0) & jnp.logical_not(
                jnp.all((occ > 0.0) | (t_max0 <= t_min)))

        def body(c):
            sp, occ = c
            sp = sp - 1
            tfar = jnp.where(occ > 0.0, t_min, t_max0)
            (hit_box, any_lane, entry, right, count, is_leaf, do_leaf,
             k_off, left_near) = step_common(tfar)

            push = any_lane & jnp.logical_not(is_leaf)
            # unordered for any-hit: first-found occluder terminates anyway
            sp = push_children_and_prefetch(sp, push, entry, right,
                                            jnp.bool_(True))

            def leaf_work(occ):
                for k in range(max_leaf):
                    h, _, _, _ = rays.mt(tri_row_maker(k), tfar)
                    in_range = (k >= k_off) & (k < k_off + count)
                    occ = jnp.where(h & hit_box & in_range, 1.0, occ)
                return occ

            # gate the MT tests on actually standing at a hit leaf —
            # internal visits skip ~160 vector ops (the tests were
            # previously run every step with a do_leaf mask)
            occ = jax.lax.cond(do_leaf, leaf_work, lambda o: o, occ)
            return sp, occ

        _, occluded = jax.lax.while_loop(cond, body, init)
        wait_fetch()  # drain the orphan speculative fetch
        t_out[:] = occluded
    else:
        init = (jnp.int32(1), t_max0,
                jnp.full(t_min.shape, -1, jnp.int32),
                jnp.zeros_like(t_min), jnp.zeros_like(t_min))

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, t, tri, u, v = c
            sp = sp - 1
            (hit_box, any_lane, entry, right, count, is_leaf, do_leaf,
             k_off, left_near) = step_common(t)

            push = any_lane & jnp.logical_not(is_leaf)
            sp = push_children_and_prefetch(sp, push, entry, right, left_near)

            def leaf_work(carry):
                t, tri, u, v = carry
                for k in range(max_leaf):
                    h, tk, uk, vk = rays.mt(tri_row_maker(k), t)
                    in_range = (k >= k_off) & (k < k_off + count)
                    upd = h & hit_box & in_range
                    t = jnp.where(upd, tk, t)
                    tri = jnp.where(upd, tri_buf[k, 9].astype(jnp.int32), tri)
                    u = jnp.where(upd, uk, u)
                    v = jnp.where(upd, vk, v)
                return t, tri, u, v

            # gate the MT tests on actually standing at a hit leaf (see
            # any-hit variant above)
            t, tri, u, v = jax.lax.cond(do_leaf, leaf_work, lambda c: c,
                                        (t, tri, u, v))
            return sp, t, tri, u, v

        _, t, tri, u, v = jax.lax.while_loop(cond, body, init)
        wait_fetch()  # drain the orphan speculative fetch
        t_out[:] = t
        tri_out[:] = tri
        u_out[:] = u
        v_out[:] = v


def _trace_packets(aabb, meta, tri, tri_id, rays, max_leaf: int,
                   any_hit: bool, interpret: bool = False,
                   tables: str = "smem"):
    """rays: dict of 8 arrays shaped (P*8, 128).

    tables: where the node/tri tables live —
      "smem": scalar-prefetch operands (fastest node fetch, tightest budget)
      "vmem": VMEM operands read with dynamic-sublane scalar loads
              (~5x the SMEM capacity at a small per-step cost).
    """
    n_sub = rays["ox"].shape[0]
    grid = (n_sub // PACKET_SUBLANES,)

    def block(i, *prefetch_refs):
        # index_map returns *block* indices (units of the block shape)
        return (i, 0)

    ray_spec = pl.BlockSpec((PACKET_SUBLANES, PACKET_LANES), block,
                            memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((n_sub, PACKET_LANES), jnp.float32),   # t / occ
        jax.ShapeDtypeStruct((n_sub, PACKET_LANES), jnp.int32),     # tri
        jax.ShapeDtypeStruct((n_sub, PACKET_LANES), jnp.float32),   # u
        jax.ShapeDtypeStruct((n_sub, PACKET_LANES), jnp.float32),   # v
    ]
    if tables == "hbm":
        kernel = partial(_packet_kernel_hbm, max_leaf=max_leaf,
                         any_hit=any_hit)
        table_spec = pl.BlockSpec(memory_space=pltpu.HBM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[table_spec] * 2 + [ray_spec] * 8,
            out_specs=[ray_spec] * 4,
            scratch_shapes=[
                pltpu.SMEM((STACK_DEPTH,), jnp.int32),
                pltpu.VMEM((1, 128), jnp.float32),         # node row
                pltpu.VMEM((max_leaf, 128), jnp.float32),  # leaf tri rows
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        nodes128, tris128 = aabb, meta  # packed by the hbm caller
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(nodes128, tris128,
          rays["ox"], rays["oy"], rays["oz"],
          rays["dx"], rays["dy"], rays["dz"],
          rays["tmin"], rays["tmax"])

    kernel = partial(_packet_kernel, max_leaf=max_leaf, any_hit=any_hit)
    if tables == "smem":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[ray_spec] * 8,
            out_specs=[ray_spec] * 4,
            scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            interpret=interpret,
        )(aabb, meta, tri, tri_id,
          rays["ox"], rays["oy"], rays["oz"],
          rays["dx"], rays["dy"], rays["dz"],
          rays["tmin"], rays["tmax"])
    elif tables == "vmem":
        table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[table_spec] * 4 + [ray_spec] * 8,
            out_specs=[ray_spec] * 4,
            scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            interpret=interpret,
        )(aabb, meta, tri, tri_id,
          rays["ox"], rays["oy"], rays["oz"],
          rays["dx"], rays["dy"], rays["dz"],
          rays["tmin"], rays["tmax"])
    else:
        raise ValueError(f"unknown tables mode {tables!r}")


# ----------------------------------------------------------- tile swizzle ---

def _pad_to_tile(n: int) -> int:
    return ((n + TILE - 1) // TILE) * TILE


def _to_packets(flat, height, width):
    """(H*W,) row-major -> (P*8, 128) where each 8x128 block is one coherent
    32x32 image tile. Non-TILE-aligned images are edge-padded (the padded
    rays duplicate edge pixels and are cropped on the way out)."""
    hp, wp = _pad_to_tile(height), _pad_to_tile(width)
    x = flat.reshape(height, width)
    if (hp, wp) != (height, width):
        x = jnp.pad(x, ((0, hp - height), (0, wp - width)), mode="edge")
    x = x.reshape(hp // TILE, TILE, wp // TILE, TILE)
    x = x.transpose(0, 2, 1, 3).reshape(-1, PACKET_SUBLANES, PACKET_LANES)
    return x.reshape(-1, PACKET_LANES)


def _from_packets(packed, height, width):
    hp, wp = _pad_to_tile(height), _pad_to_tile(width)
    x = packed.reshape(hp // TILE, wp // TILE, TILE, TILE)
    x = x.transpose(0, 2, 1, 3).reshape(hp, wp)
    return x[:height, :width].reshape(height * width)


def _rays_to_packets(origin, direction, t_min, t_max, height, width):
    n = height * width
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    f = partial(_to_packets, height=height, width=width)
    return dict(
        ox=f(origin[:, 0]), oy=f(origin[:, 1]), oz=f(origin[:, 2]),
        dx=f(direction[:, 0]), dy=f(direction[:, 1]), dz=f(direction[:, 2]),
        tmin=f(t_min), tmax=f(t_max),
    )


@partial(jax.jit, static_argnames=("height", "width", "max_leaf", "interpret",
                                   "tables"))
def trace_closest_packets(bvh: dict, geom: dict, origin, direction,
                          t_min, t_max, *, height: int, width: int,
                          max_leaf: int = 4, interpret: bool | None = None,
                          tables: str = "smem"):
    """Closest-hit packet trace over an image-shaped ray batch.
    Same contract as kernels.traverse.trace_closest (t=t_max & tri=-1 on miss).
    interpret=None auto-selects Mosaic on TPU / interpreter elsewhere."""
    interpret = _resolve_interpret(interpret)
    if tables == "bvh8":
        from ..bvh.wide import LEAF8_MAX
        from .traverse_bvh8 import trace_closest_bvh8

        # BVH8 leaf slots hold up to LEAF8_MAX tris (subtree flattening /
        # slot merging in bvh/wide.py) regardless of the SAH leaf size
        return trace_closest_bvh8(bvh, geom, origin, direction, t_min,
                                  t_max, height=height, width=width,
                                  max_leaf=LEAF8_MAX, interpret=interpret)
    if tables == "hbm":
        nodes128, tris128 = pack_tables_hbm(bvh, geom)
        aabb, meta, tri, tri_id = nodes128, tris128, None, None
    else:
        aabb, meta, tri, tri_id = pack_tables(bvh, geom)
    rays = _rays_to_packets(origin, direction, t_min, t_max, height, width)
    t, tri_o, u, v = _trace_packets(aabb, meta, tri, tri_id, rays,
                                    max_leaf, any_hit=False,
                                    interpret=interpret, tables=tables)
    g = partial(_from_packets, height=height, width=width)
    return dict(t=g(t), tri=g(tri_o), u=g(u), v=g(v))


@partial(jax.jit, static_argnames=("height", "width", "max_leaf", "interpret",
                                   "tables"))
def trace_any_packets(bvh: dict, geom: dict, origin, direction,
                      t_min, t_max, *, height: int, width: int,
                      max_leaf: int = 4, interpret: bool | None = None,
                      tables: str = "smem"):
    """Any-hit packet trace; returns boolean occlusion mask (H*W,)."""
    interpret = _resolve_interpret(interpret)
    if tables == "bvh8":
        from ..bvh.wide import LEAF8_MAX
        from .traverse_bvh8 import trace_any_bvh8

        return trace_any_bvh8(bvh, geom, origin, direction, t_min, t_max,
                              height=height, width=width,
                              max_leaf=LEAF8_MAX, interpret=interpret)
    if tables == "hbm":
        nodes128, tris128 = pack_tables_hbm(bvh, geom)
        aabb, meta, tri, tri_id = nodes128, tris128, None, None
    else:
        aabb, meta, tri, tri_id = pack_tables(bvh, geom)
    rays = _rays_to_packets(origin, direction, t_min, t_max, height, width)
    occ, _, _, _ = _trace_packets(aabb, meta, tri, tri_id, rays,
                                  max_leaf, any_hit=True, interpret=interpret,
                                  tables=tables)
    return _from_packets(occ, height, width) > 0.5
