"""BVH8 Pallas packet traversal — wide nodes for the TPU's wide VPU.

The binary HBM-tier kernel (traverse_pallas._packet_kernel_hbm) pays one
512 B row DMA + one slab test + loop overhead per binary node visit. The
BVH8 kernel amortizes all three: one row DMA brings EIGHT child AABBs
(bvh/wide.py packing), tested as eight dense (8, 128) slab evaluations —
~3x fewer traversal steps for the same leaf work.

Step design:
  * the SMEM stack holds MIXED entries: wide-node ids (>= 0) and encoded
    leaf ranges (-(first * LEAF_CODE_BASE + count) - 1) — a popped leaf
    runs ONLY its
    Moller-Trumbore tests, a popped node ONLY its slab tests + pushes,
    each under lax.cond (no masked-dead work like the binary kernel's
    always-on MT block),
  * both possible next-step fetches are speculatively in flight at all
    times: the node row for stack-top-as-node, the triangle block for
    stack-top-as-leaf (one of the two is wasted per step; the bytes are
    noise next to the latency it hides),
  * GROUPED traversal (group > 1) interleaves independent packets in one
    while loop so each packet's fetches are waited behind the others'
    math. Measured: NO win — g1 8.6 / g4 9.0 / g8 9.5 ms closest at the
    bench scene (BVH8_GROUP_PROBE.json), i.e. the speculation already
    hides the DMA and the per-step cost is serial scalar+VPU work.
    Default stays group=1; this also closes the
    quantized-node-compression question (halving node bytes cannot speed
    up a kernel that is not DMA-bound),
  * EMISSION ORDER matters more than op count: issuing all 8 slab tests
    before the any() reduces and the scalar meta decode (instead of
    slab/reduce/meta interleaved per child) dropped closest 8.6 ->
    5.26 ms; doubling any single component afterwards costs < 0.35 ms
    (BVH8_STEP_ABLATE.json) — the step is bound by its serial scalar
    chain, which is also why fatter leaves win (BVH8_LEAF_PROBE.json:
    LEAF8_MAX 16 -> 32 trades free VPU MT tests for fewer steps),
  * closest-hit pushes are ordered far-to-near by the packet mean
    direction (keys from child AABB centroids, already in the row) through
    a 19-comparator Batcher sorting network on scalars — the near child
    pops first and the shrinking t bound culls the far ones,
  * leaf MT updates need no per-lane box mask: a lane whose ray misses the
    child AABB cannot intersect triangles inside it, so the exact MT test
    alone is sufficient (the parent's any-lane test gates the push).

Parity contract matches trace_closest/trace_any (kernels/traverse.py).
Replaces `traceRayEXT` (raytrace.rgen.glsl:86-182) like the binary tiers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bvh.wide import LEAF8_MAX
from .traverse_pallas import (PACKET_LANES, STACK_DEPTH, _Rays,
                              _from_packets, _rays_to_packets,
                              _resolve_interpret, pack_tris_hbm)

_NEG = -3.0e38
# Default for the two-node-pop step (kernel _kernel_bvh8_pop2 /
# _kernel_bvh8_any_multi_pop2) on the production paths when callers pass
# pop2=None. Flipped by the on-chip A/B (tools/bvh8_pop2_probe.py).
POP2_DEFAULT = False
# Default for the closest-hit uv payload (hit keys texu/texv/img/texh/texw
# from the tris128 rows) when callers pass uv_payload=None and geom
# carries 'uvp'. On-chip A/B: tools/uv_payload_probe.py.
UVP_DEFAULT = False
# Packet FATNESS: one grid step traverses `fat` horizontally-adjacent
# 32x32 image tiles as ONE (8*fat, 128) packet behind a single stack.
# Total pops shrink toward the union of the tiles' node sets while the
# fixed per-step scalar chain (pop/decode/cond/loop — ~80% of the step,
# PERF_ROOFLINE.md block A) is paid once per fat packet; the added
# (8*fat,128) slab/MT vector work is the ~free part of the step
# (BVH8_STEP_ABLATE.json). Defaults flipped by tools/bvh8_fat_probe.py.
FAT_DEFAULT = 2        # closest-hit trace
FAT_ANY_DEFAULT = 1    # fused multi-light any-hit (shadow) trace
# Predicated pushes: compute children + Batcher sort + stack pushes under
# @pl.when(is_node) with the stack pointer in an SMEM cell, instead of a
# 16-output lax.cond (no_children dummies) followed by an UNCONDITIONAL
# sort+push that runs the full scalar chain on _NEG keys every leaf pop
# (~46% of steps). Bit-identical: dead pushes never advanced sp and their
# stack writes were overwritten before any pop could read them.
# Flipped by tools/when_push_probe.py: closest 4.061 -> 3.893 ms,
# shadow3 tour -0.21 ms, bit-exact (WHEN_PUSH_PROBE.json).
WHEN_PUSH_DEFAULT = True
# Stack leaf codes pack -(first * LEAF_CODE_BASE + count) - 1; the base
# bounds leaf_max (< LEAF_CODE_BASE) and keeps first exact in i32 for
# scenes up to 2^31/base triangles.
LEAF_CODE_BASE = 128
# Batcher odd-even mergesort network for 8 elements (19 comparators)
_BATCHER8 = [(0, 1), (2, 3), (4, 5), (6, 7),
             (0, 2), (1, 3), (4, 6), (5, 7),
             (1, 2), (5, 6),
             (0, 4), (1, 5), (2, 6), (3, 7),
             (2, 4), (3, 5),
             (1, 2), (3, 4), (5, 6)]


# The round-2-proven single-packet kernel. The grouped/unrolled kernel
# below is bit-identical and measured perf-neutral (BVH8_GROUP_PROBE.json)
# but intermittently segfaults XLA:CPU's interpret path late in a full
# test-suite run (never reproducible at file level) - so the DEFAULT
# (group=1, unroll=1, no diagnostics) dispatches to this one, and the
# grouped kernel serves only the experiment knobs and probes.

def _kernel_bvh8_single(nodes_ref, tris_ref,
                 ox, oy, oz, dx, dy, dz, tmn, tmx,
                 *rest,
                 max_leaf: int, any_hit: bool, push_order: str = "sort",
                 debug_double: str = "", reduce_mode: str = "each",
                 flag_keys: bool = False, uv_payload: bool = False,
                 count_steps: bool = False, when_push: bool = False):
    if when_push:
        # trailing SMEM (1,) cell carries the post-push stack pointer out
        # of the pl.when region
        *rest, sp_cell = rest
    if uv_payload:
        # 5 extra hit outputs: interpolated texture uv + [img, th, tw]
        # copied from the winning triangle's payload columns (rows 10:19,
        # pack_tris_hbm) — breaks the shade pass's attr->quad gather
        # dependency (GATHER_TRIGGER_PROBE: independent dtype-mixed
        # gathers overlap perfectly)
        (t_out, tri_out, u_out, v_out, tu_out, tv_out, im_out, th_out,
         tw_out, stack, node_buf, tri_buf, sems) = rest
    else:
        t_out, tri_out, u_out, v_out, stack, node_buf, tri_buf, sems = rest
    # reduce_mode: how the 8 per-child any-lane-hit scalars are computed.
    #   "each" - one jnp.any lane reduce per child (8 reduces/node step)
    #   "pair" - 2 children share one sum reduce: lane hit counts (<= 1024
    #            = 2^10 each) pack exactly into one f32 as a + 4096*b, and
    #            the scalar decodes both anys (4 reduces/node step).
    #            Bit-identical traversal (the packing is exact integers).
    # debug_double: step-cost attribution knob (tools/bvh8_step_ablate.py).
    # Doubles ONE per-step component without changing the traversal path,
    # so (t_doubled - t_base) = that component's share of the step cost:
    #   "slab"   - every child slab test runs twice (ORed, identical hits)
    #   "reduce" - every per-child any() reduce runs twice (ORed)
    #   "sort"   - the Batcher push sort runs twice (sort of sorted = same)
    #   "leaf"   - the unrolled MT loop runs twice (idempotent updates)
    # Variants are bit-identical to the default except "leaf", whose
    # duplicated MT expression is a separate code site the compiler may
    # FMA-contract differently (~2e-6 on t; tri ids unchanged).
    rays = _Rays(ox, oy, oz, dx, dy, dz, tmn, tmx)
    t_min = rays.t_min
    t_max0 = rays.t_max0
    num_tris = tris_ref.shape[0]
    num_nodes = nodes_ref.shape[0]
    first_cap = max(num_tris - max_leaf, 0)

    stack[0] = jnp.int32(0)

    def start_node_fetch(node):
        pltpu.make_async_copy(
            nodes_ref.at[pl.ds(jnp.clip(node, 0, num_nodes - 1), 1)],
            node_buf, sems.at[0]).start()

    def wait_node_fetch():
        pltpu.make_async_copy(nodes_ref.at[pl.ds(0, 1)], node_buf,
                              sems.at[0]).wait()

    def leaf_first(top):
        """Decode the clamped DMA window start of a (possibly-)leaf entry."""
        dec = jnp.maximum(-(top + 1), 0)
        return jnp.clip(dec // LEAF_CODE_BASE, 0, first_cap)

    def start_tri_fetch(first_c):
        pltpu.make_async_copy(tris_ref.at[pl.ds(first_c, max_leaf)],
                              tri_buf, sems.at[1]).start()

    def wait_tri_fetch():
        pltpu.make_async_copy(tris_ref.at[pl.ds(0, max_leaf)], tri_buf,
                              sems.at[1]).wait()

    start_node_fetch(jnp.int32(0))
    start_tri_fetch(jnp.int32(0))

    # packet mean direction for near-child-first ordering
    md_x = jnp.sum(rays.d_x)
    md_y = jnp.sum(rays.d_y)
    md_z = jnp.sum(rays.d_z)

    def node_children(tfar):
        """8 slab tests + metas -> per-slot (key, code); key = _NEG when the
        slot should not be pushed. Reads node_buf only."""
        hits = []
        for k in range(8):
            b = k * 6
            hit_k = rays.slab(node_buf[0, b], node_buf[0, b + 1],
                              node_buf[0, b + 2], node_buf[0, b + 3],
                              node_buf[0, b + 4], node_buf[0, b + 5], tfar)
            if debug_double == "slab":
                # identical test with an opaque (uncomputable-at-compile)
                # tfar expression so it cannot be CSE'd away
                hit_k = hit_k | rays.slab(
                    node_buf[0, b], node_buf[0, b + 1], node_buf[0, b + 2],
                    node_buf[0, b + 3], node_buf[0, b + 4], node_buf[0, b + 5],
                    jnp.minimum(tfar, jnp.float32(3.0e38)))
            hits.append(hit_k)

        anys = []
        if reduce_mode == "pair":
            # lane-hit counts are <= 1024 = 2^10 < 4096, so a + 4096*b is
            # exact in f32 (< 2^23) and one reduce answers two children
            for p in range(4):
                s = jnp.sum(hits[2 * p].astype(jnp.float32)
                            + 4096.0 * hits[2 * p + 1].astype(jnp.float32))
                b_cnt = jnp.floor(s * (1.0 / 4096.0))
                anys.append((s - b_cnt * 4096.0) > 0.0)
                anys.append(b_cnt > 0.0)
        else:
            for k in range(8):
                any_k = jnp.any(hits[k])
                if debug_double == "reduce":
                    # (t_max0 > -3e38) is always true; the & blocks CSE
                    any_k = any_k | jnp.any(
                        hits[k] & (rays.t_max0 > jnp.float32(-3e38)))
                anys.append(any_k)

        keys = []
        codes = []
        for k in range(8):
            b = k * 6
            child = node_buf[0, 48 + k]
            firstf = node_buf[0, 56 + k]
            countf = node_buf[0, 64 + k]
            is_int = child >= 0.0
            is_lf = countf > 0.0
            code = jnp.where(
                is_int, child.astype(jnp.int32),
                -(firstf.astype(jnp.int32) * LEAF_CODE_BASE
                  + countf.astype(jnp.int32)) - 1)
            if flag_keys:
                # unsorted pushes never read the key VALUE (only
                # validity), so the 8x centroid-key scalar chain (6 reads
                # + 5 ops each) collapses to a 0/_NEG flag — same pushes,
                # bit-identical traversal
                keys.append(jnp.where(anys[k] & (is_int | is_lf),
                                      jnp.float32(0.0), jnp.float32(_NEG)))
            else:
                key = ((node_buf[0, b] + node_buf[0, b + 3]) * md_x
                       + (node_buf[0, b + 1] + node_buf[0, b + 4]) * md_y
                       + (node_buf[0, b + 2] + node_buf[0, b + 5]) * md_z)
                keys.append(jnp.where(anys[k] & (is_int | is_lf), key,
                                      jnp.float32(_NEG)))
            codes.append(code)
        return tuple(keys) + tuple(codes)

    def no_children(tfar):
        del tfar
        return (tuple(jnp.float32(_NEG) for _ in range(8))
                + tuple(jnp.int32(0) for _ in range(8)))

    def push_sorted(sp, keys, codes):
        """Far-to-near pushes: sort descending by key (Batcher-8), then
        write sequentially, advancing sp only for valid entries (_NEG keys
        sort last and write harmlessly above the final top)."""
        keys = list(keys)
        codes = list(codes)
        for _ in range(2 if debug_double == "sort" else 1):
            for a, b in _BATCHER8:
                swap = keys[a] < keys[b]
                ka = jnp.where(swap, keys[b], keys[a])
                kb = jnp.where(swap, keys[a], keys[b])
                ca = jnp.where(swap, codes[b], codes[a])
                cb = jnp.where(swap, codes[a], codes[b])
                keys[a], keys[b] = ka, kb
                codes[a], codes[b] = ca, cb
        for k in range(8):
            stack[jnp.minimum(sp, STACK_DEPTH - 1)] = codes[k]
            sp = jnp.where(keys[k] > jnp.float32(_NEG / 2),
                           jnp.minimum(sp + 1, STACK_DEPTH), sp)
        return sp

    def push_nearlast(sp, keys, codes):
        """Cheap partial ordering: push in slot order but hold back the
        NEAREST valid child (max key) for the final push so it pops
        first — 7 comparators instead of the 19-comparator full sort;
        the shrinking t bound still culls most far children."""
        keys = list(keys)
        codes = list(codes)
        bk = keys[0]
        bc = codes[0]
        for k in range(1, 8):
            better = keys[k] > bk
            bk = jnp.where(better, keys[k], bk)
            bc = jnp.where(better, codes[k], bc)
        taken = jnp.int32(0)  # skip ONE slot equal to the best
        for k in range(8):
            is_best = (keys[k] == bk) & (codes[k] == bc) & (taken == 0)
            taken = jnp.where(is_best, 1, taken)
            valid = (keys[k] > jnp.float32(_NEG / 2)) & ~is_best
            stack[jnp.minimum(sp, STACK_DEPTH - 1)] = codes[k]
            sp = jnp.where(valid, jnp.minimum(sp + 1, STACK_DEPTH), sp)
        stack[jnp.minimum(sp, STACK_DEPTH - 1)] = bc
        sp = jnp.where(bk > jnp.float32(_NEG / 2),
                       jnp.minimum(sp + 1, STACK_DEPTH), sp)
        return sp

    def push_unsorted(sp, keys, codes):
        """Any-hit: order does not matter; invalid slots write at the
        current top without advancing and are overwritten by later valid
        ones."""
        for k in range(8):
            stack[jnp.minimum(sp, STACK_DEPTH - 1)] = codes[k]
            sp = jnp.where(keys[k] > jnp.float32(_NEG / 2),
                           jnp.minimum(sp + 1, STACK_DEPTH), sp)
        return sp


    if any_hit:
        init = (jnp.int32(1), jnp.zeros_like(t_min))
        if count_steps:
            # diagnostic: node/leaf pop counters ride the carry and come
            # back through u_out/v_out (same contract as _kernel_bvh8)
            init = init + (jnp.int32(0), jnp.int32(0))

        def cond(c):
            sp, occ = c[0], c[1]
            return (sp > 0) & jnp.logical_not(
                jnp.all((occ > 0.0) | (t_max0 <= t_min)))

        def body(c):
            sp, occ = c[0], c[1]
            top = stack[sp - 1]
            sp = sp - 1
            is_node = top >= 0
            wait_node_fetch()
            wait_tri_fetch()
            tfar = jnp.where(occ > 0.0, t_min, t_max0)

            # "none" (default): order is irrelevant for CORRECTNESS, and
            # occluders cluster near the shadow-ray origin, so near-first
            # popping ("sort", far-to-near pushes) was a plausible
            # early-exit win — measured SLOWER on-chip (ANYHIT_ORDER in
            # SHADOW_FUSION_PROBE.json family): the 19-comparator scalar
            # sort costs more than the saved steps at these scene depths.
            push_any = {"sort": push_sorted, "nearlast": push_nearlast,
                        "none": push_unsorted}[push_order]
            if when_push:
                sp_cell[0] = sp

                @pl.when(is_node)
                def _():
                    kc = node_children(tfar)
                    sp_cell[0] = push_any(sp, kc[:8], kc[8:])

                sp = sp_cell[0]
            else:
                keys_codes = jax.lax.cond(is_node, node_children,
                                          no_children, tfar)
                sp = push_any(sp, keys_codes[:8], keys_codes[8:])
            # node_buf fully consumed -> speculate the next node row now
            # (overlaps the leaf math); the TRI fetch must wait until
            # leaf_work has read this step's tri_buf
            nxt = stack[jnp.maximum(sp - 1, 0)]
            start_node_fetch(nxt)

            dec = jnp.maximum(-(top + 1), 0)
            count = dec - (dec // LEAF_CODE_BASE) * LEAF_CODE_BASE
            k_off = (dec // LEAF_CODE_BASE) - leaf_first(top)

            def leaf_work(occ):
                for _ in range(2 if debug_double == "leaf" else 1):
                    for k in range(max_leaf):
                        h, _, _, _ = rays.mt(lambda c_, k=k: tri_buf[k, c_],
                                             tfar)
                        in_range = (k >= k_off) & (k < k_off + count)
                        occ = jnp.where(h & in_range, 1.0, occ)
                return occ

            occ = jax.lax.cond(jnp.logical_not(is_node), leaf_work,
                               lambda o: o, occ)
            start_tri_fetch(leaf_first(nxt))
            if count_steps:
                nc = c[2] + jnp.where(is_node, 1, 0)
                lc = c[3] + jnp.where(is_node, 0, 1)
                return sp, occ, nc, lc
            return sp, occ

        fin = jax.lax.while_loop(cond, body, init)
        occluded = fin[1]
        wait_node_fetch()
        wait_tri_fetch()
        t_out[:] = occluded
        if count_steps:
            u_out[:] = jnp.full_like(t_min, fin[2].astype(jnp.float32))
            v_out[:] = jnp.full_like(t_min, fin[3].astype(jnp.float32))
    else:
        def tri_row_scalar(k):
            def r(c):
                return tri_buf[k, c]
            return r

        zero = jnp.zeros_like(t_min)
        # payload init: th = tw = 1 (not 0) so miss lanes can never feed a
        # zero extent into the shade pass's mod/div index math
        extra = (zero, zero, zero, jnp.ones_like(t_min),
                 jnp.ones_like(t_min)) if uv_payload else ()
        assert not (uv_payload and count_steps)
        if count_steps:
            extra = (jnp.int32(0), jnp.int32(0))
        init = (jnp.int32(1), t_max0,
                jnp.full(t_min.shape, -1, jnp.int32),
                jnp.zeros_like(t_min), jnp.zeros_like(t_min)) + extra

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, t, tri, u, v = c[:5]
            pay = c[5:7] if count_steps else c[5:]
            top = stack[sp - 1]
            sp = sp - 1
            is_node = top >= 0
            wait_node_fetch()
            wait_tri_fetch()

            push = {"sort": push_sorted, "nearlast": push_nearlast,
                    "none": push_unsorted}[push_order]
            if when_push:
                sp_cell[0] = sp

                @pl.when(is_node)
                def _():
                    kc = node_children(t)
                    sp_cell[0] = push(sp, kc[:8], kc[8:])

                sp = sp_cell[0]
            else:
                keys_codes = jax.lax.cond(is_node, node_children,
                                          no_children, t)
                sp = push(sp, keys_codes[:8], keys_codes[8:])
            nxt = stack[jnp.maximum(sp - 1, 0)]
            start_node_fetch(nxt)

            dec = jnp.maximum(-(top + 1), 0)
            count = dec - (dec // LEAF_CODE_BASE) * LEAF_CODE_BASE
            k_off = (dec // LEAF_CODE_BASE) - leaf_first(top)

            def leaf_work(carry):
                t, tri, u, v = carry[:4]
                pay = list(carry[4:])
                # re-running the loop is idempotent: the MT hit test is
                # strict (tk < t), so no second-pass update can fire
                for _ in range(2 if debug_double == "leaf" else 1):
                    for k in range(max_leaf):
                        h, tk, uk, vk = rays.mt(
                            lambda c_, k=k: tri_buf[k, c_], t)
                        in_range = (k >= k_off) & (k < k_off + count)
                        upd = h & in_range
                        t = jnp.where(upd, tk, t)
                        tri = jnp.where(upd, tri_buf[k, 9].astype(jnp.int32),
                                        tri)
                        u = jnp.where(upd, uk, u)
                        v = jnp.where(upd, vk, v)
                        if uv_payload:
                            # same association as the shade pass's
                            # uv0*w + uv1*u + uv2*v interpolation
                            wk = 1.0 - uk - vk
                            r = tri_row_scalar(k)
                            vals = (r(10) * wk + r(12) * uk + r(14) * vk,
                                    r(11) * wk + r(13) * uk + r(15) * vk,
                                    r(16), r(17), r(18))
                            pay = [jnp.where(upd, nv, p)
                                   for nv, p in zip(vals, pay)]
                return (t, tri, u, v, *pay)

            carry = jax.lax.cond(jnp.logical_not(is_node), leaf_work,
                                 lambda cr: cr, (t, tri, u, v, *pay))
            start_tri_fetch(leaf_first(nxt))
            if count_steps:
                nc = carry[4] + jnp.where(is_node, 1, 0)
                lc = carry[5] + jnp.where(is_node, 0, 1)
                return (sp,) + carry[:4] + (nc, lc)
            return (sp,) + carry

        fin = jax.lax.while_loop(cond, body, init)
        _, t, tri, u, v = fin[:5]
        wait_node_fetch()
        wait_tri_fetch()
        t_out[:] = t
        tri_out[:] = tri
        if count_steps:
            u_out[:] = jnp.full_like(t, fin[5].astype(jnp.float32))
            v_out[:] = jnp.full_like(t, fin[6].astype(jnp.float32))
        else:
            u_out[:] = u
            v_out[:] = v
        if uv_payload:
            for ref, val in zip((tu_out, tv_out, im_out, th_out, tw_out),
                                fin[5:]):
                ref[:] = val



def _kernel_bvh8_pop2(nodes_ref, tris_ref,
                      ox, oy, oz, dx, dy, dz, tmn, tmx,
                      t_out, tri_out, u_out, v_out,
                      stack, node_buf, tri_buf, sems,
                      *, max_leaf: int, any_hit: bool):
    """TWO-pop step variant (the round-4 roadmap's named candidate): each
    while iteration pops up to two stack entries and processes them in
    batched phases — leaf MT for both (near entry first, so its t shrink
    culls the far one), then ONE cond computing all 16 child slab tests,
    then both push groups (far entry's children pushed first so the near
    entry's children stay on top). The fixed per-iteration scaffolding
    (loop boundary, alive check, cond dispatch, speculation) is paid once
    per two pops; the doubled slab/reduce work is ~free per
    BVH8_STEP_ABLATE.json. Speculation: node rows + leaf blocks for BOTH
    next tops are in flight across the iteration (node_buf (2,128),
    tri_buf (2,max_leaf,128)).

    Traversal ORDER differs from the one-pop kernel (the second entry is
    processed before the first entry's children), which closest-hit
    results are invariant to up to equal-t ties; any-hit occlusion is
    sticky-OR and exactly order-invariant. Transient stack growth is up
    to +14 entries per iteration vs +7 (flatten_scene's depth guard
    keeps 7*depth+8 < STACK_DEPTH for the scenes that build BVH8)."""
    rays = _Rays(ox, oy, oz, dx, dy, dz, tmn, tmx)
    t_min = rays.t_min
    t_max0 = rays.t_max0
    num_tris = tris_ref.shape[0]
    num_nodes = nodes_ref.shape[0]
    first_cap = max(num_tris - max_leaf, 0)

    stack[0] = jnp.int32(0)

    def start_node_fetch(e, node):
        pltpu.make_async_copy(
            nodes_ref.at[pl.ds(jnp.clip(node, 0, num_nodes - 1), 1)],
            node_buf.at[e], sems.at[0, e]).start()

    def wait_node_fetch(e):
        pltpu.make_async_copy(nodes_ref.at[pl.ds(0, 1)], node_buf.at[e],
                              sems.at[0, e]).wait()

    def leaf_first(top):
        dec = jnp.maximum(-(top + 1), 0)
        return jnp.clip(dec // LEAF_CODE_BASE, 0, first_cap)

    def start_tri_fetch(e, first_c):
        pltpu.make_async_copy(tris_ref.at[pl.ds(first_c, max_leaf)],
                              tri_buf.at[e], sems.at[1, e]).start()

    def wait_tri_fetch(e):
        pltpu.make_async_copy(tris_ref.at[pl.ds(0, max_leaf)],
                              tri_buf.at[e], sems.at[1, e]).wait()

    for e in range(2):
        start_node_fetch(e, jnp.int32(0))
        start_tri_fetch(e, jnp.int32(0))

    md_x = jnp.sum(rays.d_x)
    md_y = jnp.sum(rays.d_y)
    md_z = jnp.sum(rays.d_z)

    def children_of(e, gate, tfar):
        """8 slab tests + metas for entry e's node row; `gate` (scalar
        bool) invalidates every key when the entry is not a live node."""
        hits = []
        for k in range(8):
            b = k * 6
            hits.append(rays.slab(
                node_buf[e, 0, b], node_buf[e, 0, b + 1],
                node_buf[e, 0, b + 2], node_buf[e, 0, b + 3],
                node_buf[e, 0, b + 4], node_buf[e, 0, b + 5], tfar))
        anys = [jnp.any(h) for h in hits]
        keys = []
        codes = []
        for k in range(8):
            b = k * 6
            child = node_buf[e, 0, 48 + k]
            firstf = node_buf[e, 0, 56 + k]
            countf = node_buf[e, 0, 64 + k]
            is_int = child >= 0.0
            is_lf = countf > 0.0
            code = jnp.where(
                is_int, child.astype(jnp.int32),
                -(firstf.astype(jnp.int32) * LEAF_CODE_BASE
                  + countf.astype(jnp.int32)) - 1)
            if any_hit:
                keys.append(jnp.where(gate & anys[k] & (is_int | is_lf),
                                      jnp.float32(0.0), jnp.float32(_NEG)))
            else:
                key = ((node_buf[e, 0, b] + node_buf[e, 0, b + 3]) * md_x
                       + (node_buf[e, 0, b + 1] + node_buf[e, 0, b + 4])
                       * md_y
                       + (node_buf[e, 0, b + 2] + node_buf[e, 0, b + 5])
                       * md_z)
                keys.append(jnp.where(gate & anys[k] & (is_int | is_lf),
                                      key, jnp.float32(_NEG)))
            codes.append(code)
        return tuple(keys) + tuple(codes)

    def push_sorted(sp, keys, codes):
        keys = list(keys)
        codes = list(codes)
        for a, b in _BATCHER8:
            swap = keys[a] < keys[b]
            ka = jnp.where(swap, keys[b], keys[a])
            kb = jnp.where(swap, keys[a], keys[b])
            ca = jnp.where(swap, codes[b], codes[a])
            cb = jnp.where(swap, codes[a], codes[b])
            keys[a], keys[b] = ka, kb
            codes[a], codes[b] = ca, cb
        for k in range(8):
            stack[jnp.minimum(sp, STACK_DEPTH - 1)] = codes[k]
            sp = jnp.where(keys[k] > jnp.float32(_NEG / 2),
                           jnp.minimum(sp + 1, STACK_DEPTH), sp)
        return sp

    def push_unsorted(sp, keys, codes):
        for k in range(8):
            stack[jnp.minimum(sp, STACK_DEPTH - 1)] = codes[k]
            sp = jnp.where(keys[k] > jnp.float32(_NEG / 2),
                           jnp.minimum(sp + 1, STACK_DEPTH), sp)
        return sp

    def pop_two(sp):
        """Pop the top entry (near, always valid under the loop cond) and
        the one below it (valid when sp >= 2; forced to a gated-off node
        code otherwise)."""
        top0 = stack[jnp.maximum(sp - 1, 0)]
        valid1 = sp >= 2
        top1 = jnp.where(valid1, stack[jnp.maximum(sp - 2, 0)], 0)
        return jnp.maximum(sp - 2, 0), top0, top1, valid1

    def leaf_meta(top):
        dec = jnp.maximum(-(top + 1), 0)
        count = dec - (dec // LEAF_CODE_BASE) * LEAF_CODE_BASE
        k_off = (dec // LEAF_CODE_BASE) - leaf_first(top)
        return count, k_off

    if any_hit:
        init = (jnp.int32(1), jnp.zeros_like(t_min))

        def cond(c):
            sp, occ = c
            return (sp > 0) & jnp.logical_not(
                jnp.all((occ > 0.0) | (t_max0 <= t_min)))

        def body(c):
            sp, occ = c
            sp, top0, top1, valid1 = pop_two(sp)
            for e in range(2):
                wait_node_fetch(e)
                wait_tri_fetch(e)
            tfar = jnp.where(occ > 0.0, t_min, t_max0)

            # leaf phase (order irrelevant for sticky-OR occlusion)
            for e, (top, gate) in enumerate(
                    ((top0, top0 < 0), (top1, valid1 & (top1 < 0)))):
                count, k_off = leaf_meta(top)

                def leaf_work(occ, e=e, k_off=k_off, count=count):
                    for k in range(max_leaf):
                        h, _, _, _ = rays.mt(
                            lambda c_, e=e, k=k: tri_buf[e, k, c_], tfar)
                        in_range = (k >= k_off) & (k < k_off + count)
                        occ = jnp.where(h & in_range, 1.0, occ)
                    return occ

                occ = jax.lax.cond(gate, leaf_work, lambda o: o, occ)

            # node phase: ONE cond batches both entries' 16 slab tests
            is_n0 = top0 >= 0
            is_n1 = valid1 & (top1 >= 0)

            def both_children(tfar):
                return (children_of(0, is_n0, tfar)
                        + children_of(1, is_n1, tfar))

            def no_children(tfar):
                del tfar
                return 2 * (tuple(jnp.float32(_NEG) for _ in range(8))
                            + tuple(jnp.int32(0) for _ in range(8)))

            # refresh the cull bound with this iteration's leaf occlusion
            kc = jax.lax.cond(is_n0 | is_n1, both_children, no_children,
                              jnp.where(occ > 0.0, t_min, t_max0))
            sp = push_unsorted(sp, kc[16:24], kc[24:32])  # far entry first
            sp = push_unsorted(sp, kc[0:8], kc[8:16])
            nxt0 = stack[jnp.maximum(sp - 1, 0)]
            nxt1 = stack[jnp.maximum(sp - 2, 0)]
            start_node_fetch(0, nxt0)
            start_node_fetch(1, nxt1)
            start_tri_fetch(0, leaf_first(nxt0))
            start_tri_fetch(1, leaf_first(nxt1))
            return sp, occ

        _, occluded = jax.lax.while_loop(cond, body, init)
        for e in range(2):
            wait_node_fetch(e)
            wait_tri_fetch(e)
        t_out[:] = occluded
    else:
        init = (jnp.int32(1), t_max0,
                jnp.full(t_min.shape, -1, jnp.int32),
                jnp.zeros_like(t_min), jnp.zeros_like(t_min))

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, t, tri, u, v = c
            sp, top0, top1, valid1 = pop_two(sp)
            for e in range(2):
                wait_node_fetch(e)
                wait_tri_fetch(e)

            # leaf phase, NEAR entry first so its t shrink culls the far
            # entry's tests
            for e, (top, gate) in enumerate(
                    ((top0, top0 < 0), (top1, valid1 & (top1 < 0)))):
                count, k_off = leaf_meta(top)

                def leaf_work(carry, e=e, k_off=k_off, count=count):
                    t, tri, u, v = carry
                    for k in range(max_leaf):
                        h, tk, uk, vk = rays.mt(
                            lambda c_, e=e, k=k: tri_buf[e, k, c_], t)
                        in_range = (k >= k_off) & (k < k_off + count)
                        upd = h & in_range
                        t = jnp.where(upd, tk, t)
                        tri = jnp.where(upd,
                                        tri_buf[e, k, 9].astype(jnp.int32),
                                        tri)
                        u = jnp.where(upd, uk, u)
                        v = jnp.where(upd, vk, v)
                    return t, tri, u, v

                t, tri, u, v = jax.lax.cond(gate, leaf_work, lambda cr: cr,
                                            (t, tri, u, v))

            is_n0 = top0 >= 0
            is_n1 = valid1 & (top1 >= 0)

            def both_children(tfar):
                return (children_of(0, is_n0, tfar)
                        + children_of(1, is_n1, tfar))

            def no_children(tfar):
                del tfar
                return 2 * (tuple(jnp.float32(_NEG) for _ in range(8))
                            + tuple(jnp.int32(0) for _ in range(8)))

            kc = jax.lax.cond(is_n0 | is_n1, both_children, no_children, t)
            # far entry's children first; near entry's children pop first
            sp = push_sorted(sp, kc[16:24], kc[24:32])
            sp = push_sorted(sp, kc[0:8], kc[8:16])
            nxt0 = stack[jnp.maximum(sp - 1, 0)]
            nxt1 = stack[jnp.maximum(sp - 2, 0)]
            start_node_fetch(0, nxt0)
            start_node_fetch(1, nxt1)
            start_tri_fetch(0, leaf_first(nxt0))
            start_tri_fetch(1, leaf_first(nxt1))
            return sp, t, tri, u, v

        _, t, tri, u, v = jax.lax.while_loop(cond, body, init)
        for e in range(2):
            wait_node_fetch(e)
            wait_tri_fetch(e)
        t_out[:] = t
        tri_out[:] = tri
        u_out[:] = u
        v_out[:] = v


def _kernel_bvh8_any_multi(nodes_ref, tris_ref, *refs,
                           max_leaf: int, n_sets: int,
                           when_push: bool = False):
    """Fused multi-set any-hit traversal: S independent shadow-ray sets for
    the SAME pixel tile (one per shadow-casting light — identical origins,
    different directions) traverse ONE shared stack. A child is pushed when
    any lane of ANY set hits it, so the loop walks the UNION of the S
    footprints instead of their sum: near the common origin the footprints
    coincide, which is where most steps happen. Per-step cost rises only by
    the extra slab/MT VPU work — the serial scalar chain that dominates the
    step (BVH8_STEP_ABLATE.json) is paid ONCE for all S sets, which is the
    win the XLA-level launch merge (measured cost-neutral in round 2) could
    not reach.

    Occlusion per set is bit-identical to S separate any-hit launches: a
    set visiting extra leaves (pushed for another set) cannot gain hits —
    a triangle hit inside (t_min, tfar) implies the ray passes through the
    enclosing child AABB in that interval, so the set's own launch would
    have pushed that child too; and occ updates are sticky ORs, so visit
    order is irrelevant.

    refs layout: 8*S per-set ray refs (each its OWN (8,128) input block —
    per-set arrays go straight to the kernel; an earlier variant that
    pre-interleaved the sets into (S*8,128) blocks cost ~1 ms of pure XLA
    relayout at 800², swamping the kernel win), then S occ outputs, then
    the shared scratch (stack, node row, leaf block, DMA sems).

    Replaces the reference's per-light shadow traceRayEXT loop
    (raytrace.rgen.glsl:164-182) at one launch per frame."""
    if when_push:
        # trailing SMEM (1,) cell carries the post-push sp out of pl.when
        *refs, sp_cell = refs
    ray_refs = refs[:8 * n_sets]
    occ_outs = refs[8 * n_sets:9 * n_sets]
    stack, node_buf, tri_buf, sems = refs[9 * n_sets:]
    rays = [_Rays(*ray_refs[8 * s:8 * (s + 1)]) for s in range(n_sets)]
    num_tris = tris_ref.shape[0]
    num_nodes = nodes_ref.shape[0]
    first_cap = max(num_tris - max_leaf, 0)

    stack[0] = jnp.int32(0)

    def start_node_fetch(node):
        pltpu.make_async_copy(
            nodes_ref.at[pl.ds(jnp.clip(node, 0, num_nodes - 1), 1)],
            node_buf, sems.at[0]).start()

    def wait_node_fetch():
        pltpu.make_async_copy(nodes_ref.at[pl.ds(0, 1)], node_buf,
                              sems.at[0]).wait()

    def leaf_first(top):
        dec = jnp.maximum(-(top + 1), 0)
        return jnp.clip(dec // LEAF_CODE_BASE, 0, first_cap)

    def start_tri_fetch(first_c):
        pltpu.make_async_copy(tris_ref.at[pl.ds(first_c, max_leaf)],
                              tri_buf, sems.at[1]).start()

    def wait_tri_fetch():
        pltpu.make_async_copy(tris_ref.at[pl.ds(0, max_leaf)], tri_buf,
                              sems.at[1]).wait()

    start_node_fetch(jnp.int32(0))
    start_tri_fetch(jnp.int32(0))

    def node_children(tfars):
        """Same batched emission order as the single kernel: ALL S*8 slab
        tests first (independent VPU work), then the OR-merged any()
        reduces (8 reduces total, same count as one set), then the scalar
        meta decode."""
        hits = []
        for k in range(8):
            b = k * 6
            hits.append([rays[s].slab(
                node_buf[0, b], node_buf[0, b + 1], node_buf[0, b + 2],
                node_buf[0, b + 3], node_buf[0, b + 4], node_buf[0, b + 5],
                tfars[s]) for s in range(n_sets)])
        anys = []
        for k in range(8):
            m = hits[k][0]
            for s in range(1, n_sets):
                m = m | hits[k][s]
            anys.append(jnp.any(m))
        keys = []
        codes = []
        for k in range(8):
            child = node_buf[0, 48 + k]
            firstf = node_buf[0, 56 + k]
            countf = node_buf[0, 64 + k]
            is_int = child >= 0.0
            is_lf = countf > 0.0
            code = jnp.where(
                is_int, child.astype(jnp.int32),
                -(firstf.astype(jnp.int32) * LEAF_CODE_BASE
                  + countf.astype(jnp.int32)) - 1)
            keys.append(jnp.where(anys[k] & (is_int | is_lf),
                                  jnp.float32(1.0), jnp.float32(_NEG)))
            codes.append(code)
        return tuple(keys) + tuple(codes)

    def no_children(tfars):
        del tfars
        return (tuple(jnp.float32(_NEG) for _ in range(8))
                + tuple(jnp.int32(0) for _ in range(8)))

    def push_unsorted(sp, keys, codes):
        for k in range(8):
            stack[jnp.minimum(sp, STACK_DEPTH - 1)] = codes[k]
            sp = jnp.where(keys[k] > jnp.float32(_NEG / 2),
                           jnp.minimum(sp + 1, STACK_DEPTH), sp)
        return sp

    init = (jnp.int32(1),) + tuple(jnp.zeros_like(rays[s].t_min)
                                   for s in range(n_sets))

    def set_done(occ, s):
        return jnp.all((occ > 0.0) | (rays[s].t_max0 <= rays[s].t_min))

    def cond(c):
        sp = c[0]
        done = set_done(c[1], 0)
        for s in range(1, n_sets):
            done = done & set_done(c[1 + s], s)
        return (sp > 0) & jnp.logical_not(done)

    def body(c):
        sp = c[0]
        occs = list(c[1:])
        top = stack[sp - 1]
        sp = sp - 1
        is_node = top >= 0
        wait_node_fetch()
        wait_tri_fetch()
        tfars = tuple(jnp.where(occs[s] > 0.0, rays[s].t_min,
                                rays[s].t_max0) for s in range(n_sets))

        if when_push:
            sp_cell[0] = sp

            @pl.when(is_node)
            def _():
                kc = node_children(tfars)
                sp_cell[0] = push_unsorted(sp, kc[:8], kc[8:])

            sp = sp_cell[0]
        else:
            keys_codes = jax.lax.cond(is_node, node_children, no_children,
                                      tfars)
            sp = push_unsorted(sp, keys_codes[:8], keys_codes[8:])
        nxt = stack[jnp.maximum(sp - 1, 0)]
        start_node_fetch(nxt)

        dec = jnp.maximum(-(top + 1), 0)
        count = dec - (dec // LEAF_CODE_BASE) * LEAF_CODE_BASE
        k_off = (dec // LEAF_CODE_BASE) - leaf_first(top)

        def leaf_work(occs):
            occs = list(occs)
            for k in range(max_leaf):
                in_range = (k >= k_off) & (k < k_off + count)
                for s in range(n_sets):
                    h, _, _, _ = rays[s].mt(lambda c_, k=k: tri_buf[k, c_],
                                            tfars[s])
                    occs[s] = jnp.where(h & in_range, 1.0, occs[s])
            return tuple(occs)

        occs = jax.lax.cond(jnp.logical_not(is_node), leaf_work,
                            lambda o: o, tuple(occs))
        start_tri_fetch(leaf_first(nxt))
        return (sp,) + occs

    res = jax.lax.while_loop(cond, body, init)
    wait_node_fetch()
    wait_tri_fetch()
    for s in range(n_sets):
        occ_outs[s][:] = res[1 + s]


def _kernel_bvh8_any_multi_pop2(nodes_ref, tris_ref, *refs,
                                max_leaf: int, n_sets: int):
    """Two-pop variant of the fused multi-set any-hit kernel (the
    production shadow path): up to two stack entries per iteration, leaf
    MT for both entries (all S sets), then ONE cond batching both
    entries' 16 slab tests x S sets, unsorted pushes. Occlusion stays
    exactly order-invariant (sticky ORs); see _kernel_bvh8_pop2 for the
    phase rationale."""
    ray_refs = refs[:8 * n_sets]
    occ_outs = refs[8 * n_sets:9 * n_sets]
    stack, node_buf, tri_buf, sems = refs[9 * n_sets:]
    rays = [_Rays(*ray_refs[8 * s:8 * (s + 1)]) for s in range(n_sets)]
    num_tris = tris_ref.shape[0]
    num_nodes = nodes_ref.shape[0]
    first_cap = max(num_tris - max_leaf, 0)

    stack[0] = jnp.int32(0)

    def start_node_fetch(e, node):
        pltpu.make_async_copy(
            nodes_ref.at[pl.ds(jnp.clip(node, 0, num_nodes - 1), 1)],
            node_buf.at[e], sems.at[0, e]).start()

    def wait_node_fetch(e):
        pltpu.make_async_copy(nodes_ref.at[pl.ds(0, 1)], node_buf.at[e],
                              sems.at[0, e]).wait()

    def leaf_first(top):
        dec = jnp.maximum(-(top + 1), 0)
        return jnp.clip(dec // LEAF_CODE_BASE, 0, first_cap)

    def start_tri_fetch(e, first_c):
        pltpu.make_async_copy(tris_ref.at[pl.ds(first_c, max_leaf)],
                              tri_buf.at[e], sems.at[1, e]).start()

    def wait_tri_fetch(e):
        pltpu.make_async_copy(tris_ref.at[pl.ds(0, max_leaf)],
                              tri_buf.at[e], sems.at[1, e]).wait()

    for e in range(2):
        start_node_fetch(e, jnp.int32(0))
        start_tri_fetch(e, jnp.int32(0))

    def children_of(e, gate, tfars):
        hits = []
        for k in range(8):
            b = k * 6
            hits.append([rays[s].slab(
                node_buf[e, 0, b], node_buf[e, 0, b + 1],
                node_buf[e, 0, b + 2], node_buf[e, 0, b + 3],
                node_buf[e, 0, b + 4], node_buf[e, 0, b + 5],
                tfars[s]) for s in range(n_sets)])
        anys = []
        for k in range(8):
            m = hits[k][0]
            for s in range(1, n_sets):
                m = m | hits[k][s]
            anys.append(jnp.any(m))
        keys = []
        codes = []
        for k in range(8):
            child = node_buf[e, 0, 48 + k]
            firstf = node_buf[e, 0, 56 + k]
            countf = node_buf[e, 0, 64 + k]
            is_int = child >= 0.0
            is_lf = countf > 0.0
            code = jnp.where(
                is_int, child.astype(jnp.int32),
                -(firstf.astype(jnp.int32) * LEAF_CODE_BASE
                  + countf.astype(jnp.int32)) - 1)
            keys.append(jnp.where(gate & anys[k] & (is_int | is_lf),
                                  jnp.float32(0.0), jnp.float32(_NEG)))
            codes.append(code)
        return tuple(keys) + tuple(codes)

    def push_unsorted(sp, keys, codes):
        for k in range(8):
            stack[jnp.minimum(sp, STACK_DEPTH - 1)] = codes[k]
            sp = jnp.where(keys[k] > jnp.float32(_NEG / 2),
                           jnp.minimum(sp + 1, STACK_DEPTH), sp)
        return sp

    init = (jnp.int32(1),) + tuple(jnp.zeros_like(rays[s].t_min)
                                   for s in range(n_sets))

    def set_done(occ, s):
        return jnp.all((occ > 0.0) | (rays[s].t_max0 <= rays[s].t_min))

    def cond(c):
        sp = c[0]
        done = set_done(c[1], 0)
        for s in range(1, n_sets):
            done = done & set_done(c[1 + s], s)
        return (sp > 0) & jnp.logical_not(done)

    def body(c):
        sp = c[0]
        occs = list(c[1:])
        top0 = stack[jnp.maximum(sp - 1, 0)]
        valid1 = sp >= 2
        top1 = jnp.where(valid1, stack[jnp.maximum(sp - 2, 0)], 0)
        sp = jnp.maximum(sp - 2, 0)
        for e in range(2):
            wait_node_fetch(e)
            wait_tri_fetch(e)
        tfars = tuple(jnp.where(occs[s] > 0.0, rays[s].t_min,
                                rays[s].t_max0) for s in range(n_sets))

        for e, (top, gate) in enumerate(
                ((top0, top0 < 0), (top1, valid1 & (top1 < 0)))):
            dec = jnp.maximum(-(top + 1), 0)
            count = dec - (dec // LEAF_CODE_BASE) * LEAF_CODE_BASE
            k_off = (dec // LEAF_CODE_BASE) - leaf_first(top)

            def leaf_work(occs, e=e, k_off=k_off, count=count):
                occs = list(occs)
                for k in range(max_leaf):
                    in_range = (k >= k_off) & (k < k_off + count)
                    for s in range(n_sets):
                        h, _, _, _ = rays[s].mt(
                            lambda c_, e=e, k=k: tri_buf[e, k, c_],
                            tfars[s])
                        occs[s] = jnp.where(h & in_range, 1.0, occs[s])
                return tuple(occs)

            occs = list(jax.lax.cond(gate, leaf_work, lambda o: o,
                                     tuple(occs)))

        is_n0 = top0 >= 0
        is_n1 = valid1 & (top1 >= 0)
        # refresh the cull bound with this iteration's leaf occlusion
        tfars2 = tuple(jnp.where(occs[s] > 0.0, rays[s].t_min,
                                 rays[s].t_max0) for s in range(n_sets))

        def both_children(tfars2):
            return (children_of(0, is_n0, tfars2)
                    + children_of(1, is_n1, tfars2))

        def no_children(tfars2):
            del tfars2
            return 2 * (tuple(jnp.float32(_NEG) for _ in range(8))
                        + tuple(jnp.int32(0) for _ in range(8)))

        kc = jax.lax.cond(is_n0 | is_n1, both_children, no_children,
                          tfars2)
        sp = push_unsorted(sp, kc[16:24], kc[24:32])
        sp = push_unsorted(sp, kc[0:8], kc[8:16])
        nxt0 = stack[jnp.maximum(sp - 1, 0)]
        nxt1 = stack[jnp.maximum(sp - 2, 0)]
        start_node_fetch(0, nxt0)
        start_node_fetch(1, nxt1)
        start_tri_fetch(0, leaf_first(nxt0))
        start_tri_fetch(1, leaf_first(nxt1))
        return (sp,) + tuple(occs)

    res = jax.lax.while_loop(cond, body, init)
    for e in range(2):
        wait_node_fetch(e)
        wait_tri_fetch(e)
    for s in range(n_sets):
        occ_outs[s][:] = res[1 + s]


def _trace_packets_bvh8_any_multi(nodes8, tris128, rays_list,
                                  max_leaf: int, interpret: bool,
                                  pop2: bool = False, fat: int = 1,
                                  when_push: bool = False):
    """Fused any-hit over S per-set packet dicts (each (P*8, 128)). Every
    set's component arrays feed the kernel as their OWN inputs with (8,128)
    blocks at the same grid index — one grid step sees all S ray sets of
    the same 32x32 pixel tile with ZERO pre-interleave relayout (an
    (S*8,128) concat layout cost ~1 ms of pure data movement at 800²).
    pop2 routes through the two-pop kernel (double scratch).
    fat > 1 merges that many adjacent tiles into one (8*fat, 128) packet
    per set (see FAT_ANY_DEFAULT)."""
    n_sets = len(rays_list)
    n_sub = rays_list[0]["ox"].shape[0]
    if fat > 1:
        assert not pop2, "fat packets compose only with the one-pop kernel"
        blk = 8 * fat
        n_pad = -(-n_sub // blk) * blk
        if n_pad != n_sub:
            ext = n_pad - n_sub

            def pad(a, val):
                return jnp.concatenate(
                    [a, jnp.full((ext, PACKET_LANES), val, a.dtype)], axis=0)

            rays_list = [dict(
                ox=pad(r["ox"], 0.0), oy=pad(r["oy"], 0.0),
                oz=pad(r["oz"], 0.0), dx=pad(r["dx"], 1.0),
                dy=pad(r["dy"], 1.0), dz=pad(r["dz"], 1.0),
                tmin=pad(r["tmin"], 1.0), tmax=pad(r["tmax"], 0.0))
                for r in rays_list]
        n_out = n_pad
    else:
        n_out = n_sub
    n_pk = n_out // (8 * fat)

    ray_spec = pl.BlockSpec((8 * fat, PACKET_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    if pop2:
        scratch = [
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((2, 1, 128), jnp.float32),         # 2 node rows
            pltpu.VMEM((2, max_leaf, 128), jnp.float32),  # 2 leaf blocks
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        kernel = partial(_kernel_bvh8_any_multi_pop2, max_leaf=max_leaf,
                         n_sets=n_sets)
    else:
        scratch = [
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((1, 128), jnp.float32),         # node row
            pltpu.VMEM((max_leaf, 128), jnp.float32),  # leaf tri rows
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if when_push:
            scratch.append(pltpu.SMEM((1,), jnp.int32))  # post-push sp
        kernel = partial(_kernel_bvh8_any_multi, max_leaf=max_leaf,
                         n_sets=n_sets, when_push=when_push)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pk,),
        in_specs=[table_spec] * 2 + [ray_spec] * (8 * n_sets),
        out_specs=[ray_spec] * n_sets,
        scratch_shapes=scratch,
    )
    flat_rays = [r[c] for r in rays_list
                 for c in ("ox", "oy", "oz", "dx", "dy", "dz",
                           "tmin", "tmax")]
    occs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_out, PACKET_LANES), jnp.float32)
                   for _ in range(n_sets)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(nodes8, tris128, *flat_rays)
    return [o[:n_sub] for o in occs] if n_out != n_sub else list(occs)


@partial(jax.jit, static_argnames=("height", "width", "max_leaf",
                                   "interpret", "pop2", "fat",
                                   "when_push"))
def trace_any_bvh8_multi(bvh: dict, geom: dict, origin, dirs,
                         t_min, t_maxs, *, height: int, width: int,
                         max_leaf: int = LEAF8_MAX,
                         interpret: bool | None = None,
                         pop2: bool | None = None,
                         fat: int | None = None,
                         when_push: bool | None = None):
    """Fused any-hit BVH8 trace of S ray sets sharing origins: dirs a list
    of S (N, 3) arrays (or a stacked (S, N, 3)), t_maxs matching (N,)
    entries -> (S, H*W) bool occlusion. Bit-identical to S separate
    trace_any_bvh8 calls at ~the cost of the union footprint (one launch
    per frame instead of one per shadow-casting light). Lists are the fast
    calling convention — stacking S big arrays is a pure relayout."""
    interpret = _resolve_interpret(interpret)
    if pop2 is None:
        pop2 = POP2_DEFAULT and fat in (None, 1)
    if fat is None:
        fat = 1 if pop2 else FAT_ANY_DEFAULT
    if when_push is None:
        when_push = WHEN_PUSH_DEFAULT and not pop2
    tris128 = pack_tris_hbm(geom)
    n_sets = len(dirs)
    rays_list = [
        _rays_to_packets(origin, dirs[s], t_min, t_maxs[s], height, width)
        for s in range(n_sets)]
    occs = _trace_packets_bvh8_any_multi(bvh["nodes8"], tris128, rays_list,
                                         max_leaf, interpret, pop2=pop2,
                                         fat=fat, when_push=when_push)
    return jnp.stack([_from_packets(o, height, width) > 0.5 for o in occs])


def _kernel_bvh8(nodes_ref, tris_ref,
                 ox, oy, oz, dx, dy, dz, tmn, tmx,
                 t_out, tri_out, u_out, v_out,
                 stack, node_buf, tri_buf, sems,
                 *, max_leaf: int, any_hit: bool, push_order: str = "sort",
                 count_steps: bool = False, group: int = 1,
                 unroll: int = 1, flag_keys: bool = False):
    """One grid step traverses `group` INDEPENDENT 8x128 packets,
    interleaved inside one while loop, so packet g's speculative DMA is
    waited only after the other G-1 packets' slab/MT math. Measured
    OUTCOME (BVH8_GROUP_PROBE.json): no win — the speculative fetches
    already hide the DMA latency and grouping only adds bookkeeping, so
    the default stays group=1. The mechanism is kept (group-invariant,
    bit-identical results; finished packets skip their math under a
    scalar cond) as the recorded experiment for the node-compression
    question: traversal is compute-bound, not DMA-bound."""
    num_tris = tris_ref.shape[0]
    num_nodes = nodes_ref.shape[0]
    first_cap = max(num_tris - max_leaf, 0)

    def rays_of(g):
        s = slice(8 * g, 8 * (g + 1))
        return _Rays(ox[s], oy[s], oz[s], dx[s], dy[s], dz[s],
                     tmn[s], tmx[s])

    grays = [rays_of(g) for g in range(group)]

    def start_node_fetch(g, node):
        pltpu.make_async_copy(
            nodes_ref.at[pl.ds(jnp.clip(node, 0, num_nodes - 1), 1)],
            node_buf.at[g], sems.at[0, g]).start()

    def wait_node_fetch(g):
        pltpu.make_async_copy(nodes_ref.at[pl.ds(0, 1)], node_buf.at[g],
                              sems.at[0, g]).wait()

    def leaf_first(top):
        """Decode the clamped DMA window start of a (possibly-)leaf entry."""
        dec = jnp.maximum(-(top + 1), 0)
        return jnp.clip(dec // LEAF_CODE_BASE, 0, first_cap)

    def start_tri_fetch(g, first_c):
        pltpu.make_async_copy(tris_ref.at[pl.ds(first_c, max_leaf)],
                              tri_buf.at[g], sems.at[1, g]).start()

    def wait_tri_fetch(g):
        pltpu.make_async_copy(tris_ref.at[pl.ds(0, max_leaf)],
                              tri_buf.at[g], sems.at[1, g]).wait()

    for g in range(group):
        stack[g, 0] = jnp.int32(0)
        start_node_fetch(g, jnp.int32(0))
        start_tri_fetch(g, jnp.int32(0))

    def node_children(g, tfar):
        """8 slab tests + metas -> per-slot (key, code); key = _NEG when the
        slot should not be pushed. Reads node_buf[g] only. Same
        batched-slabs-first emission order as the single kernel: issuing
        all 8 VPU slab tests before the reduces and scalar meta decode let
        Mosaic overlap them (closest trace 8.6 -> 5.26 ms,
        BVH8_STEP_ABLATE.json)."""
        rays = grays[g]
        # packet mean direction for near-child-first ordering
        md_x = jnp.sum(rays.d_x)
        md_y = jnp.sum(rays.d_y)
        md_z = jnp.sum(rays.d_z)
        hits = []
        for k in range(8):
            b = k * 6
            hits.append(rays.slab(
                node_buf[g, 0, b], node_buf[g, 0, b + 1],
                node_buf[g, 0, b + 2], node_buf[g, 0, b + 3],
                node_buf[g, 0, b + 4], node_buf[g, 0, b + 5], tfar))
        anys = [jnp.any(h) for h in hits]
        keys = []
        codes = []
        for k in range(8):
            b = k * 6
            child = node_buf[g, 0, 48 + k]
            firstf = node_buf[g, 0, 56 + k]
            countf = node_buf[g, 0, 64 + k]
            is_int = child >= 0.0
            is_lf = countf > 0.0
            code = jnp.where(
                is_int, child.astype(jnp.int32),
                -(firstf.astype(jnp.int32) * LEAF_CODE_BASE
                  + countf.astype(jnp.int32)) - 1)
            if flag_keys:
                # see _kernel_bvh8_single.node_children: unsorted pushes
                # only need validity
                keys.append(jnp.where(anys[k] & (is_int | is_lf),
                                      jnp.float32(0.0), jnp.float32(_NEG)))
            else:
                key = ((node_buf[g, 0, b] + node_buf[g, 0, b + 3]) * md_x
                       + (node_buf[g, 0, b + 1] + node_buf[g, 0, b + 4])
                       * md_y
                       + (node_buf[g, 0, b + 2] + node_buf[g, 0, b + 5])
                       * md_z)
                keys.append(jnp.where(anys[k] & (is_int | is_lf), key,
                                      jnp.float32(_NEG)))
            codes.append(code)
        return tuple(keys) + tuple(codes)

    def no_children(g, tfar):
        del g, tfar
        return (tuple(jnp.float32(_NEG) for _ in range(8))
                + tuple(jnp.int32(0) for _ in range(8)))

    def push_sorted(g, sp, keys, codes):
        """Far-to-near pushes: sort descending by key (Batcher-8), then
        write sequentially, advancing sp only for valid entries (_NEG keys
        sort last and write harmlessly above the final top)."""
        keys = list(keys)
        codes = list(codes)
        for a, b in _BATCHER8:
            swap = keys[a] < keys[b]
            ka = jnp.where(swap, keys[b], keys[a])
            kb = jnp.where(swap, keys[a], keys[b])
            ca = jnp.where(swap, codes[b], codes[a])
            cb = jnp.where(swap, codes[a], codes[b])
            keys[a], keys[b] = ka, kb
            codes[a], codes[b] = ca, cb
        for k in range(8):
            stack[g, jnp.minimum(sp, STACK_DEPTH - 1)] = codes[k]
            sp = jnp.where(keys[k] > jnp.float32(_NEG / 2),
                           jnp.minimum(sp + 1, STACK_DEPTH), sp)
        return sp

    def push_nearlast(g, sp, keys, codes):
        """Cheap partial ordering: push in slot order but hold back the
        NEAREST valid child (max key) for the final push so it pops
        first — 7 comparators instead of the 19-comparator full sort;
        the shrinking t bound still culls most far children."""
        keys = list(keys)
        codes = list(codes)
        bk = keys[0]
        bc = codes[0]
        for k in range(1, 8):
            better = keys[k] > bk
            bk = jnp.where(better, keys[k], bk)
            bc = jnp.where(better, codes[k], bc)
        taken = jnp.int32(0)  # skip ONE slot equal to the best
        for k in range(8):
            is_best = (keys[k] == bk) & (codes[k] == bc) & (taken == 0)
            taken = jnp.where(is_best, 1, taken)
            valid = (keys[k] > jnp.float32(_NEG / 2)) & ~is_best
            stack[g, jnp.minimum(sp, STACK_DEPTH - 1)] = codes[k]
            sp = jnp.where(valid, jnp.minimum(sp + 1, STACK_DEPTH), sp)
        stack[g, jnp.minimum(sp, STACK_DEPTH - 1)] = bc
        sp = jnp.where(bk > jnp.float32(_NEG / 2),
                       jnp.minimum(sp + 1, STACK_DEPTH), sp)
        return sp

    def push_unsorted(g, sp, keys, codes):
        """Any-hit: order does not matter; invalid slots write at the
        current top without advancing and are overwritten by later valid
        ones."""
        for k in range(8):
            stack[g, jnp.minimum(sp, STACK_DEPTH - 1)] = codes[k]
            sp = jnp.where(keys[k] > jnp.float32(_NEG / 2),
                           jnp.minimum(sp + 1, STACK_DEPTH), sp)
        return sp

    def step_common(g, sp, tfar, alive):
        """Pop + slab/push + speculative fetches for packet g. Returns
        (new sp, popped top [0 when dead], next top). The math is gated
        by `alive` via the cond; the DMA start/wait pairing is
        UNCONDITIONAL so every wait has a matching start."""
        # dead packets read slot 0 harmlessly; forcing top=0 routes them
        # through the (gated-off) node path so no leaf update can fire
        top = jnp.where(alive, stack[g, jnp.maximum(sp - 1, 0)], 0)
        sp = jnp.where(alive, jnp.maximum(sp - 1, 0), sp)
        is_node = top >= 0
        wait_node_fetch(g)
        wait_tri_fetch(g)
        keys_codes = jax.lax.cond(is_node & alive,
                                  lambda t: node_children(g, t),
                                  lambda t: no_children(g, t), tfar)
        push = {"sort": push_sorted, "nearlast": push_nearlast,
                "none": push_unsorted}[push_order]
        sp = push(g, sp, keys_codes[:8], keys_codes[8:])
        nxt = stack[g, jnp.maximum(sp - 1, 0)]
        start_node_fetch(g, nxt)
        return sp, top, nxt

    if any_hit:
        # occlusion + done carried as f32 0/1 — Mosaic mishandles i1 carries
        init = tuple(jnp.int32(1) for _ in range(group)) + tuple(
            jnp.zeros_like(grays[g].t_min) for g in range(group))

        def alive_of(c, g):
            rays = grays[g]
            occ = c[group + g]
            done = jnp.all((occ > 0.0) | (rays.t_max0 <= rays.t_min))
            return (c[g] > 0) & jnp.logical_not(done)

        def cond(c):
            alive = alive_of(c, 0)
            for g in range(1, group):
                alive = alive | alive_of(c, g)
            return alive

        def body(c):
            sps = list(c[:group])
            occs = list(c[group:])
            # `unroll` sub-steps per while iteration amortize the Mosaic
            # loop-boundary overhead (~0.8 us/iteration by subtraction in
            # BVH8_STEPS.json); each sub-step re-derives aliveness from
            # the UPDATED state so drained packets skip their math
            for _ in range(unroll):
                for g in range(group):
                    rays = grays[g]
                    done = jnp.all((occs[g] > 0.0)
                                   | (rays.t_max0 <= rays.t_min))
                    alive = (sps[g] > 0) & jnp.logical_not(done)
                    tfar = jnp.where(occs[g] > 0.0, rays.t_min, rays.t_max0)
                    sps[g], top, nxt = step_common(g, sps[g], tfar, alive)

                    dec = jnp.maximum(-(top + 1), 0)
                    count = (dec - (dec // LEAF_CODE_BASE)
                             * LEAF_CODE_BASE)
                    k_off = (dec // LEAF_CODE_BASE) - leaf_first(top)

                    def leaf_work(occ, g=g, tfar=tfar, k_off=k_off,
                                  count=count):
                        rays = grays[g]
                        for k in range(max_leaf):
                            h, _, _, _ = rays.mt(
                                lambda c_, k=k: tri_buf[g, k, c_], tfar)
                            in_range = (k >= k_off) & (k < k_off + count)
                            occ = jnp.where(h & in_range, 1.0, occ)
                        return occ

                    occs[g] = jax.lax.cond(
                        jnp.logical_not(top >= 0) & alive, leaf_work,
                        lambda o: o, occs[g])
                    start_tri_fetch(g, leaf_first(nxt))
            return tuple(sps) + tuple(occs)

        res = jax.lax.while_loop(cond, body, init)
        for g in range(group):
            wait_node_fetch(g)
            wait_tri_fetch(g)
            t_out[8 * g:8 * (g + 1)] = res[group + g]
    else:
        init = tuple(jnp.int32(1) for _ in range(group))
        for g in range(group):
            rays = grays[g]
            init = init + (rays.t_max0,
                           jnp.full(rays.t_min.shape, -1, jnp.int32),
                           jnp.zeros_like(rays.t_min),
                           jnp.zeros_like(rays.t_min))
        if count_steps:
            # diagnostic mode: per-packet node/leaf pop counters ride the
            # carry and come back through u_out/v_out (tools/bvh8_steps)
            init = init + tuple(jnp.int32(0) for _ in range(2 * group))

        def cond(c):
            alive = c[0] > 0
            for g in range(1, group):
                alive = alive | (c[g] > 0)
            return alive

        def body(c):
            sps = list(c[:group])
            states = [list(c[group + 4 * g:group + 4 * (g + 1)])
                      for g in range(group)]
            counters = list(c[group * 5:]) if count_steps else []
            for _ in range(unroll):
              for g in range(group):
                alive = sps[g] > 0
                t = states[g][0]
                sps[g], top, nxt = step_common(g, sps[g], t, alive)
                is_node = top >= 0

                dec = jnp.maximum(-(top + 1), 0)
                count = dec - (dec // LEAF_CODE_BASE) * LEAF_CODE_BASE
                k_off = (dec // LEAF_CODE_BASE) - leaf_first(top)

                def leaf_work(carry, g=g, k_off=k_off, count=count):
                    rays = grays[g]
                    t, tri, u, v = carry
                    for k in range(max_leaf):
                        h, tk, uk, vk = rays.mt(
                            lambda c_, k=k: tri_buf[g, k, c_], t)
                        in_range = (k >= k_off) & (k < k_off + count)
                        upd = h & in_range
                        t = jnp.where(upd, tk, t)
                        tri = jnp.where(upd,
                                        tri_buf[g, k, 9].astype(jnp.int32),
                                        tri)
                        u = jnp.where(upd, uk, u)
                        v = jnp.where(upd, vk, v)
                    return t, tri, u, v

                states[g] = list(jax.lax.cond(
                    jnp.logical_not(is_node) & alive, leaf_work,
                    lambda cr: cr, tuple(states[g])))
                start_tri_fetch(g, leaf_first(nxt))
                if count_steps:
                    counters[2 * g] = counters[2 * g] + jnp.where(
                        is_node & alive, 1, 0)
                    counters[2 * g + 1] = counters[2 * g + 1] + jnp.where(
                        jnp.logical_not(is_node) & alive, 1, 0)
            out = tuple(sps) + tuple(x for s in states for x in s)
            if count_steps:
                out = out + tuple(counters)
            return out

        res = jax.lax.while_loop(cond, body, init)
        for g in range(group):
            wait_node_fetch(g)
            wait_tri_fetch(g)
            t, tri, u, v = res[group + 4 * g:group + 4 * (g + 1)]
            s = slice(8 * g, 8 * (g + 1))
            t_out[s] = t
            tri_out[s] = tri
            if count_steps:
                u_out[s] = jnp.full_like(u, res[group * 5 + 2 * g]
                                         .astype(jnp.float32))
                v_out[s] = jnp.full_like(v, res[group * 5 + 2 * g + 1]
                                         .astype(jnp.float32))
            else:
                u_out[s] = u
                v_out[s] = v


def _trace_packets_bvh8(nodes8, tris128, rays, max_leaf: int, any_hit: bool,
                        interpret: bool, push_order: str = "sort",
                        count_steps: bool = False, group: int = 1,
                        unroll: int = 1, debug_double: str = "",
                        reduce_mode: str = "each",
                        flag_keys: bool = False, pop2: bool = False,
                        uv_payload: bool = False, fat: int = 1,
                        when_push: bool = False):
    n_sub = rays["ox"].shape[0]
    if fat > 1:
        assert group == 1 and unroll == 1 and not pop2, \
            "fat packets compose only with the plain single-packet path"
        # reduce_mode "pair" packs two lane-hit counts as a + 4096*b in
        # one f32; counts reach 1024*fat, so exactness needs fat <= 2
        assert not (reduce_mode == "pair" and fat > 2)
    # pad the packet count to a multiple of `group*fat` with dead packets
    # (tmin=1 > tmax=0: the root slab test fails, one pop drains them)
    blk = 8 * group * fat
    n_pad = -(-n_sub // blk) * blk
    if n_pad != n_sub:
        ext = n_pad - n_sub

        def pad(a, val):
            return jnp.concatenate(
                [a, jnp.full((ext, PACKET_LANES), val, a.dtype)], axis=0)

        rays = dict(
            ox=pad(rays["ox"], 0.0), oy=pad(rays["oy"], 0.0),
            oz=pad(rays["oz"], 0.0), dx=pad(rays["dx"], 1.0),
            dy=pad(rays["dy"], 1.0), dz=pad(rays["dz"], 1.0),
            tmin=pad(rays["tmin"], 1.0), tmax=pad(rays["tmax"], 0.0))
    grid = (n_pad // blk,)

    ray_spec = pl.BlockSpec((blk, PACKET_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((n_pad, PACKET_LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, PACKET_LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_pad, PACKET_LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, PACKET_LANES), jnp.float32),
    ]
    if uv_payload:
        assert not any_hit and group == 1 and unroll == 1 \
            and not count_steps and not pop2, \
            "uv_payload composes only with the plain closest-hit path"
        out_shapes += [jax.ShapeDtypeStruct((n_pad, PACKET_LANES),
                                            jnp.float32)] * 5
    table_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    # count_steps runs on the single-packet kernel too (per-fat-packet
    # counters); the grouped kernel serves only group/unroll experiments
    plain = group == 1 and unroll == 1
    assert not when_push or (plain and not pop2), \
        "when_push composes only with the plain single-packet path"
    if pop2:
        assert plain and not count_steps and not debug_double \
            and reduce_mode == "each", \
            "pop2 composes only with the plain single-packet path"
        scratch = [
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((2, 1, 128), jnp.float32),         # 2 node rows
            pltpu.VMEM((2, max_leaf, 128), jnp.float32),  # 2 leaf blocks
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        kernel = partial(_kernel_bvh8_pop2, max_leaf=max_leaf,
                         any_hit=any_hit)
    elif plain:
        # default path: the round-2-proven single-packet kernel (see the
        # note above _kernel_bvh8_single)
        scratch = [
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((1, 128), jnp.float32),         # node row
            pltpu.VMEM((max_leaf, 128), jnp.float32),  # leaf tri rows
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if when_push:
            scratch.append(pltpu.SMEM((1,), jnp.int32))  # post-push sp
        kernel = partial(_kernel_bvh8_single, max_leaf=max_leaf,
                         any_hit=any_hit, push_order=push_order,
                         debug_double=debug_double, reduce_mode=reduce_mode,
                         flag_keys=flag_keys, uv_payload=uv_payload,
                         count_steps=count_steps, when_push=when_push)
    else:
        scratch = [
            pltpu.SMEM((group, STACK_DEPTH), jnp.int32),
            pltpu.VMEM((group, 1, 128), jnp.float32),         # node rows
            pltpu.VMEM((group, max_leaf, 128), jnp.float32),  # leaf tris
            pltpu.SemaphoreType.DMA((2, group)),
        ]
        kernel = partial(_kernel_bvh8, max_leaf=max_leaf, any_hit=any_hit,
                         push_order=push_order, count_steps=count_steps,
                         group=group, unroll=unroll, flag_keys=flag_keys)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[table_spec] * 2 + [ray_spec] * 8,
        out_specs=[ray_spec] * len(out_shapes),
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(nodes8, tris128,
      rays["ox"], rays["oy"], rays["oz"],
      rays["dx"], rays["dy"], rays["dz"],
      rays["tmin"], rays["tmax"])
    if n_pad != n_sub:
        outs = [o[:n_sub] for o in outs]
    return outs


@partial(jax.jit, static_argnames=("height", "width", "max_leaf",
                                   "interpret", "push_order",
                                   "count_steps", "group", "unroll",
                                   "debug_double", "reduce_mode", "pop2",
                                   "uv_payload", "fat", "when_push"))
def trace_closest_bvh8(bvh: dict, geom: dict, origin, direction,
                       t_min, t_max, *, height: int, width: int,
                       max_leaf: int = LEAF8_MAX,
                       interpret: bool | None = None,
                       push_order: str = "sort",
                       count_steps: bool = False, group: int = 1,
                       unroll: int = 1, debug_double: str = "",
                       reduce_mode: str = "each",
                       pop2: bool | None = None,
                       uv_payload: bool | None = None,
                       fat: int | None = None,
                       when_push: bool | None = None):
    """Closest-hit BVH8 packet trace. bvh must carry 'nodes8'
    (bvh/wide.collapse8). Contract matches trace_closest.
    count_steps=True is a diagnostic: u/v return the packet's node/leaf
    pop counts instead of barycentrics (t/tri stay correct).
    group = packets interleaved per kernel instance (DMA-latency hiding,
    see _kernel_bvh8; results are group-invariant).
    uv_payload=True (needs geom['uvp'], scene.py flatten) adds hit keys
    texu/texv/img/texh/texw from the winning triangle's payload row — the
    shade pass's texture-quad gather then runs INDEPENDENT of (and per
    GATHER_TRIGGER_PROBE.json, fully overlapped with) the tri_attr
    gather. None resolves to UVP_DEFAULT when the payload is available
    on the plain path."""
    interpret = _resolve_interpret(interpret)
    if pop2 is None:
        pop2 = POP2_DEFAULT and group == 1 and unroll == 1 \
            and fat in (None, 1) and not count_steps and not debug_double \
            and reduce_mode == "each"
    if fat is None:
        # an explicit pop2=True (probe/tests) keeps the one-tile packet:
        # the two knobs are separate experiments and do not compose
        fat = FAT_DEFAULT if group == 1 and unroll == 1 and not pop2 else 1
    if when_push is None:
        when_push = WHEN_PUSH_DEFAULT and group == 1 and unroll == 1 \
            and not pop2
    if uv_payload is None:
        uv_payload = UVP_DEFAULT and "uvp" in geom and group == 1 \
            and unroll == 1 and not count_steps and not pop2
    assert not uv_payload or "uvp" in geom, \
        "uv_payload needs geom['uvp'] (scene.py flatten)"
    tris128 = pack_tris_hbm(geom, uv_payload=uv_payload)
    rays = _rays_to_packets(origin, direction, t_min, t_max, height, width)
    outs = _trace_packets_bvh8(bvh["nodes8"], tris128, rays,
                               max_leaf, any_hit=False,
                               interpret=interpret,
                               push_order=push_order,
                               count_steps=count_steps,
                               group=group, unroll=unroll,
                               debug_double=debug_double,
                               reduce_mode=reduce_mode, pop2=pop2,
                               uv_payload=uv_payload, fat=fat,
                               when_push=when_push)
    t, tri, u, v = outs[:4]
    g = partial(_from_packets, height=height, width=width)
    hits = dict(t=g(t), tri=g(tri), u=g(u), v=g(v))
    if uv_payload:
        tu, tv, im, th, tw = outs[4:]
        hits.update(texu=g(tu), texv=g(tv), img=g(im),
                    texh=g(th), texw=g(tw))
    return hits


@partial(jax.jit, static_argnames=("height", "width", "max_leaf",
                                   "interpret", "group", "unroll",
                                   "debug_double", "reduce_mode",
                                   "push_order", "flag_keys", "pop2",
                                   "fat", "count_steps", "when_push"))
def trace_any_bvh8(bvh: dict, geom: dict, origin, direction,
                   t_min, t_max, *, height: int, width: int,
                   max_leaf: int = LEAF8_MAX,
                   interpret: bool | None = None, group: int = 1,
                   unroll: int = 1, debug_double: str = "",
                   reduce_mode: str = "each", push_order: str = "none",
                   flag_keys: bool | None = None,
                   pop2: bool | None = None,
                   fat: int | None = None, count_steps: bool = False,
                   when_push: bool | None = None):
    """Any-hit BVH8 packet trace; returns boolean occlusion mask (H*W,).
    push_order="none" (default) pushes children unsorted; "sort" pops
    near-first (early-exit A/B — see the note in the kernel body).
    flag_keys (default: on whenever pushes are unsorted) replaces the
    per-child centroid push keys — whose values unsorted pushes never
    read — with 0/_NEG validity flags, dropping ~88 scalar ops from
    every node step's serial chain; bit-identical traversal."""
    interpret = _resolve_interpret(interpret)
    if pop2 is None:
        pop2 = POP2_DEFAULT and group == 1 and unroll == 1 \
            and fat in (None, 1) and not debug_double and not count_steps \
            and reduce_mode == "each"
    if fat is None:
        fat = FAT_DEFAULT if group == 1 and unroll == 1 and not pop2 else 1
    if when_push is None:
        when_push = WHEN_PUSH_DEFAULT and group == 1 and unroll == 1 \
            and not pop2
    if flag_keys is None:
        flag_keys = push_order == "none"
    assert not (flag_keys and push_order != "none"), \
        "flag_keys discards key values; only valid with unsorted pushes"
    tris128 = pack_tris_hbm(geom)
    rays = _rays_to_packets(origin, direction, t_min, t_max, height, width)
    occ, _, u, v = _trace_packets_bvh8(bvh["nodes8"], tris128, rays,
                                       max_leaf, any_hit=True,
                                       interpret=interpret, group=group,
                                       unroll=unroll,
                                       debug_double=debug_double,
                                       reduce_mode=reduce_mode,
                                       push_order=push_order,
                                       flag_keys=flag_keys, pop2=pop2,
                                       fat=fat, count_steps=count_steps,
                                       when_push=when_push)
    res = _from_packets(occ, height, width) > 0.5
    if count_steps:
        g = partial(_from_packets, height=height, width=width)
        return res, g(u), g(v)
    return res
