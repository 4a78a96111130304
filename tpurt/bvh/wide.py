"""BVH8: host-side collapse of the threaded binary SAH BVH into 8-wide
nodes, packed one 128-lane f32 row per node for the Pallas packet kernel.

The reference delegates acceleration structures to the Vulkan driver
(vk_blas_builder.rs:88-170); on TPU we own the layout, and a wide node is
the right shape for the hardware: one 512 B row DMA brings in EIGHT child
AABBs, which the packet kernel tests as dense (8, 128) VPU ops — ~3x fewer
traversal steps (pops/DMAs/loop iterations) than the binary tree for the
same leaf work.

Collapse rules:
  * Ylitie et al.-style greedy widening: a wide node starts from a binary
    node's two children and repeatedly expands the largest-surface-area
    internal child until it has 8 children or only leaves remain.
  * **Subtree flattening**: an internal child whose whole subtree holds
    <= LEAF8_MAX contiguous triangles becomes a LEAF slot (first, total)
    instead of a child wide node — the packet kernel's serial step cost
    dominates, so one chunky Moller-Trumbore step beats descending a tiny
    subtree (measured: the naive collapse left 36% of wide nodes with
    only 2 children, avg fill 4.4/8).
  * **Leaf-slot merging**: sibling leaf slots with adjacent triangle
    ranges merge (box = union) while the total stays <= LEAF8_MAX —
    fewer stack pops for identical intersection work.

Row layout (f32 lanes; indices stored as exact small floats < 2^24):
  [k*6 .. k*6+5]  child k aabb_min.xyz, aabb_max.xyz   (k = 0..7)
  [48 + k]        wide index of internal child k, -1 if leaf/empty
  [56 + k]        leaf first-triangle index (0 if not leaf)
  [64 + k]        leaf triangle count (0 if internal/empty)
Empty slots carry an inverted box (always misses the slab test).
Leaf counts go up to LEAF8_MAX (the kernel packs stack codes base
LEAF_CODE_BASE=128, so leaf_max must stay < 128).
"""
from __future__ import annotations

import numpy as np

BRANCHING = 8
# max triangles in one BVH8 leaf slot (kernel unrolls this many MT tests
# per leaf pop; stack codes pack count base-128, so must stay < 128).
# 32 is the measured sweet spot on the bench scene (BVH8_LEAF_PROBE.json:
# closest 5.24/5.09/5.53/5.76/6.51 ms at 16/32/48/64/96): per-step serial
# overhead dominates traversal, so fatter leaves trade nearly-free VPU MT
# tests for fewer steps — until 48+, where the MT work stops being free.
LEAF8_MAX = 32
_EMPTY_MIN = 3.0e37
_EMPTY_MAX = -3.0e37


def _subtree_ranges(entry, skip, first, count, is_leaf):
    """Per-node (first, count, contiguous?) of the whole subtree's
    triangles. Children of b sit at higher indices in the depth-first
    flat layout, so one reverse pass suffices."""
    n = len(entry)
    sub_first = np.where(is_leaf, first, 0).astype(np.int64)
    sub_count = np.where(is_leaf, count, 0).astype(np.int64)
    flat_ok = is_leaf.copy()
    for b in range(n - 1, -1, -1):
        if not is_leaf[b]:
            l = int(entry[b])
            r = int(skip[l])
            sub_first[b] = min(sub_first[l], sub_first[r])
            sub_count[b] = sub_count[l] + sub_count[r]
            ends_meet = (
                sub_first[l] + sub_count[l] == sub_first[r]
                or sub_first[r] + sub_count[r] == sub_first[l])
            flat_ok[b] = bool(flat_ok[l] and flat_ok[r] and ends_meet)
    return sub_first, sub_count, flat_ok


def collapse8(bvh: dict, leaf_max: int = LEAF8_MAX):
    """Collapse a threaded binary FlatBVH pytree (host numpy arrays) into
    packed BVH8 rows. Returns (nodes8 (M8, 128) f32, max_depth int)."""
    amin = np.asarray(bvh["aabb_min"], np.float32)
    amax = np.asarray(bvh["aabb_max"], np.float32)
    entry = np.asarray(bvh["entry"], np.int64)
    skip = np.asarray(bvh["skip"], np.int64)
    first = np.asarray(bvh["first_tri"], np.int64)
    count = np.asarray(bvh["tri_count"], np.int64)
    is_leaf = count > 0

    sub_first, sub_count, flat_ok = _subtree_ranges(entry, skip, first,
                                                    count, is_leaf)

    d = amax - amin
    area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 0] * d[:, 2]

    def binary_children(b: int):
        l = int(entry[b])
        return l, int(skip[l])

    def slot_is_leaf(b: int) -> bool:
        return bool(is_leaf[b]
                    or (flat_ok[b] and sub_count[b] <= leaf_max))

    def slot_range(b: int):
        if is_leaf[b]:
            return int(first[b]), int(count[b])
        return int(sub_first[b]), int(sub_count[b])

    def kids_of(b: int):
        kids = list(binary_children(b))
        while len(kids) < BRANCHING:
            cand = [(area[k], j) for j, k in enumerate(kids)
                    if not is_leaf[k]]
            if not cand:
                break
            _, j = max(cand)
            k = kids.pop(j)
            kids.extend(binary_children(k))
        # slots: (is_leaf, payload); leaf payload = (first, count, box),
        # internal payload = binary node id
        slots = []
        for k in kids:
            if slot_is_leaf(k):
                f, c = slot_range(k)
                slots.append((True, (f, c, amin[k].copy(), amax[k].copy())))
            else:
                slots.append((False, k))
        # merge adjacent-range leaf slots (box = union) up to leaf_max
        leaves = sorted((s[1] for s in slots if s[0]), key=lambda p: p[0])
        merged = []
        for f, c, mn, mx in leaves:
            if merged and merged[-1][0] + merged[-1][1] == f \
                    and merged[-1][1] + c <= leaf_max:
                pf, pc, pmn, pmx = merged[-1]
                merged[-1] = (pf, pc + c, np.minimum(pmn, mn),
                              np.maximum(pmx, mx))
            else:
                merged.append((f, c, mn, mx))
        return ([(False, s[1]) for s in slots if not s[0]]
                + [(True, m) for m in merged])

    # BFS over wide nodes. Each wide node wraps one binary internal node.
    if is_leaf[0]:
        slot_lists = [[(True, (int(first[0]), int(count[0]),
                               amin[0], amax[0]))]]
        wide_of = {}
        depth = 1
    elif flat_ok[0] and sub_count[0] <= leaf_max:
        slot_lists = [[(True, (int(sub_first[0]), int(sub_count[0]),
                               amin[0], amax[0]))]]
        wide_of = {}
        depth = 1
    else:
        wide_of = {0: 0}
        queue = [(0, 1)]
        slot_lists = []
        depth = 1
        while queue:
            b, dep = queue.pop(0)
            depth = max(depth, dep)
            slots = kids_of(b)
            slot_lists.append(slots)
            for lf, payload in slots:
                if not lf:
                    wide_of[payload] = len(wide_of)
                    queue.append((payload, dep + 1))

    m8 = len(slot_lists)
    nodes8 = np.zeros((m8, 128), np.float32)
    nodes8[:, 0:48:6] = _EMPTY_MIN
    nodes8[:, 1:48:6] = _EMPTY_MIN
    nodes8[:, 2:48:6] = _EMPTY_MIN
    nodes8[:, 3:48:6] = _EMPTY_MAX
    nodes8[:, 4:48:6] = _EMPTY_MAX
    nodes8[:, 5:48:6] = _EMPTY_MAX
    nodes8[:, 48:56] = -1.0
    for w, slots in enumerate(slot_lists):
        assert len(slots) <= BRANCHING
        for k_slot, (lf, payload) in enumerate(slots):
            base = k_slot * 6
            if lf:
                f, c, mn, mx = payload
                assert 0 < c <= leaf_max
                nodes8[w, base:base + 3] = mn
                nodes8[w, base + 3:base + 6] = mx
                nodes8[w, 56 + k_slot] = float(f)
                nodes8[w, 64 + k_slot] = float(c)
            else:
                nodes8[w, base:base + 3] = amin[payload]
                nodes8[w, base + 3:base + 6] = amax[payload]
                nodes8[w, 48 + k_slot] = float(wide_of[payload])
    return nodes8, depth


# ------------------------------------------------------------------ refit --

def refit_plan(nodes8: np.ndarray):
    """Static refit metadata from packed BVH8 rows: BFS level partition
    (list of wide-node index arrays, root level first). Children always
    sit at deeper levels, so a reverse-level sweep refits bottom-up."""
    nodes8 = np.asarray(nodes8)
    child = nodes8[:, 48:56].astype(np.int64)
    levels = []
    cur = np.array([0], np.int64)
    seen = 1
    while cur.size:
        levels.append(cur.astype(np.int32))
        nxt = child[cur].reshape(-1)
        cur = np.unique(nxt[nxt >= 0])
        seen += cur.size
    assert seen - 1 + levels[0].size >= 0  # sanity; every node reached once
    return [np.asarray(l, np.int32) for l in levels]


def refit_bvh8(nodes8, levels, tri_min_sah, tri_max_sah, leaf_max: int):
    """In-jit BVH8 refit: recompute every slot AABB from the new
    (SAH-ordered) per-triangle AABBs, keeping the topology lanes
    untouched. The TPU analogue of VK acceleration-structure UPDATE
    (the reference prefers destroy-and-rebuild for its TLAS,
    vk_tlas_builder.rs:43-46, because driver BVHs degrade under refit;
    here the refit tree's topology is the full static SAH tree over the
    rest pose, so quality degrades only as instances move far from it).

    nodes8: (M, 128) f32; levels: refit_plan output; tri_min_sah /
    tri_max_sah: (T, 3) world AABBs in SAH triangle order."""
    import jax.numpy as jnp

    m = nodes8.shape[0]
    t = tri_min_sah.shape[0]
    firsts = nodes8[:, 56:64].astype(jnp.int32)          # (M, 8)
    counts = nodes8[:, 64:72].astype(jnp.int32)
    childs = nodes8[:, 48:56].astype(jnp.int32)

    # leaf slot boxes: unrolled masked reduction over <= leaf_max tris
    slot_min = jnp.full((m, 8, 3), _EMPTY_MIN, jnp.float32)
    slot_max = jnp.full((m, 8, 3), _EMPTY_MAX, jnp.float32)
    for k in range(leaf_max):
        idx = jnp.clip(firsts + k, 0, t - 1)
        valid = (k < counts)[..., None]
        slot_min = jnp.where(valid,
                             jnp.minimum(slot_min, tri_min_sah[idx]),
                             slot_min)
        slot_max = jnp.where(valid,
                             jnp.maximum(slot_max, tri_max_sah[idx]),
                             slot_max)

    # internal slots, deepest level first: child totals are ready before
    # any parent reads them
    total_min = jnp.zeros((m, 3), jnp.float32)
    total_max = jnp.zeros((m, 3), jnp.float32)
    for ids in reversed(levels):
        ids = jnp.asarray(ids)
        ch = childs[ids]                                  # (L, 8)
        is_int = (ch >= 0)[..., None]
        cmin = total_min[jnp.maximum(ch, 0)]              # (L, 8, 3)
        cmax = total_max[jnp.maximum(ch, 0)]
        smin = jnp.where(is_int, cmin, slot_min[ids])
        smax = jnp.where(is_int, cmax, slot_max[ids])
        slot_min = slot_min.at[ids].set(smin)
        slot_max = slot_max.at[ids].set(smax)
        total_min = total_min.at[ids].set(smin.min(axis=1))
        total_max = total_max.at[ids].set(smax.max(axis=1))

    # write box lanes 0..47: [k*6 +0..2] = min, [+3..5] = max
    boxes = jnp.concatenate([slot_min, slot_max], axis=2)  # (M, 8, 6)
    return nodes8.at[:, :48].set(boxes.reshape(m, 48))


def _areas(mn, mx):
    import jax.numpy as jnp

    ext = jnp.maximum(mx - mn, 0.0)
    return 2.0 * (ext[..., 0] * ext[..., 1] + ext[..., 1] * ext[..., 2]
                  + ext[..., 0] * ext[..., 2])


def refit_quality(nodes8, tri_min, tri_max):
    """SAH-cost proxy of a (refit) BVH8: total slot-box surface area
    divided by the total per-TRIANGLE AABB area. Triangle boxes move
    rigidly with their instance, so the denominator tracks the scene's
    intrinsic scale (invariant under rigid motion and uniform scaling);
    slots whose triangles diverge from the rest-pose grouping balloon the
    numerator. The RATIO of this value after refit_bvh8 to its rest-pose
    value is ~1.0 near rest and grows with tree decay — engine.dynamic
    uses it for the automatic refit->rebuild trigger (the decision the
    reference hard-codes by always rebuilding its TLAS,
    vk_tlas_builder.rs:43-46)."""
    import jax.numpy as jnp

    boxes = nodes8[:, :48].reshape(-1, 8, 6)
    slot_area = jnp.sum(_areas(boxes[..., 0:3], boxes[..., 3:6]))
    tri_area = jnp.sum(_areas(tri_min, tri_max))
    return slot_area / jnp.maximum(tri_area, 1e-20)
