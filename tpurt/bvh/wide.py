"""BVH8: host-side collapse of the threaded binary SAH BVH into 8-wide
nodes, packed one 128-lane f32 row per node for the Pallas packet kernel.

The reference delegates acceleration structures to the Vulkan driver
(vk_blas_builder.rs:88-170); on TPU we own the layout, and a wide node is
the right shape for the hardware: one 512 B row DMA brings in EIGHT child
AABBs, which the packet kernel tests as dense (8, 128) VPU ops — ~3x fewer
traversal steps (pops/DMAs/loop iterations) than the binary tree for the
same leaf work.

Collapse rule (Ylitie et al.-style greedy): a wide node starts from a
binary node's two children and repeatedly expands the largest-surface-area
internal child until it has 8 children or only leaves remain.

Row layout (f32 lanes; indices stored as exact small floats < 2^24):
  [k*6 .. k*6+5]  child k aabb_min.xyz, aabb_max.xyz   (k = 0..7)
  [48 + k]        wide index of internal child k, -1 if leaf/empty
  [56 + k]        leaf first-triangle index (0 if not leaf)
  [64 + k]        leaf triangle count (0 if internal/empty)
Empty slots carry an inverted box (always misses the slab test).
"""
from __future__ import annotations

import numpy as np

BRANCHING = 8
_EMPTY_MIN = 3.0e37
_EMPTY_MAX = -3.0e37


def collapse8(bvh: dict):
    """Collapse a threaded binary FlatBVH pytree (host numpy arrays) into
    packed BVH8 rows. Returns (nodes8 (M8, 128) f32, max_depth int)."""
    amin = np.asarray(bvh["aabb_min"], np.float32)
    amax = np.asarray(bvh["aabb_max"], np.float32)
    entry = np.asarray(bvh["entry"], np.int64)
    skip = np.asarray(bvh["skip"], np.int64)
    first = np.asarray(bvh["first_tri"], np.int64)
    count = np.asarray(bvh["tri_count"], np.int64)
    is_leaf = count > 0

    d = amax - amin
    area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 0] * d[:, 2]

    def binary_children(b: int):
        l = int(entry[b])
        return l, int(skip[l])

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
        return kids

    # BFS over wide nodes. Each wide node wraps one binary internal node.
    if is_leaf[0]:
        wide_kid_lists = [[0]]          # degenerate: root itself is a leaf
        wide_of = {}
        depth = 1
    else:
        wide_of = {0: 0}
        queue = [(0, 1)]
        wide_kid_lists = []
        depth = 1
        while queue:
            b, dep = queue.pop(0)
            depth = max(depth, dep)
            kids = kids_of(b)
            wide_kid_lists.append(kids)
            for k in kids:
                if not is_leaf[k]:
                    wide_of[k] = len(wide_of)
                    queue.append((k, dep + 1))

    m8 = len(wide_kid_lists)
    nodes8 = np.zeros((m8, 128), np.float32)
    nodes8[:, 0:48:6] = _EMPTY_MIN
    nodes8[:, 1:48:6] = _EMPTY_MIN
    nodes8[:, 2:48:6] = _EMPTY_MIN
    nodes8[:, 3:48:6] = _EMPTY_MAX
    nodes8[:, 4:48:6] = _EMPTY_MAX
    nodes8[:, 5:48:6] = _EMPTY_MAX
    nodes8[:, 48:56] = -1.0
    for w, kids in enumerate(wide_kid_lists):
        for k_slot, b in enumerate(kids):
            base = k_slot * 6
            nodes8[w, base:base + 3] = amin[b]
            nodes8[w, base + 3:base + 6] = amax[b]
            if is_leaf[b]:
                nodes8[w, 56 + k_slot] = float(first[b])
                nodes8[w, 64 + k_slot] = float(count[b])
            else:
                nodes8[w, 48 + k_slot] = float(wide_of[b])
    return nodes8, depth
