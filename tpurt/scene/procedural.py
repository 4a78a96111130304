"""Procedural test geometry.

The reference's showcase scene (Sponza.glb, ~260k triangles) is not shipped
(.MISSING_LARGE_BLOBS); these generators produce comparable triangle counts
so traversal and the SMEM-budget fallback can be exercised at scale.
"""
from __future__ import annotations

import numpy as np

from .model import Model

_CUBE_FACES = [
    # (axis, sign): quads per cube face
    (0, -1), (0, 1), (1, -1), (1, 1), (2, -1), (2, 1),
]


def _cube(center, half, subdiv: int):
    """Axis-aligned cube with `subdiv`x`subdiv` quads per face.
    Returns (positions (N,3), normals (N,3), uvs (N,2), indices (M,3))."""
    verts, norms, uvs, idx = [], [], [], []
    for axis, sign in _CUBE_FACES:
        u_axis = (axis + 1) % 3
        v_axis = (axis + 2) % 3
        base = len(verts)
        lin = np.linspace(-1.0, 1.0, subdiv + 1, dtype=np.float32)
        for i in range(subdiv + 1):
            for j in range(subdiv + 1):
                p = np.zeros(3, np.float32)
                p[axis] = sign
                p[u_axis] = lin[i]
                p[v_axis] = lin[j]
                verts.append(center + half * p)
                n = np.zeros(3, np.float32)
                n[axis] = sign
                norms.append(n)
                uvs.append([i / subdiv, j / subdiv])
        for i in range(subdiv):
            for j in range(subdiv):
                a = base + i * (subdiv + 1) + j
                b = a + 1
                c = a + (subdiv + 1)
                d = c + 1
                if sign > 0:
                    idx += [[a, b, c], [b, d, c]]
                else:
                    idx += [[a, c, b], [b, c, d]]
    return (np.asarray(verts, np.float32), np.asarray(norms, np.float32),
            np.asarray(uvs, np.float32), np.asarray(idx, np.int64))


def box_field(nx: int = 8, nz: int = 8, subdiv: int = 4, seed: int = 0,
              spacing: float = 1.2, half: float = 0.45) -> Model:
    """A grid of subdivided boxes with jittered heights as a single
    multi-primitive model. Triangles = nx*nz*6*subdiv^2*2."""
    rng = np.random.default_rng(seed)
    prims = []
    for i in range(nx):
        for j in range(nz):
            h = 0.5 + rng.uniform(0.0, 1.5)
            center = np.array([(i - (nx - 1) / 2) * spacing, -h * half,
                               (j - (nz - 1) / 2) * spacing], np.float32)
            pos, nrm, uv, idx = _cube(center, half * np.array([1, h, 1],
                                                              np.float32),
                                      subdiv)
            prims.append(dict(positions=pos, normals=nrm, tex_coords=uv,
                              tangents=None, textures={},
                              indices=idx.reshape(-1, 3)))
    eye = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]],
                   np.float32)
    return Model.from_arrays(prims, eye)


def ground_plane(size: float = 20.0, y: float = 0.0) -> Model:
    pos = np.array([[-size, y, -size], [size, y, -size],
                    [size, y, size], [-size, y, size]], np.float32)
    nrm = np.tile(np.array([[0, -1, 0]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    prims = [dict(positions=pos, normals=nrm, tex_coords=uv, tangents=None,
                  textures={}, indices=idx)]
    eye = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]],
                   np.float32)
    return Model.from_arrays(prims, eye)
