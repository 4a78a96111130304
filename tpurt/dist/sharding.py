"""Multi-chip frame rendering: pixel-tile decomposition over a device mesh.

The reference is single-GPU/single-queue (renderer.rs:188) — this layer has
no counterpart to translate, so it is designed TPU-first (SURVEY.md §2.4):

* mesh axis "x" over chips; the image is decomposed into horizontal bands,
* the scene (BVH + geometry + textures) is replicated — the analogue of each
  chip owning a full TLAS; rays never cross chips,
* ray tracing + shading (the dominant cost) run fully sharded inside
  shard_map, one band per chip,
* the quantized G-buffer is then all-gathered over ICI (a few MB at 1080p)
  because GTAO gathers depth samples up to its screen-space radius away —
  cheaper and simpler at this scale than per-pass halo exchanges,
* GTAO + LPM tonemap run on the gathered G-buffer per chip for its own band,
  and the final image is assembled by the out_spec (bands sharded on "x").

A replicated-BVH + sharded-rays strategy is the right first point in the
design space (geometry fits HBM comfortably; rays are embarrassingly
parallel). A sharded-geometry + ray all-to-all mode is the planned follow-up
for scenes exceeding per-chip HBM.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..kernels.traverse import trace_closest
from ..passes.encodings import pack_unorm8, quantize_r11g11b10f, quantize_r16f
from ..passes.gtao import GtaoSettings, ao_visibility_u8, compute_ao_band
from ..passes.rays import T_MAX, T_MIN, camera_rays
from ..passes.shade import shade
from ..passes.tonemap import tonemap_frame


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


@partial(jax.jit, static_argnames=("width", "height", "gtao_settings", "mesh",
                                   "axis"))
def render_frame_sharded(scene: dict, camera: dict, lights: dict,
                         gtao_consts: dict, lpm_derived: dict, noise_index,
                         *, width: int, height: int,
                         gtao_settings: GtaoSettings, mesh: Mesh,
                         axis: str = "x"):
    """Render one frame over a device mesh. height must be divisible by the
    mesh size. Returns the (H, W, 3) u8 image, band-sharded over `axis`."""
    n = mesh.shape[axis]
    assert height % n == 0, f"height {height} not divisible by mesh size {n}"
    band = height // n

    def per_chip(scene, camera, lights, gtao_consts, lpm_derived, noise_index):
        me = jax.lax.axis_index(axis)
        row0 = me * band

        origin, direction = camera_rays(camera, width, height,
                                        row_start=row0, num_rows=band)
        hits = trace_closest(scene["bvh"], scene["geom"], origin, direction,
                             T_MIN, T_MAX, max_leaf=4)
        g = shade(scene, camera, lights, hits, origin, direction)

        color = quantize_r11g11b10f(g["color"]).reshape(band, width, 3)
        depth = quantize_r16f(g["depth"]).reshape(band, width)
        normal = quantize_r11g11b10f(g["normal_enc"]).reshape(band, width, 3)

        # ICI all-gather of the band G-buffer -> full-frame depth/normals,
        # needed because GTAO samples up to its screen-space radius away.
        depth_full = jax.lax.all_gather(depth, axis, axis=0, tiled=True)
        normal_full = jax.lax.all_gather(normal, axis, axis=0, tiled=True)

        # each chip computes GTAO only for its band (+ denoise halo)
        ao_band = ao_visibility_u8(
            compute_ao_band(depth_full, normal_full, gtao_consts,
                            gtao_settings, noise_index, row0, band),
            gtao_settings)

        rgb = tonemap_frame(color, ao_band, lpm_derived)
        return pack_unorm8(rgb)

    # check_vma off: the tracer's while_loop carries start from unvarying
    # constants and become device-varying inside the loop, which the VMA
    # checker (jax >= 0.8) rejects even though the program is correct SPMD.
    fn = shard_map(
        per_chip, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=P(axis, None, None),
        check_vma=False,
    )
    return fn(scene, camera, lights, gtao_consts, lpm_derived,
              jnp.asarray(noise_index))
