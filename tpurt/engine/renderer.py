"""Frame orchestrator — the public renderer API.

TPU-native re-design of the reference's VulkanTempleRayTracedRenderer
(renderer.rs:139-521). The reference's frame machinery (3 frames in flight,
semaphores/fences, command re-recording, descriptor refresh) exists to keep a
CPU recorder and a GPU executor overlapped; under JAX the same overlap falls
out of async dispatch — `render_frame` returns device futures, and the host
only blocks when it reads the image. What remains of the orchestrator is
real state management:

  * model residency updates per frame (the vk_model.rs LOD state machine),
  * scene-table/BVH rebuild when the resident set changes (the analogue of
    re-recording uploads + building BLASes + recreating the TLAS),
  * camera/lights/GTAO-constants upload (pytree args instead of mapped
    uniform buffers),
  * resize = re-specialize the jitted frame (swapchain recreation analogue).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..passes.gtao import GtaoSettings, gtao_constants
from ..passes.tonemap import LpmParams, lpm_setup
from ..scene.camera import Camera
from ..scene.lights import Lights
from ..scene.model import Model
from ..scene.scene import FlatScene, flatten_scene
from .frame import render_frame


@dataclass
class RendererConfig:
    width: int = 800
    height: int = 800
    gtao: GtaoSettings = field(default_factory=lambda: GtaoSettings(
        slice_count=9, steps_per_slice=3, denoise=1))  # ULTRA + Sharp
    lpm: LpmParams = field(default_factory=LpmParams)
    enable_gtao: bool = True
    enable_tonemap: bool = True
    # "auto": Pallas packet tracer on TPU when the image is 32-aligned
    # (table tier smem -> vmem -> hbm by scene size); "xla" forces the
    # XLA tracer; "smem"/"vmem"/"hbm" force a tier.
    tracer: str = "auto"
    # Multi-chip: a jax.sharding.Mesh to band-decompose frames over
    # (dist/sharding.py); None = single chip.
    mesh: Optional[object] = None
    # Anti-aliasing samples per pixel (R2-jittered; 1 = reference behavior).
    spp: int = 1
    # Trilinear mip sampling with ray-cone LOD. The reference's sampler is
    # trilinear aniso-16 but all its textures allocate a single mip
    # (vk_rt_descriptor_set.rs:76-97); off = reference behavior.
    mipmaps: bool = False
    # Anisotropic filtering: taps along the ray-cone footprint's major
    # axis (requires mipmaps; 1 = isotropic trilinear). The capability
    # analogue of the reference sampler's max_anisotropy=16.
    aniso_taps: int = 1
    # Streaming-texture arena (mip scenes): mip-atlas rows live inside a
    # persistent buddy-managed device array (engine/texture_arena.py), so
    # LOD residency changes upload only joining images' rows and the
    # jitted frame keeps one table shape (no respecialization when models
    # stream in). The TPU counterpart of vk_buffers_suballocator.rs.
    texture_arena: bool = True


class Renderer:
    def __init__(self, config: Optional[RendererConfig] = None):
        self.config = config or RendererConfig()
        c = self.config
        self.camera = Camera(aspect=c.width / c.height)
        self.lights = Lights()
        self.models: list[Model] = []
        self._scene: Optional[FlatScene] = None
        self._scene_device = None
        # dirty-flag input caching (the analogue of the reference's
        # needs_update uniform uploads, vk_camera.rs:104-126): unchanged
        # camera/lights/constants reuse their device-resident arrays
        self._input_cache = {}
        self._obj_device = None      # dynamic-mode object tables (device)
        self._refit_device = None    # BVH8 refit metadata (device)
        self._lpm_ctl, self._lpm_derived = lpm_setup(c.lpm)
        self._frame_idx = 0
        self.rendered_frames = 0
        # dynamic-mode refit->rebuild trigger state
        self._rebuild_until = -1
        self.last_refit_sah_ratio = 1.0

    # -- scene management ---------------------------------------------------

    def add_model(self, file_path, model_matrix_3x4) -> Model:
        """renderer.rs:346-354."""
        model = Model(file_path, model_matrix_3x4)
        self.models.append(model)
        return model

    def lights_mut(self) -> Lights:
        return self.lights

    def camera_mut(self) -> Camera:
        return self.camera

    def models_mut(self):
        return self.models

    def prepare_first_frame(self):
        """Force residency resolution and the initial scene flatten
        (the analogue of prepare_first_frame + the init command buffer)."""
        self._update_models()
        if self._scene is None:
            raise ValueError(
                "no device-resident models — move the camera closer or add a model")

    def _update_models(self):
        changed = False
        for m in self.models:
            changed |= m.update_model_status(self.camera.pos)
            changed |= m.dirty
            m.dirty = False
        if (changed or self._scene is None) and any(
                m.is_device_resident() for m in self.models):
            self._scene = flatten_scene(self.models,
                                        mipmaps=self.config.mipmaps)
            # Upload once: keep the scene resident in HBM so per-frame calls
            # transfer only the small dynamic inputs (camera/lights/consts).
            # This is the analogue of the reference's host->device staging
            # copies happening at model-upload time, not per frame.
            import jax
            import jax.numpy as jnp

            pt = self._scene.as_pytree()
            arena_patch = None
            if self.config.texture_arena:
                arena_patch = self._arena_texture_tables(pt)
            self._scene_device = jax.tree.map(jnp.asarray, pt)
            if arena_patch is not None:
                self._scene_device.update(arena_patch)

    def _arena_texture_tables(self, pt: dict):
        """Route the mip texel table through the streaming-texture arena
        (engine/texture_arena.py): per-unique-image row chunks are
        content-keyed slots in ONE persistent device array, so residency
        changes upload only the delta and the jitted frame's table shape
        stays put. Removes the table from `pt` (so the bulk tree upload
        skips it) and returns the {table, offsets} device patch, or None
        when the scene has no mip tier."""
        import jax.numpy as jnp
        import numpy as np

        table_key = ("tex_mip_quad" if pt.get("tex_mip_quad") is not None
                     else "tex_mip_pair"
                     if pt.get("tex_mip_pair") is not None
                     else "tex_mip_block4"
                     if pt.get("tex_mip_block4") is not None else None)
        if table_key is None:
            if pt.get("tex_quad48") is not None:
                return self._arena_quad48(pt)
            return None
        off_key = table_key + "_offsets"
        atlas = np.asarray(pt[table_key])
        off = np.asarray(pt[off_key])                  # (P, L)
        sizes = np.asarray(pt["tex_mip_sizes"])        # (P, L, 2)
        img = np.asarray(self._scene.tex_img_of_prim)  # (P,)

        if getattr(self, "_tex_arena", None) is None:
            from .texture_arena import TextureRowArena
            self._tex_arena = TextureRowArena(row_width=atlas.shape[1],
                                              dtype=atlas.dtype)

        import hashlib
        n_uniq = int(img.max()) + 1
        chunks = {}
        key_of_slot = [None] * n_uniq
        base_of_slot = np.zeros(n_uniq, np.int64)
        for ui in range(n_uniq):
            rep = int(np.argmax(img == ui))
            if table_key == "tex_mip_quad":
                count = int((sizes[rep, :, 0].astype(np.int64)
                             * sizes[rep, :, 1]).sum())
            elif table_key == "tex_mip_pair":
                count = int((sizes[rep, :, 0].astype(np.int64)
                             * ((sizes[rep, :, 1] + 1) // 2)).sum())
            else:
                count = int((((sizes[rep, :, 0] + 1) // 2).astype(np.int64)
                             * ((sizes[rep, :, 1] + 1) // 2)).sum())
            base = int(off[rep, 0])
            rows = atlas[base:base + count]
            key = hashlib.sha1(rows.tobytes()).hexdigest()
            chunks[key] = (rows, None)
            key_of_slot[ui] = key
            base_of_slot[ui] = base
        arena_base = self._tex_arena.ensure(chunks)

        slot_base = np.asarray([arena_base[k] for k in key_of_slot],
                               np.int64)
        new_off = (off.astype(np.int64)
                   - base_of_slot[img][:, None]
                   + slot_base[img][:, None]).astype(np.int32)
        del pt[table_key]
        return {table_key: self._tex_arena.atlas,
                off_key: jnp.asarray(new_off)}

    def _arena_quad48(self, pt: dict):
        """Non-mip quad tier through the arena: each unique image's quad
        rows are stored at its OWN (h, w) extent inside the persistent
        row array (no Hmax x Wmax slab padding — on mixed-extent scenes
        this alone shrinks the table to content size), addressed by a
        per-image base offset (shade.sample_bilinear_quad base= path,
        bit-identical values). Residency flips upload only joining
        images' rows — the world is never re-uploaded
        (vk_buffers_suballocator.rs behavior; round-4 verdict weak #8)."""
        import hashlib

        import jax.numpy as jnp
        import numpy as np

        quad = np.asarray(pt["tex_quad48"])            # (U, Hmax, Wmax, 64)
        tex_size = np.asarray(self._scene.tex_size)    # (P, 2)
        img = np.asarray(self._scene.tex_img_of_prim)  # (P,)
        n_uniq = quad.shape[0]

        if getattr(self, "_tex_arena", None) is None:
            from .texture_arena import TextureRowArena
            self._tex_arena = TextureRowArena(row_width=quad.shape[-1],
                                              dtype=quad.dtype)

        chunks = {}
        key_of_slot = [None] * n_uniq
        for ui in range(n_uniq):
            rep = int(np.argmax(img == ui))
            h, w = int(tex_size[rep, 0]), int(tex_size[rep, 1])
            rows = np.ascontiguousarray(quad[ui, :h, :w].reshape(h * w, -1))
            key = hashlib.sha1(rows.tobytes()).hexdigest()
            chunks[key] = (rows, None)
            key_of_slot[ui] = key
        arena_base = self._tex_arena.ensure(chunks)
        base = np.asarray([arena_base[k] for k in key_of_slot], np.int32)
        del pt["tex_quad48"]
        return {"tex_quad48": self._tex_arena.atlas,
                "tex_quad48_base": jnp.asarray(base)}

    # -- frame loop -----------------------------------------------------------

    def resize(self, width: int, height: int):
        """renderer.rs:523-564 — here just a re-specialization knob."""
        self.config.width = width
        self.config.height = height
        self.camera.set_aspect(width / height)

    def render(self, block: bool = True):
        """Render one frame; returns the output dict (device arrays).

        With block=False the call returns immediately with device futures —
        JAX async dispatch provides the frames-in-flight overlap that the
        reference builds manually with 3 FrameData slots (renderer.rs:300-318).
        """
        c = self.config
        self._update_models()
        assert self._scene is not None, "call prepare_first_frame() first"

        cam = self._cached("camera", self.camera.uniform())
        consts = gtao_constants(c.width, c.height, self.camera.znear,
                                self.camera.zfar, self.camera.fovy,
                                self.camera.aspect)
        lights = self._cached("lights", self.lights.shader_arrays())
        gtao = self._effective_gtao()
        if c.mesh is not None:
            from ..dist.sharding import render_frame_sharded

            out = render_frame_sharded(
                self._scene_device, cam, lights, consts, self._lpm_derived,
                np.int32(self._frame_idx % 64),
                width=c.width, height=c.height, gtao_settings=gtao,
                mesh=c.mesh, enable_gtao=c.enable_gtao,
                enable_tonemap=c.enable_tonemap,
                pallas_tables=self._pallas_tables(), spp=c.spp,
                aniso_taps=c.aniso_taps)
            self._frame_idx += 1
            self.rendered_frames += 1
            if block:
                out["image"].block_until_ready()
            return out
        out = render_frame(
            self._scene_device, cam, lights,
            consts, self._lpm_derived,
            np.int32(self._frame_idx % 64),
            width=c.width, height=c.height, gtao_settings=gtao,
            enable_gtao=c.enable_gtao, enable_tonemap=c.enable_tonemap,
            pallas_tables=self._pallas_tables(), spp=c.spp,
            aniso_taps=c.aniso_taps)
        self._frame_idx += 1
        self.rendered_frames += 1
        if block:
            out["image"].block_until_ready()
        return out

    def render_dynamic(self, transforms, block: bool = True,
                       refit: bool = True, auto_rebuild: bool = True,
                       check_every: int = 16):
        """Render one frame with per-frame instance transforms (the
        reference's animated-TLAS path, renderer.rs:637-651).

        transforms: (I, 3, 4) array replacing the scene's instance
        transforms this frame. refit=True (default) keeps the rest-pose
        BVH8 topology and refits boxes in-jit (~static-frame cost;
        engine/dynamic.render_frame_dynamic_refit); refit=False rebuilds
        a fresh LBVH in-jit instead (slower, but immune to tree-quality
        decay under extreme motion).

        auto_rebuild: every `check_every`-th refit frame reads the
        refit-quality ratio (bvh.wide.refit_quality vs the rest pose —
        frames stay CORRECT under decay, only trace cost grows) and
        switches the next `check_every` frames to the rebuild path when
        it exceeds dynamic.REBUILD_SAH_RATIO. The reference hard-codes
        the other end of this trade by always rebuilding its TLAS
        (vk_tlas_builder.rs:43-46)."""
        import jax

        from .dynamic import (REBUILD_SAH_RATIO, make_refit_data,
                              render_frame_dynamic,
                              render_frame_dynamic_refit)

        c = self.config
        self._update_models()
        assert self._scene is not None, "call prepare_first_frame() first"
        if self._obj_device is None:
            self._obj_device = jax.device_put(self._scene.as_object_pytree())
            self._refit_device = jax.device_put(make_refit_data(self._scene))

        cam = self._cached("camera", self.camera.uniform())
        consts = gtao_constants(c.width, c.height, self.camera.znear,
                                self.camera.zfar, self.camera.fovy,
                                self.camera.aspect)
        lights = self._cached("lights", self.lights.shader_arrays())
        gtao = self._effective_gtao()
        if refit and auto_rebuild \
                and self._frame_idx < self._rebuild_until:
            refit = False  # decayed tree: rebuild for this window
        if refit:
            out = render_frame_dynamic_refit(
                self._obj_device, self._refit_device, transforms, cam,
                lights, consts, self._lpm_derived,
                np.int32(self._frame_idx % 64), width=c.width,
                height=c.height, gtao_settings=gtao,
                enable_gtao=c.enable_gtao, enable_tonemap=c.enable_tonemap,
                aniso_taps=c.aniso_taps)
            if auto_rebuild and self._frame_idx % check_every == 0:
                ratio = float(out["refit_sah_ratio"])
                self.last_refit_sah_ratio = ratio
                if ratio > REBUILD_SAH_RATIO:
                    # +1: _frame_idx increments after this frame
                    self._rebuild_until = self._frame_idx + 1 + check_every
        else:
            out = render_frame_dynamic(
                self._obj_device, transforms, cam, lights, consts,
                self._lpm_derived, np.int32(self._frame_idx % 64),
                width=c.width, height=c.height, gtao_settings=gtao,
                enable_gtao=c.enable_gtao, enable_tonemap=c.enable_tonemap,
                use_pallas=bool(self._pallas_tables()),
                aniso_taps=c.aniso_taps)
        self._frame_idx += 1
        self.rendered_frames += 1
        if block:
            out["image"].block_until_ready()
        return out

    def _cached(self, key: str, host_pytree: dict):
        """Reuse device arrays for inputs whose host values are unchanged."""
        import jax
        import jax.numpy as jnp

        prev = self._input_cache.get(key)
        if prev is not None:
            prev_host, prev_dev = prev
            if (prev_host.keys() == host_pytree.keys() and all(
                    np.array_equal(prev_host[k], host_pytree[k])
                    for k in host_pytree)):
                return prev_dev
        dev = jax.tree.map(jnp.asarray, host_pytree)
        self._input_cache[key] = (host_pytree, dev)
        return dev

    def _effective_gtao(self):
        """Auto-enable the Pallas GTAO kernels alongside the Pallas packet
        tracer (they carry the frame's dominant cost on TPU); explicit
        GtaoSettings flags are respected either way. Bent normals keep the
        XLA path (packed-u32 blur)."""
        from dataclasses import replace

        g = self.config.gtao
        if self._pallas_tables() and not g.bent_normals:
            return replace(g, pallas_main=True, pallas_denoise=True)
        return g

    # beyond this triangle count the XLA gather-tracer's rebuild-mode
    # programs have been observed to FAULT the tunneled TPU worker
    # (43k tris / 800x800, see CLAUDE.md) — refuse rather than crash
    XLA_TRACER_MAX_TRIS = 20_000

    def _pallas_tables(self) -> str:
        """Pick the packet-tracer table tier: "smem" -> "bvh8" -> "" (XLA)."""
        c = self.config
        if c.tracer == "xla":
            import jax

            if (jax.default_backend() in ("tpu", "axon")
                    and self._scene is not None
                    and self._scene.geom["v0"].shape[0]
                    > self.XLA_TRACER_MAX_TRIS):
                raise ValueError(
                    f"tracer='xla' with "
                    f"{self._scene.geom['v0'].shape[0]} triangles: the XLA "
                    f"fallback tracer faults the TPU worker beyond "
                    f"~{self.XLA_TRACER_MAX_TRIS} tris. Use tracer='auto' "
                    f"(packet tracer) for scenes this size.")
            return ""
        import jax

        from ..kernels.traverse_pallas import table_mode

        if c.tracer in ("smem", "vmem", "hbm", "bvh8"):
            return c.tracer
        if (c.tracer == "pallas"
                or (jax.default_backend() in ("tpu", "axon")
                    and self._scene is not None)):
            mode = table_mode(self._scene.bvh["aabb_min"].shape[0],
                              self._scene.geom["v0"].shape[0])
            # prefer the wide-node kernel whenever the collapse exists
            # (static scenes; the in-jit LBVH of dynamic mode has none)
            if mode == "hbm" and "nodes8" in self._scene.bvh:
                return "bvh8"
            return mode
        return ""

    def render_image(self) -> np.ndarray:
        """Render and read back the 8-bit sRGB frame."""
        return np.asarray(self.render()["image"])

    def render_stream(self, n_frames: int, depth: int = 3):
        """Yield `n_frames` outputs with up to `depth` frames in flight —
        the reference's 3-deep FrameData pipeline (renderer.rs:300-318,
        400-466) as a bounded dispatch queue: frame i+depth-1 is dispatched
        before frame i is consumed, so host dispatch + RPC hide under
        device compute. Measured on the tunneled backend: wall-clock
        34.96 ms/frame at depth 3 vs 35.38 ms device cost at 800²
        (OVERLAP_PROBE.json; depth 1 = 68.98 ms = device + RPC floor).
        Each yielded dict is block_until_ready'd; callers that need a hard
        sync on this backend should read back a value (np.asarray), which
        every consumer of the output does anyway."""
        import jax

        from collections import deque

        q: deque = deque()
        for _ in range(n_frames):
            q.append(self.render(block=False))
            if len(q) >= max(depth, 1):
                yield jax.block_until_ready(q.popleft())
        while q:
            yield jax.block_until_ready(q.popleft())

    def gtao_debug_image(self, mode: str = "normals", out=None):
        """(H, W, 4) float16 GTAO debug image — the reference's debug-build
        R16G16B16A16_SFLOAT target (vk_rendering_layers/vk_xe_gtao.rs:
        314-323) fed by the XeGTAO shader debug defines. mode: "normals" |
        "edges" | "ao" (passes/gtao.gtao_debug_image). Renders a frame when
        `out` (a render() output dict) is not supplied."""
        from ..passes.gtao import gtao_debug_image

        if out is None:
            out = self.render(block=True)
        c = self.config
        consts = gtao_constants(c.width, c.height, self.camera.znear,
                                self.camera.zfar, self.camera.fovy,
                                self.camera.aspect)
        noise = np.int32(max(self._frame_idx - 1, 0) % 64)
        return gtao_debug_image(out["depth"], out["normal"], consts,
                                self._effective_gtao(), noise, mode)

    def stats(self) -> dict:
        """Structured per-frame/scene stats (the observability surface the
        reference lacks beyond its FPS print — SURVEY.md §5)."""
        c = self.config
        n_lights = self.lights.get_lights_count()
        shadow_lights = sum(
            1 for light in self.lights.all_lights() if light.casts_shadows)
        out = dict(
            resolution=(c.width, c.height),
            rays_per_frame=c.width * c.height * (1 + shadow_lights),
            lights=n_lights,
            shadow_casting_lights=shadow_lights,
            rendered_frames=self.rendered_frames,
            models=len(self.models),
            device_resident_models=sum(
                1 for m in self.models if m.is_device_resident()),
            gtao=dict(slices=c.gtao.slice_count, steps=c.gtao.steps_per_slice,
                      denoise=c.gtao.denoise,
                      bent_normals=c.gtao.bent_normals),
        )
        if self._scene is not None:
            out.update(
                tris=int(self._scene.geom["v0"].shape[0]),
                bvh_nodes=int(self._scene.bvh["aabb_min"].shape[0]),
                primitives=self._scene.num_prims,
                tracer_tier=self._pallas_tables() or "xla",
            )
        return out

    @property
    def scene(self) -> Optional[FlatScene]:
        return self._scene

    @property
    def scene_device(self):
        """The HBM-resident scene pytree."""
        return self._scene_device
