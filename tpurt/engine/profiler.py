"""Per-pass profiling and frame statistics.

The reference's only instrumentation is the once-per-second FPS print
(frame_timer.rs:16-28). The TPU framework adds structured per-pass timing
(each pass run to completion with block_until_ready between segments),
Mrays/s counters, and optional jax.profiler trace capture.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class FrameStats:
    ms_per_pass: dict = field(default_factory=dict)
    rays_traced: int = 0

    @property
    def ms_total(self) -> float:
        return sum(self.ms_per_pass.values())

    def mrays_per_s(self) -> float:
        total_s = self.ms_total / 1000.0
        return self.rays_traced / total_s / 1e6 if total_s > 0 else 0.0

    def pretty(self) -> str:
        parts = [f"{k}: {v:.3f} ms" for k, v in self.ms_per_pass.items()]
        line = ", ".join(parts)
        return (f"{line} | total {self.ms_total:.3f} ms"
                + (f" | {self.mrays_per_s():.1f} Mrays/s"
                   if self.rays_traced else ""))


class PassTimer:
    """Times device passes by synchronizing on their outputs. Use only for
    profiling — the sync points serialize the pipeline."""

    def __init__(self):
        self.stats = FrameStats()

    @contextlib.contextmanager
    def time_pass(self, name: str, count_rays: int = 0):
        start = time.perf_counter()
        out = _Box()
        yield out
        if out.value is not None:
            jax.block_until_ready(out.value)
        self.stats.ms_per_pass[name] = (time.perf_counter() - start) * 1000.0
        self.stats.rays_traced += count_rays


class _Box:
    value = None


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard format) around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_frame(renderer, repeats: int = 1) -> FrameStats:
    """Timed, synchronized breakdown of the renderer's frame passes."""
    from ..kernels.traverse import trace_closest
    from ..passes.encodings import quantize_r11g11b10f, quantize_r16f
    from ..passes.gtao import compute_ao, gtao_constants
    from ..passes.rays import T_MAX, T_MIN, camera_rays
    from ..passes.shade import shade
    from ..passes.tonemap import tonemap_frame

    c = renderer.config
    cam = renderer.camera.uniform()
    lights = renderer.lights.shader_arrays()
    consts = gtao_constants(c.width, c.height, renderer.camera.znear,
                            renderer.camera.zfar, renderer.camera.fovy,
                            renderer.camera.aspect)
    scene = renderer.scene.as_pytree()
    n_lights = renderer.lights.get_lights_count()

    timer = PassTimer()
    for _ in range(repeats):
        with timer.time_pass("rays") as box:
            o, d = camera_rays(cam, c.width, c.height)
            box.value = (o, d)
        with timer.time_pass("trace", count_rays=c.width * c.height) as box:
            hits = trace_closest(scene["bvh"], scene["geom"], o, d,
                                 T_MIN, T_MAX, max_leaf=4)
            box.value = hits
        with timer.time_pass("shade+shadows",
                             count_rays=c.width * c.height * n_lights) as box:
            g = shade(scene, cam, lights, hits, o, d)
            box.value = g
        with timer.time_pass("gtao") as box:
            color = quantize_r11g11b10f(g["color"]).reshape(c.height, c.width, 3)
            depth = quantize_r16f(g["depth"]).reshape(c.height, c.width)
            normal = quantize_r11g11b10f(g["normal_enc"]).reshape(c.height, c.width, 3)
            ao = compute_ao(depth, normal, consts, c.gtao, 0)
            box.value = ao
        with timer.time_pass("tonemap") as box:
            rgb = tonemap_frame(color, ao, renderer._lpm_derived)
            box.value = rgb
    # average over repeats
    if repeats > 1:
        timer.stats.ms_per_pass = {
            k: v / repeats for k, v in timer.stats.ms_per_pass.items()}
        timer.stats.rays_traced //= repeats
    return timer.stats
