"""Refit-quality decay curve (VERDICT r2 #9): trace cost + SAH ratio vs
instance displacement from the rest pose, on the bench scene's refit path.
Writes DYNAMIC_DECAY.json.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_scene
from tpurt.engine.dynamic import (REBUILD_SAH_RATIO, make_refit_data,
                                  render_frame_dynamic_refit)
from tpurt.passes.gtao import gtao_constants
from tpurt.utils.health import guarded_measure, probe_ms


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"probe: {probe_ms():.1f} ms")
    r = build_scene()
    c = r.config
    obj = jax.device_put(r.scene.as_object_pytree())
    refit = jax.device_put(make_refit_data(r.scene))
    cam = r._cached("camera", r.camera.uniform())
    lights = r._cached("lights", r.lights.shader_arrays())
    consts = gtao_constants(c.width, c.height, r.camera.znear, r.camera.zfar,
                            r.camera.fovy, r.camera.aspect)
    rest = np.asarray(r.scene.transforms, np.float32)
    n_inst = rest.shape[0]
    # scene radius from the rest-pose triangle extents
    v0 = np.asarray(r.scene.geom["v0"])
    radius = float(np.linalg.norm(v0.max(0) - v0.min(0)) / 2.0)
    rng = np.random.default_rng(7)
    dirs = rng.normal(size=(n_inst, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    gtao = r._effective_gtao()

    from functools import partial

    @partial(jax.jit, static_argnames=("frames",))
    def run(obj, refit, tf, cam, lights, consts, lpm, *, frames):
        def body(acc, i):
            out = render_frame_dynamic_refit(
                obj, refit, tf, cam, lights, consts, lpm, i % 64,
                width=c.width, height=c.height, gtao_settings=gtao)
            return (acc + jnp.sum(out["image"], dtype=jnp.uint32),
                    out["refit_sah_ratio"])

        acc, ratios = jax.lax.scan(body, jnp.uint32(0),
                                   jnp.arange(frames, dtype=jnp.int32))
        return acc, ratios[-1]

    def burst(transforms, frames):
        # ONE jit cache entry per frame count; transforms ride as args
        args = (obj, refit, jnp.asarray(transforms), cam, lights, consts,
                r._lpm_derived)
        t0 = time.perf_counter()
        acc, ratio = run(*args, frames=frames)
        chk = int(acc)   # force the readback — timing to dispatch only is
        el = (time.perf_counter() - t0) * 1000.0 / frames  # the r1 trap
        # chk == 0 is legitimate at extreme displacement: every instance
        # has left the view and the frame is black (the readback still
        # synchronized); flag it instead of asserting
        return el, float(ratio), chk > 0

    curve = []
    for disp in (0.0, 0.25, 0.5, 1.0, 2.0, 4.0):
        t = rest.copy()
        t[:, :, 3] += (dirs * disp * radius).astype(np.float32)
        burst(t, 4)
        burst(t, 12)

        def paired(t=t):
            t4, _, _ = burst(t, 4)
            t12, ratio, _ = burst(t, 12)
            return (t12 * 12 - t4 * 4) / 8

        res = guarded_measure(paired, samples=2, budget_s=240.0, log=log)
        _, ratio, visible = burst(t, 4)
        curve.append(dict(displacement_x_radius=disp,
                          ms_per_frame=round(res.value, 3),
                          refit_sah_ratio=round(ratio, 3),
                          frame_nonblack=bool(visible),
                          would_rebuild=bool(ratio > REBUILD_SAH_RATIO)))
        log(f"disp {disp}x: {res.value:.2f} ms, sah ratio {ratio:.2f}"
            + ("" if visible else " (frame black - scene out of view)"))

    report = dict(
        scene_radius=round(radius, 3), instances=n_inst,
        tris=int(v0.shape[0]), threshold=REBUILD_SAH_RATIO,
        curve=curve, device=str(jax.devices()[0]),
        note="render_frame_dynamic_refit paired device-scans; "
             "refit_sah_ratio = bvh.wide.refit_quality vs rest pose "
             "(the Renderer.render_dynamic auto-rebuild trigger signal)")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "DYNAMIC_DECAY.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
