"""A/B predicated pushes (when_push) on the TPU.

The default step runs a 16-output lax.cond (node_children/no_children)
followed by an UNCONDITIONAL Batcher-sort + 8-slot push that executes its
full scalar chain on _NEG keys for every leaf pop (~46% of steps,
BVH8_FAT_PROBE.json). when_push computes children + sort + pushes under
@pl.when(is_node) with the stack pointer in an SMEM cell: leaf pops skip
the dead sort/push work entirely and no keys/codes cross a cond boundary.
Bit-identical traversal (dead pushes never advanced sp; their stack
writes were overwritten before any pop could read them) — CPU-verified,
gated again here on-chip.

Measures closest (fat=2 production) and the fused 3-light shadow tour
(fat=1 production), when_push off/on. Writes WHEN_PUSH_PROBE.json and
prints the verdict for WHEN_PUSH_DEFAULT.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

from _stamp import stamped  # noqa: E402

REPS = 16
W = int(sys.argv[1]) if len(sys.argv) > 1 else 800
H = int(sys.argv[2]) if len(sys.argv) > 2 else W


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from tpurt.kernels.traverse_bvh8 import (trace_any_bvh8_multi,
                                             trace_closest_bvh8)
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays
    from tpurt.utils import health

    probe0 = health.probe_ms()
    print(f"tunnel probe {probe0:.1f} ms", file=sys.stderr, flush=True)

    r = build_scene(W, H)
    cam = r._cached("camera", r.camera.uniform())
    scene = r.scene_device

    jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
        * jnp.ones((1, 2), jnp.float32)

    def timed(fn):
        @jax.jit
        def run(scene, cam):
            def body(acc, jit):
                return acc + fn(scene, cam, jit), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jits)
            return acc

        float(run(scene, cam))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(scene, cam))
            best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
        return best

    null_ms = timed(lambda scene, cam, jit: jnp.sum(jit))

    lights_pos = [jnp.asarray(p, jnp.float32) for p in
                  ([4.0, -6.0, -1.5], [-3.5, -5.0, 2.5], [0.0, -7.5, 0.0])]

    def shadow_rays(scene, cam, jit):
        o, d = camera_rays(cam, W, H, jitter=jit)
        h = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                               T_MIN, T_MAX, height=H, width=W)
        hit_pos = o + d * h["t"][:, None]
        hit = h["tri"] >= 0
        dirs, tmaxs = [], []
        for lp in lights_pos:
            to_l = lp[None, :] - hit_pos
            dist = jnp.linalg.norm(to_l, axis=-1)
            dirs.append(to_l / jnp.maximum(dist, 1e-6)[:, None])
            tmaxs.append(jnp.where(hit, dist - 0.01, 0.0))
        return hit_pos, dirs, tmaxs

    def closest_fn(wp):
        def fn(scene, cam, jit):
            o, d = camera_rays(cam, W, H, jitter=jit)
            h = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                                   T_MIN, T_MAX, height=H, width=W,
                                   when_push=wp)
            return jnp.sum(jnp.where(jnp.isfinite(h["t"]), h["t"], 0.0))
        return fn

    def shadow_fn(wp):
        def fn(scene, cam, jit):
            hp, dirs, tmaxs = shadow_rays(scene, cam, jit)
            occ = trace_any_bvh8_multi(scene["bvh"], scene["geom"], hp,
                                       dirs, 0.01, tmaxs,
                                       height=H, width=W, when_push=wp)
            return jnp.sum(occ.astype(jnp.float32))
        return fn

    out = dict(device=str(jax.devices()[0]), reps=REPS,
               resolution=f"{W}x{H}",
               tris=int(scene["geom"]["v0"].shape[0]),
               null_floor_ms=round(null_ms, 3),
               tunnel_probe_ms=round(probe0, 1), cases={})
    for wp in (False, True):
        key = "when_push" if wp else "default"
        c_ms = timed(closest_fn(wp)) - null_ms
        s_ms = timed(shadow_fn(wp)) - null_ms
        out["cases"][key] = dict(closest_ms=round(c_ms, 3),
                                 shadow3_plus_closest_ms=round(s_ms, 3))
        print(f"{key}: closest {c_ms:.2f} ms, shadow3(+closest) "
              f"{s_ms:.2f} ms", file=sys.stderr, flush=True)

    # exactness on-chip
    o, d = camera_rays(cam, W, H)
    h0 = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d, T_MIN, T_MAX,
                            height=H, width=W)
    h1 = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d, T_MIN, T_MAX,
                            height=H, width=W, when_push=True)
    hp = o + d * h0["t"][:, None]
    hit = h0["tri"] >= 0
    dirs, tmaxs = [], []
    for lp in lights_pos:
        to_l = lp[None, :] - hp
        dist = jnp.linalg.norm(to_l, axis=-1)
        dirs.append(to_l / jnp.maximum(dist, 1e-6)[:, None])
        tmaxs.append(jnp.where(hit, dist - 0.01, 0.0))
    occ0 = np.asarray(trace_any_bvh8_multi(
        scene["bvh"], scene["geom"], hp, dirs, 0.01, tmaxs,
        height=H, width=W))
    occ1 = np.asarray(trace_any_bvh8_multi(
        scene["bvh"], scene["geom"], hp, dirs, 0.01, tmaxs,
        height=H, width=W, when_push=True))
    out["exactness"] = dict(
        closest_t_exact=bool(
            (np.asarray(h0["t"]) == np.asarray(h1["t"])).all()),
        closest_tri_mismatch_frac=float(
            (np.asarray(h0["tri"]) != np.asarray(h1["tri"])).mean()),
        any_multi_exact=bool((occ0 == occ1).all()))
    out["tunnel_probe_after_ms"] = round(health.probe_ms(), 1)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "WHEN_PUSH_PROBE.json"), "w") as f:
        json.dump(stamped(out), f, indent=1)
    print(json.dumps(out["cases"]))


if __name__ == "__main__":
    main()
