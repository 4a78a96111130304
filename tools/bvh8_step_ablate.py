"""Attribute the BVH8 per-step cost to its components on the TPU.

BVH8_STEPS.json measured ~1.28 us/step, compute-bound (grouping/unroll
refuted DMA exposure). This probe DOUBLES one per-step component at a
time via the `debug_double` kernel knob (bit-identical outputs, identical
traversal path) and reads each component's share as (t_doubled - t_base):

  slab    8 child AABB slab tests            (VPU, ~18 ops each)
  reduce  8 per-child any() lane reduces     (vector -> scalar)
  sort    19-comparator Batcher push sort    (scalar selects)
  leaf    max_leaf(=16) unrolled MT tests    (VPU, ~35 ops each)

Timing: device lax.scan of REPS invocations, min-of-3, null floor
(the honest pattern from bench.py). Writes BVH8_STEP_ABLATE.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

REPS = 16
W = H = 800


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from tpurt.kernels.traverse_bvh8 import trace_any_bvh8, trace_closest_bvh8
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays

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
    out = dict(device=str(jax.devices()[0]), reps=REPS,
               resolution=f"{W}x{H}",
               tris=int(scene["geom"]["v0"].shape[0]),
               null_floor_ms=round(null_ms, 3), closest={}, any_hit={},
               parity=None)

    def closest_fn(dd, rm="each"):
        def fn(scene, cam, jit):
            o, d = camera_rays(cam, W, H, jitter=jit)
            h = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                                   T_MIN, T_MAX, height=H, width=W,
                                   debug_double=dd, reduce_mode=rm)
            return jnp.sum(jnp.where(jnp.isfinite(h["t"]), h["t"], 0.0))
        return fn

    def any_fn(dd, rm="each"):
        def fn(scene, cam, jit):
            o, d = camera_rays(cam, W, H, jitter=jit)
            h = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                                   T_MIN, T_MAX, height=H, width=W)
            L = jnp.asarray([-0.35, -0.85, -0.4], jnp.float32)
            L = L / jnp.linalg.norm(L)
            hit_pos = o + d * h["t"][:, None]
            tmax = jnp.where(h["tri"] >= 0, 100.0, 0.0)
            occ = trace_any_bvh8(scene["bvh"], scene["geom"], hit_pos,
                                 jnp.broadcast_to(L, hit_pos.shape),
                                 0.01, tmax, height=H, width=W,
                                 debug_double=dd, reduce_mode=rm)
            return jnp.sum(occ.astype(jnp.float32))
        return fn

    for dd in ("", "slab", "reduce", "sort", "leaf"):
        k = dd or "base"
        out["closest"][k] = round(timed(closest_fn(dd)) - null_ms, 3)
        print(f"closest {k}: {out['closest'][k]:.2f} ms",
              file=sys.stderr, flush=True)
    out["closest"]["pair"] = round(
        timed(closest_fn("", "pair")) - null_ms, 3)
    print(f"closest pair: {out['closest']['pair']:.2f} ms",
          file=sys.stderr, flush=True)
    for dd in ("", "slab", "reduce", "leaf"):
        k = dd or "base"
        out["any_hit"][k] = round(timed(any_fn(dd)) - null_ms, 3)
        print(f"any {k}: {out['any_hit'][k]:.2f} ms",
              file=sys.stderr, flush=True)
    out["any_hit"]["pair"] = round(timed(any_fn("", "pair")) - null_ms, 3)
    print(f"any pair: {out['any_hit']['pair']:.2f} ms",
          file=sys.stderr, flush=True)

    # per-component attribution (doubled - base = the component's share)
    cb = out["closest"]["base"]
    out["closest_share_ms"] = {
        k: round(out["closest"][k] - cb, 3)
        for k in ("slab", "reduce", "sort", "leaf")}
    # any_hit timing includes the closest trace feeding it
    ab = out["any_hit"]["base"]
    out["any_share_ms"] = {
        k: round(out["any_hit"][k] - ab, 3)
        for k in ("slab", "reduce", "leaf")}

    # on-device parity: every variant identical to base (leaf: tri ids
    # exact, t/u/v within FMA-contraction noise — see the kernel note)
    o, d = camera_rays(cam, W, H)
    h1 = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d, T_MIN, T_MAX,
                            height=H, width=W)
    ok = True
    for dd in ("slab", "reduce", "sort", "leaf"):
        hg = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d, T_MIN,
                                T_MAX, height=H, width=W, debug_double=dd)
        for k in ("t", "tri", "u", "v"):
            a, b = np.asarray(h1[k]), np.asarray(hg[k])
            if dd == "leaf" and k != "tri":
                ok = ok and bool(np.allclose(a, b, rtol=1e-5, atol=1e-5))
            else:
                ok = ok and bool((a == b).all())
    out["parity"] = ok
    print(f"parity: {ok}", file=sys.stderr, flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BVH8_STEP_ABLATE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
