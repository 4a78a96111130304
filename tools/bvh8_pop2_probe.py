"""A/B the two-node-pop BVH8 step on the TPU (round-4 roadmap candidate).

BVH8_STEP_ABLATE.json attributes the step residue to a fixed per-step
scalar chain (slab/reduce ~free, sort +0.345 ms when doubled). Popping TWO
stack entries per iteration batches 16 slab tests and pays the loop
scaffolding once per two pops — at the price of speculative ordering (the
second entry is processed before the first entry's children, so its slab
cull bound can be looser). This probe measures closest + shadow-shaped
any-hit, default vs pop2, and gates exactness: closest t must match
bit-for-bit (tri may differ only on exact-t ties), any-hit occlusion must
be identical. Writes BVH8_POP2_PROBE.json.
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

    def closest_fn(pop2):
        def fn(scene, cam, jit):
            o, d = camera_rays(cam, W, H, jitter=jit)
            h = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                                   T_MIN, T_MAX, height=H, width=W,
                                   pop2=pop2)
            return jnp.sum(jnp.where(jnp.isfinite(h["t"]), h["t"], 0.0))
        return fn

    def any_fn(pop2):
        def fn(scene, cam, jit):
            o, d = camera_rays(cam, W, H, jitter=jit)
            h = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                                   T_MIN, T_MAX, height=H, width=W)
            L_dir = jnp.asarray([-0.35, -0.85, -0.4], jnp.float32)
            L_dir = L_dir / jnp.linalg.norm(L_dir)
            hit_pos = o + d * h["t"][:, None]
            tmax = jnp.where(h["tri"] >= 0, 100.0, 0.0)
            occ = trace_any_bvh8(scene["bvh"], scene["geom"], hit_pos,
                                 jnp.broadcast_to(L_dir, hit_pos.shape),
                                 0.01, tmax, height=H, width=W, pop2=pop2)
            return jnp.sum(occ.astype(jnp.float32))
        return fn

    out = dict(device=str(jax.devices()[0]), reps=REPS,
               resolution=f"{W}x{H}",
               tris=int(scene["geom"]["v0"].shape[0]),
               null_floor_ms=round(null_ms, 3), cases={})
    for pop2 in (False, True):
        key = "pop2" if pop2 else "default"
        c_ms = timed(closest_fn(pop2)) - null_ms
        a_ms = timed(any_fn(pop2)) - null_ms
        out["cases"][key] = dict(closest_ms=round(c_ms, 3),
                                 any_plus_closest_ms=round(a_ms, 3))
        print(f"{key}: closest {c_ms:.2f} ms, any(+closest) {a_ms:.2f} ms",
              file=sys.stderr, flush=True)

    # exactness gates (single unjittered frame)
    o, d = camera_rays(cam, W, H)
    h0 = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d, T_MIN, T_MAX,
                            height=H, width=W)
    h1 = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d, T_MIN, T_MAX,
                            height=H, width=W, pop2=True)
    t0v, t1v = np.asarray(h0["t"]), np.asarray(h1["t"])
    tri0, tri1 = np.asarray(h0["tri"]), np.asarray(h1["tri"])
    out["closest_t_exact"] = bool((t0v == t1v).all())
    out["closest_tri_mismatch_frac"] = float((tri0 != tri1).mean())
    L_dir = jnp.asarray([-0.35, -0.85, -0.4], jnp.float32)
    L_dir = L_dir / jnp.linalg.norm(L_dir)
    hit_pos = o + d * h0["t"][:, None]
    tmax = jnp.where(h0["tri"] >= 0, 100.0, 0.0)
    occ0 = trace_any_bvh8(scene["bvh"], scene["geom"], hit_pos,
                          jnp.broadcast_to(L_dir, hit_pos.shape), 0.01,
                          tmax, height=H, width=W)
    occ1 = trace_any_bvh8(scene["bvh"], scene["geom"], hit_pos,
                          jnp.broadcast_to(L_dir, hit_pos.shape), 0.01,
                          tmax, height=H, width=W, pop2=True)
    out["any_exact"] = bool(
        (np.asarray(occ0) == np.asarray(occ1)).all())
    print(f"t_exact {out['closest_t_exact']}, "
          f"tri_mismatch {out['closest_tri_mismatch_frac']:.2e}, "
          f"any_exact {out['any_exact']}", file=sys.stderr, flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    name = ("BVH8_POP2_PROBE.json" if (W, H) == (800, 800)
            else f"BVH8_POP2_PROBE_{W}x{H}.json")
    with open(os.path.join(root, name), "w") as f:
        json.dump(stamped(out), f, indent=1)
    print(json.dumps(stamped(out)))


if __name__ == "__main__":
    main()
