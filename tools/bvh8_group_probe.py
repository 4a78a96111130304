"""Measure BVH8 grouped-traversal (DMA-latency-hiding) on the TPU.

Times trace_closest_bvh8 and a 1-light trace_any_bvh8 at group = 1/2/4/8
on the bench scene (device scan, min-of-3, null floor) and verifies
bit-parity of hits across groups on device. BVH8_STEPS.json measured
~1.28 us/step at group=1 (exposed HBM DMA latency); grouping hides it
behind the other packets' slab/MT math. Writes BVH8_GROUP_PROBE.json.
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
               resolution=f"{W}x{H}", tris=int(scene["geom"]["v0"].shape[0]),
               null_floor_ms=round(null_ms, 3), closest={}, any_hit={},
               parity_vs_group1=None)

    def closest_fn(G, U):
        def fn(scene, cam, jit):
            o, d = camera_rays(cam, W, H, jitter=jit)
            h = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                                   T_MIN, T_MAX, height=H, width=W,
                                   group=G, unroll=U)
            return jnp.sum(jnp.where(jnp.isfinite(h["t"]), h["t"], 0.0))
        return fn

    def any_fn(G, U):
        def fn(scene, cam, jit):
            o, d = camera_rays(cam, W, H, jitter=jit)
            h = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                                   T_MIN, T_MAX, height=H, width=W,
                                   group=G, unroll=U)
            # shadow rays toward the sun from primary hits (real workload
            # shape: same packet tiling, mixed parked lanes)
            L = jnp.asarray([-0.35, -0.85, -0.4], jnp.float32)
            L = L / jnp.linalg.norm(L)
            hit_pos = o + d * h["t"][:, None]
            tmax = jnp.where(h["tri"] >= 0, 100.0, 0.0)
            occ = trace_any_bvh8(scene["bvh"], scene["geom"], hit_pos,
                                 jnp.broadcast_to(L, hit_pos.shape),
                                 0.01, tmax, height=H, width=W,
                                 group=G, unroll=U)
            return jnp.sum(occ.astype(jnp.float32))
        return fn

    for (G, U) in [(1, 1), (1, 2), (1, 4), (2, 2), (1, 8)]:
        k = f"g{G}u{U}"
        out["closest"][k] = round(timed(closest_fn(G, U)) - null_ms, 3)
        print(f"closest {k}: {out['closest'][k]:.2f} ms",
              file=sys.stderr, flush=True)
    for (G, U) in [(1, 1), (1, 2), (1, 4)]:
        k = f"g{G}u{U}"
        out["any_hit"][k] = round(timed(any_fn(G, U)) - null_ms, 3)
        print(f"any {k}: {out['any_hit'][k]:.2f} ms",
              file=sys.stderr, flush=True)

    # on-device parity across groups
    o, d = camera_rays(cam, W, H)
    h1 = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d, T_MIN, T_MAX,
                            height=H, width=W, group=1)
    ok = True
    for (G, U) in [(4, 1), (1, 4), (2, 2)]:
        hg = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d, T_MIN,
                                T_MAX, height=H, width=W, group=G, unroll=U)
        for k in ("t", "tri", "u", "v"):
            ok = ok and bool((np.asarray(h1[k]) == np.asarray(hg[k])).all())
    out["parity_vs_group1"] = ok
    print(f"parity: {ok}", file=sys.stderr, flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BVH8_GROUP_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
