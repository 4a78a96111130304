"""Measure BVH8 traversal cost vs leaf size on the TPU.

BVH8_STEP_ABLATE.json showed the per-step cost is the serial scalar
chain — doubling all 16 leaf MT tests costs only +0.2 ms of 5.26 — so
FEWER, FATTER steps should win: collapse the tree with bigger leaf_max
(subtree flattening packs more tris per leaf slot, removing both node
and leaf pops). Leaf codes pack base LEAF_CODE_BASE=128, so leaf_max
can go to 127. Times closest + shadow-shaped any-hit per leaf_max and
checks hit parity vs the default (t must match exactly — same MT math,
same winning intersection; tri may differ only on exact-t ties).
Writes BVH8_LEAF_PROBE.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

REPS = 16
W = H = 800
LEAF_SIZES = (16, 32, 48, 64, 96)


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from tpurt.bvh.wide import collapse8
    from tpurt.kernels.traverse_bvh8 import trace_any_bvh8, trace_closest_bvh8
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays

    r = build_scene(W, H)
    cam = r._cached("camera", r.camera.uniform())
    scene = r.scene_device
    bvh_np = {k: np.asarray(v) for k, v in scene["bvh"].items()
              if k != "nodes8"}

    variants = {}
    for L in LEAF_SIZES:
        nodes8, depth = collapse8(bvh_np, leaf_max=L)
        variants[L] = (jnp.asarray(nodes8), depth, nodes8.shape[0])

    jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
        * jnp.ones((1, 2), jnp.float32)

    def timed(fn):
        @jax.jit
        def run(scene, cam, nodes8):
            def body(acc, jit):
                return acc + fn(scene, cam, nodes8, jit), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jits)
            return acc

        def go(nodes8):
            float(run(scene, cam, nodes8))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(scene, cam, nodes8))
                best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
            return best
        return go

    null_ms = timed(lambda scene, cam, nodes8, jit: jnp.sum(jit))(
        variants[LEAF_SIZES[0]][0])
    out = dict(device=str(jax.devices()[0]), reps=REPS,
               resolution=f"{W}x{H}",
               tris=int(scene["geom"]["v0"].shape[0]),
               null_floor_ms=round(null_ms, 3), cases={})

    def closest_fn(L):
        def fn(scene, cam, nodes8, jit):
            o, d = camera_rays(cam, W, H, jitter=jit)
            h = trace_closest_bvh8(dict(nodes8=nodes8), scene["geom"], o, d,
                                   T_MIN, T_MAX, height=H, width=W,
                                   max_leaf=L)
            return jnp.sum(jnp.where(jnp.isfinite(h["t"]), h["t"], 0.0))
        return fn

    def any_fn(L):
        def fn(scene, cam, nodes8, jit):
            o, d = camera_rays(cam, W, H, jitter=jit)
            h = trace_closest_bvh8(dict(nodes8=nodes8), scene["geom"], o, d,
                                   T_MIN, T_MAX, height=H, width=W,
                                   max_leaf=L)
            L_dir = jnp.asarray([-0.35, -0.85, -0.4], jnp.float32)
            L_dir = L_dir / jnp.linalg.norm(L_dir)
            hit_pos = o + d * h["t"][:, None]
            tmax = jnp.where(h["tri"] >= 0, 100.0, 0.0)
            occ = trace_any_bvh8(dict(nodes8=nodes8), scene["geom"], hit_pos,
                                 jnp.broadcast_to(L_dir, hit_pos.shape),
                                 0.01, tmax, height=H, width=W, max_leaf=L)
            return jnp.sum(occ.astype(jnp.float32))
        return fn

    o, d = camera_rays(cam, W, H)
    ref = None
    for L in LEAF_SIZES:
        nodes8, depth, rows = variants[L]
        case = dict(depth=depth, node_rows=rows)
        case["closest_ms"] = round(
            timed(closest_fn(L))(nodes8) - null_ms, 3)
        case["any_ms"] = round(timed(any_fn(L))(nodes8) - null_ms, 3)
        h = trace_closest_bvh8(dict(nodes8=nodes8), scene["geom"], o, d,
                               T_MIN, T_MAX, height=H, width=W, max_leaf=L)
        h = {k: np.asarray(v) for k, v in h.items()}
        if ref is None:
            ref = h
            case["t_exact"] = True
            case["tri_mismatch_frac"] = 0.0
        else:
            case["t_exact"] = bool((h["t"] == ref["t"]).all())
            case["tri_mismatch_frac"] = float(
                (h["tri"] != ref["tri"]).mean())
        out["cases"][f"leaf{L}"] = case
        print(f"leaf{L}: closest {case['closest_ms']:.2f} ms, "
              f"any(+closest) {case['any_ms']:.2f} ms, depth {depth}, "
              f"t_exact {case['t_exact']}", file=sys.stderr, flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BVH8_LEAF_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
