"""A/B fat packets (round-5 candidate) on the TPU.

PERF_ROOFLINE.md block A: the BVH8 step is ~80% fixed scalar chain
(pop/decode/cond/loop scaffolding) and the (8,128) slab/MT vector work is
~free (BVH8_STEP_ABLATE.json). fat=F merges F adjacent 32x32 tiles into
one (8F,128) packet behind ONE stack: total pops shrink toward the union
of the tiles' node sets while the fixed chain is paid once per fat
packet. Unlike the rejected group/interleave knob (BVH8_GROUP_PROBE:
packets stayed separate, same total steps) and the rejected two-node pop
(BVH8_POP2_PROBE: amortized the chain but doubled speculative work),
fat attacks the STEP COUNT itself.

Measures, per fat in (1,2,4): closest trace, fused 3-light any-multi
(the production shadow launch), and the count_steps totals that explain
the ratio. Gates bit-exactness vs fat=1. Writes BVH8_FAT_PROBE.json and
prints the suggested FAT_DEFAULT/FAT_ANY_DEFAULT.
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
FATS = (1, 2, 4)


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

    # production-shaped shadow rays: 3 lights at the bench-scene light
    # positions, rays from closest-hit points (same shape as shade.py's
    # fused launch)
    lights_pos = [jnp.asarray(p, jnp.float32) for p in
                  ([4.0, -6.0, -1.5], [-3.5, -5.0, 2.5], [0.0, -7.5, 0.0])]

    def shadow_dirs(scene, cam, jit):
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

    def closest_fn(fat):
        def fn(scene, cam, jit):
            o, d = camera_rays(cam, W, H, jitter=jit)
            h = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                                   T_MIN, T_MAX, height=H, width=W, fat=fat)
            return jnp.sum(jnp.where(jnp.isfinite(h["t"]), h["t"], 0.0))
        return fn

    def any_multi_fn(fat):
        def fn(scene, cam, jit):
            hit_pos, dirs, tmaxs = shadow_dirs(scene, cam, jit)
            occ = trace_any_bvh8_multi(scene["bvh"], scene["geom"], hit_pos,
                                       dirs, 0.01, tmaxs,
                                       height=H, width=W, fat=fat)
            return jnp.sum(occ.astype(jnp.float32))
        return fn

    out = dict(device=str(jax.devices()[0]), reps=REPS,
               resolution=f"{W}x{H}",
               tris=int(scene["geom"]["v0"].shape[0]),
               null_floor_ms=round(null_ms, 3),
               tunnel_probe_ms=round(probe0, 1), cases={})

    for fat in FATS:
        c_ms = timed(closest_fn(fat)) - null_ms
        a_ms = timed(any_multi_fn(fat)) - null_ms
        out["cases"][f"fat{fat}"] = dict(
            closest_ms=round(c_ms, 3),
            shadow3_plus_closest_ms=round(a_ms, 3))
        print(f"fat={fat}: closest {c_ms:.2f} ms, "
              f"shadow3(+closest) {a_ms:.2f} ms",
              file=sys.stderr, flush=True)

    # step-count totals: why the ratio is what it is
    o, d = camera_rays(cam, W, H)
    steps = {}
    for fat in FATS:
        h = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                               T_MIN, T_MAX, height=H, width=W,
                               count_steps=True, fat=fat)
        per_tile_n = np.asarray(h["u"]).reshape(
            H // 32, 32, W // 32, 32)[:, 0, :, 0]
        per_tile_l = np.asarray(h["v"]).reshape(
            H // 32, 32, W // 32, 32)[:, 0, :, 0]
        # fat-packet counters are replicated across the merged tiles
        total_n = float(per_tile_n.ravel()[::1].sum() / fat)
        total_l = float(per_tile_l.ravel()[::1].sum() / fat)
        steps[f"fat{fat}"] = dict(node_pops=round(total_n),
                                  leaf_pops=round(total_l))
        print(f"fat={fat}: {total_n:.0f} node + {total_l:.0f} leaf pops",
              file=sys.stderr, flush=True)
    out["total_steps"] = steps

    # exactness gates vs fat=1 (single unjittered frame)
    h0 = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d, T_MIN, T_MAX,
                            height=H, width=W)
    hp0 = o + d * h0["t"][:, None]
    dirs0, tmaxs0 = [], []
    for lp in lights_pos:
        to_l = lp[None, :] - hp0
        dist = jnp.linalg.norm(to_l, axis=-1)
        dirs0.append(to_l / jnp.maximum(dist, 1e-6)[:, None])
        tmaxs0.append(jnp.where(h0["tri"] >= 0, dist - 0.01, 0.0))
    occ0 = np.asarray(trace_any_bvh8_multi(
        scene["bvh"], scene["geom"], hp0, dirs0, 0.01, tmaxs0,
        height=H, width=W))
    gates = {}
    for fat in FATS[1:]:
        h1 = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                                T_MIN, T_MAX, height=H, width=W, fat=fat)
        occ1 = np.asarray(trace_any_bvh8_multi(
            scene["bvh"], scene["geom"], hp0, dirs0, 0.01, tmaxs0,
            height=H, width=W, fat=fat))
        gates[f"fat{fat}"] = dict(
            closest_t_exact=bool(
                (np.asarray(h0["t"]) == np.asarray(h1["t"])).all()),
            closest_tri_mismatch_frac=float(
                (np.asarray(h0["tri"]) != np.asarray(h1["tri"])).mean()),
            any_multi_exact=bool((occ0 == occ1).all()))
    out["exactness"] = gates

    probe1 = health.probe_ms()
    out["tunnel_probe_after_ms"] = round(probe1, 1)

    best_c = min(FATS, key=lambda f: out["cases"][f"fat{f}"]["closest_ms"])
    best_a = min(FATS, key=lambda f:
                 out["cases"][f"fat{f}"]["shadow3_plus_closest_ms"])
    out["suggest"] = dict(FAT_DEFAULT=best_c, FAT_ANY_DEFAULT=best_a)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BVH8_FAT_PROBE.json"), "w") as f:
        json.dump(stamped(out), f, indent=1)
    print(json.dumps(out["cases"], indent=1))


if __name__ == "__main__":
    main()
