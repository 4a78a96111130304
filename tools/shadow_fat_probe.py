"""Shadow-launch decomposition A/B under fat packets (on-chip).

BVH8_FAT_PROBE.json showed the fused 3-light any-multi kernel REGRESSES
at fat=2 (its per-step vector work is already 3 sets wide, so fat's step
cut doesn't cover 6x vector work). But the round-3 finding "fusing the 3
per-light launches is cost-neutral" predates fat: separate launches at
fat=2 get the full union step cut at only 2x vector width per step —
model: separate-fat2 ~ 0.66 * steps * (fixed + 2*vec) vs fused-fat1 ~
union3 * (fixed + 3*vec), potentially -30% on the shadow block.

Cases (production-shaped rays: closest hits -> 3 bench-scene lights):
  fused_fat1    — trace_any_bvh8_multi, the current default
  fused_fat2    — the rejected fat variant (re-measured for the record)
  sep3_fat1     — 3x trace_any_bvh8 (the round-3 cost-neutral baseline)
  sep3_fat2     — 3x trace_any_bvh8 at fat=2 (the candidate)
Occlusion must be bit-identical across all cases. Writes
SHADOW_FAT_PROBE.json and prints the winner.
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
    from tpurt.kernels.traverse_bvh8 import (trace_any_bvh8,
                                             trace_any_bvh8_multi,
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

    def fused(fat):
        def fn(scene, cam, jit):
            hp, dirs, tmaxs = shadow_rays(scene, cam, jit)
            occ = trace_any_bvh8_multi(scene["bvh"], scene["geom"], hp,
                                       dirs, 0.01, tmaxs,
                                       height=H, width=W, fat=fat)
            return jnp.sum(occ.astype(jnp.float32))
        return fn

    def separate(fat):
        def fn(scene, cam, jit):
            hp, dirs, tmaxs = shadow_rays(scene, cam, jit)
            acc = jnp.float32(0)
            for s in range(3):
                occ = trace_any_bvh8(scene["bvh"], scene["geom"], hp,
                                     dirs[s], 0.01, tmaxs[s],
                                     height=H, width=W, fat=fat)
                acc = acc + jnp.sum(occ.astype(jnp.float32))
            return acc
        return fn

    cases = {"fused_fat1": fused(1), "fused_fat2": fused(2),
             "sep3_fat1": separate(1), "sep3_fat2": separate(2)}
    out = dict(device=str(jax.devices()[0]), reps=REPS,
               resolution=f"{W}x{H}",
               tris=int(scene["geom"]["v0"].shape[0]),
               null_floor_ms=round(null_ms, 3),
               tunnel_probe_ms=round(probe0, 1),
               note="every case includes the same fat=2 closest trace; "
                    "differences are the shadow block alone", cases={})
    for key, fn in cases.items():
        ms = timed(fn) - null_ms
        out["cases"][key] = round(ms, 3)
        print(f"{key}: {ms:.2f} ms (incl closest)", file=sys.stderr,
              flush=True)

    # exactness: all four produce identical occlusion
    o, d = camera_rays(cam, W, H)
    h0 = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d, T_MIN, T_MAX,
                            height=H, width=W)
    hp = o + d * h0["t"][:, None]
    hit = h0["tri"] >= 0
    dirs, tmaxs = [], []
    for lp in lights_pos:
        to_l = lp[None, :] - hp
        dist = jnp.linalg.norm(to_l, axis=-1)
        dirs.append(to_l / jnp.maximum(dist, 1e-6)[:, None])
        tmaxs.append(jnp.where(hit, dist - 0.01, 0.0))
    ref = np.asarray(trace_any_bvh8_multi(scene["bvh"], scene["geom"], hp,
                                          dirs, 0.01, tmaxs,
                                          height=H, width=W, fat=1))
    exact = {}
    for fat in (1, 2):
        sep = np.stack([np.asarray(trace_any_bvh8(
            scene["bvh"], scene["geom"], hp, dirs[s], 0.01, tmaxs[s],
            height=H, width=W, fat=fat)) for s in range(3)])
        exact[f"sep3_fat{fat}"] = bool((sep == ref).all())
    exact["fused_fat2"] = bool((np.asarray(trace_any_bvh8_multi(
        scene["bvh"], scene["geom"], hp, dirs, 0.01, tmaxs,
        height=H, width=W, fat=2)) == ref).all())
    out["occlusion_exact_vs_fused_fat1"] = exact
    out["tunnel_probe_after_ms"] = round(health.probe_ms(), 1)
    out["winner"] = min(out["cases"], key=out["cases"].get)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SHADOW_FAT_PROBE.json"),
            "w") as f:
        json.dump(stamped(out), f, indent=1)
    print(json.dumps(out["cases"]))


if __name__ == "__main__":
    main()
