"""Decompose the shade pass cost on the TPU (device-scan timing).

Stages (cumulative, each includes the closest-hit trace):
  trace      closest-hit packet trace only
  gbuf0      + shade with ZERO lights (attr gather, TBN, texture fetch)
  noshadow   + 3 lights with casts_shadows=0 (BRDF/radiance math; the 3
               shadow kernels still launch but every lane parks at tmax=0)
  full       + real shadow traversal (casts_shadows as configured)

Diffs attribute the ~30 ms of non-shadow shade cost at 800x800 between
XLA gathers/texturing, per-light math, and actual occlusion traversal.
Writes SHADE_BREAKDOWN.json. Reference hot loop: raytrace.rgen.glsl:106-186.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _stamp import stamped  # noqa: E402
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPS = 16
# optional argv: WIDTH HEIGHT (default 800x800)
W = int(sys.argv[1]) if len(sys.argv) > 1 else 800
H = int(sys.argv[2]) if len(sys.argv) > 2 else 800


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_scene
    from tpurt.engine.frame import MAX_LEAF
    from tpurt.kernels.traverse_pallas import trace_closest_packets
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays
    from tpurt.passes.shade import shade

    r = build_scene(W, H)
    cam = r._cached("camera", r.camera.uniform())
    lights = r._cached("lights", r.lights.shader_arrays())
    scene = r.scene_device
    tables = r._pallas_tables()

    # NOTE round 3: a ZERO-length light array makes shade ~10 ms SLOWER
    # than 3 lights (degenerate shapes defeat XLA fusion) — use a 1-light
    # stage instead and solve for the per-light cost by difference
    onelight = {k: v[:1] for k, v in lights.items()}
    onelight["casts_shadows"] = jnp.zeros_like(onelight["casts_shadows"])
    noshadow_lights = dict(lights)
    noshadow_lights["casts_shadows"] = jnp.zeros_like(
        lights["casts_shadows"])

    jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
        * jnp.ones((1, 2), jnp.float32)

    def _trace(scene, cam, jit):
        o, d = camera_rays(cam, W, H, jitter=jit)
        hits = trace_closest_packets(scene["bvh"], scene["geom"], o, d,
                                     T_MIN, T_MAX, height=H, width=W,
                                     max_leaf=MAX_LEAF, tables=tables)
        return o, d, hits

    def stage_trace(scene, cam, lights, jit):
        _, _, hits = _trace(scene, cam, jit)
        return jnp.sum(jnp.where(jnp.isfinite(hits["t"]), hits["t"], 0.0))

    def _shaded(scene, cam, lights, jit):
        o, d, hits = _trace(scene, cam, jit)
        g = shade(scene, cam, lights, hits, o, d, pallas_tables=tables,
                  height=H, width=W, max_leaf=MAX_LEAF)
        return jnp.sum(g["color"]) + jnp.sum(g["depth"]) \
            + jnp.sum(g["normal_enc"])

    def stage_null(scene, cam, lights, jit):
        # RPC-floor / scan baseline (see CLAUDE.md round-3 note)
        return jnp.sum(jit)

    stages = [
        ("null", stage_null, lights),
        ("trace", stage_trace, lights),
        ("onelight", _shaded, onelight),
        ("noshadow", _shaded, noshadow_lights),
        ("full", _shaded, lights),
    ]
    cum = {}
    for name, fn, lt in stages:
        @jax.jit
        def run(scene, cam, lt, fn=fn):
            def body(acc, jit):
                return acc + fn(scene, cam, lt, jit), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jits)
            return acc

        float(run(scene, cam, lt))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(scene, cam, lt))
            best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
        cum[name] = best
        print(f"cum through {name}: {cum[name]:.2f} ms", file=sys.stderr,
              flush=True)

    names = [n for n, _, _ in stages]
    diff = {}
    prev = cum["null"]
    for b in names[1:]:
        cur = max(cum[b], prev)   # monotonic clamp
        diff[b] = cur - prev
        prev = cur
    report = dict(device=str(jax.devices()[0]), reps=REPS,
                  resolution=f"{W}x{H}", tracer_tier=tables,
                  tris=int(scene["geom"]["v0"].shape[0]),
                  cumulative_ms={k: round(v, 2) for k, v in cum.items()},
                  attributed_ms={
                      "closest_trace": round(diff["trace"], 2),
                      "gathers_tbn_textures_plus_1_light":
                          round(diff["onelight"], 2),
                      "per_extra_light_math": round(diff["noshadow"] / 2, 2),
                      "shadow_traversal": round(diff["full"], 2),
                  },
                  timing="min-of-3 device scans, null-stage floor "
                         "subtraction, monotonic clamp")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "SHADE_BREAKDOWN.json" if (W, H) == (800, 800)
        else f"SHADE_BREAKDOWN_{W}x{H}.json")
    with open(path, "w") as f:
        json.dump(stamped(report), f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
