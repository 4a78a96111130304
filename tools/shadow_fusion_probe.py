"""A/B the fused multi-light shadow kernel vs 3 solo any-hit launches,
in ONE process (tunnel drift between runs otherwise confounds ~0.5 ms
differences). Stages share the full trace+shade program; only the shadow
path differs, so the diff vs the noshadow stage attributes the shadow
traversal cost per variant. Writes SHADOW_FUSION_PROBE.json."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPS = 16
W = int(sys.argv[1]) if len(sys.argv) > 1 else 800
H = int(sys.argv[2]) if len(sys.argv) > 2 else 800


def main():
    import jax
    import jax.numpy as jnp

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

    noshadow_lights = dict(lights)
    noshadow_lights["casts_shadows"] = jnp.zeros_like(
        lights["casts_shadows"])

    jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
        * jnp.ones((1, 2), jnp.float32)

    def _shaded(scene, cam, lights, jit, fuse):
        o, d = camera_rays(cam, W, H, jitter=jit)
        hits = trace_closest_packets(scene["bvh"], scene["geom"], o, d,
                                     T_MIN, T_MAX, height=H, width=W,
                                     max_leaf=MAX_LEAF, tables=tables)
        g = shade(scene, cam, lights, hits, o, d, pallas_tables=tables,
                  height=H, width=W, max_leaf=MAX_LEAF, fuse_shadows=fuse)
        return jnp.sum(g["color"]) + jnp.sum(g["depth"]) \
            + jnp.sum(g["normal_enc"])

    stages = [
        ("null", lambda s, c, lt, j: jnp.sum(j), lights),
        ("noshadow", lambda s, c, lt, j: _shaded(s, c, lt, j, True),
         noshadow_lights),
        ("solo", lambda s, c, lt, j: _shaded(s, c, lt, j, False), lights),
        ("fused", lambda s, c, lt, j: _shaded(s, c, lt, j, True), lights),
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
        print(f"cum through {name}: {best:.2f} ms", file=sys.stderr,
              flush=True)

    base = max(cum["noshadow"], cum["null"])
    report = dict(device=str(jax.devices()[0]), reps=REPS,
                  resolution=f"{W}x{H}",
                  cumulative_ms={k: round(v, 2) for k, v in cum.items()},
                  shadow_ms=dict(
                      solo_3_launches=round(max(cum["solo"] - base, 0), 2),
                      fused_1_launch=round(max(cum["fused"] - base, 0), 2)),
                  timing="min-of-3 device scans, one process")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SHADOW_FUSION_PROBE.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
