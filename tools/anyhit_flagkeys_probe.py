"""A/B flag_keys in the solo any-hit BVH8 kernel on the bench scene.

Unsorted pushes never read the key VALUES, so the per-child centroid
key chain (6 scalar reads + 5 ops, x8 per node step) can collapse to a
0/_NEG validity flag — the form the fused multi-light kernel already
uses. Bit-identity is structural (same push sequence); this measures
what the dropped scalar ops are worth on the step's serial chain.

One process, stages share the trace+shade program; each variant routes
the 3 per-light shadow launches through trace_any_bvh8. Writes
ANYHIT_FLAGKEYS_PROBE.json."""
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
    from tpurt.bvh.wide import LEAF8_MAX
    from tpurt.engine.frame import MAX_LEAF
    from tpurt.kernels.traverse_bvh8 import trace_any_bvh8
    from tpurt.kernels.traverse_pallas import trace_closest_packets
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays
    from tpurt.passes.shade import shade

    r = build_scene(W, H)
    cam = r._cached("camera", r.camera.uniform())
    lights = r._cached("lights", r.lights.shader_arrays())
    scene = r.scene_device
    tables = r._pallas_tables()
    assert tables == "bvh8"

    noshadow_lights = dict(lights)
    noshadow_lights["casts_shadows"] = jnp.zeros_like(
        lights["casts_shadows"])

    jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
        * jnp.ones((1, 2), jnp.float32)

    def shadow_fn(fk):
        def fn(o, d, tmin, tmax):
            return trace_any_bvh8(scene["bvh"], scene["geom"], o, d, tmin,
                                  tmax, height=H, width=W,
                                  max_leaf=max(MAX_LEAF, LEAF8_MAX),
                                  flag_keys=fk)
        return fn

    def _shaded(scene, cam, lights, jit, fk):
        o, d = camera_rays(cam, W, H, jitter=jit)
        hits = trace_closest_packets(scene["bvh"], scene["geom"], o, d,
                                     T_MIN, T_MAX, height=H, width=W,
                                     max_leaf=MAX_LEAF, tables=tables)
        g = shade(scene, cam, lights, hits, o, d, pallas_tables=tables,
                  height=H, width=W, max_leaf=MAX_LEAF,
                  shadow_trace_fn=shadow_fn(fk))
        return jnp.sum(g["color"]) + jnp.sum(g["depth"]) \
            + jnp.sum(g["normal_enc"])

    @jax.jit
    def equal_check(scene, cam, lights):
        j0 = jnp.zeros((2,), jnp.float32)
        o, d = camera_rays(cam, W, H, jitter=j0)
        hits = trace_closest_packets(scene["bvh"], scene["geom"], o, d,
                                     T_MIN, T_MAX, height=H, width=W,
                                     max_leaf=MAX_LEAF, tables=tables)
        gs = [shade(scene, cam, lights, hits, o, d, pallas_tables=tables,
                    height=H, width=W, max_leaf=MAX_LEAF,
                    shadow_trace_fn=shadow_fn(fk))
              for fk in (False, True)]
        eq = jnp.bool_(True)
        for g in gs[1:]:
            for k in gs[0]:
                eq = eq & jnp.all(gs[0][k] == g[k])
        return eq

    bit_identical = bool(equal_check(scene, cam, lights))
    print(f"device bit-identical: {bit_identical}", file=sys.stderr,
          flush=True)

    stages = [("null", None, lights),
              ("noshadow", False, noshadow_lights),
              ("centroid_keys", False, lights),
              ("flag_keys", True, lights)]
    cum = {}
    for name, fk, lt in stages:
        @jax.jit
        def run(scene, cam, lt, fk=fk, name=name):
            def body(acc, jit):
                if name == "null":
                    return acc + jnp.sum(jit), None
                return acc + _shaded(scene, cam, lt, jit, fk), None

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
                  resolution=f"{W}x{H}", bit_identical=bit_identical,
                  cumulative_ms={k: round(v, 2) for k, v in cum.items()},
                  shadow_ms={k: round(max(cum[k] - base, 0), 2)
                             for k in ("centroid_keys", "flag_keys")},
                  timing="min-of-3 device scans, one process")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ANYHIT_FLAGKEYS_PROBE.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
