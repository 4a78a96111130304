"""A/B the light-evaluation schedule in the shade pass (VERDICT r3 #1):

* loop  — per-light Python loop; each light's any-hit shadow launch is
          interleaved with its BRDF math (pallas_call = fusion barrier,
          so the per-light math compiles into separate islands),
* hoist — all SOLO shadow launches issued back-to-back first, then the
          whole 3-light BRDF/radiance math as one fused island,
* batch — hoisted launches + the light math evaluated as ONE stacked
          (K, N, ...) computation (bit-exact accumulation chain).

One process (tunnel drift confounds ~0.5 ms diffs across runs); the same
full trace+shade program per stage, min-of-3 device scans; device-side
bit-equality asserted between variants. Writes LIGHT_EVAL_PROBE.json.
"""
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

    jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
        * jnp.ones((1, 2), jnp.float32)

    def _shaded(scene, cam, lights, jit, ev):
        o, d = camera_rays(cam, W, H, jitter=jit)
        hits = trace_closest_packets(scene["bvh"], scene["geom"], o, d,
                                     T_MIN, T_MAX, height=H, width=W,
                                     max_leaf=MAX_LEAF, tables=tables)
        return shade(scene, cam, lights, hits, o, d, pallas_tables=tables,
                     height=H, width=W, max_leaf=MAX_LEAF, light_eval=ev)

    # device-side bit-equality between variants (one jitter)
    @jax.jit
    def equal_check(scene, cam, lights):
        j0 = jnp.zeros((2,), jnp.float32)
        gs = [_shaded(scene, cam, lights, j0, ev)
              for ev in ("loop", "hoist", "batch")]
        eq = jnp.bool_(True)
        for g in gs[1:]:
            for k in gs[0]:
                eq = eq & jnp.all(gs[0][k] == g[k])
        return eq

    bit_identical = bool(equal_check(scene, cam, lights))
    print(f"device bit-identical: {bit_identical}", file=sys.stderr,
          flush=True)

    cum = {}
    stages = [("null", None), ("loop", "loop"), ("hoist", "hoist"),
              ("batch", "batch")]
    for name, ev in stages:
        @jax.jit
        def run(scene, cam, lights, ev=ev):
            def body(acc, jit):
                if ev is None:
                    return acc + jnp.sum(jit), None
                g = _shaded(scene, cam, lights, jit, ev)
                return acc + jnp.sum(g["color"]) + jnp.sum(g["depth"]) \
                    + jnp.sum(g["normal_enc"]), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jits)
            return acc

        float(run(scene, cam, lights))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(scene, cam, lights))
            best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
        cum[name] = best
        print(f"cum through {name}: {best:.2f} ms", file=sys.stderr,
              flush=True)

    base = cum["null"]
    report = dict(device=str(jax.devices()[0]), reps=REPS,
                  resolution=f"{W}x{H}", bit_identical=bit_identical,
                  cumulative_ms={k: round(v, 2) for k, v in cum.items()},
                  trace_shade_ms={k: round(max(cum[k] - base, 0), 2)
                                  for k in ("loop", "hoist", "batch")},
                  timing="min-of-3 device scans, one process")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "LIGHT_EVAL_PROBE.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
