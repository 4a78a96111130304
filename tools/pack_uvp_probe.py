"""Does baking the uvp payload columns into tris128 cost the DEFAULT path?

pack_tris_hbm writes geom['uvp'] into cols 10:19 whenever present —
in-graph, per launch. The kernel never reads them with uv_payload=False,
but the pack writes are real per-launch work. A/B: closest trace with
geom as-is vs geom stripped of 'uvp'. Writes PACK_UVP_PROBE.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from _stamp import stamped  # noqa: E402

REPS = 16
W = H = 800


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from tpurt.bvh.wide import LEAF8_MAX
    from tpurt.kernels.traverse_bvh8 import trace_closest_bvh8
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays

    r = build_scene(W, H)
    cam = r._cached("camera", r.camera.uniform())
    scene = r.scene_device
    geom_uvp = scene["geom"]
    geom_bare = {k: v for k, v in geom_uvp.items() if k != "uvp"}
    assert "uvp" in geom_uvp

    jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
        * jnp.ones((1, 2), jnp.float32)

    def trace_sum(bvh, geom, cam, jit):
        o, d = camera_rays(cam, W, H, jitter=jit)
        hits = trace_closest_bvh8(bvh, geom, o, d, T_MIN, T_MAX,
                                  height=H, width=W, max_leaf=LEAF8_MAX)
        return jnp.sum(hits["t"]) + jnp.sum(hits["u"])

    cum = {}
    for name, geom in (("null", None), ("bare", geom_bare),
                       ("with_uvp", geom_uvp)):
        @jax.jit
        def run(bvh, geom, cam, name=name):
            def body(acc, jit):
                if name == "null":
                    return acc + jnp.sum(jit), None
                return acc + trace_sum(bvh, geom, cam, jit), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jits)
            return acc

        float(run(scene["bvh"], geom, cam))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(scene["bvh"], geom, cam))
            best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
        cum[name] = best
        print(f"{name}: {best:.3f} ms", file=sys.stderr, flush=True)

    report = stamped(dict(
        device=str(jax.devices()[0]), reps=REPS, resolution=f"{W}x{H}",
        cumulative_ms={k: round(v, 3) for k, v in cum.items()},
        pack_uvp_cost_ms=round(cum["with_uvp"] - cum["bare"], 3),
    ))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PACK_UVP_PROBE.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
