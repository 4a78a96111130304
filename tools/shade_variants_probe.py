"""A/B the real shade pass (current tpurt.passes.shade) against the
round-2 AoS baseline, end-to-end on the TPU (device-scan, null floor).

History: the round-3 SoA (component-plane) shade rewrite measured
12-35x faster on its isolated elementwise block but regressed the REAL
pass 50.6 vs 40.1 ms cumulative at 800x800 — the (N,C)->(C,N) relayouts
feeding the planes dominate, and lax.optimization_barrier between gather
and transpose changes nothing (50.57 ms), so it is not a gather-fusion
pathology but the relayout itself. The SoA version was reverted; this
probe guards any future shade-layout change against the same trap by
timing the full pass (trace + shade, 3 lights, full shadows). The AoS
baseline is extracted from git history into tpurt/passes/_aos_ref.py
(written and removed by this script).

Writes SHADE_VARIANTS.json.
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPS = 16
W = H = 800
AOS_PATH = os.path.join(ROOT, "tpurt", "passes", "_aos_ref.py")


def main():
    src = subprocess.run(
        ["git", "show", "02d0ef7~1:tpurt/passes/shade.py"],
        cwd=ROOT, capture_output=True, text=True, check=True).stdout
    with open(AOS_PATH, "w") as f:
        f.write(src)
    try:
        run_probe()
    finally:
        os.remove(AOS_PATH)


def run_probe():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import build_scene
    from tpurt.engine.frame import MAX_LEAF
    from tpurt.kernels.traverse_pallas import trace_closest_packets
    from tpurt.passes import _aos_ref, shade as shade_mod
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays

    r = build_scene(W, H)
    cam = r._cached("camera", r.camera.uniform())
    lights = r._cached("lights", r.lights.shader_arrays())
    scene = r.scene_device
    tables = r._pallas_tables()

    jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
        * jnp.ones((1, 2), jnp.float32)

    # the scene pytree must flow through jit ARGUMENTS (baking the texture
    # tables as closure constants trips the remote-compile 50 MB / HTTP 413
    # cliff, CLAUDE.md)
    def _trace(scene, cam, jit):
        o, d = camera_rays(cam, W, H, jitter=jit)
        hits = trace_closest_packets(scene["bvh"], scene["geom"], o, d,
                                     T_MIN, T_MAX, height=H, width=W,
                                     max_leaf=MAX_LEAF, tables=tables)
        return o, d, hits

    def stage_null(scene, cam, lights, jit):
        return jnp.sum(jit)

    def stage_trace(scene, cam, lights, jit):
        _, _, hits = _trace(scene, cam, jit)
        return jnp.sum(jnp.where(jnp.isfinite(hits["t"]), hits["t"], 0.0))

    def shaded(shade_fn):
        def fn(scene, cam, lights, jit):
            o, d, hits = _trace(scene, cam, jit)
            g = shade_fn(scene, cam, lights, hits, o, d,
                         pallas_tables=tables, height=H, width=W,
                         max_leaf=MAX_LEAF)
            return jnp.sum(g["color"]) + jnp.sum(g["depth"]) \
                + jnp.sum(g["normal_enc"])
        return fn

    stages = [
        ("null", stage_null),
        ("trace", stage_trace),
        ("current", shaded(shade_mod.shade)),
        ("aos_r2", shaded(_aos_ref.shade)),
    ]
    out = {}
    for name, fn in stages:
        @jax.jit
        def run(scene_, cam_, lights_, fn=fn):
            def body(acc, jit):
                return acc + fn(scene_, cam_, lights_, jit), None

            acc, _ = lax.scan(body, jnp.float32(0), jits)
            return acc

        float(run(scene, cam, lights))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(scene, cam, lights))
            best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
        out[name] = round(best, 3)
        print(f"{name}: {best:.2f} ms", file=sys.stderr, flush=True)

    report = dict(device=str(jax.devices()[0]), reps=REPS,
                  resolution=f"{W}x{H}", tracer_tier=tables,
                  lights=3, shadows="full", cumulative_ms=out)
    with open(os.path.join(ROOT, "SHADE_VARIANTS.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
