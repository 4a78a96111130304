"""A/B the BVH8 closest-hit uv payload (VERDICT r4 #5) on the real chip.

uv_payload=True makes the kernel emit texu/texv/img/texh/texw with each
hit so the shade pass's texture-quad gather runs independent of the
tri_attr gather (GATHER_TRIGGER_PROBE: independent dtype-mixed gathers
overlap perfectly — 3.1 ms total where the dependent chain pays 9.4).
The payload costs ~9 extra VPU ops per leaf triangle test in the kernel.

Stages (one process, device lax.scan, min-of-3):
  null        scan overhead
  trace_off   closest trace, default kernel
  trace_on    closest trace, payload kernel     (kernel-side cost)
  frame_off   trace + full shade, attr-fed quad index (today)
  frame_on    trace + full shade, payload-fed quad index
Exactness: max |color diff| between the two shaded frames on-device.

Writes UV_PAYLOAD_PROBE.json.
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
W = int(sys.argv[1]) if len(sys.argv) > 1 else 800
H = int(sys.argv[2]) if len(sys.argv) > 2 else 800


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from tpurt.bvh.wide import LEAF8_MAX
    from tpurt.kernels.traverse_bvh8 import trace_closest_bvh8
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays
    from tpurt.passes.shade import shade

    r = build_scene(W, H)
    cam = r._cached("camera", r.camera.uniform())
    lights = r._cached("lights", r.lights.shader_arrays())
    scene = r.scene_device
    tables = r._pallas_tables()
    assert tables == "bvh8", f"bench scene must be on the bvh8 tier: {tables}"

    jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
        * jnp.ones((1, 2), jnp.float32)

    def _trace(scene, cam, jit, uvp):
        o, d = camera_rays(cam, W, H, jitter=jit)
        hits = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                                  T_MIN, T_MAX, height=H, width=W,
                                  max_leaf=LEAF8_MAX, uv_payload=uvp)
        return o, d, hits

    def _trace_sum(scene, cam, jit, uvp):
        _, _, hits = _trace(scene, cam, jit, uvp)
        s = jnp.sum(hits["t"]) + jnp.sum(hits["u"]) + jnp.sum(hits["v"])
        if uvp:
            s = s + jnp.sum(hits["texu"])
        return s

    def _frame_sum(scene, cam, jit, uvp):
        o, d, hits = _trace(scene, cam, jit, uvp)
        g = shade(scene, cam, lights, hits, o, d, pallas_tables="bvh8",
                  height=H, width=W, max_leaf=LEAF8_MAX)
        return jnp.sum(g["color"]) + jnp.sum(g["depth"]) \
            + jnp.sum(g["normal_enc"])

    stages = [
        ("null", lambda s, c, j: jnp.sum(j)),
        ("trace_off", lambda s, c, j: _trace_sum(s, c, j, False)),
        ("trace_on", lambda s, c, j: _trace_sum(s, c, j, True)),
        ("frame_off", lambda s, c, j: _frame_sum(s, c, j, False)),
        ("frame_on", lambda s, c, j: _frame_sum(s, c, j, True)),
    ]
    cum = {}
    for name, fn in stages:
        @jax.jit
        def run(scene, cam, fn=fn):
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
        cum[name] = best
        print(f"cum {name}: {best:.2f} ms", file=sys.stderr, flush=True)

    # exactness: one frame each way, on-device diff
    @jax.jit
    def diff(scene, cam):
        o, d, hits_a = _trace(scene, cam, jits[0] * 0, False)
        _, _, hits_b = _trace(scene, cam, jits[0] * 0, True)
        ga = shade(scene, cam, lights, hits_a, o, d, pallas_tables="bvh8",
                   height=H, width=W, max_leaf=LEAF8_MAX)
        gb = shade(scene, cam, lights, hits_b, o, d, pallas_tables="bvh8",
                   height=H, width=W, max_leaf=LEAF8_MAX)
        return (jnp.max(jnp.abs(ga["color"] - gb["color"])),
                jnp.mean(jnp.abs(ga["color"] - gb["color"])))

    dmax, dmean = (float(x) for x in diff(scene, cam))

    report = stamped(dict(
        device=str(jax.devices()[0]), reps=REPS, resolution=f"{W}x{H}",
        cumulative_ms={k: round(v, 2) for k, v in cum.items()},
        trace_payload_cost_ms=round(cum["trace_on"] - cum["trace_off"], 2),
        frame_delta_ms=round(cum["frame_on"] - cum["frame_off"], 2),
        color_diff=dict(max=dmax, mean=dmean),
        verdict=("LAND uv_payload" if cum["frame_on"] < cum["frame_off"]
                 else "reject: no frame win"),
        timing="min-of-3 device scans, one process",
    ))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "UV_PAYLOAD_PROBE.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
