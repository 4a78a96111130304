"""Honest per-pass frame-cost attribution on the TPU.

Cumulative-prefix timing: stage k runs passes 1..k of the frame pipeline
(trace -> shade -> GTAO -> tonemap) inside a device-side lax.scan of REPS
iterations ending in a scalar checksum readback (the only reliable sync on
the tunneled backend — see CLAUDE.md). Per-pass cost = diff of consecutive
stage times. The camera jitter varies per iteration so XLA cannot hoist
loop-invariant work out of the scan.

Writes FRAME_BREAKDOWN.json. Covers the reference's per-frame command
stream (renderer.rs:617-693) at the bench workload (main.rs:18, 800x800).
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


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from tpurt.engine.frame import MAX_LEAF
    from tpurt.passes.encodings import pack_unorm8, quantize_r11g11b10f, \
        quantize_r16f
    from tpurt.passes.gtao import (ao_visibility_u8, compute_ao,
                                   gtao_constants)
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays
    from tpurt.passes.shade import shade
    from tpurt.passes.tonemap import tonemap_frame

    report = dict(device=str(jax.devices()[0]), reps=REPS)
    for (w, h) in [(800, 800), (1920, 1080)]:
        print(f"breakdown: building {w}x{h} scene...", file=sys.stderr,
              flush=True)
        r = build_scene(w, h)
        c = r.config
        cam = r._cached("camera", r.camera.uniform())
        lights = r._cached("lights", r.lights.shader_arrays())
        consts = gtao_constants(w, h, r.camera.znear, r.camera.zfar,
                                r.camera.fovy, r.camera.aspect)
        scene = r.scene_device
        tables = r._pallas_tables()
        gtao = r._effective_gtao()
        lpm = r._lpm_derived

        # per-iteration sub-pixel jitter: forces XLA to re-run every pass
        # each scan step (otherwise trace/shade are loop-invariant)
        jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
            * jnp.ones((1, 2), jnp.float32)

        def stage_trace(scene, cam, lights, consts, lpm, jit, ni):
            from tpurt.kernels.traverse_pallas import trace_closest_packets

            o, d = camera_rays(cam, w, h, jitter=jit)
            hits = trace_closest_packets(scene["bvh"], scene["geom"], o, d,
                                         T_MIN, T_MAX, height=h, width=w,
                                         max_leaf=MAX_LEAF, tables=tables)
            return jnp.sum(jnp.where(jnp.isfinite(hits["t"]), hits["t"], 0.0))

        def _gbuf(scene, cam, lights, jit):
            from tpurt.kernels.traverse_pallas import trace_closest_packets

            o, d = camera_rays(cam, w, h, jitter=jit)
            hits = trace_closest_packets(scene["bvh"], scene["geom"], o, d,
                                         T_MIN, T_MAX, height=h, width=w,
                                         max_leaf=MAX_LEAF, tables=tables)
            return shade(scene, cam, lights, hits, o, d,
                         pallas_tables=tables, height=h, width=w,
                         max_leaf=MAX_LEAF)

        def stage_shade(scene, cam, lights, consts, lpm, jit, ni):
            return jnp.sum(_gbuf(scene, cam, lights, jit)["color"])

        def _ao(scene, cam, lights, consts, jit, ni):
            g = _gbuf(scene, cam, lights, jit)
            depth = quantize_r16f(g["depth"]).reshape(h, w)
            normal = quantize_r11g11b10f(g["normal_enc"]).reshape(h, w, 3)
            ao_term = compute_ao(depth, normal, consts, gtao, ni)
            return g, ao_visibility_u8(ao_term, gtao)

        def stage_gtao(scene, cam, lights, consts, lpm, jit, ni):
            g, ao = _ao(scene, cam, lights, consts, jit, ni)
            return jnp.sum(g["color"]) + jnp.sum(ao.astype(jnp.float32))

        def stage_tonemap(scene, cam, lights, consts, lpm, jit, ni):
            g, ao = _ao(scene, cam, lights, consts, jit, ni)
            color = quantize_r11g11b10f(g["color"]).reshape(h, w, 3)
            image = pack_unorm8(tonemap_frame(color, ao, lpm))
            return jnp.sum(image.astype(jnp.float32))

        def stage_null(scene, cam, lights, consts, lpm, jit, ni):
            # RPC-floor / scan baseline (CLAUDE.md round-3 note)
            return jnp.sum(jit) + ni.astype(jnp.float32)

        stages = [("null", stage_null),
                  ("trace", stage_trace), ("shade", stage_shade),
                  ("gtao", stage_gtao), ("tonemap", stage_tonemap)]
        cum = {}
        for name, fn in stages:
            # Device arrays ride as jit ARGUMENTS (HLO parameters), not
            # closure constants — constant-baked scene tables push the
            # serialized program past the remote-compile size limit
            # (HTTP 413 on the tunnel).
            @jax.jit
            def run(scene, cam, lights, consts, lpm, fn=fn):
                def body(acc, xs):
                    jit, ni = xs
                    return acc + fn(scene, cam, lights, consts, lpm,
                                    jit, ni), None

                acc, _ = jax.lax.scan(
                    body, jnp.float32(0),
                    (jits, jnp.arange(REPS, dtype=jnp.int32) % 64))
                return acc

            arrs = (scene, cam, lights, consts, lpm)
            float(run(*arrs))  # compile + settle
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(*arrs))
                best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
            cum[name] = best
            print(f"{w}x{h} cum through {name}: {cum[name]:.2f} ms",
                  file=sys.stderr, flush=True)

        names = [n for n, _ in stages]
        per_pass = {}
        prev = cum["null"]
        for b in names[1:]:
            cur = max(cum[b], prev)   # monotonic clamp
            per_pass[b] = cur - prev
            prev = cur
        report[f"{w}x{h}"] = dict(
            cumulative_ms={k: round(v, 2) for k, v in cum.items()},
            per_pass_ms={k: round(v, 2) for k, v in per_pass.items()},
            tracer_tier=tables, tris=int(scene["geom"]["v0"].shape[0]),
            timing="min-of-3 device scans, null-stage floor subtraction, "
                   "monotonic clamp",
        )
        print(json.dumps(report[f"{w}x{h}"]), file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FRAME_BREAKDOWN.json")
    with open(path, "w") as f:
        json.dump(stamped(report), f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
