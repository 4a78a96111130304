"""Honest GTAO sub-pass attribution on the real bench scene.

Renders the bench G-buffer once, then times prefilter / +main / +denoise
cumulatively with the device-scan discipline (scalar checksum readback,
varying noise index per iteration). Writes GTAO_SCENE_BENCH.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _stamp import stamped  # noqa: E402
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPS = 8


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from tpurt.passes.gtao import (_denoise_chain, _main_pass_any,
                                   gtao_constants, prefilter_depths)

    report = dict(device=str(jax.devices()[0]), reps=REPS)
    for (w, h) in [(800, 800), (1920, 1080)]:
        print(f"gtao-bench: building {w}x{h} scene...", file=sys.stderr,
              flush=True)
        r = build_scene(w, h)
        out = r.render(block=True)
        depth = out["depth"]
        normal = out["normal"]
        consts = gtao_constants(w, h, r.camera.znear, r.camera.zfar,
                                r.camera.fovy, r.camera.aspect)
        s = r._effective_gtao()

        def st_prefilter(depth, normal, ni):
            mips = prefilter_depths(depth + ni.astype(jnp.float32) * 1e-7,
                                    consts)
            return sum(jnp.sum(m) for m in mips)

        def st_main(depth, normal, ni):
            mips = prefilter_depths(depth + ni.astype(jnp.float32) * 1e-7,
                                    consts)
            ao, e = _main_pass_any(mips, normal, consts, s, ni)
            return (jnp.sum(ao.astype(jnp.float32))
                    + jnp.sum(e.astype(jnp.float32)))

        def st_denoise(depth, normal, ni):
            mips = prefilter_depths(depth + ni.astype(jnp.float32) * 1e-7,
                                    consts)
            ao, e = _main_pass_any(mips, normal, consts, s, ni)
            ao = _denoise_chain(ao, e, s)
            return jnp.sum(ao.astype(jnp.float32))

        def st_null(depth, normal, ni):
            return jnp.sum(ni.astype(jnp.float32)) + jnp.sum(depth[0, :1])

        cum = {}
        for name, fn in [("null", st_null), ("prefilter", st_prefilter),
                         ("main", st_main), ("denoise", st_denoise)]:
            @jax.jit
            def run(depth, normal, fn=fn):
                def body(acc, ni):
                    return acc + fn(depth, normal, ni), None
                acc, _ = jax.lax.scan(body, jnp.float32(0),
                                      jnp.arange(REPS, dtype=jnp.int32) % 64)
                return acc

            float(run(depth, normal))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(depth, normal))
                best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
            cum[name] = best
            print(f"{w}x{h} cum through {name}: {cum[name]:.2f} ms",
                  file=sys.stderr, flush=True)

        prev = cum["null"]
        per = {}
        for name in ("prefilter", "main", "denoise"):
            cur = max(cum[name], prev)   # monotonic clamp
            per[name] = cur - prev
            prev = cur
        report[f"{w}x{h}"] = dict(
            cumulative_ms={k: round(v, 2) for k, v in cum.items()},
            per_pass_ms={k: round(v, 2) for k, v in per.items()},
            timing="min-of-3 device scans, null floor, monotonic clamp")
        print(json.dumps(report[f"{w}x{h}"]), file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GTAO_SCENE_BENCH.json")
    with open(path, "w") as f:
        json.dump(stamped(report), f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
