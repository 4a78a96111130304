"""A/B the thin_zero static specialization on-chip: with
thinOccluderCompensation == 0 (the reference default) falloff_base ==
dist bit-for-bit, so the second sqrt of every horizon evaluation (54/px
at ULTRA) is elided at trace time. Both variants run with noise_hoist
on (the shipped configuration). Writes GTAO_THIN_ZERO_PROBE.json."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_scene
    from tpurt.kernels.gtao_main_pallas import consts_to_vec, main_pass_pallas
    from tpurt.passes.gtao import (gtao_constants, noise_maps_64,
                                   prefilter_depths)

    report = dict(device=str(jax.devices()[0]), reps=REPS, cases=[])
    for (w, h) in [(800, 800), (1920, 1080)]:
        print(f"building {w}x{h} scene...", file=sys.stderr, flush=True)
        r = build_scene(w, h)
        out = r.render(block=True)
        consts = gtao_constants(w, h, r.camera.znear, r.camera.zfar,
                                r.camera.fovy, r.camera.aspect)
        s = r._effective_gtao()
        mips = prefilter_depths(out["depth"], consts)
        cvec = consts_to_vec(consts)
        nmaps = noise_maps_64(np.int32(0))
        normal = out["normal"]

        variants = dict(
            base=dict(noise_hoist=True),
            thin_zero=dict(noise_hoist=True, thin_zero=True),
        )

        def stage(kw):
            @jax.jit
            def run(mips, normal, cvec):
                def body(acc, i):
                    nm = noise_maps_64(i)
                    ao, _ = main_pass_pallas(
                        mips, normal, cvec, nm, width=w, height=h,
                        slice_count=s.slice_count,
                        steps_per_slice=s.steps_per_slice,
                        schedule="batch", **kw)
                    return acc + jnp.sum(ao, dtype=jnp.uint32), None

                acc, _ = jax.lax.scan(body, jnp.uint32(0),
                                      jnp.arange(REPS, dtype=jnp.int32))
                return acc

            float(run(mips, normal, cvec))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(mips, normal, cvec))
                best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
            return best

        @jax.jit
        def null(cvec):
            def body(acc, i):
                return acc + jnp.sum(cvec).astype(jnp.uint32) + i, None
            acc, _ = jax.lax.scan(body, jnp.uint32(0),
                                  jnp.arange(REPS, dtype=jnp.uint32))
            return acc

        float(null(cvec))
        t0 = time.perf_counter()
        float(null(cvec))
        floor = (time.perf_counter() - t0) * 1000 / REPS

        case = dict(shape=f"{w}x{h}", null_floor_ms=round(floor, 3),
                    variant_ms={})
        aos = {}
        for name, kw in variants.items():
            ms = stage(kw)
            case["variant_ms"][name] = round(ms - floor, 3)
            aos[name] = np.asarray(main_pass_pallas(
                mips, normal, cvec, nmaps, width=w, height=h,
                slice_count=s.slice_count,
                steps_per_slice=s.steps_per_slice,
                schedule="batch", **kw)[0])
            print(f"{w}x{h} {name}: {ms - floor:.2f} ms", file=sys.stderr,
                  flush=True)
        base = aos["base"]
        d = np.abs(aos["thin_zero"].astype(np.int64)
                   - base.astype(np.int64))
        case["bit_identical"] = bool((d == 0).all())
        case["diff"] = dict(max_u8=int(d.max()), frac=float((d > 0).mean()))
        report["cases"].append(case)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GTAO_THIN_ZERO_PROBE.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()


