"""A/B the GTAO main-pass slice-body schedule on the real bench scene.

GTAO_SCAFFOLD_PROBE.json shows the scaffold (conds + range reduces +
vector math) is ~85-90% of the in-scene main pass. schedule="batch"
reorders the slice body (all steps' vector math + range reduces first,
then the cond chains, then the horizons) — the BVH8 emission-order
lesson applied to GTAO; bit-identical values (tested). Device-scan
timing, min-of-3, null floor. Writes GTAO_SCHEDULE_PROBE.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

REPS = 8


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from tpurt.passes.gtao import (_main_pass_any, gtao_constants,
                                   prefilter_depths)

    report = dict(device=str(jax.devices()[0]), reps=REPS, cases=[])
    for (w, h) in [(800, 800), (1920, 1080)]:
        print(f"schedule-probe: building {w}x{h} scene...", file=sys.stderr,
              flush=True)
        r = build_scene(w, h)
        out = r.render(block=True)
        depth = out["depth"]
        normal = out["normal"]
        consts = gtao_constants(w, h, r.camera.znear, r.camera.zfar,
                                r.camera.fovy, r.camera.aspect)
        s = r._effective_gtao()
        import dataclasses
        s_step = dataclasses.replace(s, schedule="step")
        s_batch = dataclasses.replace(s, schedule="batch")

        def st_main(settings):
            def fn(depth, normal, ni):
                mips = prefilter_depths(
                    depth + ni.astype(jnp.float32) * 1e-7, consts)
                ao, e = _main_pass_any(mips, normal, consts, settings, ni)
                return (jnp.sum(ao.astype(jnp.float32))
                        + jnp.sum(e.astype(jnp.float32)))
            return fn

        def st_main_raw(schedule, unroll_slices, precision=None):
            # direct kernel call: unroll_slices is a main_pass_pallas-only
            # knob (batch + unrolled slices: no fori carry, so Mosaic may
            # interleave phase A of slice k+1 behind slice k's conds)
            from tpurt.kernels.gtao_main_pallas import (consts_to_vec,
                                                        main_pass_pallas)
            from tpurt.passes.gtao import noise_maps_64

            def fn(depth, normal, ni):
                mips = prefilter_depths(
                    depth + ni.astype(jnp.float32) * 1e-7, consts)
                ao, e = main_pass_pallas(
                    mips, normal, consts_to_vec(consts),
                    noise_maps_64(ni), width=w, height=h,
                    slice_count=s.slice_count,
                    steps_per_slice=s.steps_per_slice,
                    precision=precision or s.precision, schedule=schedule,
                    unroll_slices=unroll_slices)
                return (jnp.sum(ao.astype(jnp.float32))
                        + jnp.sum(e.astype(jnp.float32)))
            return fn

        def st_null(depth, normal, ni):
            return jnp.sum(ni.astype(jnp.float32)) + jnp.sum(depth[0, :1])

        nis = jnp.arange(REPS, dtype=jnp.int32)

        def timed(fn):
            @jax.jit
            def run(depth, normal):
                def body(acc, ni):
                    return acc + fn(depth, normal, ni), None
                acc, _ = jax.lax.scan(body, jnp.float32(0), nis)
                return acc

            float(run(depth, normal))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(depth, normal))
                best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
            return best

        null_ms = timed(st_null)
        ms_step = timed(st_main(s_step)) - null_ms
        ms_batch = timed(st_main(s_batch)) - null_ms
        ms_bu = timed(st_main_raw("batch", True)) - null_ms
        # pure vector scaffold (no conds/reduces/fetch, wrong AO): what
        # remains of the batch main pass is conds+reduces+fetch
        ms_nc = timed(st_main_raw("batch", False, "debug_noconds")) - null_ms

        # on-device parity (bit-identical reordering)
        mips = prefilter_depths(depth, consts)
        ao_s, e_s = _main_pass_any(mips, normal, consts, s, jnp.int32(7))
        ao_b, e_b = _main_pass_any(mips, normal, consts, s_batch,
                                   jnp.int32(7))
        ok = bool((np.asarray(ao_s) == np.asarray(ao_b)).all()
                  and (np.asarray(e_s) == np.asarray(e_b)).all())

        case = dict(shape=f"{w}x{h}",
                    quality=f"{s.slice_count}x{s.steps_per_slice}",
                    null_floor_ms=round(null_ms, 3),
                    main_step_ms=round(ms_step, 3),
                    main_batch_ms=round(ms_batch, 3),
                    main_batch_unroll_ms=round(ms_bu, 3),
                    main_noconds_ms=round(ms_nc, 3),
                    parity=ok)
        report["cases"].append(case)
        print(f"{w}x{h}: step {ms_step:.2f} ms, batch {ms_batch:.2f} ms, "
              f"batch+unroll {ms_bu:.2f} ms, noconds {ms_nc:.2f}, "
              f"parity {ok}", file=sys.stderr, flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "GTAO_SCHEDULE_PROBE.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
