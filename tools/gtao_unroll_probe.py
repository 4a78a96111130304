"""A/B the GTAO main kernel's slice loop: fori vs static unroll.

Device-scan timing (min-of-3, null floor) on random inputs — relative
comparison only. Writes GTAO_UNROLL_PROBE.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

REPS = 8


def main():
    import jax
    import jax.numpy as jnp

    from tpurt.kernels.gtao_main_pallas import consts_to_vec, main_pass_pallas
    from tpurt.passes.gtao import gtao_constants, noise_maps_64, \
        prefilter_depths

    report = dict(device=str(jax.devices()[0]), reps=REPS, cases=[])
    for (h, w) in [(800, 800), (1080, 1920)]:
        rng = np.random.default_rng(5)
        depth = jnp.asarray(rng.uniform(0.5, 20.0, (h, w)), jnp.float32)
        n = rng.normal(size=(h, w, 3))
        n[..., 2] = -np.abs(n[..., 2])
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        normal_enc = jnp.asarray(n * 0.5 + 0.5, jnp.float32)
        consts = gtao_constants(w, h, 0.1, 100.0, np.pi / 2, w / h)
        cvec = consts_to_vec(consts)
        mips = prefilter_depths(depth, consts)

        def make(unroll):
            def fn(ni):
                ao, e = main_pass_pallas(
                    mips, normal_enc, cvec, noise_maps_64(ni),
                    width=w, height=h, slice_count=9, steps_per_slice=3,
                    precision="exact", unroll_slices=unroll)
                return (jnp.sum(ao.astype(jnp.float32))
                        + jnp.sum(e.astype(jnp.float32)))
            return fn

        stages = [("null", lambda ni: jnp.sum(ni.astype(jnp.float32))),
                  ("fori", make(False)), ("unroll", make(True))]
        out = {}
        null_ms = 0.0
        for name, fn in stages:
            @jax.jit
            def run(mips_, normal_, fn=fn):
                def body(acc, ni):
                    return acc + fn(ni), None
                acc, _ = jax.lax.scan(body, jnp.float32(0),
                                      jnp.arange(REPS, dtype=jnp.int32))
                return acc

            t0 = time.perf_counter()
            float(run(mips, normal_enc))
            compile_s = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(mips, normal_enc))
                best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
            if name == "null":
                null_ms = best
                continue
            out[name] = dict(ms=round(best - null_ms, 3),
                             compile_s=round(compile_s, 1))
            print(f"{w}x{h} {name}: {out[name]}", file=sys.stderr, flush=True)
        # parity: unroll must be bit-identical to fori
        ao_f, e_f = main_pass_pallas(mips, normal_enc, cvec,
                                     noise_maps_64(jnp.int32(3)), width=w,
                                     height=h, slice_count=9,
                                     steps_per_slice=3, precision="exact")
        ao_u, e_u = main_pass_pallas(mips, normal_enc, cvec,
                                     noise_maps_64(jnp.int32(3)), width=w,
                                     height=h, slice_count=9,
                                     steps_per_slice=3, precision="exact",
                                     unroll_slices=True)
        same = bool((np.asarray(ao_f) == np.asarray(ao_u)).all()
                    and (np.asarray(e_f) == np.asarray(e_u)).all())
        report["cases"].append(dict(shape=f"{w}x{h}", null_floor_ms=null_ms,
                                    bit_identical=same, **out))
        print(f"{w}x{h} bit_identical={same}", file=sys.stderr, flush=True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "GTAO_UNROLL_PROBE.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
