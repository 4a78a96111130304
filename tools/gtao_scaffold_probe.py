"""Attribute the GTAO Pallas main pass cost via its built-in debug modes.

Cumulative stages (each adds one cost component):
  nofetch    slice/step scaffold + window pipeline (no gathers at all)
  sharedsel  + one-hot matmuls + mask reduces, but with ONE shared
             selector per packet (one-hot CONSTRUCTION cost ~excluded:
             Mosaic hoists the shared iota/compare; matmul count is real)
  half       + real per-sublane selectors, single bf16 plane
  exact      + the lo plane (hi/lo row-stack)

Diffs tell which lever matters next: scaffold (slice math / window
pipeline), matmul+reduce, selector construction, or the exact split.
Timing: device-side lax.scan, min-of-3, null floor. Writes
GTAO_SCAFFOLD_PROBE.json.
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

        def make(precision, slices=9):
            def fn(ni):
                mips = prefilter_depths(depth, consts)
                ao, e = main_pass_pallas(
                    mips, normal_enc, cvec, noise_maps_64(ni),
                    width=w, height=h, slice_count=slices,
                    steps_per_slice=3, precision=precision)
                return (jnp.sum(ao.astype(jnp.float32))
                        + jnp.sum(e.astype(jnp.float32)))
            return fn

        def null_fn(ni):
            return jnp.sum(ni.astype(jnp.float32))

        def prefilter_only(ni):
            mips = prefilter_depths(depth + ni.astype(jnp.float32) * 1e-6,
                                    consts)
            return sum(jnp.sum(m) for m in mips)

        def windows_only(ni):
            # prefilter + the per-tile window cut main_pass_pallas does
            # outside the kernel (per-rep depth jitter defeats hoisting —
            # the plain stages hoist mips+windows out of the scan, so this
            # cost never showed there)
            import numpy as np_
            from tpurt.kernels.gtao_main_pallas import (_cut_windows,
                                                        _plan_windows)
            mips = prefilter_depths(depth + ni.astype(jnp.float32) * 1e-6,
                                    consts)
            shapes = [(int(m.shape[0]), int(m.shape[1])) for m in mips]
            plan = _plan_windows(shapes, w, h)
            tiles_y, tiles_x = -(-h // 32), -(-w // 32)
            acc = jnp.float32(0)
            for m, (wy, wx, full) in enumerate(plan):
                hm, wm = shapes[m]
                if full:
                    y0s = np_.zeros(1, np_.int32)
                    x0s = np_.zeros(1, np_.int32)
                else:
                    ty = np_.arange(tiles_y, dtype=np_.int64) * 32
                    tx = np_.arange(tiles_x, dtype=np_.int64) * 32
                    y0s = np_.clip((ty >> m) - 16, 0,
                                   max(hm - wy, 0)).astype(np_.int32)
                    x0s = np_.clip((tx >> m) - 16, 0,
                                   max(wm - wx, 0)).astype(np_.int32)
                acc = acc + jnp.sum(_cut_windows(mips[m], y0s, x0s, wy, wx))
            return acc

        stages = [("null", null_fn),
                  ("prefilter", prefilter_only),
                  ("windows", windows_only),
                  ("nofetch_s1", make("debug_nofetch", slices=1)),
                  ("nofetch_s3", make("debug_nofetch", slices=3)),
                  ("nofetch", make("debug_nofetch")),
                  ("sharedsel", make("debug_sharedsel")),
                  ("half", make("half")),
                  ("exact", make("exact"))]
        out = {}
        null_ms = 0.0
        for name, fn in stages:
            @jax.jit
            def run(fn=fn):
                def body(acc, ni):
                    return acc + fn(ni), None
                acc, _ = jax.lax.scan(body, jnp.float32(0),
                                      jnp.arange(REPS, dtype=jnp.int32))
                return acc

            float(run())
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run())
                best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
            if name == "null":
                null_ms = best
                continue
            out[name] = round(best - null_ms, 3)
            print(f"{w}x{h} {name}: {out[name]:.2f} ms", file=sys.stderr,
                  flush=True)
        report["cases"].append(dict(shape=f"{w}x{h}", quality="9x3",
                                    null_floor_ms=round(null_ms, 3),
                                    cumulative_ms=out))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "GTAO_SCAFFOLD_PROBE.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
