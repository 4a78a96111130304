"""Isolate WHAT flips XLA:TPU into the fast two-gather lowering.

GATHER_STRATEGY_PROBE: lone f32 640k-row gather 6.55 ms net, lone u8
5.51, but f32+u8 together 2.69 — heterogeneous pair is 2.4x faster than
either alone. Candidate triggers: (a) gather+reduce fusion being BROKEN
by the second gather (test with optimization_barrier on the lone form),
(b) dtype heterogeneity (test f32+f32 from different tables, u8+u8),
(c) any second gather at all, even a tiny decoy (test attr + 256-row
decoy) — if (c), every pass can inject a free decoy.

Writes GATHER_TRIGGER_PROBE.json.
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
N = 640_000


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_scene

    r = build_scene(800, 800)
    scene = r.scene_device
    attr = scene["tri_attr"]                       # (T, 40) f32
    quad = scene["tex_quad48"]
    quad2 = quad if quad.ndim == 2 else quad.reshape(-1, quad.shape[-1])
    n_rows = quad2.shape[0]
    T = attr.shape[0]
    attr_b = attr + 1.0                            # distinct f32 table
    decoy_tbl = jnp.arange(256 * 64, dtype=jnp.float32).reshape(256, 64)
    decoy_u8 = (jnp.arange(256 * 64) % 251).astype(jnp.uint8).reshape(256, 64)

    rng = np.random.default_rng(0)
    tidx = jnp.asarray(rng.integers(0, T, size=N), jnp.int32)
    tidx_b = jnp.asarray(rng.integers(0, T, size=N), jnp.int32)
    qidx = jnp.asarray(rng.integers(0, n_rows, size=N), jnp.int32)
    didx = jnp.asarray(rng.integers(0, 256, size=N), jnp.int32)
    rots = jnp.asarray(rng.integers(0, T, size=REPS), jnp.int32)

    def stage_null(rot):
        return rot.astype(jnp.float32)

    def stage_one(rot):
        return jnp.sum(attr[jnp.mod(tidx + rot, T)])

    def stage_one_barrier(rot):
        at = attr[jnp.mod(tidx + rot, T)]
        at = jax.lax.optimization_barrier(at)
        return jnp.sum(at)

    def stage_indep(rot):
        at = attr[jnp.mod(tidx + rot, T)]
        rows = quad2[jnp.mod(qidx + rot, n_rows)]
        return jnp.sum(at) + jnp.sum(rows.astype(jnp.float32))

    def stage_f32_f32(rot):
        a = attr[jnp.mod(tidx + rot, T)]
        b = attr_b[jnp.mod(tidx_b + rot, T)]
        return jnp.sum(a) + jnp.sum(b)

    def stage_decoy_f32(rot):
        at = attr[jnp.mod(tidx + rot, T)]
        d = decoy_tbl[jnp.mod(didx + rot, 256)]
        return jnp.sum(at) + jnp.sum(d)

    def stage_decoy_u8(rot):
        at = attr[jnp.mod(tidx + rot, T)]
        d = decoy_u8[jnp.mod(didx + rot, 256)]
        return jnp.sum(at) + jnp.sum(d.astype(jnp.float32))

    def stage_u8_decoy_f32(rot):
        rows = quad2[jnp.mod(qidx + rot, n_rows)]
        d = decoy_tbl[jnp.mod(didx + rot, 256)]
        return jnp.sum(rows.astype(jnp.float32)) + jnp.sum(d)

    def stage_indep_32rows(rot):
        # does the fast pair form survive a narrow second gather?
        at = attr[jnp.mod(tidx + rot, T)]
        rows = quad2[jnp.mod(qidx + rot, n_rows), :32]
        return jnp.sum(at) + jnp.sum(rows.astype(jnp.float32))

    stages = [("null", stage_null), ("one", stage_one),
              ("one_barrier", stage_one_barrier), ("indep", stage_indep),
              ("f32_f32", stage_f32_f32), ("decoy_f32", stage_decoy_f32),
              ("decoy_u8", stage_decoy_u8),
              ("u8_decoy_f32", stage_u8_decoy_f32),
              ("indep_32rows", stage_indep_32rows)]
    cum = {}
    for name, fn in stages:
        @jax.jit
        def run(fn=fn):
            def body(acc, rot):
                return acc + fn(rot), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), rots)
            return acc

        float(run())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run())
            best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
        cum[name] = best
        print(f"{name}: {best:.3f} ms", file=sys.stderr, flush=True)

    null = cum["null"]
    report = stamped(dict(
        device=str(jax.devices()[0]), reps=REPS, rows=N,
        cumulative_ms={k: round(v, 3) for k, v in cum.items()},
        net_ms={k: round(v - null, 3) for k, v in cum.items() if k != "null"},
    ))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "GATHER_TRIGGER_PROBE.json"),
            "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
