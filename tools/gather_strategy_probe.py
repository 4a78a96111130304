"""Why does the INDEPENDENT two-gather program beat ONE gather alone?

GATHER_OVERLAP_PROBE (r5) measured, reproducibly: one 640k-row tri_attr
gather = 6.9 ms net, the dependent attr->quad chain = 9.4, but attr+quad
with independent indices = 3.0 ms net — both gathers together, faster
than either alone. The only explanation is XLA picking a different
emitter/fusion strategy. This probe isolates the trigger so the fast
form can be applied deliberately:

  one          attr gather, sum              (slow baseline, 6.9)
  indep        attr + quad, sums             (fast pair, 3.0)
  two_attr     attr gather x2, diff indices  (pair trigger? same table)
  one_u8       quad gather alone, sum        (u8 table alone)
  one_sumrows  attr gather, sum over rows only -> (40,) then sum
  one_nosum    attr gather, checksum via at[::4096].sum()  (readback tiny)
  sum_only     sum over the whole attr TABLE (no gather) — reduce cost
  one_pad64    attr gather from a (T, 64)-padded f32 table (256 B rows)

Writes GATHER_STRATEGY_PROBE.json.
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
    attr64 = jnp.pad(attr, ((0, 0), (0, 64 - attr.shape[1])))

    rng = np.random.default_rng(0)
    tidx = jnp.asarray(rng.integers(0, T, size=N), jnp.int32)
    tidx_b = jnp.asarray(rng.integers(0, T, size=N), jnp.int32)
    qidx = jnp.asarray(rng.integers(0, n_rows, size=N), jnp.int32)
    rots = jnp.asarray(rng.integers(0, T, size=REPS), jnp.int32)

    def stage_null(rot):
        return rot.astype(jnp.float32)

    def stage_one(rot):
        return jnp.sum(attr[jnp.mod(tidx + rot, T)])

    def stage_indep(rot):
        at = attr[jnp.mod(tidx + rot, T)]
        rows = quad2[jnp.mod(qidx + rot, n_rows)]
        return jnp.sum(at) + jnp.sum(rows.astype(jnp.float32))

    def stage_two_attr(rot):
        a = attr[jnp.mod(tidx + rot, T)]
        b = attr[jnp.mod(tidx_b + rot, T)]
        return jnp.sum(a) + jnp.sum(b)

    def stage_one_u8(rot):
        rows = quad2[jnp.mod(qidx + rot, n_rows)]
        return jnp.sum(rows.astype(jnp.float32))

    def stage_one_sumrows(rot):
        at = attr[jnp.mod(tidx + rot, T)]
        return jnp.sum(jnp.sum(at, axis=0))

    def stage_one_nosum(rot):
        at = attr[jnp.mod(tidx + rot, T)]
        return jnp.sum(at[::4096, 0])

    def stage_sum_only(rot):
        return jnp.sum(attr) + rot.astype(jnp.float32)

    def stage_one_pad64(rot):
        return jnp.sum(attr64[jnp.mod(tidx + rot, T)])

    stages = [("null", stage_null), ("one", stage_one),
              ("indep", stage_indep), ("two_attr", stage_two_attr),
              ("one_u8", stage_one_u8), ("one_sumrows", stage_one_sumrows),
              ("one_nosum", stage_one_nosum), ("sum_only", stage_sum_only),
              ("one_pad64", stage_one_pad64)]
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
            os.path.abspath(__file__))), "GATHER_STRATEGY_PROBE.json"),
            "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()


