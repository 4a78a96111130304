"""Do two big row-gathers overlap when made independent? (VERDICT r4 #5)

The shade pass pays two sequential ~3.1 ms row-gathers per frame: the
(T, 40) f32 tri_attr gather, then — because uv / image id / extents come
out of those rows — the (rows, 64) u8 texture quad gather. Packing a uv
payload into the BVH8 kernel's tris128 rows would break the dependency so
the two gathers become independent. That surgery only pays if XLA/Mosaic
actually OVERLAPS independent gathers; if the gather unit serializes them
anyway, independence buys nothing.

Stages (device lax.scan, cumulative, checksum readback — CLAUDE.md timing
rules; diffs against `one` isolate the second gather's marginal cost):
  null       scan overhead
  one        1x tri_attr gather (640k rows)
  dep        tri_attr gather -> quad indices derived FROM the rows -> quad
             gather (today's serial chain)
  indep      tri_attr gather + quad gather with precomputed indices
             (no data dependency; what the kernel-payload design buys)
  quad_only  1x quad gather alone (for the marginal-cost baseline)

Verdict: overlap_ratio = (indep - one) / (dep - one). ~1.0 = no overlap,
the uv-payload redesign is dead; << 1.0 = build it.

Writes GATHER_OVERLAP_PROBE.json.
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
    if quad.ndim != 2:
        U, Hh, Ww, C = quad.shape
        quad2 = quad.reshape(U * Hh * Ww, C)
        base = None
    else:
        quad2 = quad
        base = scene["tex_quad48_base"]
    n_rows = quad2.shape[0]
    T = attr.shape[0]

    rng = np.random.default_rng(0)
    tidx = jnp.asarray(rng.integers(0, T, size=N), jnp.int32)
    qidx_pre = jnp.asarray(rng.integers(0, n_rows, size=N), jnp.int32)
    # per-rep index rotation so the scan can't hoist the gathers
    rots = jnp.asarray(rng.integers(0, T, size=REPS), jnp.int32)

    def quad_idx_from_rows(at):
        """Real dependency: uv/img/extent come out of the attr rows."""
        texh = at[:, 37]
        texw = at[:, 38]
        img = at[:, 39].astype(jnp.int32) if at.shape[1] > 39 \
            else at[:, 36].astype(jnp.int32)
        x = jnp.mod((at[:, 3] * texw).astype(jnp.int32),
                    jnp.maximum(texw.astype(jnp.int32), 1))
        y = jnp.mod((at[:, 4] * texh).astype(jnp.int32),
                    jnp.maximum(texh.astype(jnp.int32), 1))
        if base is not None:
            flat = base[jnp.clip(img, 0, base.shape[0] - 1)] \
                + y * texw.astype(jnp.int32) + x
        else:
            flat = (img * Hh + y) * Ww + x
        return jnp.clip(flat, 0, n_rows - 1)

    def stage_null(rot):
        return rot.astype(jnp.float32)

    def stage_one(rot):
        at = attr[jnp.mod(tidx + rot, T)]
        return jnp.sum(at)

    def stage_dep(rot):
        at = attr[jnp.mod(tidx + rot, T)]
        rows = quad2[quad_idx_from_rows(at)]
        return jnp.sum(at) + jnp.sum(rows.astype(jnp.float32))

    def stage_indep(rot):
        at = attr[jnp.mod(tidx + rot, T)]
        rows = quad2[jnp.mod(qidx_pre + rot, n_rows)]
        return jnp.sum(at) + jnp.sum(rows.astype(jnp.float32))

    def stage_quad_only(rot):
        rows = quad2[jnp.mod(qidx_pre + rot, n_rows)]
        return jnp.sum(rows.astype(jnp.float32))

    stages = [("null", stage_null), ("one", stage_one), ("dep", stage_dep),
              ("indep", stage_indep), ("quad_only", stage_quad_only)]
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

    marg_dep = cum["dep"] - cum["one"]
    marg_ind = cum["indep"] - cum["one"]
    report = stamped(dict(
        device=str(jax.devices()[0]), reps=REPS, rows=N,
        quad_layout="arena2d" if base is not None else "slab4d",
        cumulative_ms={k: round(v, 3) for k, v in cum.items()},
        marginal_quad_ms=dict(dependent=round(marg_dep, 3),
                              independent=round(marg_ind, 3)),
        overlap_ratio=round(marg_ind / max(marg_dep, 1e-9), 3),
        verdict=("gathers overlap -> uv payload wins"
                 if marg_ind < 0.7 * marg_dep else
                 "no overlap -> uv-payload redesign buys nothing"),
    ))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "GATHER_OVERLAP_PROBE.json"),
            "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
