"""Split the shade pass's gather/texture block (device-scan timing).

Round-3 follow-up to shade_breakdown.py: after the SoA shade rewrite the
"gathers+TBN+textures" stage still costs ~24 ms at 800x800 while the raw
row-gather probes (GATHER_PROBE.json) predict ~11.5 ms for the two wide
gathers. This probe times cumulative stages INSIDE that block to find the
missing ~12 ms (suspects: the (N,39)->(39,N) and (N,64)->(64,N)
transposes that feed the plane math).

Writes SHADE_GATHER_PROBE.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPS = 16
W = H = 800


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from tpurt.engine.frame import MAX_LEAF
    from tpurt.kernels.traverse_pallas import trace_closest_packets
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays

    r = build_scene(W, H)
    cam = r._cached("camera", r.camera.uniform())
    scene = r.scene_device
    tables = r._pallas_tables()

    jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
        * jnp.ones((1, 2), jnp.float32)

    def _trace(scene, cam, jit):
        o, d = camera_rays(cam, W, H, jitter=jit)
        hits = trace_closest_packets(scene["bvh"], scene["geom"], o, d,
                                     T_MIN, T_MAX, height=H, width=W,
                                     max_leaf=MAX_LEAF, tables=tables)
        return o, d, hits

    def stage_null(scene, cam, jit):
        return jnp.sum(jit)

    def stage_trace(scene, cam, jit):
        _, _, hits = _trace(scene, cam, jit)
        return jnp.sum(jnp.where(jnp.isfinite(hits["t"]), hits["t"], 0.0))

    def stage_attr_gather(scene, cam, jit):
        # wide row gather only, consumed WITHOUT a transpose
        _, _, hits = _trace(scene, cam, jit)
        tidx = jnp.maximum(hits["tri"], 0)
        at = scene["tri_attr"][tidx]          # (N, 39)
        return jnp.sum(at) + jnp.sum(hits["t"])

    def stage_attr_transpose(scene, cam, jit):
        # gather + the (N,39)->(39,N) relayout the plane math needs,
        # consumed per-plane so XLA can't collapse the transpose to a sum
        _, _, hits = _trace(scene, cam, jit)
        tidx = jnp.maximum(hits["tri"], 0)
        at = scene["tri_attr"][tidx].T        # (39, N)
        acc = jnp.float32(0)
        for k in range(39):
            acc = acc + jnp.sum(at[k] * (1.0 + 0.001 * k))
        return acc + jnp.sum(hits["t"])

    def _uv_prim(scene, hits):
        tidx = jnp.maximum(hits["tri"], 0)
        at = scene["tri_attr"][tidx].T
        u = hits["u"]
        v = hits["v"]
        w = 1.0 - u - v
        tcu = at[3] * w + at[15] * u + at[27] * v
        tcv = at[4] * w + at[16] * u + at[28] * v
        prim = at[36].astype(jnp.int32)
        return tcu, tcv, prim, at[37], at[38]

    def stage_quad_gather(scene, cam, jit):
        # + the 64B texture quad row gather, consumed without transpose
        _, _, hits = _trace(scene, cam, jit)
        tcu, tcv, prim, h, w = _uv_prim(scene, hits)
        quad = scene["tex_quad48"]
        P, Hh, Ww, C = quad.shape
        x0i = jnp.mod(jnp.floor(tcu * w - 0.5).astype(jnp.int32),
                      w.astype(jnp.int32))
        y0i = jnp.mod(jnp.floor(tcv * h - 0.5).astype(jnp.int32),
                      h.astype(jnp.int32))
        flat = (prim * Hh + y0i) * Ww + x0i
        row = quad.reshape(P * Hh * Ww, C)[flat]      # (N, 64)
        return jnp.sum(row.astype(jnp.float32)) + jnp.sum(hits["t"])

    def stage_quad_transpose(scene, cam, jit):
        # + the (N,64)->(64,N) relayout, consumed per-plane
        _, _, hits = _trace(scene, cam, jit)
        tcu, tcv, prim, h, w = _uv_prim(scene, hits)
        quad = scene["tex_quad48"]
        P, Hh, Ww, C = quad.shape
        x0i = jnp.mod(jnp.floor(tcu * w - 0.5).astype(jnp.int32),
                      w.astype(jnp.int32))
        y0i = jnp.mod(jnp.floor(tcv * h - 0.5).astype(jnp.int32),
                      h.astype(jnp.int32))
        flat = (prim * Hh + y0i) * Ww + x0i
        row = quad.reshape(P * Hh * Ww, C)[flat].T    # (64, N)
        rowf = row.astype(jnp.float32)
        acc = jnp.float32(0)
        for k in range(64):
            acc = acc + jnp.sum(rowf[k] * (1.0 + 0.001 * k))
        return acc + jnp.sum(hits["t"])

    stages = [
        ("null", stage_null),
        ("trace", stage_trace),
        ("attr_gather", stage_attr_gather),
        ("attr_transpose", stage_attr_transpose),
        ("quad_gather", stage_quad_gather),
        ("quad_transpose", stage_quad_transpose),
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
        print(f"cum through {name}: {cum[name]:.2f} ms", file=sys.stderr,
              flush=True)

    report = dict(device=str(jax.devices()[0]), reps=REPS,
                  resolution=f"{W}x{H}", tracer_tier=tables,
                  cumulative_ms={k: round(v, 3) for k, v in cum.items()})
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SHADE_GATHER_PROBE.json"),
            "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
