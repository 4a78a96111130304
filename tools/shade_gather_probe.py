"""Split the shade pass's gather/texture block stage by stage (device scan).

Mirrors the CURRENT AoS shade path (tpurt/passes/shade.py) cumulatively:
  trace        closest-hit packet trace
  attr_rows    + the (N,39) tri_attr row gather, consumed whole
  attr_slices  + the column slices shade actually reads
  interp       + barycentric lerp + TBN (Gram-Schmidt, handedness)
  quad_row     + uv lerp and the (N,64) texture quad row gather
  texture      + bilinear lerp, normal-map TBN transform, sRGB decode
  onelight     + full shade with ONE light, shadows off

Diffs localize regressions that only appear at full-pass fusion scale
(round 3 found a ~10 ms relayout pathology this way). argv: WIDTH HEIGHT
(default 800 800). Writes SHADE_GATHER_PROBE[_WxH].json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPS = 16
W = int(sys.argv[1]) if len(sys.argv) > 1 else 800
H = int(sys.argv[2]) if len(sys.argv) > 2 else 800


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from tpurt.engine.frame import MAX_LEAF
    from tpurt.kernels.traverse_pallas import trace_closest_packets
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays
    from tpurt.passes.shade import shade

    r = build_scene(W, H)
    cam = r._cached("camera", r.camera.uniform())
    lights = r._cached("lights", r.lights.shader_arrays())
    onelight = {k: v[:1] for k, v in lights.items()}
    onelight["casts_shadows"] = jnp.zeros_like(onelight["casts_shadows"])
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

    def _normalize(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                               1e-20)

    def _attr(scene, hits):
        tidx = jnp.maximum(hits["tri"], 0)
        at = scene["tri_attr"][tidx]
        c0, c1, c2 = at[:, 0:12], at[:, 12:24], at[:, 24:36]
        prim = at[:, 36].astype(jnp.int32)
        texh, texw = at[:, 37], at[:, 38]
        return at, c0, c1, c2, prim, texh, texw

    def _interp(c0, c1, c2, hits):
        u = hits["u"][:, None]
        v = hits["v"][:, None]
        w = 1.0 - u - v
        def lerp(s0, s1, s2):
            return s0 * w + s1 * u + s2 * v
        pos = lerp(c0[:, 0:3], c1[:, 0:3], c2[:, 0:3])
        uv = lerp(c0[:, 3:5], c1[:, 3:5], c2[:, 3:5])
        N = _normalize(lerp(c0[:, 5:8], c1[:, 5:8], c2[:, 5:8]))
        T = _normalize(lerp(c0[:, 8:11], c1[:, 8:11], c2[:, 8:11]))
        T = _normalize(T - jnp.sum(T * N, -1, keepdims=True) * N)
        B = jnp.cross(N, T) * c0[:, 11:12]
        return pos, uv, N, T, B

    def _quad_row(scene, prim, texh, texw, uv):
        quad = scene["tex_quad48"]
        px = uv[:, 0] * texw - 0.5
        py = uv[:, 1] * texh - 0.5
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = (px - x0)[:, None]
        fy = (py - y0)[:, None]
        x0i = jnp.mod(x0.astype(jnp.int32), texw.astype(jnp.int32))
        y0i = jnp.mod(y0.astype(jnp.int32), texh.astype(jnp.int32))
        if quad.ndim == 2:  # streaming-arena layout (rows + base offsets)
            base = scene["tex_quad48_base"]
            flat = (base[jnp.clip(prim, 0, base.shape[0] - 1)]
                    + y0i * texw.astype(jnp.int32) + x0i)
            row = quad[flat]
        else:
            P, Hh, Ww, C = quad.shape
            flat = (prim * Hh + y0i) * Ww + x0i
            row = quad.reshape(P * Hh * Ww, C)[flat]
        return row, fx, fy

    def stage_null(scene, cam, lt, jit):
        return jnp.sum(jit)

    def stage_trace(scene, cam, lt, jit):
        _, _, hits = _trace(scene, cam, jit)
        return jnp.sum(jnp.where(jnp.isfinite(hits["t"]), hits["t"], 0.0))

    def stage_attr_rows(scene, cam, lt, jit):
        _, _, hits = _trace(scene, cam, jit)
        at = scene["tri_attr"][jnp.maximum(hits["tri"], 0)]
        return jnp.sum(at) + jnp.sum(hits["t"])

    def stage_attr_slices(scene, cam, lt, jit):
        _, _, hits = _trace(scene, cam, jit)
        at, c0, c1, c2, prim, texh, texw = _attr(scene, hits)
        return (jnp.sum(c0) + 2 * jnp.sum(c1) + 3 * jnp.sum(c2)
                + jnp.sum(prim) + jnp.sum(texh * texw) + jnp.sum(hits["t"]))

    def stage_interp(scene, cam, lt, jit):
        _, _, hits = _trace(scene, cam, jit)
        at, c0, c1, c2, prim, texh, texw = _attr(scene, hits)
        pos, uv, N, T, B = _interp(c0, c1, c2, hits)
        return (jnp.sum(pos) + jnp.sum(uv) + jnp.sum(N) + jnp.sum(T)
                + jnp.sum(B) + jnp.sum(texh * texw)
                + jnp.sum(prim).astype(jnp.float32))

    def stage_quad_row(scene, cam, lt, jit):
        _, _, hits = _trace(scene, cam, jit)
        at, c0, c1, c2, prim, texh, texw = _attr(scene, hits)
        pos, uv, N, T, B = _interp(c0, c1, c2, hits)
        row, fx, fy = _quad_row(scene, prim, texh, texw, uv)
        return (jnp.sum(row.astype(jnp.float32)) + jnp.sum(pos) + jnp.sum(N)
                + jnp.sum(T) + jnp.sum(B) + jnp.sum(fx) + jnp.sum(fy))

    def stage_texture(scene, cam, lt, jit):
        _, _, hits = _trace(scene, cam, jit)
        at, c0, c1, c2, prim, texh, texw = _attr(scene, hits)
        pos, uv, N, T, B = _interp(c0, c1, c2, hits)
        row, fx, fy = _quad_row(scene, prim, texh, texw, uv)
        rowf = row.astype(jnp.float32)
        t00, t10, t01, t11 = (rowf[:, 0:12], rowf[:, 12:24],
                              rowf[:, 24:36], rowf[:, 36:48])
        packed = ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
                  + (t01 * (1 - fx) + t11 * fx) * fy) / 255.0
        ts = _normalize(packed[:, 8:11] * 2.0 - 1.0)
        Nw = _normalize(ts[:, 0:1] * T + ts[:, 1:2] * B + ts[:, 2:3] * N)
        albedo = jnp.power(packed[:, 0:3], 2.2)
        return (jnp.sum(albedo) + jnp.sum(Nw) + jnp.sum(packed[:, 5])
                + jnp.sum(packed[:, 6]) + jnp.sum(pos))

    def stage_onelight(scene, cam, lt, jit):
        o, d, hits = _trace(scene, cam, jit)
        g = shade(scene, cam, lt, hits, o, d, pallas_tables=tables,
                  height=H, width=W, max_leaf=MAX_LEAF)
        return jnp.sum(g["color"]) + jnp.sum(g["depth"]) \
            + jnp.sum(g["normal_enc"])

    stages = [
        ("null", stage_null),
        ("trace", stage_trace),
        ("attr_rows", stage_attr_rows),
        ("attr_slices", stage_attr_slices),
        ("interp", stage_interp),
        ("quad_row", stage_quad_row),
        ("texture", stage_texture),
        ("onelight", stage_onelight),
    ]
    cum = {}
    for name, fn in stages:
        @jax.jit
        def run(scene, cam, lt, fn=fn):
            def body(acc, jit):
                return acc + fn(scene, cam, lt, jit), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jits)
            return acc

        float(run(scene, cam, onelight))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(scene, cam, onelight))
            best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
        cum[name] = best
        print(f"cum through {name}: {cum[name]:.2f} ms", file=sys.stderr,
              flush=True)

    report = dict(device=str(jax.devices()[0]), reps=REPS,
                  resolution=f"{W}x{H}", tracer_tier=tables,
                  cumulative_ms={k: round(v, 3) for k, v in cum.items()})
    name = ("SHADE_GATHER_PROBE.json" if (W, H) == (800, 800)
            else f"SHADE_GATHER_PROBE_{W}x{H}.json")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), name), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
