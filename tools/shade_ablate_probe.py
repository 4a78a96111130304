"""In-context ablation of the fused shade pass (device scan, min-of-3).

Accumulation-style probes overstate stage costs at 1080p (materializing
intermediates costs more than the fused pass — SHADE_GATHER_PROBE_*.json
showed a 'cumulative' stage 2x slower than the full pass). This probe
keeps the REAL pass and stubs ONE component per variant:

  full        trace + shade, one light, shadows off (baseline)
  tex_stub    sample_bilinear_quad -> constant 0.5 (no texture gather)
  attr_stub   tri_attr row gather -> broadcast of row 0 (no attr gather)

baseline - variant = that component's true in-context cost. attr_stub is
built by rewriting the one gather line in shade()'s source (the gather is
inline; everything else is byte-identical). argv: WIDTH HEIGHT.
Writes SHADE_ABLATE[_WxH].json.
"""
import inspect
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

GATHER_LINE = 'attr = scene["tri_attr"][tidx]        # (N, 39)'
GATHER_STUB = ('attr = jnp.broadcast_to(scene["tri_attr"][0:1], '
               '(tidx.shape[0], 39))')


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from tpurt.engine.frame import MAX_LEAF
    from tpurt.kernels.traverse_pallas import trace_closest_packets
    from tpurt.passes import shade as shade_mod
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays

    src = inspect.getsource(shade_mod.shade)
    assert GATHER_LINE in src, "shade() gather line moved - update probe"
    ns = dict(vars(shade_mod))
    exec(compile(src.replace(GATHER_LINE, GATHER_STUB),
                 "<shade_attr_stub>", "exec"), ns)
    shade_attr_stub = ns["shade"]

    def tex_stub(quad, hw, prim, uv):
        return jnp.full((prim.shape[0], 12), 0.5, jnp.float32) \
            + hw[:, :1] * 0.0

    from tpurt.passes.shade import _quad_rows_to_bytes

    def tex_nolerp(quad, hw, prim, uv):
        # real row gather, ONE corner slice, no bilinear lerp: separates
        # the gather cost from the 4-slice + cast + lerp tail
        h = hw[:, 0]
        w = hw[:, 1]
        px = uv[:, 0] * w - 0.5
        py = uv[:, 1] * h - 0.5
        x0i = jnp.mod(jnp.floor(px).astype(jnp.int32), w.astype(jnp.int32))
        y0i = jnp.mod(jnp.floor(py).astype(jnp.int32), h.astype(jnp.int32))
        P, Hh, Ww, C = quad.shape
        flat = (prim * Hh + y0i) * Ww + x0i
        row = _quad_rows_to_bytes(quad.reshape(P * Hh * Ww, C)[flat])
        return row[:, 0:12] / 255.0

    r = build_scene(W, H)
    cam = r._cached("camera", r.camera.uniform())
    lights = r._cached("lights", r.lights.shader_arrays())
    onelight = {k: v[:1] for k, v in lights.items()}
    onelight["casts_shadows"] = jnp.zeros_like(onelight["casts_shadows"])
    scene = r.scene_device
    tables = r._pallas_tables()

    jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
        * jnp.ones((1, 2), jnp.float32)

    def shaded(shade_fn, patch_tex=False):
        def fn(scene, cam, lt, jit):
            o, d = camera_rays(cam, W, H, jitter=jit)
            hits = trace_closest_packets(scene["bvh"], scene["geom"], o, d,
                                         T_MIN, T_MAX, height=H, width=W,
                                         max_leaf=MAX_LEAF, tables=tables)
            g = shade_fn(scene, cam, lt, hits, o, d, pallas_tables=tables,
                         height=H, width=W, max_leaf=MAX_LEAF)
            return jnp.sum(g["color"]) + jnp.sum(g["depth"]) \
                + jnp.sum(g["normal_enc"])
        fn.patch_tex = patch_tex
        return fn

    from jax import lax

    def make_quad(barrier):
        # sample_bilinear_quad with optimization_barrier(s): bit-identical
        # output; tests whether downstream fusion degrades the row gather
        def f(quad, hw, prim, uv):
            h = hw[:, 0]
            w = hw[:, 1]
            px = uv[:, 0] * w - 0.5
            py = uv[:, 1] * h - 0.5
            x0 = jnp.floor(px)
            y0 = jnp.floor(py)
            fx = (px - x0)[:, None]
            fy = (py - y0)[:, None]
            x0i = jnp.mod(x0.astype(jnp.int32), w.astype(jnp.int32))
            y0i = jnp.mod(y0.astype(jnp.int32), h.astype(jnp.int32))
            P, Hh, Ww, C = quad.shape
            flat = (prim * Hh + y0i) * Ww + x0i
            if barrier in ("idx", "both"):
                flat = lax.optimization_barrier(flat)
            row = quad.reshape(P * Hh * Ww, C)[flat]
            if barrier in ("row", "both"):
                row = lax.optimization_barrier(row)
            rowf = _quad_rows_to_bytes(row)
            t00, t10, t01, t11 = (rowf[:, 0:12], rowf[:, 12:24],
                                  rowf[:, 24:36], rowf[:, 36:48])
            out = ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
                   + (t01 * (1 - fx) + t11 * fx) * fy)
            return out / 255.0
        return f

    stages = [
        ("null", None),
        ("full", shaded(shade_mod.shade)),
        ("tex_stub", shaded(shade_mod.shade, patch_tex=True)),
        ("tex_nolerp", shaded(shade_mod.shade, patch_tex="nolerp")),
        ("tex_barrier_row", shaded(shade_mod.shade, patch_tex="row")),
        ("tex_barrier_idx", shaded(shade_mod.shade, patch_tex="idx")),
        ("tex_barrier_both", shaded(shade_mod.shade, patch_tex="both")),
        ("attr_stub", shaded(shade_attr_stub)),
    ]
    out = {}
    for name, fn in stages:
        orig = shade_mod.sample_bilinear_quad
        if fn is not None and fn.patch_tex:
            shade_mod.sample_bilinear_quad = (
                tex_nolerp if fn.patch_tex == "nolerp"
                else tex_stub if fn.patch_tex is True
                else make_quad(fn.patch_tex))
        try:
            @jax.jit
            def run(scene, cam, lt, fn=fn):
                def body(acc, jit):
                    if fn is None:
                        return acc + jnp.sum(jit), None
                    return acc + fn(scene, cam, lt, jit), None

                acc, _ = jax.lax.scan(body, jnp.float32(0), jits)
                return acc

            float(run(scene, cam, onelight))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(scene, cam, onelight))
                best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
        finally:
            shade_mod.sample_bilinear_quad = orig
        out[name] = round(best, 3)
        print(f"{name}: {best:.2f} ms", file=sys.stderr, flush=True)

    base = out["full"]
    report = dict(device=str(jax.devices()[0]), reps=REPS,
                  resolution=f"{W}x{H}", tracer_tier=tables,
                  cumulative_ms=out,
                  in_context_ms=dict(
                      texture_fetch=round(base - out["tex_stub"], 3),
                      texture_lerp_tail=round(base - out["tex_nolerp"], 3),
                      attr_gather=round(base - out["attr_stub"], 3)))
    name = ("SHADE_ABLATE.json" if (W, H) == (800, 800)
            else f"SHADE_ABLATE_{W}x{H}.json")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), name), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
