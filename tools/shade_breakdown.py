"""Sub-attribution of the shade pass: shadow-ray traces vs shading math.

Same device-side lax.scan timing discipline as tools/frame_breakdown.py.
Measures, at the bench workload:
  A) trace + shade with shadow tracing stubbed out (shadow_trace_fn
     returning all-unoccluded — XLA DCEs the traversal entirely)
  B) trace + full shade (3 packet any-hit traces)
shadow cost = B - A; math cost = A - trace.
"""
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

    from bench import build_scene
    from tpurt.engine.frame import MAX_LEAF
    from tpurt.kernels.traverse_pallas import trace_closest_packets
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays
    from tpurt.passes.shade import shade

    w = h = 800
    r = build_scene(w, h)
    cam = r._cached("camera", r.camera.uniform())
    lights = r._cached("lights", r.lights.shader_arrays())
    scene = r.scene_device
    tables = r._pallas_tables()

    jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
        * jnp.ones((1, 2), jnp.float32)

    def run_case(stub_shadows):
        def one(sc, jit):
            o, d = camera_rays(cam, w, h, jitter=jit)
            hits = trace_closest_packets(sc["bvh"], sc["geom"], o, d,
                                         T_MIN, T_MAX, height=h, width=w,
                                         max_leaf=MAX_LEAF, tables=tables)
            kw = {}
            if stub_shadows:
                kw["shadow_trace_fn"] = \
                    lambda o_, d_, tn, tx: jnp.zeros(o_.shape[0], jnp.bool_)
            g = shade(sc, cam, lights, hits, o, d, pallas_tables=tables,
                      height=h, width=w, max_leaf=MAX_LEAF, **kw)
            return jnp.sum(g["color"])

        @jax.jit
        def scan(sc):
            def body(acc, jit):
                return acc + one(sc, jit), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jits)
            return acc

        float(scan(scene))
        t0 = time.perf_counter()
        float(scan(scene))
        return (time.perf_counter() - t0) * 1000 / REPS

    from tpurt.passes.shade import sample_bilinear_quad

    def run_fn(make_checksum, label):
        # scene rides in as a jit ARGUMENT — closure-captured device arrays
        # are inlined into the HLO as literals and blow the remote-compile
        # request size limit
        def one(sc, jit):
            o, d = camera_rays(cam, w, h, jitter=jit)
            hits = trace_closest_packets(sc["bvh"], sc["geom"], o, d,
                                         T_MIN, T_MAX, height=h, width=w,
                                         max_leaf=MAX_LEAF, tables=tables)
            return make_checksum(sc, o, d, hits)

        @jax.jit
        def scan(sc):
            def body(acc, jit):
                return acc + one(sc, jit), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jits)
            return acc

        float(scan(scene))
        t0 = time.perf_counter()
        float(scan(scene))
        ms = (time.perf_counter() - t0) * 1000 / REPS
        print(f"{label}: {ms:.2f} ms", file=sys.stderr, flush=True)
        return ms

    def cs_attr(sc, o, d, hits):
        tidx = jnp.maximum(hits["tri"], 0)
        attr = sc["tri_attr"][tidx]
        return jnp.sum(attr)

    def cs_tex(sc, o, d, hits):
        tidx = jnp.maximum(hits["tri"], 0)
        attr = sc["tri_attr"][tidx]
        prim = attr[:, 36].astype(jnp.int32)
        u = hits["u"][:, None]
        v = hits["v"][:, None]
        wb = 1.0 - u - v
        uv0, uv1, uv2 = attr[:, 3:5], attr[:, 15:17], attr[:, 27:29]
        tc = uv0 * wb + uv1 * u + uv2 * v
        packed = sample_bilinear_quad(sc["tex_quad48"], attr[:, 37:39],
                                      prim, tc)
        return jnp.sum(attr) + jnp.sum(packed)

    t_attr = run_fn(cs_attr, "trace+attr-gather")
    t_tex = run_fn(cs_tex, "trace+attr+texture-taps")
    no_shadow = run_case(True)
    print(f"trace+shade (shadows stubbed): {no_shadow:.2f} ms",
          file=sys.stderr, flush=True)
    full = run_case(False)
    print(f"trace+shade (full): {full:.2f} ms", file=sys.stderr, flush=True)
    out = dict(device=str(jax.devices()[0]),
               trace_plus_attr_ms=round(t_attr, 2),
               trace_plus_attr_tex_ms=round(t_tex, 2),
               trace_plus_math_ms=round(no_shadow, 2),
               trace_plus_full_shade_ms=round(full, 2),
               shadow_traces_ms=round(full - no_shadow, 2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
