"""A/B the streaming-arena quad addressing on the bench scene (round 5).

The non-mip quad tier now routes through the texture row arena by
default: the table becomes flat (rows, 64) with per-image base offsets
(shade.sample_bilinear_quad base= path) instead of the (U, Hmax, Wmax,
64) slab. Same row count on the bench scene (pow-2 capacity == content
rows), one extra tiny base[img] gather in the index math. This probe
measures the full frame both ways (device scan, paired vs null) and
gates bit-exactness. Writes ARENA_AB_PROBE.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

from _stamp import stamped  # noqa: E402

REPS = 16
W = H = 800


def main():
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from tpurt.engine.frame import render_frame
    from tpurt.passes.gtao import gtao_constants

    results = {}
    imgs = {}
    scenes = {}
    r_ref = None
    for arena in (False, True):
        r = bench_mod.build_scene(W, H)
        if not arena:
            r.config.texture_arena = False
            r._scene = None
            r._scene_device = None
            r._update_models()
        r_ref = r
        scenes[arena] = r.scene_device
        key = "arena" if arena else "slab"
        layout = ("2d+base" if r.scene_device["tex_quad48"].ndim == 2
                  else "slab4d")
        print(f"{key}: tex_quad48 layout {layout}", file=sys.stderr,
              flush=True)
        results[key] = dict(layout=layout)

    cam = r_ref._cached("camera", r_ref.camera.uniform())
    lights = r_ref._cached("lights", r_ref.lights.shader_arrays())
    consts = gtao_constants(W, H, r_ref.camera.znear, r_ref.camera.zfar,
                            r_ref.camera.fovy, r_ref.camera.aspect)
    tables = r_ref._pallas_tables()
    gtao = r_ref._effective_gtao()

    noises = jnp.arange(REPS, dtype=jnp.int32) % 64

    for arena in (False, True):
        key = "arena" if arena else "slab"
        scene = scenes[arena]

        @jax.jit
        def burst(scene, cam, lights, consts):
            def body(acc, nz):
                out = render_frame(scene, cam, lights, consts,
                                   r_ref._lpm_derived, nz, width=W,
                                   height=H, gtao_settings=gtao,
                                   pallas_tables=tables)
                return acc + jnp.sum(out["image"].astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), noises)
            return acc

        float(burst(scene, cam, lights, consts))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(burst(scene, cam, lights, consts))
            best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
        results[key]["ms_per_frame"] = round(best, 3)
        print(f"{key}: {best:.2f} ms/frame", file=sys.stderr, flush=True)

        out1 = render_frame(scene, cam, lights, consts, r_ref._lpm_derived,
                            jnp.int32(0), width=W, height=H,
                            gtao_settings=gtao, pallas_tables=tables)
        imgs[key] = np.asarray(out1["image"])

    exact = bool((imgs["slab"] == imgs["arena"]).all())
    report = stamped(dict(
        device=str(jax.devices()[0]), reps=REPS, resolution=f"{W}x{H}",
        results=results, bit_exact=exact,
        delta_ms=round(results["arena"]["ms_per_frame"]
                       - results["slab"]["ms_per_frame"], 3)))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "ARENA_AB_PROBE.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
