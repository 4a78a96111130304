"""Honest dynamic-mode frame cost: per-frame in-jit LBVH rebuild +
packet trace + shade + GTAO + LPM under animated instance transforms.

Round-1 reported ~0.8-1.8 ms for this mode — a dispatch rate. This tool
scans REPS frames with per-step rotation matrices inside one device
program ending in a checksum readback (the only honest timing on the
tunneled backend) and writes DYNAMIC_BENCH.json.

Covers the reference's per-frame TLAS rebuild semantics
(vk_tlas_builder.rs:38-233, destroy-and-rebuild each frame).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _stamp import stamped  # noqa: E402
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPS = 8
W = H = 800


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_scene
    from tpurt.engine.dynamic import render_frame_dynamic
    from tpurt.passes.gtao import gtao_constants

    r = build_scene(W, H)
    obj = jax.device_put(r.scene.as_object_pytree())
    base = np.asarray(r.scene.transforms)          # (I, 3, 4)
    cam = r._cached("camera", r.camera.uniform())
    lights = r._cached("lights", r.lights.shader_arrays())
    consts = gtao_constants(W, H, r.camera.znear, r.camera.zfar,
                            r.camera.fovy, r.camera.aspect)
    gtao = r._effective_gtao()

    # per-step rotations around Y composed onto the base transforms
    angles = np.linspace(0.0, 0.5, REPS).astype(np.float32)
    rots = []
    for a in angles:
        c, s = np.cos(a), np.sin(a)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t = base.copy()
        t[:, :, :3] = np.einsum("ij,njk->nik", rot, base[:, :, :3])
        rots.append(t)
    transforms = jnp.asarray(np.stack(rots))        # (REPS, I, 3, 4)

    from tpurt.engine.dynamic import (make_refit_data,
                                      render_frame_dynamic_refit)

    refit = jax.device_put(make_refit_data(r.scene))

    def frame_rebuild(obj, t, cam, lights, consts, lpm, ni):
        return render_frame_dynamic(obj, t, cam, lights, consts, lpm, ni,
                                    width=W, height=H, gtao_settings=gtao,
                                    use_pallas=True)

    def frame_refit(obj, t, cam, lights, consts, lpm, ni):
        return render_frame_dynamic_refit(obj, refit, t, cam, lights,
                                          consts, lpm, ni, width=W,
                                          height=H, gtao_settings=gtao)

    # the XLA-tracer variant is omitted at this scale: 43k tris through
    # the gather-based tracer at 800x800 faults the TPU worker (the same
    # depth collapse round 1 documented) — the packet tracer is the
    # production dynamic path
    out_ms = {}
    for label, frame in (("refit", frame_refit),
                         ("rebuild", frame_rebuild)):
        @jax.jit
        def burst(obj, transforms, cam, lights, consts, lpm, frame=frame):
            def body(acc, xs):
                t, ni = xs
                out = frame(obj, t, cam, lights, consts, lpm, ni)
                return acc + jnp.sum(out["image"], dtype=jnp.uint32), None

            acc, _ = jax.lax.scan(
                body, jnp.uint32(0),
                (transforms, jnp.arange(REPS, dtype=jnp.int32) % 64))
            return acc

        args = (obj, transforms, cam, lights, consts, r._lpm_derived)
        assert int(burst(*args)) > 0
        t0 = time.perf_counter()
        chk = int(burst(*args))
        ms = (time.perf_counter() - t0) * 1000 / REPS
        assert chk > 0
        out_ms[label] = ms
        print(f"dynamic {label}: {ms:.2f} ms/frame", file=sys.stderr,
              flush=True)
    pallas_ms = out_ms["rebuild"]
    refit_ms = out_ms["refit"]

    report = dict(device=str(jax.devices()[0]), reps=REPS,
                  resolution=f"{W}x{H}",
                  tris=int(np.asarray(obj["tri_vertex"]).shape[0]),
                  ms_per_frame_refit=round(refit_ms, 2),
                  ms_per_frame_rebuild=round(pallas_ms, 2),
                  pipeline="refit: in-jit BVH8 box refit; rebuild: in-jit "
                           "LBVH rebuild; + primary+shadow + GTAO ULTRA "
                           "+ LPM",
                  timing="device-side lax.scan of 8 frames, checksum "
                         "readback")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "DYNAMIC_BENCH.json"), "w") as f:
        json.dump(stamped(report), f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
