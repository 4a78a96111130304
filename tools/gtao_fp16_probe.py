"""Measure the fp16 (min16float-emulation) GTAO pipeline against the f32
default on the bench scene (VERDICT r3 #9): AO-term RMSE, final-image
delta, and the per-frame cost of the fp16 XLA path (a parity knob, not a
perf path — the Pallas kernels are exact-f32 designs and stay default).
Health-gated; writes GTAO_FP16.json."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

W = int(sys.argv[1]) if len(sys.argv) > 1 else 800
H = int(sys.argv[2]) if len(sys.argv) > 2 else 800


def main():
    from dataclasses import replace

    import jax
    import numpy as np

    from bench import build_scene
    from tpurt.utils.health import probe_ms

    def log(m):
        print(m, file=sys.stderr, flush=True)

    p0 = probe_ms()
    log(f"initial probe {p0:.1f} ms")

    r32 = build_scene(W, H)
    out32 = r32.render()
    ao32 = np.asarray(out32["ao"]).astype(np.float32)
    img32 = np.asarray(out32["image"]).astype(np.float32)
    log("f32 frame done")

    r16 = build_scene(W, H)
    r16.config = replace(r16.config,
                         gtao=replace(r16.config.gtao, precision="fp16"))
    out16 = r16.render()
    ao16 = np.asarray(out16["ao"]).astype(np.float32)
    img16 = np.asarray(out16["image"]).astype(np.float32)
    log("fp16 frame done")

    # wall time of one more blocked fp16 frame (dispatch-rate caveat noted;
    # the knob is about parity, not speed)
    t0 = time.perf_counter()
    r16.render(block=True)
    fp16_wall_ms = (time.perf_counter() - t0) * 1000

    p1 = probe_ms()
    report = dict(
        device=str(jax.devices()[0]), resolution=f"{W}x{H}",
        gtao="ULTRA 9x3 + sharp denoise",
        ao_rmse_final_term_units=round(
            float(np.sqrt(np.mean((ao32 - ao16) ** 2))), 4),
        ao_max_abs_delta=float(np.max(np.abs(ao32 - ao16))),
        ao_frac_pixels_differ=round(float(np.mean(ao32 != ao16)), 4),
        image_rmse_u8=round(
            float(np.sqrt(np.mean((img32 - img16) ** 2))), 4),
        image_max_abs_delta_u8=float(np.max(np.abs(img32 - img16))),
        fp16_path="XLA main+prefilter+denoise with every lpfloat-typed "
                  "intermediate of XeGTAO.hlsli in jnp.float16",
        fp16_frame_wall_ms=round(fp16_wall_ms, 1),
        health=dict(probe_before_ms=round(p0, 1),
                    probe_after_ms=round(p1, 1)),
        note="parity knob for the min16float deviation in docs/PARITY.md; "
             "f32 (Pallas exact) stays the default pipeline")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GTAO_FP16.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
