"""Host-side stats for the GTAO main-pass fetch schedule on the bench scene.

Answers three design questions for the next round of main-pass work
(GTAO_SCHEDULE_PROBE.json: conds+reduces+fetch are ~12 of 14.7 ms @800²):

1. per-(tile, step) mip range span: how many of the 5 lax.cond bodies
   actually execute (span 0 = a lax.switch on one level would do);
2. execution-weighted mip histogram: where the one-hot matmul FLOPs go
   (matmul rows scale with the window plan's wy per level);
3. recentered-bf16 exactness: per (tile, level), whether every texel of
   the cut window satisfies bf16(win - c) + c == win for c = window
   midrange — tiles/levels where a SINGLE bf16 plane gather is bit-exact
   (halving the fetch matmul work) instead of the (hi, lo) split pair.

Pure host math (one TPU render for depth/normal, then numpy); writes
GTAO_MIP_STATS.json. Mip-selection math mirrors kernels/gtao_main_pallas
step_coords (XeGTAO.hlsli:246-576).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import ml_dtypes

TILE = 32


def main():
    import jax.numpy as jnp

    from bench import build_scene
    from tpurt.kernels.gtao_main_pallas import _plan_windows, _window_starts
    from tpurt.passes.gtao import (gtao_constants, noise_maps_64,
                                   prefilter_depths)

    report = dict(cases=[])
    for (w, h) in [(800, 800), (1920, 1080)]:
        r = build_scene(w, h)
        out = r.render(block=True)
        depth = np.asarray(out["depth"], np.float32)
        consts = gtao_constants(w, h, r.camera.znear, r.camera.zfar,
                                r.camera.fovy, r.camera.aspect)
        s = r._effective_gtao()
        mips = [np.asarray(m, np.float32)
                for m in prefilter_depths(jnp.asarray(depth), consts)]
        nsl64, nsm64 = (np.asarray(m, np.float32)
                        for m in noise_maps_64(jnp.int32(0)))
        reps_y, reps_x = -(-h // 64), -(-w // 64)
        nsl = np.tile(nsl64, (reps_y, reps_x))[:h, :w]
        nsm = np.tile(nsm64, (reps_y, reps_x))[:h, :w]

        vz = depth * 0.99920
        pixel_dir_rb = vz * consts["ndc_to_view_mul_x_pixel_size"][0]
        effect_radius = consts["effect_radius"] * consts["radius_multiplier"]
        ssr = effect_radius / pixel_dir_rb
        min_s = 1.3 / ssr
        sdp = consts["sample_distribution_power"]
        mip_off = consts["depth_mip_sampling_offset"]
        slice_count, steps = s.slice_count, s.steps_per_slice

        # per-pixel mip for each of the slice_count*steps step instances
        tiles_y, tiles_x = -(-h // TILE), -(-w // TILE)
        pad_y, pad_x = tiles_y * TILE - h, tiles_x * TILE - w
        span_hist = np.zeros(6, np.int64)
        exec_rows = np.zeros(5, np.int64)   # executed (tile,step,level)
        mip_px_hist = np.zeros(5, np.int64)
        plan = _plan_windows([m.shape for m in mips], w, h)
        for sl in range(slice_count):
            for st in range(steps):
                sbn = (sl + st * steps) * 0.6180339887498948482
                sn = np.mod(nsm + sbn, 1.0)
                sv = ((st + sn) / steps) ** sdp + min_s
                so_len = sv * ssr
                mip = np.clip(np.round(np.clip(
                    np.log2(np.maximum(so_len, 1e-20)) - mip_off,
                    0, 5)).astype(np.int32), 0, 4)
                np.add.at(mip_px_hist, mip.reshape(-1), 1)
                mp = np.pad(mip, ((0, pad_y), (0, pad_x)), mode="edge")
                t = mp.reshape(tiles_y, TILE, tiles_x, TILE)
                tmin = t.min(axis=(1, 3))
                tmax = t.max(axis=(1, 3))
                np.add.at(span_hist, (tmax - tmin).reshape(-1), 1)
                for m in range(5):
                    exec_rows[m] += int(((tmin <= m) & (m <= tmax)).sum())

        # recentered-bf16 exactness per (tile, level) on the cut windows
        starts = _window_starts(plan, [m.shape for m in mips],
                                tiles_y, tiles_x)
        elig = []
        for m in range(5):
            wy, wx, full = plan[m]
            y0s, x0s = starts[m]
            hm, wm = mips[m].shape
            ok = np.zeros((tiles_y, tiles_x), bool)
            for ti in range(tiles_y):
                ys = np.clip(y0s[ti] + np.arange(wy), 0, hm - 1)
                rowband = mips[m][ys]
                for tj in range(tiles_x):
                    xs = np.clip(x0s[tj] + np.arange(wx), 0, wm - 1)
                    win = rowband[:, xs]
                    c = (win.max() + win.min()) * 0.5
                    rec = (win - c).astype(ml_dtypes.bfloat16
                                           ).astype(np.float32) + c
                    ok[ti, tj] = bool((rec == win).all())
            elig.append(ok)

        # execution-weighted: of the fetch matmul rows, what fraction
        # could ride the 1-plane recentered path?
        fast_rows = np.zeros(5, np.int64)
        all_rows = np.zeros(5, np.int64)
        for sl in range(slice_count):
            for st in range(steps):
                sbn = (sl + st * steps) * 0.6180339887498948482
                sn = np.mod(nsm + sbn, 1.0)
                sv = ((st + sn) / steps) ** sdp + min_s
                so_len = sv * ssr
                mip = np.clip(np.round(np.clip(
                    np.log2(np.maximum(so_len, 1e-20)) - mip_off,
                    0, 5)).astype(np.int32), 0, 4)
                mp = np.pad(mip, ((0, pad_y), (0, pad_x)), mode="edge")
                t = mp.reshape(tiles_y, TILE, tiles_x, TILE)
                tmin = t.min(axis=(1, 3))
                tmax = t.max(axis=(1, 3))
                for m in range(5):
                    ex = (tmin <= m) & (m <= tmax)
                    wy = plan[m][0]
                    all_rows[m] += int(ex.sum()) * wy
                    fast_rows[m] += int((ex & elig[m]).sum()) * wy

        n_steps = slice_count * steps
        n_tiles = tiles_y * tiles_x
        case = dict(
            shape=f"{w}x{h}", quality=f"{slice_count}x{steps}",
            tiles=n_tiles, step_instances=n_steps,
            plan_wy=[int(p[0]) for p in plan],
            span_hist=[int(x) for x in span_hist],
            mean_levels_per_step=round(float(exec_rows.sum())
                                       / (n_tiles * n_steps), 3),
            mip_pixel_hist=[int(x) for x in mip_px_hist],
            exec_tile_steps_per_level=[int(x) for x in exec_rows],
            elig_frac_per_level=[round(float(e.mean()), 4) for e in elig],
            fetch_rows_per_level=[int(x) for x in all_rows],
            fast_fetch_rows_per_level=[int(x) for x in fast_rows],
            fast_row_frac=round(float(fast_rows.sum())
                                / max(float(all_rows.sum()), 1), 4),
        )
        report["cases"].append(case)
        print(json.dumps(case), file=sys.stderr, flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "GTAO_MIP_STATS.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
