"""Host/device frame-overlap probe (VERDICT r3 #5).

The reference pipelines CPU command recording 3 frames deep against GPU
execution (renderer.rs:300-318,400-466). The TPU analogue on this
backend: keep a BOUNDED queue of K dispatched frames in flight, blocking
on the OLDEST frame's 4-byte checksum readback before dispatching the
next — every frame is individually consumed (no dispatch-rate lie:
each pop is a real device->host sync), but up to K-1 frames overlap the
host's dispatch + RPC work.

Expectation if overlap works: wall ms/frame at K>=2 ~= device frame cost
(the ~30 ms RPC floor and host dispatch hide under device compute);
at K=1 ~= device + RPC. CLAUDE.md documents UNBOUNDED async chains
wedging this tunnel — this probe is the bounded-depth experiment the
round-3 verdict asked for, health-gated before/after each depth.
Writes OVERLAP_PROBE.json."""
import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

FRAMES = 100


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene, _frame_cost_paired, _measure_burst
    from tpurt.engine.frame import render_frame
    from tpurt.passes.gtao import gtao_constants
    from tpurt.utils.health import is_healthy, probe_ms

    def log(m):
        print(m, file=sys.stderr, flush=True)

    p0 = probe_ms()
    log(f"probe: {p0:.1f} ms")
    r = build_scene()
    c = r.config
    cam = r._cached("camera", r.camera.uniform())
    lights = r._cached("lights", r.lights.shader_arrays())
    consts = gtao_constants(c.width, c.height, r.camera.znear, r.camera.zfar,
                            r.camera.fovy, r.camera.aspect)
    scene = r.scene_device
    tables = r._pallas_tables()
    gtao = r._effective_gtao()

    @jax.jit
    def step(scene, cam, lights, consts, lpm, i):
        out = render_frame(scene, cam, lights, consts, lpm, i % 64,
                           width=c.width, height=c.height,
                           gtao_settings=gtao, pallas_tables=tables)
        return jnp.sum(out["image"], dtype=jnp.uint32)

    log("compiling frame step...")
    assert int(step(scene, cam, lights, consts, r._lpm_derived,
                    jnp.int32(0))) > 0

    # device-side frame cost (paired device-scan, RPC floor cancelled)
    _measure_burst(r, frames=8)
    _measure_burst(r, frames=24)
    device_ms = _frame_cost_paired(r, lo=8, hi=24)
    log(f"device frame (paired scan): {device_ms:.2f} ms")

    results = {}
    for depth in (1, 2, 3):
        p = probe_ms()
        if not is_healthy(p):
            log(f"tunnel degraded (probe {p:.0f} ms) — abort depth {depth}")
            results[f"depth_{depth}"] = dict(aborted=True, probe_ms=p)
            continue
        q = deque()
        # warm the queue discipline
        for i in range(depth):
            q.append(step(scene, cam, lights, consts, r._lpm_derived,
                          jnp.int32(i)))
        while q:
            assert int(q.popleft()) > 0
        t0 = time.perf_counter()
        for i in range(FRAMES):
            q.append(step(scene, cam, lights, consts, r._lpm_derived,
                          jnp.int32(i)))
            if len(q) >= depth:
                assert int(q.popleft()) > 0
        while q:
            assert int(q.popleft()) > 0
        wall = (time.perf_counter() - t0) * 1000.0 / FRAMES
        results[f"depth_{depth}"] = dict(
            wall_ms_per_frame=round(wall, 2), probe_ms=round(p, 1),
            frames=FRAMES)
        log(f"depth {depth}: {wall:.2f} ms/frame wall")

    p1 = probe_ms()
    d1 = results.get("depth_1", {}).get("wall_ms_per_frame")
    dbest = min((v["wall_ms_per_frame"] for v in results.values()
                 if "wall_ms_per_frame" in v), default=None)
    report = dict(
        device=str(jax.devices()[0]),
        device_frame_ms=round(device_ms, 2),
        results=results,
        probe_after_ms=round(p1, 1),
        overlap_demonstrated=bool(
            dbest is not None and d1 is not None
            and dbest < 0.8 * d1 and dbest < device_ms * 1.35),
        note="bounded K-deep dispatch queue, every frame individually "
             "consumed via a 4-byte checksum readback; device_frame_ms "
             "from the paired device-scan (the honest device cost)")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "OVERLAP_PROBE.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
