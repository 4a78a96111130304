"""Run the SHARDED frame path on real Mosaic hardware (VERDICT r2 #4).

Only one physical chip exists here, so this compiles + runs
render_frame_sharded over a 1-device mesh on the real TPU — proving the
shard_map + Pallas(BVH8) + collectives composition survives the real
Mosaic compiler (the one thing the 8-device virtual-CPU dryrun cannot
show) — and records its paired device-scan frame cost next to the
single-chip path's. Writes MULTICHIP_TPU.json.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _stamp import stamped  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_scene, _frame_cost_paired, _measure_burst
from tpurt.dist.sharding import make_mesh, render_frame_sharded
from tpurt.passes.gtao import gtao_constants
from tpurt.utils.health import guarded_measure, probe_ms


def log(m):
    print(m, file=sys.stderr, flush=True)


def sharded_burst(r, mesh, frames):
    c = r.config
    cam = r._cached("camera", r.camera.uniform())
    lights = r._cached("lights", r.lights.shader_arrays())
    consts = gtao_constants(c.width, c.height, r.camera.znear, r.camera.zfar,
                            r.camera.fovy, r.camera.aspect)
    scene = r.scene_device
    tables = r._pallas_tables()
    gtao = r._effective_gtao()

    @jax.jit
    def burst(scene, cam, lights, consts, lpm):
        def body(acc, i):
            out = render_frame_sharded(
                scene, cam, lights, consts, lpm, i % 64,
                width=c.width, height=c.height, gtao_settings=gtao,
                mesh=mesh, pallas_tables=tables)
            return acc + jnp.sum(out["image"], dtype=jnp.uint32), None

        acc, _ = jax.lax.scan(body, jnp.uint32(0),
                              jnp.arange(frames, dtype=jnp.int32))
        return acc

    assert int(burst(scene, cam, lights, consts, r._lpm_derived)) > 0
    t0 = time.perf_counter()
    chk = int(burst(scene, cam, lights, consts, r._lpm_derived))
    el = (time.perf_counter() - t0) * 1000.0 / frames
    assert chk > 0
    return el


def main():
    log(f"probe: {probe_ms():.1f} ms")
    r = build_scene()
    mesh = make_mesh(1)
    log(f"mesh: {mesh} tier: {r._pallas_tables()}")

    log("compiling sharded burst (8/24 frames)...")
    sharded_burst(r, mesh, 8)
    sharded_burst(r, mesh, 24)

    def paired():
        t8 = sharded_burst(r, mesh, 8) * 8
        t24 = sharded_burst(r, mesh, 24) * 24
        return (t24 - t8) / 16

    sh = guarded_measure(paired, samples=2, budget_s=420.0, log=log)
    log(f"sharded(1-chip) frame: {sh.value:.3f} ms")

    log("single-chip reference (paired)...")
    _measure_burst(r, frames=8)
    _measure_burst(r, frames=32)
    single = guarded_measure(lambda: _frame_cost_paired(r),
                             samples=2, budget_s=300.0, log=log)
    log(f"single-chip frame: {single.value:.3f} ms")

    report = dict(
        ok=True,
        sharded_1chip_ms=round(sh.value, 3),
        single_chip_ms=round(single.value, 3),
        overhead_pct=round((sh.value / single.value - 1.0) * 100.0, 2),
        tracer_tier=r._pallas_tables(),
        device=str(jax.devices()[0]),
        health=dict(sharded=sh.asdict(), single=single.asdict()),
        note="render_frame_sharded (shard_map + BVH8 Pallas tracer + "
             "all_gather GTAO) compiled and run on real Mosaic with a "
             "1-device mesh; paired device-scan timing (RPC floor "
             "cancelled)")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MULTICHIP_TPU.json")
    with open(out, "w") as f:
        json.dump(stamped(report), f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
