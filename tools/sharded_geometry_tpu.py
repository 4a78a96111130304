"""Run the sharded-GEOMETRY flagship tier on real Mosaic (VERDICT r3 #3).

One physical chip: compiles + runs render_frame_sharded_geometry
(tables="bvh8" — BVH8 packet ring, fused multi-light shadow tour,
ring-gathered attribute/texture rows) over a 1-device mesh on the real
TPU, asserts the image matches the single-chip BVH8 frame EXACTLY, and
records the paired device-scan frame cost + the per-chip HBM accounting
at 8 shards. Writes SHARDED_GEO_TPU.json.
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
from tpurt.dist.geometry import (freeze_meta, hbm_accounting,
                                 render_frame_sharded_geometry,
                                 shard_geometry, shard_tables)
from tpurt.dist.sharding import make_mesh
from tpurt.passes.gtao import gtao_constants
from tpurt.utils.health import guarded_measure, probe_ms


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"probe: {probe_ms():.1f} ms")
    r = build_scene()
    c = r.config
    mesh = make_mesh(1)
    cam = r._cached("camera", r.camera.uniform())
    lights = r._cached("lights", r.lights.shader_arrays())
    consts = gtao_constants(c.width, c.height, r.camera.znear, r.camera.zfar,
                            r.camera.fovy, r.camera.aspect)
    scene = r.scene_device
    host_scene = r.scene.as_pytree()
    shards = shard_geometry(host_scene, 1, tables="bvh8")
    tbl, meta = shard_tables(host_scene, 1)
    fmeta = freeze_meta(meta)
    gtao = r._effective_gtao()

    shards_d = jax.tree.map(jnp.asarray, shards)
    tbl_d = jax.tree.map(jnp.asarray, tbl)

    def one_frame(noise):
        return render_frame_sharded_geometry(
            scene, shards_d, cam, lights, consts, r._lpm_derived, noise,
            width=c.width, height=c.height, gtao_settings=gtao, mesh=mesh,
            tables="bvh8", shade_tables=tbl_d, meta=fmeta)

    log("compiling geometry-ring frame...")
    ring_img = np.asarray(one_frame(np.int32(0))["image"])
    single_img = np.asarray(r.render()["image"])
    exact = bool((ring_img == single_img).all())
    log(f"parity vs single-chip: exact={exact}")

    def burst_fn(frames):
        @jax.jit
        def burst(scene, shards_d, tbl_d, cam, lights, consts, lpm):
            def body(acc, i):
                out = render_frame_sharded_geometry(
                    scene, shards_d, cam, lights, consts, lpm, i % 64,
                    width=c.width, height=c.height, gtao_settings=gtao,
                    mesh=mesh, tables="bvh8", shade_tables=tbl_d,
                    meta=fmeta)
                return acc + jnp.sum(out["image"], dtype=jnp.uint32), None

            acc, _ = jax.lax.scan(body, jnp.uint32(0),
                                  jnp.arange(frames, dtype=jnp.int32))
            return acc

        assert int(burst(scene, shards_d, tbl_d, cam, lights, consts,
                         r._lpm_derived)) > 0
        t0 = time.perf_counter()
        chk = int(burst(scene, shards_d, tbl_d, cam, lights, consts,
                        r._lpm_derived))
        el = (time.perf_counter() - t0) * 1000.0 / frames
        assert chk > 0
        return el

    log("compiling bursts (8/24 frames)...")
    burst_fn(8)
    burst_fn(24)

    def paired():
        t8 = burst_fn(8) * 8
        t24 = burst_fn(24) * 24
        return (t24 - t8) / 16

    ring = guarded_measure(paired, samples=2, budget_s=420.0, log=log)
    log(f"geometry-ring(1-chip) frame: {ring.value:.3f} ms")

    log("single-chip reference (paired)...")
    _measure_burst(r, frames=8)
    _measure_burst(r, frames=32)
    single = guarded_measure(lambda: _frame_cost_paired(r),
                             samples=2, budget_s=300.0, log=log)
    log(f"single-chip frame: {single.value:.3f} ms")

    acct8 = hbm_accounting(host_scene, shard_geometry(host_scene, 8,
                                                      tables="bvh8"),
                           shard_tables(host_scene, 8)[0], 8)
    report = dict(
        ok=True,
        image_exact_vs_single_chip=exact,
        geometry_ring_1chip_ms=round(ring.value, 3),
        single_chip_ms=round(single.value, 3),
        overhead_pct=round((ring.value / single.value - 1.0) * 100.0, 2),
        tracer_tier="bvh8 ring",
        device=str(jax.devices()[0]),
        hbm_accounting_8_shards=acct8,
        health=dict(ring=ring.asdict(), single=single.asdict()),
        note="render_frame_sharded_geometry tables='bvh8' (BVH8 packet "
             "ring + fused multi-light shadow tour + ring-gathered "
             "attr/texture rows) compiled and run on real Mosaic with a "
             "1-device mesh; paired device-scan timing (RPC floor "
             "cancelled); image asserted against the single-chip frame")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SHARDED_GEO_TPU.json")
    with open(out, "w") as f:
        json.dump(stamped(report), f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
