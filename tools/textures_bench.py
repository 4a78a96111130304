"""Texture/scene scale stress (VERDICT r2 #5): the 256-slot bindless
analogue at the reference asset's real size — >=150 MB of distinct source
textures across >=128 primitives, ~300k tris, mip chains on, driven
through the quad/mip atlas path as jit ARGUMENTS (the >50 MB closure
constant cliff is a remote-compile HTTP 413). Writes BENCH_TEXTURES.json.
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

from bench import _device_sanity, _frame_cost_paired, _measure_burst
from tpurt.engine import Renderer, RendererConfig
from tpurt.passes.gtao import GtaoSettings
from tpurt.scene.lights import DirectionalLight, SpotLight
from tpurt.scene.procedural import ground_plane, material_field
from tpurt.utils.health import guarded_measure, probe_ms


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"probe: {probe_ms():.1f} ms")
    cfg = RendererConfig(width=800, height=800,
                         gtao=GtaoSettings(9, 3, denoise=1), mipmaps=True)
    r = Renderer(cfg)
    # 12x12 = 144 primitives, 256px textures: 144*3*256^2*4 = 113 MB of
    # payload texels + per-prim ORM/normal variation; subdiv 13 -> 292k tris
    t0 = time.perf_counter()
    r.models.append(material_field(nx=12, nz=12, subdiv=13, spacing=1.0,
                                   extents=(256,)))
    r.models.append(ground_plane())
    r.camera_mut().set_pos([0.0, -3.5, -9.0])
    d = np.array([0.0, 0.3, 1.0])
    r.camera_mut().set_dir(d / np.linalg.norm(d))
    r.lights_mut().directional_lights.append(DirectionalLight(
        dir=np.array([0.35, 0.85, 0.4]) / np.linalg.norm([0.35, 0.85, 0.4]),
        color=[1.4, 1.3, 1.1], casts_shadows=True))
    r.lights_mut().spot_lights.append(SpotLight(
        pos=[0.0, -5.0, 0.0], dir=[0.0, 1.0, 0.0],
        color=np.array([1.36, 0.16, 2.22]) * 10.0, falloff_distance=14.0,
        penumbra_umbra_angles=(np.radians(30), np.radians(45)),
        casts_shadows=True))
    t_build = time.perf_counter()
    r.prepare_first_frame()   # flatten + upload to HBM
    t_flatten = time.perf_counter()
    log(f"build {t_build - t0:.1f}s, flatten+upload {t_flatten - t_build:.1f}s")

    sc = r.scene
    src_mb = sum(int(np.prod(np.asarray(a).shape)) for a in (
        sc.tex_stack,)) / 1e6
    # DEVICE residency = what as_pytree actually ships (round 3 counted
    # every host-side table and reported a 16x amplification; most of it
    # was never uploaded or was dead weight — now exactly one texel tier
    # ships, block4 above the quad budget)
    pt = sc.as_pytree()
    tex_keys = [k for k in pt if k.startswith("tex")]
    shipped = {k: int(np.asarray(pt[k]).nbytes) for k in tex_keys}
    table_mb = sum(shipped.values()) / 1e6
    host_mb = sum(
        int(np.asarray(getattr(sc, k)).nbytes)
        for k in ("tex_stack", "tex_atlas", "tex_mip_quad", "tex_quad48",
                  "tex_stack12", "tex_mip_block4", "tex_mip_pair")
        if getattr(sc, k) is not None) / 1e6
    tier = ("block4" if sc.tex_mip_block4 is not None
            else "pair" if sc.tex_mip_pair is not None
            else "quad" if sc.tex_mip_quad is not None else "atlas")
    log(f"texture source {src_mb:.0f} MB, shipped device tables "
        f"{table_mb:.0f} MB (tier {tier}; host-side staging {host_mb:.0f}), "
        f"prims {sc.num_prims}, "
        f"tris {sc.geom['v0'].shape[0]}, tracer {r._pallas_tables()}")

    log("warmup (compile)...")
    out = r.render(block=True)
    checksum, _ = _device_sanity(out["image"])
    assert checksum > 0
    _measure_burst(r, frames=8)
    _measure_burst(r, frames=24)
    res = guarded_measure(lambda: _frame_cost_paired(r, lo=8, hi=24),
                          samples=2, budget_s=420.0, log=log)
    rays = 800 * 800 * 3
    report = dict(
        metric="ms/frame, 144-slot 113MB-texture 292k-tri workload, "
               "800x800 ULTRA, mip chains, tier=" + tier,
        value=round(res.value, 3), unit="ms",
        mrays_per_s=round(rays / res.value / 1e3, 2),
        tris=int(sc.geom["v0"].shape[0]), primitives=sc.num_prims,
        texture_source_mb=round(src_mb, 1),
        texture_device_tables_mb=round(table_mb, 1),
        texture_host_staging_mb=round(host_mb, 1),
        texture_tier=tier,
        device_tables_x_source=round(table_mb / src_mb, 2),
        mip_levels=int(sc.tex_mip_sizes.shape[1]),
        flatten_upload_s=round(t_flatten - t_build, 2),
        tracer_tier=r._pallas_tables(),
        device=str(jax.devices()[0]),
        health=res.asdict(),
        timing="paired device-scan bursts (RPC floor cancelled); scene "
               "tables passed as jit arguments (no closure constants)")
    out_p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_TEXTURES.json")
    with open(out_p, "w") as f:
        json.dump(stamped(report), f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
