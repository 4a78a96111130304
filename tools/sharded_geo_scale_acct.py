"""Sharded-geometry HBM accounting AT SCALE (host-side, no TPU).

SHARDED_GEO_TPU.json's ceiling_ratio (4.23 at 8 shards) is measured on
the 18.4 MB bench scene, where the partially-replicated BVH8 upper
levels bound the ratio. The mode exists for scenes that do NOT fit one
chip — this tool runs the same `hbm_accounting` (dist/geometry.py) on
the 292k-tri / 144-texture stress workload (tools/textures_bench.py's
scene) at 8/16/64 shards, on CPU: the accounting is pure byte
arithmetic over the real flatten + shard split, so no device is needed.
Writes SHARDED_GEO_SCALE.json.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = ""
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _stamp import stamped  # noqa: E402

import numpy as np  # noqa: E402

from tpurt.dist.geometry import (hbm_accounting, shard_geometry,  # noqa: E402
                                 shard_tables)
from tpurt.engine import Renderer, RendererConfig  # noqa: E402
from tpurt.passes.gtao import GtaoSettings  # noqa: E402
from tpurt.scene.lights import DirectionalLight, SpotLight  # noqa: E402
from tpurt.scene.procedural import ground_plane, material_field  # noqa: E402


def main():
    cfg = RendererConfig(width=800, height=800,
                         gtao=GtaoSettings(9, 3, denoise=1), mipmaps=True)
    r = Renderer(cfg)
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
    # flatten (the "upload" lands on the CPU backend — the accounting
    # reads the same pytree byte-for-byte)
    r.prepare_first_frame()
    host_scene = r.scene.as_pytree()

    out = dict(
        workload="292k tris / 144 prims / 113 MB source textures, "
                 "mip chains (textures_bench scene)",
        tris=int(r.scene.geom["v0"].shape[0]),
        shipped_total_mb=round(sum(
            int(np.asarray(v).nbytes) for v in jax.tree.leaves(host_scene))
            / 1e6, 2),
        accounting={})
    for n in (8, 16, 64):
        acct = hbm_accounting(host_scene,
                              shard_geometry(host_scene, n, tables="bvh8"),
                              shard_tables(host_scene, n)[0], n)
        out["accounting"][f"shards{n}"] = acct
        print(f"{n} shards: replicated {acct['replicated_total'] / 1e6:.1f} "
              f"MB -> per-chip {acct['sharded_total'] / 1e6:.2f} MB, "
              f"ceiling_ratio {acct['ceiling_ratio']:.2f}",
              file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SHARDED_GEO_SCALE.json")
    with open(path, "w") as f:
        json.dump(stamped(out), f, indent=1)
    print(json.dumps({k: v["ceiling_ratio"]
                      for k, v in out["accounting"].items()}))


if __name__ == "__main__":
    main()
