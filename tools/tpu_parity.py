"""TPU-executed numerical parity check of the Pallas packet kernels.

Round-1 gap (VERDICT): the packet tracer was only ever validated in
interpret mode on CPU; real Mosaic behavior (i1 carries, DMA semantics) is
exactly where bugs appeared. This script runs closest-hit + any-hit packet
traces with REAL Mosaic kernels on the TPU for every table tier and
compares bit-level against the XLA tracer on the same chip, then writes
TPU_PARITY.json.

Run: python tools/tpu_parity.py   (serialize with other TPU jobs)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _stamp import stamped  # noqa: E402
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpurt.bvh import build_bvh_sah
    from tpurt.bvh.flat import tri_aabbs
    from tpurt.kernels.traverse import (make_traversal_geom, trace_any,
                                        trace_closest)
    from tpurt.kernels.traverse_pallas import (trace_any_packets,
                                               trace_closest_packets)
    from tpurt.scene.camera import Camera

    rng = np.random.default_rng(42)
    report = dict(device=str(jax.devices()[0]), cases=[])
    ok_all = True

    for tables, n_tris in [("smem", 300), ("vmem", 3000), ("hbm", 20000),
                           ("bvh8", 20000)]:
        # random triangle soup in front of the camera
        c = rng.uniform(-4, 4, (n_tris, 3)).astype(np.float32)
        c[:, 2] = rng.uniform(1.0, 12.0, n_tris)
        e1 = rng.uniform(-0.6, 0.6, (n_tris, 3)).astype(np.float32)
        e2 = rng.uniform(-0.6, 0.6, (n_tris, 3)).astype(np.float32)
        v0, v1, v2 = c, c + e1, c + e2
        amin, amax = tri_aabbs(v0, v1, v2)
        bvh = build_bvh_sah(amin, amax)
        geom = make_traversal_geom(v0, v1, v2, bvh.tri_order)
        tree = jax.tree.map(jnp.asarray, bvh.as_pytree())
        if tables == "bvh8":
            from tpurt.bvh.wide import collapse8

            nodes8, _ = collapse8(bvh.as_pytree())
            tree = dict(tree, nodes8=jnp.asarray(nodes8))
        geom = jax.tree.map(jnp.asarray, geom)

        cam = Camera(aspect=1.0)
        cam.set_pos([0.0, 0.0, -2.0])
        cam.set_dir([0.0, 0.0, 1.0])
        H = W = 128
        from tpurt.passes.rays import camera_rays

        o, d = camera_rays(cam.uniform(), W, H)

        ref = trace_closest(tree, geom, o, d, 1e-3, 1e4, max_leaf=4)
        got = trace_closest_packets(tree, geom, o, d, 1e-3, 1e4, height=H,
                                    width=W, max_leaf=4, interpret=False,
                                    tables=tables)
        tri_eq = bool((np.asarray(got["tri"]) == np.asarray(ref["tri"])).all())
        hit = np.asarray(ref["tri"]) >= 0
        t_err = float(np.abs(np.asarray(got["t"])[hit]
                             - np.asarray(ref["t"])[hit]).max()) if hit.any() else 0.0

        occ_ref = np.asarray(trace_any(tree, geom, o, d, 1e-3, 1e4,
                                       max_leaf=4))
        occ_got = np.asarray(trace_any_packets(tree, geom, o, d, 1e-3, 1e4,
                                               height=H, width=W, max_leaf=4,
                                               interpret=False, tables=tables))
        occ_eq = bool((occ_ref == occ_got).all())

        case = dict(tables=tables, tris=n_tris, rays=H * W,
                    hit_frac=round(float(hit.mean()), 4),
                    closest_tri_exact=tri_eq, closest_t_max_err=t_err,
                    any_hit_exact=occ_eq)
        ok = tri_eq and occ_eq and t_err < 1e-4
        ok_all = ok_all and ok
        case["ok"] = ok
        report["cases"].append(case)
        print(json.dumps(case), file=sys.stderr, flush=True)

    report["ok"] = ok_all
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TPU_PARITY.json")
    with open(path, "w") as f:
        json.dump(stamped(report), f, indent=1)
    print(json.dumps(report))
    if not ok_all:
        sys.exit(1)


if __name__ == "__main__":
    main()
