"""Measure BVH8 traversal step counts and derive the per-step budget.

Closes VERDICT round-2 item 10 (quantized-node compression) with data:
compression helps only if node-row DMA latency is exposed on the
critical path. This probe counts node/leaf pops per packet at the bench
workload and divides the measured trace time by them. If the per-step
cost matches the VPU work estimate (8 slab tests ~0.2 us / 16 MT tests
~0.5 us), the speculative double-fetch is already hiding the DMA and
halving node bytes cannot help; if it is several us, latency is exposed
and compression is worth building.

Writes BVH8_STEPS.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

REPS = 16
W = H = 800


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from tpurt.kernels.traverse_bvh8 import trace_closest_bvh8
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays

    r = build_scene(W, H)
    cam = r._cached("camera", r.camera.uniform())
    scene = r.scene_device

    o, d = camera_rays(cam, W, H)
    hits = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                              T_MIN, T_MAX, height=H, width=W,
                              count_steps=True)
    # u/v carry per-packet node/leaf pop counts (replicated across the
    # packet's 1024 lanes); _from_packets returns image order, so sample
    # one pixel per 32x32 tile
    np_img = np.asarray(hits["u"]).reshape(H, W)
    lp_img = np.asarray(hits["v"]).reshape(H, W)
    node_pops = np_img.reshape(H // 32, 32, W // 32, 32)[:, 0, :, 0].ravel()
    leaf_pops = lp_img.reshape(H // 32, 32, W // 32, 32)[:, 0, :, 0].ravel()

    jits = jnp.linspace(-0.25, 0.25, REPS).reshape(REPS, 1) \
        * jnp.ones((1, 2), jnp.float32)

    def stage(fn):
        @jax.jit
        def run(scene, cam):
            def body(acc, jit):
                return acc + fn(scene, cam, jit), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jits)
            return acc

        float(run(scene, cam))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(scene, cam))
            best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
        return best

    def null_fn(scene, cam, jit):
        return jnp.sum(jit)

    def trace_fn(scene, cam, jit):
        o, d = camera_rays(cam, W, H, jitter=jit)
        hh = trace_closest_bvh8(scene["bvh"], scene["geom"], o, d,
                                T_MIN, T_MAX, height=H, width=W)
        return jnp.sum(jnp.where(jnp.isfinite(hh["t"]), hh["t"], 0.0))

    null_ms = stage(null_fn)
    trace_ms = stage(trace_fn) - null_ms
    from tpurt.kernels.traverse_bvh8 import FAT_DEFAULT
    tiles = (H // 32) * (W // 32)
    # count_steps counters are SHARED across a fat packet's merged tiles
    # (replicated per tile) — real packet/step totals divide by fat
    packets = tiles // FAT_DEFAULT
    total_steps = float(node_pops.sum() + leaf_pops.sum()) / FAT_DEFAULT
    report = dict(
        device=str(jax.devices()[0]), resolution=f"{W}x{H}",
        tris=int(scene["geom"]["v0"].shape[0]), packets=packets,
        fat=FAT_DEFAULT, total_steps=int(total_steps),
        node_pops=dict(mean=float(node_pops.mean()),
                       p50=float(np.percentile(node_pops, 50)),
                       p95=float(np.percentile(node_pops, 95)),
                       max=float(node_pops.max())),
        leaf_pops=dict(mean=float(leaf_pops.mean()),
                       p50=float(np.percentile(leaf_pops, 50)),
                       p95=float(np.percentile(leaf_pops, 95)),
                       max=float(leaf_pops.max())),
        trace_ms=round(trace_ms, 3),
        us_per_packet=round(trace_ms * 1000.0 / packets, 3),
        ns_per_step=round(trace_ms * 1e6 / total_steps, 1),
        note="per-step cost vs VPU estimate decides whether node "
             "compression (VERDICT item 10) can help; DMA latency is "
             "exposed only if ns_per_step >> slab/MT VPU work")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BVH8_STEPS.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
