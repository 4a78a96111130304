"""Probe the depth-prefilter's 2x2 decimation strategies at 1080p.

prefilter_depths costs 4.96 ms at 1080p (GTAO_SCENE_BENCH.json) for what
is ~0.04 ms of math — the stride-2 LANE slices (q[:, 0, :, 0] etc.) are
relayouts. Candidates, all bit-exact:

  slices   current: reshape (h2,2,w2,2) + four strided slices
  matmul   even/odd COLUMN split via one-hot f32 matmul (HIGHEST) +
           cheap sublane-stride row split
  rows     row split first (sublane stride), then column split strided

Writes PREFILTER_PROBE.json.
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
H, W = 1080, 1920


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpurt.passes.gtao import gtao_constants, prefilter_depths

    consts = gtao_constants(W, H, 0.1, 100.0, np.pi / 2, W / H)
    rng = np.random.default_rng(5)
    depth = jnp.asarray(rng.uniform(0.5, 20.0, (H, W)), jnp.float32)

    def split_cols_matmul(x):
        # (h, w) -> even (h, w/2), odd (h, w/2) via one-hot column-select
        # matmuls (f32 HIGHEST = exact copy)
        h, w = x.shape
        sel = np.zeros((w, w), np.float32)
        sel[np.arange(0, w, 2), np.arange(w // 2)] = 1.0
        sel[np.arange(1, w, 2), np.arange(w // 2, w)] = 1.0
        both = lax.dot_general(x, jnp.asarray(sel), (((1,), (0,)), ((), ())),
                               precision=lax.Precision.HIGHEST)
        return both[:, :w // 2], both[:, w // 2:]

    def variant_slices(x):
        h2, w2 = x.shape[0] // 2, x.shape[1] // 2
        q = x[:h2 * 2, :w2 * 2].reshape(h2, 2, w2, 2)
        return q[:, 0, :, 0], q[:, 0, :, 1], q[:, 1, :, 0], q[:, 1, :, 1]

    def variant_matmul(x):
        h2, w2 = x.shape[0] // 2, x.shape[1] // 2
        x = x[:h2 * 2, :w2 * 2]
        top = x[0::2]            # sublane stride (rows)
        bot = x[1::2]
        a, b = split_cols_matmul(top)
        c, d = split_cols_matmul(bot)
        return a, b, c, d

    def variant_rows(x):
        h2, w2 = x.shape[0] // 2, x.shape[1] // 2
        x = x[:h2 * 2, :w2 * 2]
        top = x[0::2]
        bot = x[1::2]
        return top[:, 0::2], top[:, 1::2], bot[:, 0::2], bot[:, 1::2]

    # parity
    ref = [np.asarray(v) for v in variant_slices(depth)]
    for name, fn in [("matmul", variant_matmul), ("rows", variant_rows)]:
        got = [np.asarray(v) for v in fn(depth)]
        assert all((a == b).all() for a, b in zip(ref, got)), name
    print("parity ok", file=sys.stderr)

    def chain(split_fn):
        # the full 5-level pyramid using split_fn for the 2x2 grouping,
        # reusing the real mip filter for the math
        from tpurt.passes.encodings import quantize_r16f
        from tpurt.passes.gtao import _depth_mip_filter

        def fn(ni):
            d = jnp.clip(depth + ni.astype(jnp.float32) * 1e-7, 0.0, 65504.0)
            mips = [quantize_r16f(d)]
            for _ in range(4):
                a, b, c, dd = split_fn(mips[-1])
                mips.append(quantize_r16f(
                    _depth_mip_filter(a, b, c, dd, consts)))
            return sum(jnp.sum(m) for m in mips)
        return fn

    def null_fn(ni):
        return jnp.sum(ni.astype(jnp.float32))

    out = {}
    null_ms = 0.0
    stages = [("null", null_fn), ("current", None),
              ("slices", chain(variant_slices)),
              ("matmul", chain(variant_matmul)),
              ("rows", chain(variant_rows))]
    for name, fn in stages:
        if name == "current":
            def fn(ni):
                mips = prefilter_depths(
                    depth + ni.astype(jnp.float32) * 1e-7, consts)
                return sum(jnp.sum(m) for m in mips)

        @jax.jit
        def run(fn=fn):
            def body(acc, ni):
                return acc + fn(ni), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(REPS, dtype=jnp.int32))
            return acc

        float(run())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run())
            best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
        if name == "null":
            null_ms = best
            continue
        out[name] = round(best - null_ms, 3)
        print(f"{name}: {out[name]:.3f} ms", file=sys.stderr, flush=True)

    report = dict(device=str(jax.devices()[0]), reps=REPS,
                  resolution=f"{W}x{H}", ms=out,
                  null_floor_ms=round(null_ms, 3))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PREFILTER_PROBE.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
