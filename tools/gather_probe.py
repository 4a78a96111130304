"""Probe XLA TPU row-gather cost vs table layout/dtype/width.

The shade pass spends ~39 ms at 800x800 on two row gathers (tri_attr
(43k, 39) f32 and tex_quad48 (P,H,W,48) u8 ~ (4.2M, 48) flat). This tool
times isolated gathers of N=640k rows under several layouts to find the
fast path. Device-scan timing (CLAUDE.md: host-timed loops only measure
dispatch on the tunneled backend).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _stamp import stamped  # noqa: E402
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPS = 16
N = 800 * 800          # rays
T = 43274              # triangle-table rows
Q = 64 * 256 * 256     # quad-table rows (36 prims x 256^2 rounded up)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    # coherent-ish indices: sorted blocks of 32 (ray packets hit nearby
    # tris), a stand-in between fully random and fully sorted
    idx_t = np.sort(rng.integers(0, T, N).astype(np.int32)
                    .reshape(-1, 32), axis=1).reshape(-1)
    idx_q = np.sort(rng.integers(0, Q, N).astype(np.int32)
                    .reshape(-1, 32), axis=1).reshape(-1)
    idx_t = jnp.asarray(idx_t)
    idx_q = jnp.asarray(idx_q)

    def table(rows, width, dtype):
        return jnp.asarray(rng.standard_normal((rows, width)).astype(np.float32)
                           if dtype == np.float32 else
                           rng.integers(0, 255, (rows, width)).astype(dtype))

    cases = {}

    def add(name, tab, idx):
        cases[name] = (tab, idx)

    add("tri_f32_w39", table(T, 39, np.float32), idx_t)
    add("tri_f32_w40", table(T, 40, np.float32), idx_t)
    add("tri_f32_w64", table(T, 64, np.float32), idx_t)
    add("tri_f32_w128", table(T, 128, np.float32), idx_t)
    add("tri_bf16_w40", table(T, 40, np.float32).astype(jnp.bfloat16), idx_t)
    add("tri_bf16_w128", table(T, 128, np.float32).astype(jnp.bfloat16), idx_t)
    add("quad_u8_w48", table(Q, 48, np.uint8), idx_q)
    add("quad_u8_w64", table(Q, 64, np.uint8), idx_q)
    add("quad_i32_w12", table(Q, 12, np.int32), idx_q)
    add("quad_i32_w16", table(Q, 16, np.int32), idx_q)
    # disentangle dtype vs table size: GATHER_PROBE r2 compared f32 on the
    # SMALL tri table vs u8/i32 on the BIG quad table. quad_f32_w16 is the
    # tex_quad48 bit-view case (same 64 B rows as quad_u8_w64, f32 dtype);
    # tri_u8_w64 is the u8 control on the small table.
    add("quad_f32_w16", table(Q, 16, np.float32), idx_q)
    add("tri_u8_w64", table(T, 64, np.uint8), idx_t)
    # random (incoherent) variant of the winner candidates
    ridx_t = jnp.asarray(rng.integers(0, T, N).astype(np.int32))
    add("tri_f32_w39_rand", cases["tri_f32_w39"][0], ridx_t)

    out = {}
    for name, (tab, idx) in cases.items():
        @jax.jit
        def run(tab, idx):
            def body(acc, k):
                # vary the index stream per step so the gather re-runs
                g = jnp.take(tab, (idx + k) % tab.shape[0], axis=0)
                return acc + jnp.sum(g.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(REPS, dtype=jnp.int32))
            return acc

        float(run(tab, idx))
        t0 = time.perf_counter()
        float(run(tab, idx))
        ms = (time.perf_counter() - t0) * 1000 / REPS
        out[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", file=sys.stderr, flush=True)

    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "GATHER_PROBE.json"), "w") as f:
        json.dump(stamped(out), f, indent=1)


if __name__ == "__main__":
    main()
