"""TPU measurement: fused Pallas denoise chain vs the XLA denoise chain.

Runs both at 1080p and 800x800 for denoise levels 1 and 3 (1 and 3 passes)
with Mosaic compiled for real; checks parity on-chip and times steady-state
(device-side lax.scan of 32 chain invocations to amortize the tunnel RPC).
Writes GTAO_PALLAS_BENCH.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

REPS = 32


def main():
    import jax
    import jax.numpy as jnp

    from tpurt.kernels.gtao_pallas import denoise_chain_pallas
    from tpurt.passes.gtao import GtaoSettings, denoise_pass

    report = dict(device=str(jax.devices()[0]), reps=REPS, cases=[])
    for (h, w) in [(800, 800), (1080, 1920)]:
        rng = np.random.default_rng(5)
        ao = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
        edges = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
        for denoise in (1, 3):
            s = GtaoSettings(1, 2, denoise=denoise)
            n = s.num_denoise_passes

            def xla_chain(a):
                out = a
                for i in range(n):
                    out = denoise_pass(out, edges, s,
                                       final_apply=(i == n - 1))
                return out

            def pallas_chain(a):
                return denoise_chain_pallas(
                    a, edges, n_passes=n, blur_beta=s.denoise_blur_beta)

            def scan_of(fn):
                @jax.jit
                def run(a):
                    def body(carry, _):
                        out = fn(carry)
                        return out, None
                    out, _ = jax.lax.scan(body, a, None, length=REPS)
                    return out
                return run

            results = {}
            timings = {}
            for name, fn in (("xla", xla_chain), ("pallas", pallas_chain)):
                run = scan_of(fn)
                out = run(ao)
                out.block_until_ready()  # compile
                t0 = time.perf_counter()
                out = run(ao)
                out.block_until_ready()
                timings[name] = (time.perf_counter() - t0) * 1000.0 / REPS
                results[name] = np.asarray(jnp.sum(out.astype(jnp.uint32)))

            # on-chip parity of a single chain application
            one_x = np.asarray(xla_chain(ao)).astype(int)
            one_p = np.asarray(pallas_chain(ao)).astype(int)
            d = np.abs(one_x - one_p)
            case = dict(shape=f"{w}x{h}", passes=n,
                        xla_ms=round(timings["xla"], 4),
                        pallas_ms=round(timings["pallas"], 4),
                        speedup=round(timings["xla"] / timings["pallas"], 3),
                        max_u8_diff=int(d.max()),
                        diff_frac=round(float((d > 0).mean()), 6))
            report["cases"].append(case)
            print(json.dumps(case), file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GTAO_PALLAS_BENCH.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
