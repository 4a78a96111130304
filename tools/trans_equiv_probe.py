"""Do XLA and Mosaic lower cos/sin/pow/mod identically on this TPU?

Gate probe for the GTAO noise-periodic hoist: the slice/step scaffold
quantities that depend only on the 64x64 noise maps (cos_phi, sin_phi,
the pow() of the sample-distribution curve) can be precomputed once per
noise quadrant OUTSIDE the kernel and selected per tile via the window
BlockSpec index_map — but only if the outside (XLA) evaluation of those
transcendentals is bit-identical to what Mosaic would have computed
in-kernel. This probe evaluates the exact expressions of
kernels/gtao_main_pallas._kernel's slice_body/step_coords on noise-like
inputs through both lowerings and counts bit mismatches.

Writes TRANS_EQUIV_PROBE.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

PI = 3.1415926535897932384626433832795
SLICES = 9
STEPS = 3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpurt.utils.health import probe_ms

    h = probe_ms()
    print(f"probe: tunnel {h:.1f} ms", file=sys.stderr)

    rng = np.random.default_rng(7)
    # noise-like inputs: uniform [0,1) f32 like the Hilbert/R2 maps
    noise = rng.random((64, 128), dtype=np.float32)
    nsl = jnp.asarray(noise[:32])
    nsm = jnp.asarray(noise[32:])
    sdp = jnp.float32(2.0)   # sample_distribution_power (traced, as in consts)

    def derive(cos, sin, power, mod):
        """The exact noise-only expressions from _kernel.slice_body."""
        outs = []
        for s in range(SLICES):
            sf = jnp.float32(s)
            slice_k = (sf + nsl) / float(SLICES)
            phi = slice_k * PI
            outs.append(cos(phi))
            outs.append(sin(phi))
            for st in range(STEPS):
                stf = jnp.float32(st)
                step_base_noise = ((sf + stf * float(STEPS))
                                   * 0.6180339887498948482)
                step_noise = mod(nsm + step_base_noise, 1.0)
                s0 = (stf + step_noise) / float(STEPS)
                outs.append(power(s0, sdp))
        return jnp.stack(outs)

    @jax.jit
    def xla_side(sdp):
        return derive(jnp.cos, jnp.sin, jnp.power, jnp.mod)

    def kernel(sdp_ref, nsl_ref, nsm_ref, out_ref):
        # recompute inside Mosaic with ref-resident inputs
        nsl_k = nsl_ref[:]
        nsm_k = nsm_ref[:]
        sdp_k = sdp_ref[0]
        i = 0
        for s in range(SLICES):
            sf = jnp.float32(s)
            slice_k = (sf + nsl_k) / float(SLICES)
            phi = slice_k * PI
            out_ref[i] = jnp.cos(phi)
            out_ref[i + 1] = jnp.sin(phi)
            i += 2
            for st in range(STEPS):
                stf = jnp.float32(st)
                step_base_noise = ((sf + stf * float(STEPS))
                                   * 0.6180339887498948482)
                step_noise = jnp.mod(nsm_k + step_base_noise, 1.0)
                s0 = (stf + step_noise) / float(STEPS)
                out_ref[i] = jnp.power(s0, sdp_k)
                i += 1

    n_out = SLICES * (2 + STEPS)

    @jax.jit
    def mosaic_side(sdp):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((32, 128), lambda i, *r: (0, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((n_out, 32, 128),
                                   lambda i, *r: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_out, 32, 128), jnp.float32),
        )(sdp.reshape(1), nsl, nsm)

    a = np.asarray(jax.block_until_ready(xla_side(sdp)))
    b = np.asarray(jax.block_until_ready(mosaic_side(sdp)))
    bits_a = a.view(np.int32)
    bits_b = b.view(np.int32)
    mism = bits_a != bits_b

    # per-op breakdown: rows 0,1 of each slice block = cos,sin; rest = pow
    per_op = {"cos": 0, "sin": 0, "pow": 0}
    tot = {"cos": 0, "sin": 0, "pow": 0}
    i = 0
    for s in range(SLICES):
        per_op["cos"] += int(mism[i].sum()); tot["cos"] += mism[i].size
        per_op["sin"] += int(mism[i + 1].sum()); tot["sin"] += mism[i + 1].size
        i += 2
        for st in range(STEPS):
            per_op["pow"] += int(mism[i].sum()); tot["pow"] += mism[i].size
            i += 1

    ulp = np.abs(bits_a - bits_b)
    out = {
        "device": jax.devices()[0].device_kind,
        "elements_per_op": {k: tot[k] for k in tot},
        "bit_mismatches": per_op,
        "max_ulp_diff": int(ulp.max()),
        "identical": bool(not mism.any()),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TRANS_EQUIV_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
