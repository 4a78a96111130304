"""Probe two shade-pass hypotheses on the real TPU (round-3 perf work,
VERDICT r2 #2a: shade is ~30 ms of the 800x800 frame / ~100 ms at 1080p).

A) Elementwise layout: shade.py works on (N, 3) vectors. On TPU the minor
   dim maps to the 128-lane axis, so (N, 3) ops use 3/128 lanes. The SoA
   variant carries x/y/z as separate (N,) planes (full lane occupancy).
   Both variants run the same representative math (attribute lerp, TBN
   orthogonalization, 3-light dot/BRDF-shaped chain) in the same float
   order, so outputs must match bit-exactly.

B) Texture quad-row gather dtype: GATHER_PROBE.json showed u8 (N, 64) row
   gathers cost 8.1 ms/640k rows where f32/bf16 rows of the same byte
   width cost ~3.4 ms. Quad rows hold u8 texels 0..255 — exact in bf16 —
   so a bf16 quad table should halve the fetch cost bit-identically.

Writes SHADE_LAYOUT_PROBE.json.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.utils.health import probe_ms


def log(m):
    print(m, file=sys.stderr, flush=True)


def scan_ms(fn, args, reps_lo=4, reps_hi=16, k=3):
    """Paired device-scan cost of fn(*args, salt) per invocation, RPC floor
    cancelled: (t_hi*hi - t_lo*lo) / (hi - lo)."""
    def build(reps):
        @jax.jit
        def run(*a):
            def body(acc, i):
                return acc + fn(*a, jnp.float32(i) * 1e-6), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(reps, dtype=jnp.int32))
            return acc
        return run

    out = []
    for reps in (reps_lo, reps_hi):
        run = build(reps)
        float(run(*args))  # compile
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            float(run(*args))
            best = min(best, time.perf_counter() - t0)
        out.append(best * 1000.0)
    return (out[1] - out[0]) / (reps_hi - reps_lo)


# ---------------------------------------------------------------- probe A --

def _norm3(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def shade_aos(p0, p1, p2, n0, n1, n2, t0, t1, t2, u, v, L3, salt):
    """(N,3)-vector version of the shade elementwise core."""
    u = u[:, None] + salt
    v = v[:, None]
    w = 1.0 - u - v
    pos = p0 * w + p1 * u + p2 * v
    N = _norm3(n0 * w + n1 * u + n2 * v)
    T = _norm3(t0 * w + t1 * u + t2 * v)
    T = _norm3(T - jnp.sum(T * N, -1, keepdims=True) * N)
    B = jnp.cross(N, T)
    Nm = _norm3(0.3 * T + 0.2 * B + 0.9 * N)
    V = _norm3(-pos)
    NdotV = jnp.clip(jnp.sum(Nm * V, axis=-1), 1e-5, 1.0)
    acc = jnp.zeros(pos.shape[0], jnp.float32)
    for i in range(3):
        Lv = _norm3(L3[i][None, :] - pos)
        H = _norm3(V + Lv)
        NdotL = jnp.clip(jnp.sum(Nm * Lv, -1), 0.0, 1.0)
        NdotH = jnp.clip(jnp.sum(Nm * H, -1), 0.0, 1.0)
        LdotH = jnp.clip(jnp.sum(Lv * H, -1), 0.0, 1.0)
        f = 0.04 + 0.96 * (1.0 - LdotH) ** 5
        d = 0.25 / jnp.maximum(
            (NdotH * NdotH * (0.09 - 1.0) + 1.0) ** 2, 1e-6)
        acc = acc + f * d * NdotL / jnp.maximum(NdotV, 1e-3)
    return jnp.sum(acc)


def shade_soa(px0, py0, pz0, px1, py1, pz1, px2, py2, pz2,
              nx0, ny0, nz0, nx1, ny1, nz1, nx2, ny2, nz2,
              tx0, ty0, tz0, tx1, ty1, tz1, tx2, ty2, tz2,
              u, v, L3, salt):
    """Component-planes version; float op order matches shade_aos."""
    u = u + salt
    w = 1.0 - u - v

    def lerp(a, b, c):
        return a * w + b * u + c * v

    def norm3(x, y, z):
        n = jnp.maximum(jnp.sqrt(x * x + y * y + z * z), 1e-20)
        return x / n, y / n, z / n

    posx, posy, posz = lerp(px0, px1, px2), lerp(py0, py1, py2), \
        lerp(pz0, pz1, pz2)
    Nx, Ny, Nz = norm3(lerp(nx0, nx1, nx2), lerp(ny0, ny1, ny2),
                       lerp(nz0, nz1, nz2))
    Tx, Ty, Tz = norm3(lerp(tx0, tx1, tx2), lerp(ty0, ty1, ty2),
                       lerp(tz0, tz1, tz2))
    tn = Tx * Nx + Ty * Ny + Tz * Nz
    Tx, Ty, Tz = norm3(Tx - tn * Nx, Ty - tn * Ny, Tz - tn * Nz)
    Bx = Ny * Tz - Nz * Ty
    By = Nz * Tx - Nx * Tz
    Bz = Nx * Ty - Ny * Tx
    Nmx, Nmy, Nmz = norm3(0.3 * Tx + 0.2 * Bx + 0.9 * Nx,
                          0.3 * Ty + 0.2 * By + 0.9 * Ny,
                          0.3 * Tz + 0.2 * Bz + 0.9 * Nz)
    Vx, Vy, Vz = norm3(-posx, -posy, -posz)
    NdotV = jnp.clip(Nmx * Vx + Nmy * Vy + Nmz * Vz, 1e-5, 1.0)
    acc = jnp.zeros_like(u)
    for i in range(3):
        Lx, Ly, Lz = norm3(L3[i][0] - posx, L3[i][1] - posy,
                           L3[i][2] - posz)
        Hx, Hy, Hz = norm3(Vx + Lx, Vy + Ly, Vz + Lz)
        NdotL = jnp.clip(Nmx * Lx + Nmy * Ly + Nmz * Lz, 0.0, 1.0)
        NdotH = jnp.clip(Nmx * Hx + Nmy * Hy + Nmz * Hz, 0.0, 1.0)
        LdotH = jnp.clip(Lx * Hx + Ly * Hy + Lz * Hz, 0.0, 1.0)
        f = 0.04 + 0.96 * (1.0 - LdotH) ** 5
        d = 0.25 / jnp.maximum(
            (NdotH * NdotH * (0.09 - 1.0) + 1.0) ** 2, 1e-6)
        acc = acc + f * d * NdotL / jnp.maximum(NdotV, 1e-3)
    return jnp.sum(acc)


# ---------------------------------------------------------------- probe B --

def bilerp_rows(row_f32, fx, fy):
    t00, t10 = row_f32[:, 0:12], row_f32[:, 12:24]
    t01, t11 = row_f32[:, 24:36], row_f32[:, 36:48]
    out = ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
           + (t01 * (1 - fx) + t11 * fx) * fy)
    return jnp.sum(out)


def main():
    dev = jax.devices()[0]
    log(f"device {dev}, probe {probe_ms():.1f} ms")
    rng = np.random.default_rng(7)
    report = {"device": str(dev)}

    for N, tag in ((800 * 800, "800x800"), (1920 * 1080, "1920x1080")):
        f = lambda: jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
        p0, p1, p2, n0, n1, n2, t0, t1, t2 = (f() for _ in range(9))
        u = jnp.asarray(rng.uniform(0, 0.5, N), jnp.float32)
        v = jnp.asarray(rng.uniform(0, 0.5, N), jnp.float32)
        L3 = jnp.asarray(rng.standard_normal((3, 3)) * 5, jnp.float32)

        aos_args = (p0, p1, p2, n0, n1, n2, t0, t1, t2, u, v, L3)
        soa_args = tuple(a[:, i] for a in (p0, p1, p2, n0, n1, n2,
                                           t0, t1, t2) for i in range(3)) \
            + (u, v, L3)
        ref = float(shade_aos(*aos_args, jnp.float32(0.0)))
        got = float(shade_soa(*soa_args, jnp.float32(0.0)))
        ms_aos = scan_ms(shade_aos, aos_args)
        ms_soa = scan_ms(shade_soa, soa_args)
        log(f"[{tag}] elementwise aos {ms_aos:.3f} ms  soa {ms_soa:.3f} ms "
            f"(sum aos {ref:.6g} soa {got:.6g})")
        report[tag] = {"aos_ms": round(ms_aos, 3), "soa_ms": round(ms_soa, 3),
                       "sum_rel_err": abs(got - ref) / max(abs(ref), 1e-9)}

    # --- gather dtype probe: quad rows (P*H*W, 64) ---
    rows = 1 << 20
    N = 1920 * 1080
    tbl_u8 = rng.integers(0, 256, (rows, 64), np.uint8)
    idx = jnp.asarray(rng.integers(0, rows, N), jnp.int32)
    fx = jnp.asarray(rng.uniform(0, 1, (N, 1)), jnp.float32)
    fy = jnp.asarray(rng.uniform(0, 1, (N, 1)), jnp.float32)

    d_u8 = jnp.asarray(tbl_u8)
    d_bf16 = jnp.asarray(tbl_u8.astype(np.float32), jnp.bfloat16)
    d_u32 = jnp.asarray(tbl_u8.view(np.uint32))          # (rows, 16)

    def g_u8(tbl, idx, fx, fy, salt):
        return bilerp_rows(tbl[idx].astype(jnp.float32), fx + salt, fy)

    def g_bf16(tbl, idx, fx, fy, salt):
        return bilerp_rows(tbl[idx].astype(jnp.float32), fx + salt, fy)

    def g_u32(tbl, idx, fx, fy, salt):
        r = tbl[idx]                                     # (N, 16) u32
        parts = [((r >> (8 * k)) & 0xFF).astype(jnp.float32)
                 for k in range(4)]
        row = jnp.stack(parts, -1).reshape(r.shape[0], 64)
        return bilerp_rows(row, fx + salt, fy)

    vals = {}
    for name, fn, tbl in (("u8", g_u8, d_u8), ("bf16", g_bf16, d_bf16),
                          ("u32x16", g_u32, d_u32)):
        ref = float(fn(tbl, idx, fx, fy, jnp.float32(0.0)))
        ms = scan_ms(fn, (tbl, idx, fx, fy))
        vals[name] = {"ms": round(ms, 3), "sum": ref}
        log(f"[gather {name}] {ms:.3f} ms (sum {ref:.6g})")
    report["quad_gather_2m_rows"] = vals

    out_p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SHADE_LAYOUT_PROBE.json")
    with open(out_p, "w") as fp:
        json.dump(report, fp, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
