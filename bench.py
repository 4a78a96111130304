"""Headline benchmark: full pipeline (PBR + RT shadows + XeGTAO ULTRA +
LPM tonemap) at the reference's 800x800 workload shape (main.rs:18), on one
chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

Rays/frame = W*H primary + W*H per shadow-casting light (the reference's
1 primary + N shadow rays per pixel, raytrace.rgen.glsl:86-182).
vs_baseline is the fraction of the BASELINE.json north-star target
(100 Mrays/s/chip); the reference publishes no numbers of its own
(BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compile cache: first remote compile of the frame program is
# expensive; cache hits keep repeated bench runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

_T_START = time.perf_counter()

BOX = "/root/reference/assets/models/BoxTextured.glb"
WIDTH = 800
HEIGHT = 800
WARMUP = 3
FRAMES = 20
NORTH_STAR_MRAYS = 100.0


def build_scene(width=WIDTH, height=HEIGHT):
    from tpurt.engine import Renderer, RendererConfig
    from tpurt.passes.gtao import GtaoSettings
    from tpurt.scene.lights import AreaLight, SpotLight
    from tpurt.scene.procedural import box_field, ground_plane

    cfg = RendererConfig(width=width, height=height,
                         gtao=GtaoSettings(slice_count=9, steps_per_slice=3,
                                           denoise=1))  # ULTRA + Sharp
    r = Renderer(cfg)

    # Sponza-scale stand-in (the real asset is unshipped): a 12x12 field of
    # subdivided boxes (~43k tris) + ground, plus textured glTF cubes for
    # the material/texture path — multi-model with running custom indices
    # (renderer.rs:641-650).
    r.models.append(box_field(nx=12, nz=12, subdiv=5))
    r.models.append(ground_plane())
    for i in range(8):
        m = np.array([[0.45, 0, 0, (i - 3.5) * 1.4],
                      [0, 0.45, 0, -2.2],
                      [0, 0, 0.45, 0.0]], np.float32)
        r.add_model(BOX, m)

    r.camera_mut().set_pos([0.0, -2.5, -9.5])
    d = np.array([0.0, 0.3, 1.0])
    r.camera_mut().set_dir(d / np.linalg.norm(d))

    # the reference app's two lights (main.rs:38-64) repositioned for scale,
    # plus a directional sun so the whole field participates
    from tpurt.scene.lights import DirectionalLight

    r.lights_mut().directional_lights.append(DirectionalLight(
        dir=np.array([0.35, 0.85, 0.4]) / np.linalg.norm([0.35, 0.85, 0.4]),
        color=[1.4, 1.3, 1.1], casts_shadows=True))
    r.lights_mut().spot_lights.append(SpotLight(
        pos=[0.0, -4.0, 0.0], dir=[0.0, 1.0, 0.0],
        color=np.array([1.36, 0.16, 2.22]) * 10.0, falloff_distance=12.0,
        penumbra_umbra_angles=(np.radians(30), np.radians(45)),
        casts_shadows=True))
    r.lights_mut().area_lights.append(AreaLight(
        pos=[-2.0, -3.0, 0.2], pos2=[-2.0, -3.0, -0.8], pos3=[-2.0, -2.2, -0.8],
        invert_normal=False, color=np.array([1.96, 0.06, 0.41]) * 3.0,
        falloff_distance=12.0,
        penumbra_umbra_angles=(np.radians(90), np.radians(90.1)),
        casts_shadows=True))
    r.prepare_first_frame()
    return r


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _device_sanity(image) -> tuple:
    """Black-frame check WITHOUT a full-image readback: reduce on device and
    read back two scalars (the round-1 bench died pulling 1.9 MB through the
    flaky tunnel — a readback the repo's own CLAUDE.md warns against)."""
    import jax.numpy as jnp

    s = jnp.sum(image.astype(jnp.float32))
    mx = jnp.max(image)
    return float(s), int(mx)


def _measure_burst(renderer, frames: int = 16):
    """Device-side frame loop: `frames` full frames inside ONE program
    (lax.scan over the GTAO noise index, reduced to a checksum so nothing
    big crosses the tunnel). Separates true device throughput from the
    per-dispatch RPC floor — the analogue of the reference's 3
    frames-in-flight keeping the GPU fed (renderer.rs:300-318).

    NOTE: the wall time of ONE burst includes the ~30 ms tunnel RPC floor,
    i.e. a bias of floor/frames ms per frame (round-3 discovery: every
    round-2 artifact taken at frames=8 was ~3.6 ms/frame inflated). Use
    _frame_cost_paired for floor-free numbers."""
    import jax
    import jax.numpy as jnp

    from tpurt.engine.frame import render_frame
    from tpurt.passes.gtao import gtao_constants

    c = renderer.config
    cam = renderer._cached("camera", renderer.camera.uniform())
    lights = renderer._cached("lights", renderer.lights.shader_arrays())
    consts = gtao_constants(c.width, c.height, renderer.camera.znear,
                            renderer.camera.zfar, renderer.camera.fovy,
                            renderer.camera.aspect)
    scene = renderer.scene_device
    tables = renderer._pallas_tables()
    gtao = renderer._effective_gtao()

    @jax.jit
    def burst(scene, cam, lights, consts, lpm):
        def body(acc, i):
            out = render_frame(scene, cam, lights, consts, lpm,
                               i % 64, width=c.width, height=c.height,
                               gtao_settings=gtao, pallas_tables=tables)
            return acc + jnp.sum(out["image"], dtype=jnp.uint32), None

        acc, _ = jax.lax.scan(body, jnp.uint32(0),
                              jnp.arange(frames, dtype=jnp.int32))
        return acc

    # time to the actual scalar READBACK — block_until_ready does not
    # synchronize on this backend
    assert int(burst(scene, cam, lights, consts,
                     renderer._lpm_derived)) > 0  # compile + sanity
    t0 = time.perf_counter()
    chk = int(burst(scene, cam, lights, consts, renderer._lpm_derived))
    el = time.perf_counter() - t0
    assert chk > 0
    return el * 1000.0 / frames


def _frame_cost_paired(renderer, lo: int = 8, hi: int = 32):
    """Floor-free per-frame device cost: (t_burst(hi) - t_burst(lo)) /
    (hi - lo). The two bursts carry the SAME per-invocation overhead (RPC
    round-trip, dispatch, readback), so the difference isolates pure
    device time per frame. Both programs must be compiled (call
    _measure_burst once for each count first)."""
    t_lo = _measure_burst(renderer, frames=lo) * lo
    t_hi = _measure_burst(renderer, frames=hi) * hi
    return (t_hi - t_lo) / (hi - lo)


def _pipelined_wall(renderer, depth: int = 3, frames: int = 60):
    """Wall-clock ms/frame with a bounded `depth`-deep dispatch queue (the
    reference's frames-in-flight, renderer.rs:300-318): block on the OLDEST
    frame's 4-byte checksum before dispatching the next, so every frame is
    individually consumed (a real device->host sync per frame — not the
    dispatch-rate lie) while up to depth-1 frames hide the host dispatch +
    ~30 ms RPC floor under device compute. OVERLAP_PROBE.json measured the
    depth sweep; this is the deployed-configuration number."""
    from collections import deque

    import jax
    import jax.numpy as jnp

    from tpurt.engine.frame import render_frame
    from tpurt.passes.gtao import gtao_constants

    c = renderer.config
    cam = renderer._cached("camera", renderer.camera.uniform())
    lights = renderer._cached("lights", renderer.lights.shader_arrays())
    consts = gtao_constants(c.width, c.height, renderer.camera.znear,
                            renderer.camera.zfar, renderer.camera.fovy,
                            renderer.camera.aspect)
    scene = renderer.scene_device
    tables = renderer._pallas_tables()
    gtao = renderer._effective_gtao()

    @jax.jit
    def step(scene, cam, lights, consts, lpm, i):
        out = render_frame(scene, cam, lights, consts, lpm, i % 64,
                           width=c.width, height=c.height,
                           gtao_settings=gtao, pallas_tables=tables)
        return jnp.sum(out["image"], dtype=jnp.uint32)

    args = (scene, cam, lights, consts, renderer._lpm_derived)
    assert int(step(*args, jnp.int32(0))) > 0  # compile + sanity
    q = deque()
    for i in range(depth):  # warm the queue discipline
        q.append(step(*args, jnp.int32(i)))
    while q:
        assert int(q.popleft()) > 0
    t0 = time.perf_counter()
    for i in range(frames):
        q.append(step(*args, jnp.int32(i)))
        if len(q) >= depth:
            assert int(q.popleft()) > 0
    while q:
        assert int(q.popleft()) > 0
    return (time.perf_counter() - t0) * 1000.0 / frames


def _measure_primary_trace(renderer, frames: int = 8):
    """Secondary metric: closest-hit packet trace alone (device-scan),
    isolating raw traversal throughput from shading/AO."""
    import jax
    import jax.numpy as jnp

    from tpurt.engine.frame import MAX_LEAF
    from tpurt.kernels.traverse_pallas import trace_closest_packets
    from tpurt.passes.rays import T_MAX, T_MIN, camera_rays

    c = renderer.config
    cam = renderer._cached("camera", renderer.camera.uniform())
    scene = renderer.scene_device
    tables = renderer._pallas_tables()
    jits = jnp.linspace(-0.25, 0.25, frames).reshape(frames, 1) \
        * jnp.ones((1, 2), jnp.float32)

    @jax.jit
    def burst(scene, cam):
        def body(acc, jit):
            o, d = camera_rays(cam, c.width, c.height, jitter=jit)
            hits = trace_closest_packets(
                scene["bvh"], scene["geom"], o, d, T_MIN, T_MAX,
                height=c.height, width=c.width, max_leaf=MAX_LEAF,
                tables=tables)
            return acc + jnp.sum(jnp.where(jnp.isfinite(hits["t"]),
                                           hits["t"], 0.0)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jits)
        return acc

    assert float(burst(scene, cam)) != 0.0  # compile + sanity
    t0 = time.perf_counter()
    float(burst(scene, cam))
    return (time.perf_counter() - t0) * 1000.0 / frames


def _measure(renderer, rays_per_frame):
    """Warmup + timed frames + device-side sanity. Raises on backend error;
    the caller retries with the (already compiled) program."""
    for i in range(WARMUP):
        renderer.render(block=True)
        _log(f"bench: warmup frame {i + 1}/{WARMUP} done")

    # blocking frames: reliable on the tunneled backend (async chains can
    # wedge, see CLAUDE.md); the ~1ms RPC per frame is included in ms/frame
    start = time.perf_counter()
    out = None
    for _ in range(FRAMES):
        out = renderer.render(block=True)
    elapsed = time.perf_counter() - start

    checksum, peak = _device_sanity(out["image"])
    assert checksum > 0.0, "benchmark rendered a black frame"
    _log(f"bench: sanity ok (sum={checksum:.3e}, max={peak})")
    return elapsed


def profile_main():
    """--profile: honest per-pass ms breakdown (trace / shade+shadows /
    GTAO / tonemap) + fused end-to-end, at 800x800 and 1080p, via the
    cumulative-prefix device-scan (engine.profiler.device_profile —
    sync-point timing only measures dispatch on the tunneled backend).
    Writes PROFILE.json (VERDICT round-1 item 5)."""
    import jax

    from tpurt.engine.profiler import device_profile

    report = {}
    for w, h in [(WIDTH, HEIGHT), (1920, 1080)]:
        _log(f"profile: building {w}x{h} scene...")
        r = build_scene(w, h)
        r.render(block=True)  # compile + settle
        _measure_burst(r, frames=8)   # compile
        _measure_burst(r, frames=24)
        fused_ms = (_measure_burst(r, frames=24) * 24
                    - _measure_burst(r, frames=8) * 8) / 16

        stats = device_profile(r, reps=8)
        _log(f"profile {w}x{h}: {stats.pretty()} | fused {fused_ms:.3f} ms")
        report[f"{w}x{h}"] = dict(
            per_pass_ms={k: round(v, 4) for k, v in stats.ms_per_pass.items()},
            sum_of_passes_ms=round(stats.ms_total, 4),
            fused_frame_ms=round(fused_ms, 4),
            tracer_tier=r.stats()["tracer_tier"],
            tris=r.stats()["tris"],
            note="device-scan timing (cumulative prefixes); the fused "
                 "frame is one whole-frame program",
        )
    report["device"] = str(jax.devices()[0])
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "PROFILE.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


def materials_main():
    """--materials: 36-material mipmapped workload (the 256-slot bindless
    analogue at scale) at 800x800 ULTRA; writes BENCH_MATERIALS.json."""
    import jax

    from tpurt.engine import Renderer, RendererConfig
    from tpurt.passes.gtao import GtaoSettings
    from tpurt.scene.lights import DirectionalLight, SpotLight
    from tpurt.scene.procedural import ground_plane, material_field

    cfg = RendererConfig(width=WIDTH, height=HEIGHT,
                         gtao=GtaoSettings(9, 3, denoise=1), mipmaps=True)
    r = Renderer(cfg)
    r.models.append(material_field(nx=6, nz=6, subdiv=4))
    r.models.append(ground_plane())
    r.camera_mut().set_pos([0.0, -2.5, -6.5])
    d = np.array([0.0, 0.35, 1.0])
    r.camera_mut().set_dir(d / np.linalg.norm(d))
    r.lights_mut().directional_lights.append(DirectionalLight(
        dir=np.array([0.3, 0.9, 0.3]) / np.linalg.norm([0.3, 0.9, 0.3]),
        color=[1.5, 1.4, 1.3], casts_shadows=True))
    r.lights_mut().spot_lights.append(SpotLight(
        pos=[0.0, -4.0, 0.0], dir=[0.0, 1.0, 0.0],
        color=np.array([1.36, 0.16, 2.22]) * 10.0, falloff_distance=12.0,
        penumbra_umbra_angles=(np.radians(30), np.radians(45)),
        casts_shadows=True))
    r.prepare_first_frame()
    rays = WIDTH * HEIGHT * (1 + 2)
    for i in range(WARMUP):
        out = r.render(block=True)
        _log(f"materials: warmup {i + 1}/{WARMUP}")
    checksum, _ = _device_sanity(out["image"])
    assert checksum > 0
    # paired device-scan timing (RPC floor cancelled; blocked per-frame
    # loops only measure dispatch on the tunneled backend)
    _measure_burst(r, frames=8)
    _measure_burst(r, frames=24)
    burst_ms = _frame_cost_paired(r, lo=8, hi=24)
    _log(f"materials: device-side frame cost {burst_ms:.3f} ms")
    report = dict(
        metric="Mrays/s, 36 distinct materials + mip-chain trilinear, "
               "800x800 ULTRA",
        value=round(rays / burst_ms / 1e3, 2), unit="Mrays/s",
        ms_per_frame=round(burst_ms, 3),
        tris=int(r.scene.geom["v0"].shape[0]), materials=r.scene.num_prims,
        mip_levels=int(r.scene.tex_mip_sizes.shape[1]),
        device=str(jax.devices()[0]),
        timing="device-side lax.scan of 8 frames, checksum readback")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_MATERIALS.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


def scale_main():
    """--scale: Sponza-scale triangle count (307k) at 800x800 ULTRA with
    honest device-scan timing; writes BENCH_SCALE.json."""
    import jax

    from tpurt.engine import Renderer, RendererConfig
    from tpurt.passes.gtao import GtaoSettings
    from tpurt.scene.lights import DirectionalLight, SpotLight
    from tpurt.scene.procedural import box_field, ground_plane

    cfg = RendererConfig(width=WIDTH, height=HEIGHT,
                         gtao=GtaoSettings(9, 3, denoise=1))
    r = Renderer(cfg)
    r.models.append(box_field(nx=16, nz=16, subdiv=10, spacing=1.0))
    r.models.append(ground_plane())
    r.camera_mut().set_pos([0.0, -3.5, -11.0])
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
    r.prepare_first_frame()
    rays = WIDTH * HEIGHT * (1 + 2)
    for i in range(WARMUP):
        out = r.render(block=True)
        _log(f"scale: warmup {i + 1}/{WARMUP}")
    checksum, _ = _device_sanity(out["image"])
    assert checksum > 0
    _measure_burst(r, frames=8)
    _measure_burst(r, frames=24)
    burst_ms = _frame_cost_paired(r, lo=8, hi=24)
    _log(f"scale: device-side frame cost {burst_ms:.3f} ms")
    report = dict(
        metric="Mrays/s, Sponza-scale triangle count, 800x800 ULTRA",
        value=round(rays / burst_ms / 1e3, 2), unit="Mrays/s",
        ms_per_frame=round(burst_ms, 3),
        rays_per_frame=rays, lights=2,
        tris=int(r.scene.geom["v0"].shape[0]),
        tracer_tier=r._pallas_tables(),
        device=str(jax.devices()[0]),
        timing="device-side lax.scan of 8 frames, checksum readback")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SCALE.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


def main():
    import jax

    if "--profile" in sys.argv:
        profile_main()
        return
    if "--scale" in sys.argv:
        scale_main()
        return
    if "--materials" in sys.argv:
        materials_main()
        return

    from tpurt.utils.health import guarded_measure, is_healthy, probe_ms

    # Gate 0: don't even compile through a degraded tunnel — a slow remote
    # compile wedges everything behind it. Wait up to 5 min for health.
    p = probe_ms()
    waited = 0.0
    while not is_healthy(p) and waited < 300.0:
        _log(f"bench: tunnel degraded before start (probe {p:.0f} ms); "
             f"waiting 30s...")
        time.sleep(30.0)
        waited += 30.0
        p = probe_ms()
    _log(f"bench: initial probe {p:.1f} ms (healthy={is_healthy(p)})")

    _log("bench: building scene...")
    renderer = build_scene()
    _log("bench: scene ready, warming up (first frame compiles)...")
    n_lights = renderer.lights.get_lights_count()
    rays_per_frame = WIDTH * HEIGHT * (1 + n_lights)

    # one retry on backend abort: the tunnel occasionally kills a long RPC;
    # the compiled program survives in the cache so attempt 2 is cheap
    attempts = 2
    elapsed = None
    for attempt in range(attempts):
        try:
            elapsed = _measure(renderer, rays_per_frame)
            # compile the burst program once (untimed) before the gated runs
            _measure_burst(renderer, frames=8)
            break
        except Exception as e:  # noqa: BLE001 — backend aborts surface as
            # JaxRuntimeError/RuntimeError; anything else fails on retry too
            if attempt + 1 == attempts:
                raise
            _log(f"bench: attempt {attempt + 1} failed ({e!r}); "
                 f"waiting 30s for the tunnel to settle, then retrying...")
            time.sleep(30)

    # HEADLINE measurement: device-side scan of whole frames.
    # block_until_ready does NOT synchronize on the tunneled axon backend
    # (measured: a "blocked" loop reported 1.6 ms/frame while draining the
    # queue took 11.5 s/frame), so host-timed loops measure DISPATCH rate.
    # Paired bursts (32-frame minus 8-frame scan, checksum readback)
    # cancel the ~30 ms per-invocation RPC floor exactly; min-of-3 with
    # health probes before/after each sample (round-2's artifact of record
    # was 21x wrong from one unguarded degraded sample, and its
    # single-burst microbenches were +floor/8 ≈ 3.6 ms/frame inflated).
    _measure_burst(renderer, frames=32)  # compile the long burst
    head = guarded_measure(lambda: _frame_cost_paired(renderer),
                           samples=3, budget_s=600.0, log=_log)
    burst_ms = head.value
    _log(f"bench: device-side frame cost {burst_ms:.3f} ms "
         f"({rays_per_frame / burst_ms / 1e3:.0f} Mrays/s)"
         + (" [DEGRADED]" if head.degraded else ""))

    def trace_paired():
        t8 = _measure_primary_trace(renderer, frames=8) * 8
        t24 = _measure_primary_trace(renderer, frames=24) * 24
        return (t24 - t8) / 16

    _measure_primary_trace(renderer, frames=24)  # compile
    tr = guarded_measure(trace_paired, samples=2, budget_s=180.0, log=_log)
    trace_ms = tr.value
    if trace_ms:
        _log(f"bench: primary trace alone {trace_ms:.3f} ms "
             f"({WIDTH * HEIGHT / trace_ms / 1e3:.0f} Mrays/s)")

    dispatch_ms = elapsed * 1000.0 / FRAMES
    mrays = rays_per_frame / burst_ms / 1e3

    # deployed wall-clock: depth-3 frames-in-flight queue (the reference
    # pipelines host recording 3 deep against the GPU, renderer.rs:300-318;
    # OVERLAP_PROBE.json shows wall ~= device at depth 3 on this tunnel).
    # Guarded: a wedge/failure here cannot spoil the headline artifact.
    wall_pipelined_ms = None
    try:
        from tpurt.utils.health import is_healthy as _healthy
        from tpurt.utils.health import probe_ms as _probe

        p = _probe()
        if _healthy(p):
            wall_pipelined_ms = _pipelined_wall(renderer, depth=3, frames=60)
            _log(f"bench: pipelined wall (depth 3) "
                 f"{wall_pipelined_ms:.3f} ms/frame")
        else:
            _log(f"bench: tunnel degraded (probe {p:.0f} ms) — skipping "
                 f"pipelined-wall measurement")
    except Exception as e:  # noqa: BLE001
        _log(f"bench: pipelined-wall measurement failed ({e!r}); "
             f"headline unaffected")

    meta = dict(
        ms_per_frame=round(burst_ms, 3),
        fps=round(1000.0 / burst_ms, 2),
        dispatch_ms_per_frame=round(dispatch_ms, 3),
        resolution=f"{WIDTH}x{HEIGHT}",
        rays_per_frame=rays_per_frame,
        lights=n_lights,
        tris=int(renderer.scene.geom["v0"].shape[0]),
        device=str(jax.devices()[0]),
        pipeline="primary+shadow, GTAO ULTRA 9x3 + sharp denoise, LPM tonemap",
        timing="min-of-3 paired device-scan bursts (32-8 frames, RPC "
               "floor cancelled), each gated by before/after tunnel-health "
               "probes (host-timed 'blocked' loops only measure dispatch "
               "on this backend)",
        health=head.asdict(),
    )
    if trace_ms:
        meta["primary_trace_ms"] = round(trace_ms, 3)
        meta["primary_trace_mrays_per_s"] = round(
            WIDTH * HEIGHT / trace_ms / 1e3, 1)
    if wall_pipelined_ms is not None:
        meta["wall_ms_per_frame_pipelined_depth3"] = round(
            wall_pipelined_ms, 3)
        meta["wall_fps_pipelined_depth3"] = round(
            1000.0 / wall_pipelined_ms, 2)
    # secondary: the BASELINE.json primary-metric shape (full pipeline at
    # 1080p). Guarded so a failure here cannot spoil the headline artifact.
    # Round 3's driver run SKIPPED this entirely after a >15-min headline
    # (cold remote-compile cache) and the artifact of record lost its 1080p
    # number — now a late start only SHRINKS the sampling (1 paired sample,
    # tight budget) instead of dropping the measurement.
    try:
        late = time.perf_counter() - _T_START > 900.0
        if late:
            _log("bench: headline ran > 15 min — 1080p secondary drops to "
                 "1 sample / 150 s budget instead of skipping")
        _log("bench: 1080p secondary (full pipeline)...")
        r_hd = build_scene(1920, 1080)
        r_hd.render(block=True)  # compile + settle
        _measure_burst(r_hd, frames=4)   # compile both burst programs
        _measure_burst(r_hd, frames=12)
        hd = guarded_measure(lambda: _frame_cost_paired(r_hd, lo=4, hi=12),
                             samples=1 if late else 2,
                             budget_s=150.0 if late else 240.0, log=_log)
        if hd.value and not hd.degraded:
            meta["ms_per_frame_1080p"] = round(hd.value, 3)
            meta["mrays_per_s_1080p"] = round(
                1920 * 1080 * (1 + n_lights) / hd.value / 1e3, 2)
            _log(f"bench: 1080p full pipeline {hd.value:.3f} ms/frame")
    except Exception as e:  # noqa: BLE001
        _log(f"bench: 1080p secondary failed ({e!r}); headline unaffected")
    try:
        import subprocess

        meta["commit"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:  # noqa: BLE001
        pass
    print(json.dumps(dict(
        metric="Mrays/sec/chip (primary+shadow), full pipeline 800x800",
        value=round(mrays, 2),
        unit="Mrays/s",
        vs_baseline=round(mrays / NORTH_STAR_MRAYS, 4),
        **meta,
    )))


if __name__ == "__main__":
    main()
