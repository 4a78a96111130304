"""Backend/tunnel health probing for honest benchmarks.

The TPU in this environment is reached through an RPC tunnel whose
execution latency can degrade by orders of magnitude for minutes at a
time (round-2 post-mortem: the driver captured 1651 ms/frame for a
program independently measured at 73 ms/frame, because the capture ran
through a degraded tunnel). The reference's one instrumentation piece —
the FPS print in frame_timer.rs:16-28 — can never lie about its own
number; a tunneled benchmark can, so every timing artifact must pass a
health gate:

  * ``probe_ms()`` times a tiny, known, cached device program
    (64-iteration scan of a 256x256 matmul, scalar readback). Healthy
    cost is RPC-floor bound (~10-40 ms end to end); a degraded tunnel
    turns it into seconds.
  * ``guarded_measure()`` wraps a measurement in before/after probes and
    only accepts the sample when both are healthy, retrying with backoff
    otherwise. min-of-k across accepted samples is the reported number.

Used by bench.py and tools/*bench*.py.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

# Healthy end-to-end cost of the probe program (dominated by the RPC
# round-trip, not the ~0.1 ms of compute). Calibrated on a quiet tunnel;
# generous so CPU runs and minor jitter never trip the gate.
NOMINAL_PROBE_MS = 60.0
# probe slower than NOMINAL * FACTOR => the backend is degraded and any
# measurement taken adjacent to it is untrustworthy.
DEGRADED_FACTOR = 5.0

_PROBE = None


def _probe_program():
    global _PROBE
    if _PROBE is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def probe(x):
            def body(c, _):
                return jnp.tanh(c @ x), None

            c, _ = jax.lax.scan(body, x, None, length=64)
            return jnp.sum(c)

        x = jnp.ones((256, 256), jnp.float32) * 0.01
        float(probe(x))  # compile once; later calls hit the cache
        _PROBE = (probe, x)
    return _PROBE


def probe_ms(reps: int = 3) -> float:
    """Best-of-`reps` wall time of the trivial device program, in ms."""
    probe, x = _probe_program()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(probe(x))
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    return best


def is_healthy(p_ms: float | None = None) -> bool:
    p = probe_ms() if p_ms is None else p_ms
    return p <= NOMINAL_PROBE_MS * DEGRADED_FACTOR


@dataclass
class GuardedResult:
    value: float | None          # min over accepted samples (ms), or None
    samples: list = field(default_factory=list)   # accepted samples
    rejected: int = 0            # samples thrown away (degraded probes)
    probe_ms: float = 0.0        # last healthy probe cost
    degraded: bool = False       # True if we never got a clean sample

    def asdict(self) -> dict:
        return dict(samples_ms=[round(s, 3) for s in self.samples],
                    rejected_samples=self.rejected,
                    probe_ms=round(self.probe_ms, 2),
                    nominal_probe_ms=NOMINAL_PROBE_MS,
                    degraded_backend=self.degraded)


def guarded_measure(fn, *, samples: int = 3, budget_s: float = 600.0,
                    backoff_s: float = 30.0, log=None) -> GuardedResult:
    """Run `fn() -> ms` until `samples` clean samples or the budget runs out.

    A sample is clean when the health probe is fast both immediately
    before and immediately after it (a degradation beginning mid-sample
    is caught by the trailing probe). Returns min-of-clean-samples;
    if the budget expires without a single clean sample, the result
    carries ``degraded=True`` and the best raw sample observed.
    """
    def _log(m):
        if log:
            log(m)

    res = GuardedResult(value=None)
    raw_best = float("inf")
    deadline = time.perf_counter() + budget_s
    while len(res.samples) < samples and time.perf_counter() < deadline:
        pre = probe_ms()
        if not is_healthy(pre):
            _log(f"health: degraded (probe {pre:.0f} ms vs nominal "
                 f"{NOMINAL_PROBE_MS:.0f}); backing off {backoff_s:.0f}s")
            res.rejected += 1
            time.sleep(backoff_s)
            continue
        ms = fn()
        raw_best = min(raw_best, ms)
        post = probe_ms()
        if not is_healthy(post):
            _log(f"health: degradation DURING sample (post-probe "
                 f"{post:.0f} ms); sample {ms:.1f} ms rejected")
            res.rejected += 1
            time.sleep(backoff_s)
            continue
        res.samples.append(ms)
        res.probe_ms = post
        _log(f"health: clean sample {ms:.3f} ms "
             f"(probe {pre:.0f}/{post:.0f} ms)")
    if res.samples:
        res.value = min(res.samples)
    else:
        res.degraded = True
        res.value = None if raw_best == float("inf") else raw_best
        _log("health: NO clean sample inside the budget — result flagged "
             "degraded_backend=true")
    return res
