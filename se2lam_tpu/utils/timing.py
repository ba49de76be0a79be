"""Per-stage timing instrumentation.

TPU-native analog of the reference's `WorkTimer` millisecond stopwatch
(include/se2lam/Config.h:42-58) and its ad-hoc t1..t5 stage prints
(src/GlobalMapper.cpp:91-163) plus the TIME_TO_LOG_LOCAL_BA csv logger
(src/LocalMapper.cpp:251-276). Adds what the reference lacks: aggregate
statistics per stage and an optional `jax.profiler` trace context.

NOTE on async dispatch: JAX returns before the device finishes, so a
naive stopwatch measures dispatch, not execution. `StageTimer.timed`
optionally blocks on the stage output to record true wall time (costs
pipeline overlap — enable only when diagnosing).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np

__all__ = ["WorkTimer", "StageTimer"]


class WorkTimer:
    """Drop-in stopwatch: start() … stop() → milliseconds."""

    def __init__(self):
        self.start()

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        return (time.perf_counter() - self._t0) * 1000.0

    @property
    def ms(self) -> float:
        return self.stop()


class StageTimer:
    """Named-stage aggregator with mean/max/count and optional blocking."""

    def __init__(self, block: bool = False):
        self.block = block
        self.samples: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        self.samples[name].append((time.perf_counter() - t0) * 1000.0)

    def timed(self, name: str, fn, *args, **kw):
        """Run fn, record duration; blocks on the result if self.block."""
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        if self.block:
            import jax

            jax.block_until_ready(out)
        self.samples[name].append((time.perf_counter() - t0) * 1000.0)
        return out

    def report(self) -> str:
        lines = [f"{'stage':16s} {'n':>5s} {'mean ms':>9s} {'p50':>8s} "
                 f"{'max':>8s} {'total s':>8s}"]
        for name, xs in sorted(self.samples.items()):
            a = np.asarray(xs)
            lines.append(
                f"{name:16s} {len(a):5d} {a.mean():9.2f} "
                f"{np.median(a):8.2f} {a.max():8.2f} {a.sum() / 1000:8.2f}"
            )
        return "\n".join(lines)

    def reset(self):
        self.samples.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (the deep-dive tool; view in
    TensorBoard or xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_rtt(reps: int = 5) -> float:
    """Median host→device round-trip floor, in seconds.

    The benchmark discipline (docs/DESIGN.md §9): completion is forced
    by FETCHING a scalar, which pays one tunnel round-trip (~30 ms on
    the axon path) that must be subtracted once per timed region. One
    warm dispatch first — the probe itself must not be timed cold."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x * 2.0)
    float(tiny(jnp.float32(1.0)))
    rtts = []
    for r in range(reps):
        t0 = time.perf_counter()
        float(tiny(jnp.float32(r)))
        rtts.append(time.perf_counter() - t0)
    return float(np.median(rtts))
