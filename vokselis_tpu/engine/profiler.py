"""Frame-time and pass-time profiling (SURVEY.md §5 'tracing/profiling').

- :class:`FrameCounter` mirrors src/utils/frame_counter.rs:3-40 — accumulates
  frame time and prints the average every 100 frames; ``time_delta()`` feeds
  the global uniform like context.rs:227.
- :class:`PassTimer` is the analog of the xor demo's GPU timestamp-query pair
  (examples/xor/main.rs:120-131, 164-187): it brackets a jitted render pass
  wall-clock (device sync included) and prints 'Time on raycast shader'-style
  reports every N frames, plus a derived Mrays/s.
- :func:`trace` wraps ``jax.profiler.trace`` for full device traces.
"""

from __future__ import annotations

import contextlib
import time


class FrameCounter:
    def __init__(self, report_every: int = 100):
        self.frame_count = 0
        self.accum_time = 0.0
        self.last_frame_time = time.perf_counter()
        self.report_every = report_every
        self.last_avg_ms = 0.0

    def record(self) -> float:
        """Mark a frame boundary; returns dt seconds. Prints the average
        every ``report_every`` frames (frame_counter.rs:18-28)."""
        now = time.perf_counter()
        dt = now - self.last_frame_time
        self.last_frame_time = now
        self.accum_time += dt
        self.frame_count += 1
        if self.frame_count % self.report_every == 0:
            self.last_avg_ms = self.accum_time / self.report_every * 1000.0
            print(f"Avg frame time {self.last_avg_ms:.2f}ms")
            self.accum_time = 0.0
        return dt

    def time_delta(self) -> float:
        """Average seconds per frame over the current window
        (frame_counter.rs:14-16)."""
        if self.frame_count % self.report_every == 0:
            return self.last_avg_ms / 1000.0 if self.last_avg_ms else 1.0 / 60.0
        n = self.frame_count % self.report_every
        return self.accum_time / max(n, 1)


class PassTimer:
    """Times a named device pass; prints every ``report_every`` frames.

    Wall-clock dispatch timing includes the host->device round-trip, which
    on some transports (this image's TPU tunnel: ~29 ms) dwarfs the pass
    itself. The first report therefore calibrates a per-dispatch FLOOR
    (median round-trip of a trivial jitted op) and prints both the raw
    wall time and the floor-adjusted estimate — bench.py's multi-frame
    slope method remains the number of record for benchmarks."""

    def __init__(self, name: str = "raycast shader", report_every: int = 100,
                 calibrate: bool = True):
        self.name = name
        self.report_every = report_every
        self.calibrate = calibrate
        self.accum = 0.0
        self.count = 0
        self.rays = 0
        self.last_ms = 0.0
        self._floor = None

    @staticmethod
    def _dispatch_floor() -> float:
        """Median round-trip seconds of a trivial dispatch (5 samples)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        f = jax.jit(lambda x: x + 1.0)
        np.asarray(f(jnp.float32(0)))  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    @contextlib.contextmanager
    def measure(self, n_rays: int = 0, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            sync()
        self.accum += time.perf_counter() - t0
        self.rays += n_rays
        self.count += 1
        if self.count % self.report_every == 0:
            if self._floor is None:
                self._floor = self._dispatch_floor() if self.calibrate else 0.0
            raw = self.accum / self.report_every
            adj = max(raw - self._floor, 0.0)
            self.last_ms = adj * 1000.0
            if adj <= 0.0:
                # the pass is cheaper than a dispatch round-trip: wall
                # timing can't resolve it (use bench.py's slope method)
                msg = (f"Time on {self.name}: below the ~"
                       f"{self._floor * 1000.0:.1f}ms dispatch floor "
                       f"(raw wall {raw * 1000.0:.2f}ms)")
            else:
                msg = f"Time on {self.name}: {adj * 1000.0:.3f}ms"
                if self._floor > raw * 0.1:
                    msg += (f" (raw wall {raw * 1000.0:.2f}ms incl. "
                            f"~{self._floor * 1000.0:.1f}ms dispatch floor)")
                if self.rays:
                    mrays = self.rays / (adj * self.report_every) / 1e6
                    msg += f" ({mrays:.1f} Mrays/s)"
            print(msg)
            self.accum = 0.0
            self.rays = 0


@contextlib.contextmanager
def trace(logdir: str = "/tmp/vokselis-trace"):
    """Capture a jax.profiler device trace around a block."""
    import jax

    with jax.profiler.trace(logdir):
        yield
    print(f"profiler trace written to {logdir}")
