"""Tracing/profiling utilities (SURVEY.md §5.1-5.2).

The reference has only AverageMeter timers + TensorBoard scalars; here:

- ``device_timer``: wall-time a device computation correctly (fences with
  ``jax.block_until_ready`` — dispatch is async, naive timing lies).
- ``trace``: context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory for xprof.
- ``enable_nan_checks``: dev-mode ``jax_debug_nans`` toggle (the rebuild's
  answer to the reference's nonexistent sanitizer story).
- ``ThroughputMeter``: images/sec with warmup discard, used by bench + train.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def device_timer(result_holder: dict, key: str = "seconds"):
    """``with device_timer(out): r = fn(x); out['result'] = r`` — the exit
    fences on everything stored into the holder."""
    t0 = time.perf_counter()
    yield result_holder
    jax.block_until_ready(
        {k: v for k, v in result_holder.items() if k != key})
    result_holder[key] = time.perf_counter() - t0


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


class StepTraceWindow:
    """Capture an xprof trace of steps ``[start, start+n_steps)`` of an
    async-dispatched loop (train steps, eval batches).

    The loop calls ``step(i, fence)`` at the TOP of iteration ``i`` with a
    pytree of device values whose completion marks the PREVIOUS iterations
    done, and ``close(fence)`` after the loop — in a ``finally`` clause, so
    a loop that raises mid-window still flushes the partial trace instead
    of leaking the process-wide profiler session. Both trace edges fence
    (``jax.block_until_ready``) so the window contains whole steps —
    dispatch is async and an unfenced edge would clip a step's tail into or
    out of the trace. ``start`` defaults to 1 so step 0 (compilation +
    warmup) stays out of the profile.
    """

    def __init__(self, logdir: str, n_steps: int, start: int = 1,
                 logger=None):
        self.logdir = logdir
        self.n_steps = max(1, int(n_steps))
        self.start = start
        self.logger = logger
        self._stop_at = None      # step index at whose top to stop
        self._done = False

    def step(self, i: int, fence):
        if self._stop_at is not None and i == self._stop_at:
            self._finish(fence)
        if not self._done and self._stop_at is None and i == self.start:
            jax.block_until_ready(fence)
            try:
                jax.profiler.start_trace(self.logdir)
            except Exception as e:          # profiling must never kill a run
                self._done = True
                if self.logger:
                    self.logger.warning("profiler trace unavailable on this "
                                        "backend (%s) — continuing without",
                                        e)
                return
            self._stop_at = i + self.n_steps

    def close(self, fence):
        """Stop the trace if the loop ended (or raised) inside the window;
        explain a trace that never got the chance to start."""
        if self._stop_at is not None:
            self._finish(fence)
        elif not self._done and self.logger:
            self.logger.warning(
                "profiler trace never started: the loop ended before step "
                "%d (steps 0..%d are excluded as compile/warmup) — use a "
                "smaller batch or a larger dataset to profile", self.start,
                self.start - 1)

    def _finish(self, fence):
        try:
            jax.block_until_ready(fence)
        finally:
            # stop even if the fence itself is poisoned (loop raised):
            # leaving the process-wide profiler session open would break
            # every later start_trace in this process
            self._stop_at = None
            self._done = True
            jax.profiler.stop_trace()
        if self.logger:
            self.logger.info("profiler trace (<=%d steps) written to %s",
                             self.n_steps, self.logdir)


class ThroughputMeter:
    """Images/sec over fenced step timings; first ``skip`` steps discarded
    (compile + cache warmup)."""

    def __init__(self, skip: int = 2):
        self.skip = skip
        self.steps = 0
        self.images = 0
        self.seconds = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, batch_size: int, fence=None):
        if fence is not None:
            jax.block_until_ready(fence)
        dt = time.perf_counter() - self._t0
        self.steps += 1
        if self.steps > self.skip:
            self.images += batch_size
            self.seconds += dt
        return dt

    @property
    def images_per_sec(self) -> float:
        return self.images / self.seconds if self.seconds else 0.0
