"""Test harness config: force the CPU backend with 8 virtual devices.

Per SURVEY.md §4(3): CI needs no TPU — everything runs on the CPU backend,
and multi-chip sharding logic is exercised against a virtual 8-device mesh
via ``--xla_force_host_platform_device_count=8``. Must run before jax import.
"""
import os

# NOTE: the axon site hook (PYTHONPATH=/root/.axon_site) re-pins
# JAX_PLATFORMS=axon at interpreter startup, so the env var alone is not
# enough — jax.config.update('jax_platforms', ...) after import wins.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
_tok = "--xla_force_host_platform_device_count"
if _tok in _flags:
    # a pre-existing pin may name a SMALLER count — replace it, don't keep it
    import re as _re
    os.environ["XLA_FLAGS"] = _re.sub(rf"{_tok}=\d+", f"{_tok}=8", _flags)
else:
    os.environ["XLA_FLAGS"] = f"{_flags} {_tok}=8".strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite's wall time is dominated by XLA:CPU
# recompiling the same tiny-model programs on every run (VERDICT round-2
# item 9). With the cache, repeat runs load AOT results instead
# (measured 28.9s -> 5.3s for the tiny train step). XLA:CPU logs noisy
# machine-feature-comparison warnings when loading AOT entries (string-picky
# feature-set diff on the SAME machine); any genuinely bad entry fails tests
# loudly against the NumPy oracles rather than passing silently. Set
# RSGNET_NO_COMPILE_CACHE=1 to disable (e.g. to measure true compile time).
from rsgnet_tpu.utils.compile_cache import wire as _wire_cache  # noqa: E402

_wire_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_compile_cache"))

# NOTE: x64 stays OFF — the library must behave identically under the f32-only
# TPU semantics; NumPy oracles use float64 on their own side where needed.

# Default-suite wall-time budget (VERDICT round-3 item 7): the report line
# below makes budget creep visible in every run's log; heavyweight tests
# belong in the RSGNET_SLOW_TESTS tier once the default run exceeds it.
#
# HOST-SPEED CALIBRATION (round 5): this VM's effective CPU speed swings
# ~1.5x with hypervisor-level contention invisible to `uptime` — measured
# 2026-08-21: `python -c pass` 2.0 s vs 3.1 s hours apart on a zero-load
# box, and the IDENTICAL suite 14.9 vs 21.5 min. Raw wall time therefore
# cannot distinguish budget creep (new slow tests) from a slow host
# window. The budget check normalizes by a startup probe: one interpreter
# spawn (axon site hook included — its jax import is the probe's work),
# referenced to the 2.0 s fast-window measurement that produced the
# 14.9-min budget-met run. Both numbers print; only the normalized one
# gates the OVER warning.
import subprocess as _subprocess  # noqa: E402
import sys as _sys  # noqa: E402
import time as _time  # noqa: E402

_SUITE_T0 = _time.time()
_BUDGET_MIN = 15.0
_REF_STARTUP_S = 2.0          # fast-window `python -c pass` (2026-08-21)


def _startup_probe() -> float:
    best = float("inf")
    for _ in range(2):
        t0 = _time.perf_counter()
        _subprocess.run([_sys.executable, "-c", "pass"], check=True)
        best = min(best, _time.perf_counter() - t0)
    return best


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    dt_min = (_time.time() - _SUITE_T0) / 60.0
    try:
        calib = _startup_probe()
    except Exception:
        calib = _REF_STARTUP_S
    host_factor = max(calib / _REF_STARTUP_S, 1e-3)
    norm_min = dt_min / host_factor
    note = ""
    if norm_min > _BUDGET_MIN and not os.environ.get("RSGNET_SLOW_TESTS"):
        note = (f" — OVER the {_BUDGET_MIN:.0f}-min default-suite budget "
                "at reference host speed; move the slowest residents to "
                "RSGNET_SLOW_TESTS")
    terminalreporter.write_line(
        f"[rsgnet] suite wall time: {dt_min:.1f} min raw; host "
        f"{host_factor:.2f}x the reference speed (startup probe "
        f"{calib:.2f}s vs {_REF_STARTUP_S:.1f}s) -> {norm_min:.1f} min "
        f"normalized{note}")
