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
import time as _time  # noqa: E402

_SUITE_T0 = _time.time()
_BUDGET_MIN = 15.0


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    dt_min = (_time.time() - _SUITE_T0) / 60.0
    note = ""
    if dt_min > _BUDGET_MIN and not os.environ.get("RSGNET_SLOW_TESTS"):
        note = (f" — OVER the {_BUDGET_MIN:.0f}-min default-suite budget; "
                "move the slowest residents to RSGNET_SLOW_TESTS")
    terminalreporter.write_line(
        f"[rsgnet] suite wall time: {dt_min:.1f} min{note}")
