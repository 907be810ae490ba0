"""Subprocess-env helper: strip the axon site hook from CPU-only children.

The host image installs a ``sitecustomize`` via ``PYTHONPATH=/root/.axon_site``
that registers the tunneled-TPU PJRT plugin at EVERY interpreter start —
importing jax machinery and costing ~2 s per spawn (measured:
``python -c pass`` 2.0 s with the hook, 0.03 s without). Suite children all
force the CPU backend anyway, so the hook's work is thrown away; across the
~60 interpreters the default suite spawns (CLI smokes, bench-orchestrator
children, signal/worker subprocesses) that is ~2 minutes of pure startup.

``strip_axon_site(env)`` removes the hook path from PYTHONPATH. Use it for
any test child that does not need the real TPU tunnel."""
import os


def strip_axon_site(env=None):
    """Return a copy of ``env`` (default os.environ) with the axon site
    hook removed from PYTHONPATH. Other PYTHONPATH entries survive."""
    env = dict(os.environ if env is None else env)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(parts)
    return env
