"""Put the repo root on sys.path so ``rsgnet_tpu`` imports from a source
checkout (reference ``tools/_init_paths.py``, SURVEY.md §2.3)."""
import os
import os.path as osp
import sys

repo_root = osp.abspath(osp.join(osp.dirname(__file__), ".."))
if repo_root not in sys.path:
    sys.path.insert(0, repo_root)

# Some environments pin the jax platform via a site hook that overrides the
# JAX_PLATFORMS env var; RSGNET_FORCE_PLATFORM wins over both (used by CI to
# force the CPU backend).
_forced = os.environ.get("RSGNET_FORCE_PLATFORM")
if _forced:
    import jax
    jax.config.update("jax_platforms", _forced)
