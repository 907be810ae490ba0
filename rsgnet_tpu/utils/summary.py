"""Model summary (reference ``get_model_summary``, SURVEY.md §2.19):
parameter counts per top-level module + compiled-program cost analysis
(FLOPs / bytes from XLA, replacing the reference's hook-based op counting)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def count_params(tree) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))


def get_model_summary(cfg, model, variables=None, batch_size: int = 1) -> str:
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    x = jnp.zeros((batch_size, h, w, 3), jnp.float32)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
    lines = [f"model: {cfg.MODEL.NAME}  input: {batch_size}x{h}x{w}x3"]
    total = 0
    for name, sub in sorted(variables["params"].items()):
        n = count_params(sub)
        total += n
        lines.append(f"  {name:<24s} {n / 1e6:8.3f} M params")
    lines.append(f"  {'TOTAL':<24s} {total / 1e6:8.3f} M params")
    try:
        lowered = jax.jit(
            lambda v, x: model.apply(v, x, train=False)).lower(variables, x)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if cost:
            flops = cost.get("flops", 0.0)
            lines.append(f"  forward FLOPs (XLA): {flops / 1e9:.2f} G "
                         f"({flops / batch_size / 1e9:.2f} G/image)")
        mem = compiled.memory_analysis()
        if mem is not None:
            lines.append(
                f"  memory (XLA): {mem.argument_size_in_bytes / 1e6:.1f} MB "
                f"args + {mem.temp_size_in_bytes / 1e6:.1f} MB temp + "
                f"{mem.output_size_in_bytes / 1e6:.1f} MB out")
    except Exception:   # cost/memory analysis is best-effort across backends
        pass
    return "\n".join(lines)
