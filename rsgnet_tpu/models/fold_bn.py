"""Eval-time BatchNorm folding (VERDICT round-4 item 7, measured A/B).

Folds each inference-mode BN affine into the adjacent conv kernel:

    conv(x, K) -> BN_eval  ==  conv(x, K * g/sqrt(v+eps)) -> (+ b - m*g/sqrt(v+eps))

Exact up to fp32 rounding. Implemented as VARIABLE surgery (host-side,
once, before the eval loop): every ``{conv: {kernel}, bn: {scale, bias}}``
sibling pair in the params tree — the ``ConvBN`` pattern every backbone
block uses (models/hrnet.py, models/pose_resnet.py) — gets its kernel
pre-scaled, the effective bias moved into ``bn.bias``, and the BN leaves
rewritten to the identity transform (scale=1, mean=0, var=1-eps), so the
module graph is untouched and the SAME jitted program serves folded and
unfolded variables.

Expected-outcome note (BENCH_NOTES round 5): XLA already fuses the eval
BN affine into the conv's output fusion, and with non-constant weights it
cannot constant-fold the multiply either way — so this knob's win, if any,
is from removing the per-channel rescale DEPENDENCY chain, not an HBM
pass. Measured on chip by tools/profile_fold_bn.py; the default follows
the measurement (cfg.TEST.FOLD_BN).
"""
from __future__ import annotations

import numpy as np

BN_EPS = 1e-5


def _is_convbn(params_node, stats_node):
    return (isinstance(params_node, dict)
            and isinstance(params_node.get("conv"), dict)
            and "kernel" in params_node["conv"]
            # a conv with its OWN bias would need beta' = beta +
            # (conv_bias - mean) * f — no such pattern exists in this repo
            # (every ConvBN conv is use_bias=False), so skip rather than
            # silently mis-fold if one ever appears
            and "bias" not in params_node["conv"]
            and isinstance(params_node.get("bn"), dict)
            and "scale" in params_node["bn"]
            and "bias" in params_node["bn"]
            and isinstance(stats_node, dict)
            and isinstance(stats_node.get("bn"), dict)
            and "mean" in stats_node["bn"]
            and "var" in stats_node["bn"])


def fold_bn_variables(variables, eps: float = BN_EPS):
    """Return a new ``{params, batch_stats}`` pytree with every ConvBN
    pair folded (see module docstring). Input trees are not mutated;
    leaves are host numpy arrays in the result (device placement is the
    caller's existing job). Idempotent: folding twice is a no-op."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    n_folded = 0

    def walk(p, s):
        nonlocal n_folded
        if not isinstance(p, dict):
            return p, s
        new_p = {}
        # seed the stats result with EVERY original stats key: stats-only
        # subtrees (a skipped BN's mean/var, anything params-free) survive
        # untouched; recursion below only REPLACES entries that get folded
        new_s = dict(s) if isinstance(s, dict) else s
        for key, child in p.items():
            child_s = s.get(key, {}) if isinstance(s, dict) else {}
            if _is_convbn(child, child_s):
                kernel = np.asarray(child["conv"]["kernel"], np.float32)
                scale = np.asarray(child["bn"]["scale"], np.float32)
                bias = np.asarray(child["bn"]["bias"], np.float32)
                mean = np.asarray(child_s["bn"]["mean"], np.float32)
                var = np.asarray(child_s["bn"]["var"], np.float32)
                f = scale / np.sqrt(var + np.float32(eps))
                sub_p = dict(child)
                sub_p["conv"] = dict(child["conv"], kernel=kernel * f)
                sub_p["bn"] = dict(child["bn"],
                                   scale=np.ones_like(scale),
                                   bias=bias - mean * f)
                sub_s = dict(child_s)
                sub_s["bn"] = dict(child_s["bn"],
                                   mean=np.zeros_like(mean),
                                   var=np.full_like(var, 1.0 - eps))
                # recurse into any OTHER children of this node (e.g. a
                # downsample block living beside conv/bn)
                for k2, v2 in child.items():
                    if k2 in ("conv", "bn"):
                        continue
                    rp, rs = walk(v2, child_s.get(k2, {})
                                  if isinstance(child_s, dict) else {})
                    sub_p[k2] = rp
                    if isinstance(child_s, dict) and k2 in child_s:
                        sub_s[k2] = rs
                new_p[key], new_s[key] = sub_p, sub_s
                n_folded += 1
            else:
                cp, cs = walk(child, child_s)
                new_p[key] = cp
                if isinstance(s, dict) and key in s:
                    new_s[key] = cs
        return new_p, new_s

    new_params, new_stats = walk(params, stats)
    out = dict(variables)
    out["params"] = new_params
    out["batch_stats"] = new_stats
    return out


def count_convbn(variables) -> int:
    """Number of foldable ConvBN pairs (for tests/tools)."""
    n = 0

    def walk(p, s):
        nonlocal n
        if not isinstance(p, dict):
            return
        for key, child in p.items():
            child_s = s.get(key, {}) if isinstance(s, dict) else {}
            if _is_convbn(child, child_s):
                n += 1
                for k2, v2 in child.items():
                    if k2 not in ("conv", "bn"):
                        walk({k2: v2}, {k2: child_s.get(k2, {})})
            else:
                walk(child, child_s)

    walk(variables["params"], variables.get("batch_stats", {}))
    return n
