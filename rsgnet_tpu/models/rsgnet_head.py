"""Relation-based skeleton-graph head (SURVEY.md §2.8 — highest-uncertainty
component; the reference mount was empty, so this is a from-scratch design
pinned to the capability contract in BASELINE.json:5: "the relation-based
skeleton graph message-passing head ... run as fused XLA kernels" and
BASELINE.json:10 "relation/skeleton-graph module enabled" for crowded scenes).

Design (TPU-first — every step is a batched matmul or fused elementwise op):

1. **Node pooling**: the initial heatmaps act as spatial attention; per
   keypoint k, a node embedding is the attention-weighted average of a
   projected feature map:  ``node[k] = softmax(hm_k) . proj(feat)``  — one
   (K, HW) x (HW, C) matmul per image, MXU-shaped.
2. **Instance relation ("target-awareness")**: a global instance embedding
   (masked global pooling of the feature map) modulates every node via FiLM
   (scale/shift), letting the head key onto the *target* person and suppress
   interfering people inside the crop — the crowded-scene mechanism the
   reference head exists for.
3. **Skeleton-graph message passing**: L rounds of graph convolution over the
   symmetric-normalized skeleton adjacency A (dataset-specific, COCO-17 or
   CrowdPose-14):  ``H <- relu(A H W_n + H W_s)``  — two (K, C) matmuls.
4. **Refinement**: node features are splatted back to the spatial grid
   through the same attention maps ((HW, K) x (K, C)), fused with the
   backbone features by a conv block, and regressed to a residual heatmap
   delta:  ``final = initial + delta``.

The head returns (final, initial); training supervises both (aux loss),
eval uses final.

DESIGN NOTES — deltas vs the AAAI-2021 RSGNet paper (for fast diffing if
the reference mount ever populates; every row below is a from-scratch
choice, NOT verified against the paper's math):

| Capability (paper abstract level)      | This design                       |
|----------------------------------------|-----------------------------------|
| target-person disambiguation in        | FiLM modulation of node embeds    |
| crowded crops ("relation" modeling)    | from a global instance embedding  |
| skeleton-structured message passing    | L rounds of GCN over the          |
|                                        | symmetric-normalized adjacency    |
| keypoint node representations          | heatmap-softmax attention pooling |
|                                        | of projected backbone features    |
| heatmap refinement                     | residual delta conv on features   |
|                                        | + splatted node context           |
| two-branch supervision                 | aux loss on the initial heatmaps  |
|                                        | (0.5 weight), final supervised 1x |

Efficacy evidence: tests/test_rsg_efficacy.py trains tiny RSGNet on a
synthetic crowded-scene fixture (two overlapping SAME-appearance persons,
target centered) and asserts (paired, seed-robust) that the head's refined
FINAL heatmaps disambiguate the target far better than the same backbone's
pre-refinement INITIAL heatmaps (disamb ~0.89 vs ~0.65-0.72), and better
than a fully-supervised plain tiny HRNet (~0.77) — the crowded-scene
benefit the head exists for (BASELINE.json:10). If the mount populates,
re-verify this module FIRST (SURVEY.md §2.8 flags it as the
highest-uncertainty component).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from rsgnet_tpu.models.hrnet import ConvBN


class SkeletonGCNLayer(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, nodes, adj):
        """nodes: (B, K, C); adj: (K, K) normalized skeleton adjacency."""
        neigh = jnp.einsum("kj,bjc->bkc", adj, nodes)
        msg = nn.Dense(self.features, dtype=self.dtype, name="w_neigh")(neigh)
        self_ = nn.Dense(self.features, dtype=self.dtype, name="w_self")(nodes)
        return nn.relu(msg + self_)


class RSGHead(nn.Module):
    """Relation/skeleton-graph refinement head."""
    num_joints: int
    adjacency: Any                  # (K, K) numpy array, closed over statically
    node_channels: int = 64
    relation_channels: int = 64
    gcn_layers: int = 2
    refine_blocks: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, initial_heatmaps, train: bool = False):
        """feats: (B, H, W, C) fp32 backbone features;
        initial_heatmaps: (B, H, W, K). Returns (final, initial)."""
        b, h, w, c = feats.shape
        k = self.num_joints
        cn = self.node_channels
        adj = jnp.asarray(self.adjacency, jnp.float32)

        # 1. node pooling via heatmap attention
        attn = jnp.reshape(initial_heatmaps, (b, h * w, k))
        attn = jnp.transpose(attn, (0, 2, 1))                    # (B, K, HW)
        attn = nn.softmax(attn, axis=-1)
        proj = nn.Conv(cn, (1, 1), dtype=self.dtype, name="node_proj")(feats)
        proj_flat = jnp.reshape(proj, (b, h * w, cn))
        nodes = jnp.einsum("bkp,bpc->bkc", attn,
                           proj_flat.astype(jnp.float32))        # (B, K, Cn)

        # 2. instance-relation FiLM modulation from a global embedding
        g = jnp.mean(feats, axis=(1, 2))                          # (B, C)
        g = nn.relu(nn.Dense(self.relation_channels, dtype=self.dtype,
                             name="rel_fc1")(g))
        film = nn.Dense(2 * cn, dtype=self.dtype, name="rel_film")(g)
        scale, shift = jnp.split(film.astype(jnp.float32), 2, axis=-1)
        nodes = nodes * (1.0 + scale[:, None, :]) + shift[:, None, :]

        # 3. skeleton-graph message passing
        for i in range(self.gcn_layers):
            nodes = SkeletonGCNLayer(cn, dtype=self.dtype,
                                     name=f"gcn{i}")(nodes, adj)

        # 4. splat node context back to the grid and refine
        ctx = jnp.einsum("bkp,bkc->bpc", attn, nodes)             # (B, HW, Cn)
        ctx = jnp.reshape(ctx, (b, h, w, cn))
        y = jnp.concatenate([feats.astype(self.dtype),
                             ctx.astype(self.dtype)], axis=-1)
        for i in range(self.refine_blocks):
            # same conv/bn/relu recipe as the backbone — reuse ConvBN so BN
            # settings / dtype policy stay defined in one place
            y = ConvBN(cn, 3, 1, dtype=self.dtype,
                       name=f"refine{i}")(y, train)
        delta = nn.Conv(k, (1, 1), dtype=jnp.float32, name="delta")(y)
        final = initial_heatmaps + delta.astype(jnp.float32)
        return final, initial_heatmaps
