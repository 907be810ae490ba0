"""SimpleBaseline pose ResNet in flax (NHWC) — the HRNet-family codebase's
second model family (reference expected path ``lib/models/pose_resnet.py``;
the RSGNet repo forks Microsoft's ``deep-high-resolution-net.pytorch`` layout,
which ships SimpleBaselines [Xiao et al., ECCV 2018] alongside pose_hrnet —
SURVEY.md §1/[K]; mount empty all rounds, architecture pinned to the public
paper + the independent torch oracle ``tests/torch_resnet.py``).

Architecture: ResNet-{18,34,50,101,152} backbone (7x7-s2 stem + 3x3-s2
maxpool + 4 block stages at channels 64/128/256/512) -> NUM_DECONV_LAYERS
transposed convs (kernel 4, stride 2: 1/32 -> 1/4 resolution) each followed
by BN + ReLU -> FINAL_CONV_KERNEL conv to K heatmaps.

TPU-first choices (same rules as ``models/hrnet.py``):

- NHWC layout; params fp32, compute dtype configurable (bf16 hits the MXU).
- The transposed conv is expressed as ``nn.Conv`` with ``input_dilation=2``
  and explicit padding ``(k-1-p, k-1-p+op)`` — the construction is
  mathematically the same operator as torch
  ``ConvTranspose2d(k, stride=2, padding=p, output_padding=op)`` with a
  spatially-flipped kernel. Test backing: bitwise equality vs
  ``lax.conv_transpose`` within JAX for every kernel size the reference
  supports (4/3/2, ``tests/test_torch_resnet_oracle.py::
  test_deconv_construction_bitwise_vs_lax_conv_transpose``) and <=1e-4 fp32
  cross-framework parity vs torch. XLA lowers this to the same fused
  conv-with-lhs-dilation it would emit for ``conv_transpose``, so there is no
  perf cliff, and the layout stays a plain HWIO conv kernel the converter can
  round-trip (``utils/torch_convert.resnet_key_map``).
- BatchNorm statistics stay fp32 (``ConvBN``).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from rsgnet_tpu.config.defaults import Config
from rsgnet_tpu.models.hrnet import BLOCKS, BN_MOMENTUM, ConvBN

# depth -> (block type, blocks per stage) — public ResNet spec
RESNET_SPEC = {
    18: ("BASIC", (2, 2, 2, 2)),
    34: ("BASIC", (3, 4, 6, 3)),
    50: ("BOTTLENECK", (3, 4, 6, 3)),
    101: ("BOTTLENECK", (3, 4, 23, 3)),
    152: ("BOTTLENECK", (3, 8, 36, 3)),
}

# kernel -> (torch padding, torch output_padding), the reference's
# _get_deconv_cfg table; all three produce an exact 2x spatial upsample
DECONV_CFG = {4: (1, 0), 3: (1, 1), 2: (0, 0)}


class DeconvBN(nn.Module):
    """ConvTranspose2d(k, s=2, p, op) + BN + ReLU, as a dilated-input conv.

    The kernel is stored pre-flipped relative to torch's ConvTranspose2d
    weight (the converter applies the spatial flip), so at runtime this is a
    single ordinary conv over the 2x zero-dilated input.
    """
    features: int
    kernel: int = 4
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        if k not in DECONV_CFG:
            raise ValueError(f"unsupported deconv kernel {k}; the reference "
                             f"supports {sorted(DECONV_CFG)}")
        p, op = DECONV_CFG[k]
        x = nn.Conv(self.features, (k, k), strides=(1, 1),
                    padding=[(k - 1 - p, k - 1 - p + op)] * 2,
                    input_dilation=(2, 2), use_bias=self.use_bias,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class PoseResNet(nn.Module):
    """ResNet backbone + deconv head + heatmap conv (reference
    ``get_pose_net`` for MODEL.NAME=pose_resnet)."""
    cfg: Config

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.DTYPE == "bfloat16" else jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        extra = cfg.MODEL.EXTRA
        block_name, stage_blocks = RESNET_SPEC[extra.NUM_LAYERS]
        blk = BLOCKS[block_name]
        x = x.astype(self.dtype)

        # stem: 7x7 stride-2 conv (pad 3) + BN + ReLU, 3x3 stride-2 maxpool;
        # MODEL.S2D_STEM re-expresses the C_in=3 conv exactly via
        # space-to-depth (hrnet.py::_space_to_depth_conv)
        x = ConvBN(64, 7, 2, dtype=self.dtype, s2d=cfg.MODEL.S2D_STEM,
                   name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # layer1..4: channel widths 64/128/256/512, stride 1/2/2/2; the
        # blocks create their own 1x1 downsample projection when the stride
        # or channel count changes (same condition as torch _make_layer)
        for li, num_blocks in enumerate(stage_blocks, start=1):
            width = 64 * (2 ** (li - 1))
            stride = 1 if li == 1 else 2
            for b in range(num_blocks):
                x = blk(width, stride=stride if b == 0 else 1,
                        dtype=self.dtype, name=f"layer{li}_{b}")(x, train)

        # deconv head: 1/32 -> 1/4 with three 2x transposed convs by default
        for i in range(extra.NUM_DECONV_LAYERS):
            x = DeconvBN(extra.NUM_DECONV_FILTERS[i],
                         kernel=extra.NUM_DECONV_KERNELS[i],
                         use_bias=extra.DECONV_WITH_BIAS,
                         dtype=self.dtype, name=f"deconv{i}")(x, train)

        feats = x.astype(jnp.float32)
        k = extra.FINAL_CONV_KERNEL
        pad = 1 if k == 3 else 0
        heatmaps = nn.Conv(cfg.MODEL.NUM_JOINTS, (k, k),
                           padding=[(pad, pad), (pad, pad)],
                           dtype=jnp.float32, name="final_layer")(feats)
        return heatmaps
