"""rsgnet_tpu — a TPU-native (JAX/XLA/Pallas) top-down human-pose-estimation framework.

Brand-new implementation with the capabilities of the reference stack
``vikki-dai/RSGNet`` (HRNet-style multi-resolution backbone + relation-based
skeleton-graph head + heatmap regression), redesigned TPU-first:

- NHWC tensors, bf16-friendly convs scheduled on the MXU by XLA;
- the entire preprocessing path (bbox-conditioned affine crop, normalize,
  flip, Gaussian-heatmap target generation) fused on-device;
- inference hot transforms (flip-test averaging, sub-pixel/DARK decode,
  OKS-NMS) as vectorized device code;
- data-parallel training over an ICI mesh via ``jax.sharding`` + ``jit``.

Reference layout mapping (see SURVEY.md §2 — the reference mount was empty,
component numbers cite the survey inventory):

=========================  =================================
reference (SURVEY §2)       rsgnet_tpu
=========================  =================================
lib/utils/transforms.py     ops/affine.py, ops/flip.py
lib/dataset/                data/
lib/models/pose_hrnet.py    models/hrnet.py
lib/models/pose_resnet.py   models/pose_resnet.py
RSGNet head (§2.8)          models/rsgnet_head.py
lib/core/                   core/
lib/nms/ (native)           ops/nms.py + csrc/oks_nms.cpp
lib/config/                 config/
tools/                      tools/
=========================  =================================
"""

__version__ = "0.1.0"
