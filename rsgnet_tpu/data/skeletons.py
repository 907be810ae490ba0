"""Dataset keypoint definitions: COCO-17, CrowdPose-14 and MPII-16.

Centralizes what the reference scatters across ``lib/dataset/coco.py`` /
``crowdpose.py`` and ``lib/nms/nms.py`` (SURVEY.md §2.10, §2.11, §2.14):
flip pairs, OKS sigmas, skeleton edges (used by the relation/skeleton-graph
head), upper/lower-body splits for the half-body transform, and per-joint
loss weights.
"""
from __future__ import annotations

import numpy as np

from rsgnet_tpu.ops.flip import flip_pair_permutation


class KeypointSpec:
    def __init__(self, name, num_joints, flip_pairs, sigmas, skeleton,
                 upper_body_ids, joints_weight):
        self.name = name
        self.num_joints = num_joints
        self.flip_pairs = flip_pairs
        self.sigmas = np.asarray(sigmas, np.float32)
        self.skeleton = skeleton                       # list of (a, b) edges
        self.upper_body_ids = tuple(upper_body_ids)
        self.lower_body_ids = tuple(
            i for i in range(num_joints) if i not in upper_body_ids)
        self.joints_weight = np.asarray(joints_weight, np.float32)
        self.flip_perm = flip_pair_permutation(num_joints, flip_pairs)

    def adjacency(self, self_loops=True, normalize=True):
        """Symmetric-normalized skeleton adjacency for graph message passing."""
        a = np.zeros((self.num_joints, self.num_joints), np.float32)
        for i, j in self.skeleton:
            a[i, j] = 1.0
            a[j, i] = 1.0
        if self_loops:
            a += np.eye(self.num_joints, dtype=np.float32)
        if normalize:
            d = np.maximum(a.sum(1), 1e-6)
            dinv = 1.0 / np.sqrt(d)
            a = a * dinv[:, None] * dinv[None, :]
        return a


# COCO order: nose, l/r eye, l/r ear, l/r shoulder, l/r elbow, l/r wrist,
# l/r hip, l/r knee, l/r ankle
COCO = KeypointSpec(
    name="coco",
    num_joints=17,
    flip_pairs=[(1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14),
                (15, 16)],
    sigmas=[.026, .025, .025, .035, .035, .079, .079, .072, .072, .062, .062,
            .107, .107, .087, .087, .089, .089],
    skeleton=[(15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11),
              (6, 12), (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2),
              (0, 1), (0, 2), (1, 3), (2, 4), (3, 5), (4, 6)],
    upper_body_ids=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10),
    joints_weight=[1., 1., 1., 1., 1., 1., 1., 1.2, 1.2, 1.5, 1.5, 1., 1.,
                   1.2, 1.2, 1.5, 1.5],
)

# CrowdPose order: l/r shoulder, l/r elbow, l/r wrist, l/r hip, l/r knee,
# l/r ankle, top head, neck
CROWDPOSE = KeypointSpec(
    name="crowdpose",
    num_joints=14,
    flip_pairs=[(0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (10, 11)],
    sigmas=[.079, .079, .072, .072, .062, .062, .107, .107, .087, .087, .089,
            .089, .079, .079],
    skeleton=[(12, 13), (13, 0), (13, 1), (0, 2), (2, 4), (1, 3), (3, 5),
              (0, 6), (1, 7), (6, 7), (6, 8), (8, 10), (7, 9), (9, 11)],
    upper_body_ids=(0, 1, 2, 3, 4, 5, 12, 13),
    joints_weight=[1., 1., 1.2, 1.2, 1.5, 1.5, 1., 1., 1.2, 1.2, 1.5, 1.5,
                   1., 1.],
)

# MPII order: r ankle, r knee, r hip, l hip, l knee, l ankle, pelvis,
# thorax, upper neck, head top, r wrist, r elbow, r shoulder, l shoulder,
# l elbow, l wrist (reference ``lib/dataset/mpii.py`` [K]).
# MPII's benchmark metric is PCKh (no OKS), so it defines no per-joint OKS
# sigmas; a uniform 0.079 keeps sigma-consuming API paths (device OKS-NMS)
# usable if ever pointed at MPII instances. Eval never reads them.
MPII = KeypointSpec(
    name="mpii",
    num_joints=16,
    flip_pairs=[(0, 5), (1, 4), (2, 3), (10, 15), (11, 14), (12, 13)],
    sigmas=[.079] * 16,
    skeleton=[(0, 1), (1, 2), (2, 6), (6, 3), (3, 4), (4, 5), (6, 7),
              (7, 8), (8, 9), (7, 12), (12, 11), (11, 10), (7, 13),
              (13, 14), (14, 15)],
    upper_body_ids=(7, 8, 9, 10, 11, 12, 13, 14, 15),
    joints_weight=[1.] * 16,
)

SPECS = {"coco": COCO, "crowdpose": CROWDPOSE, "mpii": MPII}


def get_spec(name: str) -> KeypointSpec:
    return SPECS[name.lower()]
