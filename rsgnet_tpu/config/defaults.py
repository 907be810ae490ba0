"""Typed config tree mirroring the reference yacs schema (SURVEY.md §2.4-2.6).

The reference (`lib/config/default.py`) builds a yacs ``CfgNode`` merged with
experiment YAML + argparse overrides. Here the same tree is typed dataclasses
with **identical key names and default values**, so reference experiment YAMLs
port 1:1 (``load_config`` consumes them directly).

Topology-as-data is preserved: MODEL.EXTRA carries the STAGE2/3/4 dicts that
fully determine the HRNet variant (W32/W48 are pure config).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple


@dataclass
class StageConfig:
    NUM_MODULES: int = 1
    NUM_BRANCHES: int = 2
    NUM_BLOCKS: Tuple[int, ...] = (4, 4)
    NUM_CHANNELS: Tuple[int, ...] = (32, 64)
    BLOCK: str = "BASIC"
    FUSE_METHOD: str = "SUM"


def _w32_extra():
    return ModelExtra(
        STAGE2=StageConfig(1, 2, (4, 4), (32, 64)),
        STAGE3=StageConfig(4, 3, (4, 4, 4), (32, 64, 128)),
        STAGE4=StageConfig(3, 4, (4, 4, 4, 4), (32, 64, 128, 256)),
    )


@dataclass
class ModelExtra:
    PRETRAINED_LAYERS: Tuple[str, ...] = ("*",)
    FINAL_CONV_KERNEL: int = 1
    STAGE2: StageConfig = field(default_factory=StageConfig)
    STAGE3: StageConfig = field(
        default_factory=lambda: StageConfig(4, 3, (4, 4, 4), (32, 64, 128)))
    STAGE4: StageConfig = field(
        default_factory=lambda: StageConfig(3, 4, (4, 4, 4, 4),
                                            (32, 64, 128, 256)))
    # pose_resnet (SimpleBaseline) keys — the reference keeps per-model EXTRA
    # dicts in lib/config/models.py; here one dataclass carries both model
    # families' keys (each model reads only its own; STAGE* for pose_hrnet,
    # the NUM_LAYERS/DECONV_* group for pose_resnet)
    NUM_LAYERS: int = 50
    NUM_DECONV_LAYERS: int = 3
    NUM_DECONV_FILTERS: Tuple[int, ...] = (256, 256, 256)
    NUM_DECONV_KERNELS: Tuple[int, ...] = (4, 4, 4)
    DECONV_WITH_BIAS: bool = False


@dataclass
class RSGConfig:
    """Relation/skeleton-graph head knobs (reference §2.8; head is toggleable
    per BASELINE.json:10 'relation/skeleton-graph module enabled')."""
    ENABLED: bool = False
    NODE_CHANNELS: int = 64          # per-keypoint node embedding width
    GCN_LAYERS: int = 2              # skeleton-graph message-passing rounds
    RELATION_CHANNELS: int = 64      # instance-relation (global) embedding
    REFINE_BLOCKS: int = 1           # conv blocks fusing node context back


@dataclass
class ModelConfig:
    NAME: str = "pose_hrnet"
    INIT_WEIGHTS: bool = True
    PRETRAINED: str = ""
    NUM_JOINTS: int = 17
    TAG_PER_JOINT: bool = True
    TARGET_TYPE: str = "gaussian"
    IMAGE_SIZE: Tuple[int, int] = (192, 256)     # (w, h)
    HEATMAP_SIZE: Tuple[int, int] = (48, 64)     # (w, h)
    SIGMA: int = 2
    # TPU-native addition: execute the first stem conv (C_in=3, MXU-hostile)
    # as space-to-depth(2) + a smaller stride-1 conv with zero-padded
    # regrouped weights — same math to reduction-order rounding, identical
    # param tree (models/hrnet.py::_space_to_depth_conv). Applies to the
    # HRNet 3x3 stem and the pose_resnet 7x7 stem.
    S2D_STEM: bool = False
    # TPU-native addition: execute each HighResolutionModule's exchange-
    # fusion edges as merged wide dispatches — a source branch's 1x1
    # up-edges become ONE channel-concat conv (a genuinely wider MXU
    # matmul), and its down-chains advance level-by-level as shared-input
    # (level 0) / block-diagonal (deeper levels) merged convs with a single
    # fused BatchNorm over the concatenated channels. Same math to
    # reduction-order rounding, identical param tree (per-edge kernels and
    # BN params keep their ConvBN paths; models/hrnet.py::_merged_fusion).
    FUSE_MERGED: bool = False
    EXTRA: ModelExtra = field(default_factory=_w32_extra)
    RSG: RSGConfig = field(default_factory=RSGConfig)


@dataclass
class LossConfig:
    USE_OHKM: bool = False
    TOPK: int = 8
    USE_TARGET_WEIGHT: bool = True
    USE_DIFFERENT_JOINTS_WEIGHT: bool = False


@dataclass
class DatasetConfig:
    ROOT: str = ""
    DATASET: str = "coco"
    TRAIN_SET: str = "train2017"
    TEST_SET: str = "val2017"
    DATA_FORMAT: str = "jpg"
    HYBRID_JOINTS_TYPE: str = ""
    SELECT_DATA: bool = False
    FLIP: bool = True
    SCALE_FACTOR: float = 0.35
    ROT_FACTOR: float = 45.0
    PROB_HALF_BODY: float = 0.3
    NUM_JOINTS_HALF_BODY: int = 8
    COLOR_RGB: bool = True


@dataclass
class TrainConfig:
    LR_FACTOR: float = 0.1
    LR_STEP: Tuple[int, ...] = (170, 200)
    LR: float = 0.001
    OPTIMIZER: str = "adam"
    MOMENTUM: float = 0.9
    WD: float = 0.0001
    NESTEROV: bool = False
    GAMMA1: float = 0.99
    GAMMA2: float = 0.0
    BEGIN_EPOCH: int = 0
    END_EPOCH: int = 210
    RESUME: bool = False
    AUTO_RESUME: bool = True
    CHECKPOINT: str = ""
    BATCH_SIZE_PER_GPU: int = 32
    SHUFFLE: bool = True
    # TPU-native addition: rematerialize HRNet stages in the backward pass
    # (jax.checkpoint) — trades recompute FLOPs for activation HBM, enabling
    # larger per-chip batches.
    REMAT: bool = False
    # TPU-native addition: graceful preemption. On SIGTERM, finish the
    # in-flight step, write a MID-epoch checkpoint (batch_in_epoch payload
    # field) and return; AUTO_RESUME re-enters the same epoch at the same
    # batch, bitwise-identical to an uninterrupted run
    # (core/function.py::PreemptionGuard).
    PREEMPT_CHECKPOINT: bool = True
    # TPU-native addition: training input pipeline backend.
    # "threads" = in-process ThreadPool BatchLoader; "grain" = grain-backed
    # loader with worker processes (deterministic shuffle, checkpointable).
    LOADER: str = "threads"
    # TPU-native addition: train-time crop/rotation warp implementation.
    # "gather"  = 4-tap bilinear gather (bit-exact cv2.warpAffine semantics;
    #             ~1 elem/cycle on TPU — the round-1 train bottleneck).
    # "shear"   = roll-decomposed two-pass warp (ops/shear_warp.py): exact
    #             map and labels, MXU/VPU-only sampling; the interpolation
    #             footprint is a sheared bilinear, so rotated samples differ
    #             slightly from cv2 filtering (exact at rot 0/90/flips).
    # "pallas"  = the same two-pass warp fused into ONE Pallas kernel
    #             (ops/pallas/shear_warp.py): bit-identical outputs to
    #             "shear", whole warp in VMEM — removes the multi-stage
    #             HBM latency floor (CPU backend runs it interpreted).
    # "auto"    = resolve at trace time (ops/warp.py::resolve_train_warp):
    #             "pallas" on real TPU (measured +24% full-train-step
    #             throughput at B=128 — BENCH_NOTES "fused Pallas warp"),
    #             "shear" elsewhere (interpreted Pallas is debug-speed
    #             only). The kernel is SPMD-safe in every calling
    #             convention — shard_map'd when the data mesh is threaded
    #             through make_train_step, custom_partitioning-wrapped
    #             when it is not — so "auto" no longer gates on mesh.
    WARP: str = "auto"
    # TPU-native addition: serialize+write checkpoints in a background
    # thread (the device->host snapshot stays synchronous — the train step
    # donates the state buffers, so it must complete before the next step).
    # Off by default to keep the reference's durability semantics (the
    # checkpoint is on disk before the next epoch starts); recommended for
    # long multi-epoch runs where the per-epoch write stall matters.
    ASYNC_CHECKPOINT: bool = False


@dataclass
class TestConfig:
    BATCH_SIZE_PER_GPU: int = 32
    COCO_BBOX_FILE: str = ""
    BBOX_THRE: float = 1.0
    IMAGE_THRE: float = 0.0
    IN_VIS_THRE: float = 0.2
    MODEL_FILE: str = ""
    NMS_THRE: float = 1.0
    OKS_THRE: float = 0.9
    SOFT_NMS: bool = False
    FLIP_TEST: bool = True
    POST_PROCESS: bool = True
    SHIFT_HEATMAP: bool = True
    USE_GT_BBOX: bool = True
    BLUR_KERNEL: int = 11
    DECODE: str = "default"          # "default" (quarter-offset) | "dark"
    PALLAS_DECODE: bool = False      # fused Pallas DARK kernel (TPU-only)
    # Whole-dataset OKS-NMS as ONE device call. Default ON since round 3:
    # measured on the real TPU vs the C++ host greedy at 2000 images
    # (tools/profile_nms.py): device 1.10x/1.39x/1.47x faster at 4/8/20
    # instances per image, exact keep-set agreement (BENCH_NOTES.md).
    DEVICE_NMS: bool = True
    # TPU-native addition: eval input pipeline backend ("threads" = in-process
    # ThreadPool BatchLoader; "grain" = grain worker processes; cf.
    # TRAIN.LOADER)
    LOADER: str = "threads"
    # Eval-crop warp (the rot=0 source-canvas -> model-input resample inside
    # make_e2e_fn). All variants implement the same exact bilinear map
    # (cv2.warpAffine INTER_LINEAR rot=0 — the decomposition footprints
    # coincide with the axis-aligned bilinear at rot 0, and uint8 canvases
    # select exactly):
    # "separable" = two HIGHEST-precision MXU einsums (ops/warp.py)
    # "shear"     = roll-decomposed two-pass (ops/shear_warp.py)
    # "pallas"    = the two-pass warp fused in one VMEM kernel
    #               (ops/pallas/shear_warp.py)
    # Eval-time BatchNorm folding (models/fold_bn.py): fold every ConvBN
    # pair's BN affine into the conv kernel before the eval loop — exact up
    # to fp32 rounding, same jitted program. Default OFF: measured NEUTRAL
    # on chip (0.998x, 3 interleaved rounds — BENCH_NOTES round 5,
    # tools/profile_fold_bn.py): XLA already fuses the eval BN affine into
    # the conv's output fusion, so the fold removes no HBM pass. The knob
    # closes the question with a measurement; see the BENCH_NOTES numerics
    # note before enabling on a bf16 serving path.
    FOLD_BN: bool = False
    # "auto"      = currently "separable" on every backend.
    # Default: "separable" — MEASURED on chip (tools/profile_eval_warp.py,
    # 3 interleaved rounds @B=128, uncontended host): separable 1934-1952
    # vs pallas 1781-1800 img/s on the whole e2e program. The fused kernel
    # wins the warp in isolation but LOSES the composition: XLA overlaps
    # the separable warp's stages with the flip-test forwards, while the
    # opaque kernel serializes. (Opposite conclusion from TRAIN.WARP,
    # where pallas wins the full step by +24% — always A/B the whole
    # program.) All samplers agree with the gather ground truth on chip
    # (pallas 2.3e-4, separable 7.7e-4 normalized units).
    WARP: str = "separable"


@dataclass
class CudnnConfig:
    """Accepted-and-ignored: reference YAMLs carry a CUDNN section (cuDNN
    autotune/determinism knobs with no TPU counterpart); keeping the keys
    lets reference experiment files port 1:1."""
    BENCHMARK: bool = True
    DETERMINISTIC: bool = False
    ENABLED: bool = True


@dataclass
class DebugConfig:
    DEBUG: bool = False
    SAVE_BATCH_IMAGES_GT: bool = False
    SAVE_BATCH_IMAGES_PRED: bool = False
    SAVE_HEATMAPS_GT: bool = False
    SAVE_HEATMAPS_PRED: bool = False


@dataclass
class Config:
    OUTPUT_DIR: str = "output"
    LOG_DIR: str = "log"
    DATA_DIR: str = ""
    GPUS: Tuple[int, ...] = (0,)
    WORKERS: int = 4
    PRINT_FREQ: int = 100
    AUTO_RESUME: bool = True
    PIN_MEMORY: bool = True
    RANK: int = 0
    CUDNN: CudnnConfig = field(default_factory=CudnnConfig)
    MODEL: ModelConfig = field(default_factory=ModelConfig)
    LOSS: LossConfig = field(default_factory=LossConfig)
    DATASET: DatasetConfig = field(default_factory=DatasetConfig)
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    TEST: TestConfig = field(default_factory=TestConfig)
    DEBUG: DebugConfig = field(default_factory=DebugConfig)
    # TPU-native additions (not in the reference schema):
    DTYPE: str = "bfloat16"          # compute dtype for the conv stack
    MESH_DATA_AXIS: str = "data"     # name of the data-parallel mesh axis

    @property
    def aspect_ratio(self) -> float:
        return self.MODEL.IMAGE_SIZE[0] / self.MODEL.IMAGE_SIZE[1]


# Keys the schema accepts (so reference YAMLs port 1:1) but that nothing in
# this framework reads. Setting them to a non-default value gets a warning
# instead of silently changing nothing (SURVEY.md §5.6).
_ACCEPTED_UNREAD_KEYS = {
    "GPUS": "device selection is JAX's: training shards over ALL local "
            "devices (restrict with JAX_VISIBLE_DEVICES if needed)",
    "DATA_DIR": "the reference defines but never reads it either; dataset "
                "location comes from DATASET.ROOT",
    "TEST.BBOX_THRE": "detector boxes are filtered by TEST.IMAGE_THRE only",
    "TEST.NMS_THRE": "pose dedup uses OKS-NMS (TEST.OKS_THRE); there is no "
                     "bbox-IoU NMS stage in the top-down eval path",
    "CUDNN.BENCHMARK": "cuDNN knob with no TPU counterpart",
    "CUDNN.DETERMINISTIC": "cuDNN knob with no TPU counterpart",
    "CUDNN.ENABLED": "cuDNN knob with no TPU counterpart",
    "PIN_MEMORY": "host staging is managed by the prefetch loader",
    "RANK": "single-controller JAX runtime; no torch.distributed rank",
    "MODEL.TAG_PER_JOINT": "bottom-up (associative-embedding) leftover; the "
                           "reference top-down path never reads it either",
    "DATASET.DATA_FORMAT": "zip-archive inputs are auto-detected from "
                           "'archive.zip@/member' paths instead",
    "DATASET.HYBRID_JOINTS_TYPE": "reference dataset option not used by the "
                                  "COCO/CrowdPose configs",
    "TRAIN.GAMMA1": "the reference defines but never reads it (Adam runs on "
                    "default betas there too)",
    "TRAIN.GAMMA2": "the reference defines but never reads it",
}

# Keys that ARE semantically meaningful but for which only ONE value is
# implemented (matching the reference, which implements only these values
# as well) — any other value must fail loudly, not silently no-op.
_SINGLE_VALUE_KEYS = {
    "MODEL.TARGET_TYPE": "gaussian",
    "MODEL.EXTRA.STAGE2.FUSE_METHOD": "SUM",
    "MODEL.EXTRA.STAGE3.FUSE_METHOD": "SUM",
    "MODEL.EXTRA.STAGE4.FUSE_METHOD": "SUM",
}


def _merge(obj: Any, d: dict, path=""):
    """Recursively merge a plain dict (from YAML) into a dataclass tree."""
    for k, v in d.items():
        if not hasattr(obj, k):
            raise KeyError(f"unknown config key {path}{k}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _merge(cur, v, path + k + ".")
        else:
            if isinstance(cur, tuple) and isinstance(v, (list, tuple)):
                v = tuple(v)
            elif isinstance(cur, tuple) and isinstance(v, str):
                # reference YAMLs write tuples as '(0,1,2,3)' strings (yacs
                # convention); parse them so those files port unchanged
                v = tuple(int(t) if t.strip().isdigit() else t.strip()
                          for t in v.strip("()").split(",") if t.strip())
            full = path + k
            if full in _ACCEPTED_UNREAD_KEYS and v != cur:
                import warnings
                warnings.warn(
                    f"config key {full} is accepted for reference-YAML "
                    f"compatibility but read nowhere — setting it to {v!r} "
                    f"changes nothing ({_ACCEPTED_UNREAD_KEYS[full]})",
                    stacklevel=2)
            if full in _SINGLE_VALUE_KEYS and v != _SINGLE_VALUE_KEYS[full]:
                raise ValueError(
                    f"config key {full}={v!r}: only "
                    f"{_SINGLE_VALUE_KEYS[full]!r} is implemented (same as "
                    f"the reference); refusing to silently ignore it")
            setattr(obj, k, v)
    return obj


def update_config(cfg: Config, yaml_dict: dict) -> Config:
    """Merge a reference-style experiment YAML dict into ``cfg`` in place."""
    return _merge(cfg, yaml_dict)


def opts_to_dict(opts) -> dict:
    """argparse REMAINDER ``KEY VALUE`` pairs -> nested override dict
    (the reference's ``update_config(cfg, args.opts)``)."""
    import ast
    if len(opts) % 2:
        raise ValueError(f"override opts must be KEY VALUE pairs; got an "
                         f"odd-length list ending in {opts[-1]!r}")
    out: dict = {}
    for k, v in zip(opts[0::2], opts[1::2]):
        node = out
        parts = k.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        node[parts[-1]] = v
    return out


def load_config(yaml_path: Optional[str] = None, overrides: Optional[dict] = None) -> Config:
    """Build a Config from defaults + experiment YAML + override dict."""
    cfg = Config()
    if yaml_path:
        import yaml
        with open(yaml_path) as f:
            update_config(cfg, yaml.safe_load(f))
    if overrides:
        update_config(cfg, overrides)
    return cfg


# Canonical variants (reference experiments/coco/hrnet/*.yaml values)
def w32_256x192() -> Config:
    return Config()


def w48_384x288() -> Config:
    cfg = Config()
    cfg.MODEL.IMAGE_SIZE = (288, 384)
    cfg.MODEL.HEATMAP_SIZE = (72, 96)
    cfg.MODEL.SIGMA = 3
    cfg.MODEL.EXTRA = ModelExtra(
        STAGE2=StageConfig(1, 2, (4, 4), (48, 96)),
        STAGE3=StageConfig(4, 3, (4, 4, 4), (48, 96, 192)),
        STAGE4=StageConfig(3, 4, (4, 4, 4, 4), (48, 96, 192, 384)),
    )
    return cfg


def rsgnet_w32_256x192() -> Config:
    cfg = Config()
    cfg.MODEL.NAME = "pose_rsgnet"
    cfg.MODEL.RSG.ENABLED = True
    return cfg


def tiny_rsgnet() -> Config:
    """Miniature RSGNet topology for compile-speed-bound smoke/dryrun paths.

    Same module graph as the flagship (all stages, transitions, graph head),
    shrunk channels/blocks and a 64x48 input so the full train step compiles
    in seconds on the CPU backend.
    """
    cfg = Config()
    cfg.MODEL.NAME = "pose_rsgnet"
    cfg.MODEL.RSG.ENABLED = True
    cfg.MODEL.RSG.NODE_CHANNELS = 8
    cfg.MODEL.RSG.RELATION_CHANNELS = 8
    cfg.MODEL.IMAGE_SIZE = (64, 96)     # divisible by 32 (1/32 branch)
    cfg.MODEL.HEATMAP_SIZE = (16, 24)
    cfg.MODEL.EXTRA = ModelExtra(
        STAGE2=StageConfig(1, 2, (1, 1), (8, 16)),
        STAGE3=StageConfig(1, 3, (1, 1, 1), (8, 16, 32)),
        STAGE4=StageConfig(1, 4, (1, 1, 1, 1), (8, 16, 32, 64)),
    )
    cfg.DTYPE = "float32"
    return cfg


def res50_256x192() -> Config:
    """SimpleBaseline ResNet-50 @ 256x192 (reference
    experiments/coco/resnet/res50_256x192_d256x3_adam_lr1e-3.yaml values)."""
    cfg = Config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.EXTRA.NUM_LAYERS = 50
    return cfg


def tiny_resnet() -> Config:
    """Miniature pose_resnet for compile-speed-bound smoke tests: ResNet-18
    stage structure with the standard deconv head shrunk to 16 filters."""
    cfg = Config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.EXTRA.NUM_LAYERS = 18
    cfg.MODEL.EXTRA.NUM_DECONV_FILTERS = (16, 16, 16)
    cfg.MODEL.IMAGE_SIZE = (64, 96)
    cfg.MODEL.HEATMAP_SIZE = (16, 24)
    cfg.DTYPE = "float32"
    return cfg


def crowdpose_rsgnet_w32() -> Config:
    cfg = rsgnet_w32_256x192()
    cfg.MODEL.NUM_JOINTS = 14
    cfg.DATASET.DATASET = "crowdpose"
    cfg.DATASET.NUM_JOINTS_HALF_BODY = 8
    return cfg
