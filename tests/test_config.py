"""Config system tests: reference-style YAMLs must port 1:1 (SURVEY.md §5.6)."""
import glob
import os
import sys

import pytest

from rsgnet_tpu.config.defaults import Config, load_config, opts_to_dict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
YAMLS = sorted(glob.glob(os.path.join(REPO, "experiments", "**", "*.yaml"),
                         recursive=True))


def test_yamls_exist():
    assert len(YAMLS) >= 5


@pytest.mark.parametrize("path", YAMLS, ids=[os.path.basename(p)[:-5]
                                             for p in YAMLS])
def test_yaml_loads(path):
    cfg = load_config(path)
    assert cfg.MODEL.NUM_JOINTS in (14, 16, 17)    # crowdpose/mpii/coco
    assert cfg.MODEL.IMAGE_SIZE[0] % 32 == 0
    assert cfg.MODEL.HEATMAP_SIZE[0] * 4 == cfg.MODEL.IMAGE_SIZE[0]
    assert cfg.MODEL.EXTRA.STAGE4.NUM_BRANCHES == 4
    assert tuple(cfg.TRAIN.LR_STEP) == (170, 200)


def test_mpii_values():
    """MPII family YAMLs carry the reference MPII augmentation set and the
    square 256x256 input."""
    paths = [p for p in YAMLS if os.sep + "mpii" + os.sep in p]
    # hrnet w32/w48 + resnet res50/101/152 — the reference mpii grid
    assert len(paths) == 5
    for p in paths:
        cfg = load_config(p)
        assert cfg.DATASET.DATASET == "mpii"
        assert cfg.MODEL.NUM_JOINTS == 16
        assert tuple(cfg.MODEL.IMAGE_SIZE) == (256, 256)
        assert tuple(cfg.MODEL.HEATMAP_SIZE) == (64, 64)
        assert cfg.DATASET.SCALE_FACTOR == 0.25
        assert cfg.DATASET.ROT_FACTOR == 30
        assert cfg.DATASET.PROB_HALF_BODY == -1.0
        assert cfg.DATASET.TEST_SET == "valid"


def test_w48_values():
    path = [p for p in YAMLS if "w48_384x288" in p and "hrnet" in p][0]
    cfg = load_config(path)
    assert cfg.MODEL.SIGMA == 3
    assert tuple(cfg.MODEL.IMAGE_SIZE) == (288, 384)
    assert tuple(cfg.MODEL.EXTRA.STAGE2.NUM_CHANNELS) == (48, 96)
    assert cfg.TEST.DECODE == "dark"


@pytest.mark.parametrize("width,res,sigma", [
    (32, "256x192", 2), (32, "384x288", 3),
    (48, "256x192", 2), (48, "384x288", 3),
])
def test_coco_hrnet_grid(width, res, sigma):
    """All four reference COCO HRNet YAMLs (W32/W48 at both resolutions)
    exist and carry the width's channel ladder + the resolution's sigma."""
    path = [p for p in YAMLS if f"w{width}_{res}" in p and "hrnet" in p
            and os.sep + "coco" + os.sep in p]
    assert len(path) == 1, f"missing coco hrnet YAML w{width}_{res}"
    cfg = load_config(path[0])
    assert cfg.MODEL.NAME == "pose_hrnet"
    assert cfg.MODEL.SIGMA == sigma
    assert tuple(cfg.MODEL.EXTRA.STAGE2.NUM_CHANNELS) == (width, width * 2)
    assert tuple(cfg.MODEL.EXTRA.STAGE4.NUM_CHANNELS) == (
        width, width * 2, width * 4, width * 8)
    w, h = (192, 256) if res == "256x192" else (288, 384)
    assert tuple(cfg.MODEL.IMAGE_SIZE) == (w, h)


@pytest.mark.parametrize("depth", [50, 101, 152])
@pytest.mark.parametrize("res", ["256x192", "384x288"])
def test_resnet_family_values(depth, res):
    """All six reference SimpleBaseline YAMLs (res50/101/152 at both
    resolutions) exist and carry the reference values."""
    path = [p for p in YAMLS if f"res{depth}_{res}" in p]
    assert len(path) == 1, f"missing resnet YAML res{depth}_{res}"
    cfg = load_config(path[0])
    assert cfg.MODEL.NAME == "pose_resnet"
    assert cfg.MODEL.EXTRA.NUM_LAYERS == depth
    assert tuple(cfg.MODEL.EXTRA.NUM_DECONV_FILTERS) == (256, 256, 256)
    assert tuple(cfg.MODEL.EXTRA.NUM_DECONV_KERNELS) == (4, 4, 4)
    assert cfg.MODEL.EXTRA.DECONV_WITH_BIAS is False
    assert cfg.MODEL.EXTRA.FINAL_CONV_KERNEL == 1
    if res == "384x288":
        assert tuple(cfg.MODEL.IMAGE_SIZE) == (288, 384)
        assert tuple(cfg.MODEL.HEATMAP_SIZE) == (72, 96)
        assert cfg.MODEL.SIGMA == 3
    else:
        assert tuple(cfg.MODEL.IMAGE_SIZE) == (192, 256)
        assert cfg.MODEL.SIGMA == 2


def test_unknown_key_rejected(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("MODEL:\n  NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        load_config(str(bad))


def test_opts_override():
    cfg = load_config(YAMLS[0], overrides=opts_to_dict(
        ["TRAIN.LR", "0.01", "MODEL.SIGMA", "3", "DATASET.ROOT", "/x"]))
    assert cfg.TRAIN.LR == 0.01
    assert cfg.MODEL.SIGMA == 3
    assert cfg.DATASET.ROOT == "/x"


def test_reference_yaml_quirks(tmp_path):
    """yacs-style tuple strings + CUDNN section port 1:1."""
    y = tmp_path / "ref.yaml"
    y.write_text(
        "GPUS: '(0,1,2,3)'\n"
        "CUDNN:\n  BENCHMARK: true\n  DETERMINISTIC: false\n  ENABLED: true\n"
        "MODEL:\n  SIGMA: 2\n")
    cfg = load_config(str(y))
    assert cfg.GPUS == (0, 1, 2, 3)
    assert cfg.CUDNN.BENCHMARK is True


def test_crowdpose_cfg():
    path = [p for p in YAMLS if "crowdpose" in p][0]
    cfg = load_config(path)
    assert cfg.MODEL.NUM_JOINTS == 14
    assert cfg.DATASET.DATASET == "crowdpose"
    assert cfg.MODEL.RSG.ENABLED


def test_unread_config_keys_warn():
    """Accepted-but-unread keys (TEST.BBOX_THRE etc.) warn when a YAML sets
    them to a non-default value instead of silently changing nothing."""
    import warnings
    from rsgnet_tpu.config.defaults import Config, update_config
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        update_config(Config(), {"TEST": {"BBOX_THRE": 0.5, "OKS_THRE": 0.8}})
    msgs = [str(x.message) for x in w]
    assert any("TEST.BBOX_THRE" in m for m in msgs), msgs
    assert not any("OKS_THRE" in m for m in msgs), msgs
    # default-valued sets stay silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        update_config(Config(), {"TEST": {"BBOX_THRE": 1.0},
                                 "CUDNN": {"BENCHMARK": True}})
    assert not w, [str(x.message) for x in w]


def test_single_value_keys_rejected():
    """Keys the reference also implements for exactly one value must FAIL
    loudly on any other value (not silently no-op)."""
    from rsgnet_tpu.config.defaults import Config, update_config
    with pytest.raises(ValueError):
        update_config(Config(), {"MODEL": {"TARGET_TYPE": "offset"}})
    with pytest.raises(ValueError):
        update_config(Config(), {"MODEL": {"EXTRA": {"STAGE2": {
            "FUSE_METHOD": "CAT"}}}})
    # the implemented values pass
    update_config(Config(), {"MODEL": {"TARGET_TYPE": "gaussian"}})


def test_unread_reference_keys_warn():
    from rsgnet_tpu.config.defaults import Config, update_config
    with pytest.warns(UserWarning, match="read nowhere"):
        update_config(Config(), {"TRAIN": {"GAMMA1": 0.5}})
    # SELECT_DATA graduated from accepted-unread to implemented (the
    # reference's training-sample filter) — it must NOT warn anymore
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        update_config(Config(), {"DATASET": {"SELECT_DATA": True}})
    # GPUS selects DataParallel devices in the reference; here JAX shards
    # over all local devices, so a non-default pin must not pass silently
    with pytest.warns(UserWarning, match="read nowhere"):
        update_config(Config(), {"GPUS": (0, 1, 2, 3)})


def test_cli_workers_default_to_cfg():
    """tools/{train,test}.py --workers omitted -> cfg.WORKERS is the source
    of truth, so reference YAMLs' WORKERS key is honored."""
    import importlib.util
    sys.path.insert(0, os.path.join(REPO, "tools"))  # tools import _init_paths
    for tool in ("train", "test"):
        spec = importlib.util.spec_from_file_location(
            f"_tool_{tool}", os.path.join(REPO, "tools", f"{tool}.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        old = sys.argv
        try:
            sys.argv = [f"{tool}.py", "--cfg", "x.yaml"]
            assert mod.parse_args().workers is None
        finally:
            sys.argv = old


def test_config_doc_in_sync():
    """CONFIG.md is generated from the dataclasses; regeneration must match
    the committed file (run tools/gen_config_doc.py after config changes)."""
    import io
    import os
    import sys
    from contextlib import redirect_stdout
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import gen_config_doc
    buf = io.StringIO()
    with redirect_stdout(buf):
        gen_config_doc.main()
    committed = open(os.path.join(REPO, "CONFIG.md")).read()
    assert buf.getvalue().strip() == committed.strip(), \
        "CONFIG.md is stale — regenerate with tools/gen_config_doc.py"
