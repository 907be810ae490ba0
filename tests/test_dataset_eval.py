"""Dataset + loader + validate-loop tests on the synthetic COCO fixture."""
import numpy as np
import pytest

from rsgnet_tpu.config.defaults import tiny_rsgnet
from rsgnet_tpu.data import get_dataset
from rsgnet_tpu.data.loader import BatchLoader, device_prefetch
from tests.fixtures.synthetic_coco import make_dataset, write_fixture


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_fixture")
    ds = make_dataset()
    write_fixture(str(root), ds)
    return str(root)


def make_cfg():
    cfg = tiny_rsgnet()
    cfg.DATASET.TEST_SET = "val"
    cfg.MODEL.NUM_JOINTS = 17
    return cfg


def build(cfg, fixture_root, is_train=False):
    return get_dataset(cfg, root=fixture_root, image_set="val",
                       is_train=is_train)


def test_gt_db_loading(fixture_root):
    cfg = make_cfg()
    ds = build(cfg, fixture_root)
    # 6 annotations, minus 1 crowd, minus 1 zero-keypoint = 4 instances —
    # the reference kernal drops zero-keypoint instances UNCONDITIONALLY
    # (eval too), so the USE_GT_BBOX db matches it
    assert len(ds) == 4
    rec = ds.db[0]
    assert rec["joints"].shape == (17, 3)
    # center/scale: aspect-ratio-fixed, padded 1.25x, pixel_std 200
    assert rec["scale"].shape == (2,)
    assert rec["scale"][0] / rec["scale"][1] == pytest.approx(
        cfg.aspect_ratio, rel=1e-5)


def test_train_db_skips_empty(fixture_root):
    cfg = make_cfg()
    ds = build(cfg, fixture_root, is_train=True)
    assert len(ds) == 4          # also drops the zero-keypoint annotation


def test_load_sample_and_loader(fixture_root):
    cfg = make_cfg()
    ds = build(cfg, fixture_root)
    s = ds.load_sample(0)
    assert s["image"].shape == (*ds.src_size, 3)
    assert s["image"].dtype == np.uint8
    # 4 eval instances (zero-keypoint gt dropped, reference semantics):
    # batch 3 -> one full batch + one padded to the static batch shape
    loader = BatchLoader(ds, batch_size=3, pad_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["num_valid"] == 3
    assert batches[1]["num_valid"] == 1
    assert batches[1]["image"].shape == (3, *ds.src_size, 3)


def test_device_prefetch(fixture_root):
    cfg = make_cfg()
    ds = build(cfg, fixture_root)
    loader = BatchLoader(ds, batch_size=2)
    out = list(device_prefetch(iter(loader)))
    assert len(out) == 2                 # 4 instances over batch 2
    assert hasattr(out[0]["image"], "devices")     # on device


def test_evaluate_with_gt_preds_gives_ap1(fixture_root):
    cfg = make_cfg()
    ds = build(cfg, fixture_root)
    n, k = len(ds), ds.num_joints
    preds = np.zeros((n, k, 3), np.float32)
    boxes = np.zeros((n, 6), np.float32)
    ids = np.zeros((n,), np.int64)
    for i, rec in enumerate(ds.db):
        preds[i, :, :2] = rec["joints"][:, :2]
        preds[i, :, 2] = rec["joints_vis"][:, 0]   # score 1 for visible
        boxes[i, 0:2] = rec["center"]
        boxes[i, 2:4] = rec["scale"]
        boxes[i, 4] = np.prod(rec["scale"] * 200.0)
        boxes[i, 5] = rec["score"]
        ids[i] = rec["image_id"]
    name_value, ap = ds.evaluate(preds, boxes, ids)
    assert ap == pytest.approx(1.0)
    assert name_value["AP .5"] == pytest.approx(1.0)


def test_validate_end_to_end_runs(fixture_root, tmp_path):
    """Full loop with an untrained tiny model: must run and return finite AP.
    DEBUG.* flags on + output_dir: the eval-path save_debug_images analogue
    (reference validate() dumps prediction overlays) writes per-image pngs."""
    import os

    import jax
    from rsgnet_tpu.core.validate import validate
    from rsgnet_tpu.models import get_pose_net

    cfg = make_cfg()
    cfg.DEBUG.DEBUG = True
    cfg.DEBUG.SAVE_BATCH_IMAGES_PRED = True
    ds = build(cfg, fixture_root)
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32), train=False)
    name_value, ap = validate(cfg, ds, model, variables, batch_size=4,
                              output_dir=str(tmp_path))
    assert np.isfinite(ap)
    assert 0.0 <= name_value["AR"] <= 1.0 or name_value["AR"] == -1.0
    debug_dir = tmp_path / "val_debug"
    pngs = sorted(os.listdir(debug_dir))
    assert pngs and all(p.startswith("pred_") and p.endswith(".png")
                        for p in pngs)


def test_validate_profile_steps_writes_xprof_trace(fixture_root, tmp_path):
    """validate(profile_steps=1) captures an xprof trace of one steady-state
    eval batch into <output_dir>/xprof — the tools/test.py --profile
    surface. batch_size=1 so the fixture yields >=2 batches (batch 0 is the
    excluded compile step)."""
    import os
    import jax
    from rsgnet_tpu.core.validate import validate
    from rsgnet_tpu.models import get_pose_net

    cfg = make_cfg()
    ds = build(cfg, fixture_root)
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32), train=False)
    out = str(tmp_path / "val_prof")
    _, ap = validate(cfg, ds, model, variables, batch_size=1,
                     output_dir=out, profile_steps=1)
    assert np.isfinite(ap)
    prof_root = os.path.join(out, "xprof", "plugins", "profile")
    assert os.path.isdir(prof_root), os.listdir(out)
    runs = os.listdir(prof_root)
    assert runs, prof_root
    files = os.listdir(os.path.join(prof_root, runs[0]))
    assert any("trace" in f for f in files), files


def test_validate_pose_resnet_family(fixture_root):
    """The SimpleBaseline family drives the SAME end-to-end eval stack
    (device warp, flip-test, decode, rescoring, OKS-NMS, COCOeval)."""
    import jax
    from rsgnet_tpu.config.defaults import tiny_resnet
    from rsgnet_tpu.core.validate import validate
    from rsgnet_tpu.models import get_pose_net

    cfg = tiny_resnet()
    cfg.DATASET.TEST_SET = "val"
    cfg.MODEL.NUM_JOINTS = 17
    ds = build(cfg, fixture_root)
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32), train=False)
    name_value, ap = validate(cfg, ds, model, variables, batch_size=4)
    assert np.isfinite(ap)


def test_validate_host_crop_pipeline(fixture_root):
    """pipeline='host' (reference-style cv2 host crop) returns the same AP
    structure and near-identical predictions to the device-warp pipeline."""
    import jax
    from rsgnet_tpu.core.validate import validate
    from rsgnet_tpu.models import get_pose_net

    cfg = make_cfg()
    ds = build(cfg, fixture_root)
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32), train=False)
    nv_dev, ap_dev = validate(cfg, ds, model, variables, batch_size=4)
    nv_host, ap_host = validate(cfg, ds, model, variables, batch_size=4,
                                pipeline="host")
    assert set(nv_host.keys()) == set(nv_dev.keys())
    # same untrained model, same crops up to warp-backend rounding
    assert ap_host == pytest.approx(ap_dev, abs=0.05)


def test_host_crop_sample(fixture_root):
    cfg = make_cfg()
    ds = build(cfg, fixture_root)
    s = ds.load_sample_cropped(0)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    assert s["input"].shape == (h, w, 3)
    assert s["input"].dtype == np.uint8


def test_validate_sharded_over_mesh(fixture_root):
    """Data-parallel eval over the virtual 8-device mesh."""
    import jax
    from rsgnet_tpu.core.validate import validate
    from rsgnet_tpu.models import get_pose_net
    from rsgnet_tpu.parallel.mesh import make_mesh

    cfg = make_cfg()
    ds = build(cfg, fixture_root)
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32), train=False)
    mesh = make_mesh(8)
    name_value, ap = validate(cfg, ds, model, variables, batch_size=1,
                              mesh=mesh)
    assert np.isfinite(ap)


def test_validate_deterministic(fixture_root):
    """Two validate() runs on the same weights give identical AP (no
    nondeterminism in loaders, NMS ordering, or eval accumulation)."""
    import jax
    from rsgnet_tpu.core.validate import validate
    from rsgnet_tpu.models import get_pose_net

    cfg = make_cfg()
    ds = build(cfg, fixture_root)
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32), train=False)
    nv1, ap1 = validate(cfg, ds, model, variables, batch_size=2)
    nv2, ap2 = validate(cfg, ds, model, variables, batch_size=3)
    assert ap1 == ap2
    assert dict(nv1) == dict(nv2)


def test_select_data_filter(fixture_root):
    """DATASET.SELECT_DATA (reference JointsDataset.select_data): drops
    zero-visible samples and samples whose visible-joint centroid is far
    from the box center relative to the box area; keeps centered ones."""
    cfg = make_cfg()
    ds = build(cfg, fixture_root, is_train=True)
    k = ds.num_joints

    def rec(center, scale, joint_offset, num_vis=k):
        joints = np.zeros((k, 3), np.float32)
        joints[:, 0] = center[0] + joint_offset
        joints[:, 1] = center[1]
        vis = np.zeros((k, 3), np.float32)
        vis[:num_vis, 0] = vis[:num_vis, 1] = 1.0
        return {"center": np.asarray(center, np.float32),
                "scale": np.asarray(scale, np.float32),
                "joints": joints, "joints_vis": vis}

    centered = rec((100.0, 100.0), (1.0, 1.0), joint_offset=0.0)
    # centroid 3 box-widths off center: ks ~ exp(-9) << any metric
    offcenter = rec((100.0, 100.0), (1.0, 1.0), joint_offset=600.0)
    invisible = rec((100.0, 100.0), (1.0, 1.0), 0.0, num_vis=0)
    out = ds.select_data([centered, offcenter, invisible])
    assert len(out) == 1 and out[0] is centered

    # borderline math: keep iff ks = exp(-d^2/(2*0.2^2*area)) > metric,
    # metric = (0.2/16)*num_vis + 0.45 - 0.2/16 — verify the boundary
    area = 200.0 ** 2
    metric = (0.2 / 16) * k + 0.45 - 0.2 / 16
    d_keep = np.sqrt(-2.0 * 0.2 ** 2 * area * np.log(metric * 1.1))
    d_drop = np.sqrt(-2.0 * 0.2 ** 2 * area * np.log(metric * 0.9))
    keep = rec((100.0, 100.0), (1.0, 1.0), joint_offset=d_keep)
    drop = rec((100.0, 100.0), (1.0, 1.0), joint_offset=d_drop)
    out = ds.select_data([keep, drop])
    assert len(out) == 1 and out[0] is keep

    # wiring: get_dataset applies it for train sets when the flag is on
    cfg2 = make_cfg()
    cfg2.DATASET.SELECT_DATA = True
    ds2 = build(cfg2, fixture_root, is_train=True)
    base = build(make_cfg(), fixture_root, is_train=True)
    assert len(ds2) == len(base.select_data(base.db))


def test_crowdpose_dataset(tmp_path):
    """CrowdPose layout + 14 joints + crowd-index AP splits."""
    import json
    import os
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 14
    cfg.DATASET.DATASET = "crowdpose"
    ds_dict = make_dataset(num_joints=14, crowd_index=True)
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "json"))
    with open(os.path.join(root, "json", "crowdpose_test.json"), "w") as f:
        json.dump(ds_dict, f)
    from tests.fixtures.synthetic_coco import write_fixture
    write_fixture(root, ds_dict)                  # writes images/ too
    # move images up to the flat crowdpose layout (already flat: images/)
    ds = get_dataset(cfg, root=root, image_set="test")
    assert ds.num_joints == 14
    n, k = len(ds), 14
    preds = np.zeros((n, k, 3), np.float32)
    boxes = np.zeros((n, 6), np.float32)
    ids = np.zeros((n,), np.int64)
    for i, rec in enumerate(ds.db):
        preds[i, :, :2] = rec["joints"][:, :2]
        preds[i, :, 2] = rec["joints_vis"][:, 0]
        boxes[i, 0:2] = rec["center"]
        boxes[i, 2:4] = rec["scale"]
        boxes[i, 4] = np.prod(rec["scale"] * 200.0)
        boxes[i, 5] = 1.0
        ids[i] = rec["image_id"]
    name_value, ap = ds.evaluate(preds, boxes, ids)
    assert ap == pytest.approx(1.0)
    assert name_value["AP (easy)"] == pytest.approx(1.0)
    assert name_value["AP (hard)"] == pytest.approx(1.0)
