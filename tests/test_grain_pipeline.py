"""grain input-pipeline tests on the synthetic fixture."""
import os

import numpy as np
import pytest

from rsgnet_tpu.config.defaults import tiny_rsgnet
from rsgnet_tpu.data import get_dataset
from rsgnet_tpu.data.grain_pipeline import make_grain_loader
from tests.fixtures.synthetic_coco import make_dataset, write_fixture


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("grain_fixture")
    write_fixture(str(root), make_dataset())
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    return get_dataset(cfg, root=str(root), image_set="val", is_train=False)


def test_batches_and_shapes(ds):
    loader = make_grain_loader(ds, batch_size=2, drop_remainder=True)
    batches = list(loader)
    assert len(batches) == len(ds) // 2
    b = batches[0]
    assert b["image"].shape == (2, *ds.src_size, 3)
    assert b["joints"].shape == (2, 17, 2)
    assert b["center"].shape == (2, 2)


def test_shuffle_determinism(ds):
    def ids(seed):
        loader = make_grain_loader(ds, batch_size=1, shuffle=True, seed=seed,
                                   drop_remainder=False)
        return [int(b["image_id"][0]) for b in loader]
    a, b_, c = ids(1), ids(1), ids(2)
    assert a == b_                       # same seed -> same order
    assert sorted(a) == sorted(c)        # same multiset of records


def test_multi_epoch(ds):
    loader = make_grain_loader(ds, batch_size=len(ds), num_epochs=3)
    assert len(list(loader)) == 3


@pytest.mark.skipif(
    not os.environ.get("RSGNET_SLOW_TESTS"),
    reason="~13s of grain process spawns; the pickling-into-workers "
           "coverage is redundant with test_fit_with_grain_loader "
           "(num_workers=2 there) — RSGNET_SLOW_TESTS=1 runs this too")
def test_multiprocess_workers(ds):
    """worker_count > 0: _SampleMap + dataset must survive pickling into
    grain's worker processes."""
    loader = make_grain_loader(ds, batch_size=2, worker_count=2,
                               drop_remainder=True)
    batches = list(loader)
    assert len(batches) == len(ds) // 2
    assert batches[0]["image"].shape == (2, *ds.src_size, 3)


def test_grain_batch_loader_epoch_reshuffle(ds):
    from rsgnet_tpu.data.grain_pipeline import GrainBatchLoader
    loader = GrainBatchLoader(ds, batch_size=2, shuffle=True, num_workers=0)
    assert len(loader) == len(ds) // 2
    e0 = [b["image_id"].tolist() for b in loader]
    e1 = [b["image_id"].tolist() for b in loader]
    flat0 = [i for b in e0 for i in b]
    flat1 = [i for b in e1 for i in b]
    valid_ids = {int(ds.db[i]["image_id"]) for i in range(len(ds))}
    assert len(flat0) == len(flat1) == len(loader) * 2
    assert set(flat0) <= valid_ids and set(flat1) <= valid_ids
    # the RESHUFFLE contract itself: epoch orders must differ (deterministic
    # seeds — this is a stable assertion, not a probabilistic one)
    assert flat0 != flat1, (flat0, flat1)
    assert all(b["num_valid"] == 2 for b in loader)


def test_grain_eval_loader_pads_last_batch(ds):
    from rsgnet_tpu.data.grain_pipeline import GrainEvalLoader
    n = len(ds)
    loader = GrainEvalLoader(ds, batch_size=3)
    batches = list(loader)
    assert len(batches) == len(loader) == (n + 2) // 3
    assert all(b["image"].shape[0] == 3 for b in batches)
    assert int(batches[-1]["num_valid"]) == n - 3 * (len(batches) - 1)
    # sequential order, matching the dataset db
    got = [int(i) for b in batches for i in b["image_id"][:b["num_valid"]]]
    want = [int(ds.db[i]["image_id"]) for i in range(n)]
    assert got == want


def test_validate_with_grain_loader_matches_threads(ds):
    """TEST.LOADER=grain drives validate() to the identical AP as the
    threaded loader (VERDICT round-2 item 7)."""
    from rsgnet_tpu.core.validate import validate

    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17

    oracle = [ds.load_sample(i) for i in range(len(ds))]
    ids = {int(s["image_id"]): i for i, s in enumerate(oracle)}

    def fake_infer(variables, images, centers, scales):
        b = int(np.asarray(centers).shape[0])
        preds = np.zeros((b, 17, 2), np.float32)
        maxvals = np.ones((b, 17, 1), np.float32)
        # look up by geometry-independent key: centers match oracle order
        for j in range(b):
            c = np.asarray(centers)[j]
            idx = min(range(len(oracle)),
                      key=lambda i: np.sum((oracle[i]["center"] - c) ** 2))
            preds[j] = oracle[idx]["joints"]
            maxvals[j, :, 0] = oracle[idx]["joints_vis"]
        return preds, maxvals

    # num_workers=2 (not the 8 default): each grain worker is a process
    # spawn on this 1-core host; 2 still exercises the multiprocess path
    _, ap_threads = validate(cfg, ds, model=None, variables=None,
                             batch_size=3, num_workers=2,
                             infer_fn=(fake_infer, "image"))
    cfg.TEST.LOADER = "grain"
    _, ap_grain = validate(cfg, ds, model=None, variables=None,
                           batch_size=3, num_workers=2,
                           infer_fn=(fake_infer, "image"))
    assert ap_grain == ap_threads == pytest.approx(1.0)


def test_fit_with_grain_loader(tmp_path):
    """TRAIN.LOADER=grain drives fit() end-to-end (train-step batches come
    from grain worker processes) — VERDICT round-1 item 7."""
    from rsgnet_tpu.core.function import fit
    from rsgnet_tpu.data import get_dataset
    from rsgnet_tpu.models import get_pose_net
    from rsgnet_tpu.parallel.mesh import make_mesh

    root = str(tmp_path)
    write_fixture(root, make_dataset())
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    cfg.TRAIN.LOADER = "grain"
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 2
    cfg.TRAIN.END_EPOCH = 1
    train_ds = get_dataset(cfg, root=root, image_set="val", is_train=True)
    model = get_pose_net(cfg)
    # 1-device mesh: the conftest's 8 virtual devices would make the global
    # batch (2 * 8) exceed the 4-record fixture
    state, best = fit(cfg, model, train_ds, val_dataset=None,
                      output_dir=str(tmp_path / "out"), num_workers=2,
                      max_epochs=1, mesh=make_mesh(1))
    assert int(state.step) == len(train_ds) // 2


def test_process_shard_reassembles_global_batches(ds):
    """Multi-host grain sharding (VERDICT round-4 item 6): every process
    evaluates the same seed-pinned global order; concatenating the
    per-process local batches in process order must reproduce the
    UNSHARDED loader's global batches bit for bit — the contract
    device_prefetch's make_array_from_process_local_data assembly relies
    on, and the same one BatchLoader(process_shard=) provides."""
    B, nproc = 4, 2
    global_batches = [b["image_id"].tolist() for b in make_grain_loader(
        ds, B, shuffle=True, seed=7, drop_remainder=True)]
    shards = [[b["image_id"].tolist() for b in make_grain_loader(
        ds, B, shuffle=True, seed=7, drop_remainder=True,
        process_shard=(p, nproc))] for p in range(nproc)]
    assert len(shards[0]) == len(shards[1]) == len(global_batches) >= 1
    for g, s0, s1 in zip(global_batches, *shards):
        assert len(s0) == len(s1) == B // nproc
        assert s0 + s1 == g            # contiguous within-batch slices
    # full pixel equality on one batch, not just ids
    g0 = next(iter(make_grain_loader(ds, B, shuffle=True, seed=7,
                                     drop_remainder=True)))
    parts = [next(iter(make_grain_loader(ds, B, shuffle=True, seed=7,
                                         drop_remainder=True,
                                         process_shard=(p, nproc))))
             for p in range(nproc)]
    np.testing.assert_array_equal(
        np.concatenate([p["image"] for p in parts]), g0["image"])


def test_process_shard_validation(ds):
    with pytest.raises(ValueError, match="divisible"):
        make_grain_loader(ds, 3, drop_remainder=True, process_shard=(0, 2))
    with pytest.raises(ValueError, match="drop_remainder"):
        make_grain_loader(ds, 2, drop_remainder=False, process_shard=(0, 2))
    with pytest.raises(ValueError, match="process_shard"):
        make_grain_loader(ds, 2, drop_remainder=True, process_shard=(2, 2))


def test_grain_batch_loader_sharded_epochs(ds):
    """GrainBatchLoader(process_shard=): local batch sizing, num_valid,
    and the epoch-reshuffle contract hold under sharding."""
    from rsgnet_tpu.data.grain_pipeline import GrainBatchLoader
    full = GrainBatchLoader(ds, batch_size=2, shuffle=True, num_workers=0)
    half = GrainBatchLoader(ds, batch_size=2, shuffle=True, num_workers=0,
                            process_shard=(1, 2))
    assert len(half) == len(full) == len(ds) // 2
    e_full = [b["image_id"].tolist() for b in full]
    e_half = [b["image_id"].tolist() for b in half]
    assert all(len(b) == 1 for b in e_half)
    assert [b[1:] for b in e_full] == e_half    # process 1 owns row 1
