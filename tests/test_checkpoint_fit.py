"""Checkpoint round-trip + full fit() epoch driver on the synthetic fixture."""
import os

import jax
import numpy as np
import pytest

from rsgnet_tpu.config.defaults import tiny_rsgnet
from rsgnet_tpu.core.train import create_train_state
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.utils.checkpoint import (auto_resume, load_checkpoint,
                                         load_weights, save_checkpoint)
from tests.fixtures.synthetic_coco import make_dataset, write_fixture


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_fit")
    write_fixture(str(root), make_dataset())
    return str(root)


def make_state(cfg):
    model = get_pose_net(cfg)
    return model, create_train_state(cfg, model, jax.random.PRNGKey(0))


def _tree_allclose(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_rsgnet()
    model, state = make_state(cfg)
    path = save_checkpoint(str(tmp_path), state, epoch=3, perf=0.42,
                           is_best=True)
    assert os.path.exists(path)
    assert os.path.exists(os.path.join(str(tmp_path), "model_best.msgpack"))
    _, state2 = make_state(cfg)
    state2, epoch, perf, batch = load_checkpoint(path, state2)
    assert batch == 0
    assert epoch == 3 and perf == pytest.approx(0.42)
    _tree_allclose(state.params, state2.params)
    _tree_allclose(state.opt_state, state2.opt_state)


def test_opt_state_layout_mismatch_degrades_gracefully(tmp_path):
    """A checkpoint whose optimizer-state layout differs from the current
    template (e.g. written before the optax.flatten fusion, or by a
    different optimizer) must still resume weights + epoch instead of
    crashing (load_checkpoint falls back with a warning)."""
    cfg = tiny_rsgnet()
    cfg.TRAIN.OPTIMIZER = "sgd"
    _, state_sgd = make_state(cfg)
    path = save_checkpoint(str(tmp_path), state_sgd, epoch=5, perf=0.3,
                           is_best=False)

    cfg2 = tiny_rsgnet()
    cfg2.TRAIN.OPTIMIZER = "adam"          # different opt_state pytree
    _, state_adam = make_state(cfg2)
    state2, epoch, perf, _ = load_checkpoint(path, state_adam)
    assert epoch == 5 and perf == pytest.approx(0.3)
    _tree_allclose(state_sgd.params, state2.params)
    # optimizer state stayed the fresh adam template (not restored)
    assert jax.tree_util.tree_structure(state2.opt_state) == \
        jax.tree_util.tree_structure(state_adam.opt_state)


def test_auto_resume_semantics(tmp_path):
    cfg = tiny_rsgnet()
    model, state = make_state(cfg)
    # nothing there: epoch 0
    s, e, p, b = auto_resume(str(tmp_path), state)
    assert e == 0 and p == 0.0 and b == 0
    save_checkpoint(str(tmp_path), state, epoch=7, perf=0.5, is_best=False)
    s, e, p, b = auto_resume(str(tmp_path), state)
    assert e == 8 and p == pytest.approx(0.5) and b == 0


def test_resume_restores_running_best_not_epoch_perf(tmp_path):
    """An epoch that didn't validate writes perf=0.0 but must persist the
    RUNNING best, so a resumed run can't overwrite model_best with a worse
    model (ADVICE round-2)."""
    cfg = tiny_rsgnet()
    model, state = make_state(cfg)
    save_checkpoint(str(tmp_path), state, epoch=9, perf=0.0, is_best=False,
                    best_perf=0.73)
    _, e, p, _ = auto_resume(str(tmp_path), state)
    assert e == 10 and p == pytest.approx(0.73)


def test_async_checkpointer_matches_sync_bytes(tmp_path):
    """AsyncCheckpointer writes byte-identical files to save_checkpoint
    (same payload, same serialization) — only the thread that does the
    serialize+write differs."""
    from rsgnet_tpu.utils.checkpoint import AsyncCheckpointer
    cfg = tiny_rsgnet()
    _, state = make_state(cfg)
    sync_dir, async_dir = str(tmp_path / "sync"), str(tmp_path / "async")
    save_checkpoint(sync_dir, state, epoch=2, perf=0.5, is_best=True,
                    best_perf=0.6)
    ck = AsyncCheckpointer()
    ck.save(async_dir, state, epoch=2, perf=0.5, is_best=True, best_perf=0.6)
    ck.wait()
    for name in ("checkpoint.msgpack", "model_best.msgpack"):
        a = open(os.path.join(sync_dir, name), "rb").read()
        b = open(os.path.join(async_dir, name), "rb").read()
        assert a == b, name
    # no stray tmp files after the atomic rename
    assert not [p for p in os.listdir(async_dir) if p.endswith(".tmp")]


def test_fit_async_checkpoint_resumes(fixture_root, tmp_path):
    """TRAIN.ASYNC_CHECKPOINT=true: fit() checkpoints in the background,
    the file is durable at return, and auto-resume works from it."""
    from rsgnet_tpu.core.function import fit
    from rsgnet_tpu.data import get_dataset

    cfg = tiny_rsgnet()
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 1
    cfg.TRAIN.ASYNC_CHECKPOINT = True
    out = str(tmp_path / "async_run")
    model = get_pose_net(cfg)
    train_ds = get_dataset(cfg, root=fixture_root, image_set="val",
                           is_train=True)
    train_ds.db = (train_ds.db * 3)[:8]
    state, _ = fit(cfg, model, train_ds, val_dataset=None,
                   output_dir=out, max_epochs=1)
    assert os.path.exists(os.path.join(out, "checkpoint.msgpack"))
    _, state2 = make_state(cfg)
    state2, epoch, _, _ = load_checkpoint(
        os.path.join(out, "checkpoint.msgpack"), state2)
    assert epoch == 0
    _tree_allclose(state.params, state2.params)


def test_fit_profile_steps_writes_xprof_trace(fixture_root, tmp_path):
    """fit(profile_steps=1) captures an xprof trace of one steady-state
    step (skipping the compile step) into <output_dir>/xprof — the
    tools/train.py --profile surface."""
    from rsgnet_tpu.core.function import fit
    from rsgnet_tpu.data import get_dataset

    cfg = tiny_rsgnet()
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 1
    out = str(tmp_path / "prof_run")
    model = get_pose_net(cfg)
    train_ds = get_dataset(cfg, root=fixture_root, image_set="val",
                           is_train=True)
    train_ds.db = (train_ds.db * 6)[:24]       # 3 steps of global batch 8
    fit(cfg, model, train_ds, val_dataset=None, output_dir=out,
        max_epochs=1, profile_steps=1)
    prof_root = os.path.join(out, "xprof", "plugins", "profile")
    assert os.path.isdir(prof_root), os.listdir(out)
    runs = os.listdir(prof_root)
    assert runs, prof_root
    files = os.listdir(os.path.join(prof_root, runs[0]))
    assert any("trace" in f for f in files), files


def test_load_weights_msgpack(tmp_path):
    cfg = tiny_rsgnet()
    model, state = make_state(cfg)
    save_checkpoint(str(tmp_path), state, epoch=0, perf=0.9, is_best=True)
    v = load_weights(cfg, model,
                     os.path.join(str(tmp_path), "model_best.msgpack"))
    _tree_allclose(state.params, v["params"])


def test_fit_debug_dumps_images(fixture_root, tmp_path):
    """DEBUG.DEBUG in the train loop writes reference-style debug images."""
    from pathlib import Path
    from rsgnet_tpu.core.function import fit
    from rsgnet_tpu.data import get_dataset

    cfg = tiny_rsgnet()
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 1
    cfg.PRINT_FREQ = 1
    cfg.DEBUG.DEBUG = True
    cfg.DEBUG.SAVE_BATCH_IMAGES_GT = True
    cfg.DEBUG.SAVE_HEATMAPS_PRED = True
    out = str(tmp_path / "dbg_run")
    model = get_pose_net(cfg)
    train_ds = get_dataset(cfg, root=fixture_root, image_set="val",
                           is_train=True)
    train_ds.db = (train_ds.db * 2)[:8]
    fit(cfg, model, train_ds, val_dataset=None, output_dir=out, max_epochs=1)
    dumps = list(Path(out).glob("train_e0_*.png"))
    assert dumps, list(Path(out).iterdir())


def test_fit_one_epoch_and_resume(fixture_root, tmp_path):
    """fit() runs an epoch on the fixture, checkpoints, then auto-resumes."""
    from rsgnet_tpu.core.function import fit
    from rsgnet_tpu.data import get_dataset

    cfg = tiny_rsgnet()
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 1        # 8 virtual devices -> batch 8
    cfg.PRINT_FREQ = 1
    out = str(tmp_path / "run")
    model = get_pose_net(cfg)
    train_ds = get_dataset(cfg, root=fixture_root, image_set="val",
                           is_train=True)
    # pad the dataset so one batch of 8 exists (4 instances -> repeat db)
    train_ds.db = (train_ds.db * 3)[:8]
    state, best = fit(cfg, model, train_ds, val_dataset=None,
                      output_dir=out, max_epochs=1)
    assert os.path.exists(os.path.join(out, "checkpoint.msgpack"))
    # second call resumes at epoch 1 and does nothing (END capped at 1)
    state2, _ = fit(cfg, model, train_ds, val_dataset=None,
                    output_dir=out, max_epochs=1)
    assert int(state2.step) == 0 or int(state2.step) == int(state.step)

    # TRAIN.RESUME + TRAIN.CHECKPOINT (reference manual-resume path): a
    # FRESH output dir, explicit checkpoint path -> resumes epoch/weights
    cfg.TRAIN.RESUME = True
    cfg.TRAIN.CHECKPOINT = os.path.join(out, "checkpoint.msgpack")
    out2 = str(tmp_path / "run2")
    state3, _ = fit(cfg, model, train_ds, val_dataset=None,
                    output_dir=out2, max_epochs=1)
    # epoch 0 already done per the loaded checkpoint; END capped at 1 -> noop
    _tree_allclose(state.params, state3.params)
