"""Bitwise crash-resume equivalence (SURVEY.md §5.3/§5.4).

A run killed at an epoch boundary and auto-resumed must produce EXACTLY the
model an uninterrupted run produces.  This holds because (a) ``fit()``
derives every per-epoch RNG stream by ``fold_in(base, epoch)`` — a pure
function of the epoch number, not a running split chain — (b) the loader's
shuffle order is pinned to the same epoch number via ``set_epoch``, and
(c) the msgpack checkpoint restores params / batch_stats / flat opt_state /
step exactly.  The reference cannot make this guarantee (its DataLoader
order and CUDA aug RNG are process-state); going beyond it is deliberate.
"""
import os

import jax
import numpy as np
import pytest

from rsgnet_tpu.config.defaults import tiny_rsgnet
from rsgnet_tpu.core.function import fit
from rsgnet_tpu.data import get_dataset
from rsgnet_tpu.models import get_pose_net

from tests.fixtures.synthetic_coco import make_dataset, write_fixture


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_resume")
    write_fixture(str(root), make_dataset())
    return str(root)


def _run(cfg, fixture_root, out, epochs_first, epochs_total):
    """fit() for epochs_first epochs, then (a second fit call = the restart)
    auto-resume to epochs_total. epochs_first == epochs_total is the
    uninterrupted control."""
    model = get_pose_net(cfg)
    ds = get_dataset(cfg, root=fixture_root, image_set="val", is_train=True)
    ds.db = (ds.db * 5)[:16]          # two batches of 8 per epoch
    state, _ = fit(cfg, model, ds, val_dataset=None, output_dir=out,
                   max_epochs=epochs_first)
    if epochs_total > epochs_first:
        state, _ = fit(cfg, model, ds, val_dataset=None, output_dir=out,
                       max_epochs=epochs_total)
    return state


def test_resume_bitwise_equals_uninterrupted(fixture_root, tmp_path):
    cfg = tiny_rsgnet()
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 1        # 8 virtual devices -> batch 8
    cfg.TRAIN.SHUFFLE = True                # the order-sensitive part
    cfg.TRAIN.END_EPOCH = 2                 # kill after 1, resume for 1

    straight = _run(cfg, fixture_root, str(tmp_path / "straight"), 2, 2)
    resumed = _run(cfg, fixture_root, str(tmp_path / "resumed"), 1, 2)

    assert int(straight.step) == int(resumed.step) > 0
    for name, a, b in (("params", straight.params, resumed.params),
                       ("batch_stats", straight.batch_stats,
                        resumed.batch_stats),
                       ("opt_state", straight.opt_state,
                        resumed.opt_state)):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=name)
    # and the saved checkpoints agree too
    for d in ("straight", "resumed"):
        assert os.path.exists(str(tmp_path / d / "checkpoint.msgpack"))


def test_set_epoch_pins_shuffle_order(fixture_root):
    """Without set_epoch the order depends on iteration count; with it, a
    fresh loader reproduces any epoch's order exactly."""
    from rsgnet_tpu.data.loader import BatchLoader

    cfg = tiny_rsgnet()
    ds = get_dataset(cfg, root=fixture_root, image_set="val", is_train=True)
    ds.db = (ds.db * 5)[:16]

    a = BatchLoader(ds, 8, shuffle=True, drop_last=True, num_workers=1)
    orders_a = []
    for _ in range(3):                     # epochs 0, 1, 2 by iteration
        orders_a.append([b for b, _ in a._index_batches()])
        a.epoch += 1
    b = BatchLoader(ds, 8, shuffle=True, drop_last=True, num_workers=1)
    b.set_epoch(2)
    order_b = [x for x, _ in b._index_batches()]
    for x, y in zip(orders_a[2], order_b):
        np.testing.assert_array_equal(x, y)
    # sanity: epoch 2's order differs from epoch 0's
    assert any(not np.array_equal(x, y)
               for x, y in zip(orders_a[0], orders_a[2]))
