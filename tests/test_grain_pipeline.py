"""grain input-pipeline tests on the synthetic fixture."""
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


def test_multiprocess_workers(ds):
    """worker_count > 0: _SampleMap + dataset must survive pickling into
    grain's worker processes."""
    loader = make_grain_loader(ds, batch_size=2, worker_count=2,
                               drop_remainder=True)
    batches = list(loader)
    assert len(batches) == len(ds) // 2
    assert batches[0]["image"].shape == (2, *ds.src_size, 3)
