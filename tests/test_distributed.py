"""Multi-host growth-path helpers (single-process behavior)."""
import jax
import numpy as np
import pytest

from rsgnet_tpu.parallel.distributed import (gather_host_results,
                                             initialize_distributed,
                                             local_batch_to_global,
                                             make_global_mesh, shard_bounds)


def test_initialize_noop_single_process():
    assert initialize_distributed() is False


def test_initialize_env_contract(monkeypatch):
    """The launcher env vars (docs/DISTRIBUTED.md) map 1:1 onto
    jax.distributed.initialize args — recorded via monkeypatch, no real
    handshake."""
    calls = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.update(kw))
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host0:1234")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert initialize_distributed() is True
    assert calls == {"coordinator_address": "host0:1234",
                     "num_processes": 4, "process_id": 2}
    # explicit args beat the env
    calls.clear()
    assert initialize_distributed(coordinator_address="h:1",
                                  num_processes=2, process_id=1) is True
    assert calls == {"coordinator_address": "h:1",
                     "num_processes": 2, "process_id": 1}
    # partial launcher env (coordinator/process-id without a >1 process
    # count) = misconfiguration: raises rather than silently running N
    # rank-0 processes against the same output dir
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    with pytest.raises(RuntimeError, match="JAX_NUM_PROCESSES"):
        initialize_distributed()
    # clean single-process env -> plain no-op
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
    monkeypatch.delenv("JAX_PROCESS_ID")
    assert initialize_distributed() is False


def test_global_mesh_covers_all_devices():
    mesh = make_global_mesh()
    assert mesh.size == len(jax.devices())
    assert mesh.axis_names == ("data",)


def test_local_batch_to_global_shards():
    mesh = make_global_mesh()
    n = mesh.size * 2
    batch = {"x": np.arange(n * 3, dtype=np.float32).reshape(n, 3)}
    out = local_batch_to_global(batch, mesh)
    assert out["x"].shape == (n, 3)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    # sharded over the data axis
    assert len(out["x"].sharding.device_set) == mesh.size


@pytest.mark.parametrize("total,nproc", [(10, 2), (5, 2), (7, 3), (4, 8)])
def test_shard_bounds_partition(total, nproc):
    """Slices are a contiguous, in-order, exact partition of [0, total)."""
    prev = 0
    for p in range(nproc):
        lo, hi = shard_bounds(total, p, nproc)
        assert lo == prev and hi >= lo
        prev = hi
    assert prev == total
    sizes = [shard_bounds(total, p, nproc)[1] - shard_bounds(total, p, nproc)[0]
             for p in range(nproc)]
    assert max(sizes) - min(sizes) <= 1      # balanced to within one item


def test_gather_host_results_single_process_identity():
    a = np.arange(12, dtype=np.float32).reshape(4, 3)
    b = np.arange(4, dtype=np.int64)
    ga, gb = gather_host_results((a, b), total=4)
    np.testing.assert_array_equal(ga, a)
    np.testing.assert_array_equal(gb, b)


def test_gather_host_results_preserves_int64_ids(monkeypatch):
    """COCO image ids are arbitrary int64s from the annotation file; the
    allgather round trip must not truncate them to 32 bits (they travel as
    uint32 word pairs). Simulated 2-process gather: a fake process_allgather
    returns each process's padded contribution (here: this process's, plus
    a shifted copy standing in for the peer)."""
    from jax.experimental import multihost_utils

    big = np.array([2**40 + 7, -3, 2**31, 5], np.int64)       # p0's 4 ids
    peer = big + 1                                            # "p1's" ids
    preds = np.arange(24, dtype=np.float32).reshape(4, 3, 2)

    def fake_allgather(padded):
        # shape contract: (nproc, m, ...) per leaf; 64-bit leaves arrive as
        # uint32 (m, -1, 2) words — the peer's words are the shifted ids'
        out = []
        for x in padded:
            if x.dtype == np.uint32:
                p1 = np.ascontiguousarray(peer).view(
                    np.uint32).reshape(x.shape)
                out.append(np.stack([x, p1]))
            else:
                out.append(np.stack([x, x + 100.0]))
        return tuple(out)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    gp, gi = gather_host_results((preds, big), total=8)
    np.testing.assert_array_equal(gi, np.concatenate([big, peer]))
    np.testing.assert_array_equal(gp[:4], preds)
    np.testing.assert_array_equal(gp[4:], preds + 100.0)
    assert gi.dtype == np.int64 and gp.shape == (8, 3, 2)


def test_dataset_shard_views_partition_db(tmp_path):
    """TopDownDataset.shard(): contiguous db slices that concatenate back to
    the original order (multi-host eval contract, core/validate.py)."""
    from rsgnet_tpu.config.defaults import tiny_rsgnet
    from rsgnet_tpu.data import get_dataset
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture

    root = tmp_path / "coco_shard"
    write_fixture(str(root), make_dataset())
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    ds = get_dataset(cfg, root=str(root), image_set="val", is_train=False)
    parts = [ds.shard(p, 3) for p in range(3)]
    recon = [rec for sub in parts for rec in sub.db]
    assert len(recon) == len(ds.db)
    for a, b in zip(recon, ds.db):
        assert a is b                         # shallow views, same records
    assert parts[0].src_size == ds.src_size  # other attrs shared


def test_loader_process_shard_slices_concat_to_global(tmp_path):
    """Per-process BatchLoader slices concatenate (in process order) to the
    exact batches the single-process loader produces — the bit-identical
    global batch contract the multi-host train step relies on."""
    from rsgnet_tpu.config.defaults import tiny_rsgnet
    from rsgnet_tpu.data import get_dataset
    from rsgnet_tpu.data.loader import BatchLoader
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture

    root = tmp_path / "coco_pshard"
    write_fixture(str(root), make_dataset())
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    ds = get_dataset(cfg, root=str(root), image_set="val", is_train=True)
    ds.db = (ds.db * 2)[:8]

    def batches(shard):
        loader = BatchLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                             num_workers=2, pad_last=False,
                             process_shard=shard)
        loader.set_epoch(3)
        return list(loader)

    full = batches(None)
    halves = [batches((p, 2)) for p in range(2)]
    assert len(full) == 2 and all(len(h) == 2 for h in halves)
    for i, fb in enumerate(full):
        for k, v in fb.items():
            if k == "num_valid":
                assert all(h[i][k] == v for h in halves)
                continue
            parts = [h[i][k] for h in halves]
            assert all(p.shape[0] == v.shape[0] // 2 for p in parts)
            np.testing.assert_array_equal(np.concatenate(parts), v)
