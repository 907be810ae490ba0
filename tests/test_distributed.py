"""Multi-host growth-path helpers (single-process behavior)."""
import jax
import numpy as np

from rsgnet_tpu.parallel.distributed import (initialize_distributed,
                                             local_batch_to_global,
                                             make_global_mesh)


def test_initialize_noop_single_process():
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
