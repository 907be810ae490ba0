"""Pallas fused DARK decode vs the jnp reference path (interpret mode on the
CPU backend; the same kernel compiles with Mosaic on real TPUs)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rsgnet_tpu.ops.decode import dark_refine_jax, get_max_preds_jax
from rsgnet_tpu.ops.pallas.dark_decode import dark_decode_pallas


def make_heatmaps(n=2, h=64, w=48, k=5, seed=0, sigma=2.0):
    """Gaussian-ish peaks at random sub-pixel locations + noise."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    hm = np.zeros((n, h, w, k), np.float32)
    centers = np.zeros((n, k, 2), np.float32)
    for i in range(n):
        for j in range(k):
            cx = rng.uniform(4, w - 5)
            cy = rng.uniform(4, h - 5)
            centers[i, j] = (cx, cy)
            hm[i, :, :, j] = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                                    / (2 * sigma ** 2))
            hm[i, :, :, j] += rng.uniform(0, 0.01, (h, w))
    return jnp.asarray(hm), centers


@pytest.mark.parametrize("blur", [3, 11])
def test_matches_jnp_dark_path(blur):
    hm, _ = make_heatmaps()
    coords_ref, maxv_ref = get_max_preds_jax(hm)
    coords_ref = dark_refine_jax(hm, coords_ref, blur_kernel=blur)
    coords, maxv = dark_decode_pallas(hm, blur_kernel=blur, interpret=True)
    np.testing.assert_allclose(np.asarray(coords), np.asarray(coords_ref),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(maxv), np.asarray(maxv_ref),
                               rtol=1e-6)


def test_recovers_subpixel_peaks():
    hm, centers = make_heatmaps(seed=3)
    coords, _ = dark_decode_pallas(hm, blur_kernel=11, interpret=True)
    err = np.abs(np.asarray(coords) - centers)
    assert err.max() < 0.35, err.max()          # sub-pixel accuracy


def test_zero_map_gives_zero_coords():
    hm = jnp.zeros((1, 64, 48, 3))
    coords, maxv = dark_decode_pallas(hm, interpret=True)
    assert float(jnp.max(jnp.abs(coords))) == 0.0
    assert float(maxv.max()) == 0.0


def test_border_peak_skips_newton():
    hm = np.zeros((1, 64, 48, 1), np.float32)
    hm[0, 1, 1, 0] = 1.0                         # too close to the border
    coords, _ = dark_decode_pallas(jnp.asarray(hm), interpret=True)
    np.testing.assert_array_equal(np.asarray(coords)[0, 0], [1.0, 1.0])


def test_spmd_sharded_no_collectives():
    """The custom_partitioning entry (``dark_decode_pallas_spmd``): under
    jit with batch-sharded heatmaps the compiled program must run the
    kernel per shard — zero collectives, matching the unsharded kernel to
    fp32-rounding order (per-shard compilation fuses/rounds independently,
    the same caveat as the fused shear warp's wrapper)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rsgnet_tpu.ops.pallas.dark_decode import dark_decode_pallas_spmd
    from rsgnet_tpu.parallel.mesh import make_mesh

    hm, _ = make_heatmaps(n=8)
    mesh = make_mesh(8)
    hm_d = jax.device_put(hm, NamedSharding(mesh, P("data")))
    f = jax.jit(lambda x: dark_decode_pallas_spmd(x, 11, interpret=True))
    hlo = f.lower(hm_d).compile().as_text()
    for coll in ("all-gather", "all-reduce", "all-to-all",
                 "collective-permute", "reduce-scatter"):
        assert hlo.count(coll) == 0, (coll, hlo.count(coll))
    coords, maxv = f(hm_d)
    coords_ref, maxv_ref = dark_decode_pallas(hm, blur_kernel=11,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(coords), np.asarray(coords_ref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(maxv), np.asarray(maxv_ref),
                               rtol=1e-6)

    # replicated inputs (no explicit sharding) keep working through the
    # same entry on the multi-device host
    coords_r, _ = jax.jit(
        lambda x: dark_decode_pallas_spmd(x, 11, interpret=True))(hm)
    np.testing.assert_allclose(np.asarray(coords_r), np.asarray(coords_ref),
                               rtol=1e-5, atol=1e-4)
