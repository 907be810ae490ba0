"""End-to-end train-step tests: on-device aug + forward + backward + update,
including data-parallel sharding over the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from rsgnet_tpu.config import defaults
from rsgnet_tpu.core.train import (create_train_state, make_train_step,
                                   make_multistep_lr)
from rsgnet_tpu.data.skeletons import COCO
from rsgnet_tpu.data.augment import augment_batch
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.parallel.mesh import make_mesh, shard_batch


def _tiny_cfg(rsg=False):
    cfg = defaults.Config()
    cfg.DTYPE = "float32"
    cfg.MODEL.IMAGE_SIZE = (64, 64)
    cfg.MODEL.HEATMAP_SIZE = (16, 16)
    cfg.MODEL.SIGMA = 2
    cfg.MODEL.EXTRA = defaults.ModelExtra(
        STAGE2=defaults.StageConfig(1, 2, (1, 1), (8, 16)),
        STAGE3=defaults.StageConfig(1, 3, (1, 1, 1), (8, 16, 32)),
        STAGE4=defaults.StageConfig(1, 4, (1, 1, 1, 1), (8, 16, 32, 64)),
    )
    if rsg:
        cfg.MODEL.NAME = "pose_rsgnet"
        cfg.MODEL.RSG.ENABLED = True
        cfg.MODEL.RSG.NODE_CHANNELS = 16
        cfg.MODEL.RSG.RELATION_CHANNELS = 16
    return cfg


def _fake_batch(rng, n=8, k=17, src=96):
    joints = np.stack([rng.uniform(20, src - 20, (n, k)),
                       rng.uniform(20, src - 20, (n, k))], -1).astype(np.float32)
    return {
        "image": rng.uniform(0, 255, (n, src, src, 3)).astype(np.float32),
        "joints": joints,
        "joints_vis": (rng.uniform(size=(n, k)) > 0.1).astype(np.float32),
        "center": np.full((n, 2), src / 2, np.float32),
        "scale": np.full((n, 2), src / 200.0, np.float32),
    }


def test_augment_batch_shapes_and_ranges():
    cfg = _tiny_cfg()
    rng = np.random.RandomState(0)
    batch = _fake_batch(rng)
    aug = augment_batch(jax.random.PRNGKey(0), batch["image"],
                        batch["joints"], batch["joints_vis"],
                        batch["center"], batch["scale"], cfg, COCO)
    assert aug.inputs.shape == (8, 64, 64, 3)
    assert aug.target.shape == (8, 16, 16, 17)
    assert aug.target_weight.shape == (8, 17)
    assert bool(jnp.isfinite(aug.inputs).all())
    assert float(aug.target.max()) <= 1.0 + 1e-6
    # some joints must land in-bounds with weight > 0
    assert float(aug.target_weight.sum()) > 0


def test_augment_deterministic_given_key():
    cfg = _tiny_cfg()
    batch = _fake_batch(np.random.RandomState(1))
    a1 = augment_batch(jax.random.PRNGKey(7), batch["image"], batch["joints"],
                       batch["joints_vis"], batch["center"], batch["scale"],
                       cfg, COCO)
    a2 = augment_batch(jax.random.PRNGKey(7), batch["image"], batch["joints"],
                       batch["joints_vis"], batch["center"], batch["scale"],
                       cfg, COCO)
    np.testing.assert_array_equal(np.asarray(a1.inputs), np.asarray(a2.inputs))
    a3 = augment_batch(jax.random.PRNGKey(8), batch["image"], batch["joints"],
                       batch["joints_vis"], batch["center"], batch["scale"],
                       cfg, COCO)
    assert np.abs(np.asarray(a1.inputs) - np.asarray(a3.inputs)).max() > 0


def test_train_step_decreases_loss():
    cfg = _tiny_cfg()
    model = get_pose_net(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, COCO, donate=False)
    batch = _fake_batch(np.random.RandomState(2))
    rng = jax.random.PRNGKey(0)
    # same batch, same aug key -> loss must drop over a few steps
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert state.step == 5


def test_train_step_rsgnet_with_aux():
    cfg = _tiny_cfg(rsg=True)
    model = get_pose_net(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, COCO, donate=False)
    batch = _fake_batch(np.random.RandomState(3))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_data_parallel_8dev():
    """The BASELINE.json:11 contract: DP over the mesh, XLA allreduce."""
    cfg = _tiny_cfg()
    model = get_pose_net(cfg)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, COCO, donate=False)
    batch = _fake_batch(np.random.RandomState(4), n=16)
    with mesh:
        sharded = shard_batch(batch, mesh)
        state2, metrics = step(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # result equals the single-device run bit-for-bit is too strict for
    # reductions; check close instead
    state1, metrics1 = step(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics1["loss"]), rtol=1e-4)


def test_multistep_lr():
    cfg = _tiny_cfg()
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.LR_STEP = (2, 4)
    sched = make_multistep_lr(cfg, steps_per_epoch=10)
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    assert abs(float(sched(25)) - 1e-4) < 1e-9
    assert abs(float(sched(45)) - 1e-5) < 1e-9


def test_train_step_dp_params_match_single_device():
    """Strongest DP correctness statement available without hardware: the
    sharded 8-device step produces the SAME updated parameters (to fp32
    reduction tolerance) as the single-device step on the identical batch
    and rng (VERDICT round-1 item 8)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = _tiny_cfg()
    # SGD: the param delta is LINEAR in the gradient, so fp32 reduction
    # noise stays fp32-sized. (Adam's rsqrt normalization turns a 1e-10
    # gradient difference on a near-zero coordinate into a +-LR update
    # flip — parameter equality is not a meaningful check there.)
    cfg.TRAIN.OPTIMIZER = "sgd"
    cfg.TRAIN.MOMENTUM = 0.9
    model = get_pose_net(cfg)
    mesh = make_mesh()
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, COCO, jit=False)
    batch = _fake_batch(np.random.RandomState(9), n=16)
    key = jax.random.PRNGKey(3)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    sharded_step = jax.jit(step, in_shardings=(
        repl, {k: shard for k in batch}, repl))
    st_dp, m_dp = sharded_step(
        jax.device_put(state, repl),
        {k: jax.device_put(jnp.asarray(v), shard) for k, v in batch.items()},
        jax.device_put(key, repl))

    single_step = jax.jit(step)
    st_1, m_1 = single_step(state, batch, key)

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_1["loss"]),
                               rtol=1e-5)
    flat_dp = jax.tree_util.tree_leaves_with_path(st_dp.params)
    flat_1 = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(st_1.params)}
    for path, v_dp in flat_dp:
        v_1 = flat_1[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(v_dp), np.asarray(v_1),
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_fit_one_epoch_on_8dev_mesh(tmp_path):
    """fit() runs a whole epoch data-parallel over the virtual 8-chip mesh."""
    from rsgnet_tpu.config.defaults import tiny_rsgnet
    from rsgnet_tpu.core.function import fit
    from rsgnet_tpu.data import get_dataset
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture

    root = str(tmp_path)
    write_fixture(root, make_dataset())
    cfg = tiny_rsgnet()
    cfg.MODEL.NUM_JOINTS = 17
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 1      # global batch 8 over the mesh
    cfg.TRAIN.END_EPOCH = 1
    ds = get_dataset(cfg, root=root, image_set="val", is_train=True)
    ds.db = (ds.db * 5)[:16]              # 16 records -> 2 global batches
    model = get_pose_net(cfg)
    mesh = make_mesh()
    assert mesh.size == 8
    state, _ = fit(cfg, model, ds, val_dataset=None,
                   output_dir=str(tmp_path / "out"), num_workers=2,
                   max_epochs=1, mesh=mesh)
    assert int(state.step) == 2


def test_sgd_weight_decay_matches_torch_semantics():
    """Reference SGD applies weight_decay to the gradient BEFORE momentum;
    with zero gradients the first update must be -lr * wd * param."""
    import jax.numpy as jnp
    from rsgnet_tpu.config.defaults import tiny_rsgnet
    from rsgnet_tpu.core.train import make_optimizer

    cfg = tiny_rsgnet()
    cfg.TRAIN.OPTIMIZER = "sgd"
    cfg.TRAIN.LR = 0.1
    cfg.TRAIN.WD = 0.01
    cfg.TRAIN.LR_STEP = (1000,)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    params = {"w": jnp.asarray([2.0, -4.0])}
    state = tx.init(params)
    zero_g = {"w": jnp.zeros(2)}
    updates, _ = tx.update(zero_g, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               -0.1 * 0.01 * np.asarray(params["w"]),
                               rtol=1e-6)
