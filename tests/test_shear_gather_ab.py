"""Shear-warp vs gather-warp training A/B (VERDICT round-2 item 6).

``TRAIN.WARP="shear"`` (the default) is exact at rot 0/90/flips but a
sheared-lattice bilinear at intermediate angles (ops/shear_warp.py), so its
*training filtering* differs slightly from the cv2-exact gather warp. The
claim behind the default is distributional parity: shear-trained models
learn the same task equally well. This test measures that claim instead of
arguing it: two identical tiny-HRNet trainings (same seeds, same data, same
step count, rotation + scale + flip aug ON so the warps actually diverge),
compared on a CLEAN un-augmented eval set.

The assertion is ONE-SIDED non-inferiority: the default must not LOSE
accuracy versus the cv2-exact gather warp. (A two-sided "equal within
noise" bound is not measurable at tiny scale, and the decision the test
guards is only "is shear safe as the default".)

Calibration is now MULTI-SEED (VERDICT round-3 item 2; round-4 run of
tools/profile_shear_ab_seeds.py, 3 paired seeds, 240 steps, rot 45 /
scale 0.25 / flip aug, PCK@8px): shear-gather deltas +0.109 / -0.017 /
+0.044 -> mean +0.045, stdev 0.063. Shear is AHEAD on average; the
worst observed seed is -0.017. The 0.08 tolerance below is the measured
mean - 2*stdev (= -0.081), i.e. derived from seed noise, not from the
single seed-0 anecdote (BENCH_NOTES.md round-4).
"""
import os

import numpy as np
import pytest

import jax

from rsgnet_tpu.config.defaults import tiny_rsgnet
from rsgnet_tpu.core.train import create_train_state, make_train_step
from rsgnet_tpu.data.skeletons import get_spec
from rsgnet_tpu.models import get_pose_net
from rsgnet_tpu.ops.decode import get_max_preds_jax
from rsgnet_tpu.ops.warp import normalize_image

from test_rsg_efficacy import IMG, K, render_crowd

SPEC = get_spec("crowdpose")


def _train(warp: str, seed=0, steps=240, batch=8):
    cfg = tiny_rsgnet()
    cfg.MODEL.NAME = "pose_hrnet"          # backbone only: cheapest trainer
    cfg.MODEL.RSG.ENABLED = False
    cfg.MODEL.NUM_JOINTS = K
    cfg.DATASET.DATASET = "crowdpose"
    cfg.MODEL.IMAGE_SIZE = (IMG, IMG)
    cfg.MODEL.HEATMAP_SIZE = (IMG // 4, IMG // 4)
    # aug ON — rotation is where shear and gather filtering differ
    cfg.DATASET.SCALE_FACTOR = 0.25
    cfg.DATASET.ROT_FACTOR = 45.0
    cfg.DATASET.FLIP = True
    cfg.DATASET.PROB_HALF_BODY = 0.0
    cfg.TRAIN.LR = 3e-3
    cfg.TRAIN.WARP = warp
    model = get_pose_net(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(seed))
    step = make_train_step(cfg, model, SPEC)
    rng = np.random.RandomState(seed + 1)
    imgs, tj, _ = render_crowd(rng, 48)
    key = jax.random.PRNGKey(seed)        # SAME aug stream for both warps
    for it in range(steps):
        idx = np.arange(it * batch, (it + 1) * batch) % len(imgs)
        b = {"image": imgs[idx], "joints": tj[idx],
             "joints_vis": np.ones((batch, K), np.float32),
             "center": np.full((batch, 2), IMG / 2, np.float32),
             "scale": np.full((batch, 2), IMG / 200.0, np.float32)}
        key, sub = jax.random.split(key)
        state, m = step(state, b, sub)
    assert np.isfinite(float(m["loss"]))
    return cfg, model, state


def _pck(model, state, te_imgs, te_tj, thr=8.0):
    import jax.numpy as jnp
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    hm = model.apply(variables, normalize_image(
        jnp.asarray(te_imgs, jnp.float32)), train=False)
    pred, _ = get_max_preds_jax(hm)
    pred = np.asarray(pred) * 4.0
    return float((np.linalg.norm(pred - te_tj, axis=-1) < thr).mean())


@pytest.mark.skipif(
    not os.environ.get("RSGNET_SLOW_TESTS"),
    reason="two full trainings (~6 min, 1-CPU); the outcome is measured and "
           "recorded in BENCH_NOTES round-3 — slow suite reproduces it "
           "(RSGNET_SLOW_TESTS=1)")
def test_shear_default_not_inferior_to_gather():
    te_imgs, te_tj, _ = render_crowd(np.random.RandomState(777), 64)
    _, m_s, s_s = _train("shear")
    _, m_g, s_g = _train("gather")
    pck_s = _pck(m_s, s_s, te_imgs, te_tj)
    pck_g = _pck(m_g, s_g, te_imgs, te_tj)
    stats = {"shear": pck_s, "gather": pck_g}
    # both warps learn under rotation aug (3-seed range 0.285-0.415 @8px)
    assert pck_s > 0.20 and pck_g > 0.15, stats
    # the default must not lose accuracy vs the cv2-exact warp; 0.08 =
    # measured mean - 2*stdev of the 3-seed paired deltas (module docstring)
    assert pck_s > pck_g - 0.08, stats
