"""Half-body transform parity vs a NumPy oracle of the reference
`half_body_transform` (deterministic box math; the random gates are checked
via forced branches)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsgnet_tpu.data.augment import _half_body
from rsgnet_tpu.data.skeletons import get_spec

SPEC = get_spec("coco")
ASPECT = 192.0 / 256.0


def oracle(joints, vis, use_upper_rand):
    """Reference half_body_transform given the 0.5-coin outcome."""
    upper, lower = [], []
    for j in range(SPEC.num_joints):
        if vis[j] > 0:
            (upper if j in SPEC.upper_body_ids else lower).append(joints[j])
    if use_upper_rand and len(upper) > 2:
        selected = upper
    else:
        selected = lower if len(lower) > 2 else upper
    if len(selected) < 2:
        return None, None
    selected = np.asarray(selected, np.float32)
    center = selected.mean(axis=0)
    lt = selected.min(axis=0)
    rb = selected.max(axis=0)
    w, h = rb[0] - lt[0], rb[1] - lt[1]
    if w > ASPECT * h:
        h = w / ASPECT
    elif w < ASPECT * h:
        w = h * ASPECT
    return center, np.array([w / 200.0, h / 200.0], np.float32) * 1.5


def run_half_body(joints, vis, seed=0, prob=1.0):
    return _half_body(jax.random.PRNGKey(seed), jnp.asarray(joints),
                      jnp.asarray(vis), SPEC, ASPECT,
                      num_joints_half_body=8, prob_half_body=prob)


def make_joints(seed=0, visible=None):
    rng = np.random.RandomState(seed)
    joints = rng.uniform(50, 400, (SPEC.num_joints, 2)).astype(np.float32)
    vis = np.ones((SPEC.num_joints,), np.float32)
    if visible is not None:
        vis[:] = 0
        vis[list(visible)] = 1
    return joints, vis


@pytest.mark.parametrize("seed", range(6))
def test_matches_oracle_for_the_chosen_branch(seed):
    joints, vis = make_joints(seed)
    c, s, gate = run_half_body(joints, vis, seed=seed)
    assert bool(gate)
    # recover which branch the device code took by matching the oracle
    c_up, s_up = oracle(joints, vis, True)
    c_low, s_low = oracle(joints, vis, False)
    c, s = np.asarray(c), np.asarray(s)
    match_up = np.allclose(c, c_up, atol=1e-4) and np.allclose(s, s_up, atol=1e-5)
    match_low = np.allclose(c, c_low, atol=1e-4) and np.allclose(s, s_low, atol=1e-5)
    assert match_up or match_low


def test_center_is_joint_mean_not_box_center():
    """The reference centers the half-body crop on the MEAN of the selected
    joints; asymmetric clusters separate mean from box center."""
    joints, vis = make_joints(0)
    up = list(SPEC.upper_body_ids)
    low = list(SPEC.lower_body_ids)
    joints[up] = [[100, 100]] * (len(up) - 1) + [[300, 200]]
    joints[low] = [[100, 300]] * (len(low) - 1) + [[200, 500]]
    c, s, gate = run_half_body(joints, vis)
    assert bool(gate)
    c = np.asarray(c)
    for branch, box_center in ((True, [200.0, 150.0]),
                               (False, [150.0, 400.0])):
        want_c, want_s = oracle(joints, vis, use_upper_rand=branch)
        if np.allclose(c, want_c, atol=1e-4):
            np.testing.assert_allclose(np.asarray(s), want_s, atol=1e-5)
            # box center of this branch differs from the joint mean
            assert not np.allclose(c, box_center, atol=1.0)
            return
    raise AssertionError(f"center {c} matches neither branch oracle")


def test_gate_needs_enough_visible_joints():
    joints, vis = make_joints(0, visible=range(8))   # exactly 8 = not > 8
    _, _, gate = run_half_body(joints, vis)
    assert not bool(gate)


def test_gate_respects_probability():
    joints, vis = make_joints(0)
    _, _, gate = run_half_body(joints, vis, prob=0.0)
    assert not bool(gate)


def test_upper_fallback_when_lower_too_small():
    """<=2 lower joints and rand favoring lower: falls back to upper."""
    ids = list(SPEC.upper_body_ids)[:5] + list(SPEC.lower_body_ids)[:2]
    joints, vis = make_joints(1, visible=ids)
    for seed in range(8):
        c, s, gate = run_half_body(joints, vis, seed=seed, prob=1.0)
        if not bool(gate):
            continue
        want_c, want_s = oracle(joints, vis, use_upper_rand=False)
        np.testing.assert_allclose(np.asarray(c), want_c, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s), want_s, atol=1e-5)


def test_upper_branch_probability_is_randn_based():
    """The HRNet-family reference draws np.random.randn() < 0.5 to pick the
    upper half — P(upper) = Phi(0.5) ~= 0.691, NOT a fair coin (ADVICE.md
    round-1). Identify the chosen branch by the returned center."""
    joints, vis = make_joints(0)
    up = list(SPEC.upper_body_ids)
    low = list(SPEC.lower_body_ids)
    joints[up] = [[100.0, 100.0]] * len(up)     # upper cluster
    joints[low] = [[400.0, 400.0]] * len(low)   # lower cluster

    def one(key):
        c, s, gate = _half_body(key, jnp.asarray(joints), jnp.asarray(vis),
                                SPEC, ASPECT, num_joints_half_body=8,
                                prob_half_body=1.0)
        return c[0]

    keys = jax.random.split(jax.random.PRNGKey(42), 2000)
    cx = np.asarray(jax.vmap(one)(keys))
    frac_upper = float(np.mean(cx < 250.0))
    # Phi(0.5) = 0.6915; 2000 draws -> s.e. ~ 0.010
    assert 0.64 < frac_upper < 0.74, frac_upper
