"""OKS computation and OKS-NMS — vectorized device kernels + NumPy oracle.

The reference's only in-repo native code is its NMS stack (SURVEY.md §2.14:
``lib/nms/nms.py`` + Cython ``cpu_nms`` + CUDA ``gpu_nms``). The TPU-native
redesign replaces the data-dependent greedy suppression loop with:

- a fully vectorized pairwise OKS matrix (one fused VPU expression over
  (M, M, K)), and
- a fixed-iteration masked greedy pass (``lax.fori_loop`` over instance
  slots) that is jit-compatible with static shapes — instances are padded to
  a fixed maximum per image and masked by score.

A NumPy oracle (`oks_iou`, `oks_nms_np`, `soft_oks_nms_np`) mirrors the
reference Python semantics for parity tests, and csrc/oks_nms.cpp provides
the C++ host fallback (the native-code analogue of the reference's Cython).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# NumPy oracle — mirrors reference lib/nms/nms.py semantics
# ---------------------------------------------------------------------------

def oks_iou(g, d, a_g, a_d, sigmas, in_vis_thre=None):
    """OKS between one gt pose ``g`` (51,) and rows of ``d`` (M, 51)."""
    sigmas = np.asarray(sigmas, np.float64)
    vars_ = (sigmas * 2) ** 2
    xg, yg, vg = g[0::3], g[1::3], g[2::3]
    ious = np.zeros(d.shape[0])
    for n_d in range(d.shape[0]):
        xd, yd, vd = d[n_d, 0::3], d[n_d, 1::3], d[n_d, 2::3]
        dx, dy = xd - xg, yd - yg
        e = (dx ** 2 + dy ** 2) / vars_ / ((a_g + a_d[n_d]) / 2 + np.spacing(1)) / 2
        if in_vis_thre is not None:
            ind = (vg > in_vis_thre) & (vd > in_vis_thre)
            e = e[ind]
        ious[n_d] = np.sum(np.exp(-e)) / e.shape[0] if e.shape[0] != 0 else 0.0
    return ious


def oks_nms_np(kpts_db, thresh, sigmas, in_vis_thre=None):
    """Greedy OKS-NMS (reference `oks_nms`). kpts_db: list of dicts with
    'keypoints' (K, 3), 'score', 'area'. Returns kept indices."""
    if len(kpts_db) == 0:
        return []
    scores = np.array([k['score'] for k in kpts_db])
    kpts = np.array([k['keypoints'].flatten() for k in kpts_db])
    areas = np.array([k['area'] for k in kpts_db])
    # kind='stable' pins the tie order (ascending stable, then reversed =>
    # HIGHEST index first among equal scores); the default quicksort would
    # leave ties implementation-defined and the device/C++ kernels could
    # only match it by luck (ADVICE round-2)
    order = scores.argsort(kind="stable")[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        oks_ovr = oks_iou(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]],
                          sigmas, in_vis_thre)
        inds = np.where(oks_ovr <= thresh)[0]
        order = order[inds + 1]
    return keep


def soft_oks_nms_np(kpts_db, thresh, sigmas, in_vis_thre=None, max_dets=20):
    """Soft OKS-NMS (reference `soft_oks_nms`): gaussian score decay.

    Selection is a max-scan over the live (cumulatively decayed) scores
    rather than the reference's per-round ``argsort()[::-1]`` re-sort: on
    exact score ties the reference's quicksort order is implementation-
    defined (and a reversed *stable* re-sort ALTERNATES the order of
    undecayed ties every round, which no fixed-rule kernel can reproduce).
    The defined tie-break here — HIGHEST index among equal live scores —
    is shared bit-for-bit by all three implementations (this oracle, the
    C++ ``soft_oks_nms`` >= scan, and the device kernel's reversed argmax);
    away from exact ties the semantics are identical to the reference.
    """
    if len(kpts_db) == 0:
        return [], []
    scores = np.array([k['score'] for k in kpts_db], dtype=np.float64)
    kpts = np.array([k['keypoints'].flatten() for k in kpts_db])
    areas = np.array([k['area'] for k in kpts_db])
    n = scores.shape[0]
    live = scores.copy()
    alive = np.ones(n, bool)
    keep = []
    kept_scores = []
    while len(keep) < max_dets:
        masked = np.where(alive, live, -np.inf)
        i = int(n - 1 - np.argmax(masked[::-1]))  # tie -> highest index
        if not alive[i]:
            break
        keep.append(i)
        kept_scores.append(live[i])               # decayed score at selection
        alive[i] = False
        rest = np.where(alive)[0]
        if rest.size:
            oks_ovr = oks_iou(kpts[i], kpts[rest], areas[i], areas[rest],
                              sigmas, in_vis_thre)
            live[rest] = _rescore(oks_ovr, live[rest], thresh)
    return keep, np.asarray(kept_scores)


def _rescore(overlap, scores, thresh, type='gaussian'):
    if type == 'linear':
        inds = np.where(overlap >= thresh)[0]
        scores[inds] = scores[inds] * (1 - overlap[inds])
    else:
        scores = scores * np.exp(-overlap ** 2 / thresh)
    return scores


# ---------------------------------------------------------------------------
# JAX vectorized device implementation
# ---------------------------------------------------------------------------

def oks_matrix_jax(kpts, areas, sigmas, in_vis_thre=None):
    """Pairwise OKS over padded instances.

    kpts: (M, K, 3) poses [x, y, score]; areas: (M,); sigmas: (K,).
    Visibility comes from ``kpts[..., 2]`` (gated by ``in_vis_thre``).
    Returns (M, M) OKS matrix (diagonal = self-OKS, ~1).
    """
    kpts = jnp.asarray(kpts, jnp.float32)
    sigmas = jnp.asarray(sigmas, jnp.float32)
    vars_ = (sigmas * 2.0) ** 2
    xy = kpts[..., :2]
    d2 = jnp.sum((xy[:, None, :, :] - xy[None, :, :, :]) ** 2, axis=-1)
    denom_area = (areas[:, None] + areas[None, :]) / 2.0 + 1e-9
    e = d2 / vars_[None, None, :] / denom_area[..., None] / 2.0
    ek = jnp.exp(-e)
    if in_vis_thre is not None:
        v = kpts[..., 2]
        mask = ((v[:, None, :] > in_vis_thre)
                & (v[None, :, :] > in_vis_thre)).astype(jnp.float32)
        cnt = jnp.sum(mask, axis=-1)
        return jnp.where(cnt > 0, jnp.sum(ek * mask, axis=-1)
                         / jnp.maximum(cnt, 1.0), 0.0)
    k = kpts.shape[1]
    return jnp.sum(ek, axis=-1) / k


def oks_nms_jax(kpts, scores, areas, sigmas, thresh, valid=None,
                in_vis_thre=None):
    """Fixed-iteration greedy OKS-NMS on device.

    Args:
      kpts: (M, K, 3) padded poses; scores: (M,); areas: (M,).
      valid: (M,) bool — padding mask (False rows never kept).

    Returns:
      keep: (M,) bool mask of surviving instances.

    Equivalent to the reference greedy loop: process instances in descending
    score order; keep an instance iff no higher-scored *kept* instance
    overlaps it with OKS > thresh.
    """
    m = kpts.shape[0]
    scores = jnp.asarray(scores, jnp.float32)
    if valid is None:
        valid = jnp.ones((m,), bool)
    oks = oks_matrix_jax(kpts, jnp.asarray(areas, jnp.float32), sigmas,
                         in_vis_thre=in_vis_thre)
    # descending, with the ORACLE's tie-break: the oracle's ascending STABLE
    # argsort reversed puts the HIGHER index first among equal scores;
    # jnp.argsort(-scores) (stable) would put the lower index first and the
    # device kernel would keep a different instance of a tied pair
    order = jnp.argsort(scores, stable=True)[::-1]
    # oks reordered so row/col i = i-th best instance
    oks_sorted = oks[order][:, order]
    valid_sorted = valid[order]

    def body(i, keep):
        # suppressed iff any kept j < i has oks > thresh
        over = (oks_sorted[i] > thresh) & keep
        prior = jnp.arange(m) < i
        suppressed = jnp.any(over & prior)
        return keep.at[i].set(valid_sorted[i] & ~suppressed)

    keep_sorted = jax.lax.fori_loop(0, m, body, jnp.zeros((m,), bool))
    # scatter back to original order
    keep = jnp.zeros((m,), bool).at[order].set(keep_sorted)
    return keep


@functools.lru_cache(maxsize=4)
def _batched_nms_jit(in_vis_thre):
    """Module-level cached jit — fresh closures per call would retrace and
    recompile the whole-dataset NMS program on every evaluate()."""
    def f(kpts, scores, areas, valid, sigmas, thresh):
        return jax.vmap(lambda kp, sc, ar, va: oks_nms_jax(
            kp, sc, ar, sigmas, thresh, valid=va,
            in_vis_thre=in_vis_thre))(kpts, scores, areas, valid)
    return jax.jit(f)


def batched_oks_nms_jax(kpts_per_image, scores_per_image, areas_per_image,
                        sigmas, thresh, in_vis_thre=None, pad_to=None):
    """Whole-dataset OKS-NMS in ONE device call (BASELINE.json:5 "OKS-NMS
    become vectorized device kernels").

    Args:
      kpts_per_image: list of (m_i, K, 3) arrays (variable m_i per image).
      scores/areas_per_image: lists of (m_i,) arrays.
      pad_to: static instance capacity per image (default: max m_i).

    Returns: list of kept-index arrays (ascending original order per image).
    """
    n = len(kpts_per_image)
    if n == 0:
        return []
    kpts, scores, areas, valid = _pad_instances(
        kpts_per_image, scores_per_image, areas_per_image, pad_to)
    nms = _batched_nms_jit(in_vis_thre)
    keep = np.asarray(nms(jnp.asarray(kpts), jnp.asarray(scores),
                          jnp.asarray(areas), jnp.asarray(valid),
                          jnp.asarray(sigmas, jnp.float32),
                          jnp.float32(thresh)))
    return [np.where(keep[i, :kpts_per_image[i].shape[0]])[0]
            for i in range(n)]


def _pad_instances(kpts_per_image, scores_per_image, areas_per_image,
                   pad_to=None):
    """Pad variable-length per-image instance lists to (N, M, ...) arrays."""
    n = len(kpts_per_image)
    k = kpts_per_image[0].shape[1]
    biggest = max(x.shape[0] for x in kpts_per_image)
    m = int(pad_to or biggest)
    if biggest > m:
        # a caller pinning pad_to for stable jit shapes must hear about a
        # capacity overflow, not crash on an opaque broadcast error
        raise ValueError(
            f"pad_to={m} is smaller than the largest per-image instance "
            f"count ({biggest}); raise pad_to or pre-trim the instances")
    kpts = np.zeros((n, m, k, 3), np.float32)
    scores = np.zeros((n, m), np.float32)
    areas = np.ones((n, m), np.float32)
    valid = np.zeros((n, m), bool)
    for i, (kp, sc, ar) in enumerate(zip(kpts_per_image, scores_per_image,
                                         areas_per_image)):
        mi = kp.shape[0]
        kpts[i, :mi] = kp
        scores[i, :mi] = sc
        areas[i, :mi] = ar
        valid[i, :mi] = True
    return kpts, scores, areas, valid


@functools.lru_cache(maxsize=4)
def _batched_soft_nms_jit(in_vis_thre, max_dets):
    def f(kpts, scores, areas, valid, sigmas, thresh):
        return jax.vmap(lambda kp, sc, ar, va: soft_oks_nms_jax(
            kp, sc, ar, sigmas, thresh, valid=va,
            in_vis_thre=in_vis_thre, max_dets=max_dets))(
                kpts, scores, areas, valid)
    return jax.jit(f)


def batched_soft_oks_nms_jax(kpts_per_image, scores_per_image,
                             areas_per_image, sigmas, thresh,
                             in_vis_thre=None, max_dets=20, pad_to=None):
    """Whole-dataset soft OKS-NMS in ONE device call (the soft analogue of
    ``batched_oks_nms_jax``; SURVEY.md §2.14, BASELINE.json:5).

    Returns a list of (kept_indices, decayed_scores_for_kept) per image —
    indices ascending in original order, decayed scores aligned with them.
    """
    n = len(kpts_per_image)
    if n == 0:
        return []
    kpts, scores, areas, valid = _pad_instances(
        kpts_per_image, scores_per_image, areas_per_image, pad_to)
    nms = _batched_soft_nms_jit(in_vis_thre, int(max_dets))
    keep, new_scores = nms(jnp.asarray(kpts), jnp.asarray(scores),
                           jnp.asarray(areas), jnp.asarray(valid),
                           jnp.asarray(sigmas, jnp.float32),
                           jnp.float32(thresh))
    keep = np.asarray(keep)
    new_scores = np.asarray(new_scores)
    out = []
    for i in range(n):
        mi = kpts_per_image[i].shape[0]
        idx = np.where(keep[i, :mi])[0]
        out.append((idx, new_scores[i, idx]))
    return out


def soft_oks_nms_jax(kpts, scores, areas, sigmas, thresh, valid=None,
                     in_vis_thre=None, max_dets=20):
    """Soft OKS-NMS with gaussian decay, fixed iterations, on device.

    Returns (keep_mask, new_scores): instances selected in up to ``max_dets``
    rounds with their decayed scores.
    """
    m = kpts.shape[0]
    scores = jnp.asarray(scores, jnp.float32)
    if valid is None:
        valid = jnp.ones((m,), bool)
    oks = oks_matrix_jax(kpts, jnp.asarray(areas, jnp.float32), sigmas,
                         in_vis_thre=in_vis_thre)
    neg_inf = jnp.float32(-1e30)
    live_scores = jnp.where(valid, scores, neg_inf)

    def body(_, state):
        live_scores, out_scores, keep, dead = state
        # shared tie-break (NumPy oracle max-scan, C++ >= scan): the HIGHEST
        # index among equal live scores; plain argmax would pick the lowest
        i = m - 1 - jnp.argmax(live_scores[::-1])
        ok = live_scores[i] > neg_inf / 2
        decay = jnp.exp(-(oks[i] ** 2) / thresh)
        new_live = jnp.where(ok, live_scores * decay, live_scores)
        dead = dead.at[i].set(True)
        # dead slots (consumed or invalid-from-the-start) must stay pinned
        # at neg_inf: the per-round decay would otherwise drag the sentinel
        # toward 0 until a spent slot passed the liveness test again and
        # clobbered its returned decayed score
        new_live = jnp.where(dead, neg_inf, new_live)
        keep = keep.at[i].set(keep[i] | ok)
        out_scores = out_scores.at[i].set(
            jnp.where(ok, live_scores[i], out_scores[i]))
        return new_live, out_scores, keep, dead

    rounds = min(max_dets, m)
    _, out_scores, keep, _ = jax.lax.fori_loop(
        0, rounds, body,
        (live_scores, jnp.asarray(scores), jnp.zeros((m,), bool), ~valid))
    return keep, out_scores
