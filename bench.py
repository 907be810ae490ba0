"""Benchmark harness — COCO val top-down inference images/sec/chip @ 256x192.

Measures the benchmark-critical path from SURVEY.md §3.2 / BASELINE.json:2 on
the flagship model (RSGNet-W32: HRNet backbone + relation/skeleton-graph
head): batched crops -> model forward -> flip-test average (FLIP_TEST=true,
the reference eval protocol) -> sub-pixel decode -> image-space coordinates,
all one jitted XLA program, bf16 conv compute.

Measurement protocol: distinct pre-staged device-resident batches, N
pipelined dispatches, then EVERY output materialized to host before the
clock stops — on asynchronous/tunneled backends, fencing only the last
result under-counts; materializing all outputs cannot.

Prints JSON lines; the LAST line is the headline metric the driver records
({"metric", "value", "unit", "vs_baseline"}). A preceding line reports the
true END-TO-END eval path (640^2 padded source -> device warp -> model ->
flip-test -> decode), which includes the preprocessing the headline excludes
(VERDICT round-1: report both; optimize the real one).

OUTAGE RESILIENCE (VERDICT round-3 item 1): round 3's driver artifact was
rc=124/parsed-null because one hung remote compile (axon-tunnel outage)
starved every output line. This harness therefore runs as an ORCHESTRATOR:

- the parent process never imports jax — nothing backend-side can hang it;
- each section runs in a child process (``python bench.py --section NAME``)
  under a hard wall-clock watchdog; a hung compile becomes a
  ``"skipped: timeout"`` JSON line, not silence;
- children share a persistent XLA compile cache (same mechanism as
  tests/conftest.py), so repeat sections/runs load AOT results;
- the HEADLINE section is measured FIRST (cheapest program, the metric the
  driver records) but its line is printed LAST so the driver's
  last-line parser finds it; auxiliary sections run after, inside a global
  wall-clock budget, and are skipped (with a skip line) once the budget is
  spent. If the headline section itself dies, it is retried once in a
  reduced ``--fast`` shape; if that also fails but the strictly-harder e2e
  protocol produced a number, that value is reported as a conservative
  stand-in (flagged in ``unit``); in a TOTAL outage (every section dead)
  the last direct measurement this machine recorded is re-reported with an
  explicit STALE label (``.bench_last_good.json``); only with no history at
  all does the line carry ``value: null``.

Aux sections get the full remaining budget rather than a fixed cap — a cap
below a program's cold-compile time would kill the child before it writes
the compile cache and that section could never become warm; greedy budgets
let the cache ratchet one section per run until all five lines complete
(measured: run 1 banked e2e, run 4 completed e2e+full+res50).

Operational note: this box has ONE host core — running ANYTHING CPU-heavy
(pytest, training) concurrently starves the children's host work and can
null the whole run (observed live, round 4).

``vs_baseline`` ALWAYS normalizes by an estimate of the reference stack's
A100 throughput for the SAME protocol (uniform semantics across every line —
VERDICT round-2 item 4). No published figure exists (BASELINE.md:23 — the
reference repo publishes no speed numbers and the mount is empty), so the
denominators are estimates, documented here and held FIXED across rounds so
the series is comparable:

- eval paths: PyTorch fp32 DataParallel validate loop (flip-test on,
  batch 32/GPU) for HRNet-W32 @ 256x192 on one A100 ~= 800 images/sec.
- train path: PyTorch fp32 train step (fwd+bwd+SGD-class update, batch
  32/GPU, cuDNN benchmark, host cv2 aug pipelined by DataLoader workers)
  for the same model ~= 400 images/sec on one A100 — eval does 2 forwards
  (flip-test) where train does ~1 fwd + ~2x-cost bwd + update, so the
  train ceiling is roughly half the eval ceiling; the host-aug bound of
  the reference loader keeps it at or below that.

The driver target is >=2x A100, i.e. vs_baseline >= 2.0 on every line.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

A100_REF_IMAGES_PER_SEC = 800.0   # estimated reference A100 eval throughput
A100_REF_TRAIN_IMAGES_PER_SEC = 400.0   # estimated A100 train throughput
BATCH = 128
# >=2 distinct pre-staged batches defeat any result-caching illusion while
# keeping the tunnel H2D pre-staging (OUTSIDE the timed region) bounded —
# at 4 fp32 batches the headline section stages ~300 MB; the round-4 cut
# from 8/4-batch staging bought minutes of section budget with identical
# measured rates (the clock only covers the dispatch loop).
DISTINCT = 4
ITERS = 30

_HERE = os.path.dirname(os.path.abspath(__file__))

# Orchestration knobs (env-overridable so tests can shrink them).
SECTION_TIMEOUT = float(os.environ.get("RSGNET_BENCH_SECTION_TIMEOUT", 240))
GLOBAL_BUDGET = float(os.environ.get("RSGNET_BENCH_BUDGET", 520))
# minimum leftover budget worth spawning an aux section for
MIN_SPAWN = float(os.environ.get("RSGNET_BENCH_MIN_SPAWN", 20))

_HEADLINE_METRIC = "coco_val_topdown_inference_images_per_sec_per_chip"
_SECTION_METRICS = {
    "headline": _HEADLINE_METRIC,
    "train": "train_step_images_per_sec_per_chip",
    "e2e": "coco_val_e2e_eval_images_per_sec_per_chip",
    "full": "coco_val_e2e_full_images_per_sec_per_chip",
    "res50": "res50_e2e_eval_images_per_sec_per_chip",
    # Non-default sections (BASELINE configs 3-4; VERDICT round-4 item 5):
    # not in _SECTION_ORDER — the driver budget cannot fit them — but
    # runnable any round via `python bench.py --section w48` etc., so the
    # per-config tables in BENCH_NOTES stay cheap to refresh.
    "w48": "w48_384_e2e_eval_images_per_sec_per_chip",
    "w48_train": "w48_384_train_step_images_per_sec_per_chip",
    "crowdpose": "crowdpose_e2e_eval_images_per_sec_per_chip",
    "crowdpose_train": "crowdpose_train_step_images_per_sec_per_chip",
}
# Per-config A100 denominators, FLOPs-scaled from the fixed W32 estimates
# (HRNet-paper GFLOPs: W32@256x192 = 7.1, W48@384x288 = 32.9; the
# CrowdPose model is the same backbone+input as W32, graph head ~2%).
_W48_SCALE = 7.1 / 32.9
A100_REF_W48_EVAL = A100_REF_IMAGES_PER_SEC * _W48_SCALE          # 172.6
A100_REF_W48_TRAIN = A100_REF_TRAIN_IMAGES_PER_SEC * _W48_SCALE   # 86.3
# Headline first (the driver-recorded metric must be banked before anything
# expensive can hang); train is the costliest compile so it goes last among
# the aux sections — a spent budget then skips it loudly instead of eating
# the cheaper eval lines with it.
_SECTION_ORDER = ("headline", "e2e", "full", "res50", "train")


def _wire_compile_cache():
    """Persistent XLA compile cache for child processes (one shared
    implementation: rsgnet_tpu/utils/compile_cache.py). On a degraded
    tunnel, repeat runs (and the driver's end-of-round run after this
    session's runs) load AOT results instead of re-paying remote
    compiles."""
    from rsgnet_tpu.utils.compile_cache import wire
    wire(os.path.join(_HERE, ".jax_compile_cache"))


# ---------------------------------------------------------------------------
# Sections (run inside child processes)
# ---------------------------------------------------------------------------

def _flagship():
    from rsgnet_tpu.config.defaults import rsgnet_w32_256x192
    from rsgnet_tpu.models import get_pose_net, init_variables

    import jax
    import numpy as np

    cfg = rsgnet_w32_256x192()
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    # ONE jitted init program (cache-loadable): eager init costs minutes of
    # per-op remote-compile RTTs on the tunnel (measured round 4)
    variables = init_variables(model, jax.random.PRNGKey(0),
                               np.zeros((1, h, w, 3), np.float32))
    return cfg, model, variables


def bench_headline(fast=False):
    """The driver-recorded metric: pre-staged 256x192 crops -> forward ->
    flip-test -> decode, pipelined, every output materialized."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rsgnet_tpu.core.inference import make_inference_fn

    cfg, model, variables = _flagship()
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    batch, iters = (64, 10) if fast else (BATCH, ITERS)

    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.uniform(-2, 2, (batch, h, w, 3)).astype(np.float32))
          for _ in range(DISTINCT)]
    centers = jnp.tile(jnp.asarray([[320.0, 240.0]], jnp.float32), (batch, 1))
    scales = jnp.tile(jnp.asarray([[1.2, 1.6]], jnp.float32), (batch, 1))

    infer = make_inference_fn(cfg, model)
    for i in range(2):                    # warm (compile) + settle
        preds, maxvals = infer(variables, xs[i], centers, scales)
    np.asarray(preds), np.asarray(maxvals)

    t0 = time.perf_counter()
    outs = [infer(variables, xs[i % DISTINCT], centers, scales)
            for i in range(iters)]
    # materialize every output — forces all compute, defeats async illusions
    sink = [(np.asarray(p), np.asarray(m)) for p, m in outs]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(p).all() for p, _ in sink)

    ips = batch * iters / dt
    unit = "images/sec/chip (256x192, flip-test on, decode included)"
    if fast:
        unit += " [fast retry: B=64, 10 iters]"
    print(json.dumps({
        "metric": _HEADLINE_METRIC,
        "value": round(ips, 2),
        "unit": unit,
        "vs_baseline": round(ips / A100_REF_IMAGES_PER_SEC, 3),
    }))


def bench_e2e(cfg=None, model=None, variables=None,
              metric="coco_val_e2e_eval_images_per_sec_per_chip",
              b=128, denom=None):
    """True end-to-end eval throughput: 640^2 uint8 sources, fused device
    warp -> forward -> flip-test -> decode. Small (coords) outputs, so
    materializing them is an honest fence.

    B=128: like the train step, this path is per-op-overhead-bound and
    batch amortizes it (B=64: 900-972, B=128: 1857, B=256: 1791 img/s
    measured round 2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rsgnet_tpu.core.inference import make_e2e_fn

    if model is None:
        cfg, model, variables = _flagship()

    src, iters = 640, 12
    rng = np.random.RandomState(1)
    imgs = [jnp.asarray(rng.randint(0, 255, (b, src, src, 3), np.uint8))
            for _ in range(2)]
    centers = jnp.asarray(rng.uniform(200, 440, (b, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, b) * 0.75,
                                   rng.uniform(0.8, 1.5, b)],
                                  -1).astype(np.float32))
    e2e = make_e2e_fn(cfg, model, (src, src))
    outs = [e2e(variables, imgs[i % 2], centers, scales) for i in range(2)]
    jax.tree_util.tree_map(np.asarray, outs)
    t0 = time.perf_counter()
    outs = [e2e(variables, imgs[i % 2], centers, scales)
            for i in range(iters)]
    sink = jax.tree_util.tree_map(np.asarray, outs)
    dt = time.perf_counter() - t0
    assert all(np.isfinite(p).all() for p, _ in sink)
    ips = b * iters / dt
    denom = denom or A100_REF_IMAGES_PER_SEC
    print(json.dumps({
        "metric": metric,
        "value": round(ips, 2),
        "unit": f"images/sec/chip (640^2 src device-warp + flip-test + "
                f"decode; vs est. {denom:.1f} img/s A100)",
        "vs_baseline": round(ips / denom, 3),
    }))


def bench_res50():
    """Second model family (SimpleBaseline res50 @ 256x192) on the same
    e2e protocol — the repo's highest-MXU-utilization model (57 eff
    TFLOP/s, BENCH_NOTES round 3). B=192 is its sweep optimum.

    vs_baseline uses the SAME 800 img/s A100 denominator as the W32 lines:
    res50@256x192 is the reference family's lighter/faster member (~5.4 vs
    ~7.1 GFLOP/fwd), so a single fixed eval denominator keeps the series
    comparable rather than inventing a per-model estimate."""
    import jax
    import numpy as np

    from rsgnet_tpu.config.defaults import res50_256x192
    from rsgnet_tpu.models import get_pose_net, init_variables

    cfg = res50_256x192()
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = init_variables(model, jax.random.PRNGKey(0),
                               np.zeros((1, h, w, 3), np.float32))
    bench_e2e(cfg, model, variables,
              metric="res50_e2e_eval_images_per_sec_per_chip", b=192)


def bench_e2e_full():
    """The WHOLE BASELINE config-2 contract in one device program: 640^2
    uint8 sources -> device warp -> forward -> flip-test -> decode ->
    rescoring (mean kpt score above IN_VIS_THRE x box score) -> per-image
    greedy OKS-NMS — nothing left on the host but the final gather
    (VERDICT round-2 item 3: the e2e number must include suppression)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rsgnet_tpu.core.inference import make_e2e_fn
    from rsgnet_tpu.data.skeletons import get_spec
    from rsgnet_tpu.ops.nms import oks_nms_jax

    cfg, model, variables = _flagship()

    b, src, iters, per_img = 128, 640, 12, 16
    spec = get_spec("coco")
    sigmas = jnp.asarray(spec.sigmas, jnp.float32)
    rng = np.random.RandomState(5)
    imgs = [jnp.asarray(rng.randint(0, 255, (b, src, src, 3), np.uint8))
            for _ in range(2)]
    centers = jnp.asarray(rng.uniform(200, 440, (b, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, b) * 0.75,
                                   rng.uniform(0.8, 1.5, b)],
                                  -1).astype(np.float32))
    box_scores = jnp.asarray(rng.uniform(0.3, 1.0, b).astype(np.float32))
    e2e = make_e2e_fn(cfg, model, (src, src), jit=False)
    ivt = jnp.float32(cfg.TEST.IN_VIS_THRE)
    thre = jnp.float32(cfg.TEST.OKS_THRE)

    def full(variables, raw, c, s, bscore):
        preds, maxvals = e2e(variables, raw, c, s)
        ks = maxvals[..., 0]
        valid = ks > ivt
        cnt = jnp.maximum(valid.sum(-1), 1)
        kpt_score = jnp.where(valid.any(-1),
                              (ks * valid).sum(-1) / cnt, 0.0)
        scores = kpt_score * bscore
        kpts = jnp.concatenate([preds, maxvals], -1)     # (B, K, 3)
        areas = jnp.prod(s * 200.0, axis=-1)
        keep = jax.vmap(lambda kp, sc, ar: oks_nms_jax(
            kp, sc, ar, sigmas, thre))(
                kpts.reshape(-1, per_img, kpts.shape[1], 3),
                scores.reshape(-1, per_img), areas.reshape(-1, per_img))
        # pack scores+keep into ONE aux leaf: on the tunneled backend each
        # materialized output leaf costs a ~30 ms D2H round trip, so a
        # 3-leaf return would bill this path one extra RTT per iteration
        # (~0.23 ms/img of pure measurement artifact vs bench_e2e's 2 leaves)
        aux = jnp.stack([scores, keep.reshape(-1).astype(jnp.float32)], -1)
        return preds, aux

    full = jax.jit(full)
    outs = [full(variables, imgs[i % 2], centers, scales, box_scores)
            for i in range(2)]
    jax.tree_util.tree_map(np.asarray, outs)
    t0 = time.perf_counter()
    outs = [full(variables, imgs[i % 2], centers, scales, box_scores)
            for i in range(iters)]
    sink = jax.tree_util.tree_map(np.asarray, outs)
    dt = time.perf_counter() - t0
    assert all(np.isfinite(p).all() and np.isfinite(a).all()
               for p, a in sink)
    ips = b * iters / dt
    print(json.dumps({
        "metric": "coco_val_e2e_full_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip (640^2 src device-warp + flip-test + "
                "decode + rescore + OKS-NMS on device)",
        "vs_baseline": round(ips / A100_REF_IMAGES_PER_SEC, 3),
    }))


def bench_train(cfg=None, metric="train_step_images_per_sec_per_chip",
                denom=A100_REF_TRAIN_IMAGES_PER_SEC, b=128):
    """FULL train step (on-device shear-warp aug from 640^2 uint8 sources +
    fwd + bwd + fused optimizer update), pipelined: the state threads on
    device and ONE loss scalar is materialized at the end — matching how
    core/function.py's lazy metric fetch drives real training.

    B=128: the step is per-op-overhead-bound, so throughput rises with
    batch (B=64: 524-532, B=96: 684, B=128: 812 img/s measured round 2);
    128 fits comfortably since the uint8 roll-warp pipeline replaced the
    fp32 gather intermediates that OOM'd round 1. Round 3: the default
    TRAIN.WARP="auto" resolves to the fused Pallas warp on the real chip
    (measured 1002.5 img/s @B=128 vs 806.0 on the XLA shear path —
    BENCH_NOTES "fused Pallas shear warp")."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rsgnet_tpu.config.defaults import rsgnet_w32_256x192
    from rsgnet_tpu.core.train import create_train_state, make_train_step
    from rsgnet_tpu.data.skeletons import get_spec
    from rsgnet_tpu.models import get_pose_net

    if cfg is None:
        cfg = rsgnet_w32_256x192()
    model = get_pose_net(cfg)

    src, iters = 640, 10
    k = cfg.MODEL.NUM_JOINTS
    rng = np.random.RandomState(2)
    imgs = [jnp.asarray(rng.randint(0, 255, (b, src, src, 3), np.uint8))
            for _ in range(2)]
    joints = jnp.asarray(rng.uniform(150, 450, (b, k, 2)).astype(np.float32))
    vis = jnp.asarray((rng.uniform(size=(b, k)) > 0.2).astype(np.float32))
    centers = jnp.asarray(rng.uniform(200, 440, (b, 2)).astype(np.float32))
    scales = jnp.asarray(np.stack([rng.uniform(0.8, 1.5, b) * 0.75,
                                   rng.uniform(0.8, 1.5, b)],
                                  -1).astype(np.float32))
    batches = [{"image": x, "joints": joints, "joints_vis": vis,
                "center": centers, "scale": scales} for x in imgs]
    key = jax.random.PRNGKey(0)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, get_spec(cfg.DATASET.DATASET))
    # the ONE shared implementation of the pipelined scalar-fetch protocol
    # (tools/_profiling.py) — duplicating it here risks silent divergence
    sys.path.insert(0, os.path.join(_HERE, "tools"))
    from _profiling import timeit_pipelined_step
    dt = timeit_pipelined_step("train step (pipelined)", step, state,
                               [(bt, key) for bt in batches], iters=iters,
                               batch=b)
    ips = b / dt
    print(json.dumps({
        "metric": metric,
        "value": round(ips, 2),
        "unit": f"images/sec/chip (B={b}: device aug 640^2 + "
                f"fwd+bwd+update; vs est. {denom:.1f} img/s A100 fp32 "
                "train)",
        "vs_baseline": round(ips / denom, 3),
    }))


def bench_w48(train=False):
    """BASELINE config 3 (HRNet-W48 @ 384x288, DARK decode) on the e2e /
    train protocols at its measured batch optimum B=128 (BENCH_NOTES
    round-3 sweep). vs_baseline uses the FLOPs-scaled per-config
    denominators documented at _SECTION_METRICS."""
    import jax
    import numpy as np

    from rsgnet_tpu.config.defaults import w48_384x288
    from rsgnet_tpu.models import get_pose_net, init_variables

    cfg = w48_384x288()
    if train:
        bench_train(cfg=cfg, metric=_SECTION_METRICS["w48_train"],
                    denom=A100_REF_W48_TRAIN, b=128)
        return
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = init_variables(model, jax.random.PRNGKey(0),
                               np.zeros((1, h, w, 3), np.float32))
    bench_e2e(cfg, model, variables, metric=_SECTION_METRICS["w48"],
              b=128, denom=A100_REF_W48_EVAL)


def bench_crowdpose(train=False):
    """BASELINE config 4 (CrowdPose RSGNet-W32 @ 256x192, 14 keypoints,
    relation/skeleton-graph head ON) at its B=128 optimum. Same 800/400
    denominators as W32-COCO (same backbone+input; the graph head adds
    ~2% FLOPs)."""
    import jax
    import numpy as np

    from rsgnet_tpu.config.defaults import crowdpose_rsgnet_w32
    from rsgnet_tpu.models import get_pose_net, init_variables

    cfg = crowdpose_rsgnet_w32()
    if train:
        bench_train(cfg=cfg, metric=_SECTION_METRICS["crowdpose_train"],
                    denom=A100_REF_TRAIN_IMAGES_PER_SEC, b=128)
        return
    model = get_pose_net(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]
    variables = init_variables(model, jax.random.PRNGKey(0),
                               np.zeros((1, h, w, 3), np.float32))
    bench_e2e(cfg, model, variables, metric=_SECTION_METRICS["crowdpose"],
              b=128)


def _run_child_section(name, fast=False):
    """Child-process entry: wire the compile cache, honor fault injection
    (tests only), run one section, print its JSON line."""
    faults = os.environ.get("RSGNET_BENCH_FAULT", "").split(",")
    if name in faults:
        time.sleep(3600)                 # simulated hung remote compile
    if os.environ.get("RSGNET_BENCH_FAKE"):
        # Test-only orchestration mode: no jax, instant deterministic line.
        print(json.dumps({
            "metric": _SECTION_METRICS[name],
            "value": 1000.0 + len(name),
            "unit": "FAKE (RSGNET_BENCH_FAKE test mode)",
            "vs_baseline": 2.5,
        }))
        return
    _wire_compile_cache()
    if name == "headline":
        bench_headline(fast=fast)
    elif name == "train":
        bench_train()
    elif name == "e2e":
        bench_e2e()
    elif name == "full":
        bench_e2e_full()
    elif name == "res50":
        bench_res50()
    elif name == "w48":
        bench_w48()
    elif name == "w48_train":
        bench_w48(train=True)
    elif name == "crowdpose":
        bench_crowdpose()
    elif name == "crowdpose_train":
        bench_crowdpose(train=True)
    else:
        raise SystemExit(f"unknown section {name!r}")


# ---------------------------------------------------------------------------
# Orchestrator (parent process — never imports jax)
# ---------------------------------------------------------------------------

def _spawn_section(name, timeout, fast=False):
    """Run one section in a watchdogged child. Returns (record|None, err)."""
    cmd = [sys.executable, os.path.abspath(__file__), "--section", name]
    if fast:
        cmd.append("--fast")
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout:.0f}s"
    for line in reversed(p.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
                if rec.get("value") is not None:
                    return rec, None
                return None, rec.get("unit", "null value")
            except json.JSONDecodeError:
                continue
    tail = (p.stderr or "").strip().splitlines()
    return None, (f"rc={p.returncode}; no JSON line"
                  + (f"; stderr: {tail[-1][:160]}" if tail else ""))


def _skip_line(metric, why):
    print(json.dumps({"metric": metric, "value": None,
                      "unit": f"skipped: {why}", "vs_baseline": None}),
          flush=True)


_LAST_GOOD = (os.environ.get("RSGNET_BENCH_LAST_GOOD")
              or os.path.join(_HERE, ".bench_last_good.json"))


def _save_last_good(rec):
    """Persist the freshest DIRECT measurement per metric. Skipped sections
    re-report these with an explicit STALE label: even on a session whose
    budget/tunnel cannot fit all five measurements, every line stays
    informative and honestly dated (a cached train section alone costs
    ~220s of tunnel time — five fresh sections do not fit 520s)."""
    if os.environ.get("RSGNET_BENCH_FAKE"):
        return                       # never poison the file with test lines
    store = _load_store()
    store[rec["metric"]] = {**rec,
                            "saved_at": time.strftime("%Y-%m-%d %H:%M:%S")}
    try:
        with open(_LAST_GOOD, "w") as f:
            json.dump(store, f)
    except OSError:
        pass


def _load_store():
    try:
        with open(_LAST_GOOD) as f:
            data = json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}
    if "metric" in data:             # original single-record schema
        return {data["metric"]: data}
    return data if isinstance(data, dict) else {}


def _load_last_good(metric):
    rec = _load_store().get(metric)
    return rec if rec and rec.get("value") is not None else None


def _stale_line(metric, why):
    """Skipped section with history: re-report the last direct measurement,
    explicitly dated, instead of a null. Returns True if a line printed."""
    prev = _load_last_good(metric)
    if prev is None:
        return False
    print(json.dumps({
        "metric": metric, "value": prev["value"],
        "unit": (f"{prev.get('unit', 'images/sec/chip')} [STALE: measured "
                 f"{prev.get('saved_at', '?')}; this run: {why}]"),
        "vs_baseline": prev.get("vs_baseline"),
    }), flush=True)
    return True


def main():
    t_start = time.monotonic()

    def remaining():
        return GLOBAL_BUDGET - (time.monotonic() - t_start)

    # 1) Bank the headline FIRST — the driver-recorded metric must survive
    #    anything the aux sections do to the budget.
    headline, err = _spawn_section(
        "headline", min(SECTION_TIMEOUT, max(remaining(), 10)))
    headline_err = err

    # 2) Aux sections, cheapest-compile first, inside the global budget.
    #    Each aux section may use ALL remaining budget (minus the print
    #    reserve): a fixed per-section cap below a program's cold-compile
    #    time would kill the child before it writes the compile cache and
    #    the section could NEVER become warm; with the greedy budget the
    #    cache accumulates one section per run until every line completes.
    e2e_rec = None
    for name in _SECTION_ORDER[1:]:
        metric = _SECTION_METRICS[name]
        budget = remaining() - 15        # always reserve the tail for print
        if budget < MIN_SPAWN:
            why = f"global budget spent ({GLOBAL_BUDGET:.0f}s)"
            if not _stale_line(metric, why):
                _skip_line(metric, why)
            continue
        rec, err = _spawn_section(name, budget)
        if rec is not None:
            print(json.dumps(rec), flush=True)
            _save_last_good(rec)
            if name == "e2e":
                e2e_rec = rec
        elif not _stale_line(metric, err):
            _skip_line(metric, err)

    # 3) Headline retry / fallback, then print it LAST.
    if headline is None and remaining() > 30:
        headline, headline_err = _spawn_section(
            "headline", min(SECTION_TIMEOUT, remaining() - 5), fast=True)
    if headline is not None and "fallback" not in headline.get("unit", ""):
        _save_last_good(headline)
    if headline is None and e2e_rec is not None:
        # The e2e protocol is the SAME metric plus on-device preprocessing —
        # strictly more work per image, so its rate is a conservative
        # stand-in for the headline, honestly flagged.
        headline = {
            "metric": _HEADLINE_METRIC,
            "value": e2e_rec["value"],
            "unit": ("images/sec/chip [conservative fallback: headline "
                     f"section failed ({headline_err}); value is the "
                     "strictly-harder e2e protocol's rate]"),
            "vs_baseline": e2e_rec["vs_baseline"],
        }
    if headline is None:
        # total outage (every section dead — e.g. tunnel down): report the
        # last DIRECT measurement this machine recorded, explicitly stale
        prev = _load_last_good(_HEADLINE_METRIC)
        if prev is not None:
            # keep prev's ORIGINAL unit: a persisted fast-retry measurement
            # (B=64) must not lose its reduced-protocol flag here
            headline = {
                "metric": _HEADLINE_METRIC,
                "value": prev["value"],
                "unit": (f"{prev.get('unit', 'images/sec/chip')} [STALE: "
                         f"measured {prev.get('saved_at', '?')}; this run's "
                         f"sections all failed: {headline_err}]"),
                "vs_baseline": prev.get("vs_baseline"),
            }
    if headline is None:
        headline = {"metric": _HEADLINE_METRIC, "value": None,
                    "unit": f"skipped: {headline_err}", "vs_baseline": None}
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    if "--section" in sys.argv:
        i = sys.argv.index("--section")
        _run_child_section(sys.argv[i + 1], fast="--fast" in sys.argv)
    else:
        main()
