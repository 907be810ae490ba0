"""CLI smoke tests: the tools/ entry points run end-to-end in a fresh
interpreter on the CPU backend (SURVEY.md §2.1-2.3)."""
import json
import os
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(args, timeout=900):
    from tests._subproc import strip_axon_site
    env = strip_axon_site()               # ~2s/interpreter site hook, unused on cpu
    env["RSGNET_FORCE_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    # fresh interpreters share the suite's persistent compile cache
    # (conftest.py — VERDICT round-2 item 9): repeat runs skip XLA:CPU
    # compiles entirely
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO,
                                                    ".jax_compile_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


def write_tiny_yaml(path, root, extra=None):
    """Experiment yaml with the tiny topology pointing at the fixture."""
    d = {
        "DATASET": {"DATASET": "coco", "ROOT": root, "TEST_SET": "val",
                    "TRAIN_SET": "val"},
        "MODEL": {
            "NAME": "pose_rsgnet", "NUM_JOINTS": 17,
            "IMAGE_SIZE": [64, 96], "HEATMAP_SIZE": [16, 24], "SIGMA": 2,
            "RSG": {"ENABLED": True, "NODE_CHANNELS": 8,
                    "RELATION_CHANNELS": 8},
            "EXTRA": {
                "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2,
                           "BLOCK": "BASIC", "NUM_BLOCKS": [1, 1],
                           "NUM_CHANNELS": [8, 16]},
                "STAGE3": {"NUM_MODULES": 1, "NUM_BRANCHES": 3,
                           "BLOCK": "BASIC", "NUM_BLOCKS": [1, 1, 1],
                           "NUM_CHANNELS": [8, 16, 32]},
                "STAGE4": {"NUM_MODULES": 1, "NUM_BRANCHES": 4,
                           "BLOCK": "BASIC", "NUM_BLOCKS": [1, 1, 1, 1],
                           "NUM_CHANNELS": [8, 16, 32, 64]},
            },
        },
        "DTYPE": "float32",
        "TRAIN": {"BATCH_SIZE_PER_GPU": 2, "END_EPOCH": 1},
        "TEST": {"BATCH_SIZE_PER_GPU": 4, "FLIP_TEST": True,
                 "USE_GT_BBOX": True},
    }
    if extra:
        d.update(extra)
    with open(path, "w") as f:
        yaml.safe_dump(d, f)
    return str(path)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    from tests.fixtures.synthetic_coco import make_dataset, write_fixture
    root = tmp_path_factory.mktemp("cli_fixture")
    write_fixture(str(root), make_dataset())
    return str(root)


def test_infer_demo(tmp_path):
    overlay = tmp_path / "overlay.png"
    r = run_tool(["tools/infer.py", "--demo", "--tiny",
                  "--out", str(overlay), "--thresh", "-1"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout[r.stdout.index("["):])
    assert len(out) == 2                      # demo runs two person boxes
    for inst in out:
        assert len(inst["keypoints"]) == 17
        assert all("x" in j and "score" in j for j in inst["keypoints"])
    # skeleton overlay rendered at source resolution
    from PIL import Image
    img = Image.open(overlay)
    assert img.size == (640, 480)


def test_test_cli(fixture_root, tmp_path):
    cfg = write_tiny_yaml(tmp_path / "tiny.yaml", fixture_root)
    r = run_tool(["tools/test.py", "--cfg", cfg, "--workers", "2",
                  "OUTPUT_DIR", str(tmp_path / "out"),
                  "LOG_DIR", str(tmp_path / "log")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "AP" in r.stdout + r.stderr


def test_test_cli_mpii(tmp_path):
    """tools/test.py on the MPII family: single-person eval path (no NMS,
    PCKh table) through the real CLI."""
    from tests.fixtures.synthetic_mpii import make_entries, write_fixture
    root = tmp_path / "mpii"
    write_fixture(str(root), make_entries())
    cfg = write_tiny_yaml(tmp_path / "tiny_mpii.yaml", str(root), extra={
        "DATASET": {"DATASET": "mpii", "ROOT": str(root),
                    "TEST_SET": "valid", "TRAIN_SET": "train",
                    "SCALE_FACTOR": 0.25, "ROT_FACTOR": 30,
                    "PROB_HALF_BODY": -1.0},
    })
    # write_tiny_yaml's MODEL block is COCO-shaped; override joints
    with open(tmp_path / "tiny_mpii.yaml") as f:
        d = yaml.safe_load(f)
    d["MODEL"]["NUM_JOINTS"] = 16
    with open(tmp_path / "tiny_mpii.yaml", "w") as f:
        yaml.safe_dump(d, f)
    r = run_tool(["tools/test.py", "--cfg", str(tmp_path / "tiny_mpii.yaml"),
                  "--workers", "2",
                  "OUTPUT_DIR", str(tmp_path / "out"),
                  "LOG_DIR", str(tmp_path / "log")])
    assert r.returncode == 0, r.stderr[-2000:]
    combined = r.stdout + r.stderr
    assert "Mean" in combined


def test_train_cli_smoke(fixture_root, tmp_path):
    cfg = write_tiny_yaml(tmp_path / "tiny.yaml", fixture_root)
    r = run_tool(["tools/train.py", "--cfg", cfg, "--workers", "2",
                  "--max-epochs", "1",
                  "OUTPUT_DIR", str(tmp_path / "out"),
                  "LOG_DIR", str(tmp_path / "log"),
                  "PRINT_FREQ", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    combined = r.stdout + r.stderr
    assert "done; best perf" in combined
    # checkpoint written into the run dir
    run_dirs = list((tmp_path / "out").rglob("checkpoint.msgpack"))
    assert run_dirs, combined[-2000:]


def test_serve_cli(fixture_root, tmp_path):
    """tools/serve.py end-to-end in a fresh interpreter: warm buckets, bind,
    answer /healthz and a real npz predict over the socket, exit cleanly on
    SIGINT."""
    import re
    import signal
    import time
    import urllib.request

    import numpy as np

    cfg = write_tiny_yaml(tmp_path / "tiny.yaml", fixture_root)
    from tests._subproc import strip_axon_site
    env = strip_axon_site()
    env.update(RSGNET_FORCE_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=os.path.join(
                   REPO, ".jax_compile_cache"),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5",
               JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")
    proc = subprocess.Popen(
        [sys.executable, "tools/serve.py", "--cfg", cfg, "--port", "0",
         "--buckets", "1,2", "--max-wait-ms", "2"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    url = None
    try:
        deadline = time.time() + 600
        lines = []
        while time.time() < deadline:          # warmup compiles first
            line = proc.stderr.readline()
            if not line and proc.poll() is not None:
                break
            lines.append(line)
            m = re.search(r"serving on (http://[\d.]+:\d+)", line)
            if m:
                url = m.group(1)
                break
        assert url, "server never came up:\n" + "".join(lines)[-2000:]
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            assert r.read() == b"ok"
        from rsgnet_tpu.serving.http_server import predict_remote
        rng = np.random.default_rng(0)
        preds, maxvals = predict_remote(
            url, rng.integers(0, 256, (2, 96, 64, 3), dtype=np.uint8),
            np.full((2, 2), 32.0, np.float32),
            np.ones((2, 2), np.float32), timeout=120)
        assert preds.shape == (2, 17, 2) and maxvals.shape == (2, 17, 1)
        assert np.isfinite(preds).all()
        proc.send_signal(signal.SIGINT)
        out, err = proc.communicate(timeout=60)
        assert proc.returncode == 0, err[-2000:]
        assert "final stats" in err
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate(timeout=30)
