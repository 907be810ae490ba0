"""Outage-resilience tests for the bench.py orchestrator (VERDICT round-3
item 1): a hung section must become a "skipped: timeout" line, and the
headline line must ALWAYS appear last on stdout with a non-null value
whenever anything at all measured.

Uses RSGNET_BENCH_FAKE (children print deterministic lines without importing
jax) plus RSGNET_BENCH_FAULT (a named section sleeps forever, standing in
for a hung remote compile) so the orchestration logic is tested in seconds
on any backend.
"""
import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")

HEADLINE = "coco_val_topdown_inference_images_per_sec_per_chip"


def _run(fault="", timeout_s="4", budget="60"):
    env = dict(os.environ,
               RSGNET_BENCH_FAKE="1",
               RSGNET_BENCH_FAULT=fault,
               RSGNET_BENCH_SECTION_TIMEOUT=timeout_s,
               RSGNET_BENCH_BUDGET=budget)
    p = subprocess.run([sys.executable, BENCH], capture_output=True,
                       text=True, env=env, timeout=120)
    assert p.returncode == 0, p.stderr
    lines = [json.loads(ln) for ln in p.stdout.splitlines()
             if ln.strip().startswith("{")]
    return lines


def test_healthy_run_emits_all_lines_headline_last():
    lines = _run()
    assert len(lines) == 5
    metrics = [r["metric"] for r in lines]
    assert metrics[-1] == HEADLINE          # driver parses the LAST line
    assert all(r["value"] is not None for r in lines)
    assert len(set(metrics)) == 5


def test_hung_aux_section_becomes_skip_line_headline_survives():
    lines = _run(fault="train")
    by_metric = {r["metric"]: r for r in lines}
    tr = by_metric["train_step_images_per_sec_per_chip"]
    assert tr["value"] is None and "timeout" in tr["unit"]
    head = lines[-1]
    assert head["metric"] == HEADLINE
    assert head["value"] is not None        # parsed non-null despite the hang


def test_hung_headline_falls_back_to_e2e_value():
    lines = _run(fault="headline")
    head = lines[-1]
    assert head["metric"] == HEADLINE
    # conservative stand-in: the strictly-harder e2e protocol's number
    by_metric = {r["metric"]: r for r in lines[:-1]}
    e2e = by_metric["coco_val_e2e_eval_images_per_sec_per_chip"]
    assert head["value"] == e2e["value"]
    assert "fallback" in head["unit"]
    assert head["vs_baseline"] == e2e["vs_baseline"]


def test_spent_budget_skips_loudly_but_headline_still_prints():
    # Budget so small that every aux section is skipped for budget; the
    # headline (banked first) must still print with a value.
    lines = _run(budget="5")
    head = lines[-1]
    assert head["metric"] == HEADLINE and head["value"] is not None
    for r in lines[:-1]:
        assert r["value"] is None and "budget" in r["unit"]
