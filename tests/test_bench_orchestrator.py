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


def _run(fault="", timeout_s="4", budget="60", last_good="/dev/null"):
    from tests._subproc import strip_axon_site
    # fake children never import jax; the stripped site hook saves ~2s of
    # startup per spawned interpreter (~6 per _run)
    env = dict(strip_axon_site(),
               RSGNET_BENCH_FAKE="1",
               RSGNET_BENCH_FAULT=fault,
               RSGNET_BENCH_SECTION_TIMEOUT=timeout_s,
               RSGNET_BENCH_BUDGET=budget,
               RSGNET_BENCH_MIN_SPAWN="4",   # hung children cost seconds,
               RSGNET_BENCH_LAST_GOOD=last_good)   # not the full budget
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
    # modest budget: aux sections get the REMAINING budget (not a fixed
    # cap), so the hung train section is bounded by it — large enough that
    # train is spawned (>=20s left), small enough the hang stays cheap
    lines = _run(fault="train", budget="32")
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


def test_total_outage_reports_stale_last_good(tmp_path):
    """Every section dead (tunnel fully down): the headline re-reports the
    last DIRECT measurement with an explicit STALE label — parsed stays
    non-null and nobody mistakes it for a fresh number."""
    lg = tmp_path / "last_good.json"
    lg.write_text(json.dumps({
        "metric": HEADLINE, "value": 2114.77,
        "unit": "images/sec/chip (256x192, flip-test on, decode included)",
        "vs_baseline": 2.643, "saved_at": "2026-08-20 13:00:00"}))
    # tiny budget: the faulted headline burns its 4s cap, every aux section
    # is budget-skipped instantly, no retry fits — straight to the stale path
    lines = _run(fault="headline,e2e,full,res50,train", budget="14",
                 last_good=str(lg))
    head = lines[-1]
    assert head["metric"] == HEADLINE
    assert head["value"] == 2114.77 and head["vs_baseline"] == 2.643
    assert "STALE" in head["unit"] and "2026-08-20" in head["unit"]


def test_skipped_aux_section_reports_stale_history(tmp_path):
    """A section that cannot run this session (budget/hang) re-reports its
    last direct measurement with a dated STALE label instead of a null."""
    lg = tmp_path / "last_good.json"
    lg.write_text(json.dumps({
        "train_step_images_per_sec_per_chip": {
            "metric": "train_step_images_per_sec_per_chip",
            "value": 995.48, "unit": "images/sec/chip (B=128 ...)",
            "vs_baseline": 2.489, "saved_at": "2026-08-20 14:30:00"}}))
    lines = _run(fault="train", budget="32", last_good=str(lg))
    by_metric = {r["metric"]: r for r in lines}
    tr = by_metric["train_step_images_per_sec_per_chip"]
    assert tr["value"] == 995.48 and tr["vs_baseline"] == 2.489
    assert "STALE" in tr["unit"] and "2026-08-20 14:30" in tr["unit"]
    assert lines[-1]["metric"] == HEADLINE  # headline still last + fresh
    assert lines[-1]["value"] is not None


def test_spent_budget_skips_loudly_but_headline_still_prints():
    # Budget so small that every aux section is skipped for budget; the
    # headline (banked first) must still print with a value.
    lines = _run(budget="5")
    head = lines[-1]
    assert head["metric"] == HEADLINE and head["value"] is not None
    for r in lines[:-1]:
        assert r["value"] is None and "budget" in r["unit"]
