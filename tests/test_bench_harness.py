"""Bench-harness scheduling tests.

bench.py's parent is the one artifact the driver records every round, so its
scheduling logic (best-of over the pass queue, per-pass env overrides for
the S/T sweep, re-queue on a crashed pass, poisoned-compile-cache
quarantine, early stop at the target) is pinned here against fake children
(``RTMODT_BENCH_FAKE`` plan files — see bench._run_fake_child) that never
touch a device.  The real measurement path is exercised by running
``python bench.py`` on hardware; these tests cover everything around it.
"""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")

# the parent's static pass plan (bench.main): single, short multi
# (NCHUNKS=24), multi-S8T16, single, multi, single
QUEUE_LEN = 6


def run_parent(plan_lines, tmp_path, budget="900", extra_env=None):
    plan = tmp_path / "plan.txt"
    plan.write_text("\n".join(plan_lines))
    env = {**os.environ,
           "RTMODT_BENCH_FAKE": str(plan),
           "RTMODT_BENCH_BUDGET": budget,   # high: fake passes are instant
           "RTMODT_BENCH_SLEEP": "0",
           **(extra_env or {})}
    env.pop("RTMODT_BENCH_CHILD", None)
    env.pop("RTMODT_JAX_CACHE", None)
    proc = subprocess.run([sys.executable, BENCH], env=env, text=True,
                          capture_output=True, timeout=120)
    result = None
    for ln in proc.stdout.splitlines():
        if ln.startswith("{"):
            result = json.loads(ln)
    return proc, result, plan


class TestBestOf:
    def test_best_pass_wins_headline(self, tmp_path):
        proc, result, _ = run_parent(
            ["ok:100", "ok:200", "ok:150", "ok:50", "ok:10", "ok:5"], tmp_path)
        assert proc.returncode == 0
        assert result["value"] == 200.0
        assert result["vs_baseline"] == round(200.0 / 87.0, 2)
        assert result["unit"] == "fps"
        assert "pass 1 [multi NCHUNKS=24]: 200.0 fps" in proc.stderr

    def test_early_stop_at_target(self, tmp_path):
        proc, result, plan = run_parent(
            ["ok:600", "ok:1", "ok:1", "ok:1", "ok:1", "ok:1"], tmp_path)
        assert result["value"] == 600.0
        # >= TARGET_FPS after pass 0: the remaining 5 plan slots are untouched
        assert plan.read_text().splitlines() == ["ok:1"] * 5


class TestSweepEnvPlumbing:
    def test_third_pass_carries_s8_t16(self, tmp_path):
        # pass 2 of the static plan is the multi S=8 T=16 sweep entry; the
        # fake child emits float(RTMODT_BENCH_STREAMS) so a wrong/missing
        # override shows up as a KeyError (pass fails) or the wrong value
        proc, result, _ = run_parent(
            ["ok:1", "ok:2", "env:RTMODT_BENCH_STREAMS",
             "ok:1", "ok:1", "ok:1"], tmp_path)
        assert result["value"] == 8.0
        assert "STREAMS=8" in proc.stderr and "T=16" in proc.stderr

    def test_sweep_env_does_not_leak_into_other_passes(self, tmp_path):
        # every non-sweep pass must NOT see the override (pass 4 is the
        # second plain multi entry; env: on an unset var kills that child,
        # which would drop the 999 result)
        proc, result, _ = run_parent(
            ["ok:1", "ok:1", "ok:8", "ok:1", "env:RTMODT_BENCH_STREAMS",
             "ok:1"], tmp_path)
        assert result["value"] == 8.0  # the env: child crashed -> no 999


class TestFailureRequeue:
    def test_crashed_pass_requeued_once(self, tmp_path):
        proc, result, _ = run_parent(
            ["fail", "ok:100", "ok:1", "ok:1", "ok:1", "ok:1", "ok:999"],
            tmp_path)
        # the crashed ("single", attempt 0) re-runs after the plan (7th
        # child) instead of burning the slot
        assert result["value"] == 999.0
        assert "pass 0 [single] failed" in proc.stderr

    def test_all_failures_exit_nonzero_no_json(self, tmp_path):
        proc, result, _ = run_parent(["fail"] * (2 * QUEUE_LEN), tmp_path)
        assert proc.returncode == 1
        assert result is None


class TestWedgedPass:
    """VERDICT r3 #1: a wedged child (no output, blocked in a device call)
    must be capped WELL below the remaining budget, attributed by its last
    phase breadcrumb, and must not starve the rest of the plan."""

    def test_wedge_is_capped_attributed_and_plan_continues(self, tmp_path):
        import time

        t0 = time.monotonic()
        proc, result, _ = run_parent(
            ["ok:100", "hang", "ok:150", "ok:120", "ok:90", "ok:80",
             "ok:110"],
            tmp_path, budget="600",
            extra_env={"RTMODT_BENCH_EST": "single:1,multi:2",
                       "RTMODT_BENCH_GRACE": "1"})
        elapsed = time.monotonic() - t0
        # the hang was capped at ~est*1.5 + grace, nowhere near the budget
        assert elapsed < 60, f"wedged pass not capped ({elapsed:.0f}s)"
        # attributed: the parent names the wedge location from the child's
        # eager phase breadcrumb
        assert "wedged in compile" in proc.stderr
        # the plan continued: later passes ran and the best of them won
        assert result["value"] == 150.0
        # the wedged config was re-queued once (7th child consumed the
        # trailing ok:110 plan line)
        assert "pass 6" in proc.stderr

    def test_completed_pass_does_not_reprint_phase_lines(self, tmp_path):
        # phase breadcrumbs are wedge forensics; a completed pass must not
        # spam the driver-recorded tail with them
        proc, result, _ = run_parent(
            ["ok:100", "ok:1", "ok:1", "ok:1", "ok:1", "ok:1"], tmp_path)
        assert "phase" not in proc.stderr


class TestDrainEscalation:
    """VERDICT r4 #1a/b: a child whose preflight watchdog fires (exit code
    4, relay not drained) must trigger an ESCALATED drain sleep and a
    same-config retry, not burn the plan slot as a generic failure."""

    def test_drain_exit_escalates_and_retries_same_config(self, tmp_path):
        # pass 1 (multi NCHUNKS=24) exits 4; the parent must announce the
        # escalated sleep (4x base) and retry the SAME config next - the
        # env: behavior proves the NCHUNKS=24 override was carried over
        proc, result, _ = run_parent(
            ["ok:100", "drain", "env:RTMODT_BENCH_NCHUNKS",
             "ok:1", "ok:1", "ok:1", "ok:1"],
            tmp_path, extra_env={"RTMODT_BENCH_SLEEP": "0.5"})
        assert result["value"] == 100.0
        assert "relay not drained; sleeping 2s" in proc.stderr
        assert "pass 2 [multi NCHUNKS=24]: 24.0 fps" in proc.stderr

    def test_second_drain_escalates_further_and_falls_back(self, tmp_path):
        # after a second consecutive drain the retry switches to
        # single+multi (bank a single first, multi in the same process)
        proc, result, _ = run_parent(
            ["ok:100", "drain", "drain", "ok:150",
             "ok:1", "ok:1", "ok:1", "ok:1"],
            tmp_path, extra_env={"RTMODT_BENCH_SLEEP": "0.5"})
        assert result["value"] == 150.0
        assert "sleeping 2s" in proc.stderr
        assert "sleeping 4s and retrying as single+multi" in proc.stderr
        assert "pass 3 [single+multi NCHUNKS=24]: 150.0 fps" in proc.stderr


class TestSingleMultiFallback:
    """VERDICT r4 #1c: the in-process multi fallback - a single+multi child
    emits two JSON lines; a crashed plain-multi pass re-queues as
    single+multi so the retry banks a single result before attempting
    multi again."""

    def test_single_multi_two_results_best_counts(self, tmp_path):
        # slot 3 of the static plan is single+multi; ok2 emits two JSON
        # lines (single then in-proc multi) and the best of both counts
        proc, result, _ = run_parent(
            ["ok:1", "ok:2", "ok:3", "ok2:50:400", "ok:5", "ok:6"],
            tmp_path)
        assert result["value"] == 400.0
        assert "pass 3 [single+multi]: 50.0 fps + 400.0 fps" in proc.stderr

    def test_failed_multi_requeues_as_single_multi(self, tmp_path):
        # pass 4 (plain multi) crashes; its retry (7th child) must run in
        # single+multi mode - the "mode" behavior reports the child's
        # RTMODT_BENCH_CHILD on stderr
        proc, result, _ = run_parent(
            ["ok:100", "ok:1", "ok:1", "ok:1", "fail", "ok:1", "mode"],
            tmp_path)
        assert result["value"] == 100.0
        assert "fake mode single+multi" in proc.stderr


class TestPoisonQuarantine:
    def test_quarantine_retries_same_config_with_fresh_cache(self, tmp_path):
        # pass 0 prints the CPU-feature poisoning signature; the parent must
        # repoint RTMODT_JAX_CACHE and retry the SAME config immediately -
        # the "cache:" behavior only emits when that env var arrived
        proc, result, _ = run_parent(
            ["poison", "cache:123", "ok:1", "ok:1", "ok:1", "ok:1", "ok:1"],
            tmp_path)
        assert result["value"] == 123.0
        assert "poisoned compile cache detected" in proc.stderr
