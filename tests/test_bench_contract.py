"""The driver contract: bench.py prints ONE JSON result line, always.

These tests pin the parent's stdout-parsing logic (pick_result_line) that
decides which worker line becomes the line of record — including the
failure shapes observed on this host's transfer tunnel (wedged attempts
killed mid-print, torn lines, provisional-only output).
"""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_pick_newest_complete_line():
    out = "\n".join([
        json.dumps({"metric": "m", "value": 1.0}),
        "bench: some log line",
        json.dumps({"metric": "m", "value": 2.5, "n_iters": 4}),
    ])
    assert bench.pick_result_line(out)["value"] == 2.5


def test_pick_tolerates_torn_final_line():
    # the watchdog's report can interleave with a provisional print: the
    # newest {-line is garbage, the one before it is the real median
    out = "\n".join([
        json.dumps({"metric": "m", "value": 3.0, "n_iters": 2}),
        '{"metric": "m", "val',  # torn
    ])
    assert bench.pick_result_line(out)["value"] == 3.0


def test_pick_provisional_without_value():
    # a worker that initialized but never completed an iteration emits a
    # value-less provisional; the parent must treat it as "no result yet"
    # (retry) while keeping it as the fallback for the final print
    out = json.dumps({"metric": "m", "value": None, "unit": "frames/s"})
    parsed = bench.pick_result_line(out)
    assert parsed is not None and not parsed.get("value")


def test_pick_empty_and_logs_only():
    assert bench.pick_result_line("") is None
    assert bench.pick_result_line("no json here\nbench: retrying\n") is None


def _run_parent(tmp_path, values, attempts, retry_below="24"):
    env = dict(
        os.environ,
        BENCH_ATTEMPTS=str(attempts),
        BENCH_ATTEMPT_SCHEDULE="60",
        BENCH_RETRY_BACKOFF_S="0",
        BENCH_RETRY_IF_BELOW=retry_below,
        BENCH_SELFTEST_VALUES=values,
        BENCH_SELFTEST_STATE=str(tmp_path / "attempt_counter"),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )
    json_lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1, proc.stdout + proc.stderr
    assert proc.returncode == 0
    return json.loads(json_lines[0])


def test_parent_retries_degraded_phase_and_reports_best(tmp_path):
    """A completed-but-degraded median (below BENCH_RETRY_IF_BELOW) must not
    end the run while attempts remain; the best attempt is the record."""
    parsed = _run_parent(tmp_path, "18.0,31.0", attempts=3)
    assert parsed["value"] == 31.0
    assert parsed["attempt"] == 1  # the healthy retry, not the first attempt


def test_parent_keeps_degraded_value_when_attempts_exhaust(tmp_path):
    parsed = _run_parent(tmp_path, "18.0,17.0", attempts=2)
    assert parsed["value"] == 18.0  # best of the two degraded attempts
    assert parsed["attempt"] == 0
    assert parsed["discarded"] == [17.0]  # honesty: rejected medians on record


def test_parent_records_discarded_degraded_medians(tmp_path):
    parsed = _run_parent(tmp_path, "18.0,31.0", attempts=3)
    assert parsed["value"] == 31.0
    assert parsed["discarded"] == [18.0]


def test_selftest_requires_both_env_vars(tmp_path):
    """A stray BENCH_SELFTEST_VALUES alone must NOT substitute fake output
    for a real measurement (and must not KeyError): without _STATE the
    worker falls through to the real path, which fails fast off-TPU or
    under the selftest guard."""
    env = dict(
        os.environ,
        BENCH_ATTEMPTS="1",
        BENCH_ATTEMPT_SCHEDULE="30",
        BENCH_RETRY_BACKOFF_S="0",
        BENCH_SELFTEST_VALUES="99.0",
        BENCH_SELFTEST_FAIL="1",  # keep the fallthrough off any backend
    )
    env.pop("BENCH_SELFTEST_STATE", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )
    json_lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1, proc.stdout + proc.stderr
    assert json.loads(json_lines[0])["value"] is None  # not the fake 99.0


def test_report_spread_uses_gated_intervals_only(capsys):
    """BENCH_r03's 155.9 'fps' spread max came from an ungated pipelined
    interval; the spread must derive from fetch-gated iterations."""
    times = [0.5, 0.5, 0.1, 0.6]  # 0.1 s = fetch already landed (ungated)
    bench._report(16, times, gated=[True, True, False, True])
    parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parsed["spread"] == [round(16 / 0.6, 3), round(16 / 0.5, 3)]
    assert parsed["spread_gated_n"] == 3
    assert parsed["n_iters"] == 4  # median still over all iterations


def test_report_carries_device_fps(capsys):
    bench._report(16, [0.5, 0.5], gated=[True, True], device_fps=1000.0)
    parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parsed["device_fps"] == 1000.0
    assert parsed["value"] == 32.0


def test_parent_accepts_healthy_first_attempt_immediately(tmp_path):
    parsed = _run_parent(tmp_path, "29.5", attempts=3)
    assert parsed["value"] == 29.5
    state = tmp_path / "attempt_counter"
    assert state.read_text().strip() == "1"  # no second worker spawned


def test_parent_emits_exactly_one_json_line_on_total_failure():
    """All attempts fail fast -> the parent still prints one well-formed
    JSON line (value null) and exits 0 — what the driver records."""
    env = dict(
        os.environ,
        BENCH_ATTEMPTS="1",
        BENCH_ATTEMPT_SCHEDULE="30",
        BENCH_RETRY_BACKOFF_S="0",
        # make the worker die instantly without touching any backend
        PYTHONSTARTUP="",
        BENCH_SELFTEST_FAIL="1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )
    json_lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1, proc.stdout + proc.stderr
    parsed = json.loads(json_lines[0])
    assert parsed["metric"] == "stage1_frames_per_sec"
    assert parsed["value"] is None
    assert proc.returncode == 0


def test_artifacts_of_record_carry_iqr_spreads():
    """Artifact-hygiene rule (VERDICT r4 #6): an in-tree bench artifact
    whose spread endpoint exceeds 3x its median is quoting pipeline
    artifacts, not rates — it must carry the interquartile band so nobody
    quotes the nonsense endpoint as a frame rate."""
    import glob

    pats = ("BENCH*.json", "FLOW_THROUGHPUT*.json", "SERVE_SWEEP*.json",
            "DEPTH_SWEEP*.json")
    checked = []

    def walk(d, path):
        # driver-captured artifacts wrap the bench line in a "tail" string;
        # sweeps nest it under results.*.json — walk everything
        if isinstance(d, str):
            for ln in d.splitlines():
                ln = ln.strip()
                if ln.startswith("{"):
                    try:
                        walk(json.loads(ln), path)
                    except json.JSONDecodeError:
                        pass
            return
        if isinstance(d, list):
            for x in d:
                walk(x, path)
            return
        if not isinstance(d, dict):
            return
        v, sp = d.get("value"), d.get("spread")
        if v and sp:
            checked.append(path)
            if max(sp) > 3 * v:
                # pre-IQR history (r1-r3) may carry an explicit spread_note
                # naming the endpoint as a pipeline artifact instead — raw
                # times were not preserved, the IQR cannot be reconstructed
                assert "spread_iqr" in d or "spread_note" in d, (
                    f"{path}: spread {sp} around median {v} "
                    f"without spread_iqr")
        for x in d.values():
            walk(x, path)

    for pat in pats:
        for path in glob.glob(os.path.join(REPO, pat)):
            with open(path) as f:
                try:
                    doc = json.load(f)
                except json.JSONDecodeError:
                    f.seek(0)
                    doc = [json.loads(ln) for ln in f if ln.strip()]
            walk(doc, os.path.basename(path))
    assert len(checked) >= 3  # the artifacts of record must be scanned
