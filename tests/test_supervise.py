"""Restart-on-stall supervision (utils/supervise.py, §5.3 failure recovery).

The transfer relay on this host can wedge a device fetch forever; the
supervisor detects "no artifact/output progress" and relaunches the
(resumable) child.  These tests drive it with stub children that really
stall / crash / complete, as separate OS processes.
"""

import os
import sys

import pytest

from cp360_tpu.utils.supervise import supervise

# first run: drop a partial artifact, then wedge silently.  second run
# (marker present — what resumability looks like to the supervisor):
# finish and exit 0.
STALL_THEN_FINISH = """
import os, sys, time
print("child started", flush=True)  # progress: interpreter startup on this
# host takes seconds (sitecustomize), more under load — the stall window
# must measure from here, not from launch
out, marker = sys.argv[1], sys.argv[2]
if not os.path.exists(marker):
    open(marker, "w").write("x")
    open(os.path.join(out, "000002.npy"), "w").write("partial")
    time.sleep(600)
open(os.path.join(out, "000003.npy"), "w").write("done")
print("finished")
"""

CRASH_THEN_FINISH = """
import os, sys
out, marker = sys.argv[1], sys.argv[2]
if not os.path.exists(marker):
    open(marker, "w").write("x")
    sys.exit(3)
open(os.path.join(out, "done.npy"), "w").write("done")
"""


def _run(tmp_path, script, **kw):
    out = tmp_path / "arts"
    out.mkdir(exist_ok=True)
    marker = tmp_path / "marker"
    logs = []
    rc = supervise(
        [sys.executable, "-c", script, str(out), str(marker)],
        watch_paths=[str(out)],
        log=logs.append,
        **kw,
    )
    return rc, out, logs


def test_stalled_child_is_restarted_and_completes(tmp_path):
    rc, out, logs = _run(
        tmp_path, STALL_THEN_FINISH,
        stall_timeout_s=6.0, poll_s=0.3, grace_s=2.0, max_restarts=2,
    )
    assert rc == 0
    assert (out / "000003.npy").exists()
    assert any("no progress" in m for m in logs)
    assert any("completed after 1 restart" in m for m in logs)


def test_crashed_child_is_restarted_with_backoff(tmp_path):
    rc, out, logs = _run(
        tmp_path, CRASH_THEN_FINISH,
        stall_timeout_s=30.0, poll_s=0.2, max_restarts=2,
        fast_fail_backoff_s=0.2,
    )
    assert rc == 0
    assert (out / "done.npy").exists()
    assert any("fast failure" in m for m in logs)


def test_gives_up_after_max_restarts(tmp_path):
    rc, _out, logs = _run(
        tmp_path, "import sys; sys.exit(7)",
        stall_timeout_s=30.0, poll_s=0.2, max_restarts=1,
        fast_fail_backoff_s=0.1,
    )
    assert rc == 7
    assert any("giving up" in m for m in logs)


def test_strip_supervise_flag():
    from cp360_tpu.utils.supervise import strip_supervise_flag

    assert strip_supervise_flag(
        ["--out", "s", "--supervise", "-of"]) == ["--out", "s", "-of"]
    assert strip_supervise_flag(
        ["--supervise", "300", "-of"]) == ["-of"]
    assert strip_supervise_flag(
        ["--supervise=300", "-of", "--out", "s"]) == ["-of", "--out", "s"]


def test_train_cli_supervise_implies_resume(tmp_path, monkeypatch):
    """The train CLI's supervised child must be relaunched with --resume so
    a restart continues from the SIGTERM checkpoint instead of redoing."""
    import cp360_tpu.utils.supervise as sup_mod

    captured = {}

    def fake_supervise(cmd, watch_paths, stall_timeout_s, **kw):
        captured.update(cmd=cmd, watch=watch_paths, grace=kw.get("grace_s"))
        return 0

    monkeypatch.setattr(sup_mod, "supervise", fake_supervise)
    from cp360_tpu.cli.train_temporal import main

    argv = ["--input", str(tmp_path / "static"), "--supervise",
            "--metrics-jsonl", str(tmp_path / "m.jsonl"),
            "--set", f"output_path={tmp_path}"]
    with pytest.raises(SystemExit) as ei:
        main(argv)
    assert ei.value.code == 0
    assert "--resume" in captured["cmd"]
    assert "--supervise" not in captured["cmd"]
    assert captured["grace"] == 60.0
    assert str(tmp_path / "m.jsonl") in captured["watch"]


def test_cli_supervise_wiring(tmp_path, monkeypatch):
    """--supervise re-execs the CLI under the supervisor, watching the
    resolved artifact dir, with the flag stripped from the child argv."""
    import cp360_tpu.utils.supervise as sup_mod

    captured = {}

    def fake_supervise(cmd, watch_paths, stall_timeout_s, **kw):
        captured.update(cmd=cmd, watch=watch_paths, stall=stall_timeout_s)
        return 0

    monkeypatch.setattr(sup_mod, "supervise", fake_supervise)
    from cp360_tpu.cli.extract_features import main

    argv = ["--out", "static", "--mode", "resnet50", "-of",
            "--supervise", "77", "--set", f"output_path={tmp_path}"]
    with pytest.raises(SystemExit) as ei:
        main(argv)
    assert ei.value.code == 0
    assert captured["stall"] == 77.0
    assert "--supervise" not in captured["cmd"] and "77" not in captured["cmd"]
    assert captured["cmd"][:3] == [sys.executable, "-m",
                                   "cp360_tpu.cli.extract_features"]
    assert captured["watch"] == [os.path.join(str(tmp_path), "static_resnet50")]
