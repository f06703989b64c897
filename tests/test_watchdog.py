"""In-run failure detection / elastic restart (utils/watchdog.py).

The supervised child is a toy python script, not a real training run —
the contract under test is the supervisor's: heartbeat-stall detection,
kill-by-pid, device-probe gating, resume relaunch, restart budget.  The
bit-identical continuation the relaunch relies on is proven separately
(tests/test_pipeline.py::test_halt_and_resume_bit_identical)."""

import os
import sys
import time

from adlm_tpu.utils.watchdog import (newest_mtime, run_with_watchdog,
                                     wait_for_device)


def _child_script(tmp_path):
    """argv: <state_dir> <mode-for-attempt-0>.  Attempt index is read
    from (and bumped in) <state_dir>/attempt; attempts >= 1 heartbeat
    once and exit 0 (the "resumed run completes" leg)."""
    path = tmp_path / "child.py"
    path.write_text("""
import os, sys, time
state, mode = sys.argv[1], sys.argv[2]
hb = os.path.join(state, "hb.log")
af = os.path.join(state, "attempt")
attempt = int(open(af).read()) if os.path.exists(af) else 0
open(af, "w").write(str(attempt + 1))
open(hb, "a").write(f"attempt {attempt}\\n")
if attempt == 0:
    if mode == "hang":
        time.sleep(600)   # wedge: alive but no further heartbeats
    sys.exit(3)           # crash
sys.exit(0)
""")
    return str(path)


def _mk(tmp_path, mode):
    script = _child_script(tmp_path)
    state = str(tmp_path)

    def make_cmd(attempt):
        return [sys.executable, script, state, mode]

    return make_cmd, [os.path.join(state, "hb.log")]


def test_stall_is_killed_and_resumed(tmp_path):
    make_cmd, hb = _mk(tmp_path, "hang")
    probes = []
    # timeout must cover the child's python startup (slow under a
    # loaded single-core host) — the hb write IS the first heartbeat
    rc = run_with_watchdog(make_cmd, hb, timeout_s=8.0, poll_s=0.3,
                           max_restarts=2, grace_s=5.0,
                           probe=lambda: probes.append(1) or True,
                           log=lambda *a: None)
    assert rc == 0
    assert int(open(tmp_path / "attempt").read()) == 2  # exactly 1 kill
    assert probes  # the device was probed before the relaunch


def test_crash_is_restarted(tmp_path):
    make_cmd, hb = _mk(tmp_path, "crash")
    rc = run_with_watchdog(make_cmd, hb, timeout_s=30, poll_s=0.2,
                           max_restarts=2, probe=lambda: True,
                           log=lambda *a: None)
    assert rc == 0
    assert int(open(tmp_path / "attempt").read()) == 2


def test_restart_budget_exhausted(tmp_path):
    script = tmp_path / "always_fail.py"
    script.write_text("import sys; sys.exit(5)")
    calls = []

    def make_cmd(attempt):
        calls.append(attempt)
        return [sys.executable, str(script)]

    rc = run_with_watchdog(make_cmd, [], timeout_s=30, poll_s=0.1,
                           max_restarts=1, probe=lambda: True,
                           log=lambda *a: None)
    assert rc == 5
    assert calls == [0, 1]  # initial + the single budgeted restart


def test_wait_for_device_gives_up_and_recovers():
    flips = iter([False, False, True])
    assert wait_for_device(lambda: next(flips), poll_s=0.01,
                           max_wait_s=10, log=lambda *a: None)
    assert not wait_for_device(lambda: False, poll_s=0.01,
                               max_wait_s=0.05, log=lambda *a: None)


def test_newest_mtime(tmp_path):
    assert newest_mtime([str(tmp_path / "missing")]) is None
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.write_text("x")
    time.sleep(0.01)
    b.write_text("y")
    m = newest_mtime([str(a), str(b), str(tmp_path / "missing")])
    assert m == os.stat(b).st_mtime


def test_strip_valued_flags():
    from adlm_tpu.cli import _strip_valued_flags
    argv = ["train", "exp", "run", "--auto-restart", "3", "--bf16",
            "--watchdog-timeout=60", "--val-every", "10"]
    out = _strip_valued_flags(argv, ("--auto-restart",
                                     "--watchdog-timeout"))
    assert out == ["train", "exp", "run", "--bf16",
                   "--val-every", "10"]


def test_relaunch_only_resumes_once_resume_json_exists(tmp_path):
    """A child that died before writing resume.json (pretrained load /
    initial compile) must be relaunched WITHOUT --resume — --resume on
    a fresh run_dir is a hard SystemExit, and appending it blindly
    burns the whole restart budget in seconds."""
    from adlm_tpu.cli import _watchdog_relaunch_cmd

    base = ["train", "smoke", "run1"]
    run_dir = str(tmp_path)

    # first attempt: never resumes
    assert "--resume" not in _watchdog_relaunch_cmd(base, run_dir, 0)
    # restart with no resume.json yet: still no --resume
    assert "--resume" not in _watchdog_relaunch_cmd(base, run_dir, 1)
    # once the run has progressed far enough to write resume.json,
    # restarts continue from it
    with open(os.path.join(run_dir, "resume.json"), "w") as f:
        f.write("{}")
    cmd = _watchdog_relaunch_cmd(base, run_dir, 1)
    assert cmd.count("--resume") == 1
    # idempotent when the base argv already carries --resume
    cmd = _watchdog_relaunch_cmd(base + ["--resume"], run_dir, 2)
    assert cmd.count("--resume") == 1


def test_divergence_exit_is_not_restarted(tmp_path):
    """Exit 86 (cli.DIVERGED_EXIT / TrainingDiverged) is deterministic
    under --resume with identical args — the watchdog must surface it
    immediately instead of burning its restart budget replaying the
    same NaN window."""
    script = tmp_path / "diverge.py"
    script.write_text("import sys; sys.exit(86)")
    calls = []

    def make_cmd(attempt):
        calls.append(attempt)
        return [sys.executable, str(script)]

    rc = run_with_watchdog(make_cmd, [], timeout_s=30, poll_s=0.1,
                           max_restarts=5, probe=lambda: True,
                           log=lambda *a: None)
    assert rc == 86
    assert calls == [0]  # no restart at all
