"""In-run failure detection + elastic restart for long TPU trainings.

The remote-TPU relay this framework targets can wedge: every transfer
and compile hangs indefinitely with no error until an external watchdog
recycles it (observed repeatedly; CLAUDE.md).  A preempted or wedged
training run is pure wall-clock loss unless something (a) notices, (b)
waits out the infrastructure, and (c) continues from the exact step.
The reference has no story for any of these — a hung
``trainer.fit`` simply hangs forever and a restart loses the phase
(reference segmentation/train.py:58-65 restarts phases from step 0).

This module supplies (a) and (b); the bit-identical mid-phase resume in
``train/pipeline.py`` (``train --resume``) supplies (c):

* **Heartbeat**: the training child's fsynced run log + metrics CSV
  (utils/logging.py) advance every logged window / validation / push
  progress line; their newest mtime is the liveness signal — no extra
  instrumentation in the hot loop.
* **Stall detection**: no heartbeat for ``timeout_s`` (default 900 s,
  comfortably above the 2–6 min remote compile pauses) ⇒ the child is
  presumed wedged and is killed by exact pid (never by pattern).
* **Device probe**: before relaunching, a tiny fetch
  (``np.asarray(jnp.arange(4))``) is run in a TIMEOUT-BOUNDED
  subprocess in a retry loop — the documented way to tell a wedged
  relay from a live one without wedging the probe process itself.
* **Elastic restart**: the child is relaunched with ``--resume``,
  continuing the exact stage/window with restored optimizer moments
  (tests prove the resumed trajectory is bit-identical).

Driven by ``train --auto-restart N`` (cli.py), and reusable around any
resumable command via :func:`run_with_watchdog`.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from typing import Callable, List, Optional, Sequence


def newest_mtime(paths: Sequence[str]) -> Optional[float]:
    """Newest mtime among ``paths`` that exist (None if none do)."""
    best = None
    for p in paths:
        try:
            m = os.stat(p).st_mtime
        except OSError:
            continue
        best = m if best is None else max(best, m)
    return best


def default_device_probe(probe_timeout_s: float = 60.0) -> bool:
    """True iff a small device round-trip completes within the timeout.

    Runs in a subprocess so a wedged relay hangs the CHILD, not us —
    the probe pattern CLAUDE.md prescribes for wedge detection."""
    code = ("import numpy as np, jax.numpy as jnp; "
            "np.asarray(jnp.arange(4))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=probe_timeout_s,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_device(probe: Callable[[], bool], poll_s: float = 60.0,
                    max_wait_s: float = 3600.0, log=print) -> bool:
    """Poll ``probe`` until it reports live (True) or ``max_wait_s``
    elapses (False).  Relay wedges clear in ~10–40 min (measured), so
    the default budget is an hour."""
    t0 = time.monotonic()
    while time.monotonic() - t0 < max_wait_s:
        if probe():
            return True
        log(f"watchdog: device still unresponsive "
            f"({time.monotonic() - t0:.0f}s); retrying")
        time.sleep(poll_s)
    return probe()


def run_with_watchdog(make_cmd: Callable[[int], List[str]],
                      heartbeat_paths: Sequence[str],
                      timeout_s: float = 900.0,
                      max_restarts: int = 3,
                      poll_s: float = 10.0,
                      probe: Optional[Callable[[], bool]] = None,
                      device_poll_s: float = 60.0,
                      device_max_wait_s: float = 3600.0,
                      grace_s: float = 10.0,
                      log=print) -> int:
    """Supervise a resumable child command; restart it on stall/crash.

    Args:
      make_cmd: attempt index → argv.  Attempt 0 is the initial run;
        attempts ≥ 1 should include the resume flag.
      heartbeat_paths: files whose mtime advancing means the child is
        alive (the run's log + metrics CSV).
      timeout_s: no-heartbeat window after which the child is presumed
        wedged.  Must exceed the longest legitimate silent stretch
        (remote compiles: 2–6 min).
      max_restarts: restart budget (stalls AND crashes both consume it).
      poll_s: heartbeat check interval.
      probe: liveness check run before each relaunch
        (default: :func:`default_device_probe`).
      grace_s: SIGTERM→SIGKILL escalation window.

    Returns the child's final exit code (0 = the run completed).
    """
    probe = probe or default_device_probe
    attempt = 0
    restarts_left = max_restarts
    while True:
        cmd = make_cmd(attempt)
        log(f"watchdog: starting attempt {attempt}: {' '.join(cmd)}")
        child = subprocess.Popen(cmd)
        start = time.monotonic()
        stalled = False
        while True:
            try:
                rc = child.wait(timeout=poll_s)
                break
            except subprocess.TimeoutExpired:
                pass
            hb = newest_mtime(heartbeat_paths)
            # mtimes are wall-clock; shift onto the monotonic axis.
            # Heartbeats older than this attempt's start don't count
            # as liveness (a stale log from the previous attempt).
            hb_mono = (hb - _mono_offset()) if hb is not None else start
            silent = time.monotonic() - max(hb_mono, start)
            if silent > timeout_s:
                log(f"watchdog: no heartbeat for {silent:.0f}s "
                    f"(> {timeout_s:.0f}s) — killing pid {child.pid}")
                child.terminate()
                try:
                    child.wait(timeout=grace_s)
                except subprocess.TimeoutExpired:
                    child.kill()
                    child.wait()
                rc = None
                stalled = True
                break
        if rc == 0:
            log("watchdog: run completed")
            return 0
        if rc == 86:  # cli.DIVERGED_EXIT: TrainingDiverged
            # divergence is deterministic under --resume with the same
            # args — restarting replays the same NaN window; surface it
            log("watchdog: child reported divergence (exit 86) — "
                "deterministic failure, not restarting; relaunch "
                "manually with a stability knob (e.g. --grad-clip)")
            return rc
        reason = "stall" if stalled else f"exit {rc}"
        if restarts_left <= 0:
            log(f"watchdog: {reason}, restart budget exhausted")
            return rc if rc is not None else 1
        restarts_left -= 1
        log(f"watchdog: {reason} — probing device before resume "
            f"({restarts_left} restarts left)")
        if not wait_for_device(probe, poll_s=device_poll_s,
                               max_wait_s=device_max_wait_s, log=log):
            log("watchdog: device never recovered — giving up")
            return rc if rc is not None else 1
        attempt += 1


def _mono_offset() -> float:
    """time.time() − time.monotonic(): converts file mtimes (wall
    clock) onto the monotonic axis used for stall arithmetic."""
    return time.time() - time.monotonic()
