"""Device-stall watchdog: supervise the run, re-exec on hang, resume.

The axon TPU tunnel can freeze a process for many minutes while a FRESH
process right after runs fine (RESULTS.md; CLAUDE.md known-gap 7). A
stuck XLA call cannot be interrupted from inside the process, so the
only robust recovery is process-level: `--watchdog SECONDS` makes the
CLI supervise a child copy of itself. The child touches a heartbeat
file on every unit of pipeline progress (chunk completions, manifest
writes); if the heartbeat goes stale past the timeout the child is
killed and relaunched with --resume, picking up from the chunk manifest
(completed work replays byte-identically; SURVEY.md §5.4). Bounded
retries; a child that exits non-zero without stalling is a real error
and is not retried.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

HEARTBEAT_ENV = "NC_TPU_HEARTBEAT"
CHILD_ENV = "NC_TPU_WATCHDOG_CHILD"

_last_beat = 0.0


def beat(min_interval=1.0):
    """Touch the heartbeat file if supervision is active (throttled).

    Called from progress updates and manifest writes — the beat tracks
    pipeline PROGRESS, not liveness: a background touch-thread would
    keep ticking right through a stuck device call."""
    global _last_beat
    path = os.environ.get(HEARTBEAT_ENV)
    if not path:
        return
    now = time.monotonic()
    if now - _last_beat < min_interval:
        return
    _last_beat = now
    try:
        with open(path, "w") as fh:
            fh.write(str(time.time()))
    except OSError:
        pass


def supervise(cmd, heartbeat_path, timeout, max_retries=3, poll=2.0,
              resume_flag="--resume", log=print):
    """Run cmd under stall supervision; returns the child's exit code.

    cmd: argv list for the first attempt. On stall (heartbeat older
    than `timeout` seconds) the child process group is killed and the
    command relaunched with `resume_flag` appended (if not present).
    A child killed by an EXTERNAL signal (negative returncode: OOM
    killer, operator kill) is retried the same way — in a multi-host
    job this lets the killed host relaunch while the surviving hosts'
    watchdogs cycle their stalled children, so the processes can
    rendezvous on a fresh coordination service and finish from their
    manifests (tests/test_distributed.py::test_watchdog_kill_recovery).
    A non-stalled non-zero *exit* is returned as-is (real error).
    """
    env = dict(os.environ)
    env[HEARTBEAT_ENV] = heartbeat_path
    env[CHILD_ENV] = "1"
    attempt_cmd = list(cmd)
    for attempt in range(1 + max_retries):
        with open(heartbeat_path, "w") as fh:
            fh.write(str(time.time()))
        start = time.monotonic()
        child = subprocess.Popen(attempt_cmd, env=env,
                                 start_new_session=True)
        stalled = False
        while True:
            try:
                rc = child.wait(timeout=poll)
                break
            except subprocess.TimeoutExpired:
                try:
                    age = time.time() - os.path.getmtime(heartbeat_path)
                except OSError:
                    age = time.monotonic() - start
                if age > timeout:
                    stalled = True
                    log("watchdog: no progress for %.0fs — killing the "
                        "run and resuming in a fresh process (attempt "
                        "%d/%d)" % (age, attempt + 1, max_retries + 1))
                    try:
                        os.killpg(child.pid, signal.SIGKILL)
                    except (ProcessLookupError, PermissionError):
                        child.kill()
                    child.wait()
                    break
        if not stalled:
            if rc >= 0:
                return rc
            log("watchdog: child killed by signal %d — resuming in a "
                "fresh process (attempt %d/%d)"
                % (-rc, attempt + 1, max_retries + 1))
        if resume_flag not in attempt_cmd:
            attempt_cmd = attempt_cmd + [resume_flag]
    log("watchdog: giving up after %d attempts" % (1 + max_retries))
    return 124


def wrap_cli(argv, timeout, output_dir):
    """Supervise `python -m nanocaller_tpu.cli <argv>` (watchdog flag
    stripped; child marked via env). Returns the child's exit code.

    If the supervising process already configured a jax platform (e.g.
    a harness forced CPU via jax.config), the choice is propagated to
    the child through NC_TPU_PLATFORM — the re-exec would otherwise
    silently fall back to the sitecustomize-pinned default backend."""
    clean = []
    skip = False
    for i, tok in enumerate(argv):
        if skip:
            skip = False
            continue
        if tok == "--watchdog":
            skip = True
            continue
        if tok.startswith("--watchdog="):
            continue
        clean.append(tok)
    os.makedirs(output_dir, exist_ok=True)
    if "jax" in sys.modules and "NC_TPU_PLATFORM" not in os.environ:
        try:
            plat = sys.modules["jax"].config.jax_platforms
            if plat:
                os.environ["NC_TPU_PLATFORM"] = plat
        except Exception:
            pass
    hb = os.path.join(output_dir, ".heartbeat")
    cmd = [sys.executable, "-m", "nanocaller_tpu.cli"] + clean
    return supervise(cmd, hb, timeout)
