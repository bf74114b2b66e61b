"""Exclusive run-directory lock: one live trainer per run dir.

`--run_name` pins a stable run directory so relaunches auto-resume
(cli/common.py run_training).  That makes accidental double-starts an
operational hazard: two live trainers writing the same dir corrupt each
other's checkpoints — orbax's async tmp-dir name is deterministic per item,
so writer B "removes existing" writer A's in-flight tmp dir and A's final
rename dies with ENOENT (observed on v5e; the run's checkpoint_current was
left unusable).  The reference had no guard either — its pickled-trainer
checkpoints (reference trainer.py:330-338) would be silently clobbered.

The lock is an O_EXCL pid file per jax process index (multi-process DP
legitimately shares one run dir across process slots).  A dead owner's lock
on the same host (pid no longer in /proc) is reclaimed automatically, so
crash + relaunch auto-resume keeps working; a live owner makes the new
process exit with a clear message instead of corrupting the run.  Locks
held by OTHER hosts (shared filesystem) cannot be liveness-checked and must
be removed manually — the error says so.
"""

import atexit
import os
import socket


def acquire_run_lock(run_dir: str, slot: int = 0):
    """Acquire `run_dir`'s exclusive lock for this process; returns a
    release callable (idempotent; also registered atexit).  Raises
    SystemExit if another live process on this host holds it."""
    path = os.path.join(run_dir, f".runlock.p{slot}")
    me_host, me_pid = socket.gethostname(), os.getpid()
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            try:
                with open(path) as f:
                    host, _, pid = f.read().strip().partition(":")
            except OSError:  # owner released between our open attempts
                continue
            if host == me_host and pid == str(me_pid):
                pass  # re-entrant: a previous Trainer in this process
            elif (host == me_host and pid.isdigit()
                    and not os.path.exists(f"/proc/{pid}")):
                pass  # stale: owner died on this host — reclaim
            else:
                raise SystemExit(
                    f"run dir {run_dir!r} is locked by live trainer "
                    f"{host}:{pid} ({path}). Two trainers on one run dir "
                    f"corrupt each other's checkpoints — pick a different "
                    f"--run_name, or if that process is truly gone (a "
                    f"different host sharing this filesystem), delete the "
                    f"lock file.")
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass
            continue  # retry O_EXCL; a concurrent reclaimer may win it
        with os.fdopen(fd, "w") as f:
            f.write(f"{me_host}:{me_pid}\n")
        break

    released = []

    def release():
        if not released:
            released.append(True)
            try:
                os.unlink(path)
            except OSError:
                pass

    atexit.register(release)
    return release
