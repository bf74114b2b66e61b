"""Exclusive run-directory lock: one live trainer per run dir.

`--run_name` pins a stable run directory so relaunches auto-resume
(cli/common.py run_training).  That makes accidental double-starts an
operational hazard: two live trainers writing the same dir corrupt each
other's checkpoints — orbax's async tmp-dir name is deterministic per item,
so writer B "removes existing" writer A's in-flight tmp dir and A's final
rename dies with ENOENT (observed on v5e; the run's checkpoint_current was
left unusable).  The reference had no guard either — its pickled-trainer
checkpoints (reference trainer.py:330-338) would be silently clobbered.

The lock is a kernel flock(2) on `<run_dir>/.runlock.p<slot>`, one slot per
jax process index (multi-process DP legitimately shares one run dir across
process slots).  flock makes liveness the kernel's problem: the lock
vanishes with the owning process however it dies (SIGKILL included), so
crash + relaunch auto-resume needs no stale-pid heuristics, and there is no
remove-and-recreate window for two acquirers to race through.  A live owner
makes the new process exit with a clear message naming host:pid.  Caveat
(documented in OPERATIONS.md): flock is advisory and not reliable across
NFS hosts — the lock protects against same-host double-starts, which is
the relaunch-automation failure mode it exists for.
"""

import atexit
import fcntl
import os
import socket

# path -> (fd, release) for locks this process already holds: re-acquiring
# (e.g. a second fit() on the same trainer) returns the same release instead
# of stacking atexit handlers that could outlive a later legitimate owner.
_held = {}


def acquire_run_lock(run_dir: str, slot: int = 0):
    """Acquire `run_dir`'s exclusive lock for this process; returns an
    idempotent release callable (also registered atexit).  Raises
    SystemExit if another live process holds it."""
    path = os.path.abspath(os.path.join(run_dir, f".runlock.p{slot}"))
    if path in _held:
        return _held[path][1]
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        try:
            with open(path) as f:
                owner = f.read().strip() or "<unknown>"
        except OSError:
            owner = "<unreadable>"
        os.close(fd)
        raise SystemExit(
            f"run dir {run_dir!r} is locked by live trainer {owner} "
            f"({path}). Two trainers on one run dir corrupt each other's "
            f"checkpoints — pick a different --run_name. (The lock is a "
            f"kernel flock: it disappears with the owning process, so a "
            f"blocked relaunch means that process is still running.)")
    os.ftruncate(fd, 0)
    os.write(fd, f"{socket.gethostname()}:{os.getpid()}\n".encode())
    os.fsync(fd)

    def release():
        if _held.pop(path, None) is not None:
            # closing the fd drops the flock.  The file itself is NEVER
            # unlinked: removing a flock file races a concurrent acquirer
            # onto a second inode at the same path, and then two "owners"
            # hold locks on different files — the unlocked leftover file is
            # harmless advisory metadata.
            try:
                os.close(fd)
            except OSError:
                pass

    _held[path] = (fd, release)
    atexit.register(release)
    return release
