"""Epoch-loop trainer: CSV logs, best-metric checkpoints, resume.

Functional replacement for the reference trainer hierarchy
(`TorchSupervisedTrainer` / `RNN_trainer` / `MultimodalTrainer`, reference
trainer.py:26-1049), with the same observable behavior where it was sound:

- timestamped run dir `DD.MM.YYYY, HH-MM-SS (model_name)` (trainer.py:80-90);
- per-head CSV logs `{head}_train_log.csv` / `{head}_test_log.csv` with the
  reference's metric set: loss, accuracy, per-class precision/recall/f1
  (stringified arrays), UAR/UAP/UAF1 (trainer.py:340-345, 860-867;
  train_multimodal.py:547-556);
- best checkpoint per head on `1 - metric` improvement (trainer.py:431-448)
  — with the reference's inverted best-loss initialization bug fixed
  (trainer.py:92-104 initialized best=0 for 'loss', so loss-criterion runs
  never checkpointed; here 'loss' works);
- resumable: a single checkpoint captures TrainState + epoch + best records
  (the reference pickled the entire trainer object, trainer.py:330-338).

Epoch metrics come from device-accumulated confusion matrices; predictions
never cross to the host per batch.
"""

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import metrics_from_confusion
from .state import TrainState, create_train_state
from .steps import LossSpec, make_eval_step, make_train_step
from ..data.pipeline import device_prefetch


def _fmt_metric(v):
    if isinstance(v, np.ndarray):
        return np.array2string(v, precision=6, separator=" ")
    return v


def _encode_acc(acc):
    """Metric accumulators -> JSON-serializable (for the partial-epoch
    checkpoint meta written on preemption).  Reading the device arrays
    here is the first (and only) point a partial snapshot blocks on the
    in-flight step chain."""
    return {head: {"loss": float(np.asarray(s["loss"])),
                   "valid": float(np.asarray(s["valid"])),
                   "confusion": np.asarray(s["confusion"]).tolist()}
            for head, s in acc.items() if head != "_samples"}


@jax.jit
def _acc_step(acc, metrics, sample_mask):
    """One device-side accumulator update (loss weighted by valid count,
    valid count, confusion matrix, masked sample count).

    jit'd so each train step enqueues ONE tiny fused program instead of a
    handful of eager ops, and — the point — so the HOST NEVER BLOCKS on
    step completion inside the epoch loop: the old host-numpy
    accumulation (`np.asarray` per metric per step) was a synchronous D2H
    readback that serialized every step behind its predecessor's full
    round trip.  Device-side accumulation keeps the whole epoch an async
    dispatch chain; readback happens once per epoch (or per preemption
    snapshot).  `acc` may be an empty dict (first step) or host-numpy
    float accumulators (resume from a partial-epoch checkpoint) — both
    are valid pytrees for the add."""
    upd = {}
    for head, m in metrics.items():
        if head == "total_loss":
            continue
        upd[head] = {"loss": m["loss"] * m["valid"],
                     "valid": m["valid"] * 1.0,
                     "confusion": m["confusion"] * 1.0}
    if sample_mask is not None:
        upd["_samples"] = jnp.sum(sample_mask)
    if not acc:
        return upd
    if "_samples" in upd and "_samples" not in acc:
        acc = dict(acc, _samples=jnp.zeros((), jnp.float32))
    return jax.tree.map(jnp.add, acc, upd)


def _decode_acc(enc):
    return {head: {"loss": np.float64(s["loss"]),
                   "valid": np.float64(s["valid"]),
                   "confusion": np.asarray(s["confusion"], np.float64)}
            for head, s in enc.items()}


class _InflightThrottle:
    """Bound how far the host epoch loop runs ahead of the device.

    With device-side metric accumulation the loop body never blocks, so
    an unthrottled host would enqueue the WHOLE epoch — every not-yet-
    executed step pins its input batch in HBM (a 128-frame video batch is
    ~150 MB; an epoch of them is an OOM).  Holding the accumulator leaf
    of step N and blocking on it at step N+depth caps live batches at
    ~depth+prefetch while still letting dispatch run ahead of compute.
    (The accumulator chains through every step, so its readiness implies
    the whole prefix of steps has executed and freed its inputs.)"""

    def __init__(self, depth: int):
        from collections import deque

        self.depth = max(int(depth), 2)
        self._q = deque()

    def push(self, acc):
        leaves = jax.tree.leaves(acc)
        if not leaves:
            return
        self._q.append(leaves[0])
        if len(self._q) > self.depth:
            # drain HALF the window with a single sync: steps execute in
            # program order, so readiness of the NEWEST drained entry
            # implies every older one completed too.  Syncing once per
            # depth/2 steps (instead of every step) amortizes the
            # completion query, which costs a full round trip on
            # high-latency dispatch paths.
            newest = None
            while len(self._q) > self.depth // 2:
                newest = self._q.popleft()
            jax.block_until_ready(newest)


class _NullGuard:
    """Stand-in when preemption handling is off."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def should_stop(self):
        return False


class Trainer:
    def __init__(self, model, loss_specs: Dict[str, LossSpec], optimizer,
                 train_loader, test_loader, num_classes: int,
                 saving_dir: str, model_name: str,
                 checkpoint_criterion: str = "UAR", seed: int = 0,
                 sharding=None, log_console: bool = True,
                 run_dir: Optional[str] = None, on_epoch_start=None,
                 compute_dtype=None, ema_decay: float = 0.0,
                 ema_update_every: int = 1, early_stop_patience: int = 0,
                 async_checkpoint: bool = True,
                 profile_dir: Optional[str] = None, profile_epoch: int = 1,
                 handle_preemption: bool = True,
                 tensorboard_dir: Optional[str] = None,
                 param_placement=None, inflight_steps: int = 4):
        self.model = model
        self.loss_specs = loss_specs
        self.optimizer = optimizer
        self.train_loader = train_loader
        self.test_loader = test_loader
        self.num_classes = num_classes
        self.model_name = model_name
        self.checkpoint_criterion = checkpoint_criterion
        self.seed = seed
        self.sharding = sharding
        self.log_console = log_console
        # per-epoch hook, e.g. repoint a feature dir (the reference's
        # update_datasets, trainer.py:840-850)
        self.on_epoch_start = on_epoch_start
        self.ema_decay = ema_decay
        self.ema_update_every = ema_update_every
        # stop after N consecutive epochs with no best-checkpoint improvement
        # on any head (0 = train the full epoch budget, like the reference)
        self.early_stop_patience = early_stop_patience
        # overlap per-epoch checkpoint writes with the next epoch's compute
        # (orbax snapshots to host before save() returns; fit() drains all
        # pending writes before returning — io/checkpoint.py)
        self.async_checkpoint = async_checkpoint
        # jax.profiler trace of one epoch's train steps (SURVEY.md §5.1);
        # epoch 1 by default so compile doesn't drown the steps
        self.profile_dir = profile_dir
        self.profile_epoch = profile_epoch
        # SIGTERM -> mid-epoch partial checkpoint -> exact resume
        # (utils/preemption.py; tests/test_preemption.py)
        self.handle_preemption = handle_preemption
        # optional live TensorBoard scalars next to the CSV/PNG artifacts
        # (utils/tblog.py; writer created lazily on the first logged epoch)
        self.tensorboard_dir = tensorboard_dir
        self._tb = None
        # TrainState -> TrainState hook applied once after lazy init: places
        # params/opt-state on the mesh (tensor parallelism —
        # parallel.sharding_rules.place_state_for_tp via cli.common)
        self.param_placement = param_placement
        # how many steps of device-side metric accumulation may be in
        # flight before the host blocks on the oldest (_InflightThrottle):
        # bounds HBM held by enqueued-but-unexecuted steps' input batches
        # while keeping the epoch loop free of per-step host syncs
        self.inflight_steps = inflight_steps
        self._partial = None  # decoded partial-epoch meta when resuming one

        # Multi-process DP: every process runs the same global jitted steps
        # (collectives are inserted by jit over the global mesh); host-side
        # artifacts (CSV logs, plots, console, checkpoint meta) are written
        # by process 0 only.  Orbax state saves stay collective — every
        # process participates (io/checkpoint.py).
        self.is_main_process = jax.process_index() == 0

        if run_dir is None:
            stamp = time.strftime("%d.%m.%Y, %H-%M-%S")
            run_dir = os.path.join(saving_dir, f"{stamp} ({model_name})")
        self.run_dir = run_dir
        os.makedirs(self.run_dir, exist_ok=True)
        # one live trainer per run dir (utils/runlock.py): a double-started
        # --run_name relaunch must exit cleanly, not corrupt the resumable
        # checkpoints it came to continue
        from ..utils.runlock import acquire_run_lock

        self._release_runlock = acquire_run_lock(self.run_dir,
                                                 jax.process_index())

        self.state: Optional[TrainState] = None
        self.start_epoch = 0
        self.best_errors: Dict[str, float] = {}
        self.logs: Dict[str, list] = {}
        self._train_step = make_train_step(model, loss_specs, num_classes,
                                           compute_dtype=compute_dtype)
        self._eval_step = make_eval_step(model, loss_specs, num_classes,
                                         compute_dtype=compute_dtype)

    # ------------------------------------------------------------------ state
    def init_state(self, sample_batch):
        if self.state is None:
            self.state = create_train_state(
                self.model, sample_batch["modalities"], self.optimizer,
                rng=jax.random.PRNGKey(self.seed), ema_decay=self.ema_decay,
                ema_update_every=self.ema_update_every)
            if self.param_placement is not None:
                self.state = self.param_placement(self.state)
        return self.state

    def init_from_loader(self):
        """Initialize state from the first training batch, laid out like a
        training step would see it (device_prefetch applies the mesh
        sharding; in multi-process runs a raw loader batch is only the
        host-local slice and would leave params on a single device)."""
        first = next(iter(device_prefetch(iter(self.train_loader),
                                          sharding=self.sharding)))
        return self.init_state(first)

    # ------------------------------------------------------------------ epochs
    def _accumulate(self, acc, metrics, sample_mask=None):
        """Fold one step's metrics into the accumulators ON DEVICE (no
        host sync — see _acc_step).  Returns device arrays; np-ified only
        at epoch/snapshot boundaries."""
        return _acc_step(acc, metrics, sample_mask)

    def _epoch_results(self, acc):
        results = {}
        for head, slot in acc.items():
            if head == "_samples":
                continue
            confusion = np.asarray(slot["confusion"])
            m = metrics_from_confusion(confusion)
            m["loss"] = float(np.asarray(slot["loss"])
                              / max(float(np.asarray(slot["valid"])), 1.0))
            results[head] = m
        return results

    def train_epoch(self, rng, partial=None, guard=None):
        """One training epoch.  Returns (results, snapshot): results is
        None iff the epoch was preempted mid-way; snapshot always carries
        {batches_done, samples, acc, seconds} — mid-epoch state on preemption, the
        FULL epoch on completion (so a preemption during the subsequent
        eval can checkpoint as a fully-trained partial whose resume only
        re-runs eval/logging).  `partial` replays a previously preempted
        epoch: the first `batches_done` batches are skipped without being
        built when the loader supports it (BatchLoader.iter_skipping — no
        decode, no H2D) and consumed host-side otherwise, their RNG splits
        re-drawn either way so the remaining steps see identical streams,
        and the saved metric accumulators continue where they left off."""
        acc = {} if partial is None else _decode_acc(partial["acc"])
        skip = 0 if partial is None else int(partial["batches_done"])
        if acc:
            # resume: carry the already-trained sample count inside the
            # device accumulator so the loop stays readback-free
            acc["_samples"] = np.float32(partial["samples"])
        # training seconds accumulated before the preemption — carried in
        # the partial snapshot so the logged epoch_seconds/clips_per_sec
        # cover the WHOLE epoch, not just the post-resume remainder
        prior_seconds = (0.0 if partial is None
                         else float(partial.get("seconds", 0.0)))
        done = skip
        skipped = 0
        if skip and hasattr(self.train_loader, "iter_skipping"):
            # loader-side fast skip: advances the batch stream without
            # building (decoding) the already-trained batches
            it = self.train_loader.iter_skipping(skip)
            skipped = skip
        else:
            it = iter(self.train_loader)
            for _ in range(skip):
                try:
                    next(it)
                except StopIteration:
                    break
                skipped += 1
        for _ in range(skipped):  # replay the skipped steps' RNG draws
            rng, _ = jax.random.split(rng)
        t0 = time.time()  # after the skip replay: training time only
        inflight = _InflightThrottle(self.inflight_steps)
        for i, batch in enumerate(device_prefetch(it,
                                                  sharding=self.sharding),
                                  start=skip):
            self.init_state(batch)
            rng, step_rng = jax.random.split(rng)
            self.state, metrics = self._train_step(self.state, batch, step_rng)
            acc = self._accumulate(acc, metrics, batch["sample_mask"])
            inflight.push(acc)
            done = i + 1
            if guard is not None and guard.should_stop():
                samples = int(np.asarray(acc["_samples"]))
                return None, {"batches_done": done, "samples": samples,
                              "acc": _encode_acc(acc),
                              "seconds": prior_seconds + time.time() - t0}
        samples = int(np.asarray(acc["_samples"])) if acc else 0
        snapshot = {"batches_done": done, "samples": samples,
                    "acc": _encode_acc(acc),
                    "seconds": prior_seconds + time.time() - t0}
        results = self._epoch_results(acc)
        elapsed = max(prior_seconds + time.time() - t0, 1e-9)
        for m in results.values():
            m["epoch_seconds"] = round(elapsed, 2)
            m["clips_per_sec"] = round(samples / elapsed, 2)
        return results, snapshot

    def eval_epoch(self, guard=None):
        """Test-set pass; returns None if preempted mid-way (eval has no
        state side effects, so an aborted pass is simply re-run on resume)."""
        acc = {}
        inflight = _InflightThrottle(self.inflight_steps)
        for batch in device_prefetch(iter(self.test_loader),
                                     sharding=self.sharding):
            self.init_state(batch)
            metrics = self._eval_step(self.state, batch)
            acc = self._accumulate(acc, metrics)
            inflight.push(acc)
            if guard is not None and guard.should_stop():
                return None
        return self._epoch_results(acc)

    # ------------------------------------------------------------------ logging
    def _append_log(self, split, epoch, results):
        import pandas as pd

        if not self.is_main_process:
            return
        for head, metrics in results.items():
            row = {"epoch": epoch}
            row.update({k: _fmt_metric(v) for k, v in metrics.items()})
            key = f"{head}_{split}"
            self.logs.setdefault(key, []).append(row)
            pd.DataFrame(self.logs[key]).to_csv(
                os.path.join(self.run_dir, f"{head}_{split}_log.csv"),
                index=False)
        if self.tensorboard_dir:
            if self._tb is None:
                from ..utils.tblog import TBWriter

                self._tb = TBWriter(self.tensorboard_dir)
            self._tb.log(split, epoch, results)

    def _print_results(self, epoch, split, results):
        if not self.log_console or not self.is_main_process:
            return
        for head, m in results.items():
            print(f"[epoch {epoch}] {split} {head}: "
                  f"loss={m['loss']:.4f} acc={m['accuracy']:.4f} "
                  f"UAR={m['UAR']:.4f} UAP={m['UAP']:.4f} UAF1={m['UAF1']:.4f}")

    # ------------------------------------------------------------------ ckpt
    def _error(self, metrics):
        crit = self.checkpoint_criterion
        if crit == "loss":
            return metrics["loss"]
        return 1.0 - metrics[crit]

    def save_checkpoint(self, epoch):
        from ..io import checkpoint as ckpt_io

        path = os.path.join(self.run_dir, "checkpoint_current")
        ckpt_io.save_state(path, self.state,
                           meta={"epoch": epoch,
                                 "best_errors": self.best_errors,
                                 "model_name": self.model_name},
                           block=not self.async_checkpoint)

    def maybe_save_best(self, epoch, results):
        """Save per-head best checkpoints; returns True iff any head improved
        (feeds the early-stopping patience counter)."""
        from ..io import checkpoint as ckpt_io

        improved = False
        for head, metrics in results.items():
            err = self._error(metrics)
            best = self.best_errors.get(head, float("inf"))
            if err < best:
                improved = True
                self.best_errors[head] = err
                path = os.path.join(self.run_dir, f"checkpoint_best_{head}")
                ckpt_io.save_state(path, self.state,
                                   meta={"epoch": epoch, "head": head,
                                         "criterion": self.checkpoint_criterion,
                                         "error": float(err)},
                                   block=not self.async_checkpoint)
        return improved

    def save_preempt_checkpoint(self, epoch, partial):
        """Blocking PARTIAL checkpoint on preemption: TrainState after
        `batches_done` steps of `epoch`, plus the in-flight metric
        accumulators — everything an exact mid-epoch resume needs."""
        from ..io import checkpoint as ckpt_io

        ckpt_io.wait_for_saves()  # earlier async epoch saves first
        path = os.path.join(self.run_dir, "checkpoint_preempt")
        ckpt_io.save_state(path, self.state,
                           meta={"partial": True, "epoch": epoch,
                                 "best_errors": self.best_errors,
                                 "model_name": self.model_name, **partial},
                           block=True)
        if self.log_console and self.is_main_process:
            print(f"[preemption] saved partial checkpoint at epoch {epoch}, "
                  f"batch {partial['batches_done']}: {path}", flush=True)

    def _clear_preempt_checkpoint(self):
        path = os.path.join(self.run_dir, "checkpoint_preempt")
        if not os.path.isdir(path):
            return
        from ..io import checkpoint as ckpt_io

        # The preempt dir is the only valid fallback until this epoch's
        # (possibly async) current/best writes are fully committed — a
        # SIGKILL between orbax's force-delete of the old checkpoint and
        # the tmp-dir rename would otherwise leave NO restorable state.
        ckpt_io.wait_for_saves()
        if self.is_main_process:
            import shutil

            shutil.rmtree(path, ignore_errors=True)

    def load_checkpoint(self, path):
        from ..io import checkpoint as ckpt_io

        assert self.state is not None, "call init_state (or run a batch) first"
        mesh = (self.sharding.mesh
                if getattr(self.sharding, "mesh", None) is not None else None)
        self.state, meta = ckpt_io.restore_state(path, self.state, mesh=mesh)
        if self.param_placement is not None:
            # restore lands replicated over the mesh; re-apply the TP
            # placement so a resumed run keeps its Megatron shardings
            # instead of silently continuing with replicated kernels
            self.state = self.param_placement(self.state)
        self.best_errors = dict(meta.get("best_errors", {}))
        if meta.get("partial"):
            # mid-epoch checkpoint: re-enter THAT epoch, skipping the
            # batches already trained (train_epoch replays their RNG splits)
            self.start_epoch = int(meta["epoch"])
            self._partial = {"batches_done": meta["batches_done"],
                             "samples": meta["samples"], "acc": meta["acc"],
                             "seconds": meta.get("seconds", 0.0)}
        else:
            self.start_epoch = int(meta.get("epoch", -1)) + 1
        self._load_logs()
        return meta

    def _load_logs(self):
        """Rehydrate self.logs from this run dir's CSVs on resume — rows
        for epochs before start_epoch are kept so the resumed run APPENDS
        to the history instead of overwriting it with only its own epochs
        (the logs-match-the-uninterrupted-run contract)."""
        if not self.is_main_process or not os.path.isdir(self.run_dir):
            return
        import pandas as pd

        self.logs = {}
        for fname in sorted(os.listdir(self.run_dir)):
            if not fname.endswith("_log.csv"):
                continue
            key = fname[: -len("_log.csv")]
            df = pd.read_csv(os.path.join(self.run_dir, fname))
            rows = [r for r in df.to_dict("records")
                    if int(r.get("epoch", -1)) < self.start_epoch]
            if rows:
                self.logs[key] = rows

    def resume_latest(self):
        """Crash recovery: resume from this run dir's latest checkpoint if
        one exists (failure-detection subsystem the reference approximated
        with --resume_training flags, SURVEY.md §5.3).  A preemption
        checkpoint — always written after the last per-epoch save — wins
        over checkpoint_current.  Only checkpoints whose orbax item
        directory was fully committed qualify (a kill mid-write leaves
        meta.json next to an uncommitted tmp dir)."""
        for name in ("checkpoint_preempt", "checkpoint_current"):
            path = os.path.join(self.run_dir, name)
            if os.path.isdir(os.path.join(path, "state")):
                self.init_from_loader()
                return self.load_checkpoint(path)
        return None

    # ------------------------------------------------------------------ fit
    def fit(self, epochs: int):
        from ..utils.preemption import PreemptionGuard
        from ..utils.runlock import acquire_run_lock

        # re-acquire in case a previous fit() on this trainer released it
        # (re-entrant for our own pid)
        self._release_runlock = acquire_run_lock(self.run_dir,
                                                 jax.process_index())
        # preemption_guard can be injected (tests, external schedulers that
        # signal preemption by other means than SIGTERM)
        guard_cm = getattr(self, "preemption_guard", None) or (
            PreemptionGuard() if self.handle_preemption else _NullGuard())
        with guard_cm as guard:
            return self._fit(epochs, guard)

    def _fit(self, epochs: int, guard):
        # The epoch loop is wrapped so in-flight async checkpoint writes are
        # ALWAYS drained — orbax's force=True save deletes the previously
        # committed dir before the background thread commits the new one, so
        # abandoning a write (exception mid-epoch, KeyboardInterrupt) would
        # leave the run dir with no restorable state.
        try:
            self._fit_epochs(epochs, guard)
        finally:
            from ..io import checkpoint as ckpt_io

            ckpt_io.wait_for_saves()
            if self._tb is not None:
                self._tb.close()
                self._tb = None  # a later fit() lazily recreates the writer
            # run-dir lock: released only after the save drain — a relaunch
            # grabbing it earlier could race the still-committing writes
            self._release_runlock()
        return self

    def _fit_epochs(self, epochs: int, guard):
        base_rng = jax.random.PRNGKey(self.seed + 1)
        flat_epochs = 0
        for epoch in range(self.start_epoch, epochs):
            t0 = time.time()
            if self.on_epoch_start is not None:
                self.on_epoch_start(epoch)
            # epoch-keyed streams (not threaded across epochs): a resumed
            # run reproduces the uninterrupted run's dropout draws and batch
            # order exactly (tests/test_trainer_internals.py exact-resume)
            sampler = getattr(self.train_loader, "sampler", None)
            if sampler is not None and hasattr(sampler, "set_epoch"):
                sampler.set_epoch(epoch)
            epoch_rng = jax.random.fold_in(base_rng, epoch)
            partial = self._partial if epoch == self.start_epoch else None
            self._partial = None
            if self.profile_dir and epoch == min(self.profile_epoch,
                                                 epochs - 1):
                from ..utils.profiling import trace

                with trace(self.profile_dir):
                    train_results, snapshot = self.train_epoch(
                        epoch_rng, partial=partial, guard=guard)
            else:
                train_results, snapshot = self.train_epoch(
                    epoch_rng, partial=partial, guard=guard)
            if train_results is None:  # preempted mid-epoch
                self.save_preempt_checkpoint(epoch, snapshot)
                break
            test_results = self.eval_epoch(guard=guard)
            if test_results is None:
                # preempted during eval: training for this epoch is done —
                # checkpoint it as a FULL partial so resume re-runs only
                # eval/logging, not the trained steps
                self.save_preempt_checkpoint(epoch, snapshot)
                break
            self._append_log("train", epoch, train_results)
            self._append_log("test", epoch, test_results)
            self._print_results(epoch, "train", train_results)
            self._print_results(epoch, "test", test_results)
            if self.log_console:
                print(f"[epoch {epoch}] {time.time() - t0:.1f}s")
            self.save_checkpoint(epoch)
            improved = self.maybe_save_best(epoch, test_results)
            self._clear_preempt_checkpoint()
            flat_epochs = 0 if improved else flat_epochs + 1
            if (self.early_stop_patience > 0
                    and flat_epochs >= self.early_stop_patience):
                if self.log_console:
                    print(f"[epoch {epoch}] early stop: no "
                          f"{self.checkpoint_criterion} improvement in "
                          f"{flat_epochs} epochs")
                break
            if guard.should_stop():  # preempted during eval/checkpointing:
                break                # the completed epoch is already saved

    def plot_logs(self):
        """Training-curve PNGs per head (process 0 only), one panel per logged metric with
        train and test overlaid — full column coverage like the reference's
        plot_train_process_results (reference trainer.py:485-546), which
        drew every logged column, not just loss/UAR."""
        if not self.is_main_process:
            return
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return

        skip = {"epoch", "epoch_seconds", "clips_per_sec"}
        heads = {k.rsplit("_", 1)[0] for k in self.logs}
        for head in heads:
            splits = {s: self.logs.get(f"{head}_{s}", [])
                      for s in ("train", "test")}
            cols = []
            for rows in splits.values():
                for r in rows:
                    for k, v in r.items():
                        if (k not in skip and k not in cols
                                and isinstance(v, (int, float))):
                            cols.append(k)
            if not cols:
                continue
            ncols = min(3, len(cols))
            nrows = -(-len(cols) // ncols)
            fig, axes = plt.subplots(nrows, ncols,
                                     figsize=(5 * ncols, 3.5 * nrows),
                                     squeeze=False)
            for j, col in enumerate(cols):
                ax = axes[j // ncols][j % ncols]
                for split, rows in splits.items():
                    pts = [(r["epoch"], r[col]) for r in rows if col in r]
                    if pts:
                        ax.plot(*zip(*pts), label=split, marker=".")
                ax.set_title(f"{head} {col}")
                ax.set_xlabel("epoch")
                ax.legend()
            for j in range(len(cols), nrows * ncols):
                axes[j // ncols][j % ncols].axis("off")
            fig.tight_layout()
            fig.savefig(os.path.join(self.run_dir, f"{head}_curves.png"))
            plt.close(fig)
