"""Orbax-backed checkpointing of TrainState + run metadata.

Single-format replacement for the reference's three coexisting checkpoint
schemes (whole-trainer pickle, per-head state_dicts, model.pt+pkl dir —
reference trainer.py:330-338, 696-707, 1065-1083): one directory per
checkpoint holding the full TrainState pytree (params, mutable model state,
optimizer state, step) plus a JSON metadata sidecar (epoch, best-error
records, ema decay).  Restore takes the current state as the abstract
target, so shapes and tree structure are validated on load; when only the
OPTIMIZER structure differs (e.g. a checkpoint trained with an LR schedule
restored into a plain-Adam template, or vice versa), restore falls back to
a target-free load of the model tensors and reinitializes the optimizer
state — the model must match, the optimizer may be rebuilt.
"""

import json
import os

import jax
import orbax.checkpoint as ocp


def _load_meta(path: str) -> dict:
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


# In-flight async saves, path -> checkpointer.  ocp.StandardCheckpointer IS
# an AsyncCheckpointer: save() returns once the arrays are copied to host
# and the serialization/write continues on a background thread, so a
# per-epoch checkpoint can overlap the next epoch's device compute.
_inflight: dict = {}


def _barrier(tag: str):
    """Cross-process sync after a checkpoint wait.  On a non-primary
    process `wait_until_finished` only covers that process's own commit
    thread — the primary's finalize (tmp-dir -> final rename) may still be
    running, and orbax's tmp-dir name is deterministic, so starting the
    next save to the same item without this barrier writes into the
    previous save's tmp dir mid-rename (ArrayMetadata count mismatch)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _wait_path(path: str):
    ckptr = _inflight.pop(path, None)
    if ckptr is not None:
        ckptr.wait_until_finished()
        _barrier(f"mar_ckpt_async_done:{path}")


def wait_for_saves():
    """Block until every deferred `save_state(..., block=False)` has hit
    disk.  Call before process exit (the Trainer does) — a background write
    abandoned at interpreter teardown leaves only the orbax tmp dir."""
    for path in list(_inflight):
        _wait_path(path)


def save_state(path: str, state, meta: dict | None = None,
               block: bool = True):
    """Checkpoint `state` under `path`.  With block=False the write is
    asynchronous: arrays are snapshotted to host before returning (later
    train-step donations cannot corrupt the save), the disk write runs in
    the background, and readers/re-writers of the same path wait via
    `_wait_path` — restore_state/restore_variables/save_state all do."""
    path = os.path.abspath(path)
    tree = {"params": state.params, "model_state": state.model_state,
            "opt_state": state.opt_state, "step": state.step}
    meta = dict(meta or {})
    if getattr(state, "ema_params", None) is not None:
        tree["ema_params"] = state.ema_params
        # record the decay so a resume that forgets --ema_decay still keeps
        # updating (not silently destroying) the restored shadow
        meta.setdefault("ema_decay", float(getattr(state, "ema_decay", 0.0)))
    if jax.process_count() > 1:
        # Multi-process saves synchronize through a coordination-service
        # barrier orbax names after the ITEM ("_async_write_complete.state"),
        # not the path — two in-flight async saves to different directories
        # (checkpoint_current + checkpoint_best) collide with
        # FAILED_PRECONDITION: Barrier ... already ongoing.  Serialize across
        # all paths; the newest save still overlaps the next epoch's compute.
        wait_for_saves()
    else:
        _wait_path(path)  # never overlap two writes to the same directory
    ckptr = ocp.StandardCheckpointer()
    # collective in multi-process runs: every process calls save (orbax
    # gathers the shards it owns); the side meta.json is process-0's
    ckptr.save(os.path.join(path, "state"), tree, force=True)
    if block:
        ckptr.wait_until_finished()
        _barrier(f"mar_ckpt_save_done:{path}")
    else:
        _inflight[path] = ckptr
    if jax.process_index() == 0:
        # an async save may still be creating `path` on its background
        # thread — the sidecar write must not race that mkdir
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)


def restore_state(path: str, state, mesh=None):
    """Restore `state` from `path`.  With `mesh`, every leaf is restored
    REPLICATED over that mesh (NamedSharding(mesh, P())) instead of with
    the template's placement: a freshly-initialized template is committed
    to one device, and restoring that placement into a sharded training
    step raises 'incompatible devices' — the mesh-replicated layout is
    what the jitted DP step expects."""
    path = os.path.abspath(path)
    _wait_path(path)  # finish any deferred save of this checkpoint first
    meta = _load_meta(path)
    target = {"params": state.params, "model_state": state.model_state,
              "opt_state": state.opt_state, "step": state.step}
    if getattr(state, "ema_params", None) is not None:
        target["ema_params"] = state.ema_params
    ckptr = ocp.StandardCheckpointer()
    # Orbax requires the abstract target to match the on-disk structure, and
    # the EMA shadow is optional on both sides: an EMA checkpoint must load
    # into a non-EMA template (predict/evaluate build plain states) and vice
    # versa (resuming an old run with --ema_decay newly enabled).
    meta_tree = ckptr.metadata(os.path.join(path, "state")).item_metadata.tree
    disk_keys = set(meta_tree.keys())
    if "ema_params" in disk_keys and "ema_params" not in target:
        target["ema_params"] = state.params  # same structure as params
    elif "ema_params" not in disk_keys and "ema_params" in target:
        del target["ema_params"]
    def _abstract(x):
        s = ocp.utils.to_shape_dtype_struct(x)
        # python scalars (e.g. a step counter) pass through unchanged
        if mesh is not None and hasattr(s, "shape") and hasattr(s, "dtype"):
            from jax.sharding import NamedSharding, PartitionSpec

            s = jax.ShapeDtypeStruct(
                s.shape, s.dtype,
                sharding=NamedSharding(mesh, PartitionSpec()))
        return s

    abstract = jax.tree.map(_abstract, target)
    fresh_opt = False
    try:
        tree = ckptr.restore(os.path.join(path, "state"), abstract)
    except ValueError:
        # optimizer-structure mismatch (different schedule/transform chain):
        # load target-free, keep the template's freshly initialized opt_state
        tree = dict(ckptr.restore(os.path.join(path, "state")))
        tree["opt_state"] = state.opt_state
        fresh_opt = True
        # Only the OPTIMIZER may mismatch on this path.  A params /
        # model_state structure difference means the checkpoint is for a
        # different model — letting it through would defer the failure to a
        # confusing apply-time error with mismatched tensors loaded.
        for part in ("params", "model_state"):
            want = jax.tree.structure(target[part])
            got = jax.tree.structure(tree.get(part))
            if want != got:
                raise ValueError(
                    f"checkpoint {path!r} has a different {part} structure "
                    f"than the model being restored into (template "
                    f"{want}, on disk {got}); wrong checkpoint/model pair?")
    ema = tree.get("ema_params")
    if ema is None and getattr(state, "ema_params", None) is not None:
        # EMA newly enabled on a non-EMA checkpoint: seed from restored
        # params (real copies — both trees are donated by the train step)
        import jax.numpy as jnp

        ema = jax.tree.map(jnp.copy, tree["params"])
    new_state = state.replace(params=tree["params"],
                              model_state=tree["model_state"],
                              opt_state=tree["opt_state"],
                              step=tree["step"],
                              ema_params=ema)
    if (ema is not None and getattr(state, "ema_decay", 0.0) == 0.0
            and meta.get("ema_decay", 0.0) > 0.0):
        # resume that forgot --ema_decay: keep tracking with the saved decay
        # instead of letting the first apply_gradients overwrite the shadow
        new_state = new_state.replace(ema_decay=float(meta["ema_decay"]))
    if fresh_opt:
        meta = dict(meta, optimizer_state="reinitialized (structure mismatch)")
    return new_state, meta


def restore_variables(path: str):
    """Inference-grade restore: no TrainState template, no optimizer
    coupling.  Returns (variables, meta) where variables = {'params': the
    EMA shadow when tracked else live params, **model_state} — ready for
    `model.apply` / `serve.Predictor`."""
    path = os.path.abspath(path)
    _wait_path(path)
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.join(path, "state"))
    params = tree["ema_params"] if tree.get("ema_params") is not None \
        else tree["params"]
    variables = {"params": params, **dict(tree.get("model_state") or {})}
    return variables, _load_meta(path)
