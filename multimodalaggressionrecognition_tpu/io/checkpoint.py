"""Orbax-backed checkpointing of TrainState + run metadata.

Single-format replacement for the reference's three coexisting checkpoint
schemes (whole-trainer pickle, per-head state_dicts, model.pt+pkl dir —
reference trainer.py:330-338, 696-707, 1065-1083): one directory per
checkpoint holding the full TrainState pytree (params, mutable model state,
optimizer state, step) plus a JSON metadata sidecar (epoch, best-error
records).  Restore takes the current state as the abstract target, so shapes
and tree structure are validated on load.
"""

import json
import os

import jax
import orbax.checkpoint as ocp


def save_state(path: str, state, meta: dict | None = None):
    path = os.path.abspath(path)
    tree = {"params": state.params, "model_state": state.model_state,
            "opt_state": state.opt_state, "step": state.step}
    if getattr(state, "ema_params", None) is not None:
        tree["ema_params"] = state.ema_params
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), tree, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)


def restore_state(path: str, state):
    path = os.path.abspath(path)
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
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    tree = ckptr.restore(os.path.join(path, "state"), abstract)
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
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return new_state, meta
