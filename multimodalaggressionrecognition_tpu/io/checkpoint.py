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
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.join(path, "state"), abstract)
    new_state = state.replace(params=tree["params"],
                              model_state=tree["model_state"],
                              opt_state=tree["opt_state"],
                              step=tree["step"])
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return new_state, meta
