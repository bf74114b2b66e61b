"""Training state pytree (params + mutable model state + optimizer state)."""

from typing import Any

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: int
    params: Any
    model_state: Any          # e.g. {'batch_stats': ...}; {} when none
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )


def create_train_state(model, sample_batch, tx, rng=None, train: bool = True):
    """Initialize variables from one (host) sample batch and wrap in TrainState."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    variables = model.init({"params": rng, "dropout": rng}, sample_batch,
                           train=False)
    params = variables.pop("params")
    model_state = dict(variables)
    return TrainState(step=0, params=params, model_state=model_state,
                      opt_state=tx.init(params), tx=tx)
