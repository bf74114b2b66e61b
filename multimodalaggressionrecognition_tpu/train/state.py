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
    # Optional exponential moving average of params (None = off). Updated
    # inside apply_gradients so every train-step variant gets it for free;
    # eval/serving prefer it when present (eval_params).
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)
    # With gradient accumulation (optax.MultiSteps every_k), params only
    # move every k-th micro-step; decaying the EMA on every micro-step
    # would compound to decay^k per real update. Set to k so the shadow
    # decays exactly once per optimizer update.
    ema_update_every: int = struct.field(pytree_node=False, default=1)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            import jax.numpy as jnp

            d = self.ema_decay
            k = self.ema_update_every
            do = ((self.step + 1) % k == 0) if k > 1 else True
            new_ema = jax.tree.map(
                lambda e, p: jnp.where(do, d * e + (1.0 - d) * p, e),
                new_ema, new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )

    @property
    def eval_params(self):
        """Params to evaluate/serve with: the EMA shadow when tracked."""
        return self.params if self.ema_params is None else self.ema_params


def create_train_state(model, sample_batch, tx, rng=None, train: bool = True,
                       ema_decay: float = 0.0, ema_update_every: int = 1):
    """Initialize variables from one (host) sample batch and wrap in TrainState."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    # jitted init: one compiled program instead of thousands of eager op
    # dispatches (the Swin tower's eager init costs ~30s on CPU), and the
    # persistent compilation cache makes process restarts a disk hit
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": rng, "dropout": rng}, sample_batch, train=False)
    params = variables.pop("params")
    model_state = dict(variables)
    # real copies, not aliases: params and ema_params are both donated by
    # the train step, and aliased buffers would be donated twice
    import jax.numpy as jnp

    ema = jax.tree.map(jnp.copy, params) if ema_decay > 0 else None
    return TrainState(step=0, params=params, model_state=model_state,
                      opt_state=tx.init(params), tx=tx,
                      ema_params=ema, ema_decay=ema_decay,
                      ema_update_every=max(int(ema_update_every), 1))
