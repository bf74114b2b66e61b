"""Jit-compiled train/eval steps.

One `value_and_grad` over the sum of per-head masked losses replaces the
reference's per-head `loss.backward(retain_graph=True)` chain (reference
models.py:225-230, trainer.py:110-163) — identical gradients through the
shared trunk, one backward pass.  Per-batch metrics are confusion matrices
accumulated on device; only the tiny (C, C) matrices and scalar losses cross
back to the host (the reference synced full argmax arrays every batch,
trainer.py:165-171).

Batch layout (data/avabos.py `build_batch`):
  {'modalities': {m: {'data', 'present'}}, 'labels': {head: (B,)},
   'label_mask': {head: (B,)}, 'sample_mask': (B,)}

EMPTY protocol: heads whose `label_mask` is all zero contribute zero loss
(masked mean), mirroring the reference's skip of all-EMPTY heads
(models.py:249-258, trainer.py:888-914).
"""

from dataclasses import dataclass
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import losses as L
from ..ops.metrics import confusion_matrix
from ..utils.precision import cast_floating, resolve_dtype


@dataclass(frozen=True)
class LossSpec:
    kind: str = "ce"  # 'ce' | 'weighted_ce' | 'focal'
    class_weights: Optional[tuple] = None
    gamma: float = 2.0

    def __call__(self, logits, labels, row_mask):
        if self.kind == "ce":
            return L.cross_entropy(logits, labels, row_mask)
        if self.kind == "weighted_ce":
            return L.weighted_cross_entropy(
                logits, labels, jnp.asarray(self.class_weights), row_mask)
        if self.kind == "focal":
            alpha = (jnp.asarray(self.class_weights)
                     if self.class_weights is not None else None)
            return L.focal_loss(logits, labels, alpha=alpha, gamma=self.gamma,
                                row_mask=row_mask)
        raise ValueError(f"unknown loss kind {self.kind!r}")


class SingleHeadAdapter(nn.Module):
    """Wraps a single-input/single-logits model into the batch-dict protocol."""

    inner: nn.Module
    modality: str
    head: str = "main"

    @nn.compact
    def __call__(self, modalities, train: bool = False):
        return {self.head: self.inner(modalities[self.modality]["data"],
                                      train=train)}


def _head_losses_and_metrics(outputs, batch, loss_specs, num_classes):
    total = 0.0
    metrics = {}
    for head, logits in outputs.items():
        if head not in batch["labels"]:
            continue
        logits = logits.astype(jnp.float32)  # losses/softmax always in f32
        labels = batch["labels"][head]
        mask = batch["label_mask"][head]
        valid = jnp.sum(mask)
        loss = loss_specs[head](logits, labels, mask)
        loss = jnp.where(valid > 0, loss, 0.0)
        total = total + loss
        preds = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(preds, labels, num_classes, row_mask=mask)
        metrics[head] = {"loss": loss, "valid": valid, "confusion": cm}
    return total, metrics


def make_train_step(model, loss_specs: Dict[str, LossSpec], num_classes: int,
                    donate: bool = True, compute_dtype=None):
    """Returns jitted step(state, batch, rng) -> (state, metrics).

    compute_dtype: None/'float32' for full precision, or 'bfloat16' for
    mixed precision — master params and optimizer state stay f32; params and
    modality activations are cast to bf16 inside the step (MXU-native, f32
    accumulation inside every matmul/conv); losses, metrics, gradients, and
    BatchNorm running statistics remain f32.  The reference is f32-only;
    this is a TPU-native addition.
    """
    compute_dtype = resolve_dtype(compute_dtype)

    def step(state, batch, rng):
        if compute_dtype is not None:
            batch = dict(batch,
                         modalities=cast_floating(batch["modalities"],
                                                  compute_dtype))

        def loss_fn(params):
            if compute_dtype is not None:
                params = cast_floating(params, compute_dtype)
            variables = {"params": params, **state.model_state}
            mutable = list(state.model_state.keys())
            if mutable:
                outputs, new_model_state = model.apply(
                    variables, batch["modalities"], train=True,
                    rngs={"dropout": rng}, mutable=mutable)
            else:
                outputs = model.apply(variables, batch["modalities"],
                                      train=True, rngs={"dropout": rng})
                new_model_state = {}
            total, metrics = _head_losses_and_metrics(
                outputs, batch, loss_specs, num_classes)
            return total, (metrics, new_model_state)

        (total, (metrics, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        if new_model_state:
            state = state.replace(model_state=dict(new_model_state))
        metrics["total_loss"] = total
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, loss_specs: Dict[str, LossSpec], num_classes: int,
                   compute_dtype=None):
    compute_dtype = resolve_dtype(compute_dtype)

    def step(state, batch):
        params = state.eval_params  # EMA shadow when tracked, else live params
        modalities = batch["modalities"]
        if compute_dtype is not None:
            params = cast_floating(params, compute_dtype)
            modalities = cast_floating(modalities, compute_dtype)
        variables = {"params": params, **state.model_state}
        outputs = model.apply(variables, modalities, train=False)
        total, metrics = _head_losses_and_metrics(
            outputs, batch, loss_specs, num_classes)
        metrics["total_loss"] = total
        return metrics

    return jax.jit(step)
