"""Masked multi-head classification losses.

TPU-first replacement for the reference's dynamic-shape loss plumbing:

- `LossesDict.backward()` (reference models.py:225-230) back-propagated one
  loss per head with retain_graph; since all heads share the trunk that is
  mathematically identical to one backward pass over the *sum* of head losses,
  which is what a single `jax.value_and_grad` computes here.
- `MultiModalCrossEntropyLoss` (reference models.py:232-263) filtered
  EMPTY-modality rows by boolean indexing (dynamic shapes).  Here every head
  loss takes a static-shape {0,1} row mask and reduces as
  sum(loss_i * m_i) / max(sum(m_i), 1) — the same value, fixed shapes.
- The focal loss matches the external hub implementation the reference pulls
  at runtime (reference train_multimodal.py:494-510): per-sample
  ce_i = -alpha[y_i] * log p_i[y_i], focal_i = (1 - p_i[y_i])**gamma * ce_i,
  reduction = plain mean.
- `weighted_cross_entropy` matches torch.nn.CrossEntropyLoss(weight=w)
  (mean reduction divides by the summed weights of the targets).
"""

import jax
import jax.numpy as jnp


def _log_softmax_gather(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def cross_entropy(logits, labels, row_mask=None):
    """Mean CE over (optionally masked) rows. logits (N, C), labels (N,)."""
    nll = -_log_softmax_gather(logits, labels)
    if row_mask is None:
        return jnp.mean(nll)
    row_mask = row_mask.astype(nll.dtype)
    return jnp.sum(nll * row_mask) / jnp.maximum(jnp.sum(row_mask), 1.0)


def weighted_cross_entropy(logits, labels, class_weights, row_mask=None):
    """torch CrossEntropyLoss(weight=...) semantics: sum(w_y*nll)/sum(w_y)."""
    nll = -_log_softmax_gather(logits, labels)
    w = jnp.asarray(class_weights)[labels]
    if row_mask is not None:
        w = w * row_mask.astype(w.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def focal_loss(logits, labels, alpha=None, gamma: float = 2.0, row_mask=None):
    """Multi-class focal loss, parity with adeelh/pytorch-multi-class-focal-loss."""
    logp_y = _log_softmax_gather(logits, labels)
    pt = jnp.exp(logp_y)
    ce = -logp_y
    if alpha is not None:
        ce = ce * jnp.asarray(alpha)[labels]
    loss = ((1.0 - pt) ** gamma) * ce
    if row_mask is None:
        return jnp.mean(loss)
    row_mask = row_mask.astype(loss.dtype)
    return jnp.sum(loss * row_mask) / jnp.maximum(jnp.sum(row_mask), 1.0)


def masked_head_loss(head_losses: dict):
    """Total scalar loss from a {head: (loss, valid)} dict.

    `valid` is a 0/1 scalar (1 when the head had any non-EMPTY rows this
    batch); heads with no valid rows contribute zero, mirroring the
    reference's skip of heads whose whole batch is EMPTY.
    """
    total = 0.0
    for loss, valid in head_losses.values():
        total = total + loss * valid
    return total
