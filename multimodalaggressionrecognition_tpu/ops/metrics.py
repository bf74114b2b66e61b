"""On-device metric accumulation.

The reference concatenated every batch's argmax predictions on the host and
ran sklearn at epoch end (reference trainer.py:235-286, metric set at
train_multimodal.py:547-556: accuracy, per-class precision/recall/F1 and the
macro averages under the names UAR/UAP/UAF1).  Here the per-batch sufficient
statistic is a CxC confusion matrix accumulated *on device* (one one-hot
matmul per batch, psum-able across a data-parallel mesh); epoch metrics are
derived from the summed matrix and agree with the sklearn values
(zero_division=0 semantics).
"""

import jax.numpy as jnp
import numpy as np


def confusion_matrix(preds, labels, num_classes: int, row_mask=None):
    """(C, C) confusion matrix, rows = true class, cols = predicted class."""
    true_oh = jnp.eye(num_classes, dtype=jnp.float32)[labels]
    pred_oh = jnp.eye(num_classes, dtype=jnp.float32)[preds]
    if row_mask is not None:
        true_oh = true_oh * row_mask.astype(jnp.float32)[:, None]
    return jnp.matmul(true_oh.T, pred_oh, preferred_element_type=jnp.float32)


def metrics_from_confusion(cm):
    """Derive the reference's logged metric dict from a confusion matrix.

    Returns {'accuracy', 'precision' (per-class array), 'recall', 'f1',
    'UAR', 'UAP', 'UAF1'} as numpy values.
    """
    cm = np.asarray(cm, dtype=np.float64)
    total = cm.sum()
    tp = np.diag(cm)
    pred_count = cm.sum(axis=0)
    true_count = cm.sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(pred_count > 0, tp / pred_count, 0.0)
        recall = np.where(true_count > 0, tp / true_count, 0.0)
        denom = precision + recall
        f1 = np.where(denom > 0, 2 * precision * recall / denom, 0.0)
    accuracy = tp.sum() / total if total > 0 else 0.0
    return {
        "accuracy": accuracy,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "UAR": recall.mean(),
        "UAP": precision.mean(),
        "UAF1": f1.mean(),
    }
