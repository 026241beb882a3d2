"""Evaluation metrics (masked, jit-friendly).

Same definitions the reference computes: MSE + R2 over scan points
(/root/reference/src/sps/models/models.py:44-45,67-68, torchmetrics
R2Score) and binary precision/recall/F1/accuracy/dIoU at threshold eps
(/root/reference/src/sps/datasets/util.py:285-299; dIoU =
TP/(TP+FN+FP) — the paper's "uIoU" on the unstable class).
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mse(pred, target, mask):
    w = mask.astype(pred.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(w * (pred - target) ** 2) / n


def masked_r2(pred, target, mask):
    """R2 = 1 - SS_res / SS_tot (torchmetrics R2Score semantics)."""
    w = mask.astype(pred.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean_t = jnp.sum(w * target) / n
    ss_res = jnp.sum(w * (pred - target) ** 2)
    ss_tot = jnp.maximum(jnp.sum(w * (target - mean_t) ** 2), 1e-12)
    return 1.0 - ss_res / ss_tot


def binary_at_threshold(scores, labels, mask, eps: float):
    """Binarize both at eps (>= eps -> 1 'unstable'; models.py:97-98 uses
    `< eps -> 0 else 1`) and return the confusion counts."""
    pred = (scores >= eps) & mask
    gt = (labels >= eps) & mask
    tp = jnp.sum(pred & gt)
    tn = jnp.sum(~pred & ~gt & mask)
    fp = jnp.sum(pred & ~gt)
    fn = jnp.sum(~pred & gt)
    return tp, tn, fp, fn


def classification_metrics(scores, labels, mask, eps: float):
    """Returns dict(precision, recall, f1, accuracy, dIoU) as jnp scalars,
    with the reference's 0-on-empty-denominator convention."""
    tp, tn, fp, fn = binary_at_threshold(scores, labels, mask, eps)
    tp = tp.astype(jnp.float32)
    tn = tn.astype(jnp.float32)
    fp = fp.astype(jnp.float32)
    fn = fn.astype(jnp.float32)

    def safe(num, den):
        return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)

    precision = safe(tp, tp + fp)
    recall = safe(tp, tp + fn)
    f1 = safe(2 * precision * recall, precision + recall)
    accuracy = safe(tp + tn, tp + tn + fp + fn)
    diou = safe(tp, tp + fn + fp)
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "accuracy": accuracy,
        "dIoU": diou,
    }
