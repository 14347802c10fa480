"""Binary-classification figures of merit, fully on-device.

Capability parity: reference ``metrics/binary_classification.py``. The
reference loops 200 thresholds in Python; here the whole threshold sweep is
one vectorized [T]-shaped computation and the ROC-AUC is a sort-based
trapezoid — everything jittable so EC validation metrics never leave the
device.
"""

from __future__ import annotations

import functools
from typing import Iterable

import jax
import jax.numpy as jnp


def _zero_divide(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.where(b == 0, 0.0, a / jnp.where(b == 0, 1.0, b))


@functools.partial(jax.jit, static_argnames=())
def binary_classification_counts(
    output: jax.Array,
    y: jax.Array,
    thld: jax.Array,
    mask: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Confusion-matrix counts at threshold(s). ``thld`` may be scalar or
    [T]-shaped; counts broadcast accordingly."""
    y = y.astype(bool)
    thld = jnp.atleast_1d(jnp.asarray(thld))
    pred_true = output[None, :] >= thld[:, None]
    true = y[None, :]
    if mask is not None:
        m = mask[None, :]
    else:
        m = jnp.ones_like(true)
    tp = jnp.sum(true & pred_true & m, axis=1).astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    tn = jnp.sum(~true & ~pred_true & m, axis=1).astype(tp.dtype)
    fp = jnp.sum(~true & pred_true & m, axis=1).astype(tp.dtype)
    fn = jnp.sum(true & ~pred_true & m, axis=1).astype(tp.dtype)
    return {"TP": tp, "TN": tn, "FP": fp, "FN": fn}


def stats_from_counts(c: dict[str, jax.Array]) -> dict[str, jax.Array]:
    tp, tn, fp, fn = c["TP"], c["TN"], c["FP"], c["FN"]
    tpr = _zero_divide(tp, tp + fn)
    tnr = _zero_divide(tn, tn + fp)
    mcc_den = jnp.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return {
        "acc": _zero_divide(tp + tn, tp + tn + fp + fn),
        "TPR": tpr,
        "TNR": tnr,
        "FPR": _zero_divide(fp, fp + tn),
        "FNR": _zero_divide(fn, fn + tp),
        "balanced_acc": (tpr + tnr) / 2,
        "F1": _zero_divide(2 * tp, 2 * tp + fp + fn),
        "MCC": _zero_divide(tp * tn - fp * fn, mcc_den),
    }


class BinaryClassificationStats:
    """Threshold-based confusion metrics (reference
    ``binary_classification.py:14-137``). Computes all counts in one pass."""

    def __init__(self, output, y, thld, mask=None):
        output = jnp.asarray(output)
        y_arr = jnp.asarray(y).astype(bool)
        counts = binary_classification_counts(output, y_arr, thld, mask)
        self._counts = {k: float(v[0]) for k, v in counts.items()}
        self._stats = {
            k: float(v[0]) for k, v in stats_from_counts(counts).items()
        }
        if mask is None:
            mask = jnp.ones_like(y_arr)
        self.n_true = float((y_arr & mask).sum())
        self.n_false = float((~y_arr & mask).sum())
        self.n_predicted_true = self._counts["TP"] + self._counts["FP"]
        self.n_predicted_false = self._counts["TN"] + self._counts["FN"]

    def __getattr__(self, name):
        stats = object.__getattribute__(self, "_stats")
        if name in stats:
            return stats[name]
        counts = object.__getattribute__(self, "_counts")
        if name in counts:
            return counts[name]
        raise AttributeError(name)

    def get_all(self) -> dict[str, float]:
        out = dict(self._stats)
        out.update(
            n_true=self.n_true,
            n_false=self.n_false,
            n_predicted_true=self.n_predicted_true,
            n_predicted_false=self.n_predicted_false,
        )
        return out


@functools.partial(jax.jit, static_argnames=("n_samples",))
def _maximized_bcs(output, y, mask, n_samples: int):
    thlds = jnp.linspace(0.0, 1.0, n_samples)
    counts = binary_classification_counts(output, y, thlds, mask)
    stats = stats_from_counts(counts)
    r_diff = jnp.abs(stats["TPR"] - stats["TNR"])
    min_diff_idx = jnp.argmin(r_diff)
    out = {}
    for key, vals in [("max_ba", stats["balanced_acc"]), ("max_f1", stats["F1"]), ("max_mcc", stats["MCC"])]:
        max_idx = jnp.argmax(vals)
        out[key] = vals[max_idx]
        out[f"{key}_loc"] = thlds[max_idx]
    out["tpr_eq_tnr"] = (stats["TPR"][min_diff_idx] + stats["TNR"][min_diff_idx]) / 2
    out["tpr_eq_tnr_loc"] = thlds[min_diff_idx]
    return out


def get_maximized_bcs(*, output, y, mask=None, n_samples: int = 200) -> dict[str, float]:
    """Best achievable BA/F1/MCC over a threshold sweep + TPR=TNR point
    (reference ``binary_classification.py:147-195``) — one vectorized pass."""
    return {k: float(v) for k, v in _maximized_bcs(output, y, mask, n_samples).items()}


@functools.partial(jax.jit, static_argnames=())
def _roc_curve(y_score, y_true, mask):
    """ROC curve points sorted by descending score (ties collapsed by using
    cumulative counts at score boundaries)."""
    order = jnp.argsort(-y_score)
    y_sorted = y_true[order].astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    m_sorted = mask[order].astype(y_sorted.dtype)
    score_sorted = y_score[order]
    tps = jnp.cumsum(y_sorted * m_sorted)
    fps = jnp.cumsum((1 - y_sorted) * m_sorted)
    # collapse ties: only keep points where the next score differs
    is_last_of_tie = jnp.concatenate(
        [score_sorted[1:] != score_sorted[:-1], jnp.ones((1,), dtype=bool)]
    )
    valid = is_last_of_tie
    n_pos = jnp.sum(y_sorted * m_sorted)
    n_neg = jnp.sum((1 - y_sorted) * m_sorted)
    tpr = jnp.where(valid, tps, 0.0) / jnp.maximum(n_pos, 1)
    fpr = jnp.where(valid, fps, 0.0) / jnp.maximum(n_neg, 1)
    return fpr, tpr, valid, n_pos, n_neg


def roc_auc_score(
    *, y_true, y_score, max_fpr: float | None = None, mask=None
) -> float:
    """Sort-based ROC AUC with optional McClish-standardized partial AUC
    (reference wraps torchmetrics ``BinaryAUROC`` —
    ``binary_classification.py:198-214``). Returns NaN when only one class is
    present."""
    y_true = jnp.asarray(y_true)
    y_score = jnp.asarray(y_score)
    if mask is None:
        mask = jnp.ones_like(y_true, dtype=bool)
    # push masked entries to the end of the sort with score -inf and mask 0
    y_score = jnp.where(mask, y_score, -jnp.inf)
    fpr, tpr, valid, n_pos, n_neg = _roc_curve(y_score, y_true, mask)
    if float(n_pos) == 0 or float(n_neg) == 0:
        return float("nan")
    fpr = np_sorted = jnp.where(valid, fpr, jnp.inf)
    order = jnp.argsort(fpr)
    fpr_s = fpr[order]
    tpr_s = tpr[order]
    v = jnp.isfinite(fpr_s)
    fpr_full = jnp.concatenate([jnp.zeros((1,)), jnp.where(v, fpr_s, 1.0)])
    tpr_full = jnp.concatenate([jnp.zeros((1,)), jnp.where(v, tpr_s, 1.0)])
    if max_fpr is None or max_fpr == 1.0:
        auc = jnp.trapezoid(tpr_full, fpr_full)
        return float(auc)
    # partial AUC up to max_fpr with linear interpolation at the cut
    cut = jnp.asarray(max_fpr)
    below = fpr_full <= cut
    # interpolated tpr at cut
    idx = jnp.clip(jnp.searchsorted(fpr_full, cut), 1, fpr_full.shape[0] - 1)
    f0, f1 = fpr_full[idx - 1], fpr_full[idx]
    t0, t1 = tpr_full[idx - 1], tpr_full[idx]
    t_cut = jnp.where(f1 > f0, t0 + (t1 - t0) * (cut - f0) / (f1 - f0), t0)
    fpr_c = jnp.where(below, fpr_full, cut)
    tpr_c = jnp.where(below, tpr_full, t_cut)
    order2 = jnp.argsort(fpr_c)
    pauc = jnp.trapezoid(tpr_c[order2], fpr_c[order2])
    # McClish standardization (matches sklearn/torchmetrics)
    min_area = 0.5 * max_fpr**2
    max_area = max_fpr
    return float(0.5 * (1 + (pauc - min_area) / (max_area - min_area)))


def get_roc_auc_scores(true, predicted, max_fprs: Iterable[float | None], mask=None):
    """ROC AUC at several max-FPR working points
    (reference ``binary_classification.py:217-230``)."""
    metrics = {}
    for max_fpr in max_fprs:
        key = "roc_auc" if max_fpr is None else f"roc_auc_{max_fpr}FPR"
        metrics[key] = roc_auc_score(
            y_true=true, y_score=predicted, max_fpr=max_fpr, mask=mask
        )
    return metrics
