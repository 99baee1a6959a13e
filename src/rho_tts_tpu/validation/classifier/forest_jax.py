"""Random-forest inference as vectorized XLA gathers.

Converts a fitted sklearn forest (optionally isotonic-calibrated) into
flat arrays — per-tree node tables padded to a common size — and evaluates
trees × samples in one jitted program: a fixed-depth traversal loop of
gathers, then a mean over trees and a piecewise-linear calibration lookup.

This lets the drift gate score whole validation batches on TPU alongside
generation; the sklearn path remains for training and as the oracle.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

ForestArrays = Dict[str, Any]


def convert_forest(model) -> Optional[ForestArrays]:
    """Extract array form from a RandomForestClassifier or a
    CalibratedClassifierCV wrapping one. Returns None when unsupported."""
    calibrators = []
    forests = []

    cls_name = type(model).__name__
    if cls_name == "CalibratedClassifierCV":
        for cc in model.calibrated_classifiers_:
            est = getattr(cc, "estimator", None)
            if est is None or type(est).__name__ != "RandomForestClassifier":
                return None
            forests.append(est)
            # Per-fold calibrator for the positive class (binary case)
            cal = cc.calibrators[-1]
            if type(cal).__name__ != "IsotonicRegression":
                return None
            calibrators.append(
                (np.asarray(cal.X_thresholds_), np.asarray(cal.y_thresholds_))
            )
    elif cls_name == "RandomForestClassifier":
        forests.append(model)
    else:
        return None

    trees = [t.tree_ for f in forests for t in f.estimators_]
    if not trees:
        return None
    max_nodes = max(t.node_count for t in trees)
    n_trees = len(trees)

    left = np.full((n_trees, max_nodes), -1, np.int32)
    right = np.full((n_trees, max_nodes), -1, np.int32)
    feature = np.zeros((n_trees, max_nodes), np.int32)
    threshold = np.zeros((n_trees, max_nodes), np.float32)
    leaf_p1 = np.zeros((n_trees, max_nodes), np.float32)
    max_depth = 1

    for i, t in enumerate(trees):
        n = t.node_count
        left[i, :n] = t.children_left
        right[i, :n] = t.children_right
        feature[i, :n] = np.maximum(t.feature, 0)
        threshold[i, :n] = t.threshold
        counts = t.value[:, 0, :]  # (nodes, classes)
        totals = counts.sum(axis=1, keepdims=True)
        probs = counts / np.maximum(totals, 1e-12)
        leaf_p1[i, :n] = probs[:, 1] if probs.shape[1] > 1 else 0.0
        max_depth = max(max_depth, int(t.max_depth))

    # Per-fold membership of trees (calibration averages fold outputs)
    fold_sizes = [len(f.estimators_) for f in forests]
    fold_id = np.concatenate(
        [np.full(sz, i, np.int32) for i, sz in enumerate(fold_sizes)]
    )

    out: ForestArrays = {
        "left": jnp.asarray(left),
        "right": jnp.asarray(right),
        "feature": jnp.asarray(feature),
        "threshold": jnp.asarray(threshold),
        "leaf_p1": jnp.asarray(leaf_p1),
        "fold_id": jnp.asarray(fold_id),
        "n_folds": len(forests),
        "max_depth": max_depth,
    }
    if calibrators:
        cal_len = max(x.shape[0] for x, _ in calibrators)
        cal_x = np.stack(
            [np.pad(x, (0, cal_len - x.shape[0]), mode="edge") for x, _ in calibrators]
        )
        cal_y = np.stack(
            [np.pad(y, (0, cal_len - y.shape[0]), mode="edge") for _, y in calibrators]
        )
        out["cal_x"] = jnp.asarray(cal_x, jnp.float32)
        out["cal_y"] = jnp.asarray(cal_y, jnp.float32)
    return out


@partial(jax.jit, static_argnames=("max_depth", "n_folds"))
def _forest_proba(
    left, right, feature, threshold, leaf_p1, fold_id,
    x: jnp.ndarray,  # (B, F)
    max_depth: int,
    n_folds: int,
    cal_x=None,
    cal_y=None,
):
    n_trees = left.shape[0]
    b = x.shape[0]

    node = jnp.zeros((n_trees, b), jnp.int32)
    tree_idx = jnp.arange(n_trees)[:, None]

    for _ in range(max_depth + 1):
        feat = feature[tree_idx, node]  # (T, B)
        thr = threshold[tree_idx, node]
        go_left = x.T[feat, jnp.arange(b)[None, :]] <= thr
        l = left[tree_idx, node]
        r = right[tree_idx, node]
        nxt = jnp.where(go_left, l, r)
        node = jnp.where(l == -1, node, nxt)  # leaves stay put

    p1 = leaf_p1[tree_idx, node]  # (T, B)

    if cal_x is None:
        return jnp.mean(p1, axis=0)

    # Average trees per fold, calibrate per fold, then average folds
    fold_sum = jax.ops.segment_sum(p1, fold_id, num_segments=n_folds)
    fold_cnt = jax.ops.segment_sum(jnp.ones((p1.shape[0], 1)), fold_id, num_segments=n_folds)
    fold_mean = fold_sum / jnp.maximum(fold_cnt, 1.0)  # (folds, B)

    def interp_fold(args):
        xs, ys, vals = args
        return jnp.interp(vals, xs, ys)

    calibrated = jax.vmap(lambda xs, ys, vals: jnp.interp(vals, xs, ys))(
        cal_x, cal_y, fold_mean
    )
    return jnp.mean(calibrated, axis=0)


def predict_proba(arrays: ForestArrays, features: np.ndarray) -> np.ndarray:
    """P(class 1) for a batch of feature vectors, computed on device."""
    x = jnp.asarray(np.atleast_2d(features), jnp.float32)
    return np.asarray(
        _forest_proba(
            arrays["left"],
            arrays["right"],
            arrays["feature"],
            arrays["threshold"],
            arrays["leaf_p1"],
            arrays["fold_id"],
            x,
            arrays["max_depth"],
            arrays["n_folds"],
            arrays.get("cal_x"),
            arrays.get("cal_y"),
        )
    )
