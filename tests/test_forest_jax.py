"""On-device forest inference vs the sklearn oracle."""

import numpy as np
import pytest
from sklearn.calibration import CalibratedClassifierCV
from sklearn.ensemble import RandomForestClassifier

from rho_tts_tpu.validation.classifier.forest_jax import convert_forest, predict_proba


def make_dataset(n=300, f=12, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = ((x[:, 0] + 0.5 * x[:, 1] - 0.3 * x[:, 2]) > 0).astype(int)
    return x, y


def test_plain_forest_matches_sklearn():
    x, y = make_dataset()
    rf = RandomForestClassifier(n_estimators=25, max_depth=6, random_state=0)
    rf.fit(x, y)
    arrays = convert_forest(rf)
    assert arrays is not None
    xt, _ = make_dataset(seed=1)
    ours = predict_proba(arrays, xt)
    ref = rf.predict_proba(xt)[:, 1]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_calibrated_forest_matches_sklearn():
    x, y = make_dataset(n=400)
    base = RandomForestClassifier(n_estimators=15, max_depth=5, random_state=0)
    model = CalibratedClassifierCV(base, method="isotonic", cv=3)
    model.fit(x, y)
    arrays = convert_forest(model)
    assert arrays is not None
    xt, _ = make_dataset(n=50, seed=2)
    ours = predict_proba(arrays, xt)
    ref = model.predict_proba(xt)[:, 1]
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_batch_and_single_consistent():
    x, y = make_dataset()
    rf = RandomForestClassifier(n_estimators=10, max_depth=4, random_state=0)
    rf.fit(x, y)
    arrays = convert_forest(rf)
    xt, _ = make_dataset(n=8, seed=3)
    batch = predict_proba(arrays, xt)
    singles = np.array([predict_proba(arrays, xt[i])[0] for i in range(8)])
    np.testing.assert_allclose(batch, singles, atol=1e-6)


def test_unsupported_model_returns_none():
    from sklearn.linear_model import LogisticRegression

    x, y = make_dataset(n=50)
    lr = LogisticRegression().fit(x, y)
    assert convert_forest(lr) is None
