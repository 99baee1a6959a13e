"""Drift classifier cache-key semantics (voice_id vs explicit path)."""

import numpy as np
import pytest

from rho_tts_tpu.validation import classifier as clf


@pytest.fixture(autouse=True)
def fresh_cache():
    clf.clear_cache()
    yield
    clf.clear_cache()


def make_model_file(path, threshold=0.33):
    import joblib
    from sklearn.ensemble import RandomForestClassifier

    rng = np.random.default_rng(0)
    x = rng.standard_normal((30, 286))
    y = (x[:, 0] > 0).astype(int)
    rf = RandomForestClassifier(n_estimators=3, max_depth=3).fit(x, y)
    joblib.dump({"model": rf, "optimal_threshold": threshold}, path)
    return str(path)


def test_explicit_path_and_voice_id_use_distinct_cache_keys(tmp_path, monkeypatch):
    p1 = make_model_file(tmp_path / "a.pkl", threshold=0.11)
    # voice store lookup for this voice resolves to a second model
    p2 = make_model_file(tmp_path / "b.pkl", threshold=0.22)
    monkeypatch.setattr(clf, "get_model_path", lambda vid: p2)

    clf._load_model(model_path=p1)
    clf._load_model(voice_id="voiceX")
    assert p1 in clf._models
    assert "voiceX" in clf._models
    assert clf._thresholds[p1] == pytest.approx(0.11)
    assert clf._thresholds["voiceX"] == pytest.approx(0.22)


def test_missing_per_voice_model_is_silent():
    prob = clf.predict_accent_drift_probability(
        np.zeros(16000, np.float32), sample_rate=16000, voice_id="missing-voice"
    )
    assert prob is None


def test_env_var_model_lookup(tmp_path, monkeypatch):
    p = make_model_file(tmp_path / "envmodel.pkl", threshold=0.44)
    monkeypatch.setenv(clf.ENV_MODEL_VAR, p)
    assert clf.get_optimal_threshold() == pytest.approx(0.44)


def test_raw_model_pickle_uses_default_threshold(tmp_path):
    import joblib
    from sklearn.ensemble import RandomForestClassifier

    rng = np.random.default_rng(1)
    x = rng.standard_normal((30, 286))
    y = (x[:, 0] > 0).astype(int)
    rf = RandomForestClassifier(n_estimators=3, max_depth=3).fit(x, y)
    p = str(tmp_path / "raw.pkl")
    joblib.dump(rf, p)  # bare model, no metadata dict
    clf._load_model(model_path=p)
    assert clf._thresholds[p] == pytest.approx(0.18)
