"""Drift-classifier trainer: TPU feature extraction + host-side forest fit.

Feature vector (286-d, format-compatible with the reference so datasets
transfer): 256-d speaker embedding, 13 MFCC means, 13 MFCC stds, F0
mean/std over voiced frames, and F1/F2 formants. Features are extracted by
the XLA pipeline (``ops.features`` + ``models.speaker``); the
cost-sensitive RandomForest + isotonic calibration + threshold sweep runs
on host (tiny data, sklearn).

Capability parity: reference ``validation/classifier/trainer.py:23-284``
(features :23-96, cost-weighted fit :208-230, threshold sweep :236-249,
metadata pickle :256-267, CLI :273-284).

CLI::

    python -m rho_tts_tpu.validation.classifier.trainer --dataset-dir DIR
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Optional, Union

import numpy as np

logger = logging.getLogger(__name__)

# Lazy singleton speaker encoder (shared with similarity validation)
_encoder = None


def _get_encoder():
    global _encoder
    if _encoder is None:
        from ...models.speaker import SpeakerEncoder

        _encoder = SpeakerEncoder()
    return _encoder


def _load_audio(audio, sample_rate: Optional[int]):
    if isinstance(audio, str):
        from ...audio_io import load_wav

        return load_wav(audio)
    if sample_rate is None:
        raise ValueError("sample_rate is required for in-memory audio")
    return np.asarray(audio, np.float32).reshape(-1), int(sample_rate)


def extract_features(
    audio: Union[str, np.ndarray, object],
    sample_rate: Optional[int] = None,
) -> Optional[np.ndarray]:
    """Speaker/acoustic/prosodic features for one utterance (286-d).

    Accepts a wav path or an in-memory waveform. Returns None on failure
    (callers treat that as "skip validation").
    """
    try:
        from ...ops import features as feats
        from ...ops.resample import resample

        wav, sr = _load_audio(audio, sample_rate)

        encoder = _get_encoder()
        embed = encoder.embed_utterance(wav, sr)

        if sr != feats.MFCC_SR:
            y = np.asarray(resample(wav, sr, feats.MFCC_SR))
        else:
            y = wav
        m = np.asarray(feats.mfcc(y))
        mfcc_mean = m.mean(axis=1)
        mfcc_std = m.std(axis=1)

        f0, voiced = feats.f0_yin(y)
        f0_voiced = f0[voiced]
        f0_mean = float(np.mean(f0_voiced)) if f0_voiced.size else 0.0
        f0_std = float(np.std(f0_voiced)) if f0_voiced.size else 0.0

        f1, f2 = feats.estimate_formants(y)

        return np.concatenate([embed, mfcc_mean, mfcc_std, [f0_mean, f0_std, f1, f2]])
    except Exception as e:  # noqa: BLE001 — feature failure is non-fatal
        logger.error("Error processing %s: %s", audio if isinstance(audio, str) else "<array>", e)
        return None


def extract_features_batch(paths, progress_callback=None, progress_interval=10):
    """Feature-extract many files; returns (features list, ok mask)."""
    out, ok = [], []
    for i, p in enumerate(paths):
        f = extract_features(p)
        out.append(f)
        ok.append(f is not None)
        if progress_callback and ((i + 1) % progress_interval == 0 or i + 1 == len(paths)):
            progress_callback(f"Extracting: {i + 1}/{len(paths)}")
    return out, ok


def train(
    dataset_dir: str,
    voice_id: Optional[str] = None,
    output_path: Optional[str] = None,
    progress_callback: Optional[Callable[[str], None]] = None,
):
    """Train the accent-drift classifier from a good/ + bad/ dataset.

    Cost model: a missed bad clip (false negative) costs 5× a false alarm,
    reflected both in class weights and in the threshold sweep. The fitted
    forest is isotonic-calibrated so the output is a usable probability.

    Saves a dict of {model, optimal_threshold, costs, metrics, date} via
    joblib to ``output_path`` / the per-voice store / the bundled global
    path.
    """
    from datetime import datetime

    import joblib
    from sklearn.calibration import CalibratedClassifierCV
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.metrics import brier_score_loss
    from sklearn.model_selection import train_test_split

    if output_path is None:
        if voice_id is not None:
            models_dir = os.path.join(os.path.expanduser("~"), ".rho_tts_tpu", "models")
            os.makedirs(models_dir, exist_ok=True)
            output_path = os.path.join(models_dir, f"{voice_id}_classifier.pkl")
        else:
            output_path = os.path.join(os.path.dirname(__file__), "voice_quality_model.pkl")

    def report(msg: str):
        logger.info(msg)
        if progress_callback:
            progress_callback(msg)

    report("Voice quality classifier training")

    # Gather files
    labeled_files = []
    for label, folder in enumerate(["good", "bad"]):
        folder_path = os.path.join(dataset_dir, folder)
        if not os.path.exists(folder_path):
            raise FileNotFoundError(f"Dataset folder not found: {folder_path}")
        wavs = sorted(f for f in os.listdir(folder_path) if f.endswith(".wav"))
        labeled_files.extend((os.path.join(folder_path, f), label) for f in wavs)

    total = len(labeled_files)
    X, y = [], []
    for i, (path, label) in enumerate(labeled_files):
        feat = extract_features(path)
        if feat is not None:
            X.append(feat)
            y.append(label)
        if (i + 1) % 10 == 0 or i + 1 == total:
            pct = (i + 1) * 100 // total if total else 0
            report(f"Extracting: {i + 1}/{total} ({pct}%) — {os.path.basename(path)}")

    X, y = np.array(X), np.array(y)
    n_good, n_bad = int(np.sum(y == 0)), int(np.sum(y == 1))
    report(f"Loaded {len(X)} samples ({n_good} good, {n_bad} bad)")

    if len(X) < 5:
        raise ValueError(
            f"Not enough samples to train a classifier (found {len(X)}, need at "
            f"least 5). Add .wav files to {dataset_dir}/good/ and {dataset_dir}/bad/."
        )

    X_train, X_test, y_train, y_test = train_test_split(
        X, y, test_size=0.2, random_state=42, stratify=y
    )
    report(f"Train/test split: {len(X_train)} train, {len(X_test)} test")

    fn_cost, fp_cost = 5.0, 1.0
    n_good_tr, n_bad_tr = np.sum(y_train == 0), np.sum(y_train == 1)
    total_tr = len(y_train)
    class_weights = {
        0: (total_tr / (2 * max(n_good_tr, 1))) * fn_cost,
        1: (total_tr / (2 * max(n_bad_tr, 1))) * fp_cost,
    }

    base_model = RandomForestClassifier(
        n_estimators=200,
        max_depth=10,
        min_samples_leaf=10,
        min_samples_split=20,
        max_features="sqrt",
        random_state=42,
        class_weight=class_weights,
    )
    model = CalibratedClassifierCV(base_model, method="isotonic", cv=5)
    report("Training model (this may take a moment)...")
    model.fit(X_train, y_train)
    report("Training complete! Optimizing threshold...")

    probs = model.predict_proba(X_test)[:, 1]
    best_cost, optimal_threshold = float("inf"), 0.18
    for thresh in np.arange(0.01, 1.0, 0.01):
        pred = (probs >= thresh).astype(int)
        fp = np.sum((y_test == 0) & (pred == 1))
        fn = np.sum((y_test == 1) & (pred == 0))
        cost = (fn * fn_cost + fp * fp_cost) / len(y_test)
        if cost < best_cost:
            best_cost, optimal_threshold = cost, float(thresh)

    brier = brier_score_loss(y_test, probs)
    report(f"Optimal threshold: {optimal_threshold:.3f}")

    joblib.dump(
        {
            "model": model,
            "model_name": "RandomForest",
            "optimal_threshold": optimal_threshold,
            "fn_cost": fn_cost,
            "fp_cost": fp_cost,
            "training_date": datetime.now().isoformat(),
            "class_distribution": {"good": n_good, "bad": n_bad},
            "expected_cost": best_cost,
            "brier_score": brier,
        },
        output_path,
    )
    report(f"Model saved to {output_path} (threshold: {optimal_threshold:.3f}, brier: {brier:.4f})")
    return output_path


if __name__ == "__main__":
    import argparse

    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    parser = argparse.ArgumentParser(description="Train the voice quality classifier")
    parser.add_argument("--dataset-dir", required=True, help="Dir with good/ and bad/ wavs")
    parser.add_argument("--voice-id", default=None, help="Voice ID for the per-voice store")
    parser.add_argument("--output", default=None, help="Explicit output model path")
    args = parser.parse_args()
    train(args.dataset_dir, voice_id=args.voice_id, output_path=args.output)
