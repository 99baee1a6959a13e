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


# ---------------------------------------------------------------------------
# Batched in-memory feature extraction (the validation hot path)
#
# The per-clip path above costs ~6 host↔device round trips per clip and
# compiles one program per clip length. This path buckets every segment of
# a batch into ONE device program (MFCC stats + YIN surfaces + speaker LSTM
# windows) with two host syncs total, so the drift gate scales with audio
# seconds, not relay latency.
# ---------------------------------------------------------------------------

_YIN_FRAME = 2048
_YIN_HOP = 512
_MFCC_HOP = 512
_MFCC_NFFT = 2048


def _bucket(n: int, minimum: int = 16000) -> int:
    """Next power-of-two bucket ≥ max(n, minimum) (bounds recompiles)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _reflect_zero_pad(w: np.ndarray, total: int, reflect: int) -> np.ndarray:
    """Pad to ``total``: first mirror up to ``reflect`` samples of the tail
    (so STFT boundary frames match the unpadded signal's center-reflection),
    then zero-fill."""
    n = w.shape[0]
    pad = total - n
    if pad <= 0:
        return w[:total]
    r = min(reflect, pad, max(n - 1, 0))
    out = np.zeros(total, np.float32)
    out[:n] = w
    if r > 0:
        out[n : n + r] = w[n - 2 - np.arange(r)]
    return out


def _drift_features_core(spk_params, wavs, frame_counts, spk_wavs, spk_frames, starts, win_valid):
    """One device program: MFCC stats + YIN surfaces + speaker embeddings."""
    import jax
    import jax.numpy as jnp

    from ...models.speaker import encoder as spk_enc
    from ...ops import features as feats

    tau_max = min(int(feats.MFCC_SR / 65.41) + 1, _YIN_FRAME // 2)
    mean, std = feats._mfcc_stats_batch(
        wavs, frame_counts, feats.MFCC_SR, 13, _MFCC_NFFT, _MFCC_HOP, 128
    )
    cmnd, e0 = feats._yin_cmnd_batch(wavs, _YIN_FRAME, _YIN_HOP, tau_max)
    # Mel frames past each utterance's count are zeroed to match the
    # per-clip path's zero-padding of short mel sequences.
    mels = jax.vmap(spk_enc.log_mel)(spk_wavs)  # (B, T, n_mels)
    fmask = jnp.arange(mels.shape[1])[None, :] < spk_frames[:, None]
    mels = jnp.where(fmask[..., None], mels, 0.0)
    embeds = spk_enc._forward_windows(spk_params, mels, starts, win_valid)
    return mean, std, cmnd, e0, embeds


_drift_core_jit = None


def extract_features_batch_audio(audios, sample_rate: int):
    """286-d features for a batch of in-memory waveforms (shared rate).

    Returns a list of np.ndarray (None per failed clip). Numerically
    matches :func:`extract_features` to float tolerance (golden-tested);
    uses bucketed static shapes and two host syncs for the whole batch.
    """
    global _drift_core_jit
    import jax
    import jax.numpy as jnp

    from ...models.speaker import encoder as spk_enc
    from ...ops import features as feats
    from ...ops.resample import _sinc_kernel, _resample_core

    b = len(audios)
    if b == 0:
        return []
    try:
        sr = int(sample_rate)
        # -- 1. Resample the whole batch on device, one fetch -------------
        if sr != feats.MFCC_SR:
            import math

            g = math.gcd(sr, feats.MFCC_SR)
            of, nf = sr // g, feats.MFCC_SR // g
            kernel, width = _sinc_kernel(of, nf)
            raw_lens = [int(np.prod(np.shape(a))) for a in audios]
            lraw = _bucket(max(raw_lens))
            stacked = jnp.stack(
                [
                    jnp.pad(jnp.asarray(a, jnp.float32).reshape(-1), (0, lraw - n))
                    for a, n in zip(audios, raw_lens)
                ]
            )
            tgt = math.ceil(nf * lraw / of)
            res = jax.vmap(
                lambda x: _resample_core(x, kernel, width, of, nf, tgt)
            )(stacked)
            host16 = np.asarray(jax.device_get(res))
            wavs16 = [
                host16[i, : math.ceil(nf * raw_lens[i] / of)] for i in range(b)
            ]
        else:
            wavs16 = [
                np.asarray(a, np.float32).reshape(-1) for a in jax.device_get(list(audios))
            ]

        lens = np.array([w.shape[0] for w in wavs16], np.int64)
        l16 = _bucket(int(lens.max()) + _MFCC_NFFT)  # slack for reflect pad
        batch = np.stack(
            [_reflect_zero_pad(w, l16, _MFCC_NFFT // 2) for w in wavs16]
        )
        mfcc_counts = 1 + lens // _MFCC_HOP
        yin_counts = np.maximum((lens - _YIN_FRAME) // _YIN_HOP + 1, 1)

        # -- 2. Speaker preprocessing (host: normalize + VAD) --------------
        spk_wavs = [spk_enc.preprocess(w, feats.MFCC_SR) for w in wavs16]
        spk_lens = np.array([max(w.shape[0], 1) for w in spk_wavs], np.int64)
        ls = _bucket(int(spk_lens.max()) + spk_enc.N_FFT)
        spk_batch = np.stack(
            [
                _reflect_zero_pad(w if w.size else np.zeros(1, np.float32), ls, spk_enc.N_FFT // 2)
                for w in spk_wavs
            ]
        )
        t_frames = 1 + spk_lens // spk_enc.HOP_LENGTH
        all_starts, n_windows = [], []
        for t in t_frames:
            t_eff = max(int(t), spk_enc.PARTIAL_FRAMES)
            s = list(
                range(0, t_eff - spk_enc.PARTIAL_FRAMES + 1, spk_enc.PARTIAL_FRAMES // 2)
            ) or [0]
            all_starts.append(s)
            n_windows.append(len(s))
        nw = -(-max(n_windows) // 4) * 4  # round up to 4
        starts = np.zeros((b, nw), np.int32)
        win_valid = np.zeros((b, nw), bool)
        for i, s in enumerate(all_starts):
            starts[i, : len(s)] = s
            win_valid[i, : len(s)] = True

        # -- 3. One device program + one fetch ------------------------------
        if _drift_core_jit is None:
            _drift_core_jit = jax.jit(_drift_features_core)
        encoder = _get_encoder()
        mean, std, cmnd, e0, embeds = _drift_core_jit(
            encoder.params,
            jnp.asarray(batch),
            jnp.asarray(mfcc_counts, jnp.int32),
            jnp.asarray(spk_batch),
            jnp.asarray(t_frames, jnp.int32),
            jnp.asarray(starts),
            jnp.asarray(win_valid),
        )
        mean, std, cmnd, e0, embeds = jax.device_get((mean, std, cmnd, e0, embeds))

        # -- 4. Host: YIN picking (vectorized), formants, assembly ----------
        tau_min = max(int(feats.MFCC_SR / 2093.0), 1)
        tau_max = min(int(feats.MFCC_SR / 65.41) + 1, _YIN_FRAME // 2)
        t_all = cmnd.shape[1]
        f0_flat, voiced_flat = feats.yin_pick(
            cmnd.reshape(b * t_all, -1),
            e0.reshape(b * t_all),
            feats.MFCC_SR,
            tau_min,
            tau_max,
            _YIN_FRAME,
            0.1,
            0.5,
        )
        f0_all = f0_flat.reshape(b, t_all)
        voiced_all = voiced_flat.reshape(b, t_all)

        out = []
        for i in range(b):
            k = int(yin_counts[i])
            f0v = f0_all[i, :k][voiced_all[i, :k]]
            f0_mean = float(np.mean(f0v)) if f0v.size else 0.0
            f0_std = float(np.std(f0v)) if f0v.size else 0.0
            from ...ops.features import estimate_formants

            f1, f2 = estimate_formants(wavs16[i])
            out.append(
                np.concatenate(
                    [embeds[i], mean[i], std[i], [f0_mean, f0_std, f1, f2]]
                )
            )
        return out
    except Exception as e:  # noqa: BLE001 — fall back to the serial path
        logger.warning("Batched feature extraction failed (%s); serial fallback", e)
        return [extract_features(a, sample_rate=sample_rate) for a in audios]


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
