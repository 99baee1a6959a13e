"""GE2E-class speaker encoder in JAX.

Pipeline (structure-compatible with the torch GE2E encoder the reference
uses through resemblyzer, so its pretrained weights can be converted):

  16 kHz mono → volume normalization → energy VAD trim → 40 log-mels
  (25 ms / 10 ms) → 3-layer LSTM(256) as ``lax.scan`` with fused gate
  matmuls → linear + ReLU → L2 normalize.

Utterance embeddings average overlapping 160-frame partial windows, all
batched into one device call (the reference loops per partial on GPU).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import spectral
from ...ops.resample import resample

Params = Dict[str, Any]

SAMPLE_RATE = 16000
N_MELS = 40
WIN_LENGTH = 400  # 25 ms
HOP_LENGTH = 160  # 10 ms
# resemblyzer passes n_fft = win_length = 400 (25 ms) to librosa's
# melspectrogram — NOT the next power of two; matching it exactly keeps
# GE2E checkpoint embeddings transferable (tests/test_librosa_oracle.py).
N_FFT = 400
HIDDEN = 256
LAYERS = 3
EMBED = 256
PARTIAL_FRAMES = 160
TARGET_DBFS = -30.0
VAD_WINDOW_MS = 30
VAD_THRESHOLD_DB = -40.0


def init_params(key, input_dim: int = N_MELS) -> Params:
    params: Params = {"lstm": []}
    dims = [input_dim] + [HIDDEN] * LAYERS
    keys = jax.random.split(key, LAYERS + 1)
    for layer in range(LAYERS):
        k1, k2 = jax.random.split(keys[layer])
        scale = 1.0 / np.sqrt(HIDDEN)
        params["lstm"].append(
            {
                "w_ih": jax.random.uniform(k1, (dims[layer], 4 * HIDDEN), jnp.float32, -scale, scale),
                "w_hh": jax.random.uniform(k2, (HIDDEN, 4 * HIDDEN), jnp.float32, -scale, scale),
                "bias": jnp.zeros((4 * HIDDEN,), jnp.float32),
            }
        )
    params["proj"] = jax.random.uniform(
        keys[-1], (HIDDEN, EMBED), jnp.float32, -0.05, 0.05
    )
    params["proj_bias"] = jnp.zeros((EMBED,), jnp.float32)
    return params


def load_pretrained(path: str) -> Params:
    """Convert a pretrained GE2E checkpoint into this module's layout.

    Accepts the resemblyzer ``pretrained.pt`` format (torch state dict,
    possibly wrapped as ``{"model_state": ...}``) or an ``.npz`` with the
    same key names. Torch LSTM tensors are ``weight_ih_l{k}`` (4H, D) /
    ``weight_hh_l{k}`` (4H, H) with i,f,g,o gate order and two bias
    vectors that sum; the final ``linear`` is (E, H) + bias.

    This supplies the real weights the reference gets through
    ``resemblyzer.VoiceEncoder()`` (``src/rho_tts/base_tts.py:133-139``,
    ``src/rho_tts/validation/classifier/trainer.py:44-47``).
    """
    if path.endswith(".npz"):
        state = {k: np.asarray(v, np.float32) for k, v in np.load(path).items()}
    else:
        from ..hf_weights import read_torch_state

        state = read_torch_state(path)
    if not state:
        raise FileNotFoundError(f"No speaker-encoder weights at {path}")

    params: Params = {"lstm": []}
    for layer in range(LAYERS):
        w_ih = state[f"lstm.weight_ih_l{layer}"]  # (4H, D)
        w_hh = state[f"lstm.weight_hh_l{layer}"]  # (4H, H)
        bias = state.get(f"lstm.bias_ih_l{layer}", 0.0) + state.get(
            f"lstm.bias_hh_l{layer}", 0.0
        )
        if np.isscalar(bias) or getattr(bias, "shape", ()) == ():
            bias = np.zeros((w_ih.shape[0],), np.float32)
        params["lstm"].append(
            {
                "w_ih": jnp.asarray(w_ih.T, jnp.float32),
                "w_hh": jnp.asarray(w_hh.T, jnp.float32),
                "bias": jnp.asarray(bias, jnp.float32),
            }
        )
    proj = state["linear.weight"]  # (E, H)
    params["proj"] = jnp.asarray(proj.T, jnp.float32)
    bias = state.get("linear.bias")
    params["proj_bias"] = (
        jnp.asarray(bias, jnp.float32) if bias is not None else jnp.zeros((proj.shape[0],), jnp.float32)
    )
    return params


def _lstm_layer(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, D) → (B, T, H). Gate order i, f, g, o (torch convention)."""
    b = x.shape[0]
    x_proj = x @ p["w_ih"] + p["bias"]  # (B, T, 4H) — one fused matmul

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ p["w_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((b, HIDDEN), x.dtype)
    (_, _), hs = jax.lax.scan(step, (h0, h0), jnp.transpose(x_proj, (1, 0, 2)))
    return jnp.transpose(hs, (1, 0, 2))


@jax.jit
def _forward(params: Params, mels: jnp.ndarray) -> jnp.ndarray:
    """mels: (B, T, n_mels) → L2-normalized embeddings (B, EMBED)."""
    x = mels
    for layer_params in params["lstm"]:
        x = _lstm_layer(layer_params, x)
    e = jax.nn.relu(x[:, -1] @ params["proj"] + params.get("proj_bias", 0.0))
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)


def _forward_windows(
    params: Params,
    mels: jnp.ndarray,
    starts: jnp.ndarray,
    win_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Utterance embeddings from per-utterance partial windows, batched.

    mels: (B, T, n_mels), zero-masked past each utterance's valid frames.
    starts: (B, Nw) int32 window offsets (padded entries may repeat).
    win_valid: (B, Nw) bool — which windows belong to each utterance.
    Returns (B, EMBED): masked mean of the window embeddings, renormalized
    (same math as :meth:`SpeakerEncoder.embed_utterance`).
    """
    b, nw = starts.shape
    idx = jnp.clip(
        starts[:, :, None] + jnp.arange(PARTIAL_FRAMES)[None, None, :],
        0,
        mels.shape[1] - 1,
    )  # (B, Nw, PARTIAL_FRAMES)
    win = jax.vmap(lambda m, i: m[i])(mels, idx)  # (B, Nw, P, M)
    flat = win.reshape(b * nw, PARTIAL_FRAMES, mels.shape[-1])
    e = _forward(params, flat).reshape(b, nw, -1)
    w = win_valid.astype(jnp.float32)[..., None]
    mean = (e * w).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1.0)
    return mean / jnp.maximum(jnp.linalg.norm(mean, axis=-1, keepdims=True), 1e-8)


def log_mel(wav: jnp.ndarray) -> jnp.ndarray:
    """(S,) 16 kHz waveform → (T, 40) log-mel frames."""
    # resemblyzer computes librosa.feature.melspectrogram with defaults:
    # periodic ("fftbins") hann + centered CONSTANT padding on librosa>=0.10
    # (the reference's pin); pinned by tests/test_librosa_oracle.py.
    window = spectral.hann_window(WIN_LENGTH, periodic=True)
    spec = spectral.stft(
        jnp.asarray(wav, jnp.float32),
        N_FFT,
        HOP_LENGTH,
        WIN_LENGTH,
        window,
        center=True,
        pad_mode="constant",
    )
    power = jnp.abs(spec) ** 2  # (freq, time)
    fb = spectral.mel_filterbank(SAMPLE_RATE, N_FFT, N_MELS)
    mels = fb @ power  # (n_mels, T)
    return jnp.log(jnp.maximum(mels, 1e-10)).T  # (T, n_mels)


def preprocess(wav: np.ndarray, source_sr: int) -> np.ndarray:
    """Resample to 16 kHz, normalize volume to -30 dBFS, trim silence."""
    wav = np.asarray(wav, np.float32).reshape(-1)
    if source_sr != SAMPLE_RATE:
        wav = np.asarray(resample(wav, source_sr, SAMPLE_RATE))
    if wav.size == 0:
        return wav
    # Volume normalization
    rms = np.sqrt(np.mean(wav**2))
    if rms > 1e-8:
        target = 10 ** (TARGET_DBFS / 20)
        wav = wav * (target / rms)
    # Energy VAD: drop frames below threshold (moving RMS over 30 ms)
    win = int(SAMPLE_RATE * VAD_WINDOW_MS / 1000)
    if wav.size > win:
        n = (wav.size // win) * win
        frames = wav[:n].reshape(-1, win)
        frame_rms = np.sqrt(np.mean(frames**2, axis=1))
        voiced = frame_rms > 10 ** (VAD_THRESHOLD_DB / 20)
        # Dilate the voiced mask by one frame each side (smooth transitions)
        voiced = np.convolve(voiced.astype(np.float32), np.ones(3), "same") > 0
        if voiced.any():
            wav = np.concatenate([frames[voiced].reshape(-1), wav[n:]])
    return wav


class SpeakerEncoder:
    """Utterance-level speaker embedding extractor.

    Weight resolution order: explicit ``params`` → explicit
    ``weights_path`` → ``RHO_TTS_TPU_SPEAKER_WEIGHTS`` env var → random
    init (deterministic; embeddings are still stable projections, logged).
    """

    def __init__(
        self,
        params: Optional[Params] = None,
        seed: int = 0,
        weights_path: Optional[str] = None,
    ):
        if params is None:
            import os

            path = weights_path or os.environ.get("RHO_TTS_TPU_SPEAKER_WEIGHTS")
            if path:
                params = load_pretrained(path)
            else:
                params = init_params(jax.random.PRNGKey(seed))
        self.params = params

    def embed_utterance(self, wav: np.ndarray, source_sr: int) -> np.ndarray:
        """Embed one utterance: mean of partial-window embeddings, renormed."""
        wav = preprocess(wav, source_sr)
        mels = np.asarray(log_mel(wav))
        t = mels.shape[0]
        if t < PARTIAL_FRAMES:
            mels = np.pad(mels, ((0, PARTIAL_FRAMES - t), (0, 0)))
            t = PARTIAL_FRAMES
        # 50%-overlap partial windows, batched into one forward pass
        starts = list(range(0, max(t - PARTIAL_FRAMES, 0) + 1, PARTIAL_FRAMES // 2))
        if not starts:
            starts = [0]
        batch = np.stack([mels[s : s + PARTIAL_FRAMES] for s in starts])
        embeds = np.asarray(_forward(self.params, jnp.asarray(batch)))
        mean = embeds.mean(axis=0)
        return mean / max(np.linalg.norm(mean), 1e-8)

    def embed_batch(self, wavs, source_srs) -> np.ndarray:
        """Embed several utterances (host loop; partials batched per wav)."""
        return np.stack([self.embed_utterance(w, sr) for w, sr in zip(wavs, source_srs)])
