"""Whisper-class speech recognizer in JAX.

Standard Whisper architecture: 80-channel log-mel frontend → two GELU
convs (stride 1, 2) + sinusoidal positions → pre-norm transformer encoder;
decoder with learned positions, causal self-attention (KV-cached, scan
decode) and cross-attention onto the encoder states; logits through the
tied token embedding. Sizes follow the published tiny/base/small configs;
weights convert from HF safetensors when a local checkpoint is given.
"""

from __future__ import annotations

import dataclasses
import glob
import logging
import os
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import spectral

logger = logging.getLogger(__name__)

Params = Dict[str, Any]

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_MELS = 80
CHUNK_FRAMES = 3000  # 30 s


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = N_MELS
    d_model: int = 384
    encoder_layers: int = 4
    decoder_layers: int = 4
    heads: int = 6
    vocab: int = 51865
    max_target_positions: int = 448
    # special tokens (multilingual vocab)
    sot: int = 50258
    eot: int = 50257
    lang_en: int = 50259
    task_transcribe: int = 50359
    no_timestamps: int = 50363


PRESETS = {
    "tiny": WhisperConfig(),
    "base": WhisperConfig(d_model=512, encoder_layers=6, decoder_layers=6, heads=8),
    "test": WhisperConfig(d_model=64, encoder_layers=2, decoder_layers=2, heads=2, vocab=1000,
                          sot=997, eot=996, lang_en=998, task_transcribe=999, no_timestamps=995,
                          max_target_positions=64),
}


# ---------------------------------------------------------------------------
# Frontend
# ---------------------------------------------------------------------------


@jax.jit
def log_mel_spectrogram(wav: jnp.ndarray) -> jnp.ndarray:
    """(S,) 16 kHz waveform → (T, 80) normalized log-mel frames."""
    window = spectral.hann_window(N_FFT, periodic=True)
    spec = spectral.stft(wav, N_FFT, HOP, N_FFT, window, center=True, pad_mode="reflect")
    power = (jnp.abs(spec) ** 2)[:, :-1]  # whisper drops the last frame
    fb = spectral.mel_filterbank(SAMPLE_RATE, N_FFT, N_MELS, norm_slaney=True)
    mel = fb @ power
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    return ((log_spec + 4.0) / 4.0).T  # (T, 80)


def _sinusoids(length: int, channels: int) -> np.ndarray:
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def _linear_init(key, din, dout):
    return {
        "w": (jax.random.normal(key, (din, dout), jnp.float32) / np.sqrt(din)),
        "b": jnp.zeros((dout,), jnp.float32),
    }


def _ln_init(d):
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _attn_init(key, d):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q": _linear_init(k1, d, d),
        "k": {"w": _linear_init(k2, d, d)["w"]},  # no bias on K (whisper)
        "v": _linear_init(k3, d, d),
        "o": _linear_init(k4, d, d),
    }


def _block_init(key, d, cross: bool):
    ks = jax.random.split(key, 6)
    p = {
        "ln1": _ln_init(d),
        "attn": _attn_init(ks[0], d),
        "ln_mlp": _ln_init(d),
        "mlp1": _linear_init(ks[1], d, 4 * d),
        "mlp2": _linear_init(ks[2], 4 * d, d),
    }
    if cross:
        p["ln_cross"] = _ln_init(d)
        p["cross"] = _attn_init(ks[3], d)
    return p


def init_params(key, cfg: WhisperConfig) -> Params:
    ks = jax.random.split(key, 8 + cfg.encoder_layers + cfg.decoder_layers)
    d = cfg.d_model
    params: Params = {
        "conv1": {
            "w": jax.random.normal(ks[0], (3, cfg.n_mels, d), jnp.float32) * 0.02,
            "b": jnp.zeros((d,), jnp.float32),
        },
        "conv2": {
            "w": jax.random.normal(ks[1], (3, d, d), jnp.float32) * 0.02,
            "b": jnp.zeros((d,), jnp.float32),
        },
        "enc_pos": jnp.asarray(_sinusoids(CHUNK_FRAMES // 2, d)),
        "enc_blocks": [_block_init(k, d, cross=False) for k in ks[2 : 2 + cfg.encoder_layers]],
        "enc_ln": _ln_init(d),
        "tok_embed": jax.random.normal(ks[3], (cfg.vocab, d), jnp.float32) * 0.02,
        "dec_pos": jax.random.normal(ks[4], (cfg.max_target_positions, d), jnp.float32) * 0.01,
        "dec_blocks": [
            _block_init(k, d, cross=True)
            for k in ks[5 : 5 + cfg.decoder_layers]
        ],
        "dec_ln": _ln_init(d),
    }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _ln(p, x):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]


def _heads(x, h):
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h)


def _attention(p, x, heads, kv=None, mask=None):
    """Standard MHA; kv=(K,V) overrides self-attention (cross or cache)."""
    q = _heads(x @ p["q"]["w"] + p["q"]["b"], heads)
    if kv is None:
        k = _heads(x @ p["k"]["w"], heads)
        v = _heads(x @ p["v"]["w"] + p["v"]["b"], heads)
    else:
        k, v = kv
    scale = (q.shape[-1]) ** -0.25
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale)
    if mask is not None:
        scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    b, t, h, dh = out.shape
    return out.reshape(b, t, h * dh) @ p["o"]["w"] + p["o"]["b"]


@partial(jax.jit, static_argnames=("cfg",))
def encode(params: Params, cfg: WhisperConfig, mels: jnp.ndarray) -> jnp.ndarray:
    """mels (B, 3000, 80) → encoder states (B, 1500, d)."""
    from ...models.qwen.codec import conv1d  # NHC conv helper

    x = jax.nn.gelu(conv1d(mels, params["conv1"]["w"], params["conv1"]["b"]), approximate=False)
    x = jax.nn.gelu(conv1d(x, params["conv2"]["w"], params["conv2"]["b"], stride=2), approximate=False)
    x = x + params["enc_pos"][None, : x.shape[1]]
    for blk in params["enc_blocks"]:
        x = x + _attention(blk["attn"], _ln(blk["ln1"], x), cfg.heads)
        h = _ln(blk["ln_mlp"], x)
        x = x + jax.nn.gelu(h @ blk["mlp1"]["w"] + blk["mlp1"]["b"], approximate=False) @ blk["mlp2"]["w"] + blk["mlp2"]["b"]
    return _ln(params["enc_ln"], x)


@partial(jax.jit, static_argnames=("cfg",))
def decoder_logits(
    params: Params,
    cfg: WhisperConfig,
    enc: jnp.ndarray,  # (B, Te, d)
    tokens: jnp.ndarray,  # (B, T) teacher-forced token ids
) -> jnp.ndarray:
    """Full (uncached) teacher-forced decoder pass → logits (B, T, vocab).

    Used for sequence scoring and as the uncached reference the KV-cached
    ``greedy_decode`` is tested against; also the surface the torch-oracle
    parity test pins to HF ``WhisperModel`` (tests/test_torch_oracle.py).
    Mirrors the reference's opaque upstream decoder
    (``src/rho_tts/validation/stt/stt_validator.py:64-71``).
    """
    b, t = tokens.shape
    heads = cfg.heads
    d = cfg.d_model
    x = params["tok_embed"][tokens] + params["dec_pos"][:t][None]
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    for blk in params["dec_blocks"]:
        x = x + _attention(blk["attn"], _ln(blk["ln1"], x), heads, mask=causal)
        x = x + _attention(blk["cross"], _ln(blk["ln_cross"], x), heads,
                           kv=(_heads(enc @ blk["cross"]["k"]["w"], heads),
                               _heads(enc @ blk["cross"]["v"]["w"] + blk["cross"]["v"]["b"], heads)))
        hm = _ln(blk["ln_mlp"], x)
        x = x + jax.nn.gelu(hm @ blk["mlp1"]["w"] + blk["mlp1"]["b"], approximate=False) @ blk["mlp2"]["w"] + blk["mlp2"]["b"]
    x = _ln(params["dec_ln"], x)
    return x @ params["tok_embed"].T


@partial(jax.jit, static_argnames=("cfg", "max_tokens"))
def greedy_decode(
    params: Params,
    cfg: WhisperConfig,
    enc: jnp.ndarray,  # (B, Te, d)
    prompt: jnp.ndarray,  # (P,) start tokens
    max_tokens: int,
):
    """Greedy decode with KV cache, one fused scan. Returns (B, max_tokens)."""
    b = enc.shape[0]
    d = cfg.d_model
    heads = cfg.heads
    n_layers = cfg.decoder_layers
    p_len = prompt.shape[0]
    s = p_len + max_tokens

    # Precompute cross-attention K/V per layer
    cross_kv = []
    for blk in params["dec_blocks"]:
        ck = _heads(enc @ blk["cross"]["k"]["w"], heads)
        cv = _heads(enc @ blk["cross"]["v"]["w"] + blk["cross"]["v"]["b"], heads)
        cross_kv.append((ck, cv))

    cache_k = jnp.zeros((n_layers, b, s, heads, d // heads), jnp.float32)
    cache_v = jnp.zeros((n_layers, b, s, heads, d // heads), jnp.float32)

    def forward_step(tokens, pos0, cache_k, cache_v, t_len):
        """tokens (B, T); writes KV at pos0..pos0+T; returns logits last."""
        t = tokens.shape[1]
        pos_idx = pos0 + jnp.arange(t)  # gather-based (pos0 may be traced)
        x = params["tok_embed"][tokens] + params["dec_pos"][pos_idx][None]
        key_idx = jnp.arange(s)
        for li, blk in enumerate(params["dec_blocks"]):
            h = _ln(blk["ln1"], x)
            q = _heads(h @ blk["attn"]["q"]["w"] + blk["attn"]["q"]["b"], heads)
            k_new = _heads(h @ blk["attn"]["k"]["w"], heads)
            v_new = _heads(h @ blk["attn"]["v"]["w"] + blk["attn"]["v"]["b"], heads)
            # Batch-uniform slot → dynamic_update_slice (in-place), not a
            # scatter (which would copy the cache every decode step).
            z = jnp.int32(0)
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k_new[None], (jnp.int32(li), z, jnp.asarray(pos0, jnp.int32), z, z)
            )
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v_new[None], (jnp.int32(li), z, jnp.asarray(pos0, jnp.int32), z, z)
            )
            scale = (d // heads) ** -0.25
            scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, cache_k[li] * scale)
            causal = key_idx[None, None, None, :] <= (pos0 + jnp.arange(t))[None, None, :, None]
            scores = jnp.where(causal, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, cache_v[li]).reshape(b, t, d)
            x = x + attn @ blk["attn"]["o"]["w"] + blk["attn"]["o"]["b"]
            x = x + _attention(blk["cross"], _ln(blk["ln_cross"], x), heads, kv=cross_kv[li])
            hm = _ln(blk["ln_mlp"], x)
            x = x + jax.nn.gelu(hm @ blk["mlp1"]["w"] + blk["mlp1"]["b"], approximate=False) @ blk["mlp2"]["w"] + blk["mlp2"]["b"]
        x = _ln(params["dec_ln"], x)
        return x[:, -1] @ params["tok_embed"].T, cache_k, cache_v

    # Prompt pass
    prompt_b = jnp.broadcast_to(prompt[None], (b, p_len))
    logits, cache_k, cache_v = forward_step(prompt_b, 0, cache_k, cache_v, p_len)
    first = jnp.argmax(logits, axis=-1)

    def step(carry, t):
        tok, done, cache_k, cache_v = carry
        logits, cache_k, cache_v = forward_step(tok[:, None], p_len + t, cache_k, cache_v, 1)
        nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(done, cfg.eot, nxt)
        done = done | (nxt == cfg.eot)
        return (nxt, done, cache_k, cache_v), tok

    done0 = first == cfg.eot
    (_, _, _, _), toks = jax.lax.scan(
        step, (first, done0, cache_k, cache_v), jnp.arange(max_tokens)
    )
    return jnp.transpose(toks, (1, 0))  # (B, max_tokens)


@partial(jax.jit, static_argnames=("cfg", "max_tokens", "beams"))
def beam_decode(
    params: Params,
    cfg: WhisperConfig,
    enc: jnp.ndarray,  # (B, Te, d)
    prompt: jnp.ndarray,  # (P,) start tokens
    max_tokens: int,
    beams: int = 5,
):
    """Batched beam search, one fused scan. Returns (B, max_tokens).

    Matches the reference's runtime behavior: faster-whisper transcribes
    with its default ``beam_size=5``
    (``/root/reference/src/rho_tts/validation/stt/stt_validator.py:135``,
    CTranslate2 defaults), where this repo's gate decodes greedily by
    default for throughput. TPU-first shape: the K beams FOLD INTO THE
    BATCH (``B*K`` rows share one decoder program), each step takes a
    top-K over the ``K*V`` candidate scores per batch element, reorders
    the KV cache rows by the surviving beams' parents (one gather — the
    cache is small for STT-sized models), and records (token, parent)
    pairs; a reverse scan backtracks the best length-normalized beam on
    device, so the host fetch stays (B, max_tokens) ints.

    Finished beams ride along frozen: their only allowed continuation is
    EOT at logprob 0, so their scores are stable and they keep competing
    in the top-K (standard beam semantics).
    """
    b = enc.shape[0]
    k = beams
    bk = b * k
    v = params["tok_embed"].shape[0]
    d = cfg.d_model
    heads = cfg.heads
    n_layers = cfg.decoder_layers
    p_len = prompt.shape[0]
    s = p_len + max_tokens

    # Beam-folded encoder rows: (B*K, Te, d)
    enc_k = jnp.repeat(enc, k, axis=0)
    cross_kv = []
    for blk in params["dec_blocks"]:
        ck = _heads(enc_k @ blk["cross"]["k"]["w"], heads)
        cv = _heads(enc_k @ blk["cross"]["v"]["w"] + blk["cross"]["v"]["b"], heads)
        cross_kv.append((ck, cv))

    cache_k = jnp.zeros((n_layers, bk, s, heads, d // heads), jnp.float32)
    cache_v = jnp.zeros((n_layers, bk, s, heads, d // heads), jnp.float32)

    def forward_step(tokens, pos0, cache_k, cache_v):
        """tokens (B*K, T) → (last-position logits, caches)."""
        t = tokens.shape[1]
        pos_idx = pos0 + jnp.arange(t)
        x = params["tok_embed"][tokens] + params["dec_pos"][pos_idx][None]
        key_idx = jnp.arange(s)
        for li, blk in enumerate(params["dec_blocks"]):
            h = _ln(blk["ln1"], x)
            q = _heads(h @ blk["attn"]["q"]["w"] + blk["attn"]["q"]["b"], heads)
            k_new = _heads(h @ blk["attn"]["k"]["w"], heads)
            v_new = _heads(h @ blk["attn"]["v"]["w"] + blk["attn"]["v"]["b"], heads)
            z = jnp.int32(0)
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k_new[None], (jnp.int32(li), z, jnp.asarray(pos0, jnp.int32), z, z)
            )
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v_new[None], (jnp.int32(li), z, jnp.asarray(pos0, jnp.int32), z, z)
            )
            scale = (d // heads) ** -0.25
            scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, cache_k[li] * scale)
            causal = key_idx[None, None, None, :] <= (pos0 + jnp.arange(t))[None, None, :, None]
            scores = jnp.where(causal, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, cache_v[li]).reshape(bk, t, d)
            x = x + attn @ blk["attn"]["o"]["w"] + blk["attn"]["o"]["b"]
            x = x + _attention(blk["cross"], _ln(blk["ln_cross"], x), heads, kv=cross_kv[li])
            hm = _ln(blk["ln_mlp"], x)
            x = x + jax.nn.gelu(hm @ blk["mlp1"]["w"] + blk["mlp1"]["b"], approximate=False) @ blk["mlp2"]["w"] + blk["mlp2"]["b"]
        x = _ln(params["dec_ln"], x)
        return x[:, -1] @ params["tok_embed"].T, cache_k, cache_v

    # Prompt pass on all B*K rows (identical within a beam group)
    prompt_bk = jnp.broadcast_to(prompt[None], (bk, p_len))
    logits, cache_k, cache_v = forward_step(prompt_bk, 0, cache_k, cache_v)
    logprobs0 = jax.nn.log_softmax(logits.reshape(b, k, v)[:, 0], axis=-1)  # (B, V)
    cum0, tok0 = jax.lax.top_k(logprobs0, k)  # (B, K) init: K distinct first tokens
    done0 = tok0 == cfg.eot

    def step(carry, t):
        tok, cum, done, cache_k, cache_v = carry  # tok/cum/done (B, K)
        logits, cache_k, cache_v = forward_step(
            tok.reshape(bk, 1), p_len + t, cache_k, cache_v
        )
        lp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v)
        # Finished beams: only EOT continues, at logprob 0 (frozen score)
        frozen = jnp.full((v,), -jnp.inf).at[cfg.eot].set(0.0)
        lp = jnp.where(done[..., None], frozen[None, None], lp)
        cand = cum[..., None] + lp  # (B, K, V)
        cum, flat_idx = jax.lax.top_k(cand.reshape(b, k * v), k)  # (B, K)
        parent = flat_idx // v  # (B, K)
        tok = flat_idx % v
        # Reorder the KV caches by each survivor's parent beam
        rows = (jnp.arange(b)[:, None] * k + parent).reshape(-1)  # (B*K,)
        cache_k = jnp.take(cache_k, rows, axis=1)
        cache_v = jnp.take(cache_v, rows, axis=1)
        done = jnp.take_along_axis(done, parent, axis=1) | (tok == cfg.eot)
        return (tok, cum, done, cache_k, cache_v), (tok, parent)

    # max_tokens-1 expansion steps: chains are exactly max_tokens tokens
    # (init token + expansions), so the length-normalized selection scores
    # precisely the sequence that is returned — no hidden extra token.
    (tok_f, cum_f, done_f, _, _), (toks_seq, parents_seq) = jax.lax.scan(
        step, (tok0, cum0, done0, cache_k, cache_v), jnp.arange(max_tokens - 1)
    )
    # toks_seq/parents_seq: (T, B, K); sequence for beam j = backtracked
    # chain ending at j, PLUS its step-0 token (tok0 via the root parent).

    def back(carry, tp):
        idx = carry  # (B,) current beam index per batch row
        toks_t, parents_t = tp  # (B, K) each
        tok = jnp.take_along_axis(toks_t, idx[:, None], axis=1)[:, 0]
        idx = jnp.take_along_axis(parents_t, idx[:, None], axis=1)[:, 0]
        return idx, tok

    def backtrack(j):  # j: (B,) final beam indices → (root beam, tokens (B, T))
        idx0, toks_rev = jax.lax.scan(
            back, j, (toks_seq, parents_seq), reverse=True
        )
        return idx0, jnp.transpose(toks_rev, (1, 0))

    # Length-normalized selection (CT2 length_penalty=1 ≈ score / length),
    # each final beam scored by its own backtracked generated length.
    all_seqs = []
    all_roots = []
    for j in range(k):
        root, seq = backtrack(jnp.full((b,), j, jnp.int32))
        all_seqs.append(seq)
        all_roots.append(root)
    seqs = jnp.stack(all_seqs, axis=1)  # (B, K, max_tokens-1)
    roots = jnp.stack(all_roots, axis=1)  # (B, K)
    first_toks = jnp.take_along_axis(tok0, roots, axis=1)  # (B, K)
    full = jnp.concatenate([first_toks[..., None], seqs], axis=-1)  # (B,K,max_tokens)
    lens = jnp.sum(full != cfg.eot, axis=-1).astype(jnp.float32)  # (B, K)
    norm = cum_f / jnp.maximum(lens, 1.0)
    best = jnp.argmax(norm, axis=1)  # (B,)
    return jnp.take_along_axis(full, best[:, None, None], axis=1)[:, 0]


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------


class WhisperModel:
    def __init__(self, cfg: WhisperConfig, params: Optional[Params] = None, seed: int = 0):
        self.cfg = cfg
        self.params = params if params is not None else init_params(jax.random.PRNGKey(seed), cfg)

    def transcribe_tokens(
        self, wav: jnp.ndarray, max_tokens: int = 128, beam_size: int = 1
    ) -> np.ndarray:
        """(S,) 16 kHz waveform → token ids (max_tokens,)."""
        return self.transcribe_tokens_batch([wav], max_tokens, beam_size)[0]

    def transcribe_tokens_batch(
        self, wavs, max_tokens: int = 128, beam_size: int = 1
    ) -> np.ndarray:
        """List of 16 kHz waveforms → token ids (B, max_tokens).

        The whole batch shares one mel/encode/decode program — this is how
        the validation pipeline scores a batch of candidate clips in one
        device call instead of clip-at-a-time. ``beam_size>1`` switches to
        batched beam search (the reference's faster-whisper default is
        beam 5; greedy is this repo's default for gate throughput).
        """
        n = CHUNK_FRAMES * HOP
        padded = []
        for wav in wavs:
            w = jnp.asarray(wav, jnp.float32)[:n]
            padded.append(jnp.pad(w, (0, n - w.shape[0])))
        batch = jnp.stack(padded)
        mels = jax.vmap(log_mel_spectrogram)(batch)[:, :CHUNK_FRAMES]
        enc = encode(self.params, self.cfg, mels)
        prompt = jnp.asarray(
            [self.cfg.sot, self.cfg.lang_en, self.cfg.task_transcribe, self.cfg.no_timestamps],
            jnp.int32,
        )
        if beam_size > 1:
            toks = beam_decode(self.params, self.cfg, enc, prompt, max_tokens, beam_size)
        else:
            toks = greedy_decode(self.params, self.cfg, enc, prompt, max_tokens)
        return np.asarray(toks)


class FallbackTokenizer:
    """Deterministic id→printable-text mapping for checkpoint-less hosts.

    The real Whisper vocabulary is a GPT-2-style BPE that only ships with
    a checkpoint; this host has no egress (CLAUDE.md). The fallback keeps
    the FULL STT gate executable end-to-end — mel → encode → KV-cached
    decode → detokenize → normalize → fuzzy match — with identical device
    compute, so throughput numbers are real even though the text is not.
    The reference bundles its tokenizer via faster-whisper
    (``src/rho_tts/validation/stt/stt_validator.py:64-71``).
    """

    _ALPHABET = "abcdefghijklmnopqrstuvwxyz "

    def decode(self, ids) -> str:
        return "".join(self._ALPHABET[int(i) % len(self._ALPHABET)] for i in ids)


class WhisperTranscriber:
    """Transcription facade with checkpoint + tokenizer management."""

    def __init__(self, model: WhisperModel, tokenizer=None, has_real_weights: bool = False):
        self.model = model
        self.has_real_tokenizer = tokenizer is not None
        self.tokenizer = tokenizer if tokenizer is not None else FallbackTokenizer()
        self.has_real_weights = has_real_weights

    @classmethod
    def from_pretrained(cls, model_path: str) -> "WhisperTranscriber":
        cfg = PRESETS.get("tiny")
        # Longest-match against the basename so e.g. 'whisper-latest' can
        # never select the synthetic 'test' preset via substring accident.
        base = os.path.basename(os.path.normpath(str(model_path))).lower()
        matches = [n for n in PRESETS if n in base]
        if matches:
            cfg = PRESETS[max(matches, key=len)]
        params = None
        tokenizer = None
        if os.path.isdir(model_path):
            try:
                params = _load_hf_checkpoint(model_path, cfg)
            except Exception as e:  # noqa: BLE001
                logger.warning("Whisper checkpoint load failed: %s", e)
            tok_file = os.path.join(model_path, "tokenizer.json")
            if os.path.exists(tok_file):
                try:
                    from tokenizers import Tokenizer

                    tokenizer = Tokenizer.from_file(tok_file)
                except Exception:  # noqa: BLE001
                    pass
        model = WhisperModel(cfg, params=params)
        return cls(model, tokenizer, has_real_weights=params is not None)

    def transcribe(self, wav, sample_rate: int) -> str:
        return self.transcribe_batch([wav], [sample_rate])[0]

    def transcribe_batch(self, wavs, sample_rates) -> list:
        """Transcribe several clips in one batched device call.

        Waveforms STAY ON DEVICE end-to-end: clips are capped at the 30 s
        window, zero-padded to a shared static shape, resampled as one
        vmapped program and fed straight into mel/encode/decode — the only
        host transfer is the (B, max_tokens) id matrix. (Fetching audio to
        host costs seconds per batch on relay-tunneled backends.)
        """
        import math

        n16 = CHUNK_FRAMES * HOP  # 30 s at 16 kHz
        bysr: dict = {}
        for i, sr in enumerate(sample_rates):
            bysr.setdefault(int(sr), []).append(i)

        prepped: list = [None] * len(wavs)
        for sr, idxs in bysr.items():
            if sr == SAMPLE_RATE:
                for i in idxs:
                    w = jnp.asarray(wavs[i], jnp.float32).reshape(-1)[:n16]
                    prepped[i] = jnp.pad(w, (0, n16 - w.shape[0]))
                continue
            from ...ops.resample import resample_batch

            g = math.gcd(sr, SAMPLE_RATE)
            n_src = n16 * (sr // g) // (SAMPLE_RATE // g)  # full-window source samples
            stacked = []
            for i in idxs:
                w = jnp.asarray(wavs[i], jnp.float32).reshape(-1)[:n_src]
                stacked.append(jnp.pad(w, (0, n_src - w.shape[0])))
            res = resample_batch(jnp.stack(stacked), sr, SAMPLE_RATE, n16)
            for j, i in enumerate(idxs):
                prepped[i] = res[j]
        # Decode strategy: beam 5 by default — the reference's
        # faster-whisper default (stt_validator.py:135 → CTranslate2
        # beam 5), so the quality gate's semantics match out of the box.
        # Beam-5 costs only 1.47× over greedy here (the mel + encoder
        # amortize and the beams fold into the decode batch; BASELINE
        # config-2 row), and the gate overlaps drift validation anyway.
        # RHO_TTS_TPU_STT_BEAM=1 opts into greedy for gate throughput.
        beam = int(os.environ.get("RHO_TTS_TPU_STT_BEAM", "5"))
        toks_batch = self.model.transcribe_tokens_batch(prepped, beam_size=beam)
        out = []
        for toks in toks_batch:
            ids = [int(t) for t in toks if int(t) < self.model.cfg.eot]
            out.append(self.tokenizer.decode(ids))
        return out


def _load_hf_checkpoint(model_path: str, cfg: WhisperConfig) -> Optional[Params]:
    """Convert HF whisper safetensors into this layout."""
    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        return None
    from safetensors.numpy import load_file

    t: Dict[str, np.ndarray] = {}
    for f in files:
        t.update(load_file(f))

    def g(name):
        for pfx in ("model.", ""):
            if pfx + name in t:
                return t[pfx + name]
        raise KeyError(name)

    params = init_params(jax.random.PRNGKey(0), cfg)
    # convs: HF (out, in, k) → (k, in, out)
    params["conv1"] = {"w": jnp.asarray(g("encoder.conv1.weight").transpose(2, 1, 0)),
                       "b": jnp.asarray(g("encoder.conv1.bias"))}
    params["conv2"] = {"w": jnp.asarray(g("encoder.conv2.weight").transpose(2, 1, 0)),
                       "b": jnp.asarray(g("encoder.conv2.bias"))}
    params["enc_pos"] = jnp.asarray(g("encoder.embed_positions.weight"))
    params["tok_embed"] = jnp.asarray(g("decoder.embed_tokens.weight"))
    params["dec_pos"] = jnp.asarray(g("decoder.embed_positions.weight"))

    def attn(prefix, has_cross=False):
        return {
            "q": {"w": jnp.asarray(g(f"{prefix}.q_proj.weight").T),
                  "b": jnp.asarray(g(f"{prefix}.q_proj.bias"))},
            "k": {"w": jnp.asarray(g(f"{prefix}.k_proj.weight").T)},
            "v": {"w": jnp.asarray(g(f"{prefix}.v_proj.weight").T),
                  "b": jnp.asarray(g(f"{prefix}.v_proj.bias"))},
            "o": {"w": jnp.asarray(g(f"{prefix}.out_proj.weight").T),
                  "b": jnp.asarray(g(f"{prefix}.out_proj.bias"))},
        }

    def ln(prefix):
        return {"g": jnp.asarray(g(f"{prefix}.weight")), "b": jnp.asarray(g(f"{prefix}.bias"))}

    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        params["enc_blocks"][i] = {
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "attn": attn(f"{p}.self_attn"),
            "ln_mlp": ln(f"{p}.final_layer_norm"),
            "mlp1": {"w": jnp.asarray(g(f"{p}.fc1.weight").T), "b": jnp.asarray(g(f"{p}.fc1.bias"))},
            "mlp2": {"w": jnp.asarray(g(f"{p}.fc2.weight").T), "b": jnp.asarray(g(f"{p}.fc2.bias"))},
        }
    for i in range(cfg.decoder_layers):
        p = f"decoder.layers.{i}"
        params["dec_blocks"][i] = {
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "attn": attn(f"{p}.self_attn"),
            "ln_cross": ln(f"{p}.encoder_attn_layer_norm"),
            "cross": attn(f"{p}.encoder_attn"),
            "ln_mlp": ln(f"{p}.final_layer_norm"),
            "mlp1": {"w": jnp.asarray(g(f"{p}.fc1.weight").T), "b": jnp.asarray(g(f"{p}.fc1.bias"))},
            "mlp2": {"w": jnp.asarray(g(f"{p}.fc2.weight").T), "b": jnp.asarray(g(f"{p}.fc2.bias"))},
        }
    params["enc_ln"] = ln("encoder.layer_norm")
    params["dec_ln"] = ln("decoder.layer_norm")
    logger.info("Loaded Whisper weights from %s", model_path)
    return params
