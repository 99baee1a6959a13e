"""Neural audio codec: conv encoder → residual VQ → transposed-conv vocoder.

The decoder (vocoder) is the synthesis hot path after the AR talker: RVQ
codes are dequantized to frame embeddings and upsampled 1920× to a 24 kHz
waveform through a stack of ConvTranspose + dilated-residual blocks. All
convs run in NHC layout (batch, time, channels) which XLA maps onto the MXU
as implicit matmuls; activations are bf16 with f32 accumulation.

Replaces the CUDA codec decode inside the ``qwen_tts`` dependency of the
reference (``src/rho_tts/providers/qwen.py:218-266`` calls it opaquely).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .config import CodecConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Conv primitives (NHC layout)
# ---------------------------------------------------------------------------


def conv1d(x, w, b=None, stride=1, dilation=1, padding=None):
    """x: (B, T, Cin), w: (K, Cin, Cout). Torch-exact semantics.

    ``padding=None`` reproduces ``torch.nn.Conv1d(padding=p)`` with
    ``p = dilation * (k - 1) // 2`` (torch's "same"-style symmetric pad) —
    for odd kernels at stride 1 this is identical to XLA SAME, but for
    stride > 1 XLA SAME pads asymmetrically and diverges from torch by a
    one-sample shift (caught by the torch-oracle parity tests,
    tests/test_torch_oracle.py). An explicit ``(lo, hi)`` tuple or int is
    also accepted.
    """
    k = w.shape[0]
    if padding is None:
        p = dilation * (k - 1) // 2
        pad = [(p, p)]
    elif isinstance(padding, int):
        pad = [(padding, padding)]
    else:
        pad = [tuple(padding)]
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def conv_transpose1d(x, w, b=None, stride=1):
    """x: (B, T, Cin), w: (K, Cin, Cout); output length exactly T*stride.

    Torch-exact: matches ``torch.nn.ConvTranspose1d(stride=r,
    padding=(k - r) // 2)`` (the HiFiGAN convention) — implemented as an
    input-dilated correlation with the kernel flipped along time, which is
    the identity mapping between conv-transpose and correlation. When
    ``k - stride`` is odd the torch formula yields T*r + 1 samples; we crop
    the extra right-edge sample so frame→sample bookkeeping stays exact.
    """
    k = w.shape[0]
    p = (k - stride) // 2
    lo = k - 1 - p
    hi = stride - 1 + p
    out = jax.lax.conv_general_dilated(
        x,
        w[::-1],
        window_strides=(1,),
        padding=[(lo, hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def _winit(key, k, cin, cout, dtype=jnp.bfloat16):
    scale = 1.0 / np.sqrt(k * cin)
    return (jax.random.normal(key, (k, cin, cout), jnp.float32) * scale).astype(dtype)


def leaky_relu(x, slope=0.1):
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------------------
# Residual blocks
# ---------------------------------------------------------------------------


def init_resblock(key, channels: int, dilations, dtype=jnp.bfloat16) -> Params:
    ks = jax.random.split(key, 2 * len(dilations))
    return {
        "convs_d": [_winit(ks[2 * i], 3, channels, channels, dtype) for i in range(len(dilations))],
        "convs_p": [_winit(ks[2 * i + 1], 1, channels, channels, dtype) for i in range(len(dilations))],
    }


def resblock(params: Params, x, dilations):
    for wd, wp, d in zip(params["convs_d"], params["convs_p"], dilations):
        h = conv1d(leaky_relu(x), wd, dilation=d)
        h = conv1d(leaky_relu(h), wp)
        x = x + h
    return x


# ---------------------------------------------------------------------------
# Encoder (waveform → frame embeddings)
# ---------------------------------------------------------------------------


def init_encoder(key, cfg: CodecConfig, dtype=jnp.bfloat16) -> Params:
    chans = cfg.encoder_channels
    rates = tuple(reversed(cfg.upsample_rates))
    keys = jax.random.split(key, 3 + 2 * len(rates))
    p: Params = {
        "conv_pre": _winit(keys[0], 7, 1, chans[0], dtype),
        "downs": [],
        "resblocks": [],
        "conv_post": _winit(keys[1], 3, chans[-1], cfg.codebook_dim, dtype),
    }
    for i, r in enumerate(rates):
        cin, cout = chans[i], chans[i + 1]
        p["downs"].append(_winit(keys[2 + 2 * i], 2 * r, cin, cout, dtype))
        p["resblocks"].append(init_resblock(keys[3 + 2 * i], cout, cfg.resblock_dilations, dtype))
    return p


def encode_frames(params: Params, cfg: CodecConfig, wav: jnp.ndarray) -> jnp.ndarray:
    """wav: (B, T_samples) → (B, T_frames, codebook_dim)."""
    rates = tuple(reversed(cfg.upsample_rates))
    x = wav[..., None].astype(params["conv_pre"].dtype)  # (B, T, 1)
    x = conv1d(x, params["conv_pre"])
    for w, rb, r in zip(params["downs"], params["resblocks"], rates):
        x = conv1d(leaky_relu(x), w, stride=r)
        x = resblock(rb, x, cfg.resblock_dilations)
    return conv1d(leaky_relu(x), params["conv_post"])


# ---------------------------------------------------------------------------
# Residual vector quantizer
# ---------------------------------------------------------------------------


def init_rvq(key, cfg: CodecConfig) -> Params:
    keys = jax.random.split(key, cfg.n_codebooks)
    books = [
        jax.random.normal(k, (cfg.codebook_size, cfg.codebook_dim), jnp.float32) * 0.05
        for k in keys
    ]
    return {"codebooks": jnp.stack(books)}  # (nq, size, dim)


def rvq_quantize(params: Params, frames: jnp.ndarray) -> jnp.ndarray:
    """frames: (B, T, dim) → codes (B, T, nq) by greedy residual NN search."""
    books = params["codebooks"]  # (nq, size, dim)
    residual = frames.astype(jnp.float32)
    codes = []
    for q in range(books.shape[0]):
        book = books[q]  # (size, dim)
        # Squared L2 distance via the matmul identity (MXU-friendly)
        dots = jnp.einsum("btd,sd->bts", residual, book)
        norms = jnp.sum(book * book, axis=-1)
        idx = jnp.argmax(2.0 * dots - norms[None, None, :], axis=-1)
        codes.append(idx)
        residual = residual - book[idx]
    return jnp.stack(codes, axis=-1).astype(jnp.int32)


def rvq_dequantize(params: Params, codes: jnp.ndarray) -> jnp.ndarray:
    """codes: (B, T, nq) → frame embeddings (B, T, dim)."""
    books = params["codebooks"]
    out = 0.0
    for q in range(books.shape[0]):
        out = out + books[q][codes[..., q]]
    return out


# ---------------------------------------------------------------------------
# Decoder / vocoder (frame embeddings → waveform)
# ---------------------------------------------------------------------------


def init_decoder(key, cfg: CodecConfig, dtype=jnp.bfloat16) -> Params:
    chans = cfg.decoder_channels
    keys = jax.random.split(key, 3 + 2 * len(cfg.upsample_rates))
    p: Params = {
        "conv_pre": _winit(keys[0], 7, cfg.codebook_dim, chans[0], dtype),
        "ups": [],
        "resblocks": [],
        "conv_post": _winit(keys[1], 7, chans[len(cfg.upsample_rates)], 1, dtype),
    }
    for i, r in enumerate(cfg.upsample_rates):
        cin, cout = chans[i], chans[i + 1]
        p["ups"].append(_winit(keys[2 + 2 * i], 2 * r, cin, cout, dtype))
        p["resblocks"].append(init_resblock(keys[3 + 2 * i], cout, cfg.resblock_dilations, dtype))
    return p


def decode_frames(params: Params, cfg: CodecConfig, frames: jnp.ndarray) -> jnp.ndarray:
    """frames: (B, T, dim) → waveform (B, T * hop) in [-1, 1].

    Compute dtype follows the parameters (bf16 in production; fp32 params
    enable exact torch-oracle parity tests, tests/test_torch_oracle.py).
    """
    x = frames.astype(params["conv_pre"].dtype)
    x = conv1d(x, params["conv_pre"])
    for w, rb, r in zip(params["ups"], params["resblocks"], cfg.upsample_rates):
        x = conv_transpose1d(leaky_relu(x), w, stride=r)
        x = resblock(rb, x, cfg.resblock_dilations)
    x = conv1d(leaky_relu(x), params["conv_post"])
    return jnp.tanh(x.astype(jnp.float32))[..., 0]


def init_codec(key, cfg: CodecConfig, dtype=jnp.bfloat16) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder": init_encoder(k1, cfg, dtype),
        "rvq": init_rvq(k2, cfg),
        "decoder": init_decoder(k3, cfg, dtype),
    }


def encode_to_codes(params: Params, cfg: CodecConfig, wav: jnp.ndarray) -> jnp.ndarray:
    """Waveform (B, S) → RVQ codes (B, T, nq)."""
    frames = encode_frames(params["encoder"], cfg, wav)
    return rvq_quantize(params["rvq"], frames)


def decode_from_codes(params: Params, cfg: CodecConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """RVQ codes (B, T, nq) → waveform (B, T*hop)."""
    frames = rvq_dequantize(params["rvq"], codes)
    return decode_frames(params["decoder"], cfg, frames)
