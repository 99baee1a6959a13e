"""Inaudible spread-spectrum audio watermarking (embed + detect) in JAX.

TPU-native replacement for the ``perth`` implicit watermarker the
reference's Chatterbox provider requires (``chatterbox.py:87-94``): a
seeded ±1 pseudo-noise sequence is shaped by the signal's local RMS
envelope (so it hides under the program material) and added at a small
level; detection correlates the residual against the same PN sequence and
reports a normalized score.

The PN sequence is **position-indexed** (the chip at absolute sample
position ``p`` depends only on ``(key, p)``, generated in 1024-chip
blocks via ``fold_in``), so a streaming synthesizer can watermark each
emitted window at its absolute offset and produce bit-identical chips to
the full-utterance embed — see ``ChatterboxModel.stream_chunks``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

DEFAULT_KEY = 0x5EED
_STRENGTH = 0.003  # ~ -50 dBFS relative to envelope
_ENV_WINDOW = 1024
_PN_BLOCK = 1024


def _pn_span(n: int, key: int, offset: jnp.ndarray) -> jnp.ndarray:
    """±1 PN chips for absolute positions ``[offset, offset + n)``.

    Block-seeded: block ``b`` is ``bernoulli(fold_in(PRNGKey(key), b))``,
    so any window reproduces exactly the chips the full-length sequence
    has at those positions (``offset`` may be a traced scalar).
    """
    b = _PN_BLOCK
    nb = n // b + 2  # covers offset%b + n chips
    b0 = offset // b
    base = jax.random.PRNGKey(key)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(b0 + jnp.arange(nb))
    bits = jax.vmap(lambda k: jax.random.bernoulli(k, 0.5, (b,)))(keys)
    flat = jnp.where(bits.reshape(-1), 1.0, -1.0)
    return jax.lax.dynamic_slice(flat, (offset - b0 * b,), (n,))


@partial(jax.jit, static_argnames=("key",))
def _embed_core(audio: jnp.ndarray, key: int, offset: jnp.ndarray) -> jnp.ndarray:
    n = audio.shape[-1]
    pn = _pn_span(n, key, offset)
    # Local RMS envelope: centered windowed mean of x² via prefix sums
    # (O(N) elementwise — a 1024-tap convolve compiles pathologically on
    # some TPU toolchains).
    x2 = audio * audio
    padded = jnp.pad(x2, (_ENV_WINDOW // 2, _ENV_WINDOW // 2), mode="edge")
    csum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(padded)])
    window_sums = csum[_ENV_WINDOW:] - csum[:-_ENV_WINDOW]
    env = jnp.sqrt(window_sums[:n] / _ENV_WINDOW)
    return audio + pn * env * _STRENGTH


@partial(jax.jit, static_argnames=("key",))
def _detect_core(audio: jnp.ndarray, key: int, offset: jnp.ndarray) -> jnp.ndarray:
    n = audio.shape[-1]
    pn = _pn_span(n, key, offset)
    # Whiten with a first-order difference to suppress the host signal,
    # then correlate against the equally-whitened PN template.
    resid = jnp.diff(audio, prepend=audio[:1])
    tmpl = jnp.diff(pn, prepend=pn[:1])
    num = jnp.sum(resid * tmpl)
    den = jnp.sqrt(jnp.sum(resid * resid) * jnp.sum(tmpl * tmpl)) + 1e-12
    return num / den * jnp.sqrt(jnp.float32(n))


def apply_watermark(audio, key: int = DEFAULT_KEY, offset: int = 0) -> jnp.ndarray:
    """Embed the watermark; returns the watermarked waveform.

    ``offset`` is the waveform's absolute start position in the utterance
    (streaming windows pass their start sample so the chips line up with
    the full-utterance embed).
    """
    a = jnp.asarray(audio, jnp.float32).reshape(-1)
    if a.shape[-1] < _ENV_WINDOW:
        return a
    return _embed_core(a, key, jnp.int32(offset))


def detect_watermark(audio, key: int = DEFAULT_KEY, offset: int = 0) -> float:
    """Normalized detection score; > ~5 indicates the watermark is present.

    ``offset``: absolute position of ``audio[0]`` in the original
    utterance (0 for a full recording; a known crop position re-aligns
    the PN chips for detection on excerpts).
    """
    a = jnp.asarray(audio, jnp.float32).reshape(-1)
    if a.shape[-1] < _ENV_WINDOW:
        return 0.0
    return float(_detect_core(a, key, jnp.int32(offset)))
