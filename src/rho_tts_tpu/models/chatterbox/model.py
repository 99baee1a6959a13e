"""Chatterbox-class voice-cloning TTS: CFG-guided AR over speech tokens.

Decode design (TPU-first):

* Conditional and unconditional streams are folded into ONE batch of 2B
  rows, so classifier-free guidance costs a batch doubling instead of two
  sequential passes; logits mix as ``cond + w * (cond - uncond)``
  (upstream chatterbox semantics: w=0 disables guidance).
* Voice conditioning: the shared GE2E speaker encoder's embedding is
  projected into the prompt as a prefix token (reference audio is encoded
  once and cached — parity with the reference's conditionals cache,
  ``chatterbox.py:113-121``).
* The sampling loop is the same chunked ``lax.scan`` pattern as the Qwen
  family; "faster" mode caps cache length / new tokens
  (parity: ``chatterbox.py:125-127``).
* The token→waveform decoder is a single-codebook conv vocoder at 25 Hz
  frame rate (hop 960 at 24 kHz); output is watermarked on device.
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.watermark import _ENV_WINDOW, apply_watermark
from ...utils.tokenizer import load_tokenizer
from .. import transformer as tfm
from ..qwen import codec as codec_lib
from ..qwen.config import CodecConfig
from ..qwen.model import _derive_row_seeds, _sample_token_seeded

logger = logging.getLogger(__name__)

Params = Dict[str, Any]

# Decode steps per compiled scan chunk. Single-stream decode is dominated
# by per-chunk host syncs on relay-tunneled backends, so the chunk is
# larger than Qwen's batched decode (whose syncs amortize over the batch).
CHUNK = 128
PROMPT_BUCKET = 64


@dataclasses.dataclass(frozen=True)
class ChatterboxConfig:
    name: str = "standard"
    talker: tfm.TransformerConfig = dataclasses.field(
        default_factory=lambda: tfm.TransformerConfig(
            hidden=1024, layers=30, q_heads=16, kv_heads=16, head_dim=64, ffn=4096
        )
    )
    codec: CodecConfig = dataclasses.field(
        default_factory=lambda: CodecConfig(
            sample_rate=24000,
            upsample_rates=(8, 6, 5, 4),  # hop 960 → 25 Hz
            n_codebooks=1,
            codebook_size=4096,
            codebook_dim=512,
            decoder_channels=(512, 256, 128, 64, 32),
            encoder_channels=(32, 64, 128, 256, 512),
        )
    )
    text_vocab: int = 2048
    max_position_embeddings: int = 4096
    temperature: float = 1.0
    top_k: int = 50
    max_cache_len: Optional[int] = None  # "faster" mode sets 1500
    max_new_tokens: Optional[int] = None  # "faster" mode sets 1000

    @property
    def speech_vocab(self) -> int:
        return self.codec.codebook_size + 3

    @property
    def speech_bos(self) -> int:
        return self.codec.codebook_size

    @property
    def speech_eos(self) -> int:
        return self.codec.codebook_size + 1

    @property
    def speech_pad(self) -> int:
        return self.codec.codebook_size + 2


PRESETS = {
    "standard": ChatterboxConfig(),
    "faster": ChatterboxConfig(name="faster", max_cache_len=1500, max_new_tokens=1000),
    "tiny": ChatterboxConfig(
        name="tiny",
        talker=tfm.TransformerConfig(
            hidden=64, layers=2, q_heads=4, kv_heads=2, head_dim=16, ffn=128
        ),
        codec=CodecConfig(
            sample_rate=24000,
            upsample_rates=(4, 2),
            n_codebooks=1,
            codebook_size=64,
            codebook_dim=32,
            decoder_channels=(32, 16, 8),
            encoder_channels=(8, 16, 32),
        ),
        text_vocab=512,
        max_position_embeddings=512,
    ),
}


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def init_params(key, cfg: ChatterboxConfig) -> Params:
    kt, ke, ka, kp, kh, kc = jax.random.split(key, 6)
    t = cfg.talker
    return {
        "text_embed": (jax.random.normal(ke, (cfg.text_vocab, t.hidden), jnp.float32) * 0.02).astype(t.dtype),
        "speech_embed": (jax.random.normal(ka, (cfg.speech_vocab, t.hidden), jnp.float32) * 0.02).astype(t.dtype),
        "spk_proj": (jax.random.normal(kp, (256, t.hidden), jnp.float32) * 0.05).astype(t.dtype),
        "talker": tfm.init_stack(kt, t),
        "lm_head": tfm._dense_init(kh, t.hidden, cfg.speech_vocab, t.dtype),
        "codec": codec_lib.init_codec(kc, cfg.codec),
    }


@partial(jax.jit, static_argnames=("cfg",))
def _prefill(
    params, cfg: ChatterboxConfig,
    ids_slotted, text_mask, bos_mask, spk_mask, spk,
    rope_pos, attn_mask, cache_k, cache_v, key_valid,
):
    """Prompt embedding + prefill in ONE program.

    The (2, P) prompt rows [cond, uncond] are described by host-built masks
    (text / BOS / speaker-prefix slots); assembling the embeddings on
    device avoids a chain of eager gather dispatches per generate() call.
    """
    b, p = ids_slotted.shape
    dt = params["text_embed"].dtype
    emb = params["text_embed"][ids_slotted]  # (2, P, H)
    spk_e = (spk.astype(jnp.float32) @ params["spk_proj"].astype(jnp.float32)).astype(dt)
    bos_e = params["speech_embed"][cfg.speech_bos].astype(dt)
    # Masks arrive as f32 from the host — cast to the embedding dtype first
    # so the whole prefill stays bf16 (an f32 product here would silently
    # upcast every layer's activations).
    embeds = (
        emb * text_mask[..., None].astype(dt)
        + bos_e[None, None] * bos_mask[..., None].astype(dt)
        + spk_e[None, None] * spk_mask[..., None].astype(dt)
    )
    h, (ck, cv) = tfm.stack_forward(
        params["talker"], cfg.talker, embeds, rope_pos,
        kv_caches=(cache_k, cache_v), cache_len=jnp.int32(0),
        attn_mask=attn_mask, key_valid=key_valid, fused_prefill=True,
    )
    key_valid = key_valid.at[:, :p].set(attn_mask)
    logits = jax.lax.dot(h[:, -1], params["lm_head"], preferred_element_type=jnp.float32)
    return logits, ck, cv, key_valid


def _cfg_sample(logits2b, seeds, frames, temperature, top_k, cfg_weight):
    """logits2b: (2B, V) rows [cond..., uncond...] → sampled (B,) tokens.

    Classifier-free-guidance mix follows the upstream chatterbox semantics
    ``cond + w * (cond - uncond)``: w=0 disables guidance (pure
    conditional) and larger w extrapolates away from the unconditional
    stream. Sampling noise is a pure function of ``(seeds[i], frames[i])``
    (see ``qwen.model._sample_token_seeded``) — schedule-reproducible, so
    a request decoded one-shot and the same request decoded inside the
    serving slot batch draw IDENTICAL tokens given the same per-request
    seed. ``temperature`` / ``cfg_weight`` may be scalars or (B,) arrays.
    """
    b2 = logits2b.shape[0]
    b = b2 // 2
    cond, uncond = logits2b[:b], logits2b[b:]
    w = jnp.broadcast_to(jnp.asarray(cfg_weight, jnp.float32), (b,))[:, None]
    mixed = cond + w * (cond - uncond)
    return _sample_token_seeded(mixed, seeds, frames, temperature, top_k)


@partial(jax.jit, static_argnames=("cfg", "steps", "top_k"))
def _decode_chunk(
    params, cfg: ChatterboxConfig,
    cache_k, cache_v, key_valid,
    slot0, rope_base, last_tok, done, seeds,
    temperature, cfg_weight, step_base, min_new, steps: int, top_k: int,
):
    b2 = key_valid.shape[0]
    b = b2 // 2

    def step(carry, t):
        cache_k, cache_v, key_valid, last_tok, done = carry
        # Same sampled token feeds both cond and uncond rows
        tok2b = jnp.concatenate([last_tok, last_tok])
        x = params["speech_embed"][tok2b][:, None, :]
        pos = (rope_base + t)[:, None]
        slot = slot0 + t
        h, (cache_k, cache_v) = tfm.stack_forward(
            params["talker"], cfg.talker, x, pos,
            kv_caches=(cache_k, cache_v), cache_len=slot,
            attn_mask=None, key_valid=key_valid,
        )
        key_valid = key_valid.at[:, slot].set(True)
        logits = jax.lax.dot(h[:, -1], params["lm_head"], preferred_element_type=jnp.float32)
        # Minimum-duration floor: EOS masked below min_new tokens
        suppress = (step_base + t) < min_new
        logits = jnp.where(
            suppress, logits.at[:, cfg.speech_eos].set(-1e30), logits
        )
        frames = jnp.broadcast_to(step_base + t, (b,))
        tok = _cfg_sample(logits, seeds, frames, temperature, top_k, cfg_weight)
        newly_done = tok == cfg.speech_eos
        tok = jnp.where(done, cfg.speech_pad, tok)
        done = done | newly_done
        return (cache_k, cache_v, key_valid, tok, done), (tok, done)

    carry0 = (cache_k, cache_v, key_valid, last_tok, done)
    carry, (toks, dones) = jax.lax.scan(step, carry0, jnp.arange(steps))
    cache_k, cache_v, key_valid, last_tok, done = carry
    return (
        jnp.transpose(toks, (1, 0)),
        jnp.transpose(dones, (1, 0)),
        cache_k, cache_v, key_valid, last_tok, done,
    )


@partial(jax.jit, static_argnames=("cfg",))
def _vocode(params, cfg: ChatterboxConfig, tokens):
    """tokens (B, T) → raw waveform (B, T*hop).

    The watermark is embedded AFTER slicing to the true length (in
    :meth:`ChatterboxModel.generate` / ``stream_chunks``) so streaming
    windows can align the position-indexed PN chips with the one-shot
    embed — and so the envelope near the utterance end is computed from
    real samples, not pad-token garbage.
    """
    clamped = jnp.minimum(tokens, cfg.codec.codebook_size - 1)
    return codec_lib.decode_from_codes(params["codec"], cfg.codec, clamped[..., None])


def _vocode_masked(params, cfg: ChatterboxConfig, toks_dev, end: int, t: int):
    """Vocode the device-resident token history ``toks_dev[:t]`` with
    tokens ≥ ``end`` zeroed — the host fetches only done flags to learn
    ``end``; the tokens themselves never round-trip through the host
    (matches the old trim-then-zero-pad semantics exactly). The mask ops
    run eagerly on device arrays (no host payloads), keeping ``_vocode``
    as the single jit boundary."""
    full = toks_dev.shape[0]
    te = min(t, full)
    toks = toks_dev[:te]
    if t > te:
        toks = jnp.pad(toks, (0, t - te))
    toks = jnp.where(jnp.arange(t, dtype=jnp.int32) < end, toks, 0)
    return _vocode(params, cfg, toks[None])


class ChatterboxModel:
    """Voice-cloning TTS with conditionals caching and CFG decoding."""

    def __init__(
        self,
        cfg: ChatterboxConfig,
        params: Optional[Params] = None,
        seed: int = 0,
        quantization: Optional[str] = None,
        model_path: Optional[str] = None,
    ):
        self.cfg = cfg
        self.sr = cfg.codec.sample_rate
        # A checkpoint directory may bundle its tokenizer.json; text ids
        # must come from the vocabulary the weights were trained on.
        self.tokenizer = load_tokenizer(model_path, vocab_size=cfg.text_vocab)
        if params is None:
            params = jax.jit(init_params, static_argnums=1)(jax.random.PRNGKey(seed), cfg)
        if quantization in ("int8", "int4"):
            from ..quantization import quantize_stack

            params = {**params, "talker": quantize_stack(params["talker"], quantization)}
        elif quantization not in (None, "none"):
            raise ValueError(f"Unsupported quantization: {quantization}")
        self.quantization = quantization
        self.params = params
        self._speaker_encoder = None
        self.conditionals: Optional[np.ndarray] = None  # active speaker embedding
        #: set by parallel.inference.enable_data_parallel /
        #: enable_tensor_parallel for mesh decode (same contract as
        #: QwenTTSModel.mesh); None = single chip.
        self.mesh = None

    @classmethod
    def from_pretrained(
        cls,
        device: str = "tpu",
        implementation: str = "standard",
        seed: int = 0,
        quantization: Optional[str] = None,
        model_path: Optional[str] = None,
    ):
        """Build the model; converts local T3 weights when ``model_path``
        points at a checkpoint (dir of safetensors or a ``t3_cfg.pt``).

        Parity: the reference loads upstream weights eagerly at ctor
        (``src/rho_tts/providers/chatterbox.py:78-96``); without a local
        checkpoint this falls back to deterministic random init (the
        compiled decode path is identical either way).
        """
        import os

        from .. import checkpoint as ckpt_lib

        if model_path and os.path.isdir(str(model_path)) and ckpt_lib.is_native_checkpoint(model_path):
            # Host-staged restore + one pipelined device_put (see
            # QwenTTSModel.from_pretrained for the relay measurement).
            params, manifest = ckpt_lib.load_params(model_path, family="chatterbox")
            params = jax.device_put(params)
            cfg = PRESETS.get(manifest.get("preset", implementation), PRESETS["standard"])
            saved_quant = manifest.get("quantization")
            if saved_quant == "none":
                saved_quant = None
            # Same contract as QwenTTSModel.from_pretrained: explicit
            # requests (incl. "none" = dense) must match a quantized
            # export; int8/int4 on a dense export quantizes in the ctor.
            requested = None if quantization == "none" else quantization
            if quantization is not None and saved_quant is not None and requested != saved_quant:
                raise ValueError(
                    f"Checkpoint at {model_path} was exported with "
                    f"quantization={saved_quant!r}; cannot serve as {quantization!r}"
                )
            return cls(
                cfg, params=params, seed=seed,
                quantization=requested or saved_quant, model_path=model_path,
            )

        cfg = PRESETS.get(implementation, PRESETS["standard"])
        params = None
        if model_path:
            try:
                from .weights import load_checkpoint

                params = load_checkpoint(model_path, cfg)
            except Exception as exc:  # noqa: BLE001
                logger.warning("Chatterbox checkpoint load failed (%s); random init", exc)
        return cls(
            cfg, params=params, seed=seed, quantization=quantization,
            model_path=model_path,
        )

    def save_checkpoint(self, path: str) -> None:
        """Export the parameter tree as a native serving checkpoint
        (pre-quantized when the model is quantized — see
        ``models.checkpoint`` for the export-once/serve-many rationale)."""
        from .. import checkpoint as ckpt_lib

        preset = next(
            (k for k, v in PRESETS.items() if v is self.cfg), "standard"
        )
        ckpt_lib.save_params(
            path, self.params, family="chatterbox", preset=preset,
            quantization=self.quantization,
        )

    @property
    def sample_rate(self) -> int:
        return self.sr

    @property
    def config(self) -> ChatterboxConfig:
        return self.cfg

    # -- Mesh sharding helpers ----------------------------------------------
    #
    # CFG decode works over 2k transformer rows ([cond × k, uncond × k]) with
    # per-REQUEST (k,) sampling state. DP shards whichever axes divide the
    # mesh ``data`` axis (a non-dividing axis stays replicated — the CFG row
    # doubling makes Qwen-style row padding awkward, and a replicated small
    # array costs nothing); TP shards the KV cache over heads to match the
    # column-parallel wqkv, so meshed attention runs without resharding.

    def _shard(self, x, batch_axis: int = 0):
        """Shard one array's batch axis over the mesh ``data`` axis when it
        divides; replicate otherwise."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = self.mesh.shape.get("data", 1)
        spec = [None] * x.ndim
        if dp > 1 and x.shape[batch_axis] % dp == 0:
            spec[batch_axis] = "data"
        return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

    def _shard_kv(self, cache):
        """Shard a (L, B, S, Hkv, D) KV cache: rows over ``data`` (when they
        divide) and — under tensor parallelism — heads over ``model``."""
        if self.mesh is None:
            return cache
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = self.mesh.shape.get("data", 1)
        axes = [None] * cache.ndim
        if dp > 1 and cache.shape[1] % dp == 0:
            axes[1] = "data"
        if self.mesh.shape.get("model", 1) > 1:
            axes[3] = "model"
        return jax.device_put(cache, NamedSharding(self.mesh, P(*axes)))

    @property
    def speaker_encoder(self):
        if self._speaker_encoder is None:
            from ..speaker import SpeakerEncoder

            self._speaker_encoder = SpeakerEncoder()
        return self._speaker_encoder

    def prepare_conditionals(self, ref_audio_path: str) -> np.ndarray:
        """Speaker conditioning from reference audio (cacheable by caller)."""
        from ...audio_io import load_wav

        wav, sr = load_wav(ref_audio_path)
        return self.speaker_encoder.embed_utterance(wav, sr)

    def _start_decode(
        self,
        text: str,
        audio_prompt_path: Optional[str],
        temperature: float,
        cfg_weight: float,
        max_new_tokens: Optional[int],
        max_cache_len: Optional[int],
        min_new_tokens: int,
        rng,
        candidates: int = 1,
        seeds=None,
    ):
        """Prompt assembly + prefill + first sampled token.

        Shared by :meth:`generate` (device-resident token history, lagged
        early exit) and :meth:`stream_chunks` (per-chunk fetch + sliding
        vocode); returns the decode-loop carry as a dict.

        ``candidates > 1`` replicates the prompt into k conditional + k
        unconditional rows: one CFG batch decodes k independent samples of
        the same text (per-row sampling seeds differ), the TPU-native way
        to run the provider's validation retry loop — k retry iterations
        for roughly the cost of one at these batch sizes (the decode step
        is weight-read-bound).

        ``seeds`` (one per candidate) pins the schedule-reproducible
        per-row sampling streams; they default to draws from ``rng``.
        """
        cfg = self.cfg
        k = int(candidates)

        spk = None
        if audio_prompt_path is not None:
            spk = self.prepare_conditionals(audio_prompt_path)
        elif self.conditionals is not None:
            spk = np.asarray(self.conditionals)

        ids = np.asarray(self.tokenizer.encode(text), np.int32)
        nt = int(ids.shape[0])
        has_spk = spk is not None
        # Left-padded prompt rows, described by host-built masks so the
        # embedding assembly runs inside the prefill program:
        #   cond   = [pad…, spk?, text…, BOS]   uncond = [pad…, spk?, BOS]
        # Rows are [cond × k, uncond × k] (the _cfg_sample layout).
        lens = [nt + 1 + int(has_spk)] * k + [1 + int(has_spk)] * k
        p = _round_up(max(lens), PROMPT_BUCKET)
        ids_slotted = np.zeros((2 * k, p), np.int32)
        text_mask = np.zeros((2 * k, p), np.float32)
        bos_mask = np.zeros((2 * k, p), np.float32)
        spk_mask = np.zeros((2 * k, p), np.float32)
        ids_slotted[:k, p - 1 - nt : p - 1] = ids
        text_mask[:k, p - 1 - nt : p - 1] = 1.0
        bos_mask[:, p - 1] = 1.0
        if has_spk:
            spk_mask[:k, p - 2 - nt] = 1.0
            spk_mask[k:, p - 2] = 1.0
        spk_vec = np.asarray(spk, np.float32) if has_spk else np.zeros(
            self.params["spk_proj"].shape[0], np.float32
        )
        rope_pos = np.stack(
            [np.maximum(np.arange(p) - (p - n), 0) for n in lens]
        ).astype(np.int32)
        attn_mask = np.stack([np.arange(p) >= (p - n) for n in lens])

        max_new = max_new_tokens or cfg.max_new_tokens
        if max_new is None:
            max_new = int(np.clip(len(text) * 2.0 + 50, CHUNK, 2000))
        n_chunks = _round_up(max_new, CHUNK) // CHUNK
        s = p + n_chunks * CHUNK
        cache_cap = max_cache_len or cfg.max_cache_len
        if cache_cap is not None:
            s = min(s, _round_up(max(cache_cap, p + CHUNK), CHUNK))
            n_chunks = max((s - p) // CHUNK, 1)

        cache_k, cache_v = tfm.make_kv_cache(cfg.talker, 2 * k, s)
        cache_k, cache_v = self._shard_kv(cache_k), self._shard_kv(cache_v)
        key_valid = self._shard(jnp.zeros((2 * k, s), bool))

        logits, cache_k, cache_v, key_valid = _prefill(
            self.params, cfg,
            self._shard(jnp.asarray(ids_slotted)), self._shard(jnp.asarray(text_mask)),
            self._shard(jnp.asarray(bos_mask)), self._shard(jnp.asarray(spk_mask)),
            jnp.asarray(spk_vec),
            self._shard(jnp.asarray(rope_pos)), self._shard(jnp.asarray(attn_mask)),
            cache_k, cache_v, key_valid,
        )
        if seeds is None:
            seeds = _derive_row_seeds(rng, k)
        else:
            if len(seeds) != k:
                raise ValueError(f"seeds has {len(seeds)} entries for {k} candidates")
            seeds = jnp.asarray(np.asarray(seeds, np.int32))
        if min_new_tokens > 0:
            logits = logits.at[:, cfg.speech_eos].set(-1e30)
        tok0 = _cfg_sample(
            logits, seeds, jnp.zeros((k,), jnp.int32),
            jnp.float32(temperature), cfg.top_k, jnp.float32(cfg_weight),
        )
        done = tok0 == cfg.speech_eos
        return {
            "cache_k": cache_k, "cache_v": cache_v, "key_valid": key_valid,
            "tok0": tok0, "done": done,
            "rope_base": jnp.asarray(lens, jnp.int32),
            "p": p, "n_chunks": n_chunks, "seeds": seeds,
        }

    def generate(
        self,
        text: str,
        audio_prompt_path: Optional[str] = None,
        temperature: float = 1.0,
        cfg_weight: float = 0.6,
        max_new_tokens: Optional[int] = None,
        max_cache_len: Optional[int] = None,
        min_new_tokens: int = 0,
        rng=None,
        cancel_check=None,
        seed: Optional[int] = None,
    ):
        """Synthesize one text; returns a 1-D waveform (jax array).

        ``min_new_tokens`` masks EOS for the first N tokens — a
        minimum-duration floor (HF-generation-style ``min_new_tokens``;
        also keeps random-weight throughput benchmarks honest).

        ``seed`` pins the schedule-reproducible per-frame sampling stream
        (noise = f(seed, frame index)); a serving-engine request with the
        same seed draws identical tokens. Defaults to a draw from ``rng``.
        """
        cfg = self.cfg
        if rng is None:
            rng = jax.random.PRNGKey(0)

        st = self._start_decode(
            text, audio_prompt_path, temperature, cfg_weight,
            max_new_tokens, max_cache_len, min_new_tokens, rng,
            seeds=None if seed is None else [seed],
        )
        toks_dev, done_np = self._decode_all(
            st, temperature, cfg_weight, min_new_tokens, cancel_check
        )

        # The tokens stay ON DEVICE: fetch only the done bitmap (one small
        # transfer) to find the EOS cut, then vocode the device-resident
        # history in place with tokens ≥ end masked to the pad value the
        # old host path wrote (zero).
        done_seq = done_np[0]
        d = np.nonzero(done_seq)[0]
        end = max(int(d[0]) if d.size else done_seq.shape[0], 1)

        t_pad = _round_up(end, CHUNK)
        wav = _vocode_masked(self.params, cfg, toks_dev[0], end, t_pad)
        return apply_watermark(wav[0, : end * cfg.codec.hop])

    def _decode_all(self, st, temperature, cfg_weight, min_new_tokens, cancel_check):
        """Run the chunked decode loop to completion (device-resident).

        Token/done chunks stay ON DEVICE. Early exit uses a LAGGED flag:
        chunk k's all-done scalar is fetched while chunk k+1 computes, so
        the host never stalls the device queue (worst case one surplus
        chunk after EOS instead of a blocking relay round-trip per chunk).
        Returns (toks_dev (B, T) device array, done_np (B, T) np bool).
        """
        cfg = self.cfg
        cache_k, cache_v, key_valid = st["cache_k"], st["cache_v"], st["key_valid"]
        tok0, done, seeds = st["tok0"], st["done"], st["seeds"]
        rope_base, p, n_chunks = st["rope_base"], st["p"], st["n_chunks"]

        all_toks = [tok0[:, None]]
        all_done = [done[:, None]]
        last_tok = tok0
        slot0 = jnp.int32(p)
        prev_flag = None

        for _ in range(n_chunks):
            if cancel_check is not None:
                cancel_check()
            (toks, dones, cache_k, cache_v, key_valid, last_tok, done) = _decode_chunk(
                self.params, cfg, cache_k, cache_v, key_valid,
                slot0, rope_base + (slot0 - jnp.int32(p)), last_tok, done, seeds,
                jnp.float32(temperature), jnp.float32(cfg_weight),
                slot0 - jnp.int32(p) + 1, jnp.int32(min_new_tokens),
                CHUNK, cfg.top_k,
            )
            all_toks.append(toks)
            all_done.append(dones)
            slot0 = slot0 + CHUNK
            # Early exit on the PREVIOUS chunk's flag: it is already
            # materialized, so the fetch overlaps the chunk just dispatched
            # (worst case one surplus chunk, never a device stall).
            if prev_flag is not None and bool(np.asarray(prev_flag)):
                break
            prev_flag = jnp.all(done)

        toks_dev = jnp.concatenate(all_toks, axis=1)
        done_np = np.asarray(jnp.concatenate(all_done, axis=1))
        return toks_dev, done_np

    def generate_candidates(
        self,
        text: str,
        candidates: int,
        audio_prompt_path: Optional[str] = None,
        temperature: float = 1.0,
        cfg_weight: float = 0.6,
        max_new_tokens: Optional[int] = None,
        max_cache_len: Optional[int] = None,
        min_new_tokens: int = 0,
        rng=None,
        cancel_check=None,
        seeds=None,
    ):
        """Synthesize ``candidates`` independent samples of one text in a
        single CFG batch (2k rows); returns a list of 1-D waveforms.

        The TPU-native form of the provider's validation retry loop
        (reference iterates one generation per retry,
        ``src/rho_tts/base_tts.py:770-898`` with chatterbox
        ``max_iterations=50``): at these batch sizes the decode step is
        weight-read-bound, so k candidates cost roughly one iteration's
        wall — the validator then picks the first passing sample.

        ``seeds`` (one per candidate) pins each candidate's sampling
        stream; candidate ``i`` reproduces ``generate(..., seed=seeds[i])``.
        """
        cfg = self.cfg
        if rng is None:
            rng = jax.random.PRNGKey(0)
        k = int(candidates)

        st = self._start_decode(
            text, audio_prompt_path, temperature, cfg_weight,
            max_new_tokens, max_cache_len, min_new_tokens, rng,
            candidates=k, seeds=seeds,
        )
        toks_dev, done_np = self._decode_all(
            st, temperature, cfg_weight, min_new_tokens, cancel_check
        )

        # Per-row EOS cut from the done bitmap; one bucketed vocode for
        # all candidates (rows masked past their own end).
        ends = []
        for b in range(k):
            d = np.nonzero(done_np[b])[0]
            ends.append(max(int(d[0]) if d.size else done_np.shape[1], 1))
        t_pad = _round_up(max(ends), CHUNK)
        ends_arr = jnp.asarray(np.asarray(ends, np.int32))
        full = toks_dev.shape[1]
        toks = toks_dev[:, :t_pad]
        if t_pad > full:
            toks = jnp.pad(toks, ((0, 0), (0, t_pad - full)))
        toks = jnp.where(
            jnp.arange(t_pad, dtype=jnp.int32)[None, :] < ends_arr[:, None], toks, 0
        )
        wavs = _vocode(self.params, cfg, toks)
        hop = cfg.codec.hop
        return [apply_watermark(wavs[b, : ends[b] * hop]) for b in range(k)]

    def stream_chunks(
        self,
        text: str,
        audio_prompt_path: Optional[str] = None,
        temperature: float = 1.0,
        cfg_weight: float = 0.6,
        max_new_tokens: Optional[int] = None,
        max_cache_len: Optional[int] = None,
        min_new_tokens: int = 0,
        rng=None,
        cancel_check=None,
        context_frames: int = 32,
        seed: Optional[int] = None,
    ):
        """Incremental synthesis: yields waveform pieces per decode chunk.

        Same sliding-window vocode design as
        ``QwenTTSModel.stream_chunks`` (the conv vocoder is local, so a
        window with ``context_frames`` of context reproduces the
        full-utterance vocode for every emitted sample; golden-tested vs
        :meth:`generate`). The watermark's PN chips are position-indexed
        (``ops.watermark``), so each window is embedded at its absolute
        sample offset — the concatenated stream carries the SAME watermark
        as the one-shot path and detects with ``detect_watermark(...,
        offset=0)`` on the full stream.

        Yields ``(waveform_piece (S,), sample_rate)``. Single stream.
        """
        cfg = self.cfg
        if rng is None:
            rng = jax.random.PRNGKey(0)

        st = self._start_decode(
            text, audio_prompt_path, temperature, cfg_weight,
            max_new_tokens, max_cache_len, min_new_tokens, rng,
            seeds=None if seed is None else [seed],
        )
        cache_k, cache_v, key_valid = st["cache_k"], st["cache_v"], st["key_valid"]
        last_tok, done, seeds = st["tok0"], st["done"], st["seeds"]
        rope_base, p, n_chunks = st["rope_base"], st["p"], st["n_chunks"]

        hop = cfg.codec.hop
        toks_np = np.asarray(last_tok)[:1]  # cond-row token history, grows
        finished = bool(np.asarray(done)[0])
        emitted = 0  # frames already yielded
        slot0 = jnp.int32(p)

        def vocode_span(lo: int, hi: int, emit_from: int, emit_to: int):
            """Vocode toks[lo:hi]; return watermarked samples for frames
            [emit_from, emit_to). ``lo`` is widened so the window always
            holds at least one envelope window of samples (relevant for
            tiny-config hops)."""
            need = -(-_ENV_WINDOW // hop) + 1
            lo = min(lo, max(hi - need, 0))
            window = toks_np[lo:hi]
            t = _round_up(window.shape[0], CHUNK)
            batch = jnp.asarray(np.pad(window, (0, t - window.shape[0]))[None])
            wav = _vocode(self.params, cfg, batch)[0, : (hi - lo) * hop]
            marked = apply_watermark(wav, offset=lo * hop)
            return marked[(emit_from - lo) * hop : (emit_to - lo) * hop]

        for _ in range(n_chunks):
            if finished:
                break
            if cancel_check is not None:
                cancel_check()
            (toks, dones, cache_k, cache_v, key_valid, last_tok, done) = _decode_chunk(
                self.params, cfg, cache_k, cache_v, key_valid,
                slot0, rope_base + (slot0 - jnp.int32(p)), last_tok, done, seeds,
                jnp.float32(temperature), jnp.float32(cfg_weight),
                slot0 - jnp.int32(p) + 1, jnp.int32(min_new_tokens),
                CHUNK, cfg.top_k,
            )
            slot0 = slot0 + CHUNK
            tt, dd = jax.device_get((toks, dones))
            tt, dd = np.asarray(tt)[0], np.asarray(dd)[0]
            hit = np.nonzero(dd)[0]
            if hit.size:
                tt = tt[: int(hit[0]) + 1]
                finished = True
            toks_np = np.concatenate([toks_np, tt])
            if finished and toks_np.shape[0] > 1 and (
                toks_np[-1] >= cfg.codec.codebook_size
            ):
                toks_np = toks_np[:-1]  # drop the EOS/pad frame itself
            total = toks_np.shape[0]

            safe = total if finished else max(total - context_frames, 0)
            if safe > emitted:
                lo = max(emitted - context_frames, 0)
                piece = vocode_span(lo, total, emitted, safe)
                emitted = safe
                yield piece, self.sr

        if emitted < toks_np.shape[0]:  # final flush (max_new reached)
            total = toks_np.shape[0]
            lo = max(emitted - context_frames, 0)
            yield vocode_span(lo, total, emitted, total), self.sr
