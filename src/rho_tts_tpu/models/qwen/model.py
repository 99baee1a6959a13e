"""Qwen-class codec-LM TTS model: AR talker + code predictor + codec.

Decode architecture (TPU-first):

* Prompts (text, speaker/reference conditioning, reference codec tokens)
  are LEFT-padded into a static-shape KV cache so every batch row's last
  prompt token lands on the same slot — one prefill program per bucket.
* The AR sampling loop is a jit'd ``lax.scan`` over fixed-size chunks
  (CHUNK steps per compiled call); the host checks cancellation and EOS
  between chunks only, so there are no per-token host round trips.
* Residual codebooks are predicted from the talker hidden state by a small
  MLP code predictor (one shot, no extra AR passes).
* The codec vocoder turns accumulated codes into a 24 kHz waveform in one
  batched conv program.

Replaces the CUDA ``qwen_tts`` dependency of the reference
(``src/rho_tts/providers/qwen.py:218-266`` — generate_voice_clone /
generate_custom_voice), rebuilt as JAX/XLA programs.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import profiling
from ...utils.tokenizer import load_tokenizer
from .. import transformer as tfm
from . import codec as codec_lib
from .config import PRESETS, QwenTTSConfig, resolve_config

logger = logging.getLogger(__name__)

Params = Dict[str, Any]

# Decode steps per compiled scan chunk (~5 s of audio at 12.5 Hz at the
# default). Larger chunks amortize per-chunk dispatch overhead on relay
# backends at the cost of coarser cancellation/EOS granularity; serving
# deployments set RHO_TTS_TPU_DECODE_CHUNK=128.
import os as _os

CHUNK = int(_os.environ.get("RHO_TTS_TPU_DECODE_CHUNK", "64"))


def _chunk() -> int:
    """Decode-chunk size, re-read from the env at call time.

    The module-level ``CHUNK`` is only the import-time snapshot kept for
    backwards compatibility (tests import it); call sites use this helper
    so setting ``RHO_TTS_TPU_DECODE_CHUNK`` after import takes effect.
    Different values compile distinct programs (the chunk is a static
    shape), so change it between generations, not mid-stream.
    """
    return int(_os.environ.get("RHO_TTS_TPU_DECODE_CHUNK", str(CHUNK)))
# Prompt bucket granularity (slots).
PROMPT_BUCKET = 64

# Named speakers for CustomVoice checkpoints (id → speaker-table row).
SPEAKERS = ["Chelsie", "Aidan", "Vivian", "Ryan", "Aria", "Ethan", "Luna", "Harper", "James"]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kv_window(needed: int, s: int):
    """Static attention-read bound for a decode chunk (or None for full S).

    The KV cache is allocated at the static worst case S; a chunk ending
    at slot ``needed`` can only attend to slots below it, so slicing the
    attention read to a bucketed prefix was expected to cut per-step KV
    HBM traffic early in long utterances. Measured on v5e (1.7B int8,
    1280 frames): 5-10% SLOWER at B∈{1,5} — XLA materializes the sliced
    cache as a copy per layer instead of narrowing the einsum's read, so
    the "saved" bandwidth is spent on the copy. Default is therefore OFF
    (``RHO_TTS_TPU_KV_BUCKET=0``); the mechanism stays env-gated (set a
    bucket size, e.g. 512) for experimentation on toolchains where the
    slice fuses, with bit-exact parity guarded by tests/test_kv_window.py.
    """
    bucket = int(_os.environ.get("RHO_TTS_TPU_KV_BUCKET", "0"))
    if bucket <= 0:
        return None
    w = _round_up(needed, bucket)
    return None if w >= s else w


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def init_params(key, cfg: QwenTTSConfig) -> Params:
    kt, ke, ka, ks_, kh, kc, kq = jax.random.split(key, 7)
    t = cfg.talker
    emb_scale = 0.02

    def emb(k, n, d):
        return (jax.random.normal(k, (n, d), jnp.float32) * emb_scale).astype(t.dtype)

    n_res = cfg.codec.n_codebooks - 1
    cp_hidden = max(t.hidden // 2, 64)
    kq1, kq2 = jax.random.split(kq)
    params: Params = {
        "text_embed": emb(ke, cfg.text_vocab, t.hidden),
        # Per-codebook audio embeddings (all sized audio_vocab for stacking;
        # residual books only use the first codebook_size rows).
        "audio_embed": emb(ka, cfg.codec.n_codebooks * cfg.audio_vocab, t.hidden).reshape(
            cfg.codec.n_codebooks, cfg.audio_vocab, t.hidden
        ),
        "speaker_embed": emb(ks_, cfg.n_speakers, t.hidden),
        "talker": tfm.init_stack(kt, t),
        "lm_head": tfm._dense_init(kh, t.hidden, cfg.audio_vocab, t.dtype),
        "code_predictor": {
            "w1": (jax.random.normal(kq1, (n_res, 2 * t.hidden, cp_hidden), jnp.float32) * 0.02).astype(t.dtype)
            if n_res
            else jnp.zeros((0, 2 * t.hidden, cp_hidden), t.dtype),
            "w2": (jax.random.normal(kq2, (n_res, cp_hidden, cfg.codec.codebook_size), jnp.float32) * 0.02).astype(t.dtype)
            if n_res
            else jnp.zeros((0, cp_hidden, cfg.codec.codebook_size), t.dtype),
        },
        "codec": codec_lib.init_codec(kc, cfg.codec),
    }
    return params


# ---------------------------------------------------------------------------
# Compiled stages
# ---------------------------------------------------------------------------


def prompt_embeds(
    params: Params,
    cfg: QwenTTSConfig,
    ids_slotted,
    text_mask,
    codes_slotted,
    code_mask,
    spk_ids,
    spk_mask,
    attn_mask,
) -> jnp.ndarray:
    """Assemble the prompt embedding matrix from host-built index/mask
    arrays (the [spk?][ref text][text][ref codes][BOS] layout of
    ``_build_prompt_arrays``). Shared by the prefill program and the
    teacher-forced distillation forward so both condition identically."""
    dt = params["text_embed"].dtype
    # Masks arrive as f32 — cast to the embedding dtype so the prefill
    # stays bf16 (f32 products would upcast every layer's activations).
    emb = params["text_embed"][ids_slotted] * text_mask[..., None].astype(dt)
    for q in range(cfg.codec.n_codebooks):
        emb = emb + params["audio_embed"][q][codes_slotted[..., q]] * code_mask[
            ..., None
        ].astype(dt)
    emb = emb + params["speaker_embed"][spk_ids][:, None, :] * spk_mask[..., None].astype(dt)
    bos_mask = attn_mask.astype(jnp.float32) - text_mask - code_mask - spk_mask
    emb = emb + params["audio_embed"][0][cfg.audio_bos][None, None] * bos_mask[
        ..., None
    ].astype(dt)
    return emb


@partial(jax.jit, static_argnames=("cfg", "fused", "sp_mesh"))
def _prefill(
    params: Params,
    cfg: QwenTTSConfig,
    ids_slotted: jnp.ndarray,  # (B, P) text/ref-text token ids, left-padded
    text_mask: jnp.ndarray,  # (B, P) f32: slots holding text tokens
    codes_slotted: jnp.ndarray,  # (B, P, nq) reference codec codes
    code_mask: jnp.ndarray,  # (B, P) f32
    spk_ids: jnp.ndarray,  # (B,) speaker-table rows
    spk_mask: jnp.ndarray,  # (B, P) f32: the speaker-prefix slot
    rope_pos: jnp.ndarray,  # (B, P)
    attn_mask: jnp.ndarray,  # (B, P) True on real tokens
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    key_valid: jnp.ndarray,  # (B, S)
    fused: bool = True,
    sp_mesh=None,  # static Mesh: sequence-parallel prefill (see below)
):
    """Prompt-embedding assembly + prefill in ONE program.

    The prompt layout ([spk?][ref text][text][ref codes][BOS], left-padded)
    is described by host-built index/mask arrays; assembling the embeddings
    on device replaces a chain of eager gather dispatches per call. The
    BOS slot is the last one, marked by code_mask∧text_mask both zero with
    attn_mask set — encoded here via an explicit bos term derived from
    attn_mask minus the other masks.

    Sequence-parallel prefill passes ``sp_mesh`` (the device mesh): the
    Pallas attention kernel then runs under ``shard_map`` manual
    partitioning (K/V all-gathered over 'model', queries local with a
    global position offset — ``ops.pallas.attention.sp_fused_gqa_
    attention``) instead of being bypassed, keeping the fused-kernel
    prefill win under SP. ``fused=False`` falls back to the einsum path
    (also used automatically off-TPU).
    """
    p = ids_slotted.shape[1]
    embeds = prompt_embeds(
        params, cfg, ids_slotted, text_mask, codes_slotted, code_mask,
        spk_ids, spk_mask, attn_mask,
    )
    h, (ck, cv) = tfm.stack_forward(
        params["talker"],
        cfg.talker,
        embeds,
        rope_pos,
        kv_caches=(cache_k, cache_v),
        cache_len=jnp.int32(0),
        attn_mask=attn_mask,
        key_valid=key_valid,
        fused_prefill=fused,
        sp_mesh=sp_mesh,
    )
    key_valid = key_valid.at[:, :p].set(attn_mask)
    logits = (h[:, -1].astype(jnp.float32)) @ params["lm_head"].astype(jnp.float32)
    return logits, ck, cv, key_valid


def _sample_token_seeded(logits, seeds, frames, temperature, top_k: int):
    """Schedule-reproducible top-k gumbel sampling.

    Row ``i``'s noise is a pure function of ``(seeds[i], frames[i])`` —
    independent of batch composition, slot assignment, or chunk schedule —
    so a request sampled in the one-shot path and the same request sampled
    inside the serving slot batch draw IDENTICAL tokens given the same
    per-request seed. ``temperature`` may be a scalar or a (B,) array;
    ``top_k=1`` is exact greedy (argmax), independent of seed.
    """
    b = logits.shape[0]
    t = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (b,))
    logits = logits.astype(jnp.float32) / jnp.maximum(t, 1e-5)[:, None]
    vals, idxs = jax.lax.top_k(logits, top_k)
    base = jax.random.PRNGKey(0x5EED)
    keys = jax.vmap(
        lambda s, f: jax.random.fold_in(jax.random.fold_in(base, s), f)
    )(seeds.astype(jnp.uint32), frames.astype(jnp.uint32))
    g = jax.vmap(lambda k: jax.random.gumbel(k, (top_k,)))(keys)
    choice = jnp.argmax(vals + g, axis=-1)
    return jnp.take_along_axis(idxs, choice[:, None], axis=-1)[:, 0]


def _derive_row_seeds(rng, n: int) -> jnp.ndarray:
    """Per-row sampling seeds from a caller rng (one draw per REAL row, so
    mesh-padding rows never shift real rows' streams)."""
    return jax.random.randint(rng, (n,), 0, jnp.iinfo(jnp.int32).max, jnp.int32)


def _predict_residuals(params: Params, cfg: QwenTTSConfig, h_last, tok0):
    """Predict residual codebooks from hidden state + primary-code embed."""
    n_res = cfg.codec.n_codebooks - 1
    if n_res == 0:
        return jnp.zeros((h_last.shape[0], 0), jnp.int32)
    e0 = params["audio_embed"][0][tok0]  # (B, H)
    cp_in = jnp.concatenate([h_last, e0], axis=-1).astype(params["code_predictor"]["w1"].dtype)
    # (Q, 2H, C) x (B, 2H) → (Q, B, C)
    hidden = jax.nn.silu(jnp.einsum("bd,qdc->qbc", cp_in, params["code_predictor"]["w1"]).astype(jnp.float32))
    logits = jnp.einsum("qbc,qce->qbe", hidden.astype(params["code_predictor"]["w2"].dtype), params["code_predictor"]["w2"])
    return jnp.argmax(logits, axis=-1).T.astype(jnp.int32)  # (B, Q)


@partial(jax.jit, static_argnames=("cfg", "steps", "top_k", "kv_window"))
def _decode_chunk(
    params: Params,
    cfg: QwenTTSConfig,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    key_valid: jnp.ndarray,
    slot0: jnp.ndarray,  # scalar int32: first free cache slot
    rope_base: jnp.ndarray,  # (B,) rope position of next token per row
    last_codes: jnp.ndarray,  # (B, nq)
    done: jnp.ndarray,  # (B,) bool
    seeds: jnp.ndarray,  # (B,) int32 per-row sampling seeds
    temperature: jnp.ndarray,
    step_base: jnp.ndarray,  # scalar int32: global frame index of step 0
    min_frames: jnp.ndarray,  # scalar int32: EOS suppressed below this
    steps: int,
    top_k: int,
    kv_window: Optional[int] = None,  # static: chunk attends to cache[:kv_window]
):
    b = last_codes.shape[0]
    nq = cfg.codec.n_codebooks

    def step(carry, t):
        cache_k, cache_v, key_valid, last_codes, done = carry
        # Embed previous codes (sum over codebooks)
        embs = params["audio_embed"]  # (nq, V, H)
        emb = jnp.zeros((b, embs.shape[-1]), embs.dtype)
        for q in range(nq):
            emb = emb + embs[q][last_codes[:, q]]
        x = emb[:, None, :]  # (B, 1, H)

        pos = (rope_base + t)[:, None]  # (B, 1)
        slot = slot0 + t
        h, (cache_k, cache_v) = tfm.stack_forward(
            params["talker"],
            cfg.talker,
            x,
            pos,
            kv_caches=(cache_k, cache_v),
            cache_len=slot,
            attn_mask=None,
            key_valid=key_valid,
            kv_window=kv_window,
        )
        key_valid = key_valid.at[:, slot].set(True)
        h_last = h[:, -1]
        # bf16 matmul with fp32 accumulation: converting the whole head to
        # fp32 inside the decode scan materializes it every step.
        logits = jax.lax.dot(h_last, params["lm_head"], preferred_element_type=jnp.float32)

        # Enforce a minimum duration: EOS is masked below min_frames
        suppress = (step_base + t) < min_frames
        logits = jnp.where(
            suppress, logits.at[:, cfg.audio_eos].set(-1e30), logits
        )
        frames = jnp.broadcast_to(step_base + t, (b,))
        tok0 = _sample_token_seeded(logits, seeds, frames, temperature, top_k)
        newly_done = tok0 == cfg.audio_eos
        tok0 = jnp.where(done, cfg.audio_pad, tok0)

        res = _predict_residuals(params, cfg, h_last, jnp.minimum(tok0, cfg.codec.codebook_size - 1))
        res = jnp.where(done[:, None], 0, res)
        codes = jnp.concatenate([tok0[:, None], res], axis=-1)

        done = done | newly_done
        return (cache_k, cache_v, key_valid, codes, done), (codes, done)

    carry0 = (cache_k, cache_v, key_valid, last_codes, done)
    carry, (codes_seq, done_seq) = jax.lax.scan(step, carry0, jnp.arange(steps))
    cache_k, cache_v, key_valid, last_codes, done = carry
    # codes_seq: (steps, B, nq) → (B, steps, nq)
    return (
        jnp.transpose(codes_seq, (1, 0, 2)),
        jnp.transpose(done_seq, (1, 0)),
        cache_k,
        cache_v,
        key_valid,
        last_codes,
        done,
    )


@partial(jax.jit, static_argnames=("cfg",))
def _vocode(params: Params, cfg: QwenTTSConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """codes (B, T, nq) with specials clamped → waveform (B, T*hop)."""
    clamped = jnp.minimum(codes, cfg.codec.codebook_size - 1)
    return codec_lib.decode_from_codes(params["codec"], cfg.codec, clamped)


@partial(jax.jit, static_argnames=("cfg", "t"))
def _vocode_rows(params: Params, cfg: QwenTTSConfig, codes_buf, rows, ends, t: int):
    """Vocode ``codes_buf[rows, :t]`` with frames ≥ ``ends`` zeroed.

    One program per (group size, t) bucket: gather + end-mask + vocode —
    the codes stay in HBM, matching the host path's trim-then-zero-pad
    semantics exactly (post-EOS pads and past-budget samples mask to 0).
    Returns (wav (G, t*hop), masked codes (G, t, nq)); the latter backs
    lazy host fetches of the trimmed code matrices.
    """
    f = codes_buf.shape[1]
    te = min(t, f)
    codes = codes_buf[rows, :te]
    if t > te:
        codes = jnp.pad(codes, ((0, 0), (0, t - te), (0, 0)))
    mask = jnp.arange(t, dtype=jnp.int32)[None, :] < ends[:, None]
    codes = jnp.where(mask[..., None], codes, 0)
    return _vocode(params, cfg, codes), codes


@partial(jax.jit, static_argnames=("cfg",))
def _encode_reference(params: Params, cfg: QwenTTSConfig, wav: jnp.ndarray) -> jnp.ndarray:
    return codec_lib.encode_to_codes(params["codec"], cfg.codec, wav)


# ---------------------------------------------------------------------------
# Model wrapper
# ---------------------------------------------------------------------------


class QwenTTSModel:
    """Inference wrapper: tokenization, prompt building, chunked decode."""

    def __init__(
        self,
        config: QwenTTSConfig,
        params: Optional[Params] = None,
        model_path: Optional[str] = None,
        seed: int = 0,
        quantization: Optional[str] = None,
        lora_path: Optional[str] = None,
    ):
        self.config = config
        self.model_path = model_path or config.name
        self.tokenizer = load_tokenizer(model_path, vocab_size=config.text_vocab)
        if params is None:
            # One fused init program instead of hundreds of tiny dispatches
            params = jax.jit(init_params, static_argnums=1)(
                jax.random.PRNGKey(seed), config
            )
        if lora_path is not None:
            # Merge BEFORE quantization: adapters train in fp32 against the
            # dense base; a pre-quantized export cannot be merged into.
            from .lora import apply_lora, load_lora

            blocks = params["talker"]["blocks"]
            if not all(
                hasattr(blocks[k], "ndim") for k in ("wqkv", "wo")
            ):
                raise ValueError(
                    "lora_path requires a DENSE base (merge precedes "
                    "quantization); load the un-quantized export instead"
                )
            lora, meta = load_lora(lora_path)
            params = apply_lora(params, lora, scale=float(meta.get("scale", 1.0)))
            logger.info("Merged LoRA adapter from %s (%s)", lora_path, meta)
        if quantization in ("int8", "int4"):
            # Weight-only quantization on the talker: int8 halves decode
            # HBM traffic, int4 halves it again (inference only — training
            # uses dense weights).
            from ..quantization import quantize_stack

            params = {**params, "talker": quantize_stack(params["talker"], quantization)}
        elif quantization not in (None, "none"):
            raise ValueError(f"Unsupported quantization: {quantization}")
        self.quantization = quantization
        self.params = params
        self.sample_rate = config.codec.sample_rate
        self._ref_codes_cache: Dict[str, np.ndarray] = {}
        #: set by parallel.inference.enable_data_parallel /
        #: enable_tensor_parallel for mesh serving
        self.mesh = None
        #: set by parallel.inference.enable_sequence_parallel — shard the
        #: prompt (sequence) axis of prefill over the mesh's ``model`` axis
        self.seq_parallel = False

    # -- Loading -----------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_path: str,
        seed: int = 0,
        quantization: Optional[str] = None,
        lora_path: Optional[str] = None,
    ) -> "QwenTTSModel":
        """Build from a checkpoint dir (native orbax or HF safetensors) or a
        preset name.

        Native checkpoints (written by :meth:`save_checkpoint`) restore the
        FULL tree — talker, codec, embeddings, code predictor — and may be
        pre-quantized, which makes them the fast serving path. HF
        safetensors go through the scoped converter
        (``models.qwen.weights``). Without checkpoint files the model runs
        with deterministic random weights — the full compute path
        (tokenize → prefill → scan decode → vocode) is identical, which is
        what the throughput benchmarks and tests exercise.
        """
        from .. import checkpoint as ckpt_lib

        if _os.path.isdir(str(model_path)) and ckpt_lib.is_native_checkpoint(model_path):
            # Host-staged restore + ONE device_put of the whole tree: the
            # single put pipelines transfers. (Measured: orbax's
            # direct-to-device restore serializes per-leaf writes and was
            # 3× slower through the relay — 835 s vs 268 s for 2.16 GB.)
            params, manifest = ckpt_lib.load_params(model_path, family="qwen")
            params = jax.device_put(params)
            preset = manifest.get("preset", "1.7B")
            cfg = PRESETS.get(preset) or resolve_config(preset)
            saved_quant = manifest.get("quantization")
            if saved_quant == "none":
                saved_quant = None
            # An explicit request (incl. "none" = dense) must match a
            # quantized export — its leaves cannot be un/re-quantized
            # here. Requesting int8/int4 on a DENSE export is fine (the
            # constructor quantizes); None serves as-exported.
            requested = None if quantization == "none" else quantization
            explicit = quantization is not None
            if explicit and saved_quant is not None and requested != saved_quant:
                raise ValueError(
                    f"Checkpoint at {model_path} was exported with "
                    f"quantization={saved_quant!r}; cannot serve as {quantization!r}"
                )
            logger.info(
                "Loaded native Qwen-TTS checkpoint from %s (preset %s, quant %s)",
                model_path, preset, saved_quant,
            )
            model = cls(
                cfg,
                params=params,
                model_path=model_path,
                seed=seed,
                quantization=requested or saved_quant,
                lora_path=lora_path,
            )
            model.variant = manifest.get("variant")  # survives re-export
            return model

        cfg = resolve_config(model_path)
        params = None
        try:
            from .weights import load_checkpoint

            params = load_checkpoint(model_path, cfg, quantization=quantization)
            if params is not None:
                logger.info("Loaded Qwen-TTS weights from %s", model_path)
        except Exception as exc:  # noqa: BLE001
            logger.warning("Checkpoint load failed (%s); using random init", exc)
        if params is None:
            logger.info(
                "No checkpoint found at '%s' — initializing %s with random weights",
                model_path,
                cfg.name,
            )
        return cls(
            cfg, params=params, model_path=model_path, seed=seed,
            quantization=quantization, lora_path=lora_path,
        )

    def save_checkpoint(self, path: str) -> None:
        """Export the current parameter tree as a native serving checkpoint.

        Saving a quantized model writes the int8/int4 leaves — a serving
        ``from_pretrained(path)`` then moves half (int8) or a quarter
        (int4) of the bf16 bytes host→device and skips the quantize pass,
        which is the cold-start lever on hosts with slow links.

        The manifest records the CustomVoice/Base ``variant`` so providers
        keep their routing (reference parity: the reference infers it from
        "CustomVoice" in the model path, which an exported directory name
        no longer carries).
        """
        from .. import checkpoint as ckpt_lib

        variant = getattr(self, "variant", None) or (
            "custom-voice" if "CustomVoice" in str(self.model_path or "") else "base"
        )
        ckpt_lib.save_params(
            path,
            self.params,
            family="qwen",
            preset=self.config.name,
            quantization=self.quantization,
            extra={"variant": variant},
        )

    # -- Mesh sharding helpers ----------------------------------------------

    def _shard(self, x, batch_axis: int = 0):
        """Shard one array's batch axis over the mesh's ``data`` axis."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = [None] * x.ndim
        spec[batch_axis] = "data"
        return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

    def _shard_prompt(self, x):
        """Shard a prompt array: batch over ``data`` and — under
        sequence-parallel prefill — the sequence axis (axis 1) over
        ``model``. 1-D per-row arrays (e.g. spk_ids) have no sequence
        axis and stay batch-sharded only."""
        if self.mesh is None or not self.seq_parallel or x.ndim < 2:
            return self._shard(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = ["data", "model"] + [None] * (x.ndim - 2)
        return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

    def _dp_pad(self, n: int) -> int:
        """Rows of padding needed so the batch divides the data axis."""
        if self.mesh is None:
            return 0
        dp = self.mesh.shape.get("data", 1)
        return (-n) % dp

    def _shard_kv(self, cache):
        """Shard a (L, B, S, Hkv, D) KV cache: batch over ``data`` and —
        under tensor parallelism — heads over ``model``, matching the
        column-parallel wqkv so attention runs without resharding. Under
        sequence-parallel prefill the weights are replicated, so the cache
        stays replicated over ``model`` (only batch is sharded)."""
        if self.mesh is None:
            return cache
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = [None] * cache.ndim
        axes[1] = "data"
        if self.mesh.shape.get("model", 1) > 1 and not self.seq_parallel:
            axes[3] = "model"
        return jax.device_put(cache, NamedSharding(self.mesh, P(*axes)))

    # -- Reference audio conditioning --------------------------------------

    def _reference_codes(self, ref_audio_path: str) -> np.ndarray:
        """Codec-encode reference audio to conditioning tokens (cached)."""
        if ref_audio_path in self._ref_codes_cache:
            return self._ref_codes_cache[ref_audio_path]
        from ...audio_io import load_wav
        from ...ops.resample import resample

        wav, sr = load_wav(ref_audio_path)
        if sr != self.sample_rate:
            wav = np.asarray(resample(wav, sr, self.sample_rate))
        # Cap the reference at 10 s and align to the codec hop
        hop = self.config.codec.hop
        max_samples = 10 * self.sample_rate
        wav = wav[:max_samples]
        n = max((len(wav) // hop) * hop, hop)
        wav = np.pad(wav[:n], (0, max(0, n - len(wav))))
        codes = _encode_reference(self.params, self.config, jnp.asarray(wav)[None])
        codes_np = np.asarray(codes[0])
        self._ref_codes_cache[ref_audio_path] = codes_np
        return codes_np

    # -- Prompt building ----------------------------------------------------

    def _build_prompt_arrays(
        self,
        texts: Sequence[str],
        speaker: Optional[str],
        language: str,
        ref_audio: Optional[str],
        ref_text: Optional[str],
    ):
        """Host-built index/mask arrays describing each prompt row.

        Layout per row: [spk?][ref text][text][ref codes][BOS], left-padded
        to the prompt bucket. The embedding lookups themselves happen
        inside the prefill program (one device dispatch, not one per
        piece). Returns (arrays dict of np arrays, lens list, p).
        """
        cfg = self.config
        nq = cfg.codec.n_codebooks

        ref_codes = None
        ref_ids: List[int] = []
        if ref_audio is not None:
            ref_codes = np.asarray(self._reference_codes(ref_audio), np.int32)
            ref_ids = self.tokenizer.encode(ref_text or "")
        nr = int(ref_codes.shape[0]) if ref_codes is not None else 0

        has_spk = speaker is not None
        spk_id = 0
        if has_spk:
            if speaker in SPEAKERS:
                spk_id = SPEAKERS.index(speaker)
            else:
                # Stable digest: Python's str hash is salted per process,
                # which would pick a different voice row every run.
                import hashlib

                digest = hashlib.md5(speaker.encode("utf-8")).hexdigest()
                spk_id = int(digest, 16) % cfg.n_speakers

        rows_ids = [
            self.tokenizer.encode(f"{language}: {t}" if language else t)
            for t in texts
        ]
        lens = [int(has_spk) + len(ref_ids) + len(ids) + nr + 1 for ids in rows_ids]
        p = _round_up(max(lens), PROMPT_BUCKET)
        b = len(texts)

        ids_slotted = np.zeros((b, p), np.int32)
        text_mask = np.zeros((b, p), np.float32)
        codes_slotted = np.zeros((b, p, nq), np.int32)
        code_mask = np.zeros((b, p), np.float32)
        spk_mask = np.zeros((b, p), np.float32)
        for i, ids in enumerate(rows_ids):
            pos = p - lens[i]
            if has_spk:
                spk_mask[i, pos] = 1.0
                pos += 1
            toks = list(ref_ids) + list(ids)
            ids_slotted[i, pos : pos + len(toks)] = toks
            text_mask[i, pos : pos + len(toks)] = 1.0
            pos += len(toks)
            if nr:
                codes_slotted[i, pos : pos + nr] = ref_codes
                code_mask[i, pos : pos + nr] = 1.0
            # BOS occupies slot p-1 — encoded in the prefill program as
            # attn_mask minus the other masks.

        arrays = {
            "ids_slotted": ids_slotted,
            "text_mask": text_mask,
            "codes_slotted": codes_slotted,
            "code_mask": code_mask,
            "spk_ids": np.full((b,), spk_id, np.int32),
            "spk_mask": spk_mask,
            "rope_pos": np.stack(
                [np.maximum(np.arange(p) - (p - n), 0) for n in lens]
            ).astype(np.int32),
            "attn_mask": np.stack([np.arange(p) >= (p - n) for n in lens]),
        }
        return arrays, lens, p

    # -- Generation ----------------------------------------------------------

    def generate_codes(
        self,
        texts: Sequence[str],
        speaker: Optional[str] = None,
        language: str = "English",
        ref_audio: Optional[str] = None,
        ref_text: Optional[str] = None,
        max_frames: Optional[int] = None,
        min_frames: int = 0,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        rng: Optional[jnp.ndarray] = None,
        cancel_check=None,
        prebuilt_prompt=None,
        seeds: Optional[Sequence[int]] = None,
    ) -> List[np.ndarray]:
        """Run prefill + chunked AR decode; returns per-text code arrays.

        ``min_frames`` masks the EOS token for the first N frames —
        a minimum-duration floor (also used by throughput benchmarks so
        random-weight models don't terminate immediately).
        ``prebuilt_prompt`` accepts an ``(arrays, lens, bucket)`` triple
        from a prior ``_build_prompt_arrays(texts, ...)`` call with the
        same arguments, so callers that need the prompt arrays themselves
        (e.g. distillation batch building) don't tokenize twice.
        ``seeds`` (one int per text) makes sampling schedule-reproducible
        — the same seed through :meth:`ServingEngine.submit` draws the
        same tokens.
        """
        codes_dev, done_dev, n_real = self._generate_codes_arrays(
            texts, speaker=speaker, language=language, ref_audio=ref_audio,
            ref_text=ref_text, max_frames=max_frames, min_frames=min_frames,
            temperature=temperature, top_k=top_k, rng=rng,
            cancel_check=cancel_check, prebuilt_prompt=prebuilt_prompt,
            seeds=seeds,
        )
        # One packed fetch: codes and the done flags ride the same transfer
        with profiling.stage("qwen/fetch_codes"):
            packed = np.asarray(
                jnp.concatenate(
                    [codes_dev, done_dev[..., None].astype(jnp.int32)], axis=-1
                )
            )
        codes = packed[..., :-1]  # (B, T, nq)
        done_seq = packed[..., -1].astype(bool)  # (B, T)

        outputs = []
        for i in range(n_real):  # drop mesh padding rows
            d = np.nonzero(done_seq[i])[0]
            end = int(d[0]) if d.size else codes.shape[1]
            end = max(end, 1)
            outputs.append(codes[i, :end])
        return outputs

    def _generate_codes_arrays(
        self,
        texts: Sequence[str],
        speaker: Optional[str] = None,
        language: str = "English",
        ref_audio: Optional[str] = None,
        ref_text: Optional[str] = None,
        max_frames: Optional[int] = None,
        min_frames: int = 0,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        rng: Optional[jnp.ndarray] = None,
        cancel_check=None,
        prebuilt_prompt=None,
        seeds: Optional[Sequence[int]] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
        """Device-array core of :meth:`generate_codes`.

        Returns ``(codes (B, T, nq) DEVICE, done (B, T) DEVICE, n_real)``
        — callers that consume codes on device (``synthesize`` vocodes
        them straight from HBM) fetch only the done bitmap; only
        ``generate_codes`` itself pays the full code transfer.

        Sampling is schedule-reproducible: row ``i`` at frame ``f`` draws
        from ``fold_in(fold_in(base, seeds[i]), f)``. ``seeds`` defaults
        to per-row draws from ``rng``; pass explicit per-text seeds to
        reproduce the exact same utterances through the ServingEngine
        (``ServingEngine.submit(..., seed=...)``).
        """
        cfg = self.config
        temperature = cfg.temperature if temperature is None else temperature
        top_k = cfg.top_k if top_k is None else top_k
        if rng is None:
            rng = jax.random.PRNGKey(0)

        with profiling.stage("qwen/prompt_build"):
            if prebuilt_prompt is not None:
                arrays, lens, p = prebuilt_prompt
            else:
                arrays, lens, p = self._build_prompt_arrays(
                    texts, speaker, language, ref_audio, ref_text
                )
        # Mesh serving: pad the batch to a multiple of the data axis
        n_real = len(texts)
        pad_rows = self._dp_pad(n_real)
        if pad_rows:
            arrays = {
                k: np.concatenate([v, np.repeat(v[:1], pad_rows, axis=0)])
                for k, v in arrays.items()
            }
            lens = lens + [lens[0]] * pad_rows
        b = n_real + pad_rows
        sharded = {k: self._shard_prompt(jnp.asarray(v)) for k, v in arrays.items()}
        rope_pos = sharded["rope_pos"]
        attn_mask = sharded["attn_mask"]

        if max_frames is None:
            max_chars = max(len(t) for t in texts)
            max_frames = int(np.clip(max_chars * 1.0 + 50, _chunk(), 1500))
        n_chunks = _round_up(max_frames, _chunk()) // _chunk()
        s = p + n_chunks * _chunk()

        cache_k, cache_v = tfm.make_kv_cache(cfg.talker, b, s)
        cache_k, cache_v = self._shard_kv(cache_k), self._shard_kv(cache_v)
        key_valid = self._shard(jnp.zeros((b, s), bool))

        with profiling.stage("qwen/prefill"):
            logits, cache_k, cache_v, key_valid = _prefill(
                self.params, cfg,
                sharded["ids_slotted"], sharded["text_mask"],
                sharded["codes_slotted"], sharded["code_mask"],
                sharded["spk_ids"], sharded["spk_mask"],
                rope_pos, attn_mask, cache_k, cache_v, key_valid,
                fused=True,
                sp_mesh=self.mesh if self.seq_parallel else None,
            )
        if self.seq_parallel:
            # GSPMD may leave the prefill outputs with sequence-axis
            # shardings; pin the decode layout explicitly (batch over
            # ``data``, cache replicated over ``model``) so every decode
            # chunk compiles against the same input layout as DP serving.
            cache_k, cache_v = self._shard_kv(cache_k), self._shard_kv(cache_v)
            key_valid = self._shard(key_valid)
            logits = self._shard(logits)

        if seeds is None:
            seeds_b = _derive_row_seeds(rng, n_real)
        else:
            if len(seeds) != n_real:
                raise ValueError(
                    f"seeds has {len(seeds)} entries for {n_real} texts"
                )
            seeds_b = jnp.asarray(np.asarray(seeds, np.int32))
        if pad_rows:
            seeds_b = jnp.concatenate(
                [seeds_b, jnp.repeat(seeds_b[:1], pad_rows, axis=0)]
            )
        seeds_b = self._shard(seeds_b)
        if min_frames > 0:
            logits = logits.at[:, cfg.audio_eos].set(-1e30)
        tok0 = _sample_token_seeded(
            logits, seeds_b, jnp.zeros((b,), jnp.int32),
            jnp.float32(temperature), top_k,
        )
        # First frame's residual codes come from the prefill hidden state via
        # the same greedy head; approximate with zeros for frame 0 residuals.
        first_codes = jnp.concatenate(
            [tok0[:, None], jnp.zeros((b, cfg.codec.n_codebooks - 1), jnp.int32)], axis=-1
        )
        done = tok0 == cfg.audio_eos
        rope_base = jnp.asarray(lens, jnp.int32)

        # Code/done chunks accumulate ON DEVICE; early exit uses a LAGGED
        # all-done flag so its fetch overlaps the next chunk's execution.
        all_codes = [first_codes[:, None, :]]
        all_done = [done[:, None]]
        last_codes = first_codes
        slot0 = jnp.int32(p)
        slot_py = p  # python mirror of slot0 for the static kv window
        prev_flag = None

        for _ in range(n_chunks):
            if cancel_check is not None:
                cancel_check()
            with profiling.stage("qwen/decode_chunk"):
                (
                    codes_chunk,
                    done_chunk,
                    cache_k,
                    cache_v,
                    key_valid,
                    last_codes,
                    done,
                ) = _decode_chunk(
                    self.params,
                    cfg,
                    cache_k,
                    cache_v,
                    key_valid,
                    slot0,
                    rope_base + (slot0 - jnp.int32(p)),
                    last_codes,
                    done,
                    seeds_b,
                    jnp.float32(temperature),
                    slot0 - jnp.int32(p) + 1,
                    jnp.int32(min_frames),
                    _chunk(),
                    top_k,
                    _kv_window(slot_py + _chunk(), s),
                )
            all_codes.append(codes_chunk)
            all_done.append(done_chunk)
            slot0 = slot0 + _chunk()
            slot_py += _chunk()
            # Early exit on the PREVIOUS chunk's flag: it is already
            # materialized, so the fetch overlaps the chunk just dispatched
            # (worst case one surplus chunk, never a device stall).
            if prev_flag is not None and bool(np.asarray(prev_flag)):
                break
            prev_flag = jnp.all(done)

        return (
            jnp.concatenate(all_codes, axis=1),
            jnp.concatenate(all_done, axis=1),
            n_real,
        )

    def synthesize(
        self,
        texts: Union[str, Sequence[str]],
        speaker: Optional[str] = None,
        language: str = "English",
        ref_audio: Optional[str] = None,
        ref_text: Optional[str] = None,
        max_frames: Optional[int] = None,
        min_frames: int = 0,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        rng: Optional[jnp.ndarray] = None,
        cancel_check=None,
        seeds: Optional[Sequence[int]] = None,
    ) -> Tuple[List[jnp.ndarray], int]:
        """Full text→waveform path. Returns (list of 1-D waveforms, sr).

        The codes never leave the device: decode accumulates them in HBM,
        the host fetches only the (B, T) done bitmap to learn each row's
        length, and the vocoder reads the code array in place (gather +
        end-mask per length bucket). On relay-attached hosts this removes
        the dominant fetch/re-upload pair from the synthesis wall clock.
        """
        single = isinstance(texts, str)
        text_list = [texts] if single else list(texts)
        codes_dev, done_dev, n_real = self._generate_codes_arrays(
            text_list,
            speaker=speaker,
            language=language,
            ref_audio=ref_audio,
            ref_text=ref_text,
            max_frames=max_frames,
            min_frames=min_frames,
            temperature=temperature,
            top_k=top_k,
            rng=rng,
            cancel_check=cancel_check,
            seeds=seeds,
        )
        with profiling.stage("qwen/fetch_done"):
            done_np = np.asarray(done_dev)[:n_real]
        ends = []
        for i in range(n_real):
            d = np.nonzero(done_np[i])[0]
            ends.append(max(int(d[0]) if d.size else done_np.shape[1], 1))

        hop = self.config.codec.hop
        # Batch rows of equal frame count together for the vocoder; decode
        # each distinct length as one padded batch (bucketed to CHUNK).
        waves: List[Optional[jnp.ndarray]] = [None] * n_real
        buckets: Dict[int, List[int]] = {}
        for i, end in enumerate(ends):
            t = _round_up(end, _chunk())
            buckets.setdefault(t, []).append(i)
        for t, idxs in buckets.items():
            with profiling.stage("qwen/vocode"):
                wav, _ = _vocode_rows(
                    self.params, self.config, codes_dev,
                    jnp.asarray(np.array(idxs, np.int32)),
                    jnp.asarray(np.array([ends[i] for i in idxs], np.int32)),
                    t,
                )
            for row, i in enumerate(idxs):
                waves[i] = wav[row, : ends[i] * hop]
        return waves, self.sample_rate

    def synthesize_speculative(
        self,
        text: str,
        draft: "QwenTTSModel",
        speaker: Optional[str] = None,
        language: str = "English",
        ref_audio: Optional[str] = None,
        ref_text: Optional[str] = None,
        max_frames: Optional[int] = None,
        min_frames: int = 0,
        gamma: int = 4,
        rng: Optional[jnp.ndarray] = None,
        residual_mode: str = "draft",
    ) -> Tuple[jnp.ndarray, int]:
        """Single-stream synthesis with draft-verify speculative decoding.

        ``draft`` is a smaller model sharing the codec vocabulary (e.g. a
        0.6B draft for a 1.7B target). Returns (waveform (T,), sr). See
        :mod:`rho_tts_tpu.models.qwen.speculative` for the decode design
        and the ``residual_mode`` acceptance semantics.
        """
        from .speculative import speculative_generate_codes

        codes, _stats = speculative_generate_codes(
            self, draft, text,
            speaker=speaker, language=language,
            ref_audio=ref_audio, ref_text=ref_text,
            max_frames=max_frames, min_frames=min_frames,
            gamma=gamma, rng=rng, residual_mode=residual_mode,
        )
        hop = self.config.codec.hop
        t = _round_up(max(codes.shape[0], 1), _chunk())
        batch = np.pad(codes, ((0, t - codes.shape[0]), (0, 0)))[None]
        with profiling.stage("qwen/vocode"):
            wav = _vocode(self.params, self.config, jnp.asarray(batch))
        return wav[0, : codes.shape[0] * hop], self.sample_rate


    def _single_prefill(self, text, speaker, language, ref_audio, ref_text,
                        decode_slots: int):
        """B=1 prompt build + prefill with ``decode_slots`` free cache slots.

        Shared by the streaming and speculative single-stream paths.
        Returns dict(logits (V,), ck, cv, kv, p, len0).
        """
        cfg = self.config
        arrays, lens, p = self._build_prompt_arrays(
            [text], speaker, language, ref_audio, ref_text
        )
        s = p + int(decode_slots)
        cache_k, cache_v = tfm.make_kv_cache(cfg.talker, 1, s)
        key_valid = jnp.zeros((1, s), bool)
        a = {k: jnp.asarray(v) for k, v in arrays.items()}
        logits, ck, cv, kv = _prefill(
            self.params, cfg,
            a["ids_slotted"], a["text_mask"], a["codes_slotted"],
            a["code_mask"], a["spk_ids"], a["spk_mask"],
            a["rope_pos"], a["attn_mask"],
            cache_k, cache_v, key_valid,
        )
        return {
            "logits": logits[0], "ck": ck, "cv": cv, "kv": kv,
            "p": p, "len0": int(lens[0]),
        }

    def stream_chunks(
        self,
        text: str,
        speaker: Optional[str] = None,
        language: str = "English",
        ref_audio: Optional[str] = None,
        ref_text: Optional[str] = None,
        max_frames: Optional[int] = None,
        min_frames: int = 0,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        rng: Optional[jnp.ndarray] = None,
        cancel_check=None,
        context_frames: int = 32,
        seed: Optional[int] = None,
    ):
        """Incremental synthesis: yields waveform pieces per decode chunk.

        Audio appears after the FIRST chunk (~CHUNK/frame_rate seconds of
        generation) instead of after the whole utterance — constant
        first-audio latency for long texts. The codec vocoder is fully
        local (convs + pointwise nonlinearities, no global normalization),
        so vocoding a sliding window with ``context_frames`` of left/right
        context reproduces the full-utterance vocode for every emitted
        sample — interior samples to float precision, window-boundary
        samples within bf16 conv-tiling tolerance (golden-tested vs
        :meth:`synthesize`; raise ``context_frames`` to tighten).

        Yields (waveform_piece (S,), sample_rate). Single stream (B=1).
        """
        cfg = self.config
        temperature = cfg.temperature if temperature is None else temperature
        top_k = cfg.top_k if top_k is None else top_k
        if rng is None:
            rng = jax.random.PRNGKey(0)

        if max_frames is None:
            max_frames = int(np.clip(len(text) * 1.0 + 50, _chunk(), 1500))
        n_chunks = _round_up(max_frames, _chunk()) // _chunk()
        pre = self._single_prefill(
            text, speaker, language, ref_audio, ref_text, n_chunks * _chunk()
        )
        p = pre["p"]
        cache_k, cache_v, key_valid = pre["ck"], pre["cv"], pre["kv"]
        logits = pre["logits"][None]
        lens = [pre["len0"]]
        seeds_b = _derive_row_seeds(rng, 1) if seed is None else jnp.asarray(
            np.asarray([seed], np.int32)
        )
        if min_frames > 0:
            logits = logits.at[:, cfg.audio_eos].set(-1e30)
        tok0 = _sample_token_seeded(
            logits, seeds_b, jnp.zeros((1,), jnp.int32),
            jnp.float32(temperature), top_k,
        )
        first_codes = jnp.concatenate(
            [tok0[:, None], jnp.zeros((1, cfg.codec.n_codebooks - 1), jnp.int32)],
            axis=-1,
        )
        done = tok0 == cfg.audio_eos
        rope_base = jnp.asarray(lens, jnp.int32)

        hop = cfg.codec.hop
        codes_np = np.asarray(first_codes)[0][None]  # (1, nq) grows per chunk
        finished = bool(np.asarray(done)[0])
        emitted = 0  # frames already yielded
        last_codes = first_codes
        slot0 = jnp.int32(p)
        slot_py = p  # python mirror for the static kv window
        s_total = p + n_chunks * _chunk()

        def vocode_span(lo: int, hi: int, emit_from: int, emit_to: int):
            """Vocode codes[lo:hi]; return samples for frames [emit_from, emit_to)."""
            window = codes_np[lo:hi]
            t = _round_up(window.shape[0], _chunk())
            batch = np.pad(window, ((0, t - window.shape[0]), (0, 0)))[None]
            wav = _vocode(self.params, cfg, jnp.asarray(batch))
            return wav[0, (emit_from - lo) * hop : (emit_to - lo) * hop]

        for _ in range(n_chunks):
            if finished:
                break
            if cancel_check is not None:
                cancel_check()
            (codes_chunk, done_chunk, cache_k, cache_v, key_valid,
             last_codes, done) = _decode_chunk(
                self.params, cfg, cache_k, cache_v, key_valid,
                slot0, rope_base + (slot0 - jnp.int32(p)), last_codes, done,
                seeds_b,
                jnp.float32(temperature), slot0 - jnp.int32(p) + 1,
                jnp.int32(min_frames), _chunk(), top_k,
                _kv_window(slot_py + _chunk(), s_total),
            )
            slot0 = slot0 + _chunk()
            slot_py += _chunk()
            cc, dd = jax.device_get((codes_chunk, done_chunk))
            cc, dd = np.asarray(cc)[0], np.asarray(dd)[0]
            hit = np.nonzero(dd)[0]
            if hit.size:
                cc = cc[: int(hit[0]) + 1]
                finished = True
            codes_np = np.concatenate([codes_np, cc])
            total = codes_np.shape[0]
            if finished and codes_np.shape[0] > 1 and (
                codes_np[-1, 0] >= cfg.codec.codebook_size
            ):
                codes_np = codes_np[:-1]  # drop the EOS frame itself
                total = codes_np.shape[0]

            safe = total if finished else max(total - context_frames, 0)
            if safe > emitted:
                lo = max(emitted - context_frames, 0)
                piece = vocode_span(lo, total, emitted, safe)
                emitted = safe
                yield piece, self.sample_rate

        if emitted < codes_np.shape[0]:  # final flush (max_frames reached)
            total = codes_np.shape[0]
            lo = max(emitted - context_frames, 0)
            yield vocode_span(lo, total, emitted, total), self.sample_rate
