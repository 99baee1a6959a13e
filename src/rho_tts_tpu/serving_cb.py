"""Continuous-batching serving for the Chatterbox-class CFG model.

:class:`ChatterboxServingEngine` reuses the :class:`~rho_tts_tpu.serving.
ServingEngine` slot scheduler (admission, lagged harvest, streaming
windows, retirement, QoS) and swaps the model hooks for the CFG-pair
decode:

* **CFG pairs as 2B transformer rows.** Request ``i`` owns transformer
  rows ``i`` (conditional) and ``i + n_slots`` (unconditional) — the
  same ``[cond…, uncond…]`` layout as the one-shot
  ``ChatterboxModel._decode_chunk``, so classifier-free guidance costs a
  row doubling inside one program instead of two sequential passes. The
  KV ring, ``key_valid``, and RoPE counters live in 2B-row space (cond
  and uncond prompts have different lengths, hence different RoPE
  bases); sampling state (seed, temperature, cfg weight, frame counter,
  EOS floor) is per-REQUEST (B,).
* **Single-codebook token log.** The device-resident code log is a
  (B, F) int32 matrix (one speech codebook at 25 Hz); retirement and
  streaming vocode straight from HBM, exactly like the Qwen engine.
* **Schedule-reproducible sampling.** Row noise is
  ``f(request_seed, frame)`` via the shared seeded gumbel sampler, so
  greedy AND sampled serving match ``ChatterboxModel.generate(...,
  seed=seed)`` token-exactly regardless of slot assignment or batch
  composition (pinned in tests/test_serving_cb.py).
* **Position-indexed watermark.** Retired waveforms and streamed pieces
  are watermarked on device at their absolute sample offsets
  (``ops.watermark``), so a streamed request's concatenation carries the
  same watermark as the one-shot path.

Reference scope: the reference's Chatterbox provider is its
retry-heaviest workload (``max_iterations=50``,
``/root/reference/src/rho_tts/providers/chatterbox.py:53``) served one
generation at a time; slot-batched serving is the TPU-native replacement
for that loop (validation retries rejoin the batch through
``engine._generate_segments_served``).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models import transformer as tfm
from .models.chatterbox.model import (
    CHUNK as CB_CHUNK,
    PROMPT_BUCKET as CB_PROMPT_BUCKET,
    ChatterboxModel,
    _cfg_sample,
    _vocode,
)
from .models.qwen.model import _round_up
from .ops.watermark import _ENV_WINDOW, apply_watermark
from .serving import ServeRequest, ServingEngine, _insert_rows, _maybe_sync, _np_fetch

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Compiled programs
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def _serve_prefill(
    params, cfg,
    ids_slotted, text_mask, bos_mask, spk_mask, spk,
    rope_pos, attn_mask, cache_k, cache_v, key_valid,
):
    """Admission-group prefill: the one-shot ``chatterbox._prefill`` with a
    PER-ROW speaker matrix (each admitted request may carry its own
    reference voice). Row layout ``[cond × A, uncond × A]``; numerics are
    row-identical to the one-shot program (same mask-built embedding
    assembly, same fused prefill attention)."""
    p = ids_slotted.shape[1]
    dt = params["text_embed"].dtype
    emb = params["text_embed"][ids_slotted]  # (2A, P, H)
    spk_e = (
        spk.astype(jnp.float32) @ params["spk_proj"].astype(jnp.float32)
    ).astype(dt)  # (2A, H)
    bos_e = params["speech_embed"][cfg.speech_bos].astype(dt)
    embeds = (
        emb * text_mask[..., None].astype(dt)
        + bos_e[None, None] * bos_mask[..., None].astype(dt)
        + spk_e[:, None, :] * spk_mask[..., None].astype(dt)
    )
    h, (ck, cv) = tfm.stack_forward(
        params["talker"], cfg.talker, embeds, rope_pos,
        kv_caches=(cache_k, cache_v), cache_len=jnp.int32(0),
        attn_mask=attn_mask, key_valid=key_valid, fused_prefill=True,
    )
    key_valid = key_valid.at[:, :p].set(attn_mask)
    logits = jax.lax.dot(
        h[:, -1], params["lm_head"], preferred_element_type=jnp.float32
    )
    return logits, ck, cv, key_valid


@partial(
    jax.jit, static_argnames=("cfg", "steps", "top_k"), donate_argnums=(1, 2, 3, 4)
)
def _cb_serve_decode_chunk(
    params,
    cache_k: jnp.ndarray,  # (L, 2B, S, Hkv, D) ring, rows [cond×B, uncond×B]
    cache_v: jnp.ndarray,
    key_valid: jnp.ndarray,  # (2B, S)
    toks_buf: jnp.ndarray,  # (B, F) device-resident per-request token log
    cfg,  # ChatterboxConfig (static)
    col0: jnp.ndarray,  # scalar int32: global write column of step 0, mod S
    rope_next: jnp.ndarray,  # (2B,) rope position of this chunk's first token
    last_tok: jnp.ndarray,  # (B,)
    done: jnp.ndarray,  # (B,) bool
    active: jnp.ndarray,  # (B,) bool
    seeds: jnp.ndarray,  # (B,) int32 per-request sampling seeds
    temperature: jnp.ndarray,  # (B,) f32
    cfg_w: jnp.ndarray,  # (B,) f32 per-request CFG weight
    frames_done: jnp.ndarray,  # (B,) int32
    min_frames: jnp.ndarray,  # (B,) int32
    steps: int,
    top_k: int,
):
    """One compiled CFG decode chunk over the slot batch.

    The serving twin of ``chatterbox._decode_chunk``: ring-buffer writes
    (``slot_causal=False``; RoPE carries logical position), per-row EOS
    floors, and an ``active`` mask so empty slots never mark columns
    valid. The sampled token feeds BOTH of a request's rows; the EOS
    column is suppressed on both rows before the CFG mix, matching the
    one-shot program exactly.
    """
    b = last_tok.shape[0]
    s = cache_k.shape[2]

    def step(carry, t):
        cache_k, cache_v, key_valid, last_tok, done = carry
        tok2 = jnp.concatenate([last_tok, last_tok])
        x = params["speech_embed"][tok2][:, None, :]
        pos = (rope_next + t)[:, None]  # (2B, 1)
        slot = jnp.mod(col0 + t, s)
        act2 = jnp.concatenate([active, active])
        h, (cache_k, cache_v) = tfm.stack_forward(
            params["talker"], cfg.talker, x, pos,
            kv_caches=(cache_k, cache_v), cache_len=slot,
            attn_mask=act2[:, None], key_valid=key_valid, slot_causal=False,
        )
        key_valid = key_valid.at[:, slot].set(act2)
        logits = jax.lax.dot(
            h[:, -1], params["lm_head"], preferred_element_type=jnp.float32
        )
        suppress = (frames_done + t) < min_frames  # (B,)
        sup2 = jnp.concatenate([suppress, suppress])
        eos_col = jnp.where(sup2, -1e30, logits[:, cfg.speech_eos])
        logits = logits.at[:, cfg.speech_eos].set(eos_col)
        tok = _cfg_sample(
            logits, seeds, frames_done + t, temperature, top_k, cfg_w
        )
        newly_done = tok == cfg.speech_eos
        dead = done | ~active
        tok = jnp.where(dead, cfg.speech_pad, tok)
        done = done | newly_done
        return (cache_k, cache_v, key_valid, tok, done), (tok, done)

    carry0 = (cache_k, cache_v, key_valid, last_tok, done)
    carry, (toks_seq, done_seq) = jax.lax.scan(step, carry0, jnp.arange(steps))
    cache_k, cache_v, key_valid, last_tok, done = carry
    toks_chunk = jnp.transpose(toks_seq, (1, 0))  # (B, steps)
    done_chunk = jnp.transpose(done_seq, (1, 0))
    # Append at each request's logical frame positions; the EOS frame and
    # everything after zero out (the vocode mask expects zero padding), and
    # writes past capacity (retired rows idling as masked compute) drop.
    idx = frames_done[:, None] + jnp.arange(steps, dtype=jnp.int32)[None, :]
    idx = jnp.where(active[:, None], idx, toks_buf.shape[1])
    toks_z = jnp.where(done_chunk, 0, toks_chunk)
    toks_buf = toks_buf.at[
        jnp.arange(b, dtype=jnp.int32)[:, None], idx
    ].set(toks_z, mode="drop")
    return (
        done_chunk,
        cache_k,
        cache_v,
        key_valid,
        toks_buf,
        last_tok,
        done,
        rope_next + steps,
        frames_done + steps,
    )


@partial(jax.jit, static_argnames=("top_k", "eos"))
def _cb_admit_sample(logits2a, seeds, min_frames, temperature, cfg_w, top_k: int, eos: int):
    """Sample each admitted request's frame-0 token from its prefill
    logits (rows ``[cond × A, uncond × A]``) with the per-request
    (seed, frame=0) key. EOS suppressed on both rows where the request
    has a min-frames floor — the one-shot ``_start_decode`` masking."""
    sup = min_frames > 0  # (A,)
    sup2 = jnp.concatenate([sup, sup])
    eos_col = jnp.where(sup2, -1e30, logits2a[:, eos])
    logits2a = logits2a.at[:, eos].set(eos_col)
    tok0 = _cfg_sample(
        logits2a, seeds, jnp.zeros_like(seeds), temperature, top_k, cfg_w
    )
    return tok0, tok0 == eos


@jax.jit
def _cb_admit_full(
    last_tok, done, active, rope_next, frames_done, min_frames, temperature,
    cfg_w, toks_buf, seeds, rows, rows2, tok0, done0, lens2, minf, temps,
    ws, seed_vals,
):
    """Write the admitted requests into every device-resident carry.

    ``rows`` indexes request-space (B,) state; ``rows2`` indexes the 2B
    transformer rows (cond then uncond) whose RoPE bases are the two
    prompt lengths. Duplicate entries (bucket padding) carry identical
    values. Frame 0 of the token log is the prefill-sampled token."""
    f = toks_buf.shape[1]
    row0 = jnp.zeros((tok0.shape[0], f), toks_buf.dtype)
    row0 = row0.at[:, 0].set(tok0)
    return (
        last_tok.at[rows].set(tok0),
        done.at[rows].set(done0),
        active.at[rows].set(True),
        rope_next.at[rows2].set(lens2),
        frames_done.at[rows].set(1),  # frame 0 = the prefill-sampled token
        min_frames.at[rows].set(minf),
        temperature.at[rows].set(temps),
        cfg_w.at[rows].set(ws),
        toks_buf.at[rows].set(row0),
        seeds.at[rows].set(seed_vals),
    )


@partial(jax.jit, static_argnames=("cfg", "w"))
def _cb_vocode_windows(params, cfg, toks_buf, rows, los, ends, w: int):
    """Vocode per-request windows ``toks_buf[row, lo:lo+w]`` (frames ≥ end
    zeroed) for streaming emission."""
    gathered = toks_buf[rows]  # (G, F)
    win = jax.vmap(
        lambda r, lo: jax.lax.dynamic_slice(r, (lo,), (w,))
    )(gathered, los)
    mask = (los[:, None] + jnp.arange(w, dtype=jnp.int32)[None, :]) < ends[:, None]
    win = jnp.where(mask, win, 0)
    return _vocode(params, cfg, win)


def _cb_vocode_rows(params, cfg, toks_buf, rows, ends, t: int):
    """Vocode ``toks_buf[rows, :t]`` with frames ≥ ``ends`` zeroed (the
    trim-then-zero-pad semantics of the one-shot ``_vocode_masked``).
    Returns (wav (G, t*hop), masked tokens (G, t)) — the latter backs lazy
    ``ServeRequest.codes`` fetches."""
    f = toks_buf.shape[1]
    te = min(t, f)
    toks = toks_buf[rows, :te]
    if t > te:
        toks = jnp.pad(toks, ((0, 0), (0, t - te)))
    mask = jnp.arange(t, dtype=jnp.int32)[None, :] < ends[:, None]
    toks = jnp.where(mask, toks, 0)
    return _vocode(params, cfg, toks), toks


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------


class ChatterboxServingEngine(ServingEngine):
    """Slot-batched continuous serving over one :class:`ChatterboxModel`.

    ``n_slots`` is the number of concurrent REQUESTS; the transformer
    batch is ``2 * n_slots`` rows (CFG pairs). Submit from any thread;
    drive with :meth:`step` / :meth:`run_until_idle` or :meth:`start`.

    Mesh serving: a model prepared with
    ``parallel.inference.enable_data_parallel`` / ``enable_tensor_parallel``
    serves through the same engine — the 2B CFG rows shard over the
    mesh's ``data`` axis (``n_slots`` must divide it) and KV heads over
    ``model``; XLA propagates the shardings through the CFG decode
    chunk, admission prefill, and scatters, inserting the TP psums over
    ICI (greedy mesh parity is pinned in tests/test_serving_cb.py).
    """

    def __init__(
        self,
        model: ChatterboxModel,
        n_slots: int = 8,
        max_prompt: int = 128,
        max_frames: int = 768,
        top_k: Optional[int] = None,
        seed: int = 0,
        stream_context: int = 32,
        max_queue: Optional[int] = None,
        chunk: int = 64,
    ):
        self.model = model
        self.mesh = getattr(model, "mesh", None)  # None = single chip
        self.cfg = model.cfg
        # Serving chunks are shorter than the one-shot CHUNK (128): the
        # slot batch amortizes the per-chunk host sync that made the
        # single-stream chunk large, and shorter chunks admit/retire at
        # finer granularity. Parity is chunk-size independent (frames are
        # absolute).
        self.chunk = int(chunk)
        self.n_slots = int(n_slots)
        self.max_prompt = _round_up(int(max_prompt), CB_PROMPT_BUCKET)
        self.max_frames = _round_up(int(max_frames), self.chunk)
        self.top_k = int(self.cfg.top_k if top_k is None else top_k)
        self.stream_context = int(stream_context)
        self.draft = None  # no speculative path for the CFG family (yet)
        self.gamma = 0
        self.residual_mode = "strict"
        cap = self.cfg.max_cache_len
        self.ring = self.max_prompt + self.max_frames + self.chunk
        if cap is not None and self.ring > _round_up(cap, self.chunk):
            # "faster" preset parity: the ring honors the decode cache cap
            # (reference chatterbox.py:125-127) by bounding max_frames.
            self.ring = _round_up(cap, self.chunk)
            self.max_frames = max(self.ring - self.max_prompt - self.chunk, self.chunk)

        # Mesh serving: the 2B CFG rows and the (B,) request state both
        # shard over 'data' (requiring n_slots % dp == 0 keeps the two row
        # spaces aligned), KV heads over 'model' — the same layout as the
        # meshed one-shot path (ChatterboxModel._shard_kv); params were
        # already sharded by parallel.inference.
        if self.mesh is not None:
            dp = self.mesh.shape.get("data", 1)
            if self.n_slots % dp != 0:
                raise ValueError(
                    f"n_slots ({self.n_slots}) must be a multiple of the "
                    f"mesh data axis ({dp})"
                )

        def place(x, *spec):
            if self.mesh is None:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = list(spec) + [None] * (x.ndim - len(spec))
            if "model" in spec and self.mesh.shape.get("model", 1) == 1:
                spec = [None if s == "model" else s for s in spec]
            return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

        b, b2 = self.n_slots, 2 * self.n_slots
        cache_k, cache_v = tfm.make_kv_cache(self.cfg.talker, b2, self.ring)
        self._cache_k = place(cache_k, None, "data", None, "model")
        self._cache_v = place(cache_v, None, "data", None, "model")
        self._key_valid = place(jnp.zeros((b2, self.ring), bool), "data")
        self._rope_next = place(jnp.zeros((b2,), jnp.int32), "data")
        # Per-request (B,) decode state — all device-resident between chunks.
        self._last_codes = place(jnp.zeros((b,), jnp.int32), "data")
        self._done = place(jnp.ones((b,), bool), "data")
        self._active_dev = place(jnp.zeros((b,), bool), "data")
        self._frames_done = place(jnp.zeros((b,), jnp.int32), "data")
        self._min_frames = place(jnp.zeros((b,), jnp.int32), "data")
        self._temp = place(jnp.full((b,), self.cfg.temperature, jnp.float32), "data")
        self._cfg_w = place(jnp.full((b,), 0.6, jnp.float32), "data")
        self._seeds = place(jnp.zeros((b,), jnp.int32), "data")
        self._codes_buf = place(
            jnp.zeros((b, self.max_frames + self.chunk), jnp.int32), "data"
        )
        # Speaker-embedding cache: reference audio is encoded once per path
        # (the one-shot provider's conditionals cache, chatterbox.py:113-121).
        self._spk_cache: Dict[str, np.ndarray] = {}
        self._init_scheduling(seed, max_queue)

    # -- submission -----------------------------------------------------------

    def submit(  # type: ignore[override]
        self,
        text: str,
        ref_audio: Optional[str] = None,
        cfg_weight: float = 0.6,
        min_frames: int = 0,
        max_frames: Optional[int] = None,
        temperature: Optional[float] = None,
        stream: bool = False,
        priority: int = 0,
        expires_s: Optional[float] = None,
        seed: Optional[int] = None,
    ) -> ServeRequest:
        """Queue one utterance; returns a future-like :class:`ServeRequest`.

        ``ref_audio`` selects the voice (falls back to the model's primed
        ``conditionals``, then to the unconditioned default voice).
        ``seed`` pins the schedule-reproducible sampling stream: the result
        matches ``ChatterboxModel.generate(..., seed=seed)`` token-exactly.
        """
        if seed is None:
            seed = self._default_seed()
        if max_frames is None:
            # One-shot default budget (models/chatterbox/model.py
            # _start_decode): ~2 tokens/char + 50, clamped.
            max_frames = int(
                np.clip(len(text) * 2.0 + 50, self.chunk, self.max_frames)
            )
        max_frames = min(_round_up(int(max_frames), self.chunk), self.max_frames)
        req = ServeRequest(
            text,
            None,
            "English",
            ref_audio,
            None,
            min_frames=min(int(min_frames), max_frames),
            max_frames=max_frames,
            temperature=self.cfg.temperature if temperature is None else temperature,
            stream=stream,
            priority=priority,
            expires_s=expires_s,
            seed=seed,
        )
        req.cfg_weight = float(cfg_weight)
        return self._enqueue(req)

    # -- admission ------------------------------------------------------------

    def _admit_build(self, picked: List[ServeRequest]):
        """Tokenize + resolve speaker conditioning for an admission group."""
        built = []
        for req in picked:
            try:
                spk = None
                if req.ref_audio is not None:
                    spk = self._spk_cache.get(req.ref_audio)
                    if spk is None:
                        spk = np.asarray(
                            self.model.prepare_conditionals(req.ref_audio),
                            np.float32,
                        )
                        self._spk_cache[req.ref_audio] = spk
                elif self.model.conditionals is not None:
                    spk = np.asarray(self.model.conditionals, np.float32)
                ids = np.asarray(self.model.tokenizer.encode(req.text), np.int32)
            except Exception as exc:  # noqa: BLE001 — bad input fails ONE request
                req.error = exc
                if req._chunk_q is not None:
                    req._chunk_q.put(None)
                req._resolve()
                continue
            n_cond = int(ids.shape[0]) + 1 + (1 if spk is not None else 0)
            if n_cond > self.max_prompt:
                req.error = ValueError(
                    f"prompt is {n_cond} tokens; engine max_prompt={self.max_prompt}"
                )
                if req._chunk_q is not None:
                    req._chunk_q.put(None)
                req._resolve()
                continue
            built.append((req, (ids, spk), n_cond, _round_up(n_cond, CB_PROMPT_BUCKET)))
        return built

    def _admit_prefill(self, built) -> int:
        """Prefill the admission group (cond+uncond rows) and scatter both
        row sets into the ring."""
        free = self._free_rows()
        p = max(pp for _, _, _, pp in built)
        a_real = len(built)
        a = 1 << (a_real - 1).bit_length()  # admit-batch bucket
        rows_real = free[:a_real]
        spk_dim = self.model.params["spk_proj"].shape[0]

        ids_slotted = np.zeros((2 * a, p), np.int32)
        text_mask = np.zeros((2 * a, p), np.float32)
        bos_mask = np.zeros((2 * a, p), np.float32)
        spk_mask = np.zeros((2 * a, p), np.float32)
        spk_vecs = np.zeros((2 * a, spk_dim), np.float32)
        lens2 = np.zeros(2 * a, np.int32)  # [cond lens, uncond lens]

        def fill(j: int, ids, spk, n_cond: int):
            nt = ids.shape[0]
            has_spk = spk is not None
            n_unc = 1 + int(has_spk)
            # cond row j: [pad…, spk?, text…, BOS]; uncond row a+j: [pad…, spk?, BOS]
            ids_slotted[j, p - 1 - nt : p - 1] = ids
            text_mask[j, p - 1 - nt : p - 1] = 1.0
            bos_mask[j, p - 1] = 1.0
            bos_mask[a + j, p - 1] = 1.0
            if has_spk:
                spk_mask[j, p - 2 - nt] = 1.0
                spk_mask[a + j, p - 2] = 1.0
                spk_vecs[j] = spk
                spk_vecs[a + j] = spk
            lens2[j] = n_cond
            lens2[a + j] = n_unc

        for j, (_req, (ids, spk), n_cond, _pp) in enumerate(built):
            fill(j, ids, spk, n_cond)
        for j in range(a_real, a):  # bucket padding repeats the last admit
            _req, (ids, spk), n_cond, _pp = built[-1]
            fill(j, ids, spk, n_cond)

        rope_pos = np.maximum(
            np.arange(p, dtype=np.int32)[None, :] - (p - lens2)[:, None], 0
        )
        attn_mask = np.arange(p)[None, :] >= (p - lens2)[:, None]

        pk, pv = tfm.make_kv_cache(self.cfg.talker, 2 * a, p)
        pkv = jnp.zeros((2 * a, p), bool)
        logits, pk, pv, pkv = _serve_prefill(
            self.model.params, self.cfg,
            jnp.asarray(ids_slotted), jnp.asarray(text_mask),
            jnp.asarray(bos_mask), jnp.asarray(spk_mask), jnp.asarray(spk_vecs),
            jnp.asarray(rope_pos), jnp.asarray(attn_mask), pk, pv, pkv,
        )

        pad = lambda xs, fill: xs + [xs[-1] if xs else fill] * (a - a_real)  # noqa: E731
        min_f = np.array(pad([r.min_frames for r, _, _, _ in built], 0), np.int32)
        temps = np.array(pad([r.temperature for r, _, _, _ in built], 1.0), np.float32)
        ws = np.array(pad([r.cfg_weight for r, _, _, _ in built], 0.0), np.float32)
        seed_vals = np.array(pad([r.seed for r, _, _, _ in built], 0), np.int32)
        rows_arr = jnp.asarray(np.array(pad(rows_real, 0), np.int32))
        rows2 = jnp.concatenate([rows_arr, rows_arr + self.n_slots])

        tok0, done0 = _cb_admit_sample(
            logits, jnp.asarray(seed_vals), jnp.asarray(min_f),
            jnp.asarray(temps), jnp.asarray(ws),
            self.top_k, int(self.cfg.speech_eos),
        )
        self._cache_k, self._cache_v, self._key_valid = _insert_rows(
            self._cache_k, self._cache_v, self._key_valid,
            rows2, pk, pv, pkv, jnp.int32(self._col),
        )
        (self._last_codes, self._done, self._active_dev, self._rope_next,
         self._frames_done, self._min_frames, self._temp, self._cfg_w,
         self._codes_buf, self._seeds) = _cb_admit_full(
            self._last_codes, self._done, self._active_dev, self._rope_next,
            self._frames_done, self._min_frames, self._temp, self._cfg_w,
            self._codes_buf, self._seeds, rows_arr, rows2, tok0, done0,
            jnp.asarray(lens2), jnp.asarray(min_f), jnp.asarray(temps),
            jnp.asarray(ws), jnp.asarray(seed_vals),
        )

        now = time.time()
        for j, (req, _, _n, _) in enumerate(built):
            row = rows_real[j]
            self._active[row] = True
            slot = self._slots[row]
            slot.req = req
            slot.pieces = []
            slot.emitted = 0
            slot.done_seen = None
            slot.frames = 1
            req.t_admit = now
        _maybe_sync(self._last_codes)
        return a_real

    # -- model hooks -----------------------------------------------------------

    def _dispatch(self):
        (done_chunk, self._cache_k, self._cache_v, self._key_valid,
         self._codes_buf, self._last_codes, self._done,
         self._rope_next, self._frames_done) = _cb_serve_decode_chunk(
            self.model.params,
            self._cache_k, self._cache_v, self._key_valid, self._codes_buf,
            self.cfg,
            jnp.int32(self._col),
            self._rope_next, self._last_codes, self._done, self._active_dev,
            self._seeds, self._temp, self._cfg_w,
            self._frames_done, self._min_frames,
            self.chunk, self.top_k,
        )
        self._col = (self._col + self.chunk) % self.ring
        return done_chunk

    def _widen_lo(self, lo: int, hi: int) -> int:
        """Streamed windows must span at least one watermark-envelope
        window of samples (the one-shot ``stream_chunks.vocode_span``
        widening)."""
        hop = self.cfg.codec.hop
        need = -(-_ENV_WINDOW // hop) + 1
        return min(lo, max(hi - need, 0))

    def _stream_vocode(self, rows, los, ends, w: int):
        return _cb_vocode_windows(
            self.model.params, self.cfg, self._codes_buf, rows, los, ends, w
        )

    def _stream_piece(self, wav_row, lo: int, hi: int, emit_from: int, emit_to: int):
        hop = self.cfg.codec.hop
        marked = apply_watermark(wav_row[: (hi - lo) * hop], offset=lo * hop)
        return _np_fetch(marked[(emit_from - lo) * hop : (emit_to - lo) * hop])

    def _retire_vocode(self, rows_arr, ends_arr, t: int):
        return _cb_vocode_rows(
            self.model.params, self.cfg, self._codes_buf, rows_arr, ends_arr, t
        )

    def _finish_wav(self, wav_row, end: int):
        """Watermarked waveform, matching ``ChatterboxModel.generate``."""
        return apply_watermark(wav_row[: end * self.cfg.codec.hop])
