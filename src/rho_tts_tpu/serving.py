"""Continuous-batching serving engine for the codec-LM TTS models.

The reference serves requests one ``generate()`` call at a time (its only
batching is a caller-assembled list, ``/root/reference/src/rho_tts/
providers/qwen.py:247-258``). On TPU the decode program's cost is set by
the static batch shape, not by how many rows carry real work — so the
serving-native design is a fixed SLOT BATCH that requests join and leave
at decode-chunk boundaries ("continuous batching" / in-flight batching):

* **Ring-buffer KV cache.** One (L, B, S, Hkv, D) cache; all rows write
  the SAME global column each step (the batch-uniform
  ``dynamic_update_slice`` that benches 1.6x faster than per-row
  scatter), and the column index wraps mod S. Correctness does not care
  where a token sits in the ring: RoPE encodes position (keys are
  rotated by per-row logical positions at write time) and ``key_valid``
  masks each row to exactly its own live history — so the attention mask
  drops the slot-order causality term (``slot_causal=False``; valid for
  single-token steps, where the query is always the newest token).

* **Admission at chunk boundaries.** New requests prefill into a fresh
  contiguous (L, A, P, Hkv, D) cache with the existing bucketed prefill
  program, then their rows are scattered into the ring at columns
  ``[(col-P) mod S, col)``. A row's prompt therefore sits wherever the
  global column happened to be — valid for the same reason as the ring.

* **Per-row decode state.** RoPE base, frame counter, EOS floor
  (min_frames), and temperature are per-row arrays; retired/empty slots
  ride along as masked rows (their compute is already paid for by the
  static shape).

* **Lagged harvest, statistics-only.** Chunk k's done flags — the ONLY
  per-chunk device→host transfer, a (B, steps) bitmap — are fetched
  while chunk k+1 executes (the same overlap trick as
  ``generate_codes``), so the device never stalls on the host;
  retirement and admission run one chunk behind, which the ring
  capacity accounts for. The codes themselves append to a
  device-resident (B, F, nq) log and are vocoded straight from HBM at
  retirement (or windowed for streaming); they cross to the host only
  if a caller reads ``ServeRequest.codes``.

Per-request sampling IS schedule-reproducible: every row draws its frame
``f`` noise from ``fold_in(fold_in(base, request_seed), f)`` — a pure
function of the request, independent of slot assignment, batch
composition, and chunk schedule — so both greedy (``top_k=1``) and
sampled (``top_k>1``) serving match ``QwenTTSModel.generate_codes``
token-exactly given the same per-request seed (pinned in
tests/test_serving.py). Reference scope note: the reference has no
serving engine at all — this is a parity+ subsystem; its closest
analogue is the request queue a deployment would put in front of
``base_tts.generate``.
"""

from __future__ import annotations

import logging
import queue as _queue
import threading
import time
from collections import deque
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import transformer as tfm
from .utils import profiling
from .models.qwen.model import (
    PROMPT_BUCKET,
    QwenTTSModel,
    _chunk,
    _predict_residuals,
    _prefill,
    _round_up,
    _sample_token_seeded,
    _vocode,
    _vocode_rows,
)

logger = logging.getLogger(__name__)

Params = Dict[str, Any]

# One lock for all requests' done-callback registration (registration is
# rare: once per request per listener — contention is not a concern).
_CB_LOCK = threading.Lock()

# Attribution mode: sync after every device dispatch so the per-stage
# wall-clock summary charges device time to the stage that spent it
# (normally dispatches are async and device time hides inside the next
# blocking fetch). Distorts totals — for profiling runs only.
import os as _os

_SYNC = _os.environ.get("RHO_TTS_TPU_SERVE_SYNC", "0") == "1"


def _np_fetch(x) -> np.ndarray:
    """``np.asarray`` for device arrays that may span processes.

    On a multi-host mesh (``parallel.mesh.create_multihost_mesh``) arrays
    sharded over ``data`` have shards on devices this process cannot
    address, so a plain fetch raises; an all-gather collective assembles
    the global value instead. Every process must therefore reach the same
    fetch sites in the same order — which holds because the scheduler is
    deterministic and every process drives the engine with the same
    submissions (single-controller-per-host SPMD, the same discipline
    ``multihost_dryrun`` certifies). Fully-addressable (single-process)
    and fully-replicated arrays take the direct path, costing nothing new.
    """
    if (
        isinstance(x, jax.Array)
        and not x.is_fully_addressable
        and not x.is_fully_replicated
    ):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _maybe_sync(x) -> None:
    if _SYNC:
        _np_fetch(jax.tree_util.tree_leaves(x)[0])


# ---------------------------------------------------------------------------
# Compiled programs
# ---------------------------------------------------------------------------


@partial(
    jax.jit, static_argnames=("cfg", "steps", "top_k"), donate_argnums=(1, 2, 3, 4)
)
def _serve_decode_chunk(
    params: Params,
    cache_k: jnp.ndarray,  # (L, B, S, Hkv, D) ring
    cache_v: jnp.ndarray,
    key_valid: jnp.ndarray,  # (B, S)
    codes_buf: jnp.ndarray,  # (B, F, nq) device-resident per-row code log
    cfg,  # QwenTTSConfig (static)
    col0: jnp.ndarray,  # scalar int32: global write column of step 0, already mod S
    rope_next: jnp.ndarray,  # (B,) rope position of this chunk's first token
    last_codes: jnp.ndarray,  # (B, nq)
    done: jnp.ndarray,  # (B,) bool
    active: jnp.ndarray,  # (B,) bool — row holds a live request
    seeds: jnp.ndarray,  # (B,) int32 per-request sampling seeds
    temperature: jnp.ndarray,  # (B,) f32
    frames_done: jnp.ndarray,  # (B,) int32: frames generated so far per row
    min_frames: jnp.ndarray,  # (B,) int32: EOS suppressed below this
    steps: int,
    top_k: int,
):
    """One compiled decode chunk over the slot batch (ring-buffer writes).

    Differs from ``models.qwen.model._decode_chunk`` in exactly the ways
    serving needs: per-row EOS floor (``frames_done``/``min_frames`` are
    (B,) arrays, rows joined at different times), a write column that
    wraps mod S, ``slot_causal=False`` attention (ring order ≠ time
    order), and an ``active`` mask so empty slots never mark cache
    columns valid.

    Every per-row state array lives ON DEVICE between chunks (the chunk
    returns ``rope_next``/``frames_done`` advanced by ``steps``); the
    scheduler only dispatches and reads back the lagged DONE FLAGS — the
    codes themselves append to ``codes_buf`` (per-row logical frame
    positions, scatter-dropped past its capacity) and stay in HBM until
    vocode reads them there. On relay-attached hosts each host→device
    transfer costs a round trip, so both per-chunk state uploads and
    per-chunk code fetches were dominant serving overheads before this
    layout.
    """
    b = last_codes.shape[0]
    nq = cfg.codec.n_codebooks
    s = cache_k.shape[2]

    def step(carry, t):
        cache_k, cache_v, key_valid, last_codes, done = carry
        embs = params["audio_embed"]  # (nq, V, H)
        emb = jnp.zeros((b, embs.shape[-1]), embs.dtype)
        for q in range(nq):
            emb = emb + embs[q][last_codes[:, q]]
        x = emb[:, None, :]

        pos = (rope_next + t)[:, None]  # (B, 1)
        slot = jnp.mod(col0 + t, s)
        h, (cache_k, cache_v) = tfm.stack_forward(
            params["talker"],
            cfg.talker,
            x,
            pos,
            kv_caches=(cache_k, cache_v),
            cache_len=slot,
            attn_mask=active[:, None],
            key_valid=key_valid,
            slot_causal=False,
        )
        key_valid = key_valid.at[:, slot].set(active)
        h_last = h[:, -1]
        logits = jax.lax.dot(
            h_last, params["lm_head"], preferred_element_type=jnp.float32
        )

        suppress = (frames_done + t) < min_frames  # (B,)
        eos_col = jnp.where(suppress, -1e30, logits[:, cfg.audio_eos])
        logits = logits.at[:, cfg.audio_eos].set(eos_col)
        # Per-row (seed, frame) keys: the draw is independent of slot
        # assignment and batch composition, so top_k>1 serving reproduces
        # the one-shot path given the same per-request seed.
        tok0 = _sample_token_seeded(
            logits, seeds, frames_done + t, temperature, top_k
        )
        newly_done = tok0 == cfg.audio_eos
        dead = done | ~active
        tok0 = jnp.where(dead, cfg.audio_pad, tok0)

        res = _predict_residuals(
            params, cfg, h_last, jnp.minimum(tok0, cfg.codec.codebook_size - 1)
        )
        res = jnp.where(dead[:, None], 0, res)
        codes = jnp.concatenate([tok0[:, None], res], axis=-1)

        done = done | newly_done
        return (cache_k, cache_v, key_valid, codes, done), (codes, done)

    carry0 = (cache_k, cache_v, key_valid, last_codes, done)
    carry, (codes_seq, done_seq) = jax.lax.scan(step, carry0, jnp.arange(steps))
    cache_k, cache_v, key_valid, last_codes, done = carry
    codes_chunk = jnp.transpose(codes_seq, (1, 0, 2))  # (B, steps, nq)
    done_chunk = jnp.transpose(done_seq, (1, 0))  # (B, steps)
    # Append this chunk's codes at each row's logical frame positions.
    # The frame AT the first EOS and everything after zero out so the
    # buffer region past a row's end matches the zero-padding the bucketed
    # vocode expects. Writes past capacity (retired rows idling as masked
    # compute) drop.
    idx = frames_done[:, None] + jnp.arange(steps, dtype=jnp.int32)[None, :]
    idx = jnp.where(active[:, None], idx, codes_buf.shape[1])  # drop inactive
    codes_z = jnp.where(done_chunk[..., None], 0, codes_chunk)
    codes_buf = codes_buf.at[
        jnp.arange(b, dtype=jnp.int32)[:, None], idx
    ].set(codes_z, mode="drop")
    return (
        done_chunk,
        cache_k,
        cache_v,
        key_valid,
        codes_buf,
        last_codes,
        done,
        rope_next + steps,
        frames_done + steps,
    )


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _insert_rows(
    cache_k: jnp.ndarray,  # (L, B, S, Hkv, D) ring
    cache_v: jnp.ndarray,
    key_valid: jnp.ndarray,  # (B, S)
    rows: jnp.ndarray,  # (A,) int32 slot indices being admitted
    pk: jnp.ndarray,  # (L, A, P, Hkv, D) prefilled prompt K
    pv: jnp.ndarray,
    pvalid: jnp.ndarray,  # (A, P) bool — real prompt tokens (left-padded)
    col0: jnp.ndarray,  # scalar int32: prompts end at this column (exclusive), mod S
):
    """Scatter freshly prefilled prompt rows into the ring cache.

    The prompt occupies columns ``[(col0-P) mod S, col0)`` of each row —
    anywhere in the ring is correct because keys carry RoPE rotations by
    logical position, not by slot. The admitted rows' ``key_valid`` is
    rebuilt from scratch (True only on real prompt columns), erasing
    whatever the slot's previous occupant left behind.

    Duplicate entries in ``rows`` (bucket padding repeats the last admit)
    write identical data, so scatter order doesn't matter.
    """
    s = cache_k.shape[2]
    p = pk.shape[2]
    cols = jnp.mod(col0 - p + jnp.arange(p), s)  # (P,)
    a = rows.shape[0]
    fresh = jnp.zeros((a, s), bool).at[:, cols].set(pvalid)
    key_valid = key_valid.at[rows].set(fresh)
    cache_k = cache_k.at[:, rows[:, None], cols[None, :]].set(pk.astype(cache_k.dtype))
    cache_v = cache_v.at[:, rows[:, None], cols[None, :]].set(pv.astype(cache_v.dtype))
    return cache_k, cache_v, key_valid


@partial(jax.jit, static_argnames=("top_k", "eos"))
def _admit_sample(logits, seeds, min_frames, temperature, top_k: int, eos: int):
    """Sample each admitted row's first token (frame 0) from its prefill
    logits with the per-request (seed, frame=0) key — the same draw the
    one-shot path makes. EOS suppressed where the row has a min-frames
    floor. Stays on device — the host never waits on prefill completion."""
    eos_col = jnp.where(min_frames > 0, -1e30, logits[:, eos])
    logits = logits.at[:, eos].set(eos_col)
    tok0 = _sample_token_seeded(
        logits, seeds, jnp.zeros_like(seeds), temperature, top_k
    )
    return tok0, tok0 == eos


@jax.jit
def _admit_full(
    last_codes, done, active, rope_next, frames_done, min_frames, temperature,
    codes_buf, seeds, rows, tok0, done0, lens, minf, temps, seed_vals,
):
    """Write the admitted rows into every device-resident state carry.

    Duplicate ``rows`` entries (bucket padding) carry identical values.
    Frame 0 of the code log is the prefill-sampled primary token (residuals
    zero — same convention as ``generate_codes``); later frames beyond a
    new request's end are zeroed by the chunk writes and masked again at
    vocode time, so the previous occupant's log never leaks through.
    """
    nq = last_codes.shape[1]
    first = jnp.concatenate(
        [tok0[:, None], jnp.zeros((tok0.shape[0], nq - 1), jnp.int32)], axis=-1
    )
    f = codes_buf.shape[1]
    row0 = jnp.zeros((tok0.shape[0], f, nq), codes_buf.dtype)
    row0 = row0.at[:, 0, 0].set(tok0)
    return (
        last_codes.at[rows].set(first),
        done.at[rows].set(done0),
        active.at[rows].set(True),
        rope_next.at[rows].set(lens),
        frames_done.at[rows].set(1),  # frame 0 = the prefill-sampled token
        min_frames.at[rows].set(minf),
        temperature.at[rows].set(temps),
        codes_buf.at[rows].set(row0),
        seeds.at[rows].set(seed_vals),
    )


@jax.jit
def _clear_rows(active, done, rows):
    """Deactivate retired rows (they keep decoding pads until re-admitted)."""
    return active.at[rows].set(False), done.at[rows].set(True)


@partial(jax.jit, static_argnames=("cfg", "w"))
def _vocode_windows(params: Params, cfg, codes_buf, rows, los, ends, w: int):
    """Vocode per-row windows ``codes_buf[row, lo:lo+w]`` (frames ≥ end
    zeroed) for streaming emission — the sliding-window pieces never
    round-trip through the host."""
    gathered = codes_buf[rows]  # (G, F, nq)
    win = jax.vmap(
        lambda r, lo: jax.lax.dynamic_slice(
            r, (lo, 0), (w, r.shape[1])
        )
    )(gathered, los)
    mask = (los[:, None] + jnp.arange(w, dtype=jnp.int32)[None, :]) < ends[:, None]
    win = jnp.where(mask[..., None], win, 0)
    return _vocode(params, cfg, win)


# ---------------------------------------------------------------------------
# Requests
# ---------------------------------------------------------------------------


class ServeRequest:
    """Handle for one submitted utterance; a minimal future.

    With ``stream=True``, audio is also delivered incrementally through
    :meth:`chunks` as decode chunks harvest (sliding-window vocode, same
    design as ``QwenTTSModel.stream_chunks``) — constant time-to-first-
    audio even while the request shares the batch with long utterances.
    """

    def __init__(
        self,
        text: str,
        speaker: Optional[str],
        language: str,
        ref_audio: Optional[str],
        ref_text: Optional[str],
        min_frames: int,
        max_frames: int,
        temperature: float,
        stream: bool = False,
        priority: int = 0,
        expires_s: Optional[float] = None,
        seed: int = 0,
    ):
        self.text = text
        self.speaker = speaker
        self.language = language
        self.ref_audio = ref_audio
        self.ref_text = ref_text
        self.min_frames = int(min_frames)
        self.max_frames = int(max_frames)
        self.temperature = float(temperature)
        self.stream = bool(stream)
        self.priority = int(priority)
        self.expires_s = expires_s
        self.seed = int(seed)

        self._event = threading.Event()
        self._cancelled = threading.Event()
        self._done_cbs: List[Any] = []
        self._chunk_q = _queue.Queue() if stream else None
        self.wav: Optional[jnp.ndarray] = None  # device array until fetched
        self._codes_np: Optional[np.ndarray] = None  # trimmed (n_frames, nq)
        self._codes_ref = None  # (device codes group, row-in-group, end)
        self.sample_rate: Optional[int] = None
        self.error: Optional[BaseException] = None
        self.n_frames: int = 0
        self.t_submit = time.time()
        self.t_admit: Optional[float] = None
        self.t_first_audio: Optional[float] = None
        self.t_done: Optional[float] = None

    def chunks(self, timeout: Optional[float] = None):
        """Yield waveform pieces (np (S,), sr) as they are generated.

        Only for ``stream=True`` requests. The concatenation of all
        pieces equals :meth:`result`'s waveform. Raises on error or
        cancellation once the stream ends.
        """
        if self._chunk_q is None:
            raise ValueError("request was not submitted with stream=True")
        while True:
            item = self._chunk_q.get(timeout=timeout)
            if item is None:
                break
            yield item
        if self.error is not None:
            raise self.error
        if self.cancelled:
            raise RuntimeError("request was cancelled")

    @property
    def codes(self) -> Optional[np.ndarray]:
        """Trimmed (n_frames, nq) code matrix; fetched from HBM on first
        access (the serving hot path never pays the host transfer)."""
        if self._codes_np is None and self._codes_ref is not None:
            arr, b, end = self._codes_ref
            self._codes_np = _np_fetch(arr[b])[:end]
            self._codes_ref = None
        return self._codes_np

    def cancel(self) -> None:
        """Cooperative cancel: queued requests are dropped at admission,
        active ones retired (without vocoding) at the next chunk boundary."""
        self._cancelled.set()

    @property
    def cancelled(self) -> bool:
        return self._cancelled.is_set()

    def done(self) -> bool:
        return self._event.is_set()

    def result(self, timeout: Optional[float] = None) -> Tuple[np.ndarray, int]:
        """Block until finished; returns (waveform (T,) float32, sr).

        Raises the stored error on failure and ``RuntimeError`` on
        cancellation or timeout. The waveform stays a device array until
        this call fetches it (serving throughput never pays host
        transfer for unfetched audio).
        """
        if not self._event.wait(timeout):
            raise TimeoutError(f"request not finished after {timeout}s")
        if self.error is not None:
            raise self.error
        if self.cancelled:
            raise RuntimeError("request was cancelled")
        return _np_fetch(self.wav), int(self.sample_rate)

    def add_done_callback(self, fn) -> None:
        """Call ``fn(self)`` when the request resolves (success, error, or
        cancellation). Fires immediately if already resolved. Callbacks run
        on the serving thread — keep them cheap (e.g. a queue put)."""
        fire = False
        with _CB_LOCK:
            if self._event.is_set():
                fire = True
            else:
                self._done_cbs.append(fn)
        if fire:
            fn(self)

    def _resolve(self) -> None:
        self.t_done = time.time()
        with _CB_LOCK:
            cbs, self._done_cbs = self._done_cbs, []
            self._event.set()
        for fn in cbs:
            try:
                fn(self)
            except Exception:  # noqa: BLE001 — callbacks must not kill serving
                logger.exception("ServeRequest done-callback failed")


class _Slot:
    """Host-side bookkeeping for one batch row.

    The codes themselves live in the engine's device-resident
    ``_codes_buf`` row; the host tracks only frame counters and EOS
    position (reconstructed from the harvested done flags)."""

    __slots__ = ("req", "done_seen", "frames", "emitted", "pieces")

    def __init__(self):
        self.req: Optional[ServeRequest] = None
        self.done_seen: Optional[int] = None  # frame idx of first EOS, if seen
        self.frames = 0  # frames harvested so far (incl. frame 0)
        self.emitted = 0  # frames already streamed out (stream=True rows)
        self.pieces: List[np.ndarray] = []  # streamed waveform pieces


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------


class ServingEngine:
    """Slot-batched continuous serving over one :class:`QwenTTSModel`.

    ``n_slots`` fixes the decode batch (the compiled shape); ``max_prompt``
    and ``max_frames`` bound a request's prompt tokens and generated
    frames, which together size the KV ring. Submit from any thread;
    drive with :meth:`step` / :meth:`run_until_idle` (deterministic,
    test-friendly) or :meth:`start` (background thread).

    Mesh serving: a model prepared with
    ``parallel.inference.enable_data_parallel`` / ``enable_tensor_parallel``
    serves through the same engine — slot rows shard over the mesh's
    ``data`` axis (``n_slots`` must divide it) and KV heads over
    ``model``; XLA propagates the shardings through the decode chunk,
    admission prefill, and scatters, inserting the TP psums over ICI.
    Greedy results stay token-exact vs single-chip (mesh parity is
    pinned in tests/test_serving.py).
    """

    def __init__(
        self,
        model: QwenTTSModel,
        n_slots: int = 8,
        max_prompt: int = 256,
        max_frames: int = 768,
        top_k: Optional[int] = None,
        seed: int = 0,
        stream_context: int = 32,
        max_queue: Optional[int] = None,
        draft_model: Optional[QwenTTSModel] = None,
        gamma: int = 4,
        residual_mode: str = "draft",
    ):
        self.model = model
        self.mesh = model.mesh  # None for single-chip serving
        self.cfg = model.config
        self.chunk = _chunk()
        self.n_slots = int(n_slots)
        self.max_prompt = _round_up(int(max_prompt), PROMPT_BUCKET)
        self.max_frames = _round_up(int(max_frames), self.chunk)
        self.top_k = int(self.cfg.top_k if top_k is None else top_k)
        self.stream_context = int(stream_context)

        # Speculative serving (serving_spec): a distilled draft proposes
        # gamma tokens per round, the target verifies them in one T=gamma+1
        # forward. Per-row acceptance desynchronizes rows, which the ring
        # design absorbs (see serving_spec module docstring).
        self.draft = draft_model
        self.gamma = int(gamma)
        self.residual_mode = residual_mode
        if draft_model is not None:
            if residual_mode not in ("strict", "draft"):
                raise ValueError(f"Unknown residual_mode: {residual_mode!r}")
            if self.gamma < 1:
                raise ValueError(f"gamma must be >= 1, got {gamma}")
            dcfg = draft_model.config
            if (dcfg.audio_vocab != self.cfg.audio_vocab
                    or dcfg.text_vocab != self.cfg.text_vocab):
                raise ValueError(
                    "draft must share the target's text and codec vocabularies"
                )
            if self.mesh is not None:
                raise NotImplementedError(
                    "speculative serving over a device mesh is not wired yet;"
                    " serve the draft single-chip"
                )
        # Ring capacity. Non-speculative: prompt + generated frames + one
        # chunk of lagged-retirement slack (rows decode one surplus chunk
        # while their last harvest is in flight). Speculative: per-row
        # write columns REWIND past rejected proposals after each round,
        # so a row's columns are exactly prompt + emitted keys + one
        # transient gamma+1 block; rows reset to column 0 at admission
        # (columns are private per row — the batch dimension separates
        # rows) so there is no wrap. Slack: the in-flight block plus up
        # to two lagged rounds of emissions past a row's frame budget.
        # Keeping the cache at non-spec size keeps the per-round
        # attention HBM read at non-spec size — the cost speculation is
        # trying to beat.
        if draft_model is None:
            self.ring = self.max_prompt + self.max_frames + self.chunk
        else:
            # Rounds per dispatch: a speculative round harvests only
            # ~accepted-frames, so per-dispatch host overhead weighs far
            # heavier than in the fixed-step chunk; scanning k rounds in
            # one program amortizes it (serving_spec._spec_serve_rounds).
            self.spec_k = max(
                1, int(_os.environ.get("RHO_TTS_TPU_SPEC_ROUNDS", "4"))
            )
            # A row can overshoot its frame budget by up to two lagged
            # dispatches of k rounds before the host retires it.
            self.ring = (
                self.max_prompt + self.max_frames
                + (2 * self.spec_k + 1) * (self.gamma + 1)
            )

        # Mesh serving: slot rows shard over 'data', KV heads over 'model'
        # (the same layout as the one-shot TP/DP paths); everything else —
        # params sharded by parallel.inference, prefill outputs, scatters —
        # follows by XLA sharding propagation through the jitted programs.
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

        cache_k, cache_v = tfm.make_kv_cache(self.cfg.talker, self.n_slots, self.ring)
        self._cache_k = place(cache_k, None, "data", None, "model")
        self._cache_v = place(cache_v, None, "data", None, "model")
        self._key_valid = place(jnp.zeros((self.n_slots, self.ring), bool), "data")
        # Per-row decode state: ALL device-resident between chunks (the
        # chunk program advances rope/frame counters itself); the host
        # only tracks which slot belongs to which request.
        self._last_codes = place(
            jnp.zeros((self.n_slots, self.cfg.codec.n_codebooks), jnp.int32), "data"
        )
        self._done = place(jnp.ones((self.n_slots,), bool), "data")
        self._active_dev = place(jnp.zeros((self.n_slots,), bool), "data")
        self._rope_next = place(jnp.zeros((self.n_slots,), jnp.int32), "data")
        self._frames_done = place(jnp.zeros((self.n_slots,), jnp.int32), "data")
        self._min_frames = place(jnp.zeros((self.n_slots,), jnp.int32), "data")
        self._temp = place(
            jnp.full((self.n_slots,), self.cfg.temperature, jnp.float32), "data"
        )
        # Per-request sampling seeds: row i at frame f draws from
        # fold_in(fold_in(base, seed), f) — schedule-reproducible, matching
        # the one-shot path (models.qwen.model._sample_token_seeded).
        self._seeds = place(jnp.zeros((self.n_slots,), jnp.int32), "data")
        # Device-resident per-row code log: frame 0 (prefill-sampled) plus
        # up to max_frames of decode, with one chunk of slack so streaming
        # windows can slice a full bucket at the tail.
        self._codes_buf = place(
            jnp.zeros(
                (self.n_slots, self.max_frames + self.chunk, self.cfg.codec.n_codebooks),
                jnp.int32,
            ),
            "data",
        )
        if self.draft is not None:
            d_ck, d_cv = tfm.make_kv_cache(
                self.draft.config.talker, self.n_slots, self.ring
            )
            self._d_cache_k, self._d_cache_v = d_ck, d_cv
            self._d_key_valid = jnp.zeros((self.n_slots, self.ring), bool)
            # Per-row write columns (target & draft share the layout).
            self._spec_cols = jnp.zeros((self.n_slots,), jnp.int32)
        self._init_scheduling(seed, max_queue)

    def _init_scheduling(self, seed: int, max_queue: Optional[int]) -> None:
        """Host-side scheduling state shared by every engine flavor
        (queue, slots, locks, stats) — model-agnostic."""
        self._seed0 = int(seed)
        self._n_submitted = 0  # drives default per-request seeds

        self._active = np.zeros(self.n_slots, bool)  # host mirror (scheduling)
        self._slots = [_Slot() for _ in range(self.n_slots)]

        self._col = 0  # global write column (kept in [0, ring))
        self.max_queue = max_queue  # backpressure: submit() raises when full
        self._queue: deque[ServeRequest] = deque()
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._loop_error: Optional[BaseException] = None
        # Lagged harvest: (done_dev bitmap, row→request snapshot)
        self._pending: Optional[Tuple[Any, List[Optional[ServeRequest]]]] = None

        # Stats
        self.frames_decoded = 0  # real (harvested, pre-EOS) frames
        self.frames_delivered = 0  # frames in resolved waveforms
        self.requests_done = 0
        self.spec_rounds = 0  # speculative draft/verify rounds dispatched
        self._t_first: Optional[float] = None
        self._t_last: Optional[float] = None

    # -- submission ---------------------------------------------------------

    def submit(
        self,
        text: str,
        speaker: Optional[str] = None,
        language: str = "English",
        ref_audio: Optional[str] = None,
        ref_text: Optional[str] = None,
        min_frames: int = 0,
        max_frames: Optional[int] = None,
        temperature: Optional[float] = None,
        stream: bool = False,
        priority: int = 0,
        expires_s: Optional[float] = None,
        seed: Optional[int] = None,
    ) -> ServeRequest:
        """Queue one utterance; returns a future-like :class:`ServeRequest`.

        ``stream=True`` additionally delivers audio incrementally via
        :meth:`ServeRequest.chunks` — each harvested decode chunk is
        vocoded through a sliding window (``stream_context`` frames of
        context) and pushed immediately, so first audio arrives after the
        request's first chunk regardless of batch-mates' lengths.

        ``priority``: higher admits first (FIFO within a level).
        ``expires_s``: a request still QUEUED this many seconds after
        submission is dropped at admission time and resolves with a
        timeout error — load-shedding for latency-bound callers.
        ``seed``: per-request sampling seed. Sampling is a pure function
        of (seed, frame index), so results are reproducible across slot
        assignments and batch compositions, and match
        ``QwenTTSModel.generate_codes(..., seeds=[seed])`` exactly.
        Defaults to a deterministic per-submission value derived from the
        engine seed and the submission index.
        """
        if seed is None:
            seed = self._default_seed()
        if max_frames is None:
            max_frames = int(np.clip(len(text) * 1.0 + 50, self.chunk, self.max_frames))
        max_frames = min(_round_up(int(max_frames), self.chunk), self.max_frames)
        req = ServeRequest(
            text,
            speaker,
            language,
            ref_audio,
            ref_text,
            min_frames=min(int(min_frames), max_frames),
            max_frames=max_frames,
            temperature=self.cfg.temperature if temperature is None else temperature,
            stream=stream,
            priority=priority,
            expires_s=expires_s,
            seed=seed,
        )
        return self._enqueue(req)

    def _default_seed(self) -> int:
        """Deterministic, collision-free per-submission seed."""
        with self._lock:
            idx = self._n_submitted
            self._n_submitted += 1
        return (self._seed0 * 1_000_003 + idx) & 0x7FFFFFFF

    def _enqueue(self, req: ServeRequest) -> ServeRequest:
        """Priority-FIFO insert + wake the serving thread (shared by every
        engine flavor; the request must be fully initialized first)."""
        priority = req.priority
        with self._wake:
            if self._loop_error is not None:
                raise RuntimeError(
                    f"serving engine is down: {self._loop_error!r}"
                ) from self._loop_error
            if self.max_queue is not None and len(self._queue) >= self.max_queue:
                raise RuntimeError(
                    f"serving queue full ({self.max_queue}); apply backpressure"
                )
            if priority == 0 or all(q.priority >= priority for q in self._queue):
                self._queue.append(req)  # common case: FIFO tail
            else:
                idx = next(
                    (i for i, q in enumerate(self._queue) if q.priority < priority),
                    len(self._queue),
                )
                self._queue.insert(idx, req)
            self._wake.notify()
        return req

    # -- scheduling ---------------------------------------------------------

    def _free_rows(self) -> List[int]:
        return [i for i in range(self.n_slots) if not self._active[i]]

    def _admit(self) -> int:
        """Move queued requests into free slots; one bucketed prefill per
        admission group. Returns the number admitted."""
        free = self._free_rows()
        picked: List[ServeRequest] = []
        with self._lock:
            now = time.time()
            while free[len(picked):] and self._queue:
                req = self._queue.popleft()
                if req.cancelled or (
                    req.expires_s is not None and now - req.t_submit > req.expires_s
                ):
                    if not req.cancelled:
                        req.error = TimeoutError(
                            f"queued longer than expires_s={req.expires_s}s"
                        )
                    if req._chunk_q is not None:
                        req._chunk_q.put(None)
                    req._resolve()
                    continue
                picked.append(req)
        if not picked:
            return 0

        # Build per-request prompt arrays (each may carry its own speaker /
        # reference audio), then left-pad to the group bucket and stack.
        with profiling.stage("serve/admit_build"):
            built = self._admit_build(picked)
        if not built:
            return 0
        with profiling.stage("serve/admit_prefill"):
            n = self._admit_prefill(built)
        return n

    def _admit_build(self, picked: List[ServeRequest]):
        """Host-side prompt array construction for an admission group."""
        built = []
        for req in picked:
            arrays, lens, p = self.model._build_prompt_arrays(
                [req.text], req.speaker, req.language, req.ref_audio, req.ref_text
            )
            if lens[0] > self.max_prompt:
                req.error = ValueError(
                    f"prompt is {lens[0]} tokens; engine max_prompt={self.max_prompt}"
                )
                if req._chunk_q is not None:
                    req._chunk_q.put(None)
                req._resolve()
                continue
            built.append((req, arrays, lens[0], p))
        return built

    def _admit_prefill(self, built) -> int:
        """Prefill the admission group and scatter it into the ring."""
        free = self._free_rows()
        p_group = max(p for _, _, _, p in built)
        a_real = len(built)
        a = 1 << (a_real - 1).bit_length()  # admit-batch bucket (1,2,4,8,…)
        rows_real = free[:a_real]

        def pad_row(arrays, n, p_from):
            """Left-extend one request's arrays from p_from to p_group."""
            d = p_group - p_from
            out = {}
            out["ids_slotted"] = np.pad(arrays["ids_slotted"], ((0, 0), (d, 0)))
            out["text_mask"] = np.pad(arrays["text_mask"], ((0, 0), (d, 0)))
            out["codes_slotted"] = np.pad(
                arrays["codes_slotted"], ((0, 0), (d, 0), (0, 0))
            )
            out["code_mask"] = np.pad(arrays["code_mask"], ((0, 0), (d, 0)))
            out["spk_ids"] = arrays["spk_ids"]
            out["spk_mask"] = np.pad(arrays["spk_mask"], ((0, 0), (d, 0)))
            out["rope_pos"] = np.maximum(
                np.arange(p_group, dtype=np.int32) - (p_group - n), 0
            )[None]
            out["attn_mask"] = (np.arange(p_group) >= (p_group - n))[None]
            return out

        stacked = {}
        padded = [pad_row(arrays, n, p) for _, arrays, n, p in built]
        for k in padded[0]:
            rows = [pr[k] for pr in padded]
            rows += [rows[-1]] * (a - a_real)  # bucket padding repeats last
            stacked[k] = np.concatenate(rows, axis=0)

        pk, pv = tfm.make_kv_cache(self.cfg.talker, a, p_group)
        pkv = jnp.zeros((a, p_group), bool)
        sj = {k: jnp.asarray(v) for k, v in stacked.items()}
        logits, pk, pv, pkv = _prefill(
            self.model.params, self.cfg,
            sj["ids_slotted"], sj["text_mask"], sj["codes_slotted"],
            sj["code_mask"], sj["spk_ids"], sj["spk_mask"],
            sj["rope_pos"], sj["attn_mask"], pk, pv, pkv,
        )

        # Bucket padding duplicates the LAST REAL row (same target row index
        # in rows_arr) — duplicate scatters must carry identical values or
        # the winner is unspecified and could clobber the real admit.
        pad = lambda xs, fill: xs + [xs[-1] if xs else fill] * (a - a_real)  # noqa: E731
        min_f = np.array(pad([r.min_frames for r, _, _, _ in built], 0), np.int32)
        temps = np.array(pad([r.temperature for r, _, _, _ in built], 1.0), np.float32)
        lens_arr = np.array(pad([n for _, _, n, _ in built], 0), np.int32)
        seed_vals = np.array(pad([r.seed for r, _, _, _ in built], 0), np.int32)
        rows_arr = jnp.asarray(np.array(pad(rows_real, 0), np.int32))

        tok0, done0 = _admit_sample(
            logits, jnp.asarray(seed_vals), jnp.asarray(min_f), jnp.asarray(temps),
            self.top_k, int(self.cfg.audio_eos),
        )
        # Speculative mode: columns are per-row and reset at admission —
        # the prompt occupies [0, p_group) of the row's own cache lines.
        # Non-speculative: batch-uniform column, prompt ends at the
        # current global write column.
        ins_col = jnp.int32(p_group if self.draft is not None else self._col)
        self._cache_k, self._cache_v, self._key_valid = _insert_rows(
            self._cache_k, self._cache_v, self._key_valid,
            rows_arr, pk, pv, pkv, ins_col,
        )
        if self.draft is not None:
            # The draft consumes the SAME prompt arrays (vocabularies are
            # validated equal) through its own prefill program into its own
            # ring; its prefill logits are unused (frame 0 samples from the
            # target, exactly like the one-shot and non-speculative paths).
            dcfg = self.draft.config
            dpk, dpv = tfm.make_kv_cache(dcfg.talker, a, p_group)
            dpkv = jnp.zeros((a, p_group), bool)
            _dl, dpk, dpv, dpkv = _prefill(
                self.draft.params, dcfg,
                sj["ids_slotted"], sj["text_mask"], sj["codes_slotted"],
                sj["code_mask"], sj["spk_ids"], sj["spk_mask"],
                sj["rope_pos"], sj["attn_mask"], dpk, dpv, dpkv,
            )
            self._d_cache_k, self._d_cache_v, self._d_key_valid = _insert_rows(
                self._d_cache_k, self._d_cache_v, self._d_key_valid,
                rows_arr, dpk, dpv, dpkv, ins_col,
            )
            self._spec_cols = self._spec_cols.at[rows_arr].set(p_group)
        (self._last_codes, self._done, self._active_dev, self._rope_next,
         self._frames_done, self._min_frames, self._temp,
         self._codes_buf, self._seeds) = _admit_full(
            self._last_codes, self._done, self._active_dev, self._rope_next,
            self._frames_done, self._min_frames, self._temp, self._codes_buf,
            self._seeds, rows_arr, tok0, done0, jnp.asarray(lens_arr),
            jnp.asarray(min_f), jnp.asarray(temps), jnp.asarray(seed_vals),
        )

        now = time.time()
        for j, (req, _, n, _) in enumerate(built):
            row = rows_real[j]
            self._active[row] = True
            slot = self._slots[row]
            slot.req = req
            slot.pieces = []
            slot.emitted = 0
            slot.done_seen = None  # EOS-at-frame-0 surfaces via the done carry
            slot.frames = 1
            req.t_admit = now
        _maybe_sync(self._last_codes)
        return a_real

    def _flush(self) -> None:
        """Harvest the outstanding lagged chunk, if any."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            self._harvest_one(pending)

    def _harvest_one_spec(self, pending) -> None:
        """Harvest one speculative dispatch: per-row real-frame counts + EOS.

        The packed (k, B, 2) [n_real, hit_eos] array is the dispatch's
        only device→host transfer (lagged, same overlap as the
        non-speculative done bitmap). Post-EOS rounds inside the k-scan
        contribute zero real frames (``live`` masking), so summing the
        rounds and OR-ing the EOS bits recovers exact per-row totals."""
        harvest_dev, owners = pending
        with profiling.stage("serve/harvest"):
            hv = _np_fetch(harvest_dev)  # (k, B, 2) int32

        retire: List[int] = []
        emits: List[Tuple[int, int, int, int]] = []
        for row in range(self.n_slots):
            req = owners[row]
            slot = self._slots[row]
            if req is None or slot.req is not req:
                continue
            n_real = int(hv[:, row, 0].sum())
            eos = bool(hv[:, row, 1].any())
            if slot.done_seen is None:
                slot.frames += n_real
                self.frames_decoded += n_real
                if eos:
                    slot.done_seen = slot.frames
            finished = (
                slot.done_seen is not None
                or slot.frames >= req.max_frames
                or req.cancelled
            )
            if req.stream and not req.cancelled:
                total = slot.done_seen if slot.done_seen is not None else slot.frames
                total = max(min(total, req.max_frames), 1)
                safe = total if finished else max(total - self.stream_context, 0)
                if safe > slot.emitted:
                    lo = self._widen_lo(
                        max(slot.emitted - self.stream_context, 0), total
                    )
                    emits.append((row, lo, total, slot.emitted))
                    slot.emitted = safe
            if finished:
                retire.append(row)
        if emits:
            self._emit_stream(emits)
        if retire:
            self._retire(retire)

    def _harvest_one(self, pending) -> None:
        """Fetch one chunk's done flags and retire finished rows.

        The only per-chunk device→host transfer is the (B, steps) done
        bitmap — the codes stay in the device-resident log until vocode
        reads them there."""
        if self.draft is not None:
            return self._harvest_one_spec(pending)
        done_dev, owners = pending
        with profiling.stage("serve/harvest"):
            dones = _np_fetch(done_dev)

        retire: List[int] = []
        emits: List[Tuple[int, int, int, int]] = []  # (row, lo, hi, emit_from)
        steps = dones.shape[1]
        for row in range(self.n_slots):
            req = owners[row]
            slot = self._slots[row]
            if req is None or slot.req is not req:
                continue  # row was empty, or re-admitted since this chunk ran
            if slot.done_seen is None:
                hit = np.nonzero(dones[row])[0]
                if hit.size:
                    slot.done_seen = slot.frames + int(hit[0])
                    self.frames_decoded += int(hit[0]) + 1
                else:
                    self.frames_decoded += steps
                slot.frames += steps
            finished = (
                slot.done_seen is not None
                or slot.frames >= req.max_frames
                or req.cancelled
            )
            if req.stream and not req.cancelled:
                total = slot.done_seen if slot.done_seen is not None else slot.frames
                total = max(min(total, req.max_frames), 1)
                safe = total if finished else max(total - self.stream_context, 0)
                if safe > slot.emitted:
                    lo = self._widen_lo(
                        max(slot.emitted - self.stream_context, 0), total
                    )
                    emits.append((row, lo, total, slot.emitted))
                    slot.emitted = safe
            if finished:
                retire.append(row)
        if emits:
            self._emit_stream(emits)
        if retire:
            self._retire(retire)

    def _emit_stream(self, emits: List[Tuple[int, int, int, int]]) -> None:
        """Vocode sliding windows for streaming rows and push the pieces.

        Windows with the same padded length share one vocoder dispatch,
        reading straight from the device code log (``_vocode_windows``) —
        only the emitted waveform piece crosses to the host. The conv
        vocoder is local, so a window with ``stream_context`` frames of
        left context reproduces the full-utterance vocode for every
        emitted sample (same property ``stream_chunks`` golden-tests
        against the one-shot path).
        """
        by_len: Dict[int, List[Tuple[int, int, int, int]]] = {}
        for row, lo, hi, emit_from in emits:
            w = _round_up(hi - lo, self.chunk)
            by_len.setdefault(w, []).append((row, lo, hi, emit_from))
        for w, group in by_len.items():
            with profiling.stage("serve/stream_vocode"):
                rows = jnp.asarray(np.array([g[0] for g in group], np.int32))
                los = jnp.asarray(np.array([g[1] for g in group], np.int32))
                ends = jnp.asarray(np.array([g[2] for g in group], np.int32))
                wav = self._stream_vocode(rows, los, ends, w)
                for b, (row, lo, hi, emit_from) in enumerate(group):
                    slot = self._slots[row]
                    req = slot.req
                    emit_to = slot.emitted  # set before the dispatch
                    piece = self._stream_piece(wav[b], lo, hi, emit_from, emit_to)
                    slot.pieces.append(piece)
                    if req.t_first_audio is None:
                        req.t_first_audio = time.time()  # after the fetch
                    req._chunk_q.put((piece, self.model.sample_rate))

    def _widen_lo(self, lo: int, hi: int) -> int:
        """Model hook: widen a streaming window's start frame (e.g. the
        watermark envelope needs a minimum sample span). Default: as-is."""
        return lo

    def _stream_vocode(self, rows, los, ends, w: int):
        """Model hook: vocode per-row sliding windows from the device log."""
        return _vocode_windows(
            self.model.params, self.cfg, self._codes_buf, rows, los, ends, w
        )

    def _stream_piece(
        self, wav_row, lo: int, hi: int, emit_from: int, emit_to: int
    ):
        """Model hook: extract (and fetch) one emitted piece from a vocoded
        window covering frames ``[lo, hi)``."""
        hop = self.cfg.codec.hop
        return _np_fetch(wav_row[(emit_from - lo) * hop : (emit_to - lo) * hop])

    def _retire(self, rows: List[int]) -> None:
        """Trim and (bucket-)vocode finished rows straight from the device
        code log; free slots.

        Rows are freed BEFORE vocoding so the same step's admission can
        refill them; the vocode/codes-gather dispatches issued here are
        ordered ahead of any re-admission's buffer writes on the device
        stream, so the retiring data is read before it can be overwritten.
        """
        self._active_dev, self._done = _clear_rows(
            self._active_dev, self._done,
            jnp.asarray(np.array(rows, np.int32)),
        )
        by_len: Dict[int, List[Tuple[ServeRequest, int, int]]] = {}
        for row in rows:
            slot = self._slots[row]
            req = slot.req
            self._active[row] = False
            slot.req = None
            if req.cancelled:
                slot.pieces = []
                if req._chunk_q is not None:
                    req._chunk_q.put(None)
                req._resolve()
                continue
            end = slot.done_seen if slot.done_seen is not None else slot.frames
            end = max(min(end, req.max_frames), 1)
            req.n_frames = end
            self.frames_delivered += end
            if req.stream:
                # The streamed pieces ARE the waveform (final flush already
                # emitted in _emit_stream before retirement); codes stay
                # device-resident behind the lazy property.
                req._codes_ref = (self._codes_buf[row, :end][None], 0, end)
                req.wav = np.concatenate(slot.pieces) if slot.pieces else np.zeros(0, np.float32)
                req.sample_rate = self.model.sample_rate
                slot.pieces = []
                slot.emitted = 0
                req._chunk_q.put(None)
                self.requests_done += 1
                req._resolve()
                continue
            t = _round_up(end, self.chunk)
            by_len.setdefault(t, []).append((req, row, end))

        with profiling.stage("serve/retire_vocode"):
            for t, group in by_len.items():
                rows_arr = jnp.asarray(np.array([g[1] for g in group], np.int32))
                ends_arr = jnp.asarray(np.array([g[2] for g in group], np.int32))
                wav, codes_masked = self._retire_vocode(rows_arr, ends_arr, t)
                _maybe_sync(wav)
                for b, (req, _row, end) in enumerate(group):
                    req._codes_ref = (codes_masked, b, end)
                    req.wav = self._finish_wav(wav[b], end)
                    req.sample_rate = self.model.sample_rate
                    self.requests_done += 1
                    req._resolve()

    def _retire_vocode(self, rows_arr, ends_arr, t: int):
        """Model hook: vocode retiring rows straight from the device log;
        returns (waveforms (G, t*hop), masked code group for lazy
        ``ServeRequest.codes`` fetches)."""
        return _vocode_rows(
            self.model.params, self.cfg, self._codes_buf, rows_arr, ends_arr, t
        )

    def _finish_wav(self, wav_row, end: int):
        """Model hook: final per-request waveform from its vocoded row
        (stays a device array until the caller fetches it)."""
        return wav_row[: end * self.cfg.codec.hop]

    # -- main loop ----------------------------------------------------------

    def _dispatch(self):
        """Model hook: dispatch ONE decode round over the slot batch and
        return the lagged-harvest payload (a small device array the host
        fetches one round later)."""
        if self.draft is not None:
            from .serving_spec import _spec_serve_rounds

            (harvest,
             self._cache_k, self._cache_v, self._key_valid,
             self._d_cache_k, self._d_cache_v, self._d_key_valid,
             self._codes_buf, self._last_codes, self._done,
             self._spec_cols, self._rope_next,
             self._frames_done) = _spec_serve_rounds(
                self.model.params, self.draft.params,
                self._cache_k, self._cache_v, self._key_valid,
                self._d_cache_k, self._d_cache_v, self._d_key_valid,
                self._codes_buf,
                self.cfg, self.draft.config,
                self._spec_cols,
                self._rope_next, self._last_codes, self._done,
                self._active_dev, self._seeds, self._temp,
                self._frames_done, self._min_frames,
                self.gamma, self.top_k, self.residual_mode,
                self.spec_k,
            )
            self.spec_rounds += self.spec_k
            return harvest
        (done_chunk, self._cache_k, self._cache_v,
         self._key_valid, self._codes_buf, self._last_codes,
         self._done,
         self._rope_next, self._frames_done) = (
            _serve_decode_chunk(
                self.model.params,
                self._cache_k, self._cache_v, self._key_valid,
                self._codes_buf,
                self.cfg,
                jnp.int32(self._col),
                self._rope_next,
                self._last_codes,
                self._done,
                self._active_dev,
                self._seeds,
                self._temp,
                self._frames_done,
                self._min_frames,
                self.chunk,
                self.top_k,
            )
        )
        self._col = (self._col + self.chunk) % self.ring
        return done_chunk

    def step(self) -> bool:
        """One scheduler iteration: admit → dispatch a chunk → harvest the
        previous chunk (its fetch overlaps the new chunk's execution).
        Single-threaded driver only. Returns True if any work was done."""
        with profiling.stage("serve/admit"):
            self._admit()
        if self._active.any():
            owners = [self._slots[i].req for i in range(self.n_slots)]
            with profiling.stage("serve/dispatch"):
                payload = self._dispatch()
                _maybe_sync(payload)
            if self._t_first is None:
                self._t_first = time.time()
            prev, self._pending = self._pending, (payload, owners)
            if prev is not None:
                self._harvest_one(prev)
            self._t_last = time.time()
            return True
        if self._pending is not None:
            self._flush()
            self._t_last = time.time()
            return True
        return False

    def run_until_idle(self) -> None:
        """Drive the loop until queue + slots + pending harvest drain."""
        while True:
            with self._lock:
                queued = bool(self._queue)
            if not (queued or self._active.any() or self._pending is not None):
                return
            self.step()

    def start(self) -> None:
        """Serve on a background thread until :meth:`stop`."""
        if self._thread is not None:
            return
        self._stop.clear()

        def loop():
            try:
                while not self._stop.is_set():
                    busy = self.step()
                    if not busy:
                        with self._wake:
                            if not self._queue and not self._stop.is_set():
                                self._wake.wait(timeout=0.05)
            except BaseException as e:  # noqa: BLE001
                # A dead serving thread must not strand waiters: fail every
                # queued and in-flight request with the error, then release
                # the ring (close() resolves them with this stored error).
                logger.exception("serving loop failed; failing outstanding work")
                self._loop_error = e
                self._stop.set()
                self._fail_outstanding(RuntimeError(f"serving loop failed: {e!r}"))

        self._thread = threading.Thread(target=loop, daemon=True, name="tts-serving")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        with self._wake:
            self._wake.notify_all()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    def close(self) -> None:
        """Stop serving and fail outstanding work cleanly.

        Queued and in-flight requests resolve with a ``RuntimeError``
        (their waiters unblock) and the KV ring is released.
        """
        self.stop()
        self._fail_outstanding(RuntimeError("serving engine closed"))
        self._cache_k = self._cache_v = self._key_valid = None
        self._codes_buf = None
        if self.draft is not None:
            self._d_cache_k = self._d_cache_v = self._d_key_valid = None
            self._spec_cols = None

    def _fail_outstanding(self, error: BaseException) -> None:
        """Resolve every queued and in-flight request with ``error``."""
        with self._lock:
            abandoned = list(self._queue)
            self._queue.clear()
        for slot in self._slots:
            if slot.req is not None:
                abandoned.append(slot.req)
                slot.req = None
                slot.pieces = []
        self._active[:] = False
        for req in abandoned:
            if not req.done():
                req.error = error
                if req._chunk_q is not None:
                    req._chunk_q.put(None)
                req._resolve()
        self._pending = None

    # -- stats ---------------------------------------------------------------

    def stats(self) -> Dict[str, float]:
        wall = (
            (self._t_last - self._t_first)
            if self._t_first is not None and self._t_last is not None
            else 0.0
        )
        audio_sec = self.frames_delivered / self.cfg.codec.frame_rate
        return {
            "requests_done": self.requests_done,
            "frames_decoded": self.frames_decoded,
            "frames_delivered": self.frames_delivered,
            "serve_wall_s": wall,
            "aggregate_rtf": (audio_sec / wall) if wall > 0 else 0.0,
        }
