"""Qwen3-TTS-class provider: the default production backend.

Wraps :class:`rho_tts_tpu.models.qwen.QwenTTSModel` (JAX codec-LM with
lax.scan AR decode) behind the BaseTTS engine. Supports voice cloning with
Base-model paths (reference audio + transcript) and named speakers with
CustomVoice-model paths, batch generation, and the 3-pass loudness
post-processing chain on device.

Capability parity: reference ``src/rho_tts/providers/qwen.py:22-413``
(constructor surface :48-94, routing :218-266, post-processing :268-378,
config-driven max-chars refinement :131-139).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Union

import numpy as np

from ..engine import BaseTTS
from ..ops import dsp
from ..provider_info import ProviderInfo, VoiceInfo

logger = logging.getLogger(__name__)

DEFAULT_MODEL = "Qwen/Qwen3-TTS-12Hz-1.7B-Base"


class QwenTTS(BaseTTS):
    """Qwen3-TTS-class implementation with batch processing and validation.

    Args:
        device: Device to run on ("tpu" or "cpu").
        seed: Random seed for consistent voice generation.
        deterministic: Request deterministic XLA reductions.
        reference_audio: Reference audio path for voice cloning (optional).
        reference_text: Transcript of the reference audio (required when
            reference_audio is set).
        speaker: Named speaker for CustomVoice model paths.
        language: Synthesis language (default "English").
        model_path: Local checkpoint dir or model id (size inferred from
            the name: 0.6B / 1.7B / tiny).
        max_chars_per_segment: Max characters per text segment
            (default: auto-computed from free HBM).
        batch_size: Texts per batched model call (default 5).
        max_iterations: Validation retry iterations (default 10).
        accent_drift_threshold: Accent-drift gate (default 0.17).
        text_similarity_threshold: STT match gate (default 0.85).
        sound_decay_threshold: Min last/first RMS ratio (default 0.3).
        drift_model_path: Explicit drift-classifier path (overrides
            per-voice lookup).
        phonetic_mapping: Word-to-pronunciation overrides.
        quantization: "int8" for weight-only int8 talker serving.
        min_audio_sec: Minimum generated duration (EOS masked below it).
        parallelism: None (single chip), "data" (replicated weights,
            batch rows over the mesh) or "tensor" (talker weights sharded
            over the mesh ``model`` axis for >1-chip checkpoints).
        n_devices: Mesh size for parallel serving (default: all devices).
        draft_model_path: Optional smaller checkpoint (e.g. 0.6B) used as
            a speculative-decoding draft for single-segment generations —
            the draft proposes ``speculative_gamma`` codec tokens per
            round and the target verifies them in one forward pass.
        speculative_gamma: Draft tokens proposed per verification round.
        serving: Route pipeline segment generation through a
            continuous-batching ServingEngine — retried segments rejoin
            the running slot batch immediately instead of waiting for the
            lockstep iteration barrier.
        serving_slots: Slot-batch size of that engine (default 8).
        serving_max_prompt: Engine prompt-token cap (default 512).
        serving_max_frames: Engine per-request frame cap (default 1024).
    """

    MAX_MODEL_CHARS = 4000
    BYTES_PER_CHAR_ESTIMATE = 500_000
    # One batched device call synthesizes all segments of an item (the
    # model folds them into one prefill + one scan decode).
    supports_batch_generation = True
    # _post_process_audio is exactly the standard loudness chain, so the
    # single-segment path may run the fully fused finalize program.
    post_process_is_loudness = True

    def __init__(
        self,
        device: str = "tpu",
        seed: int = 789,
        deterministic: bool = False,
        reference_audio: Optional[str] = None,
        reference_text: Optional[str] = None,
        speaker: Optional[str] = None,
        language: str = "English",
        model_path: str = DEFAULT_MODEL,
        max_chars_per_segment: Optional[int] = None,
        batch_size: int = 5,
        max_iterations: int = 10,
        accent_drift_threshold: float = 0.17,
        text_similarity_threshold: float = 0.85,
        sound_decay_threshold: float = 0.3,
        drift_model_path: Optional[str] = None,
        phonetic_mapping: Optional[Dict[str, str]] = None,
        quantization: Optional[str] = None,
        min_audio_sec: float = 0.0,
        parallelism: Optional[str] = None,
        n_devices: Optional[int] = None,
        draft_model_path: Optional[str] = None,
        speculative_gamma: int = 4,
        speculative_residual_mode: str = "draft",
        lora_path: Optional[str] = None,
        serving: bool = False,
        serving_slots: int = 8,
        serving_max_prompt: int = 512,
        serving_max_frames: int = 1024,
    ):
        super().__init__(device, seed, deterministic, phonetic_mapping=phonetic_mapping)

        if reference_audio is not None and reference_text is None:
            raise ValueError(
                "reference_text (transcript of reference audio) is required "
                "when reference_audio is set"
            )

        self.reference_audio_path = reference_audio
        self.reference_text = reference_text
        self.speaker = speaker
        self.language = language
        self.voice_cloning = reference_audio is not None
        self.model_path = model_path
        self.drift_model_path = drift_model_path
        self.quantization = quantization
        self.min_audio_sec = min_audio_sec
        if parallelism not in (None, "data", "tensor"):
            raise ValueError(f"Unknown parallelism mode: {parallelism!r}")
        self.parallelism = parallelism
        self.n_devices = n_devices
        self.draft_model_path = draft_model_path
        self.speculative_gamma = speculative_gamma
        if speculative_residual_mode not in ("draft", "strict"):
            raise ValueError(
                f"Unknown speculative_residual_mode: {speculative_residual_mode!r}"
            )
        #: "draft" (serving default — accepted slots carry the draft's
        #: residual codebooks, no truncation) or "strict" (target residuals
        #: everywhere, acceptance truncates on predictor disagreement); see
        #: models.qwen.speculative._spec_decode.
        self.speculative_residual_mode = speculative_residual_mode
        #: per-voice LoRA adapter dir (models.qwen.lora) merged at load,
        #: before quantization
        self.lora_path = lora_path
        self._draft_model = None

        #: Continuous-batching pipeline mode: segments are submitted to a
        #: ServingEngine slot batch and validated as they retire, so a
        #: validation failure rejoins the running batch instead of waiting
        #: for the lockstep iteration barrier (engine
        #: ``_generate_segments_served``). Retry sampling draws from the
        #: engine's on-device RNG stream — not bit-reproducible run-to-run
        #: (neither are the lockstep path's wall-clock reseeded retries).
        self.supports_serving_generation = bool(serving)
        self.serving_slots = serving_slots
        self.serving_max_prompt = serving_max_prompt
        self.serving_max_frames = serving_max_frames
        self._serving = None

        self._max_chars_explicit = max_chars_per_segment is not None
        self.max_chars_per_segment = (
            max_chars_per_segment if max_chars_per_segment is not None else 1000
        )
        self.batch_size = batch_size
        self.force_sentence_split = False
        self.max_iterations = max_iterations
        self.accent_drift_threshold = accent_drift_threshold
        self.text_similarity_threshold = text_similarity_threshold
        self.sound_decay_threshold = sound_decay_threshold

        # Model is lazy-loaded on first generation
        self._model = None
        self._reference_embedding_initialized = False

    # -- Model management ---------------------------------------------------

    def _load_model(self):
        if self._model is None:
            from ..models.qwen import QwenTTSModel

            logger.info("Loading Qwen-TTS model '%s'...", self.model_path)
            self._model = QwenTTSModel.from_pretrained(
                self.model_path, seed=self.seed, quantization=self.quantization,
                lora_path=self.lora_path,
            )
            self._enable_mesh(self._model)
            # Refine max model chars from the checkpoint's context length
            mpe = self._model.config.max_position_embeddings
            if mpe:
                self._max_model_chars = min(self.MAX_MODEL_CHARS, mpe)
            if self.voice_cloning:
                self._initialize_reference_embedding()
        return self._model

    def _load_draft(self):
        """Lazy-load the speculative-decoding draft model."""
        if self._draft_model is None:
            from ..models.qwen import QwenTTSModel

            logger.info("Loading speculative draft '%s'...", self.draft_model_path)
            self._draft_model = QwenTTSModel.from_pretrained(
                self.draft_model_path, seed=self.seed, quantization=self.quantization
            )
        return self._draft_model

    def _enable_mesh(self, model):
        """Switch the loaded model to multi-chip serving if requested.

        ``parallelism="data"`` replicates weights and spreads batch rows
        over the chips; ``"tensor"`` shards the talker weights over the
        mesh ``model`` axis (for checkpoints that exceed one chip's HBM),
        with any leftover devices forming a ``data`` axis.
        """
        if not self.parallelism:
            return
        from ..parallel import enable_parallelism

        enable_parallelism(model, self.parallelism, self.n_devices)

    def _initialize_reference_embedding(self):
        """Compute the reference speaker embedding for similarity checks."""
        if self._reference_embedding_initialized:
            return
        try:
            from ..audio_io import load_wav

            wav, sr = load_wav(self.reference_audio_path)
            self.reference_embedding = np.asarray(
                self.speaker_encoder.embed_utterance(wav, sr)
            )
            self._reference_embedding_initialized = True
            logger.info("Reference voice embedding computed")
        except Exception as exc:  # noqa: BLE001 — similarity is best-effort
            logger.warning("Speaker embedding unavailable: %s", exc)

    def _is_custom_voice(self) -> bool:
        """CustomVoice vs Base routing.

        Parity: the reference infers it from "CustomVoice" in the model
        path (`src/rho_tts/providers/qwen.py:218-266`). Native serving
        checkpoints carry the variant in their manifest instead — the
        exported directory name no longer encodes it.
        """
        if "CustomVoice" in self.model_path:
            return True
        try:
            from ..models import checkpoint as ckpt_lib

            if ckpt_lib.is_native_checkpoint(self.model_path):
                return ckpt_lib.load_manifest(self.model_path).get(
                    "variant"
                ) == "custom-voice"
        except Exception:  # noqa: BLE001
            return False
        return False

    # -- Generation ----------------------------------------------------------

    def _generate_audio(self, text: Union[str, List[str]], **kwargs):
        """Route to voice-clone or named-speaker generation.

        Model-path routing parity with the reference: CustomVoice paths
        require a named speaker; Base paths require reference audio.
        """
        model = self._load_model()

        is_single = isinstance(text, str)
        text_list = [text] if is_single else list(text)

        is_custom_voice = self._is_custom_voice()

        if is_custom_voice and not self.speaker:
            raise ValueError(
                "CustomVoice model requires a named speaker. Select a built-in "
                "voice (e.g. Vivian, Ryan) or provide reference audio with a "
                "Base model for voice cloning."
            )
        if not is_custom_voice and not self.voice_cloning:
            raise ValueError(
                "Qwen Base model requires reference audio for voice cloning. "
                "Use a CustomVoice model with a named speaker, or provide "
                "reference audio."
            )

        min_frames = int(self.min_audio_sec * model.config.codec.frame_rate)
        if len(text_list) == 1 and self.draft_model_path and not self.parallelism:
            # Single-segment latency path: draft-verify speculative decode
            wav, _sr = model.synthesize_speculative(
                text_list[0],
                self._load_draft(),
                speaker=self.speaker if is_custom_voice else None,
                language=self.language,
                ref_audio=self.reference_audio_path if not is_custom_voice else None,
                ref_text=self.reference_text if not is_custom_voice else None,
                min_frames=min_frames,
                gamma=self.speculative_gamma,
                rng=self.next_rng(),
                residual_mode=self.speculative_residual_mode,
            )
            return wav if is_single else [wav]
        waves, _sr = model.synthesize(
            text_list,
            speaker=self.speaker if is_custom_voice else None,
            language=self.language,
            ref_audio=self.reference_audio_path if not is_custom_voice else None,
            ref_text=self.reference_text if not is_custom_voice else None,
            min_frames=min_frames,
            rng=self.next_rng(),
        )
        return waves[0] if is_single else waves

    def _serving_engine(self):
        """Lazily build + start the continuous-batching serving engine."""
        if self._serving is None:
            from ..serving import ServingEngine

            model = self._load_model()
            self._serving = ServingEngine(
                model,
                n_slots=self.serving_slots,
                max_prompt=self.serving_max_prompt,
                max_frames=self.serving_max_frames,
                seed=self.seed,
            )
            self._serving.start()
        return self._serving

    def _serving_submit(self, text: str):
        """Submit one pipeline segment to the serving engine.

        Routing parity with :meth:`_generate_audio`: CustomVoice paths
        require a named speaker, Base paths reference audio.
        """
        model = self._load_model()
        is_custom_voice = self._is_custom_voice()
        if is_custom_voice and not self.speaker:
            raise ValueError(
                "CustomVoice model requires a named speaker. Select a built-in "
                "voice (e.g. Vivian, Ryan) or provide reference audio with a "
                "Base model for voice cloning."
            )
        if not is_custom_voice and not self.voice_cloning:
            raise ValueError(
                "Qwen Base model requires reference audio for voice cloning. "
                "Use a CustomVoice model with a named speaker, or provide "
                "reference audio."
            )
        min_frames = int(self.min_audio_sec * model.config.codec.frame_rate)
        return self._serving_engine().submit(
            text,
            speaker=self.speaker if is_custom_voice else None,
            language=self.language,
            ref_audio=self.reference_audio_path if not is_custom_voice else None,
            ref_text=self.reference_text if not is_custom_voice else None,
            min_frames=min_frames,
        )

    def _post_process_audio(self, audio):
        """Decay-corrected loudness normalization + soft clip (on device).

        Parity: reference ``qwen.py:268-378``; implemented as the fused
        :func:`rho_tts_tpu.ops.dsp.loudness_postprocess` XLA program.
        """
        return dsp.loudness_postprocess(audio, self.sample_rate)

    def _stream_audio_chunks(self, text: str, cancellation_token=None):
        """Chunked streaming via the codec-LM's sliding-window vocoder.

        Single-stream only: the DP/TP serving paths and speculative decode
        keep per-segment streaming (engine falls back when None).
        """
        if self.parallelism or self.draft_model_path:
            return None
        model = self._load_model()
        is_custom_voice = self._is_custom_voice()
        if is_custom_voice and not self.speaker:
            raise ValueError(
                "CustomVoice model requires a named speaker for streaming."
            )
        if not is_custom_voice and not self.voice_cloning:
            raise ValueError(
                "Qwen Base model requires reference audio for voice cloning."
            )
        min_frames = int(self.min_audio_sec * model.config.codec.frame_rate)
        cancel_check = (
            cancellation_token.raise_if_cancelled if cancellation_token else None
        )
        gen = model.stream_chunks(
            text,
            speaker=self.speaker if is_custom_voice else None,
            language=self.language,
            ref_audio=self.reference_audio_path if not is_custom_voice else None,
            ref_text=self.reference_text if not is_custom_voice else None,
            min_frames=min_frames,
            rng=self.next_rng(),
            cancel_check=cancel_check,
        )
        return (wav for wav, _sr in gen)

    def _make_chunk_postprocessor(self):
        """Causal analogue of the global loudness pass for chunk mode."""
        return dsp.StreamingLoudness().process

    def export_checkpoint(self, path: str) -> None:
        """Export the loaded model as a native serving checkpoint.

        Pre-quantized when the provider runs quantized — subsequent
        ``QwenTTS(model_path=path)`` cold starts load the exact serving
        bytes (see ``models.checkpoint``). Offline conversion without a
        device: ``python -m rho_tts_tpu.models.qwen.export``.
        """
        self._load_model().save_checkpoint(path)

    def close(self) -> None:
        """Release model parameters (device HBM)."""
        super().close()
        if self._serving is not None:
            try:
                self._serving.close()
            except Exception:  # noqa: BLE001
                logger.exception("serving engine close failed")
            self._serving = None
        self._model = None
        self._draft_model = None
        self._free_device_memory()

    @classmethod
    def provider_info(cls) -> ProviderInfo:
        return ProviderInfo(
            name="qwen",
            supports_voice_cloning=True,
            supported_languages=["English", "Chinese", "Japanese", "Korean"],
            builtin_voices=[
                VoiceInfo(id=n, name=n, language="English")
                for n in (
                    "Chelsie",
                    "Aidan",
                    "Vivian",
                    "Ryan",
                    "Aria",
                    "Ethan",
                    "Luna",
                    "Harper",
                    "James",
                )
            ],
        )

    @property
    def sample_rate(self) -> int:
        if self._model is not None:
            return self._model.sample_rate
        from ..models.qwen.config import resolve_config

        return resolve_config(self.model_path).codec.sample_rate
