"""Configuration for the Qwen-class codec-LM TTS model."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax.numpy as jnp

from ..transformer import TransformerConfig


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Neural audio codec (encoder + RVQ + vocoder decoder)."""

    sample_rate: int = 24000
    # Upsample rates multiply to hop (1920 → 12.5 Hz frames at 24 kHz)
    upsample_rates: Tuple[int, ...] = (8, 6, 5, 4, 2)
    n_codebooks: int = 4
    codebook_size: int = 2048
    codebook_dim: int = 512
    decoder_channels: Tuple[int, ...] = (512, 256, 128, 64, 32, 16)
    encoder_channels: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    resblock_dilations: Tuple[int, ...] = (1, 3, 9)

    @property
    def hop(self) -> int:
        h = 1
        for r in self.upsample_rates:
            h *= r
        return h

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.hop


@dataclasses.dataclass(frozen=True)
class QwenTTSConfig:
    """Full model config: AR talker + codec + heads."""

    name: str = "1.7B"
    talker: TransformerConfig = dataclasses.field(default_factory=TransformerConfig)
    codec: CodecConfig = dataclasses.field(default_factory=CodecConfig)
    text_vocab: int = 152064
    n_speakers: int = 16  # CustomVoice named-speaker table
    max_position_embeddings: int = 8192
    # Sampling defaults
    temperature: float = 0.9
    top_k: int = 50
    # Audio token specials (appended after codebook entries in codebook 0)
    audio_bos_offset: int = 0  # codebook_size + 0
    audio_eos_offset: int = 1  # codebook_size + 1
    audio_pad_offset: int = 2  # codebook_size + 2

    @property
    def audio_vocab(self) -> int:
        return self.codec.codebook_size + 3

    @property
    def audio_bos(self) -> int:
        return self.codec.codebook_size + self.audio_bos_offset

    @property
    def audio_eos(self) -> int:
        return self.codec.codebook_size + self.audio_eos_offset

    @property
    def audio_pad(self) -> int:
        return self.codec.codebook_size + self.audio_pad_offset


def _talker(hidden, layers, q_heads, kv_heads, ffn, head_dim=128):
    return TransformerConfig(
        hidden=hidden,
        layers=layers,
        q_heads=q_heads,
        kv_heads=kv_heads,
        head_dim=head_dim,
        ffn=ffn,
        dtype=jnp.bfloat16,
    )


PRESETS = {
    "1.7B": QwenTTSConfig(
        name="1.7B",
        talker=_talker(2048, 28, 16, 8, 6144),
        text_vocab=152064,
    ),
    "0.6B": QwenTTSConfig(
        name="0.6B",
        talker=_talker(1024, 28, 16, 8, 3072, head_dim=128),
        text_vocab=152064,
    ),
    # Mid-size pair for the speculative-decoding demo: "small" is big
    # enough that a decode step has real compute/HBM cost, "draft" is
    # ~30× cheaper — distilled (models.qwen.distill) it yields a measured
    # end-to-end speculation speedup with realized acceptance
    # (BASELINE.md 5s).
    "small": QwenTTSConfig(
        name="small",
        talker=_talker(512, 8, 8, 4, 1536, head_dim=64),
        codec=CodecConfig(
            upsample_rates=(4, 2),
            n_codebooks=2,
            codebook_size=64,
            codebook_dim=32,
            decoder_channels=(32, 16, 8),
            encoder_channels=(8, 16, 32),
        ),
        text_vocab=512,
        max_position_embeddings=1024,
    ),
    "draft": QwenTTSConfig(
        name="draft",
        talker=_talker(128, 2, 4, 2, 384, head_dim=32),
        codec=CodecConfig(
            upsample_rates=(4, 2),
            n_codebooks=2,
            codebook_size=64,
            codebook_dim=32,
            decoder_channels=(32, 16, 8),
            encoder_channels=(8, 16, 32),
        ),
        text_vocab=512,
        max_position_embeddings=1024,
    ),
    # Flagship-ratio speculation draft: same vocabularies and codec as the
    # 1.7B target (a serving draft must share them) with a ~45× smaller
    # talker. BASELINE 5s-mech showed a 0.6B draft (only ~3× cheaper per
    # step) can't break even on the 1.7B; at this ratio a draft step is
    # dispatch-bound, so the round cost is ~one target forward.
    # Exact-name match only (not in _INFERRED_PRESETS: "1.7B" appears in
    # real checkpoint names and must keep resolving to the flagship).
    "draft-1.7B": QwenTTSConfig(
        name="draft-1.7B",
        talker=_talker(512, 8, 8, 4, 2048, head_dim=64),
        text_vocab=152064,
    ),
    # Small configs for tests / CPU dry-runs
    "tiny": QwenTTSConfig(
        name="tiny",
        talker=_talker(64, 2, 4, 2, 128, head_dim=16),
        codec=CodecConfig(
            upsample_rates=(4, 2),
            n_codebooks=2,
            codebook_size=64,
            codebook_dim=32,
            decoder_channels=(32, 16, 8),
            encoder_channels=(8, 16, 32),
        ),
        text_vocab=512,
        max_position_embeddings=512,
    ),
}


# Preset keys eligible for substring inference from checkpoint names.
# "small"/"draft" (the speculative-demo pair) are deliberately excluded:
# they are common words in real checkpoint paths (".../qwen-0.6b-draft")
# and would silently hijack the size inference — they resolve only on an
# exact name match.
_INFERRED_PRESETS = ("0.6B", "1.7B", "tiny")


def resolve_config(model_path: str) -> QwenTTSConfig:
    """Map a model path / HF id to a config.

    A local directory with a ``config.json`` may override the preset size;
    otherwise the preset is inferred from the name ("0.6B", "1.7B", "tiny")
    or matched exactly ("small", "draft").
    """
    base = "1.7B"
    # Match against the basename only (a parent directory like
    # '/home/martiny/' must not trigger the 'tiny' preset), preferring the
    # longest matching preset name.
    name = os.path.basename(os.path.normpath(str(model_path))).lower()
    exact = [k for k in PRESETS if k.lower() == name]
    matches = exact or [k for k in _INFERRED_PRESETS if k.lower() in name]
    if matches:
        base = max(matches, key=len)
    cfg = PRESETS[base]

    if os.path.isdir(model_path):
        cfg_file = os.path.join(model_path, "config.json")
        if os.path.exists(cfg_file):
            try:
                with open(cfg_file) as f:
                    raw = json.load(f)
                mpe = raw.get("max_position_embeddings")
                if mpe:
                    cfg = dataclasses.replace(cfg, max_position_embeddings=int(mpe))
            except Exception:
                pass
    return cfg
