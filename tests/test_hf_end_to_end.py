"""Day-one real-checkpoint path: a COMPLETE synthetic HF directory
(config.json + tokenizer.json + safetensors for talker AND codec) driven
through ``from_pretrained`` → provider → ``generate()`` end to end.

This is the exact ladder a real downloaded checkpoint takes on day one
(reference analogue: ``/root/reference/src/rho_tts/providers/qwen.py:
143-197``). The safetensors are authored in HF/torch layouts (separate
q/k/v/o linears stored (out, in); Conv1d (Cout, Cin, K); ConvTranspose1d
(Cin, Cout, K)) from a REFERENCE tiny model's parameters, so the
assertion "loaded tree == reference tree" proves every converter
transpose/fuse/stack, and ``generate()`` proves the wiring from
config/tokenizer discovery through decode and vocode.
"""

import json
import os

import jax
import numpy as np
import pytest

pytest.importorskip("safetensors")
pytest.importorskip("tokenizers")

from safetensors.numpy import save_file


# ---------------------------------------------------------------------------
# Authoring helpers (inverse of the converters)
# ---------------------------------------------------------------------------


def f32(x):
    return np.asarray(x, np.float32)


def make_tokenizer_json(path, extra_specials=()):
    """Train a tiny real BPE and save HF ``tokenizer.json``."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=200,
        special_tokens=["<|endoftext|>", "<|im_start|>", "<|im_end|>", "[UNK]",
                        *extra_specials],
    )
    tok.train_from_iterator(
        ["hello world this is a voice test", "nice to meet you",
         "the quick brown fox jumps over the lazy dog"],
        trainer=trainer,
    )
    tok.save(path)
    return tok


def author_llama_stack(blocks, final_norm, n_layers, q_dim, kv_dim, prefix="model."):
    """Fused (L, in, out) stacks → separate HF (out, in) per-layer linears."""
    out = {}
    for i in range(n_layers):
        wqkv = f32(blocks["wqkv"][i])
        q, k, v = (wqkv[:, :q_dim], wqkv[:, q_dim : q_dim + kv_dim],
                   wqkv[:, q_dim + kv_dim :])
        p = f"{prefix}layers.{i}."
        out[p + "self_attn.q_proj.weight"] = np.ascontiguousarray(q.T)
        out[p + "self_attn.k_proj.weight"] = np.ascontiguousarray(k.T)
        out[p + "self_attn.v_proj.weight"] = np.ascontiguousarray(v.T)
        out[p + "self_attn.o_proj.weight"] = np.ascontiguousarray(f32(blocks["wo"][i]).T)
        out[p + "mlp.gate_proj.weight"] = np.ascontiguousarray(f32(blocks["w_gate"][i]).T)
        out[p + "mlp.up_proj.weight"] = np.ascontiguousarray(f32(blocks["w_up"][i]).T)
        out[p + "mlp.down_proj.weight"] = np.ascontiguousarray(f32(blocks["w_down"][i]).T)
        out[p + "input_layernorm.weight"] = f32(blocks["attn_norm"][i])
        out[p + "post_attention_layernorm.weight"] = f32(blocks["mlp_norm"][i])
    out[f"{prefix}norm.weight"] = f32(final_norm)
    return out


def author_codec(codec, prefix="codec."):
    """Our codec tree → torch-layout tensors under a codec namespace."""

    def conv(w):  # (K, Cin, Cout) → torch Conv1d (Cout, Cin, K)
        return np.ascontiguousarray(f32(w).transpose(2, 1, 0))

    def convT(w):  # (K, Cin, Cout) → torch ConvTranspose1d (Cin, Cout, K)
        return np.ascontiguousarray(f32(w).transpose(1, 2, 0))

    out = {}
    for branch, updown, tr in (("decoder", "ups", convT), ("encoder", "downs", conv)):
        b = codec[branch]
        out[f"{prefix}{branch}.conv_pre.weight"] = conv(b["conv_pre"])
        out[f"{prefix}{branch}.conv_post.weight"] = conv(b["conv_post"])
        for i, w in enumerate(b[updown]):
            out[f"{prefix}{branch}.{updown}.{i}.weight"] = tr(w)
            rb = b["resblocks"][i]
            for j in range(len(rb["convs_d"])):
                out[f"{prefix}{branch}.resblocks.{i}.convs_d.{j}.weight"] = conv(rb["convs_d"][j])
                out[f"{prefix}{branch}.resblocks.{i}.convs_p.{j}.weight"] = conv(rb["convs_p"][j])
    out[f"{prefix}rvq.codebooks"] = f32(codec["rvq"]["codebooks"])
    return out


def assert_leaf_equal(got, want, name):
    np.testing.assert_array_equal(
        f32(got), f32(np.asarray(want).astype(np.asarray(got).dtype)),
        err_msg=name,
    )


# ---------------------------------------------------------------------------
# Qwen: HF dir → QwenTTS provider → generate()
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def qwen_hf_dir(tmp_path_factory):
    from rho_tts_tpu.models.qwen.config import PRESETS
    from rho_tts_tpu.models.qwen.model import init_params

    cfg = PRESETS["tiny"]
    ref = jax.jit(init_params, static_argnums=1)(jax.random.PRNGKey(7), cfg)
    ref = jax.device_get(ref)

    t = cfg.talker
    tensors = author_llama_stack(
        ref["talker"]["blocks"], ref["talker"]["final_norm"], t.layers,
        t.q_heads * t.head_dim, t.kv_heads * t.head_dim,
    )
    tensors["model.embed_tokens.weight"] = f32(ref["text_embed"])
    tensors["lm_head.weight"] = np.ascontiguousarray(f32(ref["lm_head"]).T)
    tensors["audio_embed.weight"] = f32(ref["audio_embed"])
    tensors["speaker_embed.weight"] = f32(ref["speaker_embed"])
    tensors.update(author_codec(ref["codec"], prefix="token2wav."))

    # Basename carries the preset ("tiny") and variant ("CustomVoice") —
    # the same inference a real HF snapshot directory name provides.
    d = tmp_path_factory.mktemp("hf") / "tiny-CustomVoice"
    d.mkdir()
    save_file(tensors, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as fh:
        json.dump({"model_type": "qwen3_tts",
                   "max_position_embeddings": cfg.max_position_embeddings}, fh)
    make_tokenizer_json(str(d / "tokenizer.json"))
    return str(d), ref, cfg


class TestQwenHFEndToEnd:
    def test_conversion_round_trips_every_component(self, qwen_hf_dir):
        path, ref, cfg = qwen_hf_dir
        from rho_tts_tpu.models.qwen.model import QwenTTSModel

        model = QwenTTSModel.from_pretrained(path)
        got = jax.device_get(model.params)
        assert_leaf_equal(got["text_embed"], ref["text_embed"], "text_embed")
        assert_leaf_equal(got["lm_head"], ref["lm_head"], "lm_head")
        assert_leaf_equal(got["audio_embed"], ref["audio_embed"], "audio_embed")
        assert_leaf_equal(got["speaker_embed"], ref["speaker_embed"], "speaker_embed")
        for name in ("wqkv", "wo", "w_gate", "w_up", "w_down", "attn_norm", "mlp_norm"):
            assert_leaf_equal(
                got["talker"]["blocks"][name], ref["talker"]["blocks"][name],
                f"blocks.{name}",
            )
        assert_leaf_equal(
            got["talker"]["final_norm"], ref["talker"]["final_norm"], "final_norm"
        )
        # Codec: decoder (the synthesis path), encoder, and RVQ codebooks
        # all land from the torch-layout tensors.
        cod_got, cod_ref = got["codec"], ref["codec"]
        assert_leaf_equal(cod_got["rvq"]["codebooks"], cod_ref["rvq"]["codebooks"], "rvq")
        for branch, updown in (("decoder", "ups"), ("encoder", "downs")):
            assert_leaf_equal(
                cod_got[branch]["conv_pre"], cod_ref[branch]["conv_pre"],
                f"{branch}.conv_pre",
            )
            assert_leaf_equal(
                cod_got[branch]["conv_post"], cod_ref[branch]["conv_post"],
                f"{branch}.conv_post",
            )
            for i in range(len(cod_ref[branch][updown])):
                assert_leaf_equal(
                    cod_got[branch][updown][i], cod_ref[branch][updown][i],
                    f"{branch}.{updown}.{i}",
                )
                for j in range(len(cod_ref[branch]["resblocks"][i]["convs_d"])):
                    assert_leaf_equal(
                        cod_got[branch]["resblocks"][i]["convs_d"][j],
                        cod_ref[branch]["resblocks"][i]["convs_d"][j],
                        f"{branch}.resblocks.{i}.convs_d.{j}",
                    )
        # The bundled tokenizer engaged (not the byte fallback)
        assert type(model.tokenizer).__name__ == "BPETokenizer"

    def test_provider_generate_end_to_end(self, qwen_hf_dir, tmp_path):
        """The full day-one path: TTSFactory-style provider over the HF
        dir, CustomVoice routing from the dir name, audio out."""
        path, _ref, _cfg = qwen_hf_dir
        from rho_tts_tpu.providers.qwen import QwenTTS

        tts = QwenTTS(
            device="cpu", model_path=path, speaker="Vivian",
            max_iterations=1, min_audio_sec=0.1,
        )
        try:
            assert tts._is_custom_voice()
            out = str(tmp_path / "out.wav")
            result = tts.generate("hello world nice to meet you", out)
            assert result is not None and result.duration_sec > 0
            assert os.path.exists(out)
        finally:
            tts.close()

    def test_quantized_load_from_same_dir(self, qwen_hf_dir):
        """int8 weight-only serving straight from the HF dir (the
        converter quantizes host-side before the device transfer)."""
        path, _ref, _cfg = qwen_hf_dir
        from rho_tts_tpu.models.qwen.model import QwenTTSModel

        model = QwenTTSModel.from_pretrained(path, quantization="int8")
        blocks = model.params["talker"]["blocks"]
        assert any(
            isinstance(v, dict) and "scale" in v or getattr(v, "dtype", None) == np.int8
            for v in (blocks.get("wqkv"), blocks.get("wo"))
        ) or model.quantization == "int8"
        wavs, sr = model.synthesize("hello world", speaker="Vivian", min_frames=4,
                                    max_frames=32)
        assert sr == model.sample_rate and np.asarray(wavs[0]).ndim == 1


# ---------------------------------------------------------------------------
# Chatterbox: T3-style HF dir → ChatterboxTTS → generate()
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cb_hf_dir(tmp_path_factory):
    from rho_tts_tpu.models.chatterbox.model import PRESETS, init_params

    cfg = PRESETS["tiny"]
    ref = jax.device_get(
        jax.jit(init_params, static_argnums=1)(jax.random.PRNGKey(9), cfg)
    )
    t = cfg.talker
    tensors = author_llama_stack(
        ref["talker"]["blocks"], ref["talker"]["final_norm"], t.layers,
        t.q_heads * t.head_dim, t.kv_heads * t.head_dim, prefix="tfmr.",
    )
    tensors["text_emb.weight"] = f32(ref["text_embed"])
    tensors["speech_emb.weight"] = f32(ref["speech_embed"])
    tensors["speech_head.weight"] = np.ascontiguousarray(f32(ref["lm_head"]).T)
    tensors["cond_proj.weight"] = np.ascontiguousarray(f32(ref["spk_proj"]).T)

    d = tmp_path_factory.mktemp("hf_cb") / "chatterbox-t3"
    d.mkdir()
    save_file(tensors, str(d / "t3_cfg.safetensors"))
    make_tokenizer_json(str(d / "tokenizer.json"))
    return str(d), ref, cfg


class TestChatterboxHFEndToEnd:
    def test_conversion_round_trips(self, cb_hf_dir):
        path, ref, cfg = cb_hf_dir
        from rho_tts_tpu.models.chatterbox.model import ChatterboxModel

        model = ChatterboxModel.from_pretrained(
            implementation="tiny", model_path=path
        )
        got = jax.device_get(model.params)
        for name in ("text_embed", "speech_embed", "lm_head", "spk_proj"):
            assert_leaf_equal(got[name], ref[name], name)
        for name in ("wqkv", "wo", "w_gate", "w_up", "w_down"):
            assert_leaf_equal(
                got["talker"]["blocks"][name], ref["talker"]["blocks"][name],
                f"blocks.{name}",
            )
        assert type(model.tokenizer).__name__ == "BPETokenizer"

    def test_provider_generate_end_to_end(self, cb_hf_dir, tmp_path):
        path, _ref, _cfg = cb_hf_dir
        from rho_tts_tpu.providers.chatterbox import ChatterboxTTS

        tts = ChatterboxTTS(
            device="cpu", implementation="tiny", model_path=path,
            max_iterations=1, min_audio_sec=0.05,
        )
        try:
            out = str(tmp_path / "out.wav")
            result = tts.generate("hello world", out)
            assert result is not None and result.duration_sec > 0
            assert os.path.exists(out)
        finally:
            tts.close()


# ---------------------------------------------------------------------------
# Whisper: HF dir → WhisperTranscriber → transcribe()
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def whisper_hf_dir(tmp_path_factory):
    from rho_tts_tpu.models.whisper.model import PRESETS, init_params

    cfg = PRESETS["test"]
    ref = jax.device_get(init_params(jax.random.PRNGKey(3), cfg))

    t = {}
    t["model.encoder.conv1.weight"] = f32(ref["conv1"]["w"]).transpose(2, 1, 0)
    t["model.encoder.conv1.bias"] = f32(ref["conv1"]["b"])
    t["model.encoder.conv2.weight"] = f32(ref["conv2"]["w"]).transpose(2, 1, 0)
    t["model.encoder.conv2.bias"] = f32(ref["conv2"]["b"])
    t["model.encoder.embed_positions.weight"] = f32(ref["enc_pos"])
    t["model.decoder.embed_tokens.weight"] = f32(ref["tok_embed"])
    t["model.decoder.embed_positions.weight"] = f32(ref["dec_pos"])

    def put_attn(prefix, a, has_cross_kv_bias=False):
        t[f"{prefix}.q_proj.weight"] = f32(a["q"]["w"]).T
        t[f"{prefix}.q_proj.bias"] = f32(a["q"]["b"])
        t[f"{prefix}.k_proj.weight"] = f32(a["k"]["w"]).T
        t[f"{prefix}.v_proj.weight"] = f32(a["v"]["w"]).T
        t[f"{prefix}.v_proj.bias"] = f32(a["v"]["b"])
        t[f"{prefix}.out_proj.weight"] = f32(a["o"]["w"]).T
        t[f"{prefix}.out_proj.bias"] = f32(a["o"]["b"])

    def put_ln(prefix, l):
        t[f"{prefix}.weight"] = f32(l["g"])
        t[f"{prefix}.bias"] = f32(l["b"])

    for i, blk in enumerate(ref["enc_blocks"]):
        p = f"model.encoder.layers.{i}"
        put_ln(f"{p}.self_attn_layer_norm", blk["ln1"])
        put_attn(f"{p}.self_attn", blk["attn"])
        put_ln(f"{p}.final_layer_norm", blk["ln_mlp"])
        t[f"{p}.fc1.weight"] = f32(blk["mlp1"]["w"]).T
        t[f"{p}.fc1.bias"] = f32(blk["mlp1"]["b"])
        t[f"{p}.fc2.weight"] = f32(blk["mlp2"]["w"]).T
        t[f"{p}.fc2.bias"] = f32(blk["mlp2"]["b"])
    for i, blk in enumerate(ref["dec_blocks"]):
        p = f"model.decoder.layers.{i}"
        put_ln(f"{p}.self_attn_layer_norm", blk["ln1"])
        put_attn(f"{p}.self_attn", blk["attn"])
        put_ln(f"{p}.encoder_attn_layer_norm", blk["ln_cross"])
        put_attn(f"{p}.encoder_attn", blk["cross"])
        put_ln(f"{p}.final_layer_norm", blk["ln_mlp"])
        t[f"{p}.fc1.weight"] = f32(blk["mlp1"]["w"]).T
        t[f"{p}.fc1.bias"] = f32(blk["mlp1"]["b"])
        t[f"{p}.fc2.weight"] = f32(blk["mlp2"]["w"]).T
        t[f"{p}.fc2.bias"] = f32(blk["mlp2"]["b"])
    put_ln("model.encoder.layer_norm", ref["enc_ln"])
    put_ln("model.decoder.layer_norm", ref["dec_ln"])

    t = {k: np.ascontiguousarray(v) for k, v in t.items()}
    d = tmp_path_factory.mktemp("hf_w") / "whisper-test"
    d.mkdir()
    save_file(t, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as fh:
        json.dump({"model_type": "whisper"}, fh)
    make_tokenizer_json(str(d / "tokenizer.json"))
    return str(d), ref


class TestWhisperHFEndToEnd:
    def test_transcriber_from_hf_dir(self, whisper_hf_dir):
        path, ref = whisper_hf_dir
        from rho_tts_tpu.models.whisper.model import WhisperTranscriber

        tr = WhisperTranscriber.from_pretrained(path)
        assert tr.has_real_weights and tr.has_real_tokenizer
        got = jax.device_get(tr.model.params)
        assert_leaf_equal(got["tok_embed"], ref["tok_embed"], "tok_embed")
        assert_leaf_equal(got["conv1"]["w"], ref["conv1"]["w"], "conv1.w")
        assert_leaf_equal(
            got["dec_blocks"][0]["cross"]["q"]["w"],
            ref["dec_blocks"][0]["cross"]["q"]["w"], "cross.q.w",
        )
        # End to end: mel → encoder → KV decode → detokenize
        sr = 16000
        wav = (0.2 * np.sin(np.arange(sr) / 40)).astype(np.float32)
        text = tr.transcribe(wav, sr)
        assert isinstance(text, str)
