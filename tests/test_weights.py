"""Checkpoint-conversion tests against synthetic checkpoints.

Builds tiny HF-layout safetensors / torch state dicts in-test (no real
checkpoints exist on this host — no egress) and asserts: full expected
match counts, correct tensor placement (values, fused-QKV layout), scoped
matching (same-suffix decoy tensors from other components can't
cross-map), and — for the speaker encoder — numerical parity against a
torch LSTM oracle.
"""

import numpy as np
import pytest

from rho_tts_tpu.models.chatterbox.model import PRESETS as CB_PRESETS
from rho_tts_tpu.models.chatterbox.weights import load_checkpoint as load_cb
from rho_tts_tpu.models.qwen.config import PRESETS as QWEN_PRESETS
from rho_tts_tpu.models.qwen.weights import load_checkpoint as load_qwen
from rho_tts_tpu.models.speaker import encoder as spk


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32) * 0.05


# ---------------------------------------------------------------------------
# Qwen converter
# ---------------------------------------------------------------------------


def _qwen_hf_tensors(cfg, rng, prefix="talker.model."):
    """Synthetic HF-layout tensors for the tiny talker."""
    t = cfg.talker
    q_sz, kv_sz = t.q_heads * t.head_dim, t.kv_heads * t.head_dim
    tensors = {f"{prefix}embed_tokens.weight": _rand(rng, cfg.text_vocab, t.hidden)}
    for i in range(t.layers):
        lp = f"{prefix}layers.{i}."
        tensors[f"{lp}self_attn.q_proj.weight"] = _rand(rng, q_sz, t.hidden)
        tensors[f"{lp}self_attn.k_proj.weight"] = _rand(rng, kv_sz, t.hidden)
        tensors[f"{lp}self_attn.v_proj.weight"] = _rand(rng, kv_sz, t.hidden)
        tensors[f"{lp}self_attn.o_proj.weight"] = _rand(rng, t.hidden, q_sz)
        tensors[f"{lp}mlp.gate_proj.weight"] = _rand(rng, t.ffn, t.hidden)
        tensors[f"{lp}mlp.up_proj.weight"] = _rand(rng, t.ffn, t.hidden)
        tensors[f"{lp}mlp.down_proj.weight"] = _rand(rng, t.hidden, t.ffn)
        tensors[f"{lp}input_layernorm.weight"] = _rand(rng, t.hidden) + 1.0
        tensors[f"{lp}post_attention_layernorm.weight"] = _rand(rng, t.hidden) + 1.0
    tensors[f"{prefix}norm.weight"] = _rand(rng, t.hidden) + 1.0
    tensors["talker.lm_head.weight"] = _rand(rng, cfg.audio_vocab, t.hidden)
    return tensors


@pytest.fixture(scope="module")
def qwen_ckpt(tmp_path_factory):
    from safetensors.numpy import save_file

    cfg = QWEN_PRESETS["tiny"]
    rng = np.random.default_rng(0)
    tensors = _qwen_hf_tensors(cfg, rng)
    # Adversarial decoys: a codec submodule reusing the exact same layer/
    # suffix names AND shapes, with poisoned values. Scoped matching must
    # ignore every one of them.
    decoys = {
        k.replace("talker.", "token2wav.codec."): np.full_like(v, 7.0)
        for k, v in tensors.items()
    }
    # "tiny" in the dir name drives resolve_config's preset inference
    path = tmp_path_factory.mktemp("tiny_qwen_ckpt")
    save_file({**tensors, **decoys}, str(path / "model.safetensors"))
    return str(path), cfg, tensors


def test_qwen_full_match_count(qwen_ckpt):
    path, cfg, tensors = qwen_ckpt
    params = load_qwen(path, cfg)
    assert params is not None
    # Expected groups: text_embed + final_norm + lm_head + per layer
    # (wqkv, wo, gate, up, down, 2 norms) = 3 + layers*7
    t = cfg.talker
    blocks = params["talker"]["blocks"]
    for i in range(t.layers):
        lp = f"talker.model.layers.{i}."
        fused = np.concatenate(
            [
                tensors[f"{lp}self_attn.q_proj.weight"].T,
                tensors[f"{lp}self_attn.k_proj.weight"].T,
                tensors[f"{lp}self_attn.v_proj.weight"].T,
            ],
            axis=1,
        )
        np.testing.assert_allclose(
            np.asarray(blocks["wqkv"][i], np.float32), fused, atol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(blocks["wo"][i], np.float32),
            tensors[f"{lp}self_attn.o_proj.weight"].T,
            atol=1e-2,
        )
    np.testing.assert_allclose(
        np.asarray(params["text_embed"], np.float32),
        tensors["talker.model.embed_tokens.weight"],
        atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(params["lm_head"], np.float32),
        tensors["talker.lm_head.weight"].T,
        atol=1e-2,
    )


def test_qwen_decoys_never_cross_map(qwen_ckpt):
    """No converted tensor may contain the decoy fill value."""
    path, cfg, _ = qwen_ckpt
    params = load_qwen(path, cfg)
    for name in ("wqkv", "wo", "w_gate", "w_up", "w_down", "attn_norm", "mlp_norm"):
        arr = np.asarray(params["talker"]["blocks"][name], np.float32)
        assert not np.any(arr == 7.0), f"decoy leaked into {name}"
    assert not np.any(np.asarray(params["text_embed"], np.float32) == 7.0)


def test_qwen_decoy_only_checkpoint_rejected(tmp_path):
    """A checkpoint with ONLY non-talker namespaces matches nothing."""
    from safetensors.numpy import save_file

    cfg = QWEN_PRESETS["tiny"]
    rng = np.random.default_rng(1)
    decoys = {
        k.replace("talker.", "token2wav.codec."): v
        for k, v in _qwen_hf_tensors(cfg, rng).items()
    }
    save_file(decoys, str(tmp_path / "model.safetensors"))
    assert load_qwen(str(tmp_path), cfg) is None


def test_qwen_loaded_model_forward_differs_from_random(qwen_ckpt):
    """from_pretrained actually uses the converted weights."""
    import jax

    from rho_tts_tpu.models.qwen import QwenTTSModel

    path, cfg, _ = qwen_ckpt
    loaded = QwenTTSModel.from_pretrained(path)
    rnd = QwenTTSModel(cfg)
    assert loaded.config.name == "tiny"
    c1 = loaded.generate_codes(["same text"], speaker="Vivian", min_frames=8,
                               rng=jax.random.PRNGKey(0))
    c2 = rnd.generate_codes(["same text"], speaker="Vivian", min_frames=8,
                            rng=jax.random.PRNGKey(0))
    assert not (c1[0].shape == c2[0].shape and np.array_equal(c1[0], c2[0]))


# ---------------------------------------------------------------------------
# Chatterbox converter
# ---------------------------------------------------------------------------


def _cb_tensors(cfg, rng):
    t = cfg.talker
    q_sz, kv_sz = t.q_heads * t.head_dim, t.kv_heads * t.head_dim
    tensors = {
        "text_emb.weight": _rand(rng, cfg.text_vocab, t.hidden),
        "speech_emb.weight": _rand(rng, cfg.speech_vocab, t.hidden),
        "speech_head.weight": _rand(rng, cfg.speech_vocab, t.hidden),
        "cond_enc.spkr_enc.weight": _rand(rng, t.hidden, 256),
        "tfmr.norm.weight": _rand(rng, t.hidden) + 1.0,
    }
    for i in range(t.layers):
        lp = f"tfmr.layers.{i}."
        tensors[f"{lp}self_attn.q_proj.weight"] = _rand(rng, q_sz, t.hidden)
        tensors[f"{lp}self_attn.k_proj.weight"] = _rand(rng, kv_sz, t.hidden)
        tensors[f"{lp}self_attn.v_proj.weight"] = _rand(rng, kv_sz, t.hidden)
        tensors[f"{lp}self_attn.o_proj.weight"] = _rand(rng, t.hidden, q_sz)
        tensors[f"{lp}mlp.gate_proj.weight"] = _rand(rng, t.ffn, t.hidden)
        tensors[f"{lp}mlp.up_proj.weight"] = _rand(rng, t.ffn, t.hidden)
        tensors[f"{lp}mlp.down_proj.weight"] = _rand(rng, t.hidden, t.ffn)
        tensors[f"{lp}input_layernorm.weight"] = _rand(rng, t.hidden) + 1.0
        tensors[f"{lp}post_attention_layernorm.weight"] = _rand(rng, t.hidden) + 1.0
    return tensors


def test_chatterbox_safetensors_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    cfg = CB_PRESETS["tiny"]
    rng = np.random.default_rng(2)
    tensors = _cb_tensors(cfg, rng)
    # s3gen decoys must not cross-map
    decoys = {f"s3gen.{k}": np.full_like(v, 7.0) for k, v in tensors.items()}
    save_file({**tensors, **decoys}, str(tmp_path / "t3.safetensors"))

    params = load_cb(str(tmp_path), cfg)
    assert params is not None
    np.testing.assert_allclose(
        np.asarray(params["text_embed"], np.float32),
        tensors["text_emb.weight"], atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(params["lm_head"], np.float32),
        tensors["speech_head.weight"].T, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(params["spk_proj"], np.float32),
        tensors["cond_enc.spkr_enc.weight"].T, atol=1e-2,
    )
    for name in ("wqkv", "wo", "w_gate"):
        arr = np.asarray(params["talker"]["blocks"][name], np.float32)
        assert not np.any(arr == 7.0), f"decoy leaked into {name}"


def test_chatterbox_torch_pt_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    cfg = CB_PRESETS["tiny"]
    rng = np.random.default_rng(3)
    tensors = _cb_tensors(cfg, rng)
    sd = {k: torch.from_numpy(v) for k, v in tensors.items()}
    torch.save(sd, str(tmp_path / "t3_cfg.pt"))

    params = load_cb(str(tmp_path), cfg)
    assert params is not None
    np.testing.assert_allclose(
        np.asarray(params["speech_embed"], np.float32),
        tensors["speech_emb.weight"], atol=1e-2,
    )


def test_chatterbox_model_uses_checkpoint(tmp_path):
    from safetensors.numpy import save_file

    from rho_tts_tpu.models.chatterbox import ChatterboxModel

    cfg = CB_PRESETS["tiny"]
    tensors = _cb_tensors(cfg, np.random.default_rng(4))
    save_file(tensors, str(tmp_path / "t3.safetensors"))
    loaded = ChatterboxModel.from_pretrained(
        implementation="tiny", model_path=str(tmp_path)
    )
    np.testing.assert_allclose(
        np.asarray(loaded.params["text_embed"], np.float32),
        tensors["text_emb.weight"], atol=1e-2,
    )


# ---------------------------------------------------------------------------
# Speaker encoder (GE2E) converter
# ---------------------------------------------------------------------------


def _ge2e_state(rng):
    state = {}
    dims = [spk.N_MELS] + [spk.HIDDEN] * spk.LAYERS
    for layer in range(spk.LAYERS):
        state[f"lstm.weight_ih_l{layer}"] = _rand(rng, 4 * spk.HIDDEN, dims[layer]) * 4
        state[f"lstm.weight_hh_l{layer}"] = _rand(rng, 4 * spk.HIDDEN, spk.HIDDEN) * 4
        state[f"lstm.bias_ih_l{layer}"] = _rand(rng, 4 * spk.HIDDEN)
        state[f"lstm.bias_hh_l{layer}"] = _rand(rng, 4 * spk.HIDDEN)
    state["linear.weight"] = _rand(rng, spk.EMBED, spk.HIDDEN) * 4
    state["linear.bias"] = _rand(rng, spk.EMBED)
    return state


def test_speaker_load_pretrained_matches_torch_oracle(tmp_path):
    """Converted forward == torch nn.LSTM + Linear with the same weights."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    state = _ge2e_state(rng)
    # resemblyzer convention: wrapped state dict in a .pt file
    torch.save(
        {"model_state": {k: torch.from_numpy(v) for k, v in state.items()}},
        str(tmp_path / "pretrained.pt"),
    )
    params = spk.load_pretrained(str(tmp_path / "pretrained.pt"))

    mels = rng.standard_normal((2, 40, spk.N_MELS)).astype(np.float32)
    ours = np.asarray(spk._forward(params, jnp.asarray(mels)))

    lstm = torch.nn.LSTM(spk.N_MELS, spk.HIDDEN, spk.LAYERS, batch_first=True)
    lin = torch.nn.Linear(spk.HIDDEN, spk.EMBED)
    with torch.no_grad():
        for layer in range(spk.LAYERS):
            getattr(lstm, f"weight_ih_l{layer}").copy_(
                torch.from_numpy(state[f"lstm.weight_ih_l{layer}"]))
            getattr(lstm, f"weight_hh_l{layer}").copy_(
                torch.from_numpy(state[f"lstm.weight_hh_l{layer}"]))
            getattr(lstm, f"bias_ih_l{layer}").copy_(
                torch.from_numpy(state[f"lstm.bias_ih_l{layer}"]))
            getattr(lstm, f"bias_hh_l{layer}").copy_(
                torch.from_numpy(state[f"lstm.bias_hh_l{layer}"]))
        lin.weight.copy_(torch.from_numpy(state["linear.weight"]))
        lin.bias.copy_(torch.from_numpy(state["linear.bias"]))
        _, (h, _) = lstm(torch.from_numpy(mels))
        e = torch.relu(lin(h[-1]))
        ref = (e / torch.clamp(e.norm(dim=-1, keepdim=True), min=1e-8)).numpy()

    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_speaker_load_pretrained_npz_and_env(tmp_path, monkeypatch):
    rng = np.random.default_rng(6)
    state = _ge2e_state(rng)
    np.savez(str(tmp_path / "ge2e.npz"), **state)

    enc = spk.SpeakerEncoder(weights_path=str(tmp_path / "ge2e.npz"))
    np.testing.assert_allclose(
        np.asarray(enc.params["proj"]), state["linear.weight"].T, atol=1e-7
    )

    monkeypatch.setenv("RHO_TTS_TPU_SPEAKER_WEIGHTS", str(tmp_path / "ge2e.npz"))
    enc2 = spk.SpeakerEncoder()
    np.testing.assert_allclose(
        np.asarray(enc2.params["lstm"][0]["w_ih"]),
        state["lstm.weight_ih_l0"].T, atol=1e-7,
    )

    wav = (0.3 * np.sin(2 * np.pi * 200 * np.arange(16000) / 16000)).astype(np.float32)
    e = enc.embed_utterance(wav, 16000)
    assert e.shape == (256,) and np.isfinite(e).all()
