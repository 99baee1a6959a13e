"""Native serving checkpoints (models.checkpoint): export-once, serve-many.

Covers the full-tree orbax round trip (every leaf, not just the talker —
the HF converter alone cannot cover codec/embeddings), pre-quantized
export (the cold-start lever: int8 leaves move half the bf16 bytes and
skip the quantize pass), host-side quantization parity vs the device
paths, and manifest validation (family / quantization mismatch errors).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_tts_tpu.models import checkpoint as ckpt_lib
from rho_tts_tpu.models.qwen import QwenTTSModel
from rho_tts_tpu.models.qwen.config import PRESETS


def _tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_native_roundtrip_all_leaves(tmp_path):
    model = QwenTTSModel(PRESETS["tiny"], seed=3)
    model.save_checkpoint(tmp_path / "ckpt")
    assert ckpt_lib.is_native_checkpoint(str(tmp_path / "ckpt"))

    loaded = QwenTTSModel.from_pretrained(str(tmp_path / "ckpt"))
    assert loaded.config.name == "tiny"
    assert loaded.quantization is None
    _tree_equal(model.params, loaded.params)

    # Same rng → identical codes: the restored tree is the whole model
    c1 = model.generate_codes(["native checkpoint"], speaker="Vivian",
                              min_frames=8, rng=jax.random.PRNGKey(0))
    c2 = loaded.generate_codes(["native checkpoint"], speaker="Vivian",
                               min_frames=8, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(c1[0]), np.asarray(c2[0]))


def test_native_roundtrip_quantized(tmp_path):
    model = QwenTTSModel(PRESETS["tiny"], seed=5, quantization="int8")
    model.save_checkpoint(tmp_path / "q8")
    manifest = ckpt_lib.load_manifest(str(tmp_path / "q8"))
    assert manifest["quantization"] == "int8"

    loaded = QwenTTSModel.from_pretrained(str(tmp_path / "q8"))
    # Quantization mode comes from the manifest; the int8 leaves are
    # restored as-saved (no double quantization).
    assert loaded.quantization == "int8"
    assert loaded.params["talker"]["blocks"]["wqkv"]["q"].dtype == jnp.int8
    _tree_equal(model.params, loaded.params)

    # Explicitly asking for the exported mode also works
    again = QwenTTSModel.from_pretrained(str(tmp_path / "q8"), quantization="int8")
    _tree_equal(model.params, again.params)


def test_native_quantization_mismatch_rejected(tmp_path):
    QwenTTSModel(PRESETS["tiny"], quantization="int8").save_checkpoint(tmp_path / "q8")
    with pytest.raises(ValueError, match="quantization"):
        QwenTTSModel.from_pretrained(str(tmp_path / "q8"), quantization="int4")
    # An explicit "none" (dense) request also mismatches an int8 export —
    # the leaves are already int8 and cannot be de-quantized here.
    with pytest.raises(ValueError, match="quantization"):
        QwenTTSModel.from_pretrained(str(tmp_path / "q8"), quantization="none")


def test_native_dense_export_can_quantize_on_load(tmp_path):
    dense = QwenTTSModel(PRESETS["tiny"], seed=4)
    dense.save_checkpoint(tmp_path / "dense")
    m = QwenTTSModel.from_pretrained(str(tmp_path / "dense"), quantization="int8")
    assert m.quantization == "int8"
    assert m.params["talker"]["blocks"]["wqkv"]["q"].dtype == jnp.int8
    # And an explicit "none" on a dense export stays dense (labelled None)
    m2 = QwenTTSModel.from_pretrained(str(tmp_path / "dense"), quantization="none")
    assert m2.quantization is None


def test_preset_inference_not_hijacked_by_demo_presets(tmp_path):
    """Paths containing 'draft'/'small' must not resolve to the demo
    presets — only exact names do (a '/ckpts/qwen-0.6b-draft' checkpoint
    is a 0.6B model exported as a speculative draft, not the 128-hidden
    demo config)."""
    from rho_tts_tpu.models.qwen.config import resolve_config

    assert resolve_config("/ckpts/qwen-0.6b-draft").name == "0.6B"
    assert resolve_config("/ckpts/qwen-1.7b-small-batch").name == "1.7B"
    assert resolve_config("draft").name == "draft"
    assert resolve_config("small").name == "small"
    assert resolve_config("/x/unrelated").name == "1.7B"


def test_native_family_mismatch_rejected(tmp_path):
    ckpt_lib.save_params(
        tmp_path / "x", {"a": np.zeros(3, np.float32)}, family="chatterbox",
        preset="tiny",
    )
    with pytest.raises(ValueError, match="family"):
        ckpt_lib.load_params(str(tmp_path / "x"), family="qwen")


def test_provider_export_and_reload(tmp_path):
    """QwenTTS.export_checkpoint → new provider serves the same weights."""
    from rho_tts_tpu.providers.qwen import QwenTTS

    a = QwenTTS(device="cpu", model_path="tiny-CustomVoice", speaker="Vivian",
                max_iterations=1, quantization="int8")
    a.export_checkpoint(tmp_path / "served")
    assert ckpt_lib.is_native_checkpoint(str(tmp_path / "served"))

    b = QwenTTS(device="cpu", model_path=str(tmp_path / "served"),
                speaker="Vivian", max_iterations=1)
    _tree_equal(a._load_model().params, b._load_model().params)
    assert b._load_model().quantization == "int8"
    # CustomVoice routing survives the export (the directory name no
    # longer carries it; the manifest variant does)
    assert b._is_custom_voice()
    b.export_checkpoint(tmp_path / "served2")  # variant survives re-export
    c = QwenTTS(device="cpu", model_path=str(tmp_path / "served2"),
                speaker="Vivian", max_iterations=1)
    assert c._is_custom_voice()


def test_chatterbox_native_roundtrip(tmp_path):
    from rho_tts_tpu.models.chatterbox.model import PRESETS as CB_PRESETS
    from rho_tts_tpu.models.chatterbox.model import ChatterboxModel

    model = ChatterboxModel(CB_PRESETS["tiny"], seed=2, quantization="int8")
    model.save_checkpoint(tmp_path / "cb")
    loaded = ChatterboxModel.from_pretrained(model_path=str(tmp_path / "cb"))
    assert loaded.cfg is CB_PRESETS["tiny"]
    assert loaded.quantization == "int8"
    _tree_equal(model.params, loaded.params)


def test_quantize_host_matches_device_int8():
    from rho_tts_tpu.models.quantization import quantize_host, quantize_weight

    rng = np.random.default_rng(0)
    w = rng.standard_normal((2, 32, 16)).astype(np.float32)
    h = quantize_host(w, "int8")
    d = quantize_weight(jnp.asarray(w))
    np.testing.assert_array_equal(h["q"], np.asarray(d["q"]))
    np.testing.assert_allclose(h["s"], np.asarray(d["s"]), rtol=1e-6)


def test_quantize_host_matches_device_int4():
    from rho_tts_tpu.models.quantization import quantize_host
    from rho_tts_tpu.ops.pallas.int4_matmul import pack_int4

    rng = np.random.default_rng(1)
    w = rng.standard_normal((32, 16)).astype(np.float32)
    h = quantize_host(w, "int4")
    d = pack_int4(jnp.asarray(w))
    np.testing.assert_array_equal(h["q4"], np.asarray(d["q4"]))
    np.testing.assert_allclose(h["s"], np.asarray(d["s"]), rtol=1e-6)


def test_hf_load_host_quantize_matches_device_quantize(tmp_path):
    """HF checkpoint + quantization kwarg: host-side int8 at load time
    produces the same model as loading dense then quantizing on device."""
    from safetensors.numpy import save_file

    from test_weights import _qwen_hf_tensors

    cfg = PRESETS["tiny"]
    tensors = _qwen_hf_tensors(cfg, np.random.default_rng(7))
    path = tmp_path / "tiny_hf"
    path.mkdir()
    save_file(tensors, str(path / "model.safetensors"))

    host_q = QwenTTSModel.from_pretrained(str(path), quantization="int8")
    dense = QwenTTSModel.from_pretrained(str(path))
    from rho_tts_tpu.models.quantization import quantize_stack

    dev_q = quantize_stack(dense.params["talker"])
    for name in ("wqkv", "wo", "w_gate", "w_up", "w_down"):
        got = host_q.params["talker"]["blocks"][name]
        want = dev_q["blocks"][name]
        # Values sitting exactly on a rounding boundary can land one step
        # apart between numpy and XLA (fma in the w/scale division); allow
        # |Δq| ≤ 1 on a vanishing fraction, nothing more.
        dq = np.abs(
            np.asarray(got["q"], np.int32) - np.asarray(want["q"], np.int32)
        )
        assert dq.max() <= 1
        assert (dq != 0).mean() < 1e-3
        np.testing.assert_allclose(
            np.asarray(got["s"]), np.asarray(want["s"]), rtol=1e-5
        )


def test_hf_partial_checkpoint_patches_missing_layer(tmp_path):
    """A checkpoint missing one layer still loads; the hole keeps its
    random-init values (two-pass map: only that leaf pays a fetch)."""
    from safetensors.numpy import save_file

    from test_weights import _qwen_hf_tensors
    from rho_tts_tpu.models.qwen.weights import load_checkpoint

    cfg = PRESETS["tiny"]
    tensors = _qwen_hf_tensors(cfg, np.random.default_rng(9))
    missing = {
        k: v for k, v in tensors.items() if ".layers.1." not in k
    }
    path = tmp_path / "tiny_partial"
    path.mkdir()
    save_file(missing, str(path / "model.safetensors"))

    params = load_checkpoint(str(path), cfg)
    assert params is not None
    blocks = params["talker"]["blocks"]
    lp = "talker.model.layers.0."
    fused = np.concatenate(
        [
            tensors[f"{lp}self_attn.q_proj.weight"].T,
            tensors[f"{lp}self_attn.k_proj.weight"].T,
            tensors[f"{lp}self_attn.v_proj.weight"].T,
        ],
        axis=1,
    )
    np.testing.assert_allclose(
        np.asarray(blocks["wqkv"][0], np.float32), fused, atol=1e-2
    )
    # Layer 1 keeps random init — it must NOT equal the (withheld) tensors
    lp1 = "talker.model.layers.1."
    fused1 = np.concatenate(
        [
            tensors[f"{lp1}self_attn.q_proj.weight"].T,
            tensors[f"{lp1}self_attn.k_proj.weight"].T,
            tensors[f"{lp1}self_attn.v_proj.weight"].T,
        ],
        axis=1,
    )
    assert not np.allclose(np.asarray(blocks["wqkv"][1], np.float32), fused1, atol=1e-2)
