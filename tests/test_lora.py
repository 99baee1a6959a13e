"""LoRA voice adaptation (`models/qwen/lora.py`).

Pins: zero-init adapters merge to a bit-identical model; training moves
ONLY the adapters (base frozen, bitwise); the loss actually drops;
adapters round-trip through orbax; the merged model serves through the
normal paths (synthesize, ctor `lora_path`); the step runs data-sharded
on the virtual mesh with the same loss as unsharded.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rho_tts_tpu.models.qwen import PRESETS
from rho_tts_tpu.models.qwen import lora as lora_lib
from rho_tts_tpu.models.qwen.model import QwenTTSModel, init_params
from rho_tts_tpu.models.qwen.train import make_optimizer

CFG = PRESETS["tiny"]


@pytest.fixture(scope="module")
def base_params():
    return jax.jit(init_params, static_argnums=1)(jax.random.PRNGKey(0), CFG)


def tiny_batch(seed=1, b=2, tt=8, tc=16):
    rng = jax.random.PRNGKey(seed)
    r1, r2 = jax.random.split(rng)
    return {
        "text_ids": jax.random.randint(r1, (b, tt), 0, CFG.text_vocab, jnp.int32),
        "codes": jax.random.randint(
            r2, (b, tc, CFG.codec.n_codebooks), 0, CFG.codec.codebook_size, jnp.int32
        ),
        "codes_mask": jnp.ones((b, tc), bool),
    }


def test_zero_init_merge_is_identity(base_params):
    lora = lora_lib.init_lora(CFG, base_params, rank=4)
    merged = lora_lib.apply_lora(base_params, lora)
    for name in lora:
        np.testing.assert_array_equal(
            np.asarray(merged["talker"]["blocks"][name], np.float32),
            np.asarray(base_params["talker"]["blocks"][name], np.float32),
        )


def test_adapter_size_is_tiny(base_params):
    lora = lora_lib.init_lora(CFG, base_params, rank=4)
    n_base = sum(int(x.size) for x in jax.tree.leaves(base_params["talker"]))
    assert lora_lib.n_lora_params(lora) < n_base / 10


def test_unknown_target_rejected(base_params):
    with pytest.raises(ValueError, match="unknown LoRA targets"):
        lora_lib.init_lora(CFG, base_params, targets=("nope",))


def test_training_drops_loss_and_freezes_base(base_params):
    base_snapshot = jax.tree.map(lambda x: np.asarray(x).copy(), base_params)
    lora, opt_state, optimizer = lora_lib.init_lora_train_state(
        CFG, base_params, rank=4, optimizer=make_optimizer(5e-3)
    )
    batch = tiny_batch()
    losses = []
    for _ in range(25):
        lora, opt_state, loss = lora_lib.lora_train_step(
            base_params, lora, opt_state, batch, CFG, optimizer
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, losses[:3] + losses[-3:]
    # the base never moved — bitwise
    for a, b in zip(jax.tree.leaves(base_snapshot), jax.tree.leaves(base_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...and the trained adapter actually changes the merged model
    merged = lora_lib.apply_lora(base_params, lora)
    assert not np.allclose(
        np.asarray(merged["talker"]["blocks"]["wqkv"], np.float32),
        np.asarray(base_params["talker"]["blocks"]["wqkv"], np.float32),
    )


def test_save_load_roundtrip_and_ctor_merge(tmp_path, base_params):
    lora, opt_state, optimizer = lora_lib.init_lora_train_state(
        CFG, base_params, rank=4, optimizer=make_optimizer(5e-3)
    )
    batch = tiny_batch()
    for _ in range(5):
        lora, opt_state, _ = lora_lib.lora_train_step(
            base_params, lora, opt_state, batch, CFG, optimizer
        )
    path = str(tmp_path / "voice_adapter")
    lora_lib.save_lora(path, lora, meta={"scale": 1.0, "voice": "demo"})
    loaded, meta = lora_lib.load_lora(path)
    assert meta["voice"] == "demo"
    for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the ctor merges the adapter and the merged model synthesizes
    model = QwenTTSModel(CFG, params=base_params, lora_path=path)
    merged_ref = lora_lib.apply_lora(base_params, lora)
    np.testing.assert_allclose(
        np.asarray(model.params["talker"]["blocks"]["wqkv"], np.float32),
        np.asarray(merged_ref["talker"]["blocks"]["wqkv"], np.float32),
        atol=0,
    )
    waves, sr = model.synthesize(["adapted voice"], min_frames=8, max_frames=64)
    assert np.isfinite(np.asarray(waves[0], np.float32)).all()

    # ...and composes with quantization (merge precedes the int8 pass)
    model_q = QwenTTSModel(CFG, params=base_params, lora_path=path, quantization="int8")
    waves_q, _ = model_q.synthesize(["adapted int8"], min_frames=8, max_frames=64)
    assert np.isfinite(np.asarray(waves_q[0], np.float32)).all()


def test_lora_on_quantized_base_rejected(tmp_path, base_params):
    lora = lora_lib.init_lora(CFG, base_params, rank=2)
    path = str(tmp_path / "adapter")
    lora_lib.save_lora(path, lora)
    from rho_tts_tpu.models.quantization import quantize_stack

    qparams = {**base_params, "talker": quantize_stack(base_params["talker"], "int8")}
    with pytest.raises(ValueError, match="DENSE base"):
        QwenTTSModel(CFG, params=qparams, lora_path=path)


def test_mesh_sharded_lora_step_matches_unsharded(base_params):
    from rho_tts_tpu.parallel.mesh import create_mesh
    from rho_tts_tpu.parallel.sharding import batch_sharding

    optimizer = make_optimizer(5e-3)
    batch = tiny_batch(b=4)

    lora0 = lora_lib.init_lora(CFG, base_params, rank=4)
    opt0 = optimizer.init(lora0)
    _, _, loss_ref = lora_lib.lora_train_step(
        base_params, lora0, opt0, batch, CFG, optimizer
    )

    mesh = create_mesh(2, model_parallel=1)
    with mesh:
        sharded_batch = {
            k: jax.device_put(v, batch_sharding(mesh, v.ndim)) for k, v in batch.items()
        }
        lora1 = lora_lib.init_lora(CFG, base_params, rank=4)
        opt1 = optimizer.init(lora1)
        _, _, loss_dp = lora_lib.lora_train_step(
            base_params, lora1, opt1, sharded_batch, CFG, optimizer
        )
    np.testing.assert_allclose(float(loss_ref), float(loss_dp), rtol=1e-5)


def test_provider_lora_path(tmp_path, base_params):
    """`QwenTTS(lora_path=...)` merges the adapter at lazy model load."""
    from rho_tts_tpu.providers.qwen import QwenTTS

    lora = lora_lib.init_lora(CFG, base_params, rank=2, seed=3)
    # make it a non-identity adapter
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    path = str(tmp_path / "voice_a")
    lora_lib.save_lora(path, lora, meta={"scale": 1.0})

    tts = QwenTTS(
        device="cpu", model_path="tiny-CustomVoice", speaker="Aria",
        max_iterations=1, max_chars_per_segment=200, lora_path=path,
        min_audio_sec=0.3,
    )
    wav = tts._generate_audio("provider adapter check")
    assert np.isfinite(np.asarray(wav, np.float32)).all()
    base = QwenTTSModel.from_pretrained("tiny-CustomVoice", seed=tts.seed)
    merged = lora_lib.apply_lora(base.params, lora, scale=1.0)
    np.testing.assert_allclose(
        np.asarray(tts._model.params["talker"]["blocks"]["wqkv"], np.float32),
        np.asarray(merged["talker"]["blocks"]["wqkv"], np.float32),
        atol=0,
    )
