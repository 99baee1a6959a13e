"""Tensor-parallel training and serving on a virtual 8-device CPU mesh.

Covers the TP mandate (SURVEY.md §2.3): Megatron-style parameter sharding
(parallel/sharding.py), the jitted train_step over a (data, model) mesh
(models/qwen/train.py), and tensor-parallel serving through
enable_tensor_parallel — the paths the driver's dryrun_multichip exercises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from rho_tts_tpu.models.qwen import QwenTTSModel
from rho_tts_tpu.models.qwen.config import PRESETS
from rho_tts_tpu.models.qwen.model import _prefill, init_params
from rho_tts_tpu.models.qwen.train import make_optimizer, train_step
from rho_tts_tpu.models import transformer as tfm
from rho_tts_tpu.parallel import create_mesh
from rho_tts_tpu.parallel.inference import enable_tensor_parallel
from rho_tts_tpu.parallel.sharding import (
    batch_sharding,
    qwen_param_specs,
    shard_params,
)

CFG = PRESETS["tiny"]


def _train_batch(b=4, tt=8, tc=16, seed=3):
    rng = jax.random.PRNGKey(seed)
    r1, r2 = jax.random.split(rng)
    return {
        "text_ids": jax.random.randint(r1, (b, tt), 0, CFG.text_vocab, jnp.int32),
        "codes": jax.random.randint(
            r2, (b, tc, CFG.codec.n_codebooks), 0, CFG.codec.codebook_size, jnp.int32
        ),
        "codes_mask": jnp.ones((b, tc), bool),
    }


# ---------------------------------------------------------------------------
# shard_params
# ---------------------------------------------------------------------------


def test_shard_params_roundtrips_every_leaf():
    """Sharding must not change any value, and every leaf must land with
    the spec the tree asked for."""
    mesh = create_mesh(8)  # (data=2, model=4)
    params = init_params(jax.random.PRNGKey(0), CFG)
    specs = qwen_param_specs(params)
    sharded = shard_params(mesh, params, specs)

    flat_ref = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(sharded)[0])
    assert len(flat_ref) == len(flat_new)
    for path, leaf in flat_ref:
        np.testing.assert_array_equal(
            np.asarray(leaf, np.float32), np.asarray(flat_new[path], np.float32)
        )

    # Spot-check the Megatron layout landed: column-parallel wqkv, row-
    # parallel wo, vocab-sharded text embedding.
    assert sharded["talker"]["blocks"]["wqkv"].sharding.spec == P(None, None, "model")
    assert sharded["talker"]["blocks"]["wo"].sharding.spec == P(None, "model", None)
    assert sharded["text_embed"].sharding.spec == P("model", None)


def test_quantized_specs_follow_dense_layout():
    """int8 {"q","s"} leaves get the dense spec on q and an input-axis-
    dropped spec on the per-output-channel scale."""
    from rho_tts_tpu.models.quantization import quantize_stack

    params = init_params(jax.random.PRNGKey(0), CFG)
    params = {**params, "talker": quantize_stack(params["talker"])}
    specs = qwen_param_specs(params)
    bspecs = specs["talker"]["blocks"]
    assert bspecs["wqkv"]["q"] == P(None, None, "model")
    assert bspecs["wqkv"]["s"] == P(None, "model")
    assert bspecs["wo"]["q"] == P(None, "model", None)
    assert bspecs["wo"]["s"] == P(None, None)

    mesh = create_mesh(8, model_parallel=2)
    sharded = shard_params(mesh, params, specs)
    assert sharded["talker"]["blocks"]["wqkv"]["q"].sharding.spec == P(None, None, "model")


# ---------------------------------------------------------------------------
# train_step on the mesh
# ---------------------------------------------------------------------------


def test_train_loss_decreases_on_mesh():
    mesh = create_mesh(8)  # (data=2, model=4)
    optimizer = make_optimizer(learning_rate=3e-3)
    params = init_params(jax.random.PRNGKey(0), CFG)

    with mesh:
        params = shard_params(mesh, params, qwen_param_specs(params))
        opt_state = optimizer.init(params)
        batch = {
            k: jax.device_put(v, batch_sharding(mesh, v.ndim))
            for k, v in _train_batch().items()
        }
        losses = []
        for _ in range(3):
            params, opt_state, loss = train_step(params, opt_state, batch, CFG, optimizer)
            losses.append(float(loss))

    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_train_step_tp_matches_single_device_loss():
    """First-step loss on the (2,4) mesh equals the unsharded loss (f32
    tolerance — reduction order differs across shards)."""
    optimizer = make_optimizer()
    batch = _train_batch()

    params = init_params(jax.random.PRNGKey(0), CFG)
    opt_state = optimizer.init(params)
    _, _, loss_ref = train_step(params, opt_state, batch, CFG, optimizer)

    mesh = create_mesh(8)
    params2 = init_params(jax.random.PRNGKey(0), CFG)
    with mesh:
        params2 = shard_params(mesh, params2, qwen_param_specs(params2))
        opt_state2 = optimizer.init(params2)
        sbatch = {
            k: jax.device_put(v, batch_sharding(mesh, v.ndim)) for k, v in batch.items()
        }
        _, _, loss_tp = train_step(params2, opt_state2, sbatch, CFG, optimizer)

    assert abs(float(loss_ref) - float(loss_tp)) < 5e-2


# ---------------------------------------------------------------------------
# Tensor-parallel serving
# ---------------------------------------------------------------------------


def test_tp_prefill_logits_match_unsharded():
    params = init_params(jax.random.PRNGKey(1), CFG)
    b, p, s = 2, 8, 32
    rng = jax.random.PRNGKey(2)
    ids = jax.random.randint(rng, (b, p), 0, CFG.text_vocab, jnp.int32)
    text_mask = jnp.ones((b, p), jnp.float32).at[:, -1].set(0.0)  # last = BOS
    codes = jnp.zeros((b, p, CFG.codec.n_codebooks), jnp.int32)
    zero = jnp.zeros((b, p), jnp.float32)
    rope_pos = jnp.broadcast_to(jnp.arange(p), (b, p)).astype(jnp.int32)
    attn_mask = jnp.ones((b, p), bool)

    def run(pp):
        ck, cv = tfm.make_kv_cache(CFG.talker, b, s)
        logits, *_ = _prefill(
            pp, CFG, ids, text_mask, codes, zero, jnp.zeros((b,), jnp.int32), zero,
            rope_pos, attn_mask, ck, cv, jnp.zeros((b, s), bool),
        )
        return np.asarray(logits)

    ref = run(params)
    mesh = create_mesh(8, model_parallel=2)
    sharded = shard_params(mesh, params, qwen_param_specs(params))
    tp = run(sharded)
    # bf16 weights: sharded reductions reorder accumulation; measured max
    # divergence ~0.03 on logits with |ref| up to ~2.6.
    np.testing.assert_allclose(ref, tp, atol=6e-2, rtol=2e-2)


def test_tp_synthesize_runs_and_matches_shape():
    model = QwenTTSModel(PRESETS["tiny"])
    enable_tensor_parallel(model, create_mesh(8, model_parallel=2))
    assert dict(model.mesh.shape) == {"data": 4, "model": 2}
    waves, sr = model.synthesize(
        ["tensor parallel serving", "second row"], speaker="Vivian", min_frames=8
    )
    assert len(waves) == 2
    assert sr == 24000
    assert all(w.shape[-1] > 0 for w in waves)


def test_tp_int8_synthesize_runs():
    """Quantized weights shard with the same layout and still serve."""
    model = QwenTTSModel(PRESETS["tiny"], quantization="int8")
    enable_tensor_parallel(model, create_mesh(8, model_parallel=2))
    assert (
        model.params["talker"]["blocks"]["wqkv"]["q"].sharding.spec
        == P(None, None, "model")
    )
    waves, _ = model.synthesize(["int eight tensor parallel"], speaker="Ryan", min_frames=8)
    assert waves[0].shape[-1] > 0


def test_tp_rejects_indivisible_kv_heads():
    model = QwenTTSModel(PRESETS["tiny"])  # kv_heads=2
    with pytest.raises(ValueError, match="kv_heads"):
        enable_tensor_parallel(model, create_mesh(8, model_parallel=4))


def test_checkpoint_save_restore_roundtrip(tmp_path):
    """Training state survives a save/restore cycle bit-for-bit."""
    import numpy as np

    from rho_tts_tpu.models.qwen.config import PRESETS
    from rho_tts_tpu.models.qwen import train as tr

    cfg = PRESETS["tiny"]
    opt = tr.make_optimizer(1e-3)
    params, opt_state = tr.init_train_state(cfg, seed=0, optimizer=opt)

    rng = np.random.default_rng(0)
    batch = {
        "text_ids": jnp.asarray(rng.integers(0, cfg.text_vocab, (2, 8)), jnp.int32),
        "codes": jnp.asarray(
            rng.integers(0, cfg.codec.codebook_size, (2, 12, cfg.codec.n_codebooks)),
            jnp.int32,
        ),
        "codes_mask": jnp.ones((2, 12), bool),
    }
    params, opt_state, loss1 = tr.train_step(params, opt_state, batch, cfg, opt)

    ckpt = str(tmp_path / "ckpt")
    tr.save_train_state(ckpt, params, opt_state, step=1)
    r_params, r_opt_state, r_step = tr.restore_train_state(ckpt, cfg, optimizer=opt)
    assert r_step == 1
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(r_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Training continues identically from the restored state
    _, _, loss_a = tr.train_step(params, opt_state, batch, cfg, opt)
    _, _, loss_b = tr.train_step(r_params, r_opt_state, batch, cfg, opt)
    assert float(loss_a) == float(loss_b)
    assert float(loss_a) < float(loss1) + 1.0  # sane continuation
