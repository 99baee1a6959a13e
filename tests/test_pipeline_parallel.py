"""Pipeline parallelism (parallel/pipeline.py) on the virtual 8-device mesh.

The reference has no parallelism (SURVEY.md §2.3); PP here stages the
talker layer stack over a ``pipe`` mesh axis with GPipe microbatching.
Per-row math is untouched by microbatching, so the pipelined
forward matches the unmeshed ``stack_forward`` to float tolerance (the
per-row math is identical; XLA codegen at different batch shapes can
reorder contraction sums, so bitwise equality is not the bar), and gradients through the ``ppermute`` schedule are checked
against plain autodiff.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_tts_tpu.models import transformer as tfm
from rho_tts_tpu.models.qwen.config import PRESETS
from rho_tts_tpu.models.qwen.model import init_params
from rho_tts_tpu.models.qwen.train import make_optimizer, train_step
from rho_tts_tpu.parallel.pipeline import (
    create_pipeline_mesh,
    pipeline_stack_forward,
    pipeline_train_step,
    shard_stack_for_pipeline,
)

# 4 layers so a 4-stage pipe divides; fp32 keeps grad comparisons sharp.
CFG4 = tfm.TransformerConfig(
    hidden=32, layers=4, q_heads=4, kv_heads=2, head_dim=8, ffn=64,
    dtype=jnp.float32,
)


def _stack_and_inputs(cfg, b=8, t=6, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    params = tfm.init_stack(k1, cfg)
    x = jax.random.normal(k2, (b, t, cfg.hidden), cfg.dtype)
    positions = jnp.broadcast_to(jnp.arange(t), (b, t)).astype(jnp.int32)
    return params, x, positions


class TestForwardParity:
    def test_pure_pipe_exact_and_jittable(self):
        # One compile covers both claims: parity vs the unmeshed stack AND
        # jit-compatibility (the schedule is one shard_map program).
        params, x, pos = _stack_and_inputs(CFG4, b=4)
        ref, _ = tfm.stack_forward(params, CFG4, x, pos)
        mesh = create_pipeline_mesh(n_devices=4, n_stages=4)
        staged = shard_stack_for_pipeline(mesh, params)

        @jax.jit
        def f(p, x, pos):
            out, caches = pipeline_stack_forward(p, CFG4, x, pos, mesh=mesh)
            assert caches is None
            return out

        out = f(staged, x, pos)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-5)

    def test_data_by_pipe_mesh_exact(self):
        params, x, pos = _stack_and_inputs(CFG4, b=8)
        ref, _ = tfm.stack_forward(params, CFG4, x, pos)
        mesh = create_pipeline_mesh(n_devices=8, n_stages=4)  # data=2, pipe=4
        staged = shard_stack_for_pipeline(mesh, params)
        out = jax.jit(
            lambda p, x, pos: pipeline_stack_forward(
                p, CFG4, x, pos, mesh=mesh, n_microbatches=2
            )[0]
        )(staged, x, pos)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-5)

    def test_more_microbatches_than_stages(self):
        # jit the call: an eager shard_map of the unrolled schedule takes
        # ~10x longer to stage than one compiled program.
        params, x, pos = _stack_and_inputs(CFG4, b=4)
        ref, _ = tfm.stack_forward(params, CFG4, x, pos)
        mesh = create_pipeline_mesh(n_devices=2, n_stages=2)
        out = jax.jit(
            lambda p, x, pos: pipeline_stack_forward(
                p, CFG4, x, pos, mesh=mesh, n_microbatches=4
            )[0]
        )(params, x, pos)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-5)

    def test_attn_mask_travels_with_microbatch(self):
        params, x, pos = _stack_and_inputs(CFG4, b=4, t=6)
        # Different validity pattern per row — if masks didn't ride the
        # pipeline alongside their activations, rows would see the wrong
        # mask and diverge.
        mask = jnp.arange(6)[None, :] < jnp.array([[2], [4], [6], [3]])
        ref, _ = tfm.stack_forward(params, CFG4, x, pos, attn_mask=mask)
        mesh = create_pipeline_mesh(n_devices=2, n_stages=2)
        out = jax.jit(
            lambda p, x, pos, msk: pipeline_stack_forward(
                p, CFG4, x, pos, attn_mask=msk, mesh=mesh, n_microbatches=4
            )[0]
        )(params, x, pos, mask)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-5)


class TestGradParity:
    def test_grads_match_plain_autodiff(self):
        params, x, pos = _stack_and_inputs(CFG4, b=4)
        mesh = create_pipeline_mesh(n_devices=4, n_stages=4)

        def loss_plain(p):
            h, _ = tfm.stack_forward(p, CFG4, x, pos)
            return jnp.sum(h.astype(jnp.float32) ** 2)

        def loss_pp(p):
            h, _ = pipeline_stack_forward(p, CFG4, x, pos, mesh=mesh)
            return jnp.sum(h.astype(jnp.float32) ** 2)

        g_ref = jax.jit(jax.grad(loss_plain))(params)
        g_pp = jax.jit(jax.grad(loss_pp))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=1e-5,
            ),
            g_ref,
            g_pp,
        )


class TestTrainStep:
    def _batch(self, cfg, b=4, tt=4, tc=8, seed=3):
        r1, r2 = jax.random.split(jax.random.PRNGKey(seed))
        return {
            "text_ids": jax.random.randint(r1, (b, tt), 0, cfg.text_vocab, jnp.int32),
            "codes": jax.random.randint(
                r2, (b, tc, cfg.codec.n_codebooks), 0,
                cfg.codec.codebook_size, jnp.int32,
            ),
            "codes_mask": jnp.ones((b, tc), bool),
        }

    def test_loss_and_params_match_unpipelined(self):
        cfg = PRESETS["tiny"]  # talker has 2 layers → 2 stages
        optimizer = make_optimizer()
        batch = self._batch(cfg, b=4)

        p_ref = init_params(jax.random.PRNGKey(0), cfg)
        o_ref = optimizer.init(p_ref)
        p_ref, o_ref, loss_ref = train_step(p_ref, o_ref, batch, cfg, optimizer)

        mesh = create_pipeline_mesh(n_devices=4, n_stages=2)  # data=2, pipe=2
        p_pp = init_params(jax.random.PRNGKey(0), cfg)
        o_pp = optimizer.init(p_pp)
        with mesh:
            p_pp, o_pp, loss_pp = pipeline_train_step(
                p_pp, o_pp, batch, cfg, optimizer, mesh, 2
            )

        np.testing.assert_allclose(
            float(loss_ref), float(loss_pp), rtol=1e-5, atol=1e-6
        )
        # First-step AdamW is sign-like (update ≈ ±lr): a near-zero grad
        # whose sign flips within float noise moves a param by ~2·lr=2e-4,
        # so the bound is additive in lr, not relative.
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-4, atol=5e-4,
            ),
            p_ref,
            p_pp,
        )


class TestValidation:
    def test_layers_must_divide_stages(self):
        cfg = dataclasses.replace(CFG4, layers=3)
        params, x, pos = _stack_and_inputs(cfg)
        mesh = create_pipeline_mesh(n_devices=4, n_stages=4)
        with pytest.raises(ValueError, match="divide the layer count"):
            pipeline_stack_forward(params, cfg, x, pos, mesh=mesh)

    def test_zero_microbatches_rejected(self):
        # An explicit 0 must be an error, not silently the stage default.
        params, x, pos = _stack_and_inputs(CFG4, b=4)
        mesh = create_pipeline_mesh(n_devices=4, n_stages=4)
        with pytest.raises(ValueError, match="n_microbatches must be >= 1"):
            pipeline_stack_forward(
                params, CFG4, x, pos, mesh=mesh, n_microbatches=0
            )

    def test_batch_must_divide_microbatches(self):
        params, x, pos = _stack_and_inputs(CFG4, b=6)
        mesh = create_pipeline_mesh(n_devices=4, n_stages=4)
        with pytest.raises(ValueError, match="divide into n_microbatches"):
            pipeline_stack_forward(params, CFG4, x, pos, mesh=mesh)

    def test_stages_must_divide_devices(self):
        with pytest.raises(ValueError, match="must divide n_devices"):
            create_pipeline_mesh(n_devices=8, n_stages=3)
