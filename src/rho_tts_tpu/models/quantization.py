"""Weight-only int8 quantization for the codec-LM talker.

AR decode on one chip is bound by reading the weight matrices from HBM
every step (bf16 1.7B ≈ 3.4 GB/step). Per-output-channel symmetric int8
halves that traffic; the MXU still computes in bf16 after an in-VMEM
dequant that XLA fuses into the weight load.

A quantized linear is stored as ``{"q": int8 (…, in, out), "s": f32
(…, out)}`` with ``w ≈ q * s / 127``-style scaling folded into ``s``.
``matmul`` dispatches on the leaf type so the same transformer code runs
dense or quantized weights.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANT_KEYS = ("wqkv", "wo", "w_gate", "w_up", "w_down")


def _w8a8_prefill_enabled() -> bool:
    """Opt-in int8-activation prefill (``RHO_TTS_TPU_W8A8_PREFILL=1``).

    Decode is HBM-bound on weight reads, so weight-only int8 is the right
    default there — but prefill is MXU compute-bound (bf16 dots measured
    ~54% of v5e bf16 peak), and the MXU runs int8×int8→int32 at twice the
    bf16 rate. With per-token symmetric activation quantization the
    matmuls run as native int8 dots; applied only when the sequence axis
    is > 1 so decode numerics are untouched. Read at trace time (the flag
    selects which program is compiled).
    """
    return os.environ.get("RHO_TTS_TPU_W8A8_PREFILL", "0") == "1"


def _w8a8_matmul(x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """x @ (q*s) as a native int8 MXU dot with per-token activation scales.

    x (…, T, in) is quantized per row (symmetric absmax → int8), the dot
    accumulates in int32 on the MXU, and the result is rescaled by
    (row_scale × per-output-channel weight scale) in f32.

    ``RHO_TTS_TPU_W8A8_KERNEL=1`` routes the dot + rescale through a
    Pallas kernel with the int32 accumulator in VMEM
    (``ops.pallas.w8a8_matmul``) — measured SLOWER than this XLA path
    end-to-end (see the kernel's ``kernel_available`` for the A/B), so
    it stays opt-in. Identical math either way — the XLA expression
    below is the kernel's test oracle.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # (…, T, 1)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

    from ..ops.pallas import w8a8_matmul as w8k

    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    k_dim, n = q.shape
    if w8k.kernel_available() and w8k.shapes_ok(m, k_dim, n):
        y = w8k.w8a8_matmul_kernel(
            xq.reshape(m, k_dim), sx.reshape(m, 1).astype(jnp.float32),
            q, s.astype(jnp.float32), x.dtype,
        )
        return y.reshape(*lead, n)

    acc = jax.lax.dot_general(
        xq, q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sx * s).astype(x.dtype)


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Symmetric per-output-channel int8: w (…, in, out) → {q, s}."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (…, 1, out)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.squeeze(-2).astype(jnp.float32)}


def quantize_host(w, mode: str = "int8") -> Dict[str, "jnp.ndarray"]:
    """Host-side (numpy) quantization — same math as the device paths.

    Used by checkpoint loaders so the host→device transfer moves the
    quantized bytes (half of bf16 for int8, a quarter for int4) instead of
    shipping bf16 and quantizing on device. Rounding matches the jnp
    versions (round-half-to-even), verified by tests.
    """
    import numpy as np

    wf = np.asarray(w, np.float32)
    absmax = np.max(np.abs(wf), axis=-2, keepdims=True)
    if mode == "int8":
        scale = np.maximum(absmax, 1e-8) / 127.0
        q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
        return {"q": q, "s": scale.squeeze(-2).astype(np.float32)}
    if mode == "int4":
        k = wf.shape[-2]
        if k % 2:
            raise ValueError(f"int4 packing needs even K, got {k}")
        scale = np.maximum(absmax, 1e-8) / 7.0
        q = np.clip(np.round(wf / scale), -7, 7).astype(np.int32)
        lo = q[..., : k // 2, :] & 0xF
        hi = q[..., k // 2 :, :] & 0xF
        b = (hi << 4) | lo
        packed = np.where(b > 127, b - 256, b).astype(np.int8)
        return {"q4": packed, "s": scale.squeeze(-2).astype(np.float32)}
    raise ValueError(f"Unknown quantization mode: {mode!r}")


def matmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w for dense or quantized ({"q","s"} int8 / {"q4","s"} int4) weights."""
    if isinstance(w, dict):
        if "q4" in w:
            from ..ops.pallas.int4_matmul import int4_matmul

            return int4_matmul(x, w["q4"], w["s"])
        if x.ndim >= 2 and x.shape[-2] > 1 and _w8a8_prefill_enabled():
            return _w8a8_matmul(x, w["q"], w["s"])
        y = x @ w["q"].astype(x.dtype)
        return (y.astype(jnp.float32) * w["s"]).astype(x.dtype)
    return x @ w


def is_quantized(w) -> bool:
    return isinstance(w, dict) and ("q" in w or "q4" in w)


def quantize_stack(stack_params: Dict[str, Any], mode: str = "int8") -> Dict[str, Any]:
    """Quantize a transformer stack's matmul weights (norms stay f32).

    mode "int8": per-channel symmetric int8 (default serving mode).
    mode "int4": packed-nibble int4 — halves weight HBM CAPACITY vs int8
    (for memory-bound deployments) at ~63% of int8's decode throughput;
    dispatched to an XLA two-dot dequant by default, or the Pallas VMEM-
    dequant kernel with ``RHO_TTS_TPU_INT4_KERNEL=1`` (measured at parity;
    see ``ops.pallas.int4_matmul``).
    """
    if mode == "int4":
        from ..ops.pallas.int4_matmul import pack_int4

        quant = pack_int4
    elif mode == "int8":
        quant = quantize_weight
    else:
        raise ValueError(f"Unknown quantization mode: {mode!r}")
    blocks = dict(stack_params["blocks"])
    for name in QUANT_KEYS:
        if name in blocks and not is_quantized(blocks[name]):
            blocks[name] = jax.jit(quant)(blocks[name])
    return {**stack_params, "blocks": blocks}


def quantized_bytes(stack_params: Dict[str, Any]) -> int:
    """Total parameter bytes of a (possibly quantized) stack."""
    total = 0
    for leaf in jax.tree.leaves(stack_params):
        total += leaf.size * leaf.dtype.itemsize
    return total
