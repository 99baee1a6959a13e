"""Weight-only int4 matmul: packed nibbles dequantized in VMEM (Pallas).

Single-chip AR decode is HBM-bound on weight reads; int4 halves that
traffic versus int8. Two signed 4-bit values pack into one int8 byte along
the contraction (K) dimension — even K rows in the low nibble, odd K rows
in the high nibble — and the kernel unpacks them in VMEM right before the
MXU matmul, so HBM only ever sees K/2 bytes per output column.

The pure-jnp `dequant_matmul_reference` computes the identical result and
serves both as the CPU/test oracle and as the fallback when the Pallas
path is unavailable.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

BITS_MAX = 7  # symmetric int4: values in [-7, 7]


def pack_int4(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-output-channel symmetric int4: w (…, K, N) → {"q4": (…, K//2, N)
    int8, "s": (…, N) f32}. K must be even.

    Packing is HALF-SPLIT, not interleaved: byte i holds original row i in
    the low nibble and row i + K/2 in the high nibble. The kernel then
    never has to interleave sublanes (a slow relayout on TPU) — it just
    runs two matmuls against the two x halves.
    """
    wf = jnp.asarray(w, jnp.float32)
    k = wf.shape[-2]
    if k % 2:
        raise ValueError(f"int4 packing needs even K, got {k}")
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (…, 1, N)
    scale = jnp.maximum(absmax, 1e-8) / BITS_MAX
    q = jnp.clip(jnp.round(wf / scale), -BITS_MAX, BITS_MAX).astype(jnp.int32)
    lo = q[..., : k // 2, :] & 0xF  # (…, K//2, N)
    hi = q[..., k // 2 :, :] & 0xF
    b = (hi << 4) | lo  # 0..255
    packed = jnp.where(b > 127, b - 256, b).astype(jnp.int8)
    return {"q4": packed, "s": scale.squeeze(-2).astype(jnp.float32)}


def _unpack_nibbles(w8: jnp.ndarray) -> jnp.ndarray:
    """(…, K//2, N) int8 → (…, K, N) float32 of the signed nibble values
    (half-split layout: rows [0, K/2) from low nibbles, [K/2, K) high)."""
    w32 = w8.astype(jnp.int32)
    lo = (w32 << 28) >> 28  # sign-extended low nibble
    hi = w32 >> 4  # arithmetic shift: sign-extended high nibble
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)


def dequant_matmul_reference(x: jnp.ndarray, q4: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """XLA two-dot dequant matmul: x (B, K) @ dequant(q4, s) → (B, N).

    The half-split packing makes the dequant matmul two plain dots against
    the sign-extended nibble planes; also the test oracle. End-to-end A/B
    at 1.7B batch-5 decode (2026-08-17): two-dot 79.7× RT ≈ Pallas kernel
    80.0× RT, both behind int8's 126.8× — int4 is a CAPACITY mode (half
    the weight HBM of int8), not a throughput mode, and the two dots (each
    reading the packed planes once) give it no traffic advantage over
    int8's single dot.
    """
    kh = q4.shape[-2]
    w32 = q4.astype(jnp.int32)
    lo = ((w32 << 28) >> 28).astype(x.dtype)
    hi = (w32 >> 4).astype(x.dtype)
    y = x[..., :kh] @ lo + x[..., kh:] @ hi
    return (y.astype(jnp.float32) * s).astype(x.dtype)


def _kernel(xa_ref, xb_ref, q_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = q_ref[:].astype(jnp.int32)  # (Kb, Nb) packed bytes
    lo = ((w32 << 28) >> 28).astype(jnp.bfloat16)  # rows [0, K/2)
    hi = (w32 >> 4).astype(jnp.bfloat16)  # rows [K/2, K)
    acc_ref[:] += jnp.dot(
        xa_ref[:].astype(jnp.bfloat16), lo, preferred_element_type=jnp.float32
    )
    acc_ref[:] += jnp.dot(
        xb_ref[:].astype(jnp.bfloat16), hi, preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(1) - 1)
    def _finish():
        o_ref[:] = (acc_ref[:] * s_ref[0, :][None, :]).astype(o_ref.dtype)


try:  # Pallas import is deferred so CPU-only hosts can use the fallback
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # noqa: BLE001
    _PALLAS_OK = False


def _kernel_available() -> bool:
    # Measured at parity with the XLA two-dot at 1.7B decode shapes
    # (80.0× vs 79.7× RT end-to-end, 2026-08-17): the decode step is not
    # bounded by these matmuls at B=5, so the kernel's single-pass HBM
    # advantage doesn't materialize. Kept opt-in for large-batch
    # experimentation; the default serving path stays on XLA.
    if not _PALLAS_OK:
        return False
    if os.environ.get("RHO_TTS_TPU_INT4_KERNEL", "0") != "1":
        return False
    return jax.default_backend() not in ("cpu",)


@jax.jit
def _int4_matmul_call(x, q4, s):
    b, k = x.shape
    kh, n = q4.shape  # kh = K // 2 packed rows
    kb = min(256, kh)  # packed contraction block
    nb = min(512, n)
    grid = (n // nb, kh // kb)
    xa, xb = x[:, : k // 2], x[:, k // 2 :]
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, kb), lambda j, kk: (0, kk)),
            pl.BlockSpec((b, kb), lambda j, kk: (0, kk)),
            pl.BlockSpec((kb, nb), lambda j, kk: (kk, j)),
            pl.BlockSpec((1, nb), lambda j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((b, nb), lambda j, kk: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((b, nb), jnp.float32)],
    )(xa, xb, q4, s.reshape(1, -1))


def int4_matmul(x: jnp.ndarray, q4: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """x (…, K) @ int4-packed weights (K//2, N) → (…, N).

    Uses the VMEM-dequant Pallas kernel on TPU when shapes block evenly;
    otherwise the jnp fallback (identical math).
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    kh, n = q4.shape
    x2 = x.reshape(-1, k)
    kb = min(256, kh)
    nb = min(512, n)
    if _kernel_available() and kh % kb == 0 and n % nb == 0 and kb % 32 == 0:
        y = _int4_matmul_call(x2, q4, s)
    else:
        y = dequant_matmul_reference(x2, q4, s)
    return y.reshape(*lead, n)
