"""w8a8 prefill matmul with a fused rescale epilogue (Pallas).

Hypothesis this kernel tested: the XLA w8a8 path materializes every
dot's int32 output to HBM and rescales it in a separate pass (the 1.7B
w8a8 matmul chain measured 179 TOPS ≈ 45% of the chip's int8 rate), so
keeping the int32 accumulator in VMEM with the (row activation scale ×
per-output-channel weight scale) rescale fused into the epilogue should
close the gap. MEASURED NEGATIVE — see :func:`kernel_available`: XLA
already fuses that epilogue, and the kernel loses ~15-20% end-to-end,
so it stays opt-in. The 45%-of-peak chain rate is instead bounded by
the quantize VPU passes serialized on the inter-layer dependency chain
plus MXU ramp on the (256-row, K-deep) tiles.

Activation quantization (per-token symmetric absmax → int8) stays an
XLA op outside the kernel: its int8 output is small (half the bf16
read), and quantizing inside the kernel would redo the row-max once per
N-block. The math matches ``quantization._w8a8_matmul`` exactly — same
round-half-even quantize, exact int32 dot, same f32 rescale order — so
the einsum path remains the oracle (tests run the kernel with
``interpret=True`` on CPU).

Reference counterpart: the CUDA/cuBLAS int8 GEMM epilogues the
reference's torch stack gets from its upstream libraries; here the
epilogue is ours (SURVEY.md §2.2, "TPU-native equivalents").
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

try:  # deferred so CPU-only hosts can import the module
    from jax.experimental import pallas as pl

    _PALLAS_OK = True
except Exception:  # noqa: BLE001
    _PALLAS_OK = False


def _kernel(xq_ref, sx_ref, q_ref, ws_ref, o_ref):
    acc = jax.lax.dot_general(
        xq_ref[...],
        q_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (
        acc.astype(jnp.float32) * sx_ref[...] * ws_ref[0, :][None, :]
    ).astype(o_ref.dtype)


def kernel_available() -> bool:
    """Opt-in (``RHO_TTS_TPU_W8A8_KERNEL=1``) after a measured negative.

    End-to-end A/B at the 1.7B b8×512 prefill (2026-08-21, two rounds):
    kernel 37.8k/36.2k tok/s vs XLA 45.5k/39.4k — XLA's own lowering
    already fuses the rescale epilogue into the dot (the premise that
    the int32 accumulator round-trips HBM did not hold up), and the
    kernel's per-N-block re-reads of the activation tile plus the
    hardened fusion boundary around ``pallas_call`` cost ~15-20%. Kept
    because the in-VMEM epilogue shape is the right starting point for
    fusing the NEXT op (silu·mul) into the matmul, which XLA cannot do
    across a quantize boundary.
    """
    if not _PALLAS_OK:
        return False
    if os.environ.get("RHO_TTS_TPU_W8A8_KERNEL", "0") != "1":
        return False
    return jax.default_backend() not in ("cpu",)


def w8a8_matmul_kernel(
    xq: jnp.ndarray,  # (M, K) int8 — per-row quantized activations
    sx: jnp.ndarray,  # (M, 1) f32 — per-row activation scales
    q: jnp.ndarray,  # (K, N) int8 — per-channel quantized weights
    ws: jnp.ndarray,  # (N,) f32 — per-channel weight scales
    out_dtype,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8 dot with fused f32 rescale → (M, N) in ``out_dtype``.

    The whole K axis lives in VMEM per program (K ≤ ~8k at these model
    widths), so the grid is (M/BM, N/BN) with no contraction carry.
    """
    m, k = xq.shape
    n = q.shape[1]
    bm = min(256, m)
    bn = min(512, n)
    return pl.pallas_call(
        _kernel,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )(xq, sx, q, ws.reshape(1, -1))


def shapes_ok(m: int, k: int, n: int) -> bool:
    """Kernel preconditions: blocks must tile evenly and K fit VMEM."""
    bm = min(256, m)
    bn = min(512, n)
    return (
        m % bm == 0
        and bm % 8 == 0  # sublane-aligned M tile
        and n % bn == 0
        and k % 128 == 0
        and k * (bm + bn) <= 8 * 1024 * 1024  # int8 bytes in VMEM
    )
