"""W8A8 int8 linear for the FROZEN trunk (QLoRA-style PET training).

The adapter/PE/side-ladder freeze presets (reference
`espnet2/tasks/abs_task.py:1163-1222`) never update the Whisper trunk, so
its projection weights can be quantized ONCE to per-output-channel
symmetric int8 and the trunk matmuls run on the MXU's int8 path (2x the
bf16 peak on v5e) with int8 HBM weight reads (2x smaller than bf16).
Measured end-to-end on the chip: whisper-small adapter train step at
16x15 s drops 91.1 -> 86.1 ms (+5.8% throughput, analytic MFU 0.489 ->
0.517 in bf16-peak convention; docs/PERF.md round-3 int8-trunk section).

Scheme (SwitchBack/AQT-style W8A8):
  * weights: symmetric per-output-channel int8, quantized once at
    train-state build (`trainer.quantize_frozen_linears`), stored int8 in
    HBM (4x smaller reads than f32, 2x than bf16);
  * activations: dynamic symmetric per-row (per-token) int8 at each use;
  * accumulate int32 on the MXU, dequantize in the epilogue
    (acc * row_scale * channel_scale), cast to the compute dtype;
  * backward (the trunk is frozen, so only dx is ever needed — no weight
    grads, hence NO saved activations): dx = (dy * w_scale) @ w_q^T, with
    dy dynamically row-quantized to int8 by default (`BWD_INT8 = True`;
    set False for a bf16-dequantized dgrad when gradient quantization is
    a concern). Cotangents for the int8/scale operands are float0/zero —
    they are parameters, masked out by the freeze preset anyway.

The custom VJP makes the op opaque to `jax.checkpoint` policies (like the
Pallas kernels in ops/flash_train.py), so the output carries
`checkpoint_name("int8_linear_out")` and the `dots_nb` remat policy saves
it by name — the saved residual is the bf16 result, exactly like the bf16
trunk saves its dot outputs, never the int32 accumulator.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import dtypes
from jax.ad_checkpoint import checkpoint_name

# Backward dgrad mode: True = row-quantize dy and run dx on the int8 MXU
# path as well; False = dequantize w_q to bf16 for the dgrad matmul.
# Trace-time constant — set before building the train step.
BWD_INT8 = True


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a linear weight.

    `w` is (..., d_in, d_out) — optionally stacked over a leading layer
    axis. Scale is per (..., d_out): max|w| over d_in / 127.
    Returns (w_q int8 same shape, w_s float32 (..., d_out)).
    """
    wf = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2), 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / s[..., None, :]), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def dequantize_weight(w_q: jax.Array, w_s: jax.Array, dtype=jnp.float32) -> jax.Array:
    return (w_q.astype(jnp.float32) * w_s[..., None, :]).astype(dtype)


def _row_quant_xla(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    q = jnp.round(xf / s).astype(jnp.int8)  # |xf|/s <= 127 by construction
    return q, s


def _row_quant(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-row int8: x (..., k) -> (int8, f32 (..., 1)).

    Kept as plain jnp ON PURPOSE: a fused single-pass Pallas version was
    measured SLOWER end-to-end (85.2 -> 107.1 ms on the 16x15 s int8
    step, round 4) — XLA already fuses the abs-reduce and round/convert
    into the surrounding producer fusions, and an opaque custom call
    breaks those fusions (docs/PERF.md round-4 negative results)."""
    return _row_quant_xla(x)


def _fwd_core(x: jax.Array, w_q: jax.Array, w_s: jax.Array) -> jax.Array:
    xq, sx = _row_quant(x)
    acc = jax.lax.dot_general(
        xq, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sx * w_s).astype(x.dtype)


@jax.custom_vjp
def int8_matmul(x: jax.Array, w_q: jax.Array, w_s: jax.Array) -> jax.Array:
    """x @ dequant(w_q, w_s) computed on the int8 MXU path.

    x: (..., d_in) float; w_q: (d_in, d_out) int8; w_s: (d_out,) f32.
    """
    return _fwd_core(x, w_q, w_s)


def _int8_fwd(x, w_q, w_s):
    # Residuals are the (already-live) weight params plus a zero-size
    # dtype witness for x — the frozen trunk has no weight grads, so no
    # activation is saved.
    return _fwd_core(x, w_q, w_s), (w_q, w_s, jnp.zeros((0,), x.dtype))


def _int8_bwd(res, g):
    w_q, w_s, x_witness = res
    x_dtype = x_witness.dtype
    gf = g.astype(jnp.float32) * w_s  # fold the channel scale into dy
    if BWD_INT8:
        gq, sg = _row_quant(gf)
        acc = jax.lax.dot_general(
            gq, w_q, (((g.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        dx = (acc.astype(jnp.float32) * sg).astype(x_dtype)
    else:
        wt = w_q.astype(jnp.bfloat16)
        dx = jax.lax.dot_general(
            gf.astype(jnp.bfloat16), wt, (((g.ndim - 1,), (1,)), ((), ())),
        ).astype(x_dtype)
    # int8 primal -> float0 cotangent; f32 scale -> symbolic zero.
    d_wq = np.zeros(w_q.shape, dtypes.float0)
    d_ws = jnp.zeros_like(w_s)
    return dx, d_wq, d_ws


int8_matmul.defvjp(_int8_fwd, _int8_bwd)


def int8_linear(x: jax.Array, p) -> jax.Array:
    """Drop-in for models' `linear()` when p holds {"w_q", "w_s"[, "b"]}.

    Thin-row inputs (serving decode steps: B·beam rows) go through the
    weight-only W8A16 kernel instead — the W8A8 row quant is VPU-serial
    and only pays off at training row counts (ops/int8_serve.py;
    docs/PERF.md round-3/5 serving forensics)."""
    from agacs_tpu.ops import int8_serve

    if (p["w_q"].ndim == 2 and int8_serve.thin_rows(x)
            and int8_serve.fits(p["w_q"])):
        y = int8_serve.w8a16_matmul(
            x, p["w_q"], p["w_s"], int8_serve.interpret_requested()
        )
    else:
        y = checkpoint_name(
            int8_matmul(x, p["w_q"], p["w_s"]), "int8_linear_out"
        )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y
