"""Weight-only int8 (W8A16) matmul for thin-row SERVING shapes.

Single-utterance decode is weight-bandwidth-bound: at B=1 beam-5 every
step streams ~278 MB of bf16 projections (incl. the 80 MB logits head)
over 1-5 activation rows — ~0.34 ms/step of pure HBM reads, ~70% of the
48 ms/15 s utterance (docs/PERF.md round-5 serving forensics).

Round 3 measured the TRAINING W8A8 path for serving and rejected it at
beam shapes: dynamic per-row activation quantization adds VPU-serial
time that thin rows cannot amortize (docs/PERF.md round-3 int8-serving
section). This kernel keeps the weights int8 in HBM (halving the
bandwidth-bound stream) but does the math in bf16 — the int8 tile is
dequantized in VMEM right before the dot, activations untouched:

    y = x · (w_q · w_s)          x: (R<=32, K) bf16, w_q: (K, N) int8

`int8_linear` (ops/int8_linear.py) dispatches here automatically when
the row count is serving-thin, so a quantized checkpoint decodes W8A16
per-token and W8A8 when teacher-forcing batches. `quantize_for_serving`
quantizes a bf16/f32 checkpoint explicitly for serving — every trunk
linear plus the token-embedding/logits head (stored twice: row-major
int8 for the embedding lookup, column-major for the logits matmul, so
neither pays a per-step transpose).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_ROWS = 32  # above this the W8A8 path's row quant amortizes (round 3)
_NT = 512


def use_w8a16() -> bool:
    """Default OFF: measured end-to-end (docs/PERF.md round-5 serving
    forensics) the thin-row W8A16 path LOSES at every serving shape —
    B=1 beam-5 46.0 -> 87.1 ms/utt with all linears routed here, and
    even the single-launch logits head alone costs +4 ms/utt. XLA's
    dense bf16 matmuls already overlap their weight DMA with neighbors;
    per-pallas-launch overhead at ~0.46 ms/step granularity exceeds the
    halved bytes. Kept opt-in (AGACS_W8A16=1) for future hardware where
    the tradeoff may flip."""
    env = os.environ.get("AGACS_W8A16", "0")
    if env in ("0", "false", ""):
        return False
    if env == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def interpret_requested() -> bool:
    return os.environ.get("AGACS_W8A16") == "interpret"


def _kernel(x_ref, w_ref, s_ref, o_ref):
    wt = (w_ref[:].astype(jnp.float32) * s_ref[0, :][None, :]).astype(
        x_ref.dtype
    )
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], wt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _w8a16_2d(x, w_q, w_s, interpret):
    r, k = x.shape
    n = w_q.shape[1]
    rp = max(-(-r // 8) * 8, 8)
    nt = _NT if n % _NT == 0 else n  # logits head pads outside
    xp = jnp.pad(x, ((0, rp - r), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        grid=(n // nt,),
        in_specs=[
            pl.BlockSpec((rp, k), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, nt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rp, nt), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, n), x.dtype),
        interpret=interpret,
    )(xp, w_q, w_s.reshape(1, -1).astype(jnp.float32))
    return out[:r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def w8a16_matmul(x, w_q, w_s, interpret=False):
    """x @ (w_q * w_s) with int8 weight reads and bf16 math.

    x: (..., K) float; w_q: (K, N) int8; w_s: (N,) f32. N must be a
    multiple of 512 or used whole."""
    shape = x.shape
    y = _w8a16_2d(x.reshape(-1, shape[-1]), w_q, w_s, interpret)
    return y.reshape(shape[:-1] + (w_q.shape[1],))


def _vjp_fwd(x, w_q, w_s, interpret):
    return w8a16_matmul(x, w_q, w_s, interpret), (x, w_q, w_s)


def _vjp_bwd(interpret, res, g):
    import numpy as np
    from jax import dtypes

    x, w_q, w_s = res
    gf = g.astype(jnp.float32) * w_s
    dx = jax.lax.dot_general(
        gf.astype(x.dtype), w_q.astype(x.dtype),
        (((g.ndim - 1,), (1,)), ((), ())),
    ).astype(x.dtype)
    return dx, np.zeros(w_q.shape, dtypes.float0), jnp.zeros_like(w_s)


w8a16_matmul.defvjp(_vjp_fwd, _vjp_bwd)


def thin_rows(x) -> bool:
    import numpy as np

    rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    return rows <= MAX_ROWS and use_w8a16()


def fits(w_q) -> bool:
    """Tileable: N is a 512-multiple, or the whole int8 weight fits one
    VMEM block."""
    n = w_q.shape[-1]
    return n % _NT == 0 or w_q.size <= 8 * 1024 * 1024


def quantize_for_serving(params, pad_vocab_to: int = _NT):
    """Serving-side int8 quantization of a whisper checkpoint: every
    linear {"w"} dict (per-output-channel symmetric, same scheme as
    training's quantize_frozen_linears) PLUS the token-embedding/logits
    head:

      token_emb_q (V, d) int8 + token_emb_s (V,)  — embedding lookup
      logits_w_q (d, Vp) int8 + logits_w_s (Vp,)  — the logits matmul,
        column-major copy, vocab zero-padded to a lane multiple

    models/whisper.whisper_decode_step picks these up by key presence.
    Lossy (documented): decoded tokens can differ from the bf16
    checkpoint; token parity between the kernel and XLA paths ON the
    quantized params is exact and tested.
    """
    from agacs_tpu.ops.int8_linear import quantize_weight
    from agacs_tpu.train.trainer import QUANT_LINEAR_KEYS

    def rec(p, name):
        if isinstance(p, dict):
            if (
                name in QUANT_LINEAR_KEYS
                and "w" in p
                and hasattr(p["w"], "ndim")
                and p["w"].ndim >= 2
                and jnp.issubdtype(p["w"].dtype, jnp.floating)
            ):
                w_q, w_s = quantize_weight(p["w"])
                out = {"w_q": w_q, "w_s": w_s}
                if "b" in p:
                    out["b"] = p["b"]
                return out
            return {k: rec(v, k) for k, v in p.items()}
        return p

    out = rec(params, "")
    emb = jnp.asarray(params["decoder"]["token_emb"], jnp.float32)
    v, d = emb.shape
    # per-vocab-row scale serves both layouts
    s = jnp.maximum(jnp.max(jnp.abs(emb), axis=1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(emb / s[:, None]), -127, 127).astype(jnp.int8)
    vp = -(-v // pad_vocab_to) * pad_vocab_to
    dec = dict(out["decoder"])
    dec["token_emb_q"] = q
    dec["token_emb_s"] = s.astype(jnp.float32)
    dec["logits_w_q"] = jnp.pad(q.T, ((0, 0), (0, vp - v)))
    dec["logits_w_s"] = jnp.pad(s.astype(jnp.float32), (0, vp - v))
    out["decoder"] = dec
    return out
