"""Fused W8A8 MLP megakernel for the FROZEN whisper trunk.

The trunk MLP (fc1 -> exact-erf GELU -> fc2, d=768, hidden=3072) is the
biggest fusion class in the int8 step's stall budget (docs/PERF.md
round-4: 12 x 0.69 ms fwd-mlp fusions vs a ~0.29 ms int8 compute floor
per layer — the (B·T, 3072) intermediate makes three HBM round trips:
fc1 result, gelu/quant, fc2 read, plus the same again under dots_nb
remat and the backward dgrads).

This kernel runs the whole MLP per row block with BOTH int8 weight
matrices resident in VMEM (768x3072 int8 = 2.25 MB each) and the hidden
activations never leaving VMEM. Quantization matches ops/int8_linear.py
exactly: dynamic symmetric per-row activation int8, per-output-channel
weight scales, int32 MXU accumulation, straight-through backward. The
trunk is frozen, so the backward emits ONLY dx (no weight grads, no
saved hidden activations — x is the single residual):

    dx = q8[(q8[dy * s2] @ w2q) * gelu'(h) * s1] @ w1q

with h = fc1(x) recomputed in-VMEM. GELU is the exact-erf form; Mosaic
has no erf/erfc lowering, so erf uses the Abramowitz-Stegun 7.1.26
rational approximation (max abs error 1.5e-7 — three orders below bf16
resolution; the unfused path computes GELU on a bf16 tensor).

Dispatch: models/whisper.mlp_fwd when both fc1 and fc2 carry quantized
weights ({"w_q","w_s"}) and the shape/env allow (`supports`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec

TR = 256      # fwd row block: f32 (TR, H) hidden = 3 MB at H=3072
TR_BWD = 128  # bwd stack: dgelu(h), dg and two int32 accumulators
# (h is consumed inline; TR=256 measured 23.9 MB scoped vmem > 16 MB)


def use_fused() -> bool:
    env = os.environ.get("AGACS_INT8_MLP", "1")
    if env in ("0", "false"):
        return False
    if env == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def interpret_requested() -> bool:
    return os.environ.get("AGACS_INT8_MLP") == "interpret"


def supports(d: int, h: int) -> bool:
    if not use_fused():
        return False
    if d % 128 or h % 128:
        return False
    # both int8 weights + f32 hidden block + temps must fit VMEM
    return 2 * d * h + (TR * h) * 4 * 2 + TR * d * 8 <= 13 * 1024 * 1024


def _erf(x):
    """Abramowitz-Stegun 7.1.26 (f32, |err| < 1.5e-7); odd in x."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu(h):
    return 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))


def _dgelu(h):
    # d/dh [h·Φ(h)] = Φ(h) + h·φ(h)
    phi_cdf = 0.5 * (1.0 + _erf(h * (2.0 ** -0.5)))
    pdf = jnp.exp(-0.5 * h * h) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    return phi_cdf + h * pdf


def _rowq(xf):
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                    1e-12) / 127.0
    q = jnp.round(xf / s).astype(jnp.int8)
    return q, s


def _hidden(x_ref, w1_ref, s1_ref, b1_ref):
    xq, sx = _rowq(x_ref[:].astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sx * s1_ref[0, :][None, :]
            + b1_ref[0, :][None, :])


def _fwd_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                y_ref):
    h = _hidden(x_ref, w1_ref, s1_ref, b1_ref)       # (TR, H) f32
    g = _gelu(h)
    gq, sg = _rowq(g)
    acc = jax.lax.dot_general(
        gq, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sg * s2_ref[0, :][None, :] \
        + b2_ref[0, :][None, :]
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, dy_ref,
                dx_ref):
    # dgelu(h) directly (h itself never lives past this expression —
    # keeps the Mosaic stack small enough for TR_BWD=128)
    dgh = _dgelu(_hidden(x_ref, w1_ref, s1_ref, b1_ref))
    dyf = dy_ref[:].astype(jnp.float32) * s2_ref[0, :][None, :]
    dyq, sdy = _rowq(dyf)
    accd = jax.lax.dot_general(
        dyq, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (TR, H)
    dg = accd.astype(jnp.float32) * sdy * dgh
    dg = dg * s1_ref[0, :][None, :]                  # fold fc1 scales
    dgq, sdg = _rowq(dg)
    accx = jax.lax.dot_general(
        dgq, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (TR, D)
    dx_ref[:] = (accx.astype(jnp.float32) * sdg).astype(dx_ref.dtype)


def _row2(a):
    return a.reshape(1, -1).astype(jnp.float32)


def _run(kern, n_in_rows, x, consts, out_dtype, interpret, tr,
         vmem_limit=None):
    """Shared pallas_call: row-blocked x (+trailing row-blocked arrays in
    `n_in_rows`), whole-array weight/scale constants."""
    n, d = x.shape[0], x.shape[1]
    nr = -(-n // tr)
    xs = [jnp.pad(a, ((0, nr * tr - n), (0, 0))) for a in [x] + n_in_rows]

    def whole(a):
        return pl.BlockSpec(a.shape, lambda r: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    row_specs = [pl.BlockSpec((tr, a.shape[1]), lambda r: (r, 0),
                              memory_space=pltpu.VMEM) for a in xs]
    out = pl.pallas_call(
        kern,
        grid=(nr,),
        in_specs=[row_specs[0]] + [whole(c) for c in consts]
        + row_specs[1:],
        out_specs=pl.BlockSpec((tr, d), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nr * tr, d), out_dtype),
        interpret=interpret,
        compiler_params=None if vmem_limit is None else pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
    )(xs[0], *consts, *xs[1:])
    return out[:n]


def _fwd_pallas(x, p1, p2, interpret):
    n = x.shape[0]
    consts = (p1["w_q"], _row2(p1["w_s"]), _row2(p1["b"]),
              p2["w_q"], _row2(p2["w_s"]), _row2(p2["b"]))
    return _run(_fwd_kernel, [], x, list(consts), x.dtype, interpret, TR)


def _bwd_pallas(x, p1, p2, dy, interpret):
    consts = (p1["w_q"], _row2(p1["w_s"]), _row2(p1["b"]),
              p2["w_q"], _row2(p2["w_s"]))
    # the bwd stack peaks at ~17 MB (Mosaic keeps h live through dgelu);
    # raise this kernel's scoped-vmem cap instead of shrinking TR further
    return _run(_bwd_kernel, [dy], x, list(consts), x.dtype, interpret,
                TR_BWD, vmem_limit=24 * 1024 * 1024)


def _ref(x, p1, p2):
    """Unfused reference (the int8_linear composition this replaces)."""
    from agacs_tpu.ops.int8_linear import int8_linear

    h = int8_linear(x, p1)
    g = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    return int8_linear(g, p2)


def _batch_only(sharding, mesh, ndim=2):
    if not isinstance(sharding, NamedSharding):
        return NamedSharding(mesh, PartitionSpec(*([None] * ndim)))
    spec = tuple(sharding.spec) + (None,) * (ndim - len(sharding.spec))
    return NamedSharding(sharding.mesh,
                         PartitionSpec(spec[0], *([None] * (ndim - 1))))


def _make_cp(impl, n_row_args, rule):
    """Rows batch-sharded; weights/scales replicated; output row-sharded.
    No cross-shard reductions exist (no weight grads)."""
    f = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        return _batch_only(arg_shapes[0].sharding, mesh)

    def prop(mesh, user_shape):
        return _batch_only(user_shape.sharding, mesh)

    def partition(mesh, arg_shapes, result_shape):
        b_sh = _batch_only(arg_shapes[0].sharding, mesh)

        def arg_sh(i, a):
            nd = len(a.shape)
            if i == 0 or i >= len(arg_shapes) - n_row_args + 1:
                return NamedSharding(
                    mesh, PartitionSpec(b_sh.spec[0], *([None] * (nd - 1)))
                )
            return NamedSharding(mesh, PartitionSpec(*([None] * nd)))

        args_sh = tuple(arg_sh(i, a) for i, a in enumerate(arg_shapes))
        return mesh, impl, b_sh, args_sh

    f.def_partition(
        partition=partition,
        propagate_user_sharding=prop,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=("d", "h"),
    )
    return f


@functools.lru_cache(maxsize=None)
def _fwd_cp(interpret):
    def impl(x, w1q, w1s, b1, w2q, w2s, b2):
        p1 = {"w_q": w1q, "w_s": w1s, "b": b1}
        p2 = {"w_q": w2q, "w_s": w2s, "b": b2}
        return _fwd_pallas(x, p1, p2, interpret)

    return _make_cp(
        impl, 1, "n d, d h, h, h, h d, d, d -> n d")


@functools.lru_cache(maxsize=None)
def _bwd_cp(interpret):
    def impl(x, w1q, w1s, b1, w2q, w2s, dy):
        p1 = {"w_q": w1q, "w_s": w1s, "b": b1}
        p2 = {"w_q": w2q, "w_s": w2s}
        return _bwd_pallas(x, p1, p2, dy, interpret)

    return _make_cp(
        impl, 2, "n d, d h, h, h, h d, d, n d -> n d")


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _mlp_core(x, w1q, w1s, b1, w2q, w2s, b2, interpret):
    return _fwd_cp(interpret)(x, w1q, w1s, b1, w2q, w2s, b2)


def _vjp_fwd(x, w1q, w1s, b1, w2q, w2s, b2, interpret):
    y = _mlp_core(x, w1q, w1s, b1, w2q, w2s, b2, interpret)
    return y, (x, w1q, w1s, b1, w2q, w2s)


def _vjp_bwd(interpret, res, dy):
    import numpy as np
    from jax import dtypes

    x, w1q, w1s, b1, w2q, w2s = res
    dx = _bwd_cp(interpret)(x, w1q, w1s, b1, w2q, w2s, dy)
    f0 = lambda a: np.zeros(a.shape, dtypes.float0)
    # b2 cotangent shares w2s's shape (both per-fc2-out-channel)
    return (dx, f0(w1q), jnp.zeros_like(w1s), jnp.zeros_like(b1),
            f0(w2q), jnp.zeros_like(w2s), jnp.zeros_like(w2s))


_mlp_core.defvjp(_vjp_fwd, _vjp_bwd)


def int8_mlp(x: jax.Array, p1, p2) -> jax.Array:
    """fc2(gelu(fc1(x))) on the fused int8 path. x: (..., d)."""
    shape = x.shape
    y = _mlp_core(
        x.reshape(-1, shape[-1]), p1["w_q"], p1["w_s"],
        p1["b"].astype(jnp.float32), p2["w_q"], p2["w_s"],
        p2["b"].astype(jnp.float32), interpret_requested(),
    )
    return checkpoint_name(y.reshape(shape), "int8_linear_out")
