"""Streaming log-sum-exp over a large vocabulary projection.

The conformer CTC head materializes (B, T, V) f32 logits — 1.55 GB at
the 16x15 s bench shape with the whisper vocab — three-plus times per
step (forward, optax's log_softmax, backward dlogits): measured 21 ms of
the 67 ms conformer step (docs/PERF.md round-5). The transducer joint is
the same pattern cubed: (B, T, U+1, V). But the LOSSES only ever read
per-row `logsumexp` plus a handful of gathered label columns.

This kernel computes lse(x·W + b) row-block by V-tile with the (rows, V)
logits living only in VMEM. The label/blank gathers stay OUTSIDE in XLA:
z[label] = x · W[:, label] is a tiny exact matmul against pre-gathered
columns (W_g is (d, U+1)-sized), and its gradients (column scatter-adds)
fall out of take/einsum autodiff — so the custom VJP here only covers
the lse path:

    d lse/dz = softmax(z)  =>  dx = (g·softmax) Wᵀ,  dW = xᵀ(g·softmax),
                               db = Σ_rows g·softmax

The backward is two streaming passes over recomputed z (the classic
dx-wants-V-inner / dW-wants-rows-inner grid conflict; residual = lse, so
softmax recomputation is one matmul per pass):
  pass 1 (rows outer): dx accumulated in VMEM scratch across V-tiles
  pass 2 (V outer):    dW/db accumulated in VMEM scratch across row-blocks

SPMD: rows are batch-sharded; W/b replicated. The per-shard dW/db
partials are `psum`ed over the rows axis INSIDE the partition lower fn
(validated on the virtual mesh; shardy reduction_factors declare the
same contraction).

Used by train/losses.ctc_loss_streaming (conformer/whisper CTC heads)
and models/transducer_asr (fused joint path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec

TR = 512            # row block
NEG = -1e30         # padded-column bias


def _vt(k: int, v: int) -> int:
    """V-tile: largest of {2048, 1024, 512} whose bwd pass-2 footprint
    fits VMEM: f32 z block, f32 dW scratch, double-buffered bf16 w-in
    AND f32 dW-out blocks, double-buffered x, db scratch — measured
    against the 16 MB scoped limit with ~2 MB slack."""
    for vt in (2048, 1024, 512):
        z = TR * vt * 4
        dw_scratch = k * vt * 4
        dw_out = 2 * k * vt * 4
        w_in = 2 * k * vt * 2
        x_in = 2 * TR * k * 2
        db = 8 * vt * 4 + 2 * vt * 4
        if z + dw_scratch + dw_out + w_in + x_in + db <= 13 * 1024 * 1024:
            return vt
    return 512


def use_streaming() -> bool:
    env = os.environ.get("AGACS_VOCAB_LSE", "1")
    if env in ("0", "false"):
        return False
    if env == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def interpret_requested() -> bool:
    return os.environ.get("AGACS_VOCAB_LSE") == "interpret"


def _pad_rows(x, nr_pad):
    return jnp.pad(x, ((0, nr_pad - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


# ---------------------------------------------------------------- kernels


def _fwd_kernel(x_ref, w_ref, b_ref, m_ref, s_ref):
    z = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[0, :][None, :]
    m = jnp.max(z, axis=1, keepdims=True)          # (TR, 1)
    s = jnp.sum(jnp.exp(z - m), axis=1, keepdims=True)
    m_ref[0] = m
    s_ref[0] = s


def _dx_kernel(nv: int, x_ref, w_ref, b_ref, lse_ref, g_ref, dx_ref, acc):
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    z = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[0, :][None, :]
    dz = jnp.exp(z - lse_ref[:]) * g_ref[:]        # (TR, VT) f32
    acc[...] += jax.lax.dot_general(
        dz.astype(w_ref.dtype), w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(v == nv - 1)
    def _():
        dx_ref[...] = acc[...].astype(dx_ref.dtype)


def _dw_kernel(nr: int, x_ref, w_ref, b_ref, lse_ref, g_ref,
               dw_ref, db_ref, dw_acc, db_acc):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)
        db_acc[...] = jnp.zeros_like(db_acc)

    z = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[0, :][None, :]
    dz = jnp.exp(z - lse_ref[:]) * g_ref[:]
    dw_acc[...] += jax.lax.dot_general(
        x_ref[:], dz.astype(x_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_acc[0:1] += jnp.sum(dz, axis=0, keepdims=True)

    @pl.when(r == nr - 1)
    def _():
        dw_ref[...] = dw_acc[...]
        db_ref[...] = db_acc[0:1]


# ---------------------------------------------------------------- wrappers


def _prep(x, w, b):
    n, k = x.shape
    v = w.shape[1]
    vt = _vt(k, v)
    nr = -(-n // TR)
    nv = -(-v // vt)
    xp = _pad_rows(x, nr * TR)
    wp = jnp.pad(w, ((0, 0), (0, nv * vt - v)))
    bp = jnp.pad(b.astype(jnp.float32), (0, nv * vt - v),
                 constant_values=NEG)[None, :]
    return xp, wp, bp, vt, nr, nv


def _fwd_pallas(x, w, b, interpret=False):
    n, k = x.shape
    xp, wp, bp, vt, nr, nv = _prep(x, w, b)
    m_part, s_part = pl.pallas_call(
        _fwd_kernel,
        grid=(nv, nr),
        in_specs=[
            pl.BlockSpec((TR, k), lambda v_, r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, vt), lambda v_, r: (0, v_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vt), lambda v_, r: (0, v_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TR, 1), lambda v_, r: (v_, r, 0),
                         memory_space=pltpu.VMEM),
        ] * 2,
        out_shape=[jax.ShapeDtypeStruct((nv, nr * TR, 1), jnp.float32)] * 2,
        interpret=interpret,
    )(xp, wp, bp)
    m_part = m_part[..., 0]                       # (nv, N_pad)
    s_part = s_part[..., 0]
    m_glob = jnp.max(m_part, axis=0)              # (N_pad,)
    lse = m_glob + jnp.log(
        jnp.sum(jnp.exp(m_part - m_glob) * s_part, axis=0)
    )
    return lse[:n]


def _bwd_pallas(x, w, b, lse, glse, interpret=False):
    n, k = x.shape
    v = w.shape[1]
    xp, wp, bp, vt, nr, nv = _prep(x, w, b)
    lse_p = _pad_rows(lse[:, None], nr * TR)
    g_p = _pad_rows(glse[:, None], nr * TR)       # zero pad => dz=0 rows

    row_block = pl.BlockSpec((TR, k), lambda r, v_: (r, 0),
                             memory_space=pltpu.VMEM)
    col1 = pl.BlockSpec((TR, 1), lambda r, v_: (r, 0),
                        memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_dx_kernel, nv),
        grid=(nr, nv),
        in_specs=[
            row_block,
            pl.BlockSpec((k, vt), lambda r, v_: (0, v_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vt), lambda r, v_: (0, v_),
                         memory_space=pltpu.VMEM),
            col1, col1,
        ],
        out_specs=row_block,
        out_shape=jax.ShapeDtypeStruct((nr * TR, k), x.dtype),
        scratch_shapes=[pltpu.VMEM((TR, k), jnp.float32)],
        interpret=interpret,
    )(xp, wp, bp, lse_p, g_p)

    dw, db = pl.pallas_call(
        functools.partial(_dw_kernel, nr),
        grid=(nv, nr),
        in_specs=[
            pl.BlockSpec((TR, k), lambda v_, r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, vt), lambda v_, r: (0, v_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vt), lambda v_, r: (0, v_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda v_, r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda v_, r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, vt), lambda v_, r: (0, v_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vt), lambda v_, r: (0, v_),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, nv * vt), jnp.float32),
            jax.ShapeDtypeStruct((1, nv * vt), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, vt), jnp.float32),
            pltpu.VMEM((8, vt), jnp.float32),
        ],
        interpret=interpret,
    )(xp, wp, bp, lse_p, g_p)
    return dx[:n], dw[:, :v].astype(w.dtype), db[0, :v]


def _einsum_ref(x, w, b):
    z = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b.astype(jnp.float32)[None, :]
    return jax.nn.logsumexp(z, axis=-1)


# ----------------------------------------------------- custom VJP + SPMD


def _batch_axis(sharding, mesh):
    if isinstance(sharding, NamedSharding) and sharding.spec:
        return sharding.spec[0]
    return None


def _row_sh(mesh, axis, ndim):
    return NamedSharding(mesh, PartitionSpec(axis, *([None] * (ndim - 1))))


def _repl(mesh, ndim):
    return NamedSharding(mesh, PartitionSpec(*([None] * ndim)))


@functools.lru_cache(maxsize=None)
def _fwd_cp(interpret):
    def impl(x, w, b):
        if use_streaming() or interpret:
            return _fwd_pallas(x, w, b, interpret=interpret)
        return _einsum_ref(x, w, b)

    f = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        return _row_sh(mesh, _batch_axis(arg_shapes[0].sharding, mesh), 1)

    def prop(mesh, user_shape):
        return _row_sh(mesh, _batch_axis(user_shape.sharding, mesh), 1)

    def partition(mesh, arg_shapes, result_shape):
        axis = _batch_axis(arg_shapes[0].sharding, mesh)
        args_sh = (_row_sh(mesh, axis, 2), _repl(mesh, 2), _repl(mesh, 1))
        return mesh, impl, _row_sh(mesh, axis, 1), args_sh

    f.def_partition(
        partition=partition,
        propagate_user_sharding=prop,
        infer_sharding_from_operands=infer,
        sharding_rule="n k, k v, v -> n",
        need_replication_factors=("k", "v"),
    )
    return f


@functools.lru_cache(maxsize=None)
def _bwd_cp(interpret):
    def impl(x, w, b, lse, glse):
        if use_streaming() or interpret:
            return _bwd_pallas(x, w, b, lse, glse, interpret=interpret)
        _, vjp = jax.vjp(lambda x_, w_, b_: _einsum_ref(x_, w_, b_), x, w, b)
        return vjp(glse)

    f = custom_partitioning(impl)

    def shardings(mesh, axis):
        return (_row_sh(mesh, axis, 2), _repl(mesh, 2), _repl(mesh, 1))

    def infer(mesh, arg_shapes, result_shape):
        axis = _batch_axis(arg_shapes[0].sharding, mesh)
        return shardings(mesh, axis)

    def prop(mesh, user_shape):
        shs = jax.tree.leaves(user_shape)
        axis = _batch_axis(shs[0].sharding, mesh)
        return shardings(mesh, axis)

    def partition(mesh, arg_shapes, result_shape):
        axis = _batch_axis(arg_shapes[0].sharding, mesh)
        args_sh = (
            _row_sh(mesh, axis, 2), _repl(mesh, 2), _repl(mesh, 1),
            _row_sh(mesh, axis, 1), _row_sh(mesh, axis, 1),
        )

        def lower(x, w, b, lse, glse):
            dx, dw, db = impl(x, w, b, lse, glse)
            if axis is not None:
                # per-shard dW/db cover only this shard's rows
                dw = jax.lax.psum(dw, axis)
                db = jax.lax.psum(db, axis)
            return dx, dw, db

        return mesh, lower, shardings(mesh, axis), args_sh

    f.def_partition(
        partition=partition,
        propagate_user_sharding=prop,
        infer_sharding_from_operands=infer,
        sharding_rule="n k, k v, v, n, n -> n k, k v, v",
        reduction_factors=(),
        need_replication_factors=("k", "v"),
    )
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def streaming_lse(x, w, b, interpret=False):
    """Row-wise logsumexp(x·W + b) without materializing (N, V) logits.

    x: (N, K) bf16 rows;  w: (K, V) bf16;  b: (V,) f32.
    Returns (N,) f32. Differentiable in x, w, b (custom VJP above).
    """
    return _fwd_cp(interpret)(x, w, b)


def _vjp_fwd(x, w, b, interpret):
    lse = streaming_lse(x, w, b, interpret)
    return lse, (x, w, b, lse)


def _vjp_bwd(interpret, res, glse):
    x, w, b, lse = res
    return _bwd_cp(interpret)(x, w, b, lse, glse)


streaming_lse.defvjp(_vjp_fwd, _vjp_bwd)
