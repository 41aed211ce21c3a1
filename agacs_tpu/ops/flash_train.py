"""Whole-KV-in-VMEM flash attention for TRAINING shapes (fwd + custom VJP).

The encoder self-attention at whisper's shapes (T = 250-1500, d_head = 64)
is the framework's hottest op. The XLA einsum path materializes the
(B, h, T, T) f32 score tensor in HBM three times per layer per step
(forward, remat recompute, backward) — at the flagship 8x15 s shape that
is ~12.4 ms of the 58 ms step (xplane, docs/PERF.md round-3). JAX's
bundled Pallas flash kernel loses at these mid-range T (92 vs 61 ms/step
at 8x15 s): its q/k block pipeline is built for long contexts and pays
grid overheads the shape can't amortize.

This kernel exploits the actual size regime instead: at T <= ~1024 a
head-group's ENTIRE k/v fits in VMEM, so each grid step computes a few
heads' full attention with the (T, T) score block living only in VMEM:

  forward : s = s2·(q_h k_h^T) -> f32 softmax (deferred normalization:
            o_h = (exp(s-m) v_h) / l, so no (T, T) division pass)
  backward: recompute p from (q, k); dv_h = p^T (do_h/l);
            dp = do_h v_h^T;  D_h = rowsum(do_h * o_h) (in-kernel);
            ds = p/l (dp - D);  dq_h = s2·(ds k_h);  dk_h = s2·(ds^T q_h)

Layout is the key trick: the kernel consumes q/k/v in their NATURAL
packed (B, T, n_head·d) layout — the direct output of the qkv
projections — and splits heads by static lane slices in VMEM. The
(B, h, T, d) head-split transposes, the T-padding, and the merge-heads
transpose that a per-(b,h) kernel forces on XLA all disappear (measured:
those copies+pads ate the entire HBM win of the per-head variant).
Residuals are (q, k, v, o), all in natural layout; no (T, T) tensor and
no lse ever touch HBM.

Numerics mirror the einsum path (ops/attention.einsum_mha == reference
whisper/model.py:97-109 qkv_attention): f32 scores and softmax, bf16
value dot with f32 accumulation. The d^-0.5 total scale is applied to q
inside the kernel (exact in bf16 for d_head = 64: x0.125 is an exponent
shift) instead of d^-0.25 to q and k separately.

Dispatch (ops/attention auto path via models/whisper.qkv_attention):
non-causal self-attention, d_head = 64, T <= MAX_T, bf16, on TPU.
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

# Above this T the f32 (T, T) score blocks exhaust VMEM (bwd holds two
# plus a bf16 one: ~10 T^2 bytes = 10.5 MB at T=1024).
MAX_T = 1024

# Below this T the XLA einsum path wins in steady state (measured on
# v5e, whisper-small dots_nb step: T=250 packed 77 vs einsum 74 ms;
# T=500 packed 70 vs einsum 77 ms; T=750 packed 54.5 vs einsum 61 ms).
MIN_T = 384

_VMEM_BUDGET = 13 * 1024 * 1024


# Past MAX_T the q-CHUNKED variant takes over: grid adds a q-block axis
# with K/V still whole-group-resident in VMEM, dk/dv accumulated in f32
# scratch across q chunks. Covers whisper's full 30 s context (T=1500).
MAX_T_CHUNKED = 1536


def supports(t_q: int, t_k: int, d_model: int, n_head: int, dtype) -> bool:
    """Shape eligibility for the packed kernel."""
    if t_q != t_k or not (MIN_T <= t_q <= MAX_T_CHUNKED):
        return False
    if d_model % n_head or d_model % 128:
        return False
    if d_model // n_head != 64:
        return False
    if t_q > MAX_T and (
        _pick_chunked(t_q, d_model, n_head, bwd=False) is None
        or _pick_chunked(t_q, d_model, n_head, bwd=True) is None
    ):
        return False
    return dtype == jnp.bfloat16


def _pick_groups(t: int, d_model: int, n_head: int, n_arrays: int,
                 n_f32_tmp: int) -> int:
    """Smallest head-group count whose VMEM footprint fits the budget:
    n_arrays double-buffered (T, D/G) bf16 blocks + n_f32_tmp (T, T) f32
    temporaries. Fewer groups = bigger blocks = better pipelining."""
    tmp = n_f32_tmp * t * t * 4 + t * t * 2  # f32 temps + one bf16 cast
    valid = [g for g in (1, 2, 3, 4, 6, 12)
             if n_head % g == 0 and (d_model // g) % 128 == 0]
    for g in valid:
        blocks = n_arrays * 2 * t * (d_model // g) * 2
        if blocks + tmp <= _VMEM_BUDGET:
            return g
    return valid[-1]


def _pick_chunked(t: int, d_model: int, n_head: int, bwd: bool):
    """(head-groups, q-chunk-rows) for the q-chunked kernels, or None.

    TQ must be a multiple of the 8-row sublane tile (Mosaic requires it
    for non-whole-dim blocks); the q axis is zero-padded to nq·TQ by the
    wrapper. Footprint: double-buffered blocks (TQ-sized q/o/do/dq +
    full-T k/v/dk/dv) + (TQ, T) f32/bf16 temporaries + (bwd) two (T, C)
    f32 accumulator scratches."""
    valid = [g for g in (1, 2, 3, 4, 6, 12)
             if n_head % g == 0 and (d_model // g) % 128 == 0]
    for g in valid:
        c = d_model // g
        for tq in (512, 384, 256, 128, 64):
            if tq >= t:
                continue
            if bwd:
                blocks = 2 * (4 * tq * c * 2 + 4 * t * c * 2)
                tmp = 3 * tq * t * 4 + tq * t * 2
                scratch = 2 * t * c * 4
            else:
                blocks = 2 * (2 * tq * c * 2 + 2 * t * c * 2)
                tmp = 2 * tq * t * 4 + tq * t * 2
                scratch = 0
            if blocks + tmp + scratch <= _VMEM_BUDGET:
                return g, tq
    return None


def _pad_rows(x: jax.Array, rows: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (0, rows - x.shape[1]), (0, 0)))


def _col_spec(t: int, c: int) -> pl.BlockSpec:
    # (T, C) trailing block of a (B, T, D) array: T == full dim, C is a
    # 128-multiple lane slice.
    return pl.BlockSpec((1, t, c), lambda b, g: (b, 0, g),
                        memory_space=pltpu.VMEM)


def _qc_full_spec(t: int, c: int) -> pl.BlockSpec:
    # full-T block under the (b, g, qc) grid: constant along qc, so the
    # block stays VMEM-resident while the q chunks sweep
    return pl.BlockSpec((1, t, c), lambda b, g, qc: (b, 0, g),
                        memory_space=pltpu.VMEM)


def _qc_chunk_spec(tq: int, c: int) -> pl.BlockSpec:
    # (TQ, C) q-chunk block of a (B, T, D) array
    return pl.BlockSpec((1, tq, c), lambda b, g, qc: (b, qc, g),
                        memory_space=pltpu.VMEM)


def _fwd_kernel(n_head_blk: int, dh: int, q_ref, k_ref, v_ref, o_ref):
    s2 = dh ** -0.5
    for h in range(n_head_blk):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q_ref[0, :, sl]
        qh = qh * jnp.asarray(s2, qh.dtype)
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, T) f32
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


def _bwd_kernel(n_head_blk: int, dh: int, q_ref, k_ref, v_ref, o_ref,
                do_ref, dq_ref, dk_ref, dv_ref):
    s2 = dh ** -0.5
    for h in range(n_head_blk):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q_ref[0, :, sl]
        qh = qh * jnp.asarray(s2, qh.dtype)
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        oh = o_ref[0, :, sl]
        doh = do_ref[0, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)          # un-normalized weights
        linv = 1.0 / jnp.sum(p, axis=1, keepdims=True)
        # D = rowsum(do * o) per query row — normalized-weight identity
        dd = jnp.sum(doh.astype(jnp.float32) * oh.astype(jnp.float32),
                     axis=1, keepdims=True)
        # dv = (p/l)^T do  ==  p^T (do * linv): scale the small (T, d)
        # operand instead of the (T, T) one
        don = (doh.astype(jnp.float32) * linv).astype(doh.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            p.astype(doh.dtype), don, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - dd) * linv).astype(qh.dtype)
        dq = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, :, sl] = (dq * s2).astype(dq_ref.dtype)
        dk = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # qh already carries s2, so dk = ds^T qh is exactly s2·(ds^T q)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)


def _bwd_kernel_qc(n_head_blk: int, dh: int, nq: int, q_ref, k_ref, v_ref,
                   o_ref, do_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc):
    """q-chunked backward: same math as _bwd_kernel per (TQ, T) chunk;
    dk/dv accumulate in f32 scratch across the qc sweep (the k/v blocks
    are constant along qc, so they stay VMEM-resident) and are written
    once on the last chunk."""
    qc = pl.program_id(2)

    @pl.when(qc == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    s2 = dh ** -0.5
    for h in range(n_head_blk):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q_ref[0, :, sl]
        qh = qh * jnp.asarray(s2, qh.dtype)      # (TQ, dh)
        kh = k_ref[0, :, sl]                     # (T, dh)
        vh = v_ref[0, :, sl]
        oh = o_ref[0, :, sl]
        doh = do_ref[0, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # (TQ, T)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        linv = 1.0 / jnp.sum(p, axis=1, keepdims=True)
        dd = jnp.sum(doh.astype(jnp.float32) * oh.astype(jnp.float32),
                     axis=1, keepdims=True)
        don = (doh.astype(jnp.float32) * linv).astype(doh.dtype)
        dv_acc[:, sl] += jax.lax.dot_general(
            p.astype(doh.dtype), don, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - dd) * linv).astype(qh.dtype)
        dq = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, :, sl] = (dq * s2).astype(dq_ref.dtype)
        dk_acc[:, sl] += jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qc == nq - 1)
    def _fin():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def packed_flash_mha(q, k, v, n_head, interpret=False):
    """(B, T, D) packed q/k/v -> (B, T, D); non-causal self-attention.

    Equivalent to splitting D into n_head heads of 64, running
    einsum_mha with the d^-0.25 pre-scales, and merging heads back —
    with no transposes and no HBM score tensors in fwd or bwd.
    """
    return _fwd(q, k, v, n_head, interpret)


def _fwd(q, k, v, n_head, interpret):
    """SPMD-aware wrapper: the pallas dispatch runs per-shard under a
    custom_partitioning rule that shards the batch dim and keeps T/D
    replicated (docs/PERF.md round-3 SPMD section). Named saveable so
    the dots_nb remat policy keeps `o` (the custom-VJP residual) instead
    of re-running the kernel in backward."""
    out = _fwd_cp(n_head, interpret)(q, k, v)
    return checkpoint_name(out, "flash_attn_out")


def _fwd_pallas(q, k, v, n_head, interpret):
    b, t, d_model = q.shape
    dh = d_model // n_head
    if t > MAX_T:
        # q-chunked: (b, g, qc) grid, K/V whole-group-resident along qc.
        # Only the q/o axis is padded (to nq·TQ); K/V stay full-T, so
        # softmax sees only real keys. The fwd math is chunk-shape-
        # agnostic — same kernel body.
        g, tq = _pick_chunked(t, d_model, n_head, bwd=False)
        nq = -(-t // tq)
        c = d_model // g
        kern = functools.partial(_fwd_kernel, n_head // g, dh)
        out = pl.pallas_call(
            kern,
            grid=(b, g, nq),
            in_specs=[_qc_chunk_spec(tq, c),
                      _qc_full_spec(t, c), _qc_full_spec(t, c)],
            out_specs=_qc_chunk_spec(tq, c),
            out_shape=jax.ShapeDtypeStruct((b, nq * tq, d_model), q.dtype),
            interpret=interpret,
        )(_pad_rows(q, nq * tq), k, v)
        return out[:, :t]
    g = int(os.environ.get("AGACS_FLASH_G_FWD", 0)) or _pick_groups(
        t, d_model, n_head, 4, 2)
    hpb = n_head // g
    kern = functools.partial(_fwd_kernel, hpb, dh)
    out = pl.pallas_call(
        kern,
        grid=(b, g),
        in_specs=[_col_spec(t, d_model // g)] * 3,
        out_specs=_col_spec(t, d_model // g),
        out_shape=jax.ShapeDtypeStruct((b, t, d_model), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out


def _vjp_fwd(q, k, v, n_head, interpret):
    o = _fwd(q, k, v, n_head, interpret)
    return o, (q, k, v, o)


def _vjp_bwd(n_head, interpret, res, do):
    q, k, v, o = res
    return _bwd_cp(n_head, interpret)(q, k, v, o, do)


def _bwd_pallas(q, k, v, o, do, n_head, interpret):
    b, t, d_model = q.shape
    dh = d_model // n_head
    if t > MAX_T:
        # zero do pad rows => ds rows are zero => no dk/dv contribution
        # from the q padding; dq pad rows are sliced off
        g, tq = _pick_chunked(t, d_model, n_head, bwd=True)
        nq = -(-t // tq)
        tp = nq * tq
        c = d_model // g
        kern = functools.partial(_bwd_kernel_qc, n_head // g, dh, nq)
        dq, dk, dv = pl.pallas_call(
            kern,
            grid=(b, g, nq),
            in_specs=[_qc_chunk_spec(tq, c),
                      _qc_full_spec(t, c), _qc_full_spec(t, c),
                      _qc_chunk_spec(tq, c), _qc_chunk_spec(tq, c)],
            out_specs=[_qc_chunk_spec(tq, c),
                       _qc_full_spec(t, c), _qc_full_spec(t, c)],
            out_shape=[jax.ShapeDtypeStruct((b, tp, d_model), q.dtype),
                       jax.ShapeDtypeStruct((b, t, d_model), q.dtype),
                       jax.ShapeDtypeStruct((b, t, d_model), q.dtype)],
            scratch_shapes=[pltpu.VMEM((t, c), jnp.float32)] * 2,
            interpret=interpret,
        )(_pad_rows(q, tp), k, v, _pad_rows(o, tp), _pad_rows(do, tp))
        return dq[:, :t], dk, dv
    g = int(os.environ.get("AGACS_FLASH_G_BWD", 0)) or _pick_groups(
        t, d_model, n_head, 8, 3)
    hpb = n_head // g
    kern = functools.partial(_bwd_kernel, hpb, dh)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(b, g),
        in_specs=[_col_spec(t, d_model // g)] * 5,
        out_specs=[_col_spec(t, d_model // g)] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, t, d_model), q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, o, do)
    return dq, dk, dv


def _batch_only(sharding, mesh):
    """Restrict a suggested sharding to the batch dim: the kernel needs
    whole-T keys and all of a head's lanes on one device, so T/D shard
    suggestions are dropped (GSPMD inserts the reshards)."""
    if not isinstance(sharding, NamedSharding):
        return NamedSharding(mesh, PartitionSpec(None, None, None))
    spec = tuple(sharding.spec) + (None,) * (3 - len(sharding.spec))
    return NamedSharding(sharding.mesh, PartitionSpec(spec[0], None, None))


def _einsum_ref(q, k, v, n_head):
    """Head-split XLA fallback with identical math, used per-shard if a
    local shape ever escapes the kernel's support envelope."""
    b, t, d = q.shape
    dh = d // n_head
    sc = dh ** -0.25

    def heads(y):
        return y.reshape(b, t, n_head, dh).transpose(0, 2, 1, 3)

    s = jnp.einsum("bhqd,bhkd->bhqk", heads(q) * sc,
                   heads(k) * sc).astype(jnp.float32)
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, heads(v))
    return o.transpose(0, 2, 1, 3).reshape(b, t, d)


def _make_cp(impl, n_in, n_out, rule, n_head, interpret):
    """custom_partitioning wrapper: batch-dim sharding, T/D replicated.

    Without this, GSPMD treats the Mosaic custom call as opaque and
    fully REPLICATES its operands on a multi-chip mesh — every chip
    would all-gather the whole global batch's q/k/v per layer. The
    shardy `rule` (and the GSPMD-path callbacks) declare the kernel
    batch-parallel instead, so dp training shards it like any other op.
    """
    f = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        out = tuple(_batch_only(a.sharding, mesh) for a in arg_shapes[:n_out])
        return out if n_out > 1 else out[0]

    def prop(mesh, user_shape):
        shs = jax.tree.leaves(user_shape)
        out = tuple(_batch_only(s.sharding, mesh) for s in shs[:n_out])
        return out if n_out > 1 else out[0]

    def partition(mesh, arg_shapes, result_shape):
        arg_sh = tuple(_batch_only(a.sharding, mesh) for a in arg_shapes)
        res = jax.tree.leaves(result_shape)
        out_sh = tuple(_batch_only(r.sharding, mesh) for r in res[:n_out])

        def lower(*args):
            t, d = args[0].shape[1], args[0].shape[2]
            if supports(t, t, d, n_head, args[0].dtype):
                return impl(*args)
            if n_out == 1:
                return _einsum_ref(*args, n_head)
            # bwd fallback: differentiate the reference impl
            q, k, v, o, do = args
            _, vjp = jax.vjp(lambda q, k, v: _einsum_ref(q, k, v, n_head),
                             q, k, v)
            return vjp(do)

        return mesh, lower, (out_sh if n_out > 1 else out_sh[0]), arg_sh

    f.def_partition(
        partition=partition,
        propagate_user_sharding=prop,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=("t", "d"),
    )
    return f


@functools.lru_cache(maxsize=None)
def _fwd_cp(n_head, interpret):
    def impl(q, k, v):
        return _fwd_pallas(q, k, v, n_head, interpret)

    return _make_cp(impl, 3, 1, "b t d, b t d, b t d -> b t d",
                    n_head, interpret)


@functools.lru_cache(maxsize=None)
def _bwd_cp(n_head, interpret):
    def impl(q, k, v, o, do):
        return _bwd_pallas(q, k, v, o, do, n_head, interpret)

    return _make_cp(
        impl, 5, 3,
        "b t d, b t d, b t d, b t d, b t d -> b t d, b t d, b t d",
        n_head, interpret)


packed_flash_mha.defvjp(_vjp_fwd, _vjp_bwd)
