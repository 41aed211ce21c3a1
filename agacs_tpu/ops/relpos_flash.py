"""Whole-KV-in-VMEM flash attention with RELATIVE positional scores
(Transformer-XL / espnet rel_selfattn) for conformer TRAINING shapes.

The conformer encoder's rel-pos self-attention
(`espnet/nets/pytorch_backend/transformer/attention.py`
RelPositionMultiHeadedAttention, re-designed in models/conformer._rel_attn)
is the conformer track's hottest op. The XLA path materializes THREE
(B, h, T, ~2T) f32 tensors in HBM per layer per direction — the content
scores, the position scores, and the pad/reshape/slice chain of the
Transformer-XL `rel_shift` — which showed up as ~20 ms/step of
pad+reshape+slice+copy at the 16x15 s bench shape (docs/PERF.md round-5
conformer forensics).

This kernel keeps every (T, T)-sized tensor in VMEM, like the whisper
track's packed kernel (ops/flash_train.py), and replaces the rel_shift
pad/reshape dance with a single Mosaic lane-rotate:

  score[q, j] = ( qu_h·k_h[j] + bd[q, T-1-q+j] ) / sqrt(dk)
  with bd = qv_h · pe_h^T        — (T, Wp) in VMEM only

The per-row diagonal gather bd[q, T-1-q+j] is `pltpu.roll` with a
per-row stride: right-rotating row q by (Wp-T+1+q) lanes aligns column
T-1-q onto 0. pe is zero-padded to Wp = ceil(2T-1, 128) rows; for
j < T the gathered index stays inside the real 2T-1 region, so the
padding never leaks into scores (proof in docstring of _shift_fwd).

The backward scatter (un-shift) is the same rotate on row-reversed
data: dbd[q, p] = ds[q, p-(T-1-q)] = J·roll(J·ds_padded) with the
anti-diagonal J; the second J rides the small (T, dh) results by
associativity (see _shift_bwd_rolled). Wrapped reads land in the zero
pad because Wp >= 2T-1.

Layout mirrors flash_train.py: packed (B, T, D) q/k/v (the projections'
natural output), heads split by static lane slices, no (B, h, T, dk)
transposes. The position-bias adds (q + pos_bias_u/v) happen OUTSIDE in
XLA so bias gradients flow through plain autodiff; the kernel takes the
two biased queries qu, qv. dpe is emitted per-batch (B, Wp, D) and
summed outside — keeps the custom_partitioning rule purely
batch-parallel (no cross-shard collectives inside the kernel).

Numerics mirror models/conformer._rel_attn: bf16 matmul inputs with f32
score accumulation, f32 softmax, additive -1e30 key mask (vs the XLA
path's where(-inf); exp underflows to 0 identically for any real max).
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

# (T, T) + (T, Wp~2T) f32 temporaries cap the supported T (bwd holds ~5).
MAX_T = 640
MIN_T = 64

NEG_MASK = -1e30


def _wp(t: int) -> int:
    return -(-(2 * t - 1) // 128) * 128


def interpret_requested() -> bool:
    """Test hook: AGACS_RELPOS_FLASH=interpret runs the kernel through the
    Pallas interpreter (any backend)."""
    return os.environ.get("AGACS_RELPOS_FLASH") == "interpret"


def supports(t: int, d_model: int, n_head: int, dtype) -> bool:
    if not (MIN_T <= t <= MAX_T):
        return False
    if d_model % n_head or d_model % 128:
        return False
    if (d_model // n_head) % 8:
        return False
    env = os.environ.get("AGACS_RELPOS_FLASH", "1")
    if env in ("0", "false"):
        return False
    if env != "interpret":
        try:
            if jax.default_backend() != "tpu":
                return False
        except Exception:
            return False
    return dtype == jnp.bfloat16


def _shift_fwd(bdf: jax.Array, t: int) -> jax.Array:
    """(T, Wp) position scores -> (T, T) rel-shifted block.

    out[q, j] = bdf[q, (c0+j - (Wp-T+1+c0+q)) mod Wp] = bdf[q, T-1-q+j]
    for j < T the source index is in [0, 2T-2] — always inside the real
    (unpadded) 2T-1 region, so pe's zero pad rows are never read.

    Mosaic's strided dynamic_rotate requires every vreg's max in-vreg
    shift <= 128; with stride 1 (8 sublanes/vreg) that holds iff the
    base shift is 0 mod 8, so the target is aligned to column
    c0 = (T-1) mod 8 instead of 0 and the result sliced at c0."""
    wp = bdf.shape[1]
    c0 = (t - 1) % 8
    rolled = pltpu.roll(bdf, wp - t + 1 + c0, 1, stride=1, stride_axis=0)
    return rolled[:, c0:c0 + t]


def _rev_matrix(t: int, dtype) -> jax.Array:
    """(T, T) anti-diagonal permutation (row-reversal) matrix. Mosaic has
    no `rev` lowering, but J·x is one cheap MXU pass (~0.2 GMAC at
    T=468) and J is built from iota in-register."""
    r = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return (r + c == t - 1).astype(dtype)


def _shift_bwd_rolled(ds: jax.Array, t: int, wp: int,
                      j_rev: jax.Array) -> jax.Array:
    """(T, T) shifted-score grads -> ROW-REVERSED (T, Wp) position-score
    grads: returns r = J·dbd where dbd[q, p] = ds[q, p-(T-1-q)].

    Row q of dbd needs a RIGHT-rotate by T-1-q — a negative stride,
    which Mosaic's strided dynamic_rotate cannot express — so the
    row-REVERSED array rotates with stride +1 instead (row q' = T-1-q
    gets shift q'; base 0 keeps every vreg's in-vreg shift under the
    lane width). Row reversal is J·x with the anti-diagonal J (`rev` has
    no Mosaic lowering); the SECOND flip (J·r = dbd) is left to the
    CALLER, who can push it onto the small (T, dh) operands instead of
    this (T, Wp) block (J is symmetric):

        dqv = dbd·pe  = J·(r·pe)
        dpe = dbdᵀ·qv = rᵀ·(J·qv)

    Wrapped reads land in the zero pad because Wp >= 2T-1."""
    flipped = jax.lax.dot_general(
        j_rev, ds, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    padded = jnp.concatenate(
        [flipped, jnp.zeros((t, wp - t), jnp.float32)], axis=1
    )
    return pltpu.roll(padded, 0, 1, stride=1, stride_axis=0)


def _fwd_kernel(hpb: int, dh: int, t: int, qu_ref, qv_ref, k_ref, v_ref,
                pe_ref, mask_ref, o_ref):
    isd = dh ** -0.5
    mask = mask_ref[0, 0, :][None, :]  # (1, T) additive
    for h in range(hpb):
        sl = slice(h * dh, (h + 1) * dh)
        quh = qu_ref[0, :, sl]
        qvh = qv_ref[0, :, sl]
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        peh = pe_ref[:, sl]  # (Wp, dh)
        ac = jax.lax.dot_general(
            quh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, T)
        bdf = jax.lax.dot_general(
            qvh, peh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, Wp)
        s = (ac + _shift_fwd(bdf, t)) * isd + mask
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


def _bwd_kernel(hpb: int, dh: int, t: int, wp: int, qu_ref, qv_ref, k_ref,
                v_ref, pe_ref, mask_ref, o_ref, do_ref,
                dqu_ref, dqv_ref, dk_ref, dv_ref, dpe_ref):
    isd = dh ** -0.5
    mask = mask_ref[0, 0, :][None, :]
    # f32 through _shift_bwd_rolled: Mosaic strided rotate is 32-bit-only
    j_rev = _rev_matrix(t, jnp.float32)
    for h in range(hpb):
        sl = slice(h * dh, (h + 1) * dh)
        quh = qu_ref[0, :, sl]
        qvh = qv_ref[0, :, sl]
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        peh = pe_ref[:, sl]
        oh = o_ref[0, :, sl]
        doh = do_ref[0, :, sl]
        ac = jax.lax.dot_general(
            quh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bdf = jax.lax.dot_general(
            qvh, peh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = (ac + _shift_fwd(bdf, t)) * isd + mask
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)  # un-normalized
        linv = 1.0 / jnp.sum(p, axis=1, keepdims=True)
        dd = jnp.sum(doh.astype(jnp.float32) * oh.astype(jnp.float32),
                     axis=1, keepdims=True)
        don = (doh.astype(jnp.float32) * linv).astype(doh.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            p.astype(doh.dtype), don, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dss = (p * (dp - dd) * linv) * isd  # f32 (T, T) pre-scale grads
        ds_b = dss.astype(quh.dtype)
        dqu_ref[0, :, sl] = jax.lax.dot_general(
            ds_b, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dqu_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            ds_b, quh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)
        rolled = _shift_bwd_rolled(dss, t, wp, j_rev).astype(qvh.dtype)
        j_b = j_rev.astype(qvh.dtype)
        # dqv = J·(rolled·pe): the un-flip rides the (T, dh) result
        r_pe = jax.lax.dot_general(
            rolled, peh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(qvh.dtype)  # (T, dh)
        dqv_ref[0, :, sl] = jax.lax.dot_general(
            j_b, r_pe, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dqv_ref.dtype)
        # dpe = rolledᵀ·(J·qv)
        j_qv = jax.lax.dot_general(
            j_b, qvh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(qvh.dtype)  # (T, dh)
        dpe_ref[0, :, sl] = jax.lax.dot_general(
            rolled, j_qv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dpe_ref.dtype)


def _pick_groups(t: int, d_model: int, n_head: int) -> int:
    """Lane groups: C = D/G must be a 128-multiple; for d=256 this is
    G in {1, 2}. The (T, T)/(T, Wp) temps are per-head (G-independent),
    so fewer groups = fewer grid steps; G=1 whenever block traffic fits."""
    for g in (1, 2, 4):
        if n_head % g == 0 and (d_model // g) % 128 == 0:
            return g
    return n_head


def _specs(t: int, c: int, wp: int, n_trailing_batch: int):
    """Specs in operand order (qu, qv, k, v, pe, mask, *trailing)."""
    bt = pl.BlockSpec((1, t, c), lambda b, g: (b, 0, g),
                      memory_space=pltpu.VMEM)
    pe = pl.BlockSpec((wp, c), lambda b, g: (0, g),
                      memory_space=pltpu.VMEM)
    # mask is passed (B, 1, T): the middle singleton keeps the trailing
    # two block dims equal to the array dims (Mosaic tiling rule)
    mask = pl.BlockSpec((1, 1, t), lambda b, g: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return [bt] * 4 + [pe, mask] + [bt] * n_trailing_batch


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def relpos_mha(qu, qv, k, v, pe, mask, n_head, interpret=False):
    """Packed rel-pos multi-head attention.

    qu, qv: (B, T, D) queries with pos_bias_u / pos_bias_v already added
    k, v:   (B, T, D)
    pe:     (Wp, D) per-head-lane projected rel positions, rows 0..2T-2
            real (positions T-1..-(T-1)), zero-padded to Wp=ceil(2T-1,128)
    mask:   (B, T) additive f32 key mask (0 valid / NEG_MASK invalid)
    Returns (B, T, D); equivalent to models/conformer._rel_attn's einsum
    body between the projections and the output projection.
    """
    return _fwd_cp(n_head, interpret)(qu, qv, k, v, pe, mask)


def pad_pe(pe: jax.Array, t: int) -> jax.Array:
    """(2T-1, D) projected positions -> (Wp, D) zero-padded."""
    return jnp.pad(pe, ((0, _wp(t) - pe.shape[0]), (0, 0)))


def _fwd_pallas(qu, qv, k, v, pe, mask, n_head, interpret):
    b, t, d_model = qu.shape
    dh = d_model // n_head
    wp = pe.shape[0]
    g = _pick_groups(t, d_model, n_head)
    kern = functools.partial(_fwd_kernel, n_head // g, dh, t)
    return pl.pallas_call(
        kern,
        grid=(b, g),
        in_specs=_specs(t, d_model // g, wp, 0),
        out_specs=pl.BlockSpec((1, t, d_model // g), lambda b_, g_: (b_, 0, g_),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d_model), qu.dtype),
        interpret=interpret,
    )(qu, qv, k, v, pe, mask[:, None, :])


def _bwd_pallas(qu, qv, k, v, pe, mask, o, do, n_head, interpret):
    b, t, d_model = qu.shape
    dh = d_model // n_head
    wp = pe.shape[0]
    g = _pick_groups(t, d_model, n_head)
    c = d_model // g
    kern = functools.partial(_bwd_kernel, n_head // g, dh, t, wp)
    bt_spec = pl.BlockSpec((1, t, c), lambda b_, g_: (b_, 0, g_),
                           memory_space=pltpu.VMEM)
    dpe_spec = pl.BlockSpec((1, wp, c), lambda b_, g_: (b_, 0, g_),
                            memory_space=pltpu.VMEM)
    dqu, dqv, dk, dv, dpe_b = pl.pallas_call(
        kern,
        grid=(b, g),
        in_specs=_specs(t, c, wp, 2),
        out_specs=[bt_spec] * 4 + [dpe_spec],
        out_shape=[jax.ShapeDtypeStruct((b, t, d_model), qu.dtype)] * 4
        + [jax.ShapeDtypeStruct((b, wp, d_model), jnp.float32)],
        interpret=interpret,
    )(qu, qv, k, v, pe, mask[:, None, :], o, do)
    return dqu, dqv, dk, dv, dpe_b


def _vjp_fwd(qu, qv, k, v, pe, mask, n_head, interpret):
    o = relpos_mha(qu, qv, k, v, pe, mask, n_head, interpret)
    return o, (qu, qv, k, v, pe, mask, o)


def _vjp_bwd(n_head, interpret, res, do):
    qu, qv, k, v, pe, mask, o = res
    dqu, dqv, dk, dv, dpe_b = _bwd_cp(n_head, interpret)(
        qu, qv, k, v, pe, mask, o, do
    )
    dpe = jnp.sum(dpe_b, axis=0).astype(pe.dtype)
    return dqu, dqv, dk, dv, dpe, jnp.zeros_like(mask)


relpos_mha.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# reference (einsum) implementation + SPMD wrappers, flash_train.py style
# ---------------------------------------------------------------------------


def _einsum_ref(qu, qv, k, v, pe, mask, n_head):
    """Head-split XLA fallback with identical math (the body of
    models/conformer._rel_attn), used per-shard when a local shape
    escapes the kernel envelope."""
    b, t, d = qu.shape
    dh = d // n_head
    wp = pe.shape[0]

    def heads(y):
        return y.reshape(b, t, n_head, dh).transpose(0, 2, 1, 3)

    peh = pe.reshape(wp, n_head, dh).transpose(1, 0, 2)  # (h, Wp, dh)
    ac = jnp.einsum("bhqd,bhkd->bhqk", heads(qu), heads(k))
    bdf = jnp.einsum("bhqd,hpd->bhqp", heads(qv), peh)  # (B, h, T, Wp)
    # rel shift via gather (XLA-land; the real 2T-1 region only)
    cols = (t - 1) + jnp.arange(t)[None, :] - jnp.arange(t)[:, None]
    bd = jnp.take_along_axis(
        bdf, jnp.broadcast_to(cols[None, None], (b, n_head, t, t)), axis=3
    )
    s = (ac + bd).astype(jnp.float32) * (dh ** -0.5)
    s = s + mask[:, None, None, :]
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, heads(v))
    return o.transpose(0, 2, 1, 3).reshape(b, t, d)


def _shard3(sharding, mesh, ndim=3):
    if not isinstance(sharding, NamedSharding):
        return NamedSharding(mesh, PartitionSpec(*([None] * ndim)))
    spec = tuple(sharding.spec) + (None,) * (ndim - len(sharding.spec))
    return NamedSharding(sharding.mesh,
                         PartitionSpec(spec[0], *([None] * (ndim - 1))))


def _repl(mesh, ndim):
    return NamedSharding(mesh, PartitionSpec(*([None] * ndim)))


def _make_cp(impl, batch_in: int, extra_in: int, out_ranks, rule, n_head):
    """custom_partitioning: batch-dim sharding for the (B, ...) operands,
    pe replicated; outputs follow their rank (3 = batch-sharded)."""
    f = custom_partitioning(impl)

    def out_shardings(mesh):
        return tuple(
            _shard3(None, mesh, r) if r == 3 else _repl(mesh, r)
            for r in out_ranks
        )

    def infer(mesh, arg_shapes, result_shape):
        b_sh = _shard3(arg_shapes[0].sharding, mesh)
        out = tuple(
            NamedSharding(b_sh.mesh, PartitionSpec(b_sh.spec[0],
                                                   *([None] * (r - 1))))
            for r in out_ranks
        )
        return out if len(out) > 1 else out[0]

    def prop(mesh, user_shape):
        shs = jax.tree.leaves(user_shape)
        first = _shard3(shs[0].sharding, mesh, out_ranks[0])
        out = tuple(
            NamedSharding(first.mesh, PartitionSpec(first.spec[0],
                                                    *([None] * (r - 1))))
            for r in out_ranks
        )
        return out if len(out) > 1 else out[0]

    def partition(mesh, arg_shapes, result_shape):
        batch_spec = _shard3(arg_shapes[0].sharding, mesh).spec[0]

        def arg_sh(i, a):
            nd = len(a.shape)
            if i < batch_in or i >= batch_in + extra_in:
                # (B, ...) operands: mask is 2-D, rest 3-D
                return NamedSharding(
                    mesh, PartitionSpec(batch_spec, *([None] * (nd - 1)))
                )
            return _repl(mesh, nd)  # pe

        args_sh = tuple(arg_sh(i, a) for i, a in enumerate(arg_shapes))
        res = jax.tree.leaves(result_shape)
        out_sh = tuple(
            NamedSharding(mesh, PartitionSpec(batch_spec,
                                              *([None] * (r - 1))))
            if r == 3 else _repl(mesh, r)
            for r in out_ranks
        )

        def lower(*args):
            t, d = args[0].shape[1], args[0].shape[2]
            if supports(t, d, n_head, args[0].dtype):
                return impl(*args)
            if len(out_ranks) == 1:
                return _einsum_ref(*args, n_head)
            qu, qv, k, v, pe, mask, o, do = args
            _, vjp = jax.vjp(
                lambda a, b_, c, e, p_: _einsum_ref(a, b_, c, e, p_, mask,
                                                    n_head),
                qu, qv, k, v, pe,
            )
            dqu, dqv, dk, dv, dpe = vjp(do)
            return dqu, dqv, dk, dv, dpe[None].astype(jnp.float32)

        return mesh, lower, (out_sh if len(out_sh) > 1 else out_sh[0]), args_sh

    f.def_partition(
        partition=partition,
        propagate_user_sharding=prop,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=("t", "d", "w"),
    )
    return f


@functools.lru_cache(maxsize=None)
def _fwd_cp(n_head, interpret):
    def impl(qu, qv, k, v, pe, mask):
        t, d = qu.shape[1], qu.shape[2]
        if not supports(t, d, n_head, qu.dtype) or interpret:
            if supports(t, d, n_head, qu.dtype) and interpret:
                return _fwd_pallas(qu, qv, k, v, pe, mask, n_head, interpret)
            return _einsum_ref(qu, qv, k, v, pe, mask, n_head)
        return _fwd_pallas(qu, qv, k, v, pe, mask, n_head, interpret)

    return _make_cp(
        impl, 4, 1, (3,),
        "b t d, b t d, b t d, b t d, w d, b t -> b t d", n_head)


@functools.lru_cache(maxsize=None)
def _bwd_cp(n_head, interpret):
    def impl(qu, qv, k, v, pe, mask, o, do):
        t, d = qu.shape[1], qu.shape[2]
        if supports(t, d, n_head, qu.dtype):
            return _bwd_pallas(qu, qv, k, v, pe, mask, o, do, n_head,
                               interpret)
        _, vjp = jax.vjp(
            lambda a, b_, c, e, p_: _einsum_ref(a, b_, c, e, p_, mask, n_head),
            qu, qv, k, v, pe,
        )
        dqu, dqv, dk, dv, dpe = vjp(do)
        b = qu.shape[0]
        return dqu, dqv, dk, dv, jnp.broadcast_to(
            dpe[None].astype(jnp.float32) / b, (b,) + dpe.shape
        )

    return _make_cp(
        impl, 4, 1, (3, 3, 3, 3, 3),
        "b t d, b t d, b t d, b t d, w d, b t, b t d, b t d -> "
        "b t d, b t d, b t d, b t d, b w d", n_head)
