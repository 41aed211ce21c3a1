"""Fused Pallas decode-step cache attention (the AR-serving hot op).

One kernel per layer computes the whole masked-softmax attention read of
the KV cache — qk logits, optional PE dual-QK gate mix, key-position
mask, f32 softmax, and the value reduction — with the caches streamed
through VMEM exactly once in their stored (N, T, d) d-minor layout.

Why a kernel instead of XLA ops (docs/PERF.md round-3 forensics):

* The XLA formulation leaves the cache with two layout-divergent
  consumers (the row `dynamic_update_slice` and the qk dot). On the
  beam path XLA assigned the loop carry `{2,1,0}` but produced the
  prefill in `{2,0,1}`, so every step paid a full-cache relayout copy
  fused into the row write — 12 x 99 us/step, 52% of beam device time
  at B=8. A Pallas kernel pins one layout for every consumer.
* The ancestry-indexed beam read (`decode/beam.py`) in dense form
  multiplies a (bg, q, j, T, h, dh) broadcast on the VPU — a beam^2
  read amplification (19% of device time). In-kernel the group's rows
  are VMEM-resident, so the j x q cross terms are MXU dots plus tiny
  one-hot selects.

Kernel structure (Mosaic-friendly: 2-D dots, 2-D transposes, iota — no
vector reshapes, which Mosaic rejects for these small shapes): each grid
step owns one beam group of j rows, with the caches passed pre-flattened
to (N*Tp, d) so the group block is already the (j*Tp, d) matrix the MXU
dots against. Queries are expanded once into a block-diagonal (d, j*H)
matrix via a constant one-hot matmul; scores for every (physical row,
query, head) triple are ONE (j*Tp, d) x (d, j*H) dot, folded to (Tp,
j*H) logits by the ancestry one-hot selects (each a (Tp, j) x (j, j*H)
dot); the value reduction is ONE (j*H, j*Tp) x (j*Tp, d) dot whose
weight matrix carries the selects; the per-query head extraction is one
(j, j*H) x (j*H, d) dot against the head-masked accumulator. The plain
(non-beam) path is the same kernel with an identity ancestry map over
small pseudo-groups of independent rows.

The small per-row operands (q, anc, out) are reshaped to (G, rows, ...)
OUTSIDE the kernel so their (1, rows, ...) blocks span the trailing
dims exactly (Mosaic requires blocked trailing dims to be multiples of
(8, 128) or the full array). Cache blocks are (rows, Tp, d) with
Tp % TIME_ALIGN == 0 (`init_self_kv_cache` pads).

Layouts: q rows are PRE-scaled by d_head**-0.5; caches are raw.

Reference parity: mirrors the attention math of the reference fork's
`whisper/model.py` MultiHeadAttention/MultiHeadAttentionPE qkv_attention
(f32 softmax over key positions) in cached single-token form.
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

TIME_ALIGN = 16  # bf16 sublane tile; keeps cache blocks tile-aligned
TIME_ALIGN_I8 = 32  # int8 sublane tile (quantized cross-KV caches)

# VMEM budget for the double-buffered cache blocks; above this the
# dispatcher switches to the time-chunked online-softmax kernel (and the
# caller falls back to XLA only if no chunking divides the context).
# Measured on v5e: 2-cache beam-5 whisper-small blocks at T=448 (13.8 MB)
# compile; the 3-cache PE variant (20.6 MB) exhausts VMEM.
_VMEM_BUDGET = 14 * 1024 * 1024


def pad_time(t: int, align: int = TIME_ALIGN) -> int:
    return -(-t // align) * align


def use_decode_kernel() -> bool:
    mode = os.environ.get("AGACS_DECODE_KERNEL", "auto")
    if mode == "xla":
        return False
    if mode == "pallas":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def kernel_fits(n_caches: int, rows: int, tp: int, d: int, itemsize: int = 2):
    """Do the double-buffered cache blocks fit the VMEM budget?"""
    return 2 * n_caches * rows * tp * d * itemsize <= _VMEM_BUDGET


def pick_chunk(n_caches: int, rows: int, tp: int, d: int) -> int | None:
    """Smallest chunk count whose (rows, tc, d) cache blocks fit VMEM.

    Returns the chunk length tc (a TIME_ALIGN-multiple divisor of tp), or
    None when no valid chunking exists. Used when the single-block kernel
    would exhaust VMEM (wide beams x long contexts x the 3-cache PE
    variant): the chunked kernel runs an online-softmax carry over a
    second grid dimension, so per-step VMEM scales with tc, not tp.
    """
    for nc in range(2, tp // TIME_ALIGN + 1):
        if tp % nc:
            continue
        tc = tp // nc
        if tc % TIME_ALIGN:
            continue
        if kernel_fits(n_caches, rows, tc, d):
            return tc
    return None


def kernel_viable(
    n_caches: int, rows: int, tp: int, d: int, itemsize: int = 2
) -> bool:
    """Can the kernel run at these shapes (single-block or time-chunked)?
    The chunked fallback is bf16-only (itemsize 2)."""
    return kernel_fits(n_caches, rows, tp, d, itemsize) or (
        itemsize == 2 and pick_chunk(n_caches, rows, tp, d) is not None
    )


def _row_spec(*dims):
    return pl.BlockSpec(
        (1,) + dims, lambda i: (i,) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )


def _cache_spec(rows, tp, d):
    # caches are passed reshaped to (N*Tp, d) so each block is ALREADY
    # the flat (rows*Tp, d) matrix the kernel dots against — Mosaic
    # rejects in-kernel vector reshapes at these shapes, but a 2-D block
    # of the 2-D array needs none (rows*Tp % 8 == 0 via TIME_ALIGN)
    return pl.BlockSpec(
        (rows * tp, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )


def _make_kernel(n_head, j, pe, quant=False):
    """One beam group of j rows per grid step; see module docstring.

    quant: k/v arrive int8 with per-channel f32 scales (1, d). The
    dequantization is FREE on the hot path: k's scale folds into the
    tiny query matrix (q·s_k before the transpose — the kernel then only
    pays an int8->bf16 convert of the block), and v's scale applies to
    the (m, d) post-reduction accumulator instead of the (j*Tp, d)
    block."""

    def kern(pos_ref, *refs):
        if pe:
            gate_ref, q_ref, qcs_ref, k_ref, kcs_ref, v_ref, anc_ref, o_ref = refs
            ks_ref = vs_ref = None
        elif quant:
            q_ref, k_ref, v_ref, ks_ref, vs_ref, anc_ref, o_ref = refs
            gate_ref = qcs_ref = kcs_ref = None
        else:
            q_ref, k_ref, v_ref, anc_ref, o_ref = refs
            gate_ref = qcs_ref = kcs_ref = ks_ref = vs_ref = None
        pos = pos_ref[0]
        jtp, d = k_ref.shape  # (j*Tp, d) flat cache block
        tp = jtp // j
        h = n_head
        m = j * h
        d_head = d // h
        f32 = jnp.float32
        kdt = jnp.bfloat16 if quant else k_ref.dtype

        # constant one-hot matrices (iota arithmetic only):
        #   colq[q, m'] = [m'//H == q]      (query-of-column)
        #   hrep[dd, m'] = [head(dd) == m'%H]  (head-of-column)
        colq = (
            jax.lax.broadcasted_iota(jnp.int32, (j, m), 1) // h
            == jax.lax.broadcasted_iota(jnp.int32, (j, m), 0)
        ).astype(f32)
        hrep = (
            jax.lax.broadcasted_iota(jnp.int32, (d, m), 0) // d_head
            == jax.lax.broadcasted_iota(jnp.int32, (d, m), 1) % h
        ).astype(f32)

        def qb_of(q_r):
            # (d, m) block-diagonal query matrix:
            # qb[dd, q*H + h'] = q[q, dd] * [head(dd) = h']
            qr = q_r[0].astype(f32)  # (j, d)
            if quant:
                qr = qr * ks_ref[:]  # fold k's dequant scale into q
            qt = qr.T  # (d, j)
            return (
                jax.lax.dot_general(
                    qt, colq, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                * hrep
            ).astype(kdt)

        qb = qb_of(q_ref)
        qb_cs = qb_of(qcs_ref) if pe else None

        # ONE dot computes every (physical row jk, query q, head) score:
        # rows of the flat cache block are ordered jk*Tp + t
        k_mat = k_ref[:].astype(kdt) if quant else k_ref[:]
        s_all = jax.lax.dot_general(
            k_mat, qb, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (j*Tp, m)
        s_all_cs = (
            jax.lax.dot_general(
                kcs_ref[:], qb_cs, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            if pe
            else None
        )

        # ancestry one-hot per physical row jk, expanded to columns:
        # sel_jk[t, m'] = [anc[m'//H, t] == jk]; the jk selects fold the
        # (j*Tp, m) score matrix down to (Tp, m) query logits
        anc_t = anc_ref[0].astype(jnp.int32).T  # (Tp, j_q)
        sels = []
        lg = jnp.zeros((tp, m), f32)
        lg_cs = jnp.zeros((tp, m), f32) if pe else None
        for jk in range(j):
            sel_small = (anc_t == jk).astype(f32)  # (Tp, j_q)
            sel = jax.lax.dot_general(
                sel_small, colq, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )  # (Tp, m)
            sels.append(sel)
            lg = lg + s_all[jk * tp:(jk + 1) * tp] * sel
            if pe:
                lg_cs = lg_cs + s_all_cs[jk * tp:(jk + 1) * tp] * sel

        if pe:
            # per-head gate broadcast to columns: g_m[0, m'] = gate[m'%H]
            ehm = (
                jax.lax.broadcasted_iota(jnp.int32, (h, m), 1) % h
                == jax.lax.broadcasted_iota(jnp.int32, (h, m), 0)
            ).astype(f32)
            g_m = jax.lax.dot_general(
                gate_ref[:].astype(f32), ehm, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )  # (1, m)
            lg = (1.0 - g_m) * lg + g_m * lg_cs

        t_ids = jax.lax.broadcasted_iota(jnp.int32, (tp, m), 0)
        lg = jnp.where(t_ids <= pos, lg, -1.0e30)
        mx = jnp.max(lg, axis=0, keepdims=True)
        ex = jnp.exp(lg - mx)
        p = ex / jnp.sum(ex, axis=0, keepdims=True)  # (Tp, m) f32

        # value reduction as ONE (m, j*Tp) x (j*Tp, d) dot: the weight
        # matrix carries the ancestry select per row-block
        w_rows = [
            (p * sels[jk]).astype(kdt) for jk in range(j)
        ]  # j x (Tp, m)
        w_full = jnp.concatenate(w_rows, axis=0)  # (j*Tp, m)
        v_mat = v_ref[:].astype(kdt) if quant else v_ref[:]
        big = jax.lax.dot_general(
            w_full.T, v_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (m, d)
        if quant:
            big = big * vs_ref[:]  # v's dequant scale, post-reduction
        # head extraction: o[q, dd] = sum_h big[q*H+h, dd] * [head(dd)=h]
        o = jax.lax.dot_general(
            colq, big * hrep.T, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (j, d)
        o_ref[0] = o.astype(o_ref.dtype)

    return kern


@functools.partial(
    jax.jit, static_argnames=("n_head", "beam", "pe", "quant", "interpret")
)
def _call(pos, args, n_head, beam, pe, quant=False, interpret=False):
    if pe:
        gate, q, q_cs, k, k_cs, v, anc = args
    elif quant:
        q, k, v, ks, vs, anc = args
    else:
        q, k, v, anc = args
    n, tp, d = k.shape
    g = n // beam
    kern = _make_kernel(n_head, beam, pe, quant)
    cache = _cache_spec(beam, tp, d)
    k = k.reshape(n * tp, d)
    v = v.reshape(n * tp, d)
    if pe:
        k_cs = k_cs.reshape(n * tp, d)
    if pe:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gate (1, H)
            _row_spec(beam, d), _row_spec(beam, d),  # q, q_cs
            cache, cache, cache,                     # k, k_cs, v
            _row_spec(beam, tp),                     # anc
        ]
        ins = (
            pos.reshape(1), gate.reshape(1, -1), q.reshape(g, beam, d),
            q_cs.reshape(g, beam, d), k, k_cs, v, anc.reshape(g, beam, tp),
        )
    elif quant:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _row_spec(beam, d),
            cache, cache,
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k scale (1, d)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v scale (1, d)
            _row_spec(beam, tp),
        ]
        ins = (
            pos.reshape(1), q.reshape(g, beam, d), k, v,
            ks.reshape(1, d).astype(jnp.float32),
            vs.reshape(1, d).astype(jnp.float32),
            anc.reshape(g, beam, tp),
        )
    else:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _row_spec(beam, d),
            cache, cache,
            _row_spec(beam, tp),
        ]
        ins = (
            pos.reshape(1), q.reshape(g, beam, d), k, v,
            anc.reshape(g, beam, tp),
        )
    out = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=in_specs,
        out_specs=_row_spec(beam, d),
        out_shape=jax.ShapeDtypeStruct((g, beam, d), q.dtype),
        interpret=interpret,
    )(*ins)
    return out.reshape(n, d)


def _make_kernel_chunked(n_head, j, pe, nc, tc):
    """Time-chunked variant: one beam group x one time chunk per grid step.

    Same math as `_make_kernel` per chunk, joined across chunks by the
    standard online-softmax recurrence (flash-decoding): VMEM scratch
    carries the running per-column max m, normalizer s, and the
    UN-normalized f32 value accumulator; the final chunk normalizes and
    extracts heads. Grid iteration on TPU is sequential with the chunk
    axis minor, so the scratch carry is race-free by construction.
    """

    def kern(pos_ref, *refs):
        if pe:
            (gate_ref, q_ref, qcs_ref, k_ref, kcs_ref, v_ref, anc_ref,
             o_ref, m_ref, s_ref, acc_ref) = refs
        else:
            q_ref, k_ref, v_ref, anc_ref, o_ref, m_ref, s_ref, acc_ref = refs
            gate_ref = qcs_ref = kcs_ref = None
        pos = pos_ref[0]
        c = pl.program_id(1)
        d = k_ref.shape[-1]
        h = n_head
        m = j * h
        d_head = d // h
        f32 = jnp.float32

        colq = (
            jax.lax.broadcasted_iota(jnp.int32, (j, m), 1) // h
            == jax.lax.broadcasted_iota(jnp.int32, (j, m), 0)
        ).astype(f32)
        hrep = (
            jax.lax.broadcasted_iota(jnp.int32, (d, m), 0) // d_head
            == jax.lax.broadcasted_iota(jnp.int32, (d, m), 1) % h
        ).astype(f32)

        def qb_of(q_r):
            qt = q_r[0].astype(f32).T
            return (
                jax.lax.dot_general(
                    qt, colq, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                * hrep
            ).astype(k_ref.dtype)

        qb = qb_of(q_ref)
        qb_cs = qb_of(qcs_ref) if pe else None

        # cache blocks arrive (j, tc, d); the leading-dim merge to the
        # flat dot operand is a sublane-layout no-op (the minor two dims
        # are untouched), unlike the minor-dim merges Mosaic rejects
        k_flat = k_ref[:].reshape(j * tc, d)
        v_flat = v_ref[:].reshape(j * tc, d)
        s_all = jax.lax.dot_general(
            k_flat, qb, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )  # (j*tc, m)
        if pe:
            s_all_cs = jax.lax.dot_general(
                kcs_ref[:].reshape(j * tc, d), qb_cs,
                (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )

        anc_t = anc_ref[0].astype(jnp.int32)  # (tc, j_q): pre-transposed
        sels = []
        lg = jnp.zeros((tc, m), f32)
        lg_cs = jnp.zeros((tc, m), f32) if pe else None
        for jk in range(j):
            sel_small = (anc_t == jk).astype(f32)
            sel = jax.lax.dot_general(
                sel_small, colq, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            sels.append(sel)
            lg = lg + s_all[jk * tc:(jk + 1) * tc] * sel
            if pe:
                lg_cs = lg_cs + s_all_cs[jk * tc:(jk + 1) * tc] * sel

        if pe:
            ehm = (
                jax.lax.broadcasted_iota(jnp.int32, (h, m), 1) % h
                == jax.lax.broadcasted_iota(jnp.int32, (h, m), 0)
            ).astype(f32)
            g_m = jax.lax.dot_general(
                gate_ref[:].astype(f32), ehm, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            lg = (1.0 - g_m) * lg + g_m * lg_cs

        t_ids = c * tc + jax.lax.broadcasted_iota(jnp.int32, (tc, m), 0)
        lg = jnp.where(t_ids <= pos, lg, -1.0e30)

        @pl.when(c == 0)
        def _init():
            m_ref[:] = jnp.full((1, m), -1.0e30, f32)
            s_ref[:] = jnp.zeros((1, m), f32)
            acc_ref[:] = jnp.zeros((m, d), f32)

        # online-softmax update: position 0 is always valid, so m is
        # finite after chunk 0 and exp(-1e30 - m) underflows to exactly 0
        # for fully-masked later chunks (alpha = 1, nothing accumulates)
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, jnp.max(lg, axis=0, keepdims=True))
        alpha = jnp.exp(m_old - m_new)  # (1, m)
        p = jnp.exp(lg - m_new)  # (tc, m) un-normalized
        s_ref[:] = alpha * s_ref[:] + jnp.sum(p, axis=0, keepdims=True)
        m_ref[:] = m_new

        w_rows = [(p * sels[jk]).astype(v_ref.dtype) for jk in range(j)]
        w_full = jnp.concatenate(w_rows, axis=0)  # (j*tc, m)
        big = jax.lax.dot_general(
            w_full.T, v_flat, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (m, d)
        acc_ref[:] = alpha.T * acc_ref[:] + big

        @pl.when(c == nc - 1)
        def _fin():
            norm = acc_ref[:] / s_ref[:].T
            o = jax.lax.dot_general(
                colq, norm * hrep.T, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            o_ref[0] = o.astype(o_ref.dtype)

    return kern


@functools.partial(
    jax.jit, static_argnames=("n_head", "beam", "pe", "tc", "interpret")
)
def _call_chunked(pos, args, n_head, beam, pe, tc, interpret=False):
    if pe:
        gate, q, q_cs, k, k_cs, v, anc = args
    else:
        q, k, v, anc = args
    n, tp, d = k.shape
    g = n // beam
    nc = tp // tc
    m = beam * n_head
    kern = _make_kernel_chunked(n_head, beam, pe, nc, tc)
    # caches stay 3-D here: a (beam, tc, d) block of (N, Tp, d) — the
    # minor two block dims satisfy Mosaic's (8, 128)-or-array-dim rule
    # (tc % TIME_ALIGN == 0, d spans), and the chunk index maps cleanly
    cache = pl.BlockSpec(
        (beam, tc, d), lambda i, c: (i, c, 0), memory_space=pltpu.VMEM
    )
    row = pl.BlockSpec(
        (1, beam, d), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
    )
    # anc passes TRANSPOSED (g, Tp, beam): the minor block dim is then
    # beam (== array dim), so tc only needs sublane (x8) alignment
    anc_spec = pl.BlockSpec(
        (1, tc, beam), lambda i, c: (i, c, 0), memory_space=pltpu.VMEM
    )
    anc_tr = jnp.swapaxes(anc.reshape(g, beam, tp), 1, 2)
    if pe:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gate (1, H)
            row, row,                                # q, q_cs
            cache, cache, cache,                     # k, k_cs, v
            anc_spec,
        ]
        ins = (
            pos.reshape(1), gate.reshape(1, -1), q.reshape(g, beam, d),
            q_cs.reshape(g, beam, d), k, k_cs, v, anc_tr,
        )
    else:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row, cache, cache, anc_spec,
        ]
        ins = (pos.reshape(1), q.reshape(g, beam, d), k, v, anc_tr)
    out = pl.pallas_call(
        kern,
        grid=(g, nc),
        in_specs=in_specs,
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((g, beam, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, m), jnp.float32),   # running max
            pltpu.VMEM((1, m), jnp.float32),   # running normalizer
            pltpu.VMEM((m, d), jnp.float32),   # un-normalized value acc
        ],
        interpret=interpret,
    )(*ins)
    return out.reshape(n, d)


def _pick_rows(n: int, tp: int, d: int, n_caches: int, itemsize: int = 2) -> int:
    # pseudo-group size for the plain path: kernel FLOPs grow as rows^2,
    # so stay small; larger blocks only amortize grid overheads. Must
    # also fit the VMEM budget at this context length.
    for bn in (8, 4, 2):
        if n % bn == 0 and kernel_fits(n_caches, bn, tp, d, itemsize):
            return bn
    return 1


def decode_cache_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pos: jax.Array,
    n_head: int,
    *,
    anc_local: jax.Array | None = None,
    beam: int = 1,
    q_cs: jax.Array | None = None,
    k_cs: jax.Array | None = None,
    gate: jax.Array | None = None,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """One decode step of masked cache attention: (N, d) output.

    q (N, d) pre-scaled by d_head**-0.5; k/v (N, Tp, d) with
    Tp % TIME_ALIGN == 0; pos scalar int32 (positions > pos masked).
    With `anc_local` (N, Tp) and beam > 1, rows are read through the
    ancestry map within each beam group (exact one-hot semantics of
    `decode/beam.py`). PE dual-QK: pass q_cs/k_cs and the per-head f32
    `gate` (post-sigmoid). int8 caches (halved HBM traffic for the
    precomputed cross-KV): pass per-channel (d,)-f32 `k_scale`/`v_scale`
    and Tp % TIME_ALIGN_I8 == 0 (single-block kernel only, no PE).
    Callers should consult `use_decode_kernel` / `kernel_viable` and
    keep an XLA fallback. Shapes whose single-block cache blocks exceed
    the VMEM budget (e.g. the 3-cache PE variant at full 448 ctx)
    dispatch to the time-chunked online-softmax kernel.
    """
    pos = jnp.asarray(pos, jnp.int32)
    # off-TPU (forced AGACS_DECODE_KERNEL=pallas in tests) run interpreted
    interpret = interpret or jax.default_backend() != "tpu"
    n, tp, d = k.shape
    pe = q_cs is not None
    quant = k_scale is not None
    assert not (pe and quant), "int8 caches unsupported for the PE variant"
    if quant:
        k_scale = jnp.asarray(k_scale, jnp.float32).reshape(1, -1)
        v_scale = jnp.asarray(v_scale, jnp.float32).reshape(1, -1)
    n_caches = 3 if pe else 2
    if anc_local is None or beam <= 1:
        # independent rows: identity ancestry over small pseudo-groups.
        # Quantized caches use the bf16 row pick: the block-diagonal dot
        # FLOPs grow linearly with rows, and letting int8's smaller
        # blocks admit more rows doubles MXU work — measured to eat most
        # of the halved-DMA win at greedy 8x15 s (docs/PERF.md round-3).
        beam = _pick_rows(n, tp, d, n_caches, 2)
        anc_local = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None] % beam, (n, tp)
        )
    if pe:
        args = (gate, q, q_cs, k, k_cs, v, anc_local)
    elif quant:
        args = (q, k, v, k_scale, v_scale, anc_local)
    else:
        args = (q, k, v, anc_local)
    # SPMD: on a multi-device process the dispatch runs per-shard under
    # a custom_partitioning rule that shards whole beam groups along the
    # row dim (see _cp below) — without it GSPMD replicates the Mosaic
    # custom call's operands, all-gathering every layer's KV cache per
    # step. Single-device processes keep the direct dispatch: the
    # custom-call boundary forces default operand layouts and measurably
    # re-lays out the tuple caches (+11% greedy step time at 8x15 s).
    if jax.device_count() > 1:
        return _cp(n // beam, n_head, beam, pe, quant, interpret)(
            pos.reshape(1), *args)
    return _dispatch(pos, args, n_head, beam, pe, quant, interpret)


def _dispatch(pos, args, n_head, beam, pe, quant, interpret):
    k = args[3] if pe else args[1]
    n, tp, d = k.shape
    n_caches = 3 if pe else 2
    if not kernel_fits(n_caches, beam, tp, d, k.dtype.itemsize):
        # the chunked kernel is bf16-only; int8 callers guarantee fit
        # via kernel_fits before choosing the quantized path
        tc = pick_chunk(n_caches, beam, tp, d) if not quant else None
        if tc is not None:
            return _call_chunked(
                pos, args, n_head, beam, pe, tc, interpret=interpret
            )
    return _call(pos, args, n_head, beam, pe, quant, interpret=interpret)


def _group_sharding(sharding, mesh, rank, n, beam):
    """Row-dim-only sharding, dropped to replicated unless every shard
    holds whole beam groups (rows of a group must be co-resident)."""
    if not isinstance(sharding, NamedSharding):
        return NamedSharding(mesh, PartitionSpec(*([None] * rank)))
    spec = tuple(sharding.spec) + (None,) * (rank - len(sharding.spec))
    row = spec[0]
    if row is not None:
        axes = row if isinstance(row, tuple) else (row,)
        shards = 1
        for a in axes:
            shards *= sharding.mesh.shape[a]
        if n % (shards * beam):
            row = None
    return NamedSharding(sharding.mesh,
                         PartitionSpec(row, *([None] * (rank - 1))))


@functools.lru_cache(maxsize=None)
def _cp(g_groups, n_head, beam, pe, quant, interpret):
    """custom_partitioning wrapper for the decode kernels: rows (= beam
    groups) shard along the data axis, everything else replicated. The
    shardy rule's compound row factor (g j) with j = beam pinned
    need-replication guarantees shard boundaries align to groups; the
    GSPMD-path callbacks enforce the same via _group_sharding."""

    def impl(pos1, *args):
        return _dispatch(pos1[0], args, n_head, beam, pe, quant, interpret)

    f = custom_partitioning(impl)
    # arg ranks; repl_idx marks operands that are always fully
    # replicated (pos / PE gate / int8 dequant scales)
    if pe:
        ranks = [1, 1, 2, 2, 3, 3, 3, 2]
        repl_idx = {0, 1}
        q_idx, k_idx = 2, 4
    elif quant:
        ranks = [1, 2, 3, 3, 2, 2, 2]
        repl_idx = {0, 4, 5}
        q_idx, k_idx = 1, 2
    else:
        ranks = [1, 2, 3, 3, 2]
        repl_idx = {0}
        q_idx, k_idx = 1, 2

    def _shardings(shs, mesh, k_shape):
        out = []
        for i, (s, r) in enumerate(zip(shs, ranks)):
            if i in repl_idx:
                out.append(NamedSharding(mesh, PartitionSpec(
                    *([None] * r))))
            else:
                out.append(_group_sharding(s, mesh, r, k_shape[0], beam))
        return tuple(out)

    def infer(mesh, arg_shapes, result_shape):
        k_shape = arg_shapes[k_idx].shape
        return _group_sharding(arg_shapes[q_idx].sharding, mesh, 2,
                               k_shape[0], beam)

    def prop(mesh, user_shape):
        return _group_sharding(user_shape.sharding, mesh, 2,
                               user_shape.shape[0], beam)

    def partition(mesh, arg_shapes, result_shape):
        k_shape = arg_shapes[k_idx].shape
        arg_sh = _shardings([a.sharding for a in arg_shapes], mesh, k_shape)
        out_sh = _group_sharding(result_shape.sharding, mesh, 2,
                                 k_shape[0], beam)

        def lower(pos1, *args):
            k_l = args[k_idx - 1]
            if k_l.shape[0] % beam == 0:
                return impl(pos1, *args)
            # misaligned local shard (shouldn't happen given the rule):
            # fall back to the exact jnp oracle
            if pe:
                gate, q, q_cs, k, k_cs, v, anc = args
                return decode_cache_attention_ref(
                    q, k, v, pos1[0], n_head, anc_local=anc, beam=beam,
                    q_cs=q_cs, k_cs=k_cs, gate=gate)
            if quant:
                q, k, v, ks, vs, anc = args
                return decode_cache_attention_ref(
                    q, k, v, pos1[0], n_head, anc_local=anc, beam=beam,
                    k_scale=ks, v_scale=vs)
            q, k, v, anc = args
            return decode_cache_attention_ref(
                q, k, v, pos1[0], n_head, anc_local=anc, beam=beam)

        return mesh, lower, out_sh, arg_sh

    # row term: whole groups must be co-resident, so only the group
    # factor g may shard. Shardy rejects size-1 factors inside compound
    # terms, so beam == 1 uses a plain shardable row factor and a single
    # group pins the rows replicated.
    # need_replication factors must be listed in order of first
    # appearance in the rule (shardy requires sorted factor indices):
    # p, [h], [j], d, t, [u]
    sizes = {}
    repl = ["p"] + (["h"] if pe else [])
    if beam == 1:
        row = "n"
    elif g_groups == 1:
        row = "j"
        repl.append("j")
    else:
        row = "(g j)"
        sizes = {"g": g_groups, "j": beam}
        repl.append("j")
    repl += ["d", "t"]
    if pe:
        rule = (f"p, h, {row} d, {row} d, {row} t d, {row} t d, {row} t d,"
                f" {row} t -> {row} d")
    elif quant:
        rule = (f"p, {row} d, {row} t d, {row} t d, u d, u d, {row} t"
                f" -> {row} d")
        repl.append("u")
    else:
        rule = f"p, {row} d, {row} t d, {row} t d, {row} t -> {row} d"
    f.def_partition(
        partition=partition,
        propagate_user_sharding=prop,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=tuple(repl),
        **sizes,
    )
    return f


def decode_cache_attention_ref(
    q, k, v, pos, n_head, *, anc_local=None, beam=1, q_cs=None, k_cs=None,
    gate=None, k_scale=None, v_scale=None
):
    """Pure-jnp oracle with identical semantics (tests/CPU)."""
    if k_scale is not None:
        k = (k.astype(jnp.float32)
             * jnp.asarray(k_scale, jnp.float32).reshape(1, 1, -1)
             ).astype(q.dtype)
        v = (v.astype(jnp.float32)
             * jnp.asarray(v_scale, jnp.float32).reshape(1, 1, -1)
             ).astype(q.dtype)
    n, tp, d = k.shape
    d_head = d // n_head
    hm = (
        (jnp.arange(d)[:, None] // d_head) == jnp.arange(n_head)[None, :]
    ).astype(k.dtype)

    def logits(q_r, k_r):
        qb = q_r[:, :, None] * hm[None]
        return jnp.einsum("ntd,ndh->nth", k_r, qb).astype(jnp.float32)

    if anc_local is not None and beam > 1:
        g_n = n // beam
        kg = k.reshape(g_n, beam, tp, d)
        qg = q.reshape(g_n, beam, d)
        sel = jax.nn.one_hot(
            anc_local.reshape(g_n, beam, tp), beam, dtype=jnp.float32
        )  # (g, q, t, j)

        def glogits(qg_, kg_):
            qb = qg_[..., None] * hm[None, None]
            s = jnp.einsum("gjtd,gqdh->gjtqh", kg_, qb).astype(jnp.float32)
            return jnp.einsum("gjtqh,gqtj->gqth", s, sel)

        s = glogits(qg, kg)
        if q_cs is not None:
            gt = gate.astype(jnp.float32)[None, None, None, :]
            s = (1.0 - gt) * s + gt * glogits(
                q_cs.reshape(g_n, beam, d), k_cs.reshape(g_n, beam, tp, d)
            )
        t_ids = jnp.arange(tp)[None, None, :, None]
        s = jnp.where(t_ids <= pos, s, -1.0e30)
        p = jax.nn.softmax(s, axis=2)  # (g, q, t, h)
        w = jnp.einsum("gqth,gqtj->gqjth", p, sel)
        vg = v.reshape(g_n, beam, tp, n_head, d_head)
        o = jnp.einsum(
            "gqjth,gjthc->gqhc", w.astype(v.dtype), vg
        ).reshape(g_n, beam, d)
        return o.reshape(n, d).astype(q.dtype)

    s = logits(q, k)
    if q_cs is not None:
        gt = gate.astype(jnp.float32)[None, None, :]
        s = (1.0 - gt) * s + gt * logits(q_cs, k_cs)
    t_ids = jnp.arange(tp)[None, :, None]
    s = jnp.where(t_ids <= pos, s, -1.0e30)
    p = jax.nn.softmax(s, axis=1)  # (n, t, h)
    vg = v.reshape(n, tp, n_head, d_head)
    o = jnp.einsum("nth,nthc->nhc", p.astype(v.dtype), vg).reshape(n, d)
    return o.astype(q.dtype)


# ---------------------------------------------------------------------------
# shared-cache grouped attention: beam rows attending to ONE cache row
# ---------------------------------------------------------------------------


def shared_kernel_fits(tp: int, d: int, itemsize: int = 2) -> bool:
    """Do one group's double-buffered (Tp, d) k+v blocks fit VMEM?"""
    return kernel_fits(2, 1, tp, d, itemsize)


def _make_kernel_shared(n_head, j, quant):
    """Grouped cross-attention: each grid step owns one cache row (one
    utterance's precomputed cross-K/V) and the j beam queries that share
    it. Unlike `_make_kernel` there is no ancestry — all j queries read
    the SAME (Tp, d) cache block, so the beam path stops paying beam x
    the cross-KV HBM traffic the per-row layout would cost, and the score
    /value contractions stay single MXU dots. quant: int8 caches with
    per-channel f32 scales, dequantized for free (k's scale folds into
    the query matrix; v's applies post-reduction — see _make_kernel)."""

    def kern(pos_ref, *refs):
        if quant:
            q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref = refs
            ks_ref = vs_ref = None
        pos = pos_ref[0]
        tp, d = k_ref.shape  # ONE group's cache block
        h = n_head
        m = j * h
        d_head = d // h
        f32 = jnp.float32
        kdt = jnp.bfloat16 if quant else k_ref.dtype

        colq = (
            jax.lax.broadcasted_iota(jnp.int32, (j, m), 1) // h
            == jax.lax.broadcasted_iota(jnp.int32, (j, m), 0)
        ).astype(f32)
        hrep = (
            jax.lax.broadcasted_iota(jnp.int32, (d, m), 0) // d_head
            == jax.lax.broadcasted_iota(jnp.int32, (d, m), 1) % h
        ).astype(f32)

        qr = q_ref[0].astype(f32)  # (j, d)
        if quant:
            qr = qr * ks_ref[:]
        qb = (
            jax.lax.dot_general(
                qr.T, colq, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            * hrep
        ).astype(kdt)  # (d, m) block-diagonal query matrix

        k_mat = k_ref[:].astype(kdt) if quant else k_ref[:]
        lg = jax.lax.dot_general(
            k_mat, qb, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (Tp, m)
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (tp, m), 0)
        lg = jnp.where(t_ids <= pos, lg, -1.0e30)
        mx = jnp.max(lg, axis=0, keepdims=True)
        ex = jnp.exp(lg - mx)
        p = ex / jnp.sum(ex, axis=0, keepdims=True)  # (Tp, m) f32

        v_mat = v_ref[:].astype(kdt) if quant else v_ref[:]
        big = jax.lax.dot_general(
            p.astype(kdt).T, v_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (m, d)
        if quant:
            big = big * vs_ref[:]
        o = jax.lax.dot_general(
            colq, big * hrep.T, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (j, d)
        o_ref[0] = o.astype(o_ref.dtype)

    return kern


@functools.partial(
    jax.jit, static_argnames=("n_head", "beam", "quant", "interpret")
)
def _call_shared(pos, args, n_head, beam, quant=False, interpret=False):
    if quant:
        q, k, v, ks, vs = args
    else:
        q, k, v = args
    g, tp, d = k.shape
    kern = _make_kernel_shared(n_head, beam, quant)
    cache = pl.BlockSpec(
        (tp, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    k = k.reshape(g * tp, d)
    v = v.reshape(g * tp, d)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        _row_spec(beam, d),
        cache, cache,
    ]
    ins = [pos.reshape(1), q.reshape(g, beam, d), k, v]
    if quant:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k scale (1, d)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v scale (1, d)
        ]
        ins += [
            ks.reshape(1, d).astype(jnp.float32),
            vs.reshape(1, d).astype(jnp.float32),
        ]
    out = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=in_specs,
        out_specs=_row_spec(beam, d),
        out_shape=jax.ShapeDtypeStruct((g, beam, d), q.dtype),
        interpret=interpret,
    )(*ins)
    return out.reshape(g * beam, d)


def decode_shared_cache_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pos: jax.Array,
    n_head: int,
    beam: int,
    *,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Grouped masked cache attention: (G*beam, d) queries over (G, Tp, d)
    shared caches -> (G*beam, d). Beam rows are group-major (row g*beam+i
    is utterance g's beam slot i). q pre-scaled by d_head**-0.5; positions
    > pos are masked (pass Tp_valid - 1 to mask tile padding). int8
    caches: per-channel (d,)-f32 k_scale/v_scale. Callers should check
    `shared_kernel_fits` (no chunked fallback) and keep an XLA path."""
    pos = jnp.asarray(pos, jnp.int32)
    interpret = interpret or jax.default_backend() != "tpu"
    g, tp, d = k.shape
    quant = k_scale is not None
    if quant:
        k_scale = jnp.asarray(k_scale, jnp.float32).reshape(1, -1)
        v_scale = jnp.asarray(v_scale, jnp.float32).reshape(1, -1)
        args = (q, k, v, k_scale, v_scale)
    else:
        args = (q, k, v)
    if jax.device_count() > 1:
        return _cp_shared(g, n_head, beam, quant, interpret)(
            pos.reshape(1), *args)
    return _call_shared(pos, args, n_head, beam, quant, interpret=interpret)


def _shared_group_sharding(sharding, mesh, rank, rows, per_group):
    """Row-dim-only sharding for the shared-cache kernel operands, where
    the row dim holds `rows` items in units of `per_group` (beam for q,
    1 for the caches); dropped to replicated on misalignment."""
    if not isinstance(sharding, NamedSharding):
        return NamedSharding(mesh, PartitionSpec(*([None] * rank)))
    spec = tuple(sharding.spec) + (None,) * (rank - len(sharding.spec))
    row = spec[0]
    if row is not None:
        axes = row if isinstance(row, tuple) else (row,)
        shards = 1
        for a in axes:
            shards *= sharding.mesh.shape[a]
        if rows % (shards * per_group):
            row = None
    return NamedSharding(sharding.mesh,
                         PartitionSpec(row, *([None] * (rank - 1))))


@functools.lru_cache(maxsize=None)
def _cp_shared(g_groups, n_head, beam, quant, interpret):
    """custom_partitioning for the shared-cache kernel: groups shard
    along the data axis (q in whole beam blocks, caches by group row),
    scales/pos replicated."""

    def impl(pos1, *args):
        return _call_shared(pos1[0], args, n_head, beam, quant, interpret)

    f = custom_partitioning(impl)
    ranks = [1, 2, 3, 3] + ([2, 2] if quant else [])
    repl_idx = {0} | ({4, 5} if quant else set())

    def _shardings(shs, mesh, n_rows):
        out = []
        for i, (s, r) in enumerate(zip(shs, ranks)):
            if i in repl_idx:
                out.append(NamedSharding(mesh, PartitionSpec(
                    *([None] * r))))
            else:
                per = beam if r == 2 else 1
                rows = n_rows if r == 2 else n_rows // beam
                out.append(_shared_group_sharding(s, mesh, r, rows, per))
        return tuple(out)

    def infer(mesh, arg_shapes, result_shape):
        n_rows = arg_shapes[1].shape[0]
        return _shared_group_sharding(
            arg_shapes[1].sharding, mesh, 2, n_rows, beam)

    def prop(mesh, user_shape):
        return _shared_group_sharding(
            user_shape.sharding, mesh, 2, user_shape.shape[0], beam)

    def partition(mesh, arg_shapes, result_shape):
        n_rows = arg_shapes[1].shape[0]
        arg_sh = _shardings([a.sharding for a in arg_shapes], mesh, n_rows)
        out_sh = _shared_group_sharding(
            result_shape.sharding, mesh, 2, n_rows, beam)

        def lower(pos1, *args):
            q_l, k_l = args[0], args[1]
            if q_l.shape[0] == k_l.shape[0] * beam:
                return impl(pos1, *args)
            # misaligned shard: exact jnp oracle
            if quant:
                q, k, v, ks, vs = args
                return decode_shared_cache_attention_ref(
                    q, k, v, pos1[0], n_head, beam, k_scale=ks, v_scale=vs)
            q, k, v = args
            return decode_shared_cache_attention_ref(
                q, k, v, pos1[0], n_head, beam)

        return mesh, lower, out_sh, arg_sh

    # q rows as (g j) with j = beam pinned; caches shard their group dim
    # g directly, tied to q's g factor
    sizes = {}
    repl = ["p"]
    if g_groups == 1:
        row = "j"
        repl.append("j")
        cache_row = "c"
        repl.append("c")
    else:
        row = "(g j)"
        # g also names the caches' whole group dim, so its size is
        # inferable — only the compound-only factor j takes a size
        sizes = {"j": beam}
        repl.append("j")
        cache_row = "g"
    repl += ["d", "t"]
    if quant:
        rule = (f"p, {row} d, {cache_row} t d, {cache_row} t d, u d, u d"
                f" -> {row} d")
        repl.append("u")
    else:
        rule = f"p, {row} d, {cache_row} t d, {cache_row} t d -> {row} d"
    f.def_partition(
        partition=partition,
        propagate_user_sharding=prop,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=tuple(repl),
        **sizes,
    )
    return f


def decode_shared_cache_attention_ref(
    q, k, v, pos, n_head, beam, *, k_scale=None, v_scale=None
):
    """Pure-jnp oracle with identical semantics (tests/CPU)."""
    if k_scale is not None:
        k = (k.astype(jnp.float32)
             * jnp.asarray(k_scale, jnp.float32).reshape(1, 1, -1)
             ).astype(q.dtype)
        v = (v.astype(jnp.float32)
             * jnp.asarray(v_scale, jnp.float32).reshape(1, 1, -1)
             ).astype(q.dtype)
    g, tp, d = k.shape
    d_head = d // n_head
    hm = (
        (jnp.arange(d)[:, None] // d_head) == jnp.arange(n_head)[None, :]
    ).astype(k.dtype)
    qg = q.reshape(g, beam, d)
    qb = qg[..., None] * hm[None, None]  # (g, j, d, h)
    s = jnp.einsum("gtd,gjdh->gjth", k, qb).astype(jnp.float32)
    t_ids = jnp.arange(tp)[None, None, :, None]
    s = jnp.where(t_ids <= pos, s, -1.0e30)
    p = jax.nn.softmax(s, axis=2)  # (g, j, t, h)
    vg = v.reshape(g, tp, n_head, d_head)
    o = jnp.einsum(
        "gjth,gthc->gjhc", p.astype(v.dtype), vg
    ).reshape(g * beam, d)
    return o.astype(q.dtype)
