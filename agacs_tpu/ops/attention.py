"""Fused attention dispatch: Pallas flash attention on TPU, einsum fallback.

The hot op of the whole framework: encoder self-attention over up to 1500
audio positions, 12 heads × 12 layers. The einsum path materializes the
(B, h, T, T) fp32 score tensor in HBM per layer (what the reference's
torch code does on GPU); the flash path (JAX's bundled Pallas TPU kernels,
with their custom fwd/bwd) keeps score blocks in VMEM — measured ~17%
faster fwd+bwd at T=768 on v5e and O(T) instead of O(T²) activation
memory, which is what allows large batches.

Sequence lengths are padded to a block multiple with masked key rows
(whisper attends over ALL positions including audio padding — reference
applies no encoder mask — so only the kernel's own padding is masked).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _flash_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def _flash_mod():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa


def _pick_block(t: int) -> tuple[int, int]:
    """(block, padded_len): prefer big blocks, then minimal padding —
    small blocks underutilize the MXU (measured: blk128 is ~50% slower
    than blk384 at T=768 on v5e)."""
    best = None
    for b in (512, 384, 256, 128):
        pad = -(-t // b) * b
        waste = pad - t
        if best is None or waste < best[2] - 64:  # allow 64 waste per block step up
            best = (b, pad, waste)
    return best[0], best[1]


def flash_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    sm_scale: float = 1.0,
) -> jax.Array:
    """(B, h, Tq, d) x (B, h, Tk, d) -> (B, h, Tq, d), fp32 softmax inside.

    Pads Tq/Tk up to a supported block multiple; padded KEY rows are masked
    via segment ids, padded query rows are dropped from the output.
    """
    fa = _flash_mod()
    b, h, tq, d = q.shape
    tk = k.shape[2]

    blk_q, tq_pad = _pick_block(tq)
    blk_k, tk_pad = _pick_block(tk)

    if tq_pad != tq or tk_pad != tk:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tq_pad - tq), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, tk_pad - tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, tk_pad - tk), (0, 0)))
        q_seg = (jnp.arange(tq_pad) < tq).astype(jnp.int32)[None, :].repeat(b, 0)
        kv_seg = (jnp.arange(tk_pad) < tk).astype(jnp.int32)[None, :].repeat(b, 0)
        segment_ids = fa.SegmentIds(q=q_seg, kv=kv_seg)
    else:
        segment_ids = None

    bs = fa.BlockSizes(
        block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1,
        block_q_major_dkv=blk_q, block_k_major_dkv=blk_k,
        block_k_dkv=blk_k, block_q_dkv=blk_q,
        block_k_major_dq=blk_k, block_k_dq=blk_k, block_q_dq=blk_q,
    )
    out = fa.flash_attention(
        q, k, v, causal=causal, sm_scale=sm_scale,
        segment_ids=segment_ids, block_sizes=bs,
    )
    return out[:, :, :tq, :]


def streaming_lse(
    q: jax.Array,
    k: jax.Array,
    causal: bool = False,
    block: int = 512,
) -> jax.Array:
    """Per-row logsumexp of q·kᵀ in fp32 WITHOUT materializing the (Tq, Tk)
    score tensor in HBM: `lax.scan` over key blocks with a running
    max/denominator (the flash-attention recurrence, statistics only).

    With the analytic language-column scores this yields post-softmax
    probability columns — p[:, c] = exp(qk[:, c] − lse) — in O(T·block)
    memory, deleting head counting's full-map einsum fallback
    (adapt/head_selection.py, whisper mha need_probs).

    q, k: (B, h, T, d) PRE-scaled (same convention as the other paths).
    Returns (B, h, Tq) fp32.
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    block = min(block, tk)
    n_blk = -(-tk // block)
    pad = n_blk * block - tk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kb = k.reshape(b, h, n_blk, block, d).transpose(2, 0, 1, 3, 4)
    col0 = jnp.arange(n_blk) * block
    rows = jnp.arange(tq)

    def body(carry, inp):
        m, l = carry  # (B, h, Tq) running max / denominator
        kblk, c0 = inp
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kblk).astype(jnp.float32)
        cols = c0 + jnp.arange(block)
        invalid = cols[None, :] >= tk
        if causal:
            invalid = invalid | (cols[None, :] > rows[:, None])
        s = jnp.where(invalid[None, None], -jnp.inf, s)
        bm = jnp.max(s, axis=-1)
        new_m = jnp.maximum(m, bm)
        safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
        l = l * jnp.exp(m - safe_m) * jnp.isfinite(m) + jnp.sum(
            jnp.exp(s - safe_m[..., None]), axis=-1
        )
        return (new_m, l), None

    m0 = jnp.full((b, h, tq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, tq), jnp.float32)
    (m, l), _ = jax.lax.scan(body, (m0, l0), (kb, col0))
    return m + jnp.log(jnp.maximum(l, 1e-38))


def einsum_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    sm_scale: float = 1.0,
) -> jax.Array:
    """Reference-numerics path: fp32 scores + softmax (model.py:102-109)."""
    qk = (jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm_scale).astype(jnp.float32)
    if causal:
        t_q, t_k = qk.shape[-2], qk.shape[-1]
        qk = qk + jnp.triu(jnp.full((t_q, t_k), -jnp.inf, jnp.float32), k=1)
    w = jax.nn.softmax(qk, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)


def packed_mha_eligible(
    q: jax.Array, k: jax.Array, n_head: int, causal: bool, backend: str
) -> bool:
    """True when the packed whole-KV-in-VMEM training kernel
    (ops/flash_train.packed_flash_mha) should take this attention: the
    (B, T, D)-layout Pallas kernel with a custom VJP that keeps the
    (T, T) scores on-chip in fwd AND bwd. Eligibility: TPU, non-causal
    self-attention, bf16, d_head=64, flash_train.MIN_T <= T <= MAX_T."""
    if backend not in ("auto", "vmem") or causal:
        return False
    if not _flash_available():
        return False
    from agacs_tpu.ops.flash_train import supports

    return supports(q.shape[1], k.shape[1], q.shape[-1], n_head, q.dtype)


def fused_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    sm_scale: float = 1.0,
    backend: str = "auto",
) -> jax.Array:
    """backend: 'auto' (flash on TPU when shapes allow), 'flash', 'einsum'.

    NOTE: the packed whole-KV Pallas kernel (ops/flash_train.py) is
    dispatched UPSTREAM of this head-split API (models/whisper.mha via
    `packed_mha_eligible`) because its entire advantage is consuming the
    (B, T, D) layout before the head-split transposes.
    """
    if backend == "einsum":
        return einsum_mha(q, k, v, causal, sm_scale)
    if backend == "flash":
        return flash_mha(q, k, v, causal, sm_scale)
    # auto: measured crossover on v5e — XLA's fused einsum attention wins at
    # short/medium T (score traffic still fits) and at small B·h (the flash
    # grid underutilizes the chip: tiny B4·h6·T1500 flash 23 ms vs einsum
    # 15 ms); the flash kernel wins once score tensors get big AND the grid
    # is busy (small B8·h12·T1536: 3.9 vs 4.7 ms fwd) and is O(T) memory.
    b, h, tq, _ = q.shape
    if _flash_available() and max(tq, k.shape[2]) >= 1024 and b * h >= 64:
        return flash_mha(q, k, v, causal, sm_scale)
    return einsum_mha(q, k, v, causal, sm_scale)
