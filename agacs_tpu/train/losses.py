"""Sequence losses with exact reference numerics.

  * add_sos_eos — espnet add_sos_eos (nets/pytorch_backend/transformer/
    add_sos_eos.py:12): ys_in = [sos]+y padded with EOS, ys_out = y+[eos]
    padded with ignore_id; vectorized/static-shape instead of per-sequence
    list ops.
  * label_smoothing_loss — espnet LabelSmoothingLoss
    (label_smoothing_loss.py:13): KL(true_dist || softmax) with
    true_dist = smoothing/(V-1) off-target, confidence on target,
    normalized by batch size (or token count), ignore_id masked.
  * th_accuracy — espnet nets_utils.py:304.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_ID = -1


def add_sos_eos(
    ys_pad: jax.Array, sos: int, eos: int, ignore_id: int = IGNORE_ID
) -> tuple[jax.Array, jax.Array]:
    """(B, T) ignore-padded targets -> (ys_in (B,T+1), ys_out (B,T+1)).

    ys_in: [sos, y...] with ignore positions replaced by eos (pad_list
    fill value in the reference); ys_out: [y..., eos] with ignore padding.
    Assumes each row's valid tokens are a prefix (true for all pipelines).
    """
    b, t = ys_pad.shape
    valid = ys_pad != ignore_id
    lens = jnp.sum(valid, axis=1)  # (B,)

    ys_clean = jnp.where(valid, ys_pad, eos)
    ys_in = jnp.concatenate(
        [jnp.full((b, 1), sos, ys_pad.dtype), ys_clean], axis=1
    )

    ys_out = jnp.concatenate(
        [ys_pad, jnp.full((b, 1), ignore_id, ys_pad.dtype)], axis=1
    )
    pos = jnp.arange(t + 1)[None, :]
    ys_out = jnp.where(pos == lens[:, None], eos, ys_out)
    ys_out = jnp.where(pos > lens[:, None], ignore_id, ys_out)
    return ys_in, ys_out


def label_smoothing_loss(
    logits: jax.Array,
    targets: jax.Array,
    smoothing: float = 0.1,
    ignore_id: int = IGNORE_ID,
    normalize_length: bool = False,
) -> jax.Array:
    """KL-form label-smoothed CE, value-identical to the reference.

    logits: (B, T, V) fp32; targets: (B, T) with ignore_id padding.
    Denominator = batch size (normalize_length=False, the recipes' default)
    or valid token count.
    """
    b, t, v = logits.shape
    x = logits.reshape(-1, v)
    tgt = targets.reshape(-1)
    ignore = tgt == ignore_id
    tgt_safe = jnp.where(ignore, 0, tgt)

    off = smoothing / (v - 1)
    conf = 1.0 - smoothing

    # KLDivLoss(log_probs, true_dist) summed over classes:
    #   Σ_c p_c (log p_c - log q_c)
    # with p = off everywhere except conf at the target. Expanded so no
    # (N, V) log-softmax materializes in HBM:
    #   Σ_c log_softmax(x)_c = Σ_c x_c − V·lse(x)
    #   log_softmax(x)_t     = x_t − lse(x)
    entropy = (v - 1) * off * jnp.log(off) + conf * jnp.log(conf)
    lse = jax.nn.logsumexp(x, axis=-1)
    row_sum = jnp.sum(x, axis=-1)
    x_t = jnp.take_along_axis(x, tgt_safe[:, None], axis=-1).squeeze(-1)
    cross = off * (row_sum - v * lse) + (conf - off) * (x_t - lse)
    kl = entropy - cross
    kl = jnp.where(ignore, 0.0, kl)

    denom = jnp.where(
        normalize_length, jnp.maximum(jnp.sum(~ignore), 1), b
    ).astype(jnp.float32)
    return jnp.sum(kl) / denom


def th_accuracy(
    logits: jax.Array, targets: jax.Array, ignore_id: int = IGNORE_ID
) -> jax.Array:
    """Token accuracy over non-ignored positions (nets_utils.py:304)."""
    pred = jnp.argmax(logits, axis=-1)
    mask = targets != ignore_id
    correct = jnp.sum((pred == targets) & mask)
    return correct / jnp.maximum(jnp.sum(mask), 1)


def ctc_loss(
    logits: jax.Array,
    logit_lens: jax.Array,
    labels: jax.Array,
    label_lens: jax.Array,
    blank_id: int = 0,
) -> jax.Array:
    """Batch-mean CTC loss (reference `espnet2/asr/ctc.py:6` wraps
    torch.nn.CTCLoss(reduction="sum") / B). Uses optax's TPU-friendly
    ctc_loss (logits (B, T, V)).

    Infeasible utterances (label longer than the frame sequence) are
    zeroed, matching torch CTCLoss(zero_infinity=True) (`ctc.py:39-41`) —
    optax would otherwise hand back a huge finite ~|log_epsilon| loss that
    dominates the batch gradient."""
    import optax

    b, t, _ = logits.shape
    logit_pad = (jnp.arange(t)[None, :] >= logit_lens[:, None]).astype(jnp.float32)
    lmax = labels.shape[1]
    label_pad = (jnp.arange(lmax)[None, :] >= label_lens[:, None]).astype(jnp.float32)
    labels_safe = jnp.where(label_pad > 0, 0, labels)
    per_seq = optax.ctc_loss(
        logits, logit_pad, labels_safe, label_pad, blank_id=blank_id
    )
    per_seq = jnp.where(label_lens <= logit_lens, per_seq, 0.0)
    return jnp.mean(per_seq)
