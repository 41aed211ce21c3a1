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


NEG_LL = -1e30  # log-domain "impossible" (finite: -inf - -inf would NaN)


def ctc_loss_from_planes(
    lp_blank: jax.Array,
    lp_label: jax.Array,
    logit_lens: jax.Array,
    labels: jax.Array,
    label_lens: jax.Array,
) -> jax.Array:
    """CTC negative log-likelihood from the TWO log-prob planes the
    lattice actually reads — lp_blank (B, T) and lp_label (B, T, U) (the
    label-token log-probs) — so callers never materialize (B, T, V)
    (ops/vocab_lse.py; the same decomposition rnnt_loss_from_blank_emit
    uses for the transducer).

    Standard alpha recursion over the extended sequence
    [blank, l1, blank, ..., lU, blank] (S = 2U+1):
      alpha[t, s] = em[t, s] + logaddexp(alpha[t-1, s], alpha[t-1, s-1],
                                         alpha[t-1, s-2] if skip allowed)
    with the skip into label state u allowed iff labels[u] != labels[u-1].
    Value-matches `ctc_loss` (optax dense path) to f32 tolerance; same
    zero_infinity masking.
    """
    b, t_max, u_max = lp_label.shape
    s_max = 2 * u_max + 1

    # emission table per t: even s -> blank, odd s=2u+1 -> label u
    def emissions(lpb_t, lpl_t):
        # lpb_t (B,), lpl_t (B, U) -> (B, S)
        even = jnp.broadcast_to(lpb_t[:, None], (b, u_max + 1))
        pairs = jnp.stack([even[:, :u_max], lpl_t], axis=2).reshape(
            b, 2 * u_max
        )
        return jnp.concatenate([pairs, even[:, u_max:]], axis=1)

    # skip-transition mask over s (B, S): odd s=2u+1 with u>=1 and
    # labels[u] != labels[u-1]
    s_ids = jnp.arange(s_max)
    is_label = (s_ids % 2) == 1
    u_of_s = jnp.maximum((s_ids - 1) // 2, 0)
    lab_s = jnp.take_along_axis(
        labels, jnp.broadcast_to(u_of_s[None, :], (b, s_max)), axis=1
    )
    lab_prev = jnp.take_along_axis(
        labels,
        jnp.broadcast_to(jnp.maximum(u_of_s - 1, 0)[None, :], (b, s_max)),
        axis=1,
    )
    skip_ok = (
        is_label[None, :] & (s_ids[None, :] >= 3) & (lab_s != lab_prev)
    )

    def shift1(a):
        return jnp.concatenate(
            [jnp.full((b, 1), NEG_LL, a.dtype), a[:, :-1]], axis=1
        )

    def shift2(a):
        return jnp.concatenate(
            [jnp.full((b, 2), NEG_LL, a.dtype), a[:, :-2]], axis=1
        )

    def lae(x, y):
        m = jnp.maximum(x, y)
        return m + jnp.log1p(jnp.exp(-jnp.abs(x - y)))

    lpb_rows = jnp.moveaxis(lp_blank, 1, 0)      # (T, B)
    lpl_rows = jnp.moveaxis(lp_label, 1, 0)      # (T, B, U)

    em0 = emissions(lpb_rows[0], lpl_rows[0])
    alpha0 = jnp.where(s_ids[None, :] < 2, em0, NEG_LL)
    # t=0 row exists only if the utterance has frames at all
    alpha0 = jnp.where(logit_lens[:, None] > 0, alpha0, NEG_LL)

    def step(alpha, xs):
        t, lpb_t, lpl_t = xs
        em = emissions(lpb_t, lpl_t)
        prev = lae(alpha, shift1(alpha))
        prev = lae(prev, jnp.where(skip_ok, shift2(alpha), NEG_LL))
        new = em + prev
        # freeze rows past their utterance length
        new = jnp.where(t < logit_lens[:, None], new, alpha)
        return new, None

    ts = jnp.arange(1, t_max)
    alpha, _ = jax.lax.scan(
        step, alpha0, (ts, lpb_rows[1:], lpl_rows[1:])
    )

    # ll = logaddexp(alpha[S_end], alpha[S_end-1]),
    # S_end = 2*label_len (final blank); S_end-1 only if label_len > 0
    s_end = 2 * label_lens
    a_end = jnp.take_along_axis(alpha, s_end[:, None], axis=1)[:, 0]
    a_last = jnp.take_along_axis(
        alpha, jnp.maximum(s_end - 1, 0)[:, None], axis=1
    )[:, 0]
    ll = jnp.where(label_lens > 0, lae(a_end, a_last), a_end)
    nll = -ll
    feasible = (label_lens <= logit_lens) & (logit_lens > 0)
    nll = jnp.where(feasible, nll, 0.0)
    return jnp.mean(nll)


def ctc_loss_streaming(
    enc: jax.Array,
    w: jax.Array,
    bias: jax.Array,
    logit_lens: jax.Array,
    labels: jax.Array,
    label_lens: jax.Array,
    blank_id: int = 0,
) -> jax.Array:
    """CTC loss straight from encoder output + head weights, with the
    (B, T, V) logits never leaving VMEM.

      lse      — streaming Pallas kernel (ops/vocab_lse.py)
      gathers  — exact XLA matmuls against the blank + label COLUMNS of W
                 (a (d, U+1)-sized gather; scatter-add grads come from
                 take/einsum autodiff)

    Value-parity with `ctc_loss(dense logits)` is tested in
    tests/test_vocab_lse.py. enc: (B, T, d); w: (d, V) f32 params;
    bias: (V,).
    """
    from agacs_tpu.ops import vocab_lse

    b, t, d = enc.shape
    labels_safe = jnp.where(labels == IGNORE_ID, 0, labels)
    cols = jnp.concatenate(
        [jnp.full((b, 1), blank_id, labels.dtype), labels_safe], axis=1
    )  # (B, U+1)
    wc = w.astype(enc.dtype)
    lse = vocab_lse.streaming_lse(
        enc.reshape(b * t, d), wc, bias.astype(jnp.float32),
        vocab_lse.interpret_requested(),
    ).reshape(b, t)
    # W[:, cols]: (B, d, U+1) — tiny, exact
    w_g = jnp.moveaxis(jnp.take(wc.T, cols, axis=0), 1, 2)
    zg = jnp.einsum(
        "btd,bdu->btu", enc, w_g, preferred_element_type=jnp.float32
    ) + bias[cols][:, None, :]
    lp_blank = zg[..., 0] - lse
    lp_label = zg[..., 1:] - lse[..., None]
    return ctc_loss_from_planes(
        lp_blank, lp_label, logit_lens, labels_safe, label_lens
    )
