"""Attention-guided code-switching loss, computed from language COLUMNS only.

The reference materializes every decoder self-attention map
(layer, B, head, T, T) and then reads just two columns — the <|zh|>/<|en|>
prompt positions — in `calculate_cs_loss`
(`espnet2/asr/espnet_model.py:463-530`, slicing `[..., 1:3]` at :506).
Here the model already emits exactly those two pre-softmax score columns
(`whisper_decode(..., collect_lang_cols=True)` → `qk_cols`:
(L, B, h, T, 2)), so the loss is O(T) per head instead of O(T²) and no
map transfer/materialization happens at all.

Semantics replicated exactly (same target pattern, inf masking,
per-head nonzero-mean, head mask, batch-mean-of-head-sum):

  target rows (c = c_val_attention, default 0.6 — note these are values on
  the PRE-SOFTMAX logit scale):
    prompt:  [[0,0], [c,0], [0,c], [0,0], [0,0]]   (sot, zh, en, task, nots)
    text:    [c,0] for Mandarin tokens, [0,c] for English tokens,
             [c,c] for space-only tokens and the first <|endoftext|>
    padding: [inf, inf]  (masked out)

  English-ness of a token = all chars ASCII letters after removing the
  byte-level space marker (espnet_model.py:234-235) — punctuation counts
  as Mandarin, exactly like the reference.

The token→language attribution runs on host (`attention_target_labels`,
tokenizer is not jittable); the loss itself is pure jnp and jit/pjit-safe.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from agacs_tpu.text.tokenizer import WhisperTokenizer

# per-row language labels (host-computed, device-consumed)
LANG_NONE = 0  # target [0, 0]
LANG_ZH = 1    # target [c, 0]
LANG_EN = 2    # target [0, c]
LANG_BOTH = 3  # target [c, c] (space-only tokens, first <|endoftext|>)
LANG_PAD = 4   # target [inf, inf] -> masked

# The shipped hardcoded 50%-of-heads mask (espnet_model.py:514-527);
# layers 0-2 are fully off. Kept for bit-parity runs; the first-class path
# uses masks produced by adapt.head_selection.select_heads.
REFERENCE_50PCT_HEAD_MASK = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 1, 1, 1, 0, 1, 1, 0, 0, 1, 1, 1],
        [0, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1],
        [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
        [0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
        [1, 0, 0, 1, 1, 0, 1, 0, 1, 0, 1, 0],
        [1, 1, 1, 1, 0, 0, 1, 0, 0, 0, 1, 0],
        [1, 1, 1, 1, 1, 0, 1, 0, 1, 0, 0, 1],
        [0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1],
    ],
    dtype=np.float32,
)


def attention_target_labels(
    ys_in: np.ndarray,
    tokenizer: WhisperTokenizer,
    prompt_len: int = 5,
    mode: str = "attention",
) -> np.ndarray:
    """Per-row language labels for a batch of decoder input ids.

    Args:
      ys_in: (B, T) int array — sos-prefixed decoder inputs (the reference
        passes `ys_in_pad`, espnet_model.py:945), eos-padded.
      tokenizer: for id→token-string conversion (language attribution).
      prompt_len: rows reserved for the prompt (espnet_model.py:241).
      mode: "attention" (shipped `create_attention_pattern` semantics,
        espnet_model.py:236-275) or "lid_ce" (the `getlid` semantics of
        the alternative CE loss, espnet_model.py:364-390: prompt
        [inf,zh,en,inf,inf], space-only tokens count as ENGLISH, the
        first <|endoftext|> is masked instead of labeled BOTH).

    Returns (B, T) int8 labels. In "attention" mode row i<prompt_len gets
    the fixed prompt labels [NONE, ZH, EN, NONE, NONE]; the first
    <|endoftext|> gets BOTH and everything after it PAD
    (espnet_model.py:246-258).
    """
    ys_in = np.asarray(ys_in)
    b, t = ys_in.shape
    lid = mode == "lid_ce"
    labels = np.full((b, t), LANG_PAD, dtype=np.int8)
    if lid:
        prompt_labels = [LANG_PAD, LANG_ZH, LANG_EN, LANG_PAD, LANG_PAD]
    else:
        prompt_labels = [LANG_NONE, LANG_ZH, LANG_EN, LANG_NONE, LANG_NONE]
    eot = tokenizer.special.eot
    for i in range(b):
        labels[i, : min(prompt_len, t)] = prompt_labels[: min(prompt_len, t)]
        for j in range(prompt_len, t):
            tid = int(ys_in[i, j])
            if tid == eot:
                if not lid:
                    labels[i, j] = LANG_BOTH
                break
            tok = tokenizer.id_to_token(tid)
            stripped = tok.replace("Ġ", "")
            if stripped == "":
                labels[i, j] = LANG_EN if lid else LANG_BOTH
            elif WhisperTokenizer.token_is_english(tok):
                labels[i, j] = LANG_EN
            else:
                labels[i, j] = LANG_ZH
    return labels


def targets_from_labels(labels: jnp.ndarray, c_val) -> tuple[jnp.ndarray, jnp.ndarray]:
    """labels (B, T) -> (targets (B, T, 2), valid (B, T)) on device.

    `c_val` may be a python float or a traced scalar (the learnable
    `estimated_c_val` of the estimate_c variant, whisper_decoder.py:85-86 —
    NOTE the reference creates that parameter but its live loss never reads
    it (only espnet_model_bak.py:284-285 does); here it actually trains).
    """
    c = jnp.asarray(c_val, jnp.float32)
    z = jnp.zeros((), jnp.float32)
    lut = jnp.stack(
        [
            jnp.stack([z, z]),
            jnp.stack([c, z]),
            jnp.stack([z, c]),
            jnp.stack([c, c]),
            jnp.stack([z, z]),
        ]
    )
    targets = lut[labels]
    valid = (labels != LANG_PAD).astype(jnp.float32)
    return targets, valid


def cs_attention_loss(
    qk_cols: jnp.ndarray,
    labels: jnp.ndarray,
    head_mask: jnp.ndarray,
    c_val: float = 0.6,
    layer_offset: int = 0,
) -> jnp.ndarray:
    """The shipped CS loss (espnet_model.py:463-530) from score columns.

    Args:
      qk_cols: (L, B, h, T, 2) pre-softmax self-attn scores at the zh/en
        columns, with -inf where causally masked (rows 0-1 of the prompt).
      labels: (B, T) int labels from `attention_target_labels`.
      head_mask: (L, h) 0/1 float — selected heads.
      c_val: target attention value on the logit scale (c_val_attention).
      layer_offset: absolute index of qk_cols' first layer (src_layer-1
        when the decoder only collects maps from src_layer on).

    Layers 0-1 (absolute) get the reference's early-layer sot pattern
    (espnet_model.py:479-487): zeros at the language columns for EVERY
    row — no inf padding, so pad rows of the map are NOT zeroed there.
    Layers >= 2 get the language pattern with inf-masked pad rows.

    Returns scalar loss = mean over batch of Σ_{layer,head} masked
    per-head mean-over-nonzero-rows of Σ_cols (map - target)².
    """
    targets, valid = targets_from_labels(labels, c_val)  # (B,T,2), (B,T)

    maps = jnp.transpose(qk_cols, (1, 0, 2, 3, 4))  # (B, L, h, T, 2)
    tgt = targets[:, None, None, :, :]  # (B,1,1,T,2)
    row_valid = valid[:, None, None, :]  # (B,1,1,T)
    early = (jnp.arange(maps.shape[1]) + layer_offset < 2)[
        None, :, None, None, None
    ]  # (1,L,1,1,1)

    # inf handling (espnet_model.py:496-499): zero -inf (causal) map
    # entries; for layers >= 2 also zero map+target at inf-target pad rows.
    maps = jnp.where(jnp.isfinite(maps), maps, 0.0)
    maps = jnp.where(early, maps, maps * row_valid[..., None])
    tgt = jnp.where(early, 0.0, tgt * row_valid[..., None])

    sq = (maps - tgt) ** 2  # (B, L, h, T, 2)
    row_loss = jnp.sum(sq, axis=-1)  # (B, L, h, T)

    nonzero = jnp.sum((row_loss != 0.0).astype(jnp.float32), axis=-1)  # (B,L,h)
    total = jnp.sum(row_loss, axis=-1)
    # reference divides by count_nonzero (nan when 0, espnet_model.py:512);
    # we guard the 0 case to keep training finite.
    per_head = jnp.where(nonzero > 0, total / jnp.maximum(nonzero, 1.0), 0.0)

    masked = per_head * head_mask[None, :, :].astype(per_head.dtype)
    return jnp.mean(jnp.sum(masked, axis=(-1, -2)))


def cs_lid_ce_loss(
    maps: jnp.ndarray,
    labels: jnp.ndarray,
    ys_in_lens: jnp.ndarray,
    head_mask: jnp.ndarray,
    lsm_weight: float = 0.1,
) -> jnp.ndarray:
    """The alternative lid-CE CS loss (`calculate_cs_loss_lid_ce`,
    espnet_model.py:364-461 — dead code in the reference, its call is
    commented out at :946; available here behind `cs_loss_type: lid_ce`
    so the only reference CS-loss family member without an equivalent is
    covered).

    Per selected head, each valid decoder row's self-attention logits are
    treated as a distribution over key columns and pushed (label-smoothed
    CE, eps=0.1) toward the row's OWN language-token column (1 for
    Mandarin, 2 for English). Unlike the shipped MSE loss this needs the
    full softmax denominator, i.e. full (T, T) maps — use the shipped
    column loss for speed; this variant exists for behavioral parity.

    Replicated semantics:
      * -inf (and +inf) map entries are replaced by logit 0 BEFORE the
        softmax (espnet_model.py:414-415: `attention_maps[mask] = 0`).
      * valid rows: label is zh/en AND row < ys_in_len - 1
        (espnet_model.py:434-452: mask_sequence_length on
        `ground_truth_len - 1` x the {0,3,4} prompt-index mask — rows
        0/3/4 are already PAD in lid-mode labels).
      * per-head row-sum (nansum), head mask, sum over (layer, head),
        mean over batch (espnet_model.py:457-461).

    Args:
      maps: (L, B, h, T, T) pre-softmax self-attn logits with -inf causal
        mask (whisper_decode(collect_full_maps=True) -> aux["maps"]).
      labels: (B, T) labels from attention_target_labels(mode="lid_ce").
      ys_in_lens: (B,) int32 lengths of ys_in (text_len + 1).
      head_mask: (L, h) 0/1 float - selected heads (the reference applies
        the same hardcoded 50% mask as the shipped loss, :448-460).
    """
    m = jnp.transpose(maps, (1, 0, 2, 3, 4)).astype(jnp.float32)
    m = jnp.where(jnp.isinf(m), 0.0, m)
    logp = jax.nn.log_softmax(m, axis=-1)  # over key columns
    tcol = jnp.where(
        labels == LANG_ZH, 1, jnp.where(labels == LANG_EN, 2, 0)
    )  # (B, T)
    nll = -jnp.take_along_axis(
        logp, tcol[:, None, None, :, None], axis=-1
    )[..., 0]  # (B, L, h, T)
    smooth = -jnp.mean(logp, axis=-1)
    ce = (1.0 - lsm_weight) * nll + lsm_weight * smooth
    rows = jnp.arange(labels.shape[1])
    valid = ((labels == LANG_ZH) | (labels == LANG_EN)) & (
        rows[None, :] < (ys_in_lens[:, None] - 1)
    )
    ce = ce * valid[:, None, None, :].astype(ce.dtype)
    per_head = jnp.sum(ce, axis=-1)  # (B, L, h)
    masked = per_head * head_mask[None, :, :].astype(per_head.dtype)
    return jnp.mean(jnp.sum(masked, axis=(-1, -2)))
