"""Per-head language-attribution counting and head selection, on device.

Replaces the reference's debugger-driven workflow
(`code_util/head_selection.md`: disable backward, hand-enable
`new_check_attention_language` at espnet_model.py:944, manually pickle
`self.attention_count`, hardcode the pkl path at :200) with first-class
functions: a jit-safe batch counter reducible with `psum` across data
shards, and a selector that turns accumulated counts into the binary
head mask the CS loss consumes.

Counting criterion (espnet_model.py:285-310): a head is a "language head"
for an utterance when its total attention on the <|zh|>/<|en|> prompt
columns exceeds its attention everywhere else. The reference evaluates
this on pre-softmax scores containing -inf causal entries, which makes
both sums -inf (the literal comparison can never fire); the intent — and
what must have produced the shipped pkl — is the comparison on the
POST-softmax distribution, where each row sums to 1:

    Σ_rows Σ_{c∈{zh,en}} p[row, c]  >  Σ_rows Σ_{c∉{zh,en}} p[row, c]
                                    ⟺  2 · Σ p_cols > n_rows

so only the two probability columns are needed. We count on probabilities
(`p_cols` from `whisper_decode`), parameterizing the reference's
hardcoded 12×12 shape away.
"""

from __future__ import annotations

import json

import numpy as np

import jax.numpy as jnp


def count_language_heads(p_cols: jnp.ndarray, n_rows: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-batch head counts.

    Args:
      p_cols: (L, B, h, T, 2) post-softmax attention mass on the zh/en
        columns (aux["p_cols"] of `whisper_decode`).
      n_rows: (B,) valid row counts; None → all T rows (the reference sums
        over every row including eos padding, espnet_model.py:297-298).

    Returns (L, h) int32 counts: number of utterances in this batch for
    which each head attends more to the language columns than elsewhere.
    Accumulate across batches (and `psum` across shards) then feed
    `select_heads`.
    """
    lang_mass = jnp.sum(p_cols.astype(jnp.float32), axis=(-1, -2))  # (L, B, h)
    t = p_cols.shape[3]
    if n_rows is None:
        total = jnp.full(lang_mass.shape[1], float(t), jnp.float32)[None, :, None]
    else:
        total = n_rows.astype(jnp.float32)[None, :, None]
    is_lang_head = (2.0 * lang_mass > total).astype(jnp.int32)
    return jnp.sum(is_lang_head, axis=1)  # (L, h)


def select_heads(
    counts: np.ndarray,
    head_percentage: float = 100.0,
    base_pool: int | None = None,
) -> np.ndarray:
    """Binary head mask from accumulated counts (espnet_model.py:198-219).

    Takes the top `int(base_pool * head_percentage / 100)` heads by count
    (base_pool defaults to the number of heads with nonzero counts — the
    reference hardcodes its pkl's 110), keeping only count>0 heads.

    Returns (L, h) float32 0/1 mask.
    """
    counts = np.asarray(counts)
    n_layers, n_heads = counts.shape
    flat = [
        (layer, head, counts[layer, head])
        for layer in range(n_layers)
        for head in range(n_heads)
    ]
    flat.sort(key=lambda x: x[2], reverse=True)
    pool = base_pool if base_pool is not None else int((counts > 0).sum())
    n_sel = int(pool * head_percentage / 100.0)
    mask = np.zeros((n_layers, n_heads), np.float32)
    for layer, head, c in flat[:n_sel]:
        if c > 0:
            mask[layer, head] = 1.0
    return mask


def save_counts(path: str, counts: np.ndarray) -> None:
    """Persist counts as JSON (replaces the reference's pickle artifact
    `attention_count_whispernoft_new.pkl`)."""
    counts = np.asarray(counts)
    with open(path, "w") as f:
        json.dump(
            {
                "shape": list(counts.shape),
                "counts": counts.astype(int).tolist(),
            },
            f,
        )


def load_counts(path: str) -> np.ndarray:
    with open(path) as f:
        d = json.load(f)
    return np.asarray(d["counts"], dtype=np.int64)
