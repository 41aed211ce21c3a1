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

import jax
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


def count_language_heads_topk(
    maps: jnp.ndarray, k: int = 2, lang_cols: tuple[int, int] = (1, 2)
) -> jnp.ndarray:
    """The OLD top-k counting formulation (espnet_model.py:312-363
    `check_attention_language` — dead code in the reference, kept behind
    `--criterion topk_old` for inventory completeness).

    A head qualifies for an utterance when the zh/en prompt columns
    (absolute columns 1 and 2) are the two most frequent members of the
    per-row top-`k` attention columns: argsort each row of the (T, T)
    map descending, take the first k column ids per row, histogram them
    over all rows, and require {1, 2} == the top-k of that histogram.

    Ties in the histogram resolve to the SMALLER column id — the same
    order the reference gets from torch.unique (ascending elements) +
    a stable sort by count.

    Args:
      maps: (L, B, h, T, T) collected decoder self-attention maps
        (aux["maps"] of `whisper_decode(collect_full_maps=True)`;
        pre-softmax scores, as the reference feeds it — argsort is
        monotone-invariant so probabilities give identical counts).

    Returns (L, h) int32 per-batch counts; accumulate like
    `count_language_heads`.
    """
    n_l, b, n_h, t, _ = maps.shape
    # per-row top-k column ids; -inf-masked causal entries sort last
    _, idx = jax.lax.top_k(maps, k)  # (L, B, h, T, k)
    hist = jnp.sum(
        jax.nn.one_hot(idx, t, dtype=jnp.float32), axis=(-3, -2)
    )  # (L, B, h, T): how often each column made a row's top-k
    # top-k of the histogram, smaller column id on ties: argsort the
    # (count, -col) pair encoded as count * t - col
    order_key = hist * t - jnp.arange(t, dtype=jnp.float32)
    _, top_cols = jax.lax.top_k(order_key, k)  # (L, B, h, k)
    # a column with count 0 never enters the reference's dict — require
    # presence in the histogram as well as in the top-k
    qualifies = jnp.all(
        jnp.stack(
            [
                jnp.any(top_cols == c, axis=-1) & (hist[..., c] > 0)
                for c in lang_cols
            ],
            axis=0,
        ),
        axis=0,
    )  # (L, B, h)
    return jnp.sum(qualifies.astype(jnp.int32), axis=1)


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
