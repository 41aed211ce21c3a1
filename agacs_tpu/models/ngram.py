"""N-gram LM scorer for beam fusion — the `espnet/nets/scorers/ngram.py`
capability (kenlm-backed there; no kenlm exists in this image).

TPU-native design: the model is a set of hashed count tables (open
addressing, device-resident arrays), scored with STUPID BACKOFF
  S(t | ctx) = count(ctx·t)/count(ctx)        if count(ctx·t) > 0
             = α · S(t | ctx[1:])             otherwise
(documented deviation: kenlm stores Kneser-Ney probabilities; stupid
backoff is the standard large-scale approximation and keeps the scorer a
pure gather — one hashed lookup per (hypothesis, candidate, order), fully
vectorized over the 51865-way vocab inside the jitted beam step).

Keys are two independent 32-bit FNV-style hashes (jax has no uint64
without x64 mode); a match requires both lanes, so collisions are ~2^-64.
Training is host-side counting; tables serialize to npz.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

_M1 = np.uint32(2654435761)
_M2 = np.uint32(0x9E3779B1)
_SEED1 = np.uint32(2166136261)
_SEED2 = np.uint32(0x811C9DC5 ^ 0x5BD1E995)
_EMPTY = np.uint32(0xFFFFFFFF)
_PROBES = 8


def _hash_ngram_host(ngram) -> tuple[int, int]:
    h1, h2 = int(_SEED1), int(_SEED2)
    for t in ngram:
        t = int(t)  # numpy ints would overflow-warn / change dtype
        h1 = ((h1 ^ (t + 1)) * int(_M1)) & 0xFFFFFFFF
        h2 = ((h2 ^ (t + 2)) * int(_M2)) & 0xFFFFFFFF
    return h1, h2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NgramLM:
    """Per-order hash tables. For order o+2 n-grams: keys1/keys2[o]: (S,)
    uint32 lanes (linear probing from lane-1), logps[o]: (S,) float32
    log S(t|ctx). Unigram is dense (V,)."""

    order: int = dataclasses.field(metadata=dict(static=True))
    alpha: float = dataclasses.field(metadata=dict(static=True))
    unigram: jax.Array
    keys1: list
    keys2: list
    logps: list


def train_ngram(
    seqs: list[list[int]],
    vocab_size: int,
    order: int = 3,
    alpha: float = 0.4,
    sos: int | None = None,
) -> NgramLM:
    """Count n-grams (orders 1..order) over token sequences. Each sequence
    is sos-prefixed when `sos` is given (context for the first token)."""
    from collections import Counter

    grams = [Counter() for _ in range(order)]  # grams[o]: (o+1)-grams
    for seq in seqs:
        s = ([sos] if sos is not None else []) + list(seq)
        start = 1 if sos is not None else 0
        for i in range(start, len(s)):
            for o in range(order):
                if i - o < 0:
                    break
                grams[o][tuple(s[i - o : i + 1])] += 1

    # unigram: dense log p with add-1 smoothing over the full vocab
    uni = np.ones(vocab_size, np.float64)
    for (t,), c in grams[0].items():
        uni[t] += c
    unigram = np.log(uni / uni.sum()).astype(np.float32)

    keys1, keys2, logps = [], [], []
    for o in range(1, order):
        # denominator = continuation count of the context (Σ_t c(ctx·t)),
        # not the context's own n-gram count — contexts containing sos
        # are never themselves counted as lower-order grams
        denom = Counter()
        for g, c in grams[o].items():
            denom[g[:-1]] += c
        items = []
        for g, c in grams[o].items():
            items.append((g, np.log(c / denom[g[:-1]])))
        size = max(64, 1 << int(np.ceil(np.log2(max(len(items), 1) * 2))))
        k1 = np.full(size, _EMPTY, np.uint32)
        k2 = np.zeros(size, np.uint32)
        v_arr = np.zeros(size, np.float32)
        for g, lp in items:
            h1, h2 = _hash_ngram_host(g)
            slot = h1 % size
            for _ in range(size):
                if k1[slot] == _EMPTY:
                    k1[slot], k2[slot], v_arr[slot] = h1, h2, lp
                    break
                if k1[slot] == h1 and k2[slot] == h2:
                    break  # full 64-bit collision: keep first (≈ never)
                slot = (slot + 1) % size
        keys1.append(jnp.asarray(k1))
        keys2.append(jnp.asarray(k2))
        logps.append(jnp.asarray(v_arr))
    return NgramLM(
        order=order, alpha=alpha, unigram=jnp.asarray(unigram),
        keys1=keys1, keys2=keys2, logps=logps,
    )


def _hash_rows(ctx: jax.Array, cand: jax.Array):
    """ctx: (N, L) int32 contexts; cand: (V,) candidates -> two (N, V)
    uint32 hash lanes of ctx·cand (same recurrence as the host hasher)."""
    h1 = jnp.full(ctx.shape[:1], _SEED1, jnp.uint32)
    h2 = jnp.full(ctx.shape[:1], _SEED2, jnp.uint32)
    for i in range(ctx.shape[1]):
        t = ctx[:, i].astype(jnp.uint32)
        h1 = (h1 ^ (t + 1)) * _M1
        h2 = (h2 ^ (t + 2)) * _M2
    c = cand.astype(jnp.uint32)
    h1 = (h1[:, None] ^ (c + 1)[None, :]) * _M1
    h2 = (h2[:, None] ^ (c + 2)[None, :]) * _M2
    return h1, h2


def _lookup(keys1, keys2, logps, h1, h2):
    """Open-addressing probe -> (found bool, logp), vectorized."""
    size = keys1.shape[0]
    slot = (h1 % np.uint32(size)).astype(jnp.int32)
    found = jnp.zeros(h1.shape, bool)
    val = jnp.zeros(h1.shape, jnp.float32)
    done = jnp.zeros(h1.shape, bool)
    for _ in range(_PROBES):
        k1 = keys1[slot]
        hit = (k1 == h1) & (keys2[slot] == h2) & ~done
        val = jnp.where(hit, logps[slot], val)
        found = found | hit
        done = done | hit | (k1 == _EMPTY)
        slot = jnp.where(done, slot, (slot + 1) % size)
    return found, val


def ngram_score_step(
    lm: NgramLM, tokens: jax.Array, pos: jax.Array
) -> jax.Array:
    """(N, total) token buffer + current position -> (N, V) log scores of
    every next-token candidate under stupid backoff. jit-safe; positions
    before the sequence start fall through to shorter orders."""
    n, total = tokens.shape
    v = lm.unigram.shape[0]
    cand = jnp.arange(v, dtype=jnp.int32)

    # backoff level counts only FAILED lookups among AVAILABLE context
    # lengths — a short history at the sequence start is not a backoff
    max_avail = jnp.minimum(lm.order - 1, pos + 1).astype(jnp.float32)

    # default: unigram with full backoff from the longest available context
    score = lm.unigram[None, :] + np.log(lm.alpha) * max_avail
    resolved = jnp.zeros((n, v), bool)

    for o in range(lm.order - 1, 0, -1):  # context length o, high first
        idx = jnp.clip(pos - o + 1 + jnp.arange(o), 0, total - 1)
        ctx = tokens[:, idx]  # (N, o)
        valid = pos - o + 1 >= 0
        h1, h2 = _hash_rows(ctx, cand)
        found, lp = _lookup(lm.keys1[o - 1], lm.keys2[o - 1], lm.logps[o - 1],
                            h1, h2)
        found = found & valid
        use = found & ~resolved
        backoff = np.log(lm.alpha) * (max_avail - o)
        score = jnp.where(use, lp + backoff, score)
        resolved = resolved | found
    return score


def save_ngram(path: str, lm: NgramLM) -> None:
    arrs = {"unigram": np.asarray(lm.unigram)}
    for i in range(lm.order - 1):
        arrs[f"keys1_{i}"] = np.asarray(lm.keys1[i])
        arrs[f"keys2_{i}"] = np.asarray(lm.keys2[i])
        arrs[f"logps_{i}"] = np.asarray(lm.logps[i])
    np.savez(path, order=lm.order, alpha=lm.alpha, **arrs)


def load_ngram(path: str) -> NgramLM:
    d = np.load(path)
    order = int(d["order"])
    return NgramLM(
        order=order, alpha=float(d["alpha"]),
        unigram=jnp.asarray(d["unigram"]),
        keys1=[jnp.asarray(d[f"keys1_{i}"]) for i in range(order - 1)],
        keys2=[jnp.asarray(d[f"keys2_{i}"]) for i in range(order - 1)],
        logps=[jnp.asarray(d[f"logps_{i}"]) for i in range(order - 1)],
    )
