"""Word-level timestamps from cross-attention alignment — the bundled
whisper `timing.py` capability (find_alignment + DTW; its GPU path is a
Triton kernel, `whisper/triton_ops.py:13-40`, replaced here by a native
C++ DP with a numpy fallback).

Pipeline (timing.py:163-255 find_alignment):
  teacher-forced decode collecting cross-attention scores
  -> select alignment heads -> softmax over audio frames (qk_scale)
  -> per-head standardize over tokens -> median filter (width 7)
  -> mean over heads -> DTW over -matrix -> token->frame jump times
  -> group tokens into words, attach start/end/probability.

Deviations, documented: alignment heads default to all heads of the
upper half of decoder layers (OpenAI checkpoints ship a per-model head
mask blob; `alignment_heads` accepts an explicit (layer, head) list to
match one), and word splitting uses the space/CJK heuristic
(tokenizer.split_to_word_tokens' split_tokens_on_spaces/unicode).
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess

import numpy as np

import jax
import jax.numpy as jnp

TOKENS_PER_SECOND = 50  # enc frames per second (20 ms hop after conv)

_LIB = None
_LIB_TRIED = False


def _native_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    base = os.path.join(os.path.dirname(__file__), "..", "native")
    src = os.path.join(base, "dtw.cpp")
    so = os.path.join(base, "_dtw.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.dtw_path.restype = ctypes.c_longlong
        lib.dtw_path.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def dtw(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Monotonic alignment path over an (N, M) cost matrix
    (timing.py:83-106 dtw_cpu). Returns (text_indices, time_indices)."""
    x = np.ascontiguousarray(x, np.float32)
    n, m = x.shape
    lib = _native_lib()
    if lib is not None:
        pi = np.empty(n + m, np.int32)
        pj = np.empty(n + m, np.int32)
        length = lib.dtw_path(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, m,
            pi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pj.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        assert length > 0
        return pi[:length], pj[:length]
    return _dtw_py(x)


def _dtw_py(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Literal DP fallback (slow; cross-check in tests)."""
    n, m = x.shape
    cost = np.full((n + 1, m + 1), np.inf, np.float32)
    trace = -np.ones((n + 1, m + 1), np.int8)
    cost[0, 0] = 0.0
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            c0, c1, c2 = cost[i - 1, j - 1], cost[i - 1, j], cost[i, j - 1]
            if c0 < c1 and c0 < c2:
                c, t = c0, 0
            elif c1 < c0 and c1 < c2:
                c, t = c1, 1
            else:
                c, t = c2, 2
            cost[i, j] = x[i - 1, j - 1] + c
            trace[i, j] = t
    trace[0, :] = 2
    trace[:, 0] = 1
    i, j = n, m
    ri, rj = [], []
    while i > 0 or j > 0:
        ri.append(i - 1)
        rj.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i, j = i - 1, j - 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(ri[::-1], np.int32), np.asarray(rj[::-1], np.int32)


def median_filter(x: np.ndarray, width: int) -> np.ndarray:
    """Median filter along the last axis, reflect-padded
    (timing.py:19-55)."""
    assert width > 0 and width % 2 == 1
    pad = width // 2
    if x.shape[-1] <= pad:
        return x
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(windows, axis=-1).astype(x.dtype)


@dataclasses.dataclass
class WordTiming:
    word: str
    tokens: list[int]
    start: float
    end: float
    probability: float


PREPEND_PUNCT = "\"'“¿([{-"
APPEND_PUNCT = "\"'.。,，!！?？:：”)]}、"


def merge_punctuations(
    alignment: list[WordTiming],
    prepended: str = PREPEND_PUNCT,
    appended: str = APPEND_PUNCT,
) -> list[WordTiming]:
    """Fold punctuation-only 'words' into their neighbors
    (timing.py:258-289 merge_punctuations): opening marks attach to the
    following word, closing marks to the preceding one. Returns the
    alignment with emptied entries dropped."""
    # prepended: scan right-to-left
    i, j = len(alignment) - 2, len(alignment) - 1
    while i >= 0:
        prev, foll = alignment[i], alignment[j]
        if prev.word.startswith(" ") and prev.word.strip() in prepended:
            foll.word = prev.word + foll.word
            foll.tokens = prev.tokens + foll.tokens
            foll.start = prev.start
            prev.word, prev.tokens = "", []
        else:
            j = i
        i -= 1
    # appended: scan left-to-right
    i, j = 0, 1
    while j < len(alignment):
        prev, foll = alignment[i], alignment[j]
        if not prev.word.endswith(" ") and foll.word in appended:
            prev.word = prev.word + foll.word
            prev.tokens = prev.tokens + foll.tokens
            prev.end = foll.end
            foll.word, foll.tokens = "", []
        else:
            i = j
        j += 1
    return [w for w in alignment if w.word]


def _split_to_word_tokens(tokens: list[int], tokenizer):
    """Group text tokens into words: split on leading spaces, and treat
    CJK characters as individual words (tokenizer split_tokens_on_spaces /
    split_tokens_on_unicode semantics)."""
    words, word_tokens = [], []
    cur_text, cur_toks = "", []

    def flush():
        nonlocal cur_text, cur_toks
        if cur_toks:
            words.append(cur_text)
            word_tokens.append(cur_toks)
        cur_text, cur_toks = "", []

    for t in tokens:
        piece = tokenizer.decode([t], skip_special=False)
        starts_word = piece.startswith(" ") or any(
            "一" <= c <= "鿿" for c in piece
        )
        if starts_word and cur_toks:
            flush()
        cur_text += piece
        cur_toks.append(t)
    flush()
    return words, word_tokens


def find_word_alignment(
    params,
    cfg,
    tokenizer,
    text_tokens: list[int],
    enc: jax.Array,
    num_frames: int,
    alignment_heads: list[tuple[int, int]] | None = None,
    medfilt_width: int = 7,
    qk_scale: float = 1.0,
    primer: tuple[int, ...] = (50258, 50260, 50259, 50359, 50363),
) -> list[WordTiming]:
    """Word timings for one utterance (timing.py:163-255 find_alignment).

    enc: (1, T_enc, d) encoder output; num_frames: valid encoder frames.
    """
    from agacs_tpu.models.whisper import whisper_decode

    if not text_tokens:
        return []
    sp = tokenizer.special
    tokens = list(primer) + list(text_tokens) + [sp.eot]
    toks = jnp.asarray([tokens], jnp.int32)

    logits, aux = whisper_decode(
        params, cfg, toks, enc, collect_cross_maps=True
    )
    lp = jax.nn.softmax(logits[0].astype(jnp.float32), -1)
    n_primer = len(primer)
    idx = np.arange(len(text_tokens))
    text_probs = np.asarray(
        lp[n_primer - 1 + idx, np.asarray(text_tokens)]
    ).tolist()

    maps = np.asarray(aux["cross_maps"], np.float32)  # (L, 1, h, T, T_enc)
    n_layers = maps.shape[0]
    if alignment_heads is None:
        alignment_heads = [
            (l, h)
            for l in range(n_layers // 2, n_layers)
            for h in range(maps.shape[2])
        ]
    w = np.stack([maps[l, 0, h] for l, h in alignment_heads])  # (H, T, Tenc)
    w = w[:, :, : max(num_frames, 1)]
    w = w * qk_scale
    w = np.exp(w - w.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    mean = w.mean(-2, keepdims=True)
    std = w.std(-2, keepdims=True) + 1e-8
    w = (w - mean) / std
    w = median_filter(w, medfilt_width)
    matrix = w.mean(0)[n_primer - 1 : -1]  # rows producing text tokens+eot

    text_idx, time_idx = dtw(-matrix)

    words, word_tokens = _split_to_word_tokens(
        list(text_tokens) + [sp.eot], tokenizer
    )
    bounds = np.pad(
        np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0)
    ).astype(int)
    jumps = np.pad(np.diff(text_idx), (1, 0), constant_values=1).astype(bool)
    jump_times = time_idx[jumps] / TOKENS_PER_SECOND
    start_times = jump_times[np.minimum(bounds[:-1], len(jump_times) - 1)]
    end_times = jump_times[np.minimum(bounds[1:], len(jump_times) - 1)]
    probs = [
        float(np.mean(text_probs[i:j])) if j > i else 0.0
        for i, j in zip(bounds[:-1], bounds[1:])
    ]
    alignment = [
        WordTiming(wd, tk, float(s), float(e), p)
        for wd, tk, s, e, p in zip(
            words, word_tokens, start_times, end_times, probs
        )
    ]
    return merge_punctuations(alignment)
