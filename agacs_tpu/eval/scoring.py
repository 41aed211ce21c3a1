"""sclite-compatible scoring: MER / per-language WER & CER, .trn files.

Replaces the reference's scoring stack — SCTK `sclite` invocations
(asr.sh:1505-1517), `local/score.sh` per-language split via
`split_lang_trn.py`, and `code_util/seperate_hyp.py` — with a pure
pipeline: weighted Levenshtein alignment (native C++ when built, Python
fallback), sclite edit weights (sub 4, ins/del 3), and the SEAME language
split rules (`egs2/seame/asr1/local/preprocess.py:54-94`:
is_mandarin = not ascii-letter/digit/space/< > /').

Metrics:
  MER — error rate over mixed tokens (hanzi as chars, non-mandarin as
        words — the trn convention the recipes score with)
  English WER — over the non-mandarin words only
  Mandarin CER — over the mandarin characters only
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess

import numpy as np

_LIB = None
_LIB_TRIED = False


def _native_lib():
    """Compile/load the C++ aligner once; None if unavailable."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    src = os.path.join(os.path.dirname(__file__), "..", "native", "align.cpp")
    so = os.path.join(os.path.dirname(__file__), "..", "native", "_align.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.align_counts.restype = ctypes.c_int32
        lib.align_counts.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _align_py(ref: list[int], hyp: list[int]) -> tuple[int, int, int, int]:
    w_sub, w_ins, w_del = 4, 3, 3
    nr, nh = len(ref), len(hyp)
    cost = np.zeros((nr + 1, nh + 1), np.int32)
    back = np.zeros((nr + 1, nh + 1), np.int8)
    cost[0, :] = np.arange(nh + 1) * w_ins
    back[0, :] = 3
    cost[:, 0] = np.arange(nr + 1) * w_del
    back[1:, 0] = 2
    for i in range(1, nr + 1):
        for j in range(1, nh + 1):
            match = ref[i - 1] == hyp[j - 1]
            best = cost[i - 1, j - 1] + (0 if match else w_sub)
            op = 0 if match else 1
            if cost[i - 1, j] + w_del < best:
                best, op = cost[i - 1, j] + w_del, 2
            if cost[i, j - 1] + w_ins < best:
                best, op = cost[i, j - 1] + w_ins, 3
            cost[i, j], back[i, j] = best, op
    cor = sub = dele = ins = 0
    i, j = nr, nh
    while i > 0 or j > 0:
        op = back[i, j]
        if op == 0:
            cor, i, j = cor + 1, i - 1, j - 1
        elif op == 1:
            sub, i, j = sub + 1, i - 1, j - 1
        elif op == 2:
            dele, i = dele + 1, i - 1
        else:
            ins, j = ins + 1, j - 1
    return cor, sub, dele, ins


def align_counts(ref_tokens: list[str], hyp_tokens: list[str]) -> tuple[int, int, int, int]:
    """(correct, substitutions, deletions, insertions)."""
    vocab: dict[str, int] = {}
    ref = [vocab.setdefault(t, len(vocab)) for t in ref_tokens]
    hyp = [vocab.setdefault(t, len(vocab)) for t in hyp_tokens]
    lib = _native_lib()
    if lib is not None:
        r = (ctypes.c_int32 * max(len(ref), 1))(*ref)
        h = (ctypes.c_int32 * max(len(hyp), 1))(*hyp)
        out = (ctypes.c_int32 * 4)()
        lib.align_counts(r, len(ref), h, len(hyp), out)
        return out[0], out[1], out[2], out[3]
    return _align_py(ref, hyp)


@dataclasses.dataclass
class ErrorStats:
    correct: int = 0
    substitutions: int = 0
    deletions: int = 0
    insertions: int = 0
    n_ref: int = 0
    n_utts: int = 0

    def add(self, ref_tokens: list[str], hyp_tokens: list[str]) -> None:
        c, s, d, i = align_counts(ref_tokens, hyp_tokens)
        self.correct += c
        self.substitutions += s
        self.deletions += d
        self.insertions += i
        self.n_ref += len(ref_tokens)
        self.n_utts += 1

    @property
    def error_rate(self) -> float:
        return (self.substitutions + self.deletions + self.insertions) / max(
            self.n_ref, 1
        )

    @property
    def corr_rate(self) -> float:
        return self.correct / max(self.n_ref, 1)

    def as_dict(self) -> dict:
        return {
            "utts": self.n_utts,
            "ref_tokens": self.n_ref,
            "corr": round(100 * self.corr_rate, 2),
            "sub": self.substitutions,
            "del": self.deletions,
            "ins": self.insertions,
            "err": round(100 * self.error_rate, 2),
        }


# --- SEAME language split (preprocess.py:54-94) ---


def _is_english_char(c: str) -> bool:
    return "a" <= c.lower() <= "z"


def is_mandarin_char(c: str) -> bool:
    return (
        not _is_english_char(c)
        and not c.isdigit()
        and c not in (" ", "<", ">", "'")
    )


def mixed_tokens(text: str) -> list[str]:
    """Hanzi as single-char tokens, everything else as space-split words —
    the token stream the recipes' trn files carry (MER basis)."""
    out: list[str] = []
    word = ""
    for c in text:
        if c == " ":
            if word:
                out.append(word)
                word = ""
        elif is_mandarin_char(c):
            if word:
                out.append(word)
                word = ""
            out.append(c)
        else:
            word += c
    if word:
        out.append(word)
    return out


def word_tokens(text: str) -> list[str]:
    return [w for w in text.split(" ") if w]


def char_tokens(text: str) -> list[str]:
    return [c for c in text if c != " "]


def split_language(text: str) -> tuple[str, str]:
    """(english_part, mandarin_part) per split_lang_trn.py: english = words
    containing no mandarin char; mandarin = mandarin chars only."""
    eng = " ".join(
        w for w in text.split(" ") if w and not any(is_mandarin_char(c) for c in w)
    )
    man = "".join(c for c in text if is_mandarin_char(c))
    return eng, man


# --- .trn files ("tokens\t(utt_id)" lines, sclite trn format) ---


def write_trn(path: str, utts: dict[str, str]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for utt_id, text in utts.items():
            f.write(f"{' '.join(mixed_tokens(text))}\t({utt_id})\n")


def read_trn(path: str) -> dict[str, str]:
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            if "\t" not in line:
                continue
            sent, idx = line.rstrip("\n").split("\t")
            out[idx.strip("()")] = sent
    return out


def classify_sentence(text: str) -> str:
    """'cs' / 'en' / 'man' bucket by content (code_util/seperate_hyp.py:
    unicode-range split of ref sentences into code-switched / English-only /
    Mandarin-only)."""
    has_man = any(is_mandarin_char(c) for c in text if c.strip())
    has_eng = any(_is_english_char(c) for c in text)
    if has_man and has_eng:
        return "cs"
    return "man" if has_man else "en"


def score_by_bucket(refs: dict[str, str], hyps: dict[str, str]) -> dict:
    """Per-bucket mixed-error tables, bucketing utterances by the REFERENCE
    sentence's language content (seperate_hyp.py's 3-way sclite runs)."""
    buckets = {"cs": ErrorStats(), "en": ErrorStats(), "man": ErrorStats()}
    for utt_id, ref_text in refs.items():
        b = classify_sentence(ref_text)
        buckets[b].add(mixed_tokens(ref_text), mixed_tokens(hyps.get(utt_id, "")))
    return {k: v.as_dict() for k, v in buckets.items()}


def score_report(refs: dict[str, str], hyps: dict[str, str]) -> dict:
    """Full scoring table: MER + English WER + Mandarin CER
    (local/score.sh:16-47 pipeline)."""
    mixed = ErrorStats()
    eng = ErrorStats()
    man = ErrorStats()
    for utt_id, ref_text in refs.items():
        hyp_text = hyps.get(utt_id, "")
        mixed.add(mixed_tokens(ref_text), mixed_tokens(hyp_text))
        ref_eng, ref_man = split_language(ref_text)
        hyp_eng, hyp_man = split_language(hyp_text)
        eng.add(word_tokens(ref_eng), word_tokens(hyp_eng))
        man.add(char_tokens(ref_man), char_tokens(hyp_man))
    return {
        "mer": mixed.as_dict(),
        "english_wer": eng.as_dict(),
        "mandarin_cer": man.as_dict(),
    }
