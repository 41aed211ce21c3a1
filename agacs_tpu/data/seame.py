"""SEAME-style Mandarin-English transcript normalization + data prep.

Behavior-equivalent port of the reference recipe's preprocessing
(`egs2/seame/asr1/local/preprocess.py`): punctuation/fullwidth stripping,
control-char removal, noise-tag canonicalization, <unk> canonicalization,
space insertion between hanzi, language extraction helpers. The upstream
corpus-layout logic (reading SEAME's phaseI/II transcript files and the
SEAME-dev-set splits) is reduced to generic helpers over
(utt_id, speaker, text) records since the corpus itself is not present in
this environment.
"""

from __future__ import annotations

import re
import unicodedata

# punctuation translated to spaces (preprocess.py:31-32)
_REMOVE_PUNC = "()[]{}.,?·@，。、「」＃\"~-—#%_`｀×*（）［］&【】～ｌ\\"
_PUNC_TABLE = str.maketrans(_REMOVE_PUNC, " " * len(_REMOVE_PUNC))

# fullwidth latin -> ascii + é -> e (preprocess.py:34-36)
_FW_SRC = (
    "ａｂｃｄｅｆｇｈｉｊｋｌｍｎｏｐｑｒｓｔｕｖｗｘｙｚ"
    "ＡＢＣＤＥＦＧＨＩＪＫＬＭＮＯＰＱＲＳＴＵＶＷＸＹＺé"
)
_FW_DST = "abcdefghijklmnopqrstuvwxyz" * 2 + "e"
_FW_TABLE = str.maketrans(_FW_SRC, _FW_DST)

_CONTROL_RE = re.compile(
    "[%s]" % re.escape("".join(map(chr, list(range(0x00, 0x20)) + list(range(0x7F, 0xA0)))))
)

_NOISE_WORDS = {"ppl", "ppc", "ppb", "ppo", "<v-noise>"}


def remove_control_chars(text: str) -> str:
    return _CONTROL_RE.sub("", text)


def remove_redundant_whitespaces(text: str) -> str:
    return re.sub(" +", " ", text).strip()


def is_english_char(c: str) -> bool:
    return "a" <= c.lower() <= "z"


def is_mandarin_char(c: str) -> bool:
    return (
        not is_english_char(c)
        and not c.isdigit()
        and c not in (" ", "<", ">", "'")
    )


def extract_mandarin_only(text: str) -> str:
    return "".join(c for c in text if is_mandarin_char(c))


def extract_non_mandarin(text: str) -> str:
    return " ".join(
        w for w in text.split(" ") if w and not any(is_mandarin_char(c) for c in w)
    )


def insert_space_between_mandarin(text: str) -> str:
    """Space-wrap hanzi (preprocess.py:81-94; note the reference leaves the
    FIRST character unwrapped — replicated)."""
    if len(text) <= 1:
        return text
    out = [text[0]]
    for c in text[1:]:
        out.append(f" {c} " if is_mandarin_char(c) else c)
    return "".join(out)


def remove_repeated_noise(text: str, tag: str = "<noise>") -> str:
    """Collapse runs of the noise tag (preprocess.py:97-112)."""
    if len(re.findall(re.escape(tag), text)) <= 1:
        return text
    words = text.split()
    out = []
    for w in words:
        if w == tag and out and out[-1] == tag:
            continue
        out.append(w)
    return " ".join(out)


def normalize_text(text: str) -> str:
    """Full SEAME transcript normalization (preprocess.py:115-151)."""
    t = re.sub(r"\(((pp)(\w)+)\)", "<noise>", text.lower())
    t = re.sub(r"\<((pp)(\w)+)\>", "<noise>", t)
    t = t.translate(_PUNC_TABLE)
    t = remove_control_chars(t)
    t = " ".join("<noise>" if w in _NOISE_WORDS else w for w in t.split())
    t = t.translate(_FW_TABLE)
    t = t.replace("<unl>", "<unk>")
    t = t.replace("< unk >", "<unk>")
    t = re.sub(r"\<((unk)[a-z ]+)\>", "<unk>", t)
    t = insert_space_between_mandarin(t)
    t = remove_redundant_whitespaces(t)
    t = remove_repeated_noise(t, "<noise>")
    return t


def strip_tags(text: str) -> str:
    """Remove <noise>/<unk> tags for scoring-side use."""
    return remove_redundant_whitespaces(re.sub(r"<[a-z-]+>", " ", text))


def classify_utterance(text: str) -> str:
    """'cs' / 'en' / 'man' bucket (code_util/seperate_hyp.py semantics:
    presence of mandarin vs english content)."""
    has_man = any(is_mandarin_char(c) for c in text if c != " ")
    has_eng = any(is_english_char(c) for c in text)
    if has_man and has_eng:
        return "cs"
    return "man" if has_man else "en"


def prepare_data_dir(
    records: list[tuple[str, str, str]],
    out_dir: str,
    normalize: bool = True,
) -> None:
    """Write wav.scp/text/utt2spk from (utt_id, wav_path, raw_text) records
    using the SEAME utt-id convention (speaker prefix)."""
    import os

    from agacs_tpu.data.io import write_scp

    os.makedirs(out_dir, exist_ok=True)
    wav, text, utt2spk = {}, {}, {}
    for utt_id, wav_path, raw in sorted(records):
        norm = normalize_text(raw) if normalize else raw
        if not norm:
            continue
        wav[utt_id] = wav_path
        text[utt_id] = norm
        utt2spk[utt_id] = utt_id.split("-")[0]
    write_scp(os.path.join(out_dir, "wav.scp"), wav)
    write_scp(os.path.join(out_dir, "text"), text)
    write_scp(os.path.join(out_dir, "utt2spk"), utt2spk)
