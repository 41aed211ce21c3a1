"""Stock-whisper long-form transcription: 30-second windows with
timestamp-token seek, language detection, and the timestamp decoding
rules — the bundled library's `transcribe.py`/`decoding.py` capability
that the reference fork ships but breaks (its TextDecoder.forward tuple
bug, SURVEY §2.1; the ESPnet path never exercises it).

Implemented TPU-first: one jitted KV-cached greedy loop per window with
the logit filters applied in-graph (`lax.while_loop`), host-side only for
the sequential seek logic. Stock prompt conditioning is supported:
`initial_prompt` and `condition_on_previous_text` feed the
<|startofprev|> context window exactly as transcribe.py:194-232 /
decoding.py:591-599 (context bucketed to PROMPT_BUCKETS lengths — a
bounded-jit-variants TPU deviation). Remaining deviations, documented:
  * the timestamped path samples greedily per window with the stock
    temperature-fallback ladder; `beam_size > 1` switches each window
    to decode/beam.py beam search in stock's without_timestamps mode
    (window-level segment times).

Timestamp rules replicated from `whisper/decoding.py` ApplyTimestampRules:
  1. <|notimestamps|> suppressed; special tokens suppressed;
  2. the first sampled token must be a timestamp, capped at
     max_initial_timestamp (1.0 s);
  3. after a lone timestamp the next token must be a timestamp or EOT;
     after a timestamp pair the next token must be text;
  4. timestamps never decrease;
  5. when total timestamp probability beats the best text token, a
     timestamp must be sampled.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from agacs_tpu.models.whisper import (
    WhisperConfig,
    init_self_kv_cache,
    precompute_cross_kv,
    whisper_decode_step,
    whisper_encode,
)
from agacs_tpu.ops.logmel import log_mel_spectrogram
from agacs_tpu.text.tokenizer import LANGUAGES, SpecialTokens

SAMPLE_RATE = 16000
CHUNK_SAMPLES = 30 * SAMPLE_RATE
N_FRAMES = 3000
TIME_PRECISION = 0.02  # seconds per timestamp token (audio.py constants)


@dataclasses.dataclass
class Segment:
    start: float
    end: float
    text: str
    tokens: list[int]
    words: list = dataclasses.field(default_factory=list)


@partial(jax.jit, static_argnames=("cfg",))
def _sot_logits(params, cfg: WhisperConfig, enc: jax.Array) -> jax.Array:
    """Decoder logits after the lone <|startoftranscript|> token."""
    sp = SpecialTokens()
    b = enc.shape[0]
    cross_kv = precompute_cross_kv(params, cfg, enc)
    self_kv = init_self_kv_cache(cfg, batch=b, max_len=4)
    logits, _ = whisper_decode_step(
        params, cfg, jnp.full((b,), sp.sot, jnp.int32), jnp.int32(0),
        self_kv, cross_kv,
    )
    return logits.astype(jnp.float32)


def detect_language(params, cfg: WhisperConfig, enc: jax.Array):
    """(lang codes, (B, n_lang) probs) from the sot-step logits
    (whisper `decoding.py` detect_language)."""
    sp = SpecialTokens()
    logits = _sot_logits(params, cfg, enc)
    n_lang = len(LANGUAGES)
    lang_logits = logits[:, sp.lang_base : sp.lang_base + n_lang]
    probs = np.asarray(jax.nn.softmax(lang_logits, -1))
    idx = probs.argmax(-1)
    return [LANGUAGES[i] for i in idx], probs


def no_speech_probs(params, cfg: WhisperConfig, enc: jax.Array) -> np.ndarray:
    """P(<|nospeech|>) at the sot step (transcribe.py no_speech_threshold)."""
    sp = SpecialTokens()
    logits = _sot_logits(params, cfg, enc)
    return np.asarray(jax.nn.softmax(logits, -1)[:, sp.no_speech])


@partial(
    jax.jit,
    static_argnames=("cfg", "max_steps", "max_initial_ts", "temperature"),
)
def greedy_decode_timestamps(
    params,
    cfg: WhisperConfig,
    enc: jax.Array,
    primer: jax.Array,
    max_steps: int = 224,
    max_initial_ts: int = 50,
    temperature: float = 0.0,
    rng: jax.Array | None = None,
):
    """Greedy (temperature 0) or sampled decode with the timestamp logit
    rules. primer: (B, 3) int32 [sot, lang, task]. Returns
    (tokens (B, 3+max_steps), lengths, sum_logprob (B,)) — logprob over
    sampled tokens for avg-logprob quality checks."""
    sp = SpecialTokens()
    b = enc.shape[0]
    n_primer = primer.shape[1]
    total = n_primer + max_steps
    max_ctx = min(cfg.n_text_ctx, total)
    v = cfg.n_vocab
    ts0 = sp.timestamp_begin

    cross_kv = precompute_cross_kv(params, cfg, enc)
    self_kv = init_self_kv_cache(cfg, batch=b, max_len=max_ctx)

    tokens0 = jnp.full((b, total), sp.eot, jnp.int32)
    tokens0 = tokens0.at[:, :n_primer].set(primer)

    ids = jnp.arange(v)
    is_ts_col = ids >= ts0
    # specials in [eot, timestamp_begin) except eot itself are never sampled
    suppress_special = (ids >= sp.eot) & (ids < ts0) & (ids != sp.eot)

    def cond(c):
        return (c["pos"] < min(total - 1, max_ctx - 1)) & ~jnp.all(c["done"])

    def body(c):
        pos = c["pos"]
        cur = jax.lax.dynamic_index_in_dim(c["tokens"], pos, 1, keepdims=False)
        logits, self_kv = whisper_decode_step(
            params, cfg, cur, pos, c["self_kv"], cross_kv
        )
        lg = logits.astype(jnp.float32)
        lg = jnp.where(suppress_special[None, :], -jnp.inf, lg)

        n_sampled = pos + 1 - n_primer  # tokens sampled so far
        last = cur
        prev = jax.lax.dynamic_index_in_dim(
            c["tokens"], jnp.maximum(pos - 1, 0), 1, keepdims=False
        )
        last_was_ts = (n_sampled >= 1) & (last >= ts0)
        penult_was_ts = (n_sampled < 2) | (prev >= ts0)

        # rule 3: lone timestamp -> ts/EOT only; pair -> text only
        mask_ts = last_was_ts & penult_was_ts
        mask_text = last_was_ts & ~penult_was_ts
        lg = jnp.where(mask_ts[:, None] & is_ts_col[None, :], -jnp.inf, lg)
        lg = jnp.where(
            mask_text[:, None] & (ids < sp.eot)[None, :], -jnp.inf, lg
        )
        # rule 4: monotonic timestamps (allow repeating the last lone ts);
        # active only once a timestamp has actually been sampled
        floor = jnp.where(
            last_was_ts & ~penult_was_ts, c["max_ts"], c["max_ts"] + 1
        )
        floor = jnp.where(c["has_ts"], floor, ts0)
        lg = jnp.where(
            is_ts_col[None, :] & (ids[None, :] < floor[:, None]), -jnp.inf, lg
        )
        # rule 2: first sample must be a timestamp within max_initial_ts
        first = n_sampled == 0
        init_mask = (~is_ts_col) | (ids > ts0 + max_initial_ts)
        lg = jnp.where(first & init_mask[None, :], -jnp.inf, lg)

        # rule 5: if Σp(ts) > max p(text), force a timestamp
        lp = jax.nn.log_softmax(lg, -1)
        ts_lp = jax.nn.logsumexp(jnp.where(is_ts_col[None, :], lp, -jnp.inf), -1)
        text_lp = jnp.max(jnp.where(is_ts_col[None, :], -jnp.inf, lp), -1)
        force_ts = ts_lp > text_lp
        lg = jnp.where(force_ts[:, None] & ~is_ts_col[None, :], -jnp.inf, lg)

        lp = jax.nn.log_softmax(lg, -1)
        if temperature > 0.0:
            key = jax.random.fold_in(c["rng"], pos)
            nxt = jax.random.categorical(key, lg / temperature, -1)
            nxt = nxt.astype(jnp.int32)
        else:
            nxt = jnp.argmax(lp, -1).astype(jnp.int32)
        nxt = jnp.where(c["done"], sp.eot, nxt)
        # primer positions are forced (the step still fills the KV cache)
        in_primer = pos + 1 < n_primer
        forced = primer[:, jnp.minimum(pos + 1, n_primer - 1)]
        nxt = jnp.where(in_primer, forced, nxt)
        sum_lp = c["sum_lp"] + jnp.where(
            c["done"] | in_primer, 0.0,
            jnp.take_along_axis(lp, nxt[:, None], 1)[:, 0],
        )
        done = c["done"] | (~in_primer & (nxt == sp.eot))
        tokens = jax.lax.dynamic_update_slice(
            c["tokens"], nxt[:, None], (0, pos + 1)
        )
        max_ts = jnp.where(nxt >= ts0, jnp.maximum(c["max_ts"], nxt), c["max_ts"])
        has_ts = c["has_ts"] | ((nxt >= ts0) & ~c["done"])
        return {
            "pos": pos + 1, "tokens": tokens, "self_kv": self_kv,
            "done": done, "max_ts": max_ts, "sum_lp": sum_lp,
            "has_ts": has_ts, "rng": c["rng"],
        }

    out = jax.lax.while_loop(cond, body, {
        "pos": jnp.int32(0),
        "tokens": tokens0,
        "self_kv": self_kv,
        "done": jnp.zeros((b,), bool),
        "max_ts": jnp.full((b,), ts0, jnp.int32),
        "sum_lp": jnp.zeros((b,), jnp.float32),
        "has_ts": jnp.zeros((b,), bool),
        "rng": rng if rng is not None else jax.random.PRNGKey(0),
    })
    tokens = out["tokens"]
    is_eot = (tokens == sp.eot) & (jnp.arange(total)[None] >= n_primer)
    lengths = jnp.where(jnp.any(is_eot, 1), jnp.argmax(is_eot, 1), total)
    return tokens, lengths, out["sum_lp"]


# fixed prompt-context buckets: each distinct primer length compiles its
# own decode loop, so the <|startofprev|> window is truncated DOWN to the
# largest bucket that fits instead of taking stock's exact last
# (n_ctx//2 - 1) tokens — at most len(PROMPT_BUCKETS) compiled variants
# per process for arbitrary-length audio (deviation documented in
# `transcribe`; stock itself truncates to the last 223)
PROMPT_BUCKETS = (0, 8, 16, 32, 64, 128, 223)


def _bucket_prompt(prompt_toks: list) -> list:
    n = len(prompt_toks)
    b = max(bk for bk in PROMPT_BUCKETS if bk <= n)
    return prompt_toks[len(prompt_toks) - b:] if b else []


def compression_ratio(text: str) -> float:
    """gzip compression ratio — the repetition-loop detector
    (whisper utils.py compression_ratio)."""
    import zlib

    data = text.encode("utf-8")
    return len(data) / max(len(zlib.compress(data)), 1)


def transcribe(
    params,
    cfg: WhisperConfig,
    audio: np.ndarray,
    tokenizer=None,
    language: str | None = None,
    task: str = "transcribe",
    temperature: tuple[float, ...] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: float | None = 2.4,
    no_speech_threshold: float = 0.6,
    logprob_threshold: float | None = -1.0,
    max_steps: int = 224,
    word_timestamps: bool = False,
    condition_on_previous_text: bool = True,
    initial_prompt: str | None = None,
    beam_size: int = 1,
    seed: int = 0,
) -> dict:
    """Long-form transcription of arbitrary-length 16 kHz audio
    (whisper `transcribe.py`): 30 s windows, timestamp-token seek,
    first-window language detection, no-speech skipping, and the
    temperature fallback ladder (retry hotter when the gzip compression
    ratio flags a repetition loop or avg logprob is too low,
    transcribe.py decode_with_fallback). With word_timestamps, each
    segment carries cross-attention DTW word timings (decode/timing.py).

    Stock prompt conditioning (transcribe.py:45-46, decoding.py:591-599):
      * initial_prompt — tokenized as " "+strip() and placed in the
        <|startofprev|> window of the first decode;
      * condition_on_previous_text (default True, like stock) — each
        window's primer carries [<|startofprev|>] + the most recent
        previously-decoded TEXT tokens + [sot, lang, task]; the context
        resets after a window decoded at temperature > 0.5
        (prompt_reset_since). TPU deviation: the context is truncated
        down to fixed PROMPT_BUCKETS lengths (bounded jit variants)
        instead of stock's exact last n_ctx//2-1 tokens.

    beam_size > 1 runs each window through decode/beam.py with the
    same prompt primer and <|notimestamps|> (stock's
    without_timestamps beam mode): segments then carry window-level
    times, the temperature ladder is bypassed, and seek advances a full
    window.

    Returns {"text", "segments": [Segment], "language"}.
    """
    from agacs_tpu.text import WhisperTokenizer

    sp = SpecialTokens()
    tokenizer = tokenizer or WhisperTokenizer()
    audio = np.asarray(audio, np.float32).reshape(-1)
    rng = jax.random.PRNGKey(seed)

    enc_fn = jax.jit(
        lambda p, m: whisper_encode(p, cfg, m), static_argnums=()
    )

    segments: list[Segment] = []
    texts: list[str] = []
    seek = 0  # samples
    detected = language
    total_dur = len(audio) / SAMPLE_RATE

    # stock prompt-context state (transcribe.py:194-201)
    all_tokens: list[int] = []
    prompt_reset_since = 0
    if initial_prompt is not None:
        all_tokens.extend(tokenizer.encode(" " + initial_prompt.strip()))

    def add_segment(start: float, end: float, txt: str, toks_: list):
        # window timestamps live on the padded 30 s grid; clamp to the
        # actual audio duration
        end = min(end, total_dur)
        start = min(start, end)
        segments.append(Segment(start, end, txt, toks_))
        texts.append(txt)
    while seek < len(audio):
        window = audio[seek : seek + CHUNK_SAMPLES]
        window = np.pad(window, (0, CHUNK_SAMPLES - len(window)))
        mel, _ = log_mel_spectrogram(
            jnp.asarray(window[None]), jnp.asarray([CHUNK_SAMPLES])
        )
        enc = enc_fn(params, mel)

        if detected is None:
            detected = detect_language(params, cfg, enc)[0][0]
        lang_token = sp.lang_id(detected)
        task_token = sp.transcribe if task == "transcribe" else sp.translate

        nsp = float(no_speech_probs(params, cfg, enc)[0])
        # <|startofprev|> context window (decoding.py:591-599): the
        # bucketed tail of the accumulated text tokens
        prompt_toks = _bucket_prompt(all_tokens[prompt_reset_since:])
        sot_seq = [sp.sot, lang_token, task_token]
        primer_list = (
            [sp.sot_prev] + prompt_toks + sot_seq if prompt_toks else sot_seq
        )
        n_primer = len(primer_list)
        primer = jnp.asarray([primer_list], jnp.int32)

        if beam_size > 1:
            from agacs_tpu.decode.beam import beam_decode

            tokens, lengths, scores = beam_decode(
                params, cfg, enc, beam_size=beam_size,
                primer=tuple(primer_list) + (sp.no_timestamps,),
                max_steps=max_steps,
            )
            toks = np.asarray(tokens)[0, n_primer + 1 : int(lengths[0])]
            toks = [int(t) for t in toks]
            avg_lp = float(scores[0]) / max(len(toks) + 1, 1)
            chosen_temp = 0.0
        else:
            # decode_with_fallback: escalate temperature until the result
            # passes the compression-ratio and avg-logprob gates
            toks, avg_lp = [], 0.0
            chosen_temp = 0.0
            for ti, temp in enumerate(temperature):
                rng, key = jax.random.split(rng)
                tokens, lengths, sum_lp = greedy_decode_timestamps(
                    params, cfg, enc, primer, max_steps=max_steps,
                    temperature=float(temp), rng=key,
                )
                toks = np.asarray(tokens)[0, n_primer : int(lengths[0])]
                toks = [int(t) for t in toks]
                chosen_temp = float(temp)
                avg_lp = float(sum_lp[0]) / max(len(toks) + 1, 1)
                text_ids_all = [t for t in toks if t < sp.eot]
                needs_fallback = False
                if compression_ratio_threshold is not None and text_ids_all:
                    if (compression_ratio(tokenizer.decode(text_ids_all))
                            > compression_ratio_threshold):
                        needs_fallback = True
                if (logprob_threshold is not None
                        and avg_lp < logprob_threshold):
                    needs_fallback = True
                if not needs_fallback or ti == len(temperature) - 1:
                    break

        seek_time = seek / SAMPLE_RATE
        if nsp > no_speech_threshold and (
            logprob_threshold is None or avg_lp < logprob_threshold
        ):
            seek += CHUNK_SAMPLES  # silence: skip the window
            continue
        n_before = len(segments)

        # split into timestamped segments
        ts_idx = [i for i, t in enumerate(toks) if t >= sp.timestamp_begin]
        consecutive = [
            i for j, i in enumerate(ts_idx[1:], 1) if ts_idx[j - 1] == i - 1
        ]
        if consecutive:
            # complete segments end at timestamp pairs
            last_slice = 0
            for end_i in consecutive:
                seg = toks[last_slice:end_i]
                ts = [t for t in seg if t >= sp.timestamp_begin]
                text_ids = [t for t in seg if t < sp.eot]
                if ts:
                    start = (ts[0] - sp.timestamp_begin) * TIME_PRECISION
                    end = (ts[-1] - sp.timestamp_begin) * TIME_PRECISION
                    add_segment(seek_time + start, seek_time + end,
                                tokenizer.decode(text_ids), seg)
                last_slice = end_i
            last_ts = toks[consecutive[-1]]
            advance = int((last_ts - sp.timestamp_begin) * TIME_PRECISION
                          * SAMPLE_RATE)
            seek += max(advance, SAMPLE_RATE // 2)  # always make progress
        else:
            # no closing pair: take everything, advance a full window
            text_ids = [t for t in toks if t < sp.eot]
            ts = [t for t in toks if t >= sp.timestamp_begin]
            start = ((ts[0] - sp.timestamp_begin) * TIME_PRECISION
                     if ts else 0.0)
            end = ((ts[-1] - sp.timestamp_begin) * TIME_PRECISION
                   if len(ts) > 1 else min(30.0, len(audio) / SAMPLE_RATE
                                           - seek_time))
            if text_ids:
                add_segment(seek_time + start, seek_time + end,
                            tokenizer.decode(text_ids), toks)
            seek += CHUNK_SAMPLES

        # prompt-context accumulation (transcribe.py:356-362): the
        # window's decoded TEXT tokens extend the context; reset after a
        # hot-temperature window
        for seg in segments[n_before:]:
            all_tokens.extend(t for t in seg.tokens if t < sp.eot)
        if not condition_on_previous_text or chosen_temp > 0.5:
            prompt_reset_since = len(all_tokens)

        if word_timestamps and len(segments) > n_before:
            from agacs_tpu.decode.timing import find_word_alignment

            window_text = [t for t in toks if t < sp.eot]
            valid_frames = min(
                CHUNK_SAMPLES,
                len(audio) - int(seek_time * SAMPLE_RATE),
            ) // 160 // 2
            words = find_word_alignment(
                params, cfg, tokenizer, window_text, enc,
                num_frames=max(valid_frames, 1),
                primer=(sp.sot, lang_token, task_token),
            )
            new_segs = segments[n_before:]
            for w in words:
                mid = seek_time + (w.start + w.end) / 2
                host = min(
                    new_segs,
                    key=lambda s: 0.0 if s.start <= mid <= s.end
                    else min(abs(mid - s.start), abs(mid - s.end)),
                )
                host.words.append(dataclasses.replace(
                    w, start=seek_time + w.start, end=seek_time + w.end))

    return {"text": "".join(texts), "segments": segments,
            "language": detected}
