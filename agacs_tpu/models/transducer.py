"""(RNN-)Transducer decoder, joint network, and search.

TPU-native equivalent of the reference transducer stack (present but
unused by its recipes — SURVEY §2.3 row "Transducer stack"):
  TransducerDecoder  (espnet2/asr/decoder/transducer_decoder.py:12-110):
    Embedding(pad=blank) -> N x LSTM/GRU -> (B, U, H)
  JointNetwork        (espnet2/asr_transducer/joint_network.py:8-59):
    lin_out(act(lin_enc(enc) + lin_dec(dec)))  [lin_dec has no bias]
  greedy / beam search (espnet2/asr/transducer/beam_search_transducer.py)

Design departures for TPU:
  - the decoder runs as one lax.scan over label positions with stacked
    per-layer params (vs torch's cuDNN LSTM modules);
  - greedy search is a single jitted lax.while_loop over the whole batch
    with per-utterance frame pointers (vs the reference's per-utterance
    python loop), one joint evaluation per device step;
  - the default beam search keeps the reference's ragged hypothesis
    semantics on the host, calling jitted step primitives per expansion.

torch parameter layout is preserved leaf-for-leaf (w_ih/w_hh/b_ih/b_hh
with [i|f|g|o] gate order; [r|z|n] for GRU) so torch-trained transducer
checkpoints map directly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = Any


@dataclasses.dataclass(frozen=True)
class TransducerConfig:
    vocab_size: int
    rnn_type: str = "lstm"  # lstm | gru
    num_layers: int = 1
    hidden_size: int = 320
    dropout: float = 0.0
    dropout_embed: float = 0.0
    blank_id: int = 0  # = embed padding id (transducer_decoder.py:34)
    joint_space_size: int = 256
    joint_activation: str = "tanh"  # tanh | relu

    def __post_init__(self):
        if self.rnn_type not in ("lstm", "gru"):
            raise ValueError(f"rnn_type must be lstm|gru, got {self.rnn_type!r}")


def _act(name: str):
    return {"tanh": jnp.tanh, "relu": jax.nn.relu}[name]


def init_transducer_params(
    rng: jax.Array, cfg: TransducerConfig, encoder_size: int
) -> Params:
    h, v, j = cfg.hidden_size, cfg.vocab_size, cfg.joint_space_size
    gates = 4 if cfg.rnn_type == "lstm" else 3
    ks = jax.random.split(rng, 6)

    def uni(k, shape, fan):
        bound = 1.0 / np.sqrt(fan)
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    layer_keys = jax.random.split(ks[0], cfg.num_layers * 4).reshape(
        cfg.num_layers, 4, 2
    )
    layers = {
        "w_ih": jnp.stack([uni(layer_keys[i, 0], (h, gates * h), h)
                           for i in range(cfg.num_layers)]),
        "w_hh": jnp.stack([uni(layer_keys[i, 1], (h, gates * h), h)
                           for i in range(cfg.num_layers)]),
        "b_ih": jnp.stack([uni(layer_keys[i, 2], (gates * h,), h)
                           for i in range(cfg.num_layers)]),
        "b_hh": jnp.stack([uni(layer_keys[i, 3], (gates * h,), h)
                           for i in range(cfg.num_layers)]),
    }
    embed = jax.random.normal(ks[1], (v, h), jnp.float32)
    embed = embed.at[cfg.blank_id].set(0.0)  # padding_idx row
    return {
        "embed": embed,
        "layers": layers,
        "joint": {
            "lin_enc": {"w": uni(ks[2], (encoder_size, j), encoder_size),
                        "b": jnp.zeros((j,), jnp.float32)},
            "lin_dec": {"w": uni(ks[3], (h, j), h)},  # bias=False
            "lin_out": {"w": uni(ks[4], (j, v), j),
                        "b": jnp.zeros((v,), jnp.float32)},
        },
    }


def init_decoder_state(cfg: TransducerConfig, batch: int) -> Params:
    h = cfg.hidden_size
    zeros = jnp.zeros((cfg.num_layers, batch, h), jnp.float32)
    if cfg.rnn_type == "lstm":
        return {"h": zeros, "c": zeros}
    return {"h": zeros}


def _rnn_cell(cfg: TransducerConfig, lp: Params, x, h, c):
    """One torch-layout LSTM/GRU cell step. x,h,c: (B, H)."""
    hid = cfg.hidden_size
    if cfg.rnn_type == "lstm":
        z = x @ lp["w_ih"] + lp["b_ih"] + h @ lp["w_hh"] + lp["b_hh"]
        i, f, g, o = (z[:, k * hid:(k + 1) * hid] for k in range(4))
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new
    zi = x @ lp["w_ih"] + lp["b_ih"]
    zh = h @ lp["w_hh"] + lp["b_hh"]
    r = jax.nn.sigmoid(zi[:, :hid] + zh[:, :hid])
    zg = jax.nn.sigmoid(zi[:, hid:2 * hid] + zh[:, hid:2 * hid])
    n = jnp.tanh(zi[:, 2 * hid:] + r * zh[:, 2 * hid:])
    return (1.0 - zg) * n + zg * h, c


def _embed(params: Params, cfg: TransducerConfig, tokens: jax.Array) -> jax.Array:
    # padding_idx semantics: value AND gradient zero at the blank row
    emb = params["embed"][tokens]
    return emb * (tokens != cfg.blank_id)[..., None].astype(emb.dtype)


def transducer_decoder(
    params: Params,
    cfg: TransducerConfig,
    tokens: jax.Array,
    train: bool = False,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Teacher-forced decoder pass: (B, U) blank-prefixed label ids ->
    (B, U, H) (transducer_decoder.py:112-137 forward)."""
    x = _embed(params, cfg, tokens)
    if train and rng is not None and cfg.dropout_embed > 0.0:
        rng, k = jax.random.split(rng)
        x = x * jax.random.bernoulli(
            k, 1.0 - cfg.dropout_embed, x.shape
        ).astype(x.dtype) / (1.0 - cfg.dropout_embed)

    xs = jnp.swapaxes(x, 0, 1)  # (U, B, H)
    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[li], params["layers"])
        b = x.shape[0]
        h0 = jnp.zeros((b, cfg.hidden_size), x.dtype)
        c0 = jnp.zeros((b, cfg.hidden_size), x.dtype)

        def step(carry, x_u, lp=lp):
            h, c = carry
            h, c = _rnn_cell(cfg, lp, x_u, h, c)
            return (h, c), h

        _, xs = jax.lax.scan(step, (h0, c0), xs)
        if train and rng is not None and cfg.dropout > 0.0:
            rng, k = jax.random.split(rng)
            xs = xs * jax.random.bernoulli(
                k, 1.0 - cfg.dropout, xs.shape
            ).astype(xs.dtype) / (1.0 - cfg.dropout)
    return jnp.swapaxes(xs, 0, 1)


def transducer_decoder_step(
    params: Params,
    cfg: TransducerConfig,
    token: jax.Array,
    state: Params,
) -> tuple[jax.Array, Params]:
    """One AR step: (B,) last token + state -> ((B, H) output, new state)
    (transducer_decoder.py:139-188 score path, with a real recurrent
    state instead of re-running the prefix)."""
    x = _embed(params, cfg, token)
    hs, cs = [], []
    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[li], params["layers"])
        c_li = state["c"][li] if cfg.rnn_type == "lstm" else state["h"][li]
        h_new, c_new = _rnn_cell(cfg, lp, x, state["h"][li], c_li)
        hs.append(h_new)
        cs.append(c_new)
        x = h_new
    new_state = {"h": jnp.stack(hs)}
    if cfg.rnn_type == "lstm":
        new_state["c"] = jnp.stack(cs)
    return x, new_state


def joint(params: Params, cfg: TransducerConfig, enc: jax.Array,
          dec: jax.Array) -> jax.Array:
    """JointNetwork forward (joint_network.py:42-59): broadcasting add in
    joint space. enc: (..., D_enc), dec: (..., H) -> (..., V) logits."""
    jp = params["joint"]
    z = (
        enc @ jp["lin_enc"]["w"].astype(enc.dtype) + jp["lin_enc"]["b"].astype(enc.dtype)
        + dec @ jp["lin_dec"]["w"].astype(dec.dtype)
    )
    z = _act(cfg.joint_activation)(z)
    return z @ jp["lin_out"]["w"].astype(z.dtype) + jp["lin_out"]["b"].astype(z.dtype)


def joint_lattice(params: Params, cfg: TransducerConfig, enc_out: jax.Array,
                  dec_out: jax.Array) -> jax.Array:
    """(B, T, D_enc) x (B, U+1, H) -> (B, T, U+1, V) joint logits
    (espnet_model.py:1009-1011 unsqueeze broadcasting)."""
    return joint(
        params, cfg, enc_out[:, :, None, :], dec_out[:, None, :, :]
    )


def greedy_search(
    params: Params,
    cfg: TransducerConfig,
    enc_out: jax.Array,
    enc_lens: jax.Array,
    max_symbols: int | None = None,
    advance_on_emit: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Batched greedy transducer decoding, one jitted while_loop.

    Default semantics are the standard (Graves) greedy: emit the argmax
    symbol and STAY on the frame until blank wins, so several symbols can
    come from one frame. The reference's greedy_search
    (beam_search_transducer.py:221-253) instead advances to the next
    frame after EVERY prediction (at most one symbol per frame) —
    advance_on_emit=True reproduces that exactly.

    Returns (tokens (B, max_symbols) blank-padded, n_emitted (B,)).
    A per-batch fuel of T + max_symbols bounds the loop; max_symbols
    defaults to the frame count (one symbol per frame on average is the
    practical ceiling for speech)."""
    bsz, t_max, _ = enc_out.shape
    u_cap = int(max_symbols or t_max)

    def cond(s):
        return jnp.any((s["t"] < enc_lens) & (s["n"] < u_cap))

    def body(s):
        enc_t = jnp.take_along_axis(
            enc_out, jnp.minimum(s["t"], t_max - 1)[:, None, None], axis=1
        )[:, 0]
        logits = joint(params, cfg, enc_t, s["dec_out"])
        best = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        active = (s["t"] < enc_lens) & (s["n"] < u_cap)
        emit = active & (best != cfg.blank_id)

        # emitting rows: append token, step the decoder state
        new_dec_out, new_state = transducer_decoder_step(
            params, cfg, jnp.where(emit, best, cfg.blank_id), s["state"]
        )
        state = jax.tree.map(
            lambda new, old: jnp.where(emit[None, :, None], new, old),
            new_state, s["state"],
        )
        dec_out = jnp.where(emit[:, None], new_dec_out, s["dec_out"])
        tokens = s["tokens"].at[jnp.arange(bsz), s["n"]].set(
            jnp.where(emit, best, s["tokens"][jnp.arange(bsz), s["n"]])
        )
        n = s["n"] + emit.astype(jnp.int32)
        if advance_on_emit:
            t = s["t"] + active.astype(jnp.int32)
        else:
            t = s["t"] + jnp.where(active & ~emit, 1, 0).astype(jnp.int32)
        return {"t": t, "n": n, "tokens": tokens, "dec_out": dec_out,
                "state": state, "fuel": s["fuel"] + 1}

    state0 = init_decoder_state(cfg, bsz)
    dec_out0, state0 = transducer_decoder_step(
        params, cfg, jnp.full((bsz,), cfg.blank_id, jnp.int32), state0
    )
    init = {
        "t": jnp.zeros((bsz,), jnp.int32),
        "n": jnp.zeros((bsz,), jnp.int32),
        "tokens": jnp.full((bsz, u_cap), cfg.blank_id, jnp.int32),
        "dec_out": dec_out0,
        "state": state0,
        "fuel": jnp.zeros((), jnp.int32),
    }

    def cond_with_fuel(s):
        return cond(s) & (s["fuel"] < t_max + u_cap)

    out = jax.lax.while_loop(cond_with_fuel, body, init)
    return out["tokens"], out["n"]


@functools.lru_cache(maxsize=8)
def _lm_bucket_fn(lm_cfg):
    """Jitted LM next-token scorer over right-padded prefixes: causal
    attention means logits at position n-1 ignore the padding, so
    bucketing prefix lengths to multiples of 8 bounds compile count."""
    import jax.nn

    from agacs_tpu.models.lm import lm_forward

    @jax.jit
    def score(lm_params, prefix, n):
        logits = lm_forward(lm_params, lm_cfg, prefix)  # (1, Lb, V)
        row = jnp.take_along_axis(
            logits, jnp.reshape(n - 1, (1, 1, 1)), axis=1
        )[0, 0]
        return jax.nn.log_softmax(row.astype(jnp.float32), axis=-1)

    return score


@functools.lru_cache(maxsize=8)
def _beam_step_fns(cfg: TransducerConfig):
    step = jax.jit(
        lambda params, tok, st: transducer_decoder_step(params, cfg, tok, st)
    )
    jointf = jax.jit(
        lambda params, e, d: jax.nn.log_softmax(
            joint(params, cfg, e, d).astype(jnp.float32), axis=-1
        )
    )
    return step, jointf


def greedy_search_scan(
    params: Params,
    cfg: TransducerConfig,
    enc_out: jax.Array,
    enc_lens: jax.Array,
    max_symbols_per_frame: int = 4,
    max_symbols: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Greedy decoding as a lax.scan over frames: per frame, a chain of
    up to `max_symbols_per_frame` argmax emissions, stopping at blank.

    Identical to `greedy_search` (stay-until-blank semantics) whenever no
    frame emits more than the cap — which is essentially always for
    speech — but the static trip count lets XLA pipeline the full-vocab
    joint at HBM speed: measured 13x faster than the while_loop form at
    whisper-vocab recipe dims (docs/PERF.md). This is the production
    greedy; the while_loop form remains for exact unbounded semantics.
    """
    bsz, t_max, _ = enc_out.shape
    u_cap = int(max_symbols or t_max)

    state0 = init_decoder_state(cfg, bsz)
    dec0, state0 = transducer_decoder_step(
        params, cfg, jnp.full((bsz,), cfg.blank_id, jnp.int32), state0
    )

    def frame(carry, xs):
        tokens, n_tok, dec_out, state = carry
        enc_t, valid = xs
        done = ~valid
        for _ in range(max_symbols_per_frame):
            logits = joint(params, cfg, enc_t, dec_out)
            best = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = ~done & (best != cfg.blank_id) & (n_tok < u_cap)
            new_dec, new_state = transducer_decoder_step(
                params, cfg, jnp.where(emit, best, cfg.blank_id), state
            )
            dec_out = jnp.where(emit[:, None], new_dec, dec_out)
            state = jax.tree.map(
                lambda ns, os: jnp.where(emit[None, :, None], ns, os),
                new_state, state,
            )
            tokens = tokens.at[jnp.arange(bsz), n_tok].set(
                jnp.where(emit, best, tokens[jnp.arange(bsz), n_tok])
            )
            n_tok = n_tok + emit.astype(jnp.int32)
            done = done | ~emit
        return (tokens, n_tok, dec_out, state), None

    init = (
        jnp.full((bsz, u_cap), cfg.blank_id, jnp.int32),
        jnp.zeros((bsz,), jnp.int32),
        dec0,
        state0,
    )
    xs = (
        jnp.swapaxes(enc_out, 0, 1),
        (jnp.arange(t_max)[:, None] < enc_lens[None, :]),
    )
    (tokens, n_tok, _, _), _ = jax.lax.scan(frame, init, xs)
    return tokens, n_tok


def default_beam_search(
    params: Params,
    cfg: TransducerConfig,
    enc_out: np.ndarray,
    beam_size: int = 5,
    max_symbols_per_frame: int = 3,
    lm_params: Params | None = None,
    lm_cfg: Any = None,
    lm_weight: float = 0.0,
    lm_sos: int = 50258,
) -> list[tuple[float, list[int]]]:
    """The reference's default_beam_search
    (beam_search_transducer.py:255-354) for one utterance: ragged
    hypothesis semantics on the host, jitted decoder/joint steps on
    device. enc_out: (T, D_enc). Returns [(score, tokens)] best-first,
    scores length-unnormalized log-probs like sort_nbest(score_norm=False).

    With lm_params/lm_cfg/lm_weight, non-blank expansions get LM shallow
    fusion over the [sos]+tokens prefix, cached per hypothesis — the
    reference's use_lm branch (:314-336; blank extensions are not LM
    scored).
    """
    # jitted primitives cached per config — params are traced arguments,
    # so per-utterance calls in a decode run reuse one compilation
    step_fn_p, joint_fn_p = _beam_step_fns(cfg)
    step_fn = lambda tok, st: step_fn_p(params, tok, st)  # noqa: E731
    joint_fn = lambda e, d: joint_fn_p(params, e, d)  # noqa: E731

    state0 = init_decoder_state(cfg, 1)
    dec0, state0 = step_fn(jnp.full((1,), cfg.blank_id, jnp.int32), state0)
    # hyp: (score, tuple(tokens), dec_out, state)
    kept = [(0.0, (), dec0, state0)]
    cache_lm: dict[tuple, np.ndarray] = {}
    t_len = enc_out.shape[0]
    for t in range(t_len):
        enc_t = jnp.asarray(enc_out[t])[None]
        hyps = kept
        kept = []
        for _ in range(beam_size * max_symbols_per_frame):
            if not hyps:
                break
            # expand the current best (A* over this frame's expansions)
            hyps.sort(key=lambda h: -h[0])
            score, toks, dec, st = hyps.pop(0)
            logp = np.asarray(joint_fn(enc_t, dec)[0])
            # blank: hypothesis moves to the next frame (never LM scored)
            kept.append((score + float(logp[cfg.blank_id]), toks, dec, st))
            lm_scores = None
            if lm_params is not None and lm_weight:
                if toks not in cache_lm:
                    n = len(toks) + 1
                    lb = ((n + 7) // 8) * 8
                    prefix = np.zeros((1, lb), np.int32)
                    prefix[0, :n] = [lm_sos, *toks]
                    cache_lm[toks] = np.asarray(
                        _lm_bucket_fn(lm_cfg)(
                            lm_params, jnp.asarray(prefix), jnp.asarray(n)
                        )
                    )
                lm_scores = cache_lm[toks]
            # non-blank expansions stay on this frame
            order = np.argsort(-logp)
            n_exp = 0
            for v in order:
                if v == cfg.blank_id:
                    continue
                new_dec, new_st = step_fn(
                    jnp.asarray([v], jnp.int32), st
                )
                new_score = score + float(logp[v])
                if lm_scores is not None:
                    new_score += lm_weight * float(lm_scores[v])
                hyps.append((new_score, toks + (int(v),), new_dec, new_st))
                n_exp += 1
                if n_exp >= beam_size:
                    break
            # stop expanding once the kept set dominates the open set
            kept.sort(key=lambda h: -h[0])
            if len(kept) >= beam_size and (
                not hyps or kept[beam_size - 1][0] >= max(h[0] for h in hyps)
            ):
                break
        # merge duplicate prefixes, keep beam
        best: dict[tuple, tuple] = {}
        for h in kept:
            if h[1] not in best or h[0] > best[h[1]][0]:
                best[h[1]] = h
        kept = sorted(best.values(), key=lambda h: -h[0])[:beam_size]
    return [(s, list(toks)) for s, toks, _, _ in kept]
