"""CTC greedy (best-path) decoding for the conformer track.

The reference decodes the conformer recipe with full attention+CTC beam
search; CTC best-path is the fast first-line decode here (attention/CTC
joint beam is tracked for the conformer family in later rounds — the
whisper family, which all the paper's experiments use, has full beam
search in decode/beam.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


@jax.jit
def ctc_best_path(ctc_logits: jax.Array, enc_lens: jax.Array) -> jax.Array:
    """(B, T, V) logits -> (B, T) argmax ids with pad positions = blank."""
    ids = jnp.argmax(ctc_logits, axis=-1)
    t = ids.shape[1]
    valid = jnp.arange(t)[None, :] < enc_lens[:, None]
    return jnp.where(valid, ids, 0)


def collapse_ctc(ids: np.ndarray, blank: int = 0) -> list[list[int]]:
    """Collapse repeats then remove blanks, per utterance (host side)."""
    out = []
    for row in np.asarray(ids):
        prev = -1
        seq = []
        for t in row:
            t = int(t)
            if t != prev and t != blank:
                seq.append(t)
            prev = t
        out.append(seq)
    return out


def ctc_greedy_decode(params, encode_fn, batch, blank: int = 0):
    """Full pipeline: encode -> ctc head -> best path -> collapse.

    encode_fn(params, speech, speech_lengths) -> (enc_out, enc_lens);
    params must carry the {"ctc": {w, b}} head.
    """
    enc_out, enc_lens = encode_fn(params, batch["speech"], batch["speech_lengths"])
    logits = (
        jnp.dot(enc_out, params["ctc"]["w"].astype(enc_out.dtype))
        + params["ctc"]["b"].astype(enc_out.dtype)
    ).astype(jnp.float32)
    ids = ctc_best_path(logits, enc_lens)
    return collapse_ctc(np.asarray(ids), blank)
