"""Helpers to use the (read-only) reference torch Whisper as a parity oracle.

We import the reference's modified whisper package to generate golden
outputs. This exercises OUR code against THEIR behavior — no reference code
is copied into the framework.
"""

import sys
import types

_WHISPER_PATH = "/root/reference/espnet/whisper"


def import_reference_whisper():
    if "numba" not in sys.modules:
        fake = types.ModuleType("numba")
        fake.jit = lambda *a, **k: (lambda f: f)
        fake.njit = fake.jit
        sys.modules["numba"] = fake
    if _WHISPER_PATH not in sys.path:
        sys.path.insert(0, _WHISPER_PATH)
    import whisper.model as wm

    return wm


def tiny_dims(wm, n_vocab=100, n_state=64, n_head=4):
    return wm.ModelDimensions(
        n_mels=80,
        n_audio_ctx=20,
        n_audio_state=n_state,
        n_audio_head=n_head,
        n_audio_layer=2,
        n_vocab=n_vocab,
        n_text_ctx=16,
        n_text_state=n_state,
        n_text_head=n_head,
        n_text_layer=2,
    )


def make_torch_model(adapter=False, pe_whisper=False, n_vocab=100, seed=0,
                     n_state=64, n_head=4):
    import torch

    wm = import_reference_whisper()
    torch.manual_seed(seed)
    # NOTE: the reference PE gate is hardcoded to 12 heads (model.py:121),
    # so PE oracles must use n_head=12.
    model = wm.Whisper(
        tiny_dims(wm, n_vocab, n_state, n_head),
        adapter=adapter, pe_whisper=pe_whisper,
    )
    # decoder.positional_embedding is torch.empty (uninitialized) in the
    # reference; give it defined values for the oracle
    torch.nn.init.normal_(model.decoder.positional_embedding, 0.0, 0.02)
    return model.eval()


def torch_decoder_forward(model, tokens, audio_feats, collect_maps=True):
    """Reference decoder forward the way the ESPnet wrapper drives it
    (whisper_decoder.py:150-170): iterate blocks, collect self-attn maps."""
    import torch

    with torch.no_grad():
        x = (
            model.decoder.token_embedding(tokens)
            + model.decoder.positional_embedding[: tokens.shape[1]]
        )
        maps = []
        for block in model.decoder.blocks:
            x, att = block(x, audio_feats, mask=model.decoder.mask)
            maps.append(att)
        x = model.decoder.ln(x)
        logits = x @ model.decoder.token_embedding.weight.T
    return logits, torch.stack(maps)  # maps: (L, B, h, T, T)
