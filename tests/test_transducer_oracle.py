"""Parity of the transducer searches against the reference's own
BeamSearchTransducer (torch), used as an imported oracle: identical
weights on both sides (torch-layout params map leaf-for-leaf), identical
encoder output, compare decoded sequences.

Covers greedy (reference one-symbol-per-frame semantics), default beam,
TSD and ALSD — reference espnet2/asr/transducer/beam_search_transducer.py.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.models.transducer import (
    TransducerConfig,
    default_beam_search,
    greedy_search,
    init_transducer_params,
)
from tests.test_transducer import _overfit_tiny

torch = pytest.importorskip("torch")

_REF = "/root/reference/espnet"


def _reference_searcher(params, cfg: TransducerConfig, enc_size: int,
                        beam_size: int, search_type: str = "default",
                        **kw):
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    from espnet2.asr.decoder.transducer_decoder import TransducerDecoder
    from espnet2.asr.transducer.beam_search_transducer import (
        BeamSearchTransducer,
    )
    from espnet2.asr_transducer.joint_network import JointNetwork

    dec = TransducerDecoder(
        cfg.vocab_size, rnn_type=cfg.rnn_type, num_layers=cfg.num_layers,
        hidden_size=cfg.hidden_size, embed_pad=cfg.blank_id,
    )
    joint = JointNetwork(
        cfg.vocab_size, enc_size, cfg.hidden_size,
        joint_space_size=cfg.joint_space_size,
        joint_activation_type=cfg.joint_activation,
    )
    with torch.no_grad():
        dec.embed.weight.copy_(torch.tensor(np.asarray(params["embed"])))
        for li in range(cfg.num_layers):
            m = dec.decoder[li]
            m.weight_ih_l0.copy_(
                torch.tensor(np.asarray(params["layers"]["w_ih"][li]).T)
            )
            m.weight_hh_l0.copy_(
                torch.tensor(np.asarray(params["layers"]["w_hh"][li]).T)
            )
            m.bias_ih_l0.copy_(
                torch.tensor(np.asarray(params["layers"]["b_ih"][li]))
            )
            m.bias_hh_l0.copy_(
                torch.tensor(np.asarray(params["layers"]["b_hh"][li]))
            )
        jp = params["joint"]
        joint.lin_enc.weight.copy_(torch.tensor(np.asarray(jp["lin_enc"]["w"]).T))
        joint.lin_enc.bias.copy_(torch.tensor(np.asarray(jp["lin_enc"]["b"])))
        joint.lin_dec.weight.copy_(torch.tensor(np.asarray(jp["lin_dec"]["w"]).T))
        joint.lin_out.weight.copy_(torch.tensor(np.asarray(jp["lin_out"]["w"]).T))
        joint.lin_out.bias.copy_(torch.tensor(np.asarray(jp["lin_out"]["b"])))
    dec.eval()
    joint.eval()
    return BeamSearchTransducer(
        dec, joint, beam_size, search_type=search_type, score_norm=False, **kw
    )


@pytest.fixture(scope="module")
def overfit():
    rng = np.random.RandomState(0)
    cfg = TransducerConfig(vocab_size=8, hidden_size=16, joint_space_size=16)
    params = init_transducer_params(jax.random.PRNGKey(3), cfg, encoder_size=6)
    enc = jnp.asarray(rng.randn(2, 10, 6), jnp.float32)
    enc_lens = jnp.asarray([10, 7])
    targets = jnp.asarray([[3, 1, 4, 2], [5, 6, 0, 0]], jnp.int32)
    u_lens = jnp.asarray([4, 2])
    params, loss = _overfit_tiny(cfg, params, enc, enc_lens, targets, u_lens)
    assert loss < 1.0
    return cfg, params, enc, enc_lens


def test_greedy_matches_reference(overfit):
    cfg, params, enc, enc_lens = overfit
    searcher = _reference_searcher(params, cfg, enc_size=6, beam_size=1)
    tokens, n = greedy_search(
        params, cfg, enc, enc_lens, max_symbols=10, advance_on_emit=True
    )
    for b in range(2):
        with torch.no_grad():
            ref = searcher(torch.tensor(np.asarray(enc[b, : int(enc_lens[b])])))
        want = ref[0].yseq[1:]  # yseq[0] is the blank primer
        got = list(np.asarray(tokens[b, : int(n[b])]))
        assert got == want, (b, got, want)


@pytest.mark.parametrize(
    "search_type,kw",
    [
        ("default", {}),
        ("tsd", {"max_sym_exp": 3}),
        ("alsd", {"u_max": 8}),
        ("nsc", {"nstep": 2, "prefix_alpha": 1}),
        ("maes", {"nstep": 2, "prefix_alpha": 1, "expansion_gamma": 2.3,
                  "expansion_beta": 2}),
    ],
)
def test_beams_match_reference_1best(overfit, search_type, kw):
    cfg, params, enc, enc_lens = overfit
    searcher = _reference_searcher(
        params, cfg, enc_size=6, beam_size=3, search_type=search_type, **kw
    )
    for b in range(2):
        with torch.no_grad():
            ref = searcher(torch.tensor(np.asarray(enc[b, : int(enc_lens[b])])))
        want = ref[0].yseq[1:]

        if search_type == "default":
            nbest = default_beam_search(
                params, cfg, np.asarray(enc[b, : int(enc_lens[b])]),
                beam_size=3,
            )
            got = nbest[0][1]
            got_score = nbest[0][0]
        elif search_type == "nsc":
            from agacs_tpu.decode.transducer_nsc import nsc_beam_search

            nbest = nsc_beam_search(
                params, cfg, np.asarray(enc[b, : int(enc_lens[b])]),
                beam_size=3, nstep=2, prefix_alpha=1,
            )
            got = nbest[0][1]
            got_score = nbest[0][0]
        elif search_type == "maes":
            from agacs_tpu.decode.transducer_nsc import maes_beam_search

            nbest = maes_beam_search(
                params, cfg, np.asarray(enc[b, : int(enc_lens[b])]),
                beam_size=3, nstep=2, prefix_alpha=1,
                expansion_gamma=2.3, expansion_beta=2,
            )
            got = nbest[0][1]
            got_score = nbest[0][0]
        elif search_type == "tsd":
            from agacs_tpu.decode.transducer_tsd import tsd_beam_search

            tokens, n, scores = tsd_beam_search(
                params, cfg, enc[b:b + 1], enc_lens[b:b + 1], beam=3,
                max_sym_exp=3,
            )
            got = list(np.asarray(tokens[0, 0, : int(n[0, 0])]))
            got_score = float(scores[0, 0])
        else:
            from agacs_tpu.decode.transducer_tsd import alsd_beam_search

            tokens, n, scores = alsd_beam_search(
                params, cfg, enc[b:b + 1], enc_lens[b:b + 1], beam=3, u_max=8,
            )
            got = list(np.asarray(tokens[0, 0, : int(n[0, 0])]))
            got_score = float(scores[0, 0])

        assert got == want, (search_type, b, got, want)
        if search_type == "alsd":
            # our ALSD log-adds recombined duplicate mass into the final
            # pool (documented deviation in transducer_tsd._alsd_single);
            # the reference keeps duplicates and reports the max path, so
            # our score is >= theirs
            assert got_score >= float(ref[0].score) - 5e-3, (
                b, got_score, float(ref[0].score),
            )
        else:
            # scores agree exactly (log-domain, fp32 both sides)
            assert abs(got_score - float(ref[0].score)) < 5e-3, (
                search_type, b, got_score, float(ref[0].score),
            )
