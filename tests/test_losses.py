"""Loss-function parity vs the espnet reference (torch oracles)."""

import numpy as np
import pytest

import jax.numpy as jnp

from agacs_tpu.train.losses import (
    add_sos_eos,
    label_smoothing_loss,
    th_accuracy,
)


def _torch_add_sos_eos(ys_pad, sos, eos, ignore_id):
    """Literal reference add_sos_eos (add_sos_eos.py:12-32)."""
    import torch

    def pad_list(xs, pad_value):
        n_batch = len(xs)
        max_len = max(x.size(0) for x in xs)
        pad = xs[0].new_full((n_batch, max_len), pad_value)
        for i in range(n_batch):
            pad[i, : xs[i].size(0)] = xs[i]
        return pad

    ys_pad = torch.as_tensor(ys_pad)
    _sos = ys_pad.new([sos])
    _eos = ys_pad.new([eos])
    ys = [y[y != ignore_id] for y in ys_pad]
    ys_in = [torch.cat([_sos, y], dim=0) for y in ys]
    ys_out = [torch.cat([y, _eos], dim=0) for y in ys]
    return pad_list(ys_in, eos), pad_list(ys_out, ignore_id)


def _torch_label_smoothing(x, target, size, smoothing=0.1, normalize_length=False):
    """Literal reference LabelSmoothingLoss (label_smoothing_loss.py:41-63)."""
    import torch

    x = torch.as_tensor(x)
    target = torch.as_tensor(target)
    batch_size = x.size(0)
    x = x.view(-1, size)
    target = target.view(-1)
    true_dist = x.clone()
    true_dist.fill_(smoothing / (size - 1))
    ignore = target == -1
    total = len(target) - ignore.sum().item()
    target = target.masked_fill(ignore, 0)
    true_dist.scatter_(1, target.unsqueeze(1), 1.0 - smoothing)
    kl = torch.nn.functional.kl_div(
        torch.log_softmax(x, dim=1), true_dist, reduction="none"
    )
    denom = total if normalize_length else batch_size
    return float(kl.masked_fill(ignore.unsqueeze(1), 0).sum() / denom)


def test_add_sos_eos_parity():
    ys = np.array(
        [[5, 6, 7, -1, -1], [8, 9, 10, 11, 12], [13, -1, -1, -1, -1]], np.int64
    )
    ref_in, ref_out = _torch_add_sos_eos(ys, sos=100, eos=101, ignore_id=-1)
    got_in, got_out = add_sos_eos(jnp.asarray(ys), 100, 101, -1)
    # reference pads to max valid len + 1 == T+1 here because one row is full
    np.testing.assert_array_equal(np.asarray(got_in), ref_in.numpy())
    np.testing.assert_array_equal(np.asarray(got_out), ref_out.numpy())


@pytest.mark.parametrize("normalize_length", [False, True])
def test_label_smoothing_parity(normalize_length):
    rng = np.random.RandomState(0)
    v = 50
    logits = rng.randn(3, 7, v).astype(np.float32)
    targets = rng.randint(0, v, (3, 7))
    targets[0, 5:] = -1
    targets[2, 2:] = -1
    ref = _torch_label_smoothing(
        logits, targets, v, 0.1, normalize_length=normalize_length
    )
    got = float(
        label_smoothing_loss(
            jnp.asarray(logits), jnp.asarray(targets), 0.1,
            normalize_length=normalize_length,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_th_accuracy():
    logits = np.zeros((1, 4, 5), np.float32)
    logits[0, 0, 2] = 1  # correct
    logits[0, 1, 3] = 1  # wrong
    logits[0, 2, 1] = 1  # correct
    logits[0, 3, 0] = 1  # ignored
    targets = np.array([[2, 1, 1, -1]])
    acc = float(th_accuracy(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(acc - 2 / 3) < 1e-6


def test_error_calculator_literal_semantics():
    """ErrorCalculator vs e2e_asr_common.py:100-254 semantics: hyp
    truncated at ref length, space marker -> ' ', CER over spaceless
    chars, WER over words."""
    import numpy as np

    from agacs_tpu.train.error_calculator import ErrorCalculator, edit_distance

    vocab = {0: "a", 1: "b", 2: "Ġ", 3: "c", 9: "z"}
    ec = ErrorCalculator(lambda i: vocab[i])
    ys_pad = np.array([[0, 1, 2, 3, -1, -1]])  # "ab c"
    ys_hat = np.array([[0, 3, 2, 3, 9, 9]])  # truncated at 4 -> "ac c"
    cer, wer = ec(ys_hat, ys_pad)
    assert abs(cer - 1 / 3) < 1e-9  # "acc" vs "abc"
    assert abs(wer - 1 / 2) < 1e-9  # ["ac","c"] vs ["ab","c"]
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], ["x"]) == 1


def test_asr_nll_matches_manual_ce():
    """asr_model.nll == per-token unsmoothed CE summed per utterance
    (espnet_model.py:809-845); batchify_nll splits identically."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from agacs_tpu.models.asr_model import (
        ASRModelConfig, batchify_nll, init_asr_params, nll,
    )
    from agacs_tpu.models.whisper import WhisperConfig, whisper_decode

    cfg = ASRModelConfig(
        whisper=WhisperConfig(
            n_mels=80, n_audio_ctx=10, n_audio_state=64, n_audio_head=4,
            n_audio_layer=1, n_vocab=50, n_text_ctx=16, n_text_state=64,
            n_text_head=4, n_text_layer=1,
        ),
        sos=1, eos=2, use_specaug=False,
    )
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (3, 10, 64))
    ys = jnp.asarray(np.array([[5, 6, 7, -1], [8, 9, -1, -1], [3, 4, 10, 11]]))

    got = np.asarray(nll(params, cfg, enc, ys))

    # manual oracle
    from agacs_tpu.train.losses import add_sos_eos

    ys_in, ys_out = add_sos_eos(ys, 1, 2, -1)
    logits, _ = whisper_decode(params, cfg.whisper, ys_in, enc)
    logp = np.asarray(jax.nn.log_softmax(logits, -1))
    want = np.zeros(3)
    ys_out = np.asarray(ys_out)
    for i in range(3):
        for t in range(ys_out.shape[1]):
            if ys_out[i, t] != -1:
                want[i] -= logp[i, t, ys_out[i, t]]
    np.testing.assert_allclose(got, want, rtol=1e-5)

    chunked = np.asarray(batchify_nll(params, cfg, enc, ys, batch_size=2))
    np.testing.assert_allclose(chunked, got, rtol=1e-5)
