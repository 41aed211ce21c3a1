"""CS loss / head counting parity vs a literal torch oracle of
espnet_model.py:463-530 (calculate_cs_loss) and :285-310 (head counting
intent), on synthetic attention maps."""

import numpy as np
import pytest

import jax.numpy as jnp

from agacs_tpu.adapt import (
    LANG_BOTH,
    LANG_EN,
    LANG_PAD,
    LANG_ZH,
    attention_target_labels,
    count_language_heads,
    cs_attention_loss,
    select_heads,
)
from agacs_tpu.adapt.head_selection import load_counts, save_counts
from agacs_tpu.text import WhisperTokenIdConverter, WhisperTokenizer

L, B, H, T = 4, 3, 5, 12  # layers, batch, heads, seq (parameterized shapes)
C_VAL = 0.6


@pytest.fixture(scope="module")
def tok():
    return WhisperTokenizer()


def _make_ys_in(tok):
    """sos-prefixed, eos-padded decoder inputs like add_sos_eos output."""
    conv = WhisperTokenIdConverter(tok)
    texts = ["我们 go", "hello 你", "了"]
    seqs = []
    for t in texts:
        ids = conv.tokens2ids(tok.text2tokens(t))  # prefix + ids + eot
        seqs.append([tok.special.sot] + ids)
    maxlen = T
    out = np.full((len(seqs), maxlen), tok.special.eot, dtype=np.int64)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s[:maxlen]
    return out


def _torch_oracle_pattern(ys_in_row, tok, c=C_VAL):
    """create_attention_pattern (espnet_model.py:236-275), literally."""
    import torch

    token_list = [tok.id_to_token(int(i)) for i in ys_in_row]
    prompt_index = 5
    lid = []
    lid_len = 0
    for t in token_list[prompt_index:]:
        if t == "<|endoftext|>":
            lid.append([c, c])
            lid_len += 1
            break
        elif t.replace("Ġ", "") == "":
            lid.append([c, c])
        else:
            is_en = 1 if WhisperTokenizer.token_is_english(t) else 0
            lid.append([0.0 if is_en else c, c if is_en else 0.0])
        lid_len += 1
    prompt = torch.tensor(
        [[0.0, 0.0], [c, 0.0], [0.0, c], [0.0, 0.0], [0.0, 0.0]]
    )
    lid_t = torch.tensor(lid, dtype=torch.float)
    pad = torch.full((len(ys_in_row) - prompt_index - lid_len, 2), torch.inf)
    return torch.cat([prompt, lid_t, pad])


def _torch_oracle_loss(maps, ys_in, tok, head_mask, c=C_VAL):
    """calculate_cs_loss (espnet_model.py:463-530), literally, on full maps
    (maps: torch (L, B, H, T, T) pre-softmax with -inf causal entries)."""
    import torch

    pattern = torch.stack([_torch_oracle_pattern(r, tok, c) for r in ys_in])  # (B,T,2)
    att = maps.permute(1, 0, 2, 3, 4).clone().float()  # (B,L,H,T,T)
    # per-layer patterns (espnet_model.py:470-488): layers 0-1 get the
    # early-layer pattern (1 at col 0 on non-pad rows, ZEROS at cols 1:3 —
    # no infs), layers 2+ the language pattern at cols 1:3.
    b_, l_, _, t_, _ = att.shape
    mask = torch.isinf(pattern[:, :, 1])
    early = torch.zeros(b_, t_, t_)
    early[:, :, 0][~mask] = 1.0
    lang = torch.zeros(b_, t_, t_)
    lang[:, :, 1:3] = pattern
    full_pat = torch.zeros(b_, l_, t_, t_)
    full_pat[:, :2] = early.unsqueeze(1).expand(-1, min(2, l_), -1, -1)
    full_pat[:, 2:] = lang.unsqueeze(1).expand(-1, max(l_ - 2, 0), -1, -1)
    rep = full_pat.unsqueeze(2).expand(-1, -1, att.shape[2], -1, -1).clone()
    att[torch.isinf(rep)] = 0.0
    att[torch.isinf(att)] = 0.0
    rep[torch.isinf(rep)] = 0.0
    mse = (att[..., 1:3] - rep[..., 1:3]) ** 2
    row = mse.sum(dim=-1)  # (B,L,H,T)
    per_head = row.sum(dim=-1) / torch.count_nonzero(row, dim=-1)
    masked = torch.as_tensor(head_mask)[None] * per_head
    # tensor (not float): the trajectory-parity harness backprops through it
    return torch.mean(torch.sum(masked, dim=[-1, -2]))


def _synthetic_maps(rng):
    """(L,B,H,T,T) logits with -inf strict-upper-triangle (causal mask)."""
    import torch

    maps = torch.from_numpy(rng.randn(L, B, H, T, T).astype(np.float32))
    causal = torch.triu(torch.full((T, T), float("-inf")), diagonal=1)
    return maps + causal


def test_labels(tok):
    ys_in = _make_ys_in(tok)
    labels = attention_target_labels(ys_in, tok)
    # prompt rows
    assert labels[0, :5].tolist() == [0, LANG_ZH, LANG_EN, 0, 0]
    # first eot -> BOTH, following padding -> PAD
    for i in range(len(ys_in)):
        eots = np.where(ys_in[i] == tok.special.eot)[0]
        first = eots[0]
        assert labels[i, first] == LANG_BOTH
        assert (labels[i, first + 1 :] == LANG_PAD).all()


def test_cs_loss_matches_reference_oracle(tok):
    rng = np.random.RandomState(7)
    maps = _synthetic_maps(rng)
    ys_in = _make_ys_in(tok)
    head_mask = (rng.rand(L, H) > 0.5).astype(np.float32)

    expected = float(_torch_oracle_loss(maps, ys_in, tok, head_mask))

    qk_cols = jnp.asarray(maps.numpy()[..., 1:3])  # model emits only these
    labels = attention_target_labels(ys_in, tok)
    got = float(
        cs_attention_loss(qk_cols, jnp.asarray(labels), jnp.asarray(head_mask))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_head_counting_and_selection():
    # heads 0,1 attend overwhelmingly to the language columns
    p_cols = np.zeros((L, B, H, T, 2), np.float32)
    p_cols[:, :, 0, :, :] = 0.45  # 0.9 mass per row on lang cols
    p_cols[:, :, 1, :, :] = 0.30  # 0.6 mass
    p_cols[:, :, 2, :, :] = 0.20  # 0.4 mass -> not selected
    counts = np.asarray(count_language_heads(jnp.asarray(p_cols)))
    assert (counts[:, 0] == B).all() and (counts[:, 1] == B).all()
    assert (counts[:, 2:] == 0).all()

    mask = select_heads(counts, head_percentage=100.0)
    assert mask.shape == (L, H)
    assert mask[:, :2].all() and not mask[:, 2:].any()

    # 50% keeps the top half of the nonzero pool
    half = select_heads(counts, head_percentage=50.0)
    assert half.sum() == (counts > 0).sum() // 2


def test_counts_roundtrip(tmp_path):
    counts = np.arange(12).reshape(3, 4)
    p = tmp_path / "counts.json"
    save_counts(str(p), counts)
    np.testing.assert_array_equal(load_counts(str(p)), counts)


def _torch_oracle_lid_ce(maps, ys_in, tok, head_mask, lsm=0.1):
    """calculate_cs_loss_lid_ce (espnet_model.py:392-461), literally, with
    the 12x12 hardcodes generalized to (L, H). getlid (:364-390) inlined."""
    import torch

    def getlid(row):
        token_list = [tok.id_to_token(int(i)) for i in row]
        prompt_index = 5
        lid_token = []
        for t in token_list[prompt_index:]:
            if t == "<|endoftext|>":
                break
            elif t.replace("Ġ", "") == "":
                lid_token.append(2)
            else:
                lid_token.append(
                    2 if WhisperTokenizer.token_is_english(t) else 1
                )
        prompt = torch.tensor([torch.inf, 1, 2, torch.inf, torch.inf])
        lid = torch.tensor(lid_token, dtype=torch.float)
        pad = torch.full((len(row) - 5 - len(lid_token),), torch.inf)
        return torch.cat([prompt, lid, pad])

    lid_sentences = torch.stack([getlid(r) for r in ys_in])
    ys_in_lens = torch.tensor(
        [5 + int((getlid(r) != torch.inf)[5:].sum()) for r in ys_in]
    )
    att = maps.permute(1, 0, 2, 3, 4).clone().float()
    bs, l_, h_, t_, _ = att.shape
    gt = lid_sentences.clone()
    gt[~torch.isfinite(gt)] = 0
    exp_gt = gt[:, None, None, :].repeat(1, l_, h_, 1).to(torch.long)
    att[torch.isinf(att)] = 0
    flat = att.reshape(-1, t_, t_)
    exp_flat = exp_gt.reshape(-1, t_)
    crit = torch.nn.CrossEntropyLoss(reduction="none", label_smoothing=lsm)
    loss = crit(flat.permute(0, 2, 1), exp_flat).view(bs, l_, h_, t_)
    lens = ys_in_lens - 1
    seq_mask = (
        torch.arange(t_)[None, None, None, :] < lens[:, None, None, None]
    )
    idx_mask = torch.ones_like(seq_mask)
    idx_mask[:, :, :, [0, 3, 4]] = 0
    masked = loss * (seq_mask * idx_mask).float()
    layer_head = masked.nansum(dim=-1)
    sel = torch.as_tensor(head_mask)[None] * layer_head
    return float(torch.mean(torch.sum(sel, dim=[-1, -2])))


def test_lid_labels(tok):
    from agacs_tpu.adapt.cs_loss import attention_target_labels as atl

    ys_in = _make_ys_in(tok)
    labels = atl(ys_in, tok, mode="lid_ce")
    # prompt rows: [PAD, ZH, EN, PAD, PAD] (getlid [inf,1,2,inf,inf])
    assert labels[0, :5].tolist() == [LANG_PAD, LANG_ZH, LANG_EN,
                                      LANG_PAD, LANG_PAD]
    # the eot row and everything after are PAD (getlid breaks at eot)
    for i in range(len(ys_in)):
        first = np.where(ys_in[i] == tok.special.eot)[0][0]
        assert (labels[i, first:] == LANG_PAD).all()
        # no BOTH label exists in lid mode (space-only -> EN)
        assert not (labels[i] == LANG_BOTH).any()


def test_lid_ce_loss_matches_reference_oracle(tok):
    from agacs_tpu.adapt.cs_loss import attention_target_labels as atl
    from agacs_tpu.adapt.cs_loss import cs_lid_ce_loss

    rng = np.random.RandomState(11)
    maps = _synthetic_maps(rng)
    ys_in = _make_ys_in(tok)
    head_mask = (rng.rand(L, H) > 0.5).astype(np.float32)

    expected = _torch_oracle_lid_ce(maps, ys_in, tok, head_mask)

    labels = atl(ys_in, tok, mode="lid_ce")
    ys_in_lens = np.array(
        [5 + int((labels[i, 5:] != LANG_PAD).sum()) for i in range(len(ys_in))]
    )
    got = float(
        cs_lid_ce_loss(
            jnp.asarray(maps.numpy()),
            jnp.asarray(labels),
            jnp.asarray(ys_in_lens),
            jnp.asarray(head_mask),
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_lid_ce_forward_trains(tok):
    """cs_loss_type: lid_ce end-to-end through the ASR forward on a tiny
    whisper config — loss finite, loss_cs present and differentiable."""
    import jax

    from agacs_tpu.models.asr_model import (
        ASRModelConfig,
        forward,
        init_asr_params,
    )
    from agacs_tpu.models.whisper import WhisperConfig

    cfg = ASRModelConfig(
        whisper=WhisperConfig(
            n_mels=80, n_audio_ctx=32, n_audio_state=64, n_audio_head=2,
            n_audio_layer=2, n_vocab=51865, n_text_ctx=32,
            n_text_state=64, n_text_head=2, n_text_layer=2,
        ),
        cs_weight=0.5,
        cs_loss_type="lid_ce",
        use_specaug=False,
        head_mask=tuple(tuple(r) for r in np.ones((2, 2), np.float32)),
    )
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    ys = _make_ys_in(tok)[:, 1:]  # drop sot: batch text is converter ids
    from agacs_tpu.adapt.cs_loss import attention_target_labels as atl

    ys_in = np.concatenate(
        [np.full((len(ys), 1), tok.special.sot, ys.dtype), ys], axis=1
    )
    # keep each row's real (first) eot; -1 the eot padding after it,
    # matching the converter output + CommonCollateFn layout
    text = ys.astype(np.int32).copy()
    for i in range(len(ys)):
        eots = np.where(ys[i] == tok.special.eot)[0]
        if len(eots) > 1:
            text[i, eots[1]:] = -1
    s = 64 * 160  # 64 mel frames -> 32 encoder positions
    batch = {
        "speech": jnp.asarray(rng.randn(len(ys), s).astype(np.float32) * 0.1),
        "speech_lengths": jnp.full((len(ys),), s, jnp.int32),
        "text": jnp.asarray(text),
        "cs_labels": jnp.asarray(atl(ys_in, tok, mode="lid_ce")),
    }

    def loss_of(p):
        loss, stats = forward(p, cfg, batch, train=False)
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
    assert np.isfinite(float(loss)) and np.isfinite(float(stats["loss_cs"]))
    gn = float(
        jnp.sqrt(
            sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))
        )
    )
    assert np.isfinite(gn) and gn > 0
