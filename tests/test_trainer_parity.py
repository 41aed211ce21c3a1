"""Training-TRAJECTORY parity vs the reference: run several real optimizer
steps of the reference torch model (tiny dims, CPU, adapters + CS loss,
AdamW + WarmupLR + label-smoothed CE, accum_grad 2) and of agacs_tpu from
identical init and identical batches, and assert the per-step loss and
grad-norm sequences agree.

The torch side is a LITERAL re-derivation of the reference's semantics —
`espnet2/train/trainer.py:479-748` (loss/accum_grad backward accumulation
:628, clip-then-step :668-694, per-accum scheduler step),
`espnet2/asr/espnet_model.py:534-710` (loss mixing), the LabelSmoothingLoss
KL form (`espnet/nets/pytorch_backend/transformer/label_smoothing_loss.py:13`),
WarmupLR (`espnet2/schedulers/warmup_lr.py:11-50`), add_sos_eos
(`.../transformer/add_sos_eos.py:12`) — driving the reference's own torch
Whisper (read-only import, tests/reference_oracle.py). With no corpus and no
pretrained weights in this environment, matching the optimization trajectory
step-for-step is the strongest available accuracy-parity evidence: it
composes the op-level oracles (log-mel, encoder/decoder forward, CS loss)
with the optimizer/scheduler/accum/clip wiring end to end.

Measured drift (fp32, 6 macro steps x accum 2, documented in
docs/COVERAGE.md): relative loss deviation grows 4e-8 -> 3e-7 over the 6
steps; grad norms agree to ~2e-5 relative.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_oracle import make_torch_model
from test_cs_loss import _torch_oracle_loss

from agacs_tpu.adapt.cs_loss import attention_target_labels
from agacs_tpu.models.asr_model import ASRModelConfig, init_asr_params
from agacs_tpu.models.checkpoint import params_from_state_dict
from agacs_tpu.models.whisper import WhisperConfig
from agacs_tpu.text import WhisperTokenIdConverter, WhisperTokenizer
from agacs_tpu.train.optim import OptimConfig
from agacs_tpu.train.trainer import (
    build_tx,
    create_train_state,
    make_train_step,
)

SEED = 7
B = 4              # utterances per micro-batch
ACCUM = 2          # accum_grad (micro-batches per optimizer step)
STEPS = 6          # optimizer steps
T_TEXT = 11        # text ids per row (prompt 4 + tokens + eot, -1 padded)
N_FRAMES = 40      # mel frames -> 20 encoder positions (= tiny n_audio_ctx)
CS_WEIGHT = 0.5
C_VAL = 0.6
LSM = 0.1
LR, WARMUP, CLIP = 1e-3, 4, 1.0
VOCAB = 51865


def _dims():
    return dict(
        n_mels=80, n_audio_ctx=N_FRAMES // 2, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=VOCAB, n_text_ctx=16,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )


def _make_batches(tok):
    """STEPS*ACCUM deterministic micro-batches of (speech, text)."""
    conv = WhisperTokenIdConverter(tok)
    texts = ["我们 go", "hello 你", "好 ok", "去 shop",
             "that 是 right", "嗯 ok lah", "我 think so", "走 了 bye"]
    ids = [conv.tokens2ids(tok.text2tokens(t)) for t in texts]
    rng = np.random.RandomState(SEED)
    s = N_FRAMES * 160
    micro = []
    for it in range(STEPS * ACCUM):
        speech = (rng.randn(B, s) * 0.05).astype(np.float32)
        text = np.full((B, T_TEXT), -1, np.int64)
        for i in range(B):
            row = ids[(it * B + i) % len(ids)][:T_TEXT]
            text[i, : len(row)] = row
        micro.append((speech, text))
    return micro


def _torch_trajectory(model, micro, tok, head_mask,
                      freeze_substr="adapter"):
    """Reference-semantics training loop. Returns (losses, grad_norms):
    per-optimizer-step micro-averaged loss and pre-clip trainable grad
    norm (what `torch.nn.utils.clip_grad_norm_` returns, trainer.py:668)."""
    import torch

    from test_logmel import _torch_oracle as torch_logmel

    sot, eot = tok.special.sot, tok.special.eot

    for name, p in model.named_parameters():
        # freeze preset: substring matching (abs_task.py:1163-1222)
        p.requires_grad = freeze_substr in name
    trainable = [p for p in model.parameters() if p.requires_grad]
    opt = torch.optim.AdamW(trainable, lr=LR, weight_decay=0.01,
                            betas=(0.9, 0.99), eps=1e-6)

    def warmup_factor(k):  # k = 1-based optimizer-update index
        return WARMUP**0.5 * min(k**-0.5, k * WARMUP**-1.5)

    def lsm_loss(x, target):
        """LabelSmoothingLoss(size=V, padding_idx=-1, smoothing=0.1,
        normalize_length=False), literally (label_smoothing_loss.py:40-63)."""
        v = x.size(2)
        bsz = x.size(0)
        x = x.reshape(-1, v)
        target = target.reshape(-1)
        with torch.no_grad():
            true_dist = torch.full_like(x, LSM / (v - 1))
            ignore = target == -1
            target_safe = target.masked_fill(ignore, 0)
            true_dist.scatter_(1, target_safe.unsqueeze(1), 1.0 - LSM)
        kl = torch.nn.functional.kl_div(
            torch.log_softmax(x, dim=1), true_dist, reduction="none"
        )
        return kl.masked_fill(ignore.unsqueeze(1), 0).sum() / bsz

    losses, gnorms = [], []
    update = 0
    for step in range(STEPS):
        opt.zero_grad()
        step_losses = []
        for a in range(ACCUM):
            speech, text = micro[step * ACCUM + a]
            mel = torch.from_numpy(torch_logmel(speech))  # (B, 80, F)
            enc = model.encoder(mel)

            # add_sos_eos (add_sos_eos.py:12): ys_in=[sot]+ys eos-padded,
            # ys_out=ys+[eot] ignore-padded
            tt = torch.from_numpy(text)
            valid = tt != -1
            ys_in = torch.cat(
                [torch.full((B, 1), sot), torch.where(valid, tt, eot)], dim=1
            )
            ys_out = torch.full((B, T_TEXT + 1), -1, dtype=torch.long)
            for i in range(B):
                n = int(valid[i].sum())
                ys_out[i, :n] = tt[i, :n]
                ys_out[i, n] = eot

            # decoder forward collecting self-attn maps
            # (whisper_decoder.py:89-170)
            x = (
                model.decoder.token_embedding(ys_in)
                + model.decoder.positional_embedding[: ys_in.shape[1]]
            )
            maps = []
            for block in model.decoder.blocks:
                x, att = block(x, enc, mask=model.decoder.mask)
                maps.append(att)
            x = model.decoder.ln(x)
            logits = x @ model.decoder.token_embedding.weight.T

            loss_att = lsm_loss(logits, ys_out)
            loss_cs = _torch_oracle_loss(
                torch.stack(maps), ys_in.numpy(), tok, head_mask, c=C_VAL
            )
            # reference mixing at cs_weight != 0 (espnet_model.py:694)
            loss = CS_WEIGHT * loss_cs + loss_att
            step_losses.append(float(loss))
            (loss / ACCUM).backward()  # trainer.py:628

        gnorms.append(
            float(torch.nn.utils.clip_grad_norm_(trainable, CLIP))
        )
        update += 1
        for g in opt.param_groups:
            g["lr"] = LR * warmup_factor(update)
        opt.step()
        losses.append(float(np.mean(step_losses)))
    return losses, gnorms


def test_training_trajectory_matches_reference():
    import torch

    tok = WhisperTokenizer()
    micro = _make_batches(tok)
    dims = _dims()
    rngm = np.random.RandomState(3)
    head_mask = (rngm.rand(dims["n_text_layer"], dims["n_text_head"]) > 0.5
                 ).astype(np.float32)

    # ---- identical init: snapshot weights BEFORE the torch side trains
    model = make_torch_model(adapter=True, n_vocab=VOCAB,
                             n_state=64, n_head=4)
    cfg = ASRModelConfig(
        whisper=WhisperConfig(**dims, adapter=True,
                              compute_dtype=jnp.float32),
        cs_weight=CS_WEIGHT,
        c_val_attention=C_VAL,
        lsm_weight=LSM,
        use_specaug=False,
        head_mask=tuple(tuple(float(v) for v in r) for r in head_mask),
    )
    params = params_from_state_dict(
        {k: v.detach().clone() for k, v in model.state_dict().items()},
        cfg.whisper,
    )

    # ---- torch side (mutates the model) -----------------------------
    ref_losses, ref_gnorms = _torch_trajectory(model, micro, tok, head_mask)
    tx, mask = build_tx(
        params,
        OptimConfig(lr=LR, warmup_steps=WARMUP, grad_clip=CLIP,
                    weight_decay=0.01, betas=(0.9, 0.99), eps=1e-6),
        freeze_preset="adapter",
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, tx, accum_grad=ACCUM,
                              trainable_mask=mask, donate=False)

    got_losses, got_gnorms = [], []
    for step in range(STEPS):
        speech = np.stack([micro[step * ACCUM + a][0] for a in range(ACCUM)])
        text = np.stack([micro[step * ACCUM + a][1] for a in range(ACCUM)])
        ys_in = np.concatenate(
            [np.full((ACCUM, B, 1), tok.special.sot),
             np.where(text == -1, tok.special.eot, text)], axis=2
        )
        labels = np.stack(
            [attention_target_labels(ys_in[a], tok) for a in range(ACCUM)]
        )
        batch = {
            "speech": jnp.asarray(speech),
            "speech_lengths": jnp.full((ACCUM, B), speech.shape[-1], jnp.int32),
            "text": jnp.asarray(text.astype(np.int32)),
            "cs_labels": jnp.asarray(labels),
        }
        state, stats = step_fn(state, batch)
        got_losses.append(float(stats["loss"]))
        got_gnorms.append(float(stats["grad_norm"]))

    rel = np.abs(np.array(got_losses) - np.array(ref_losses)) / np.array(
        ref_losses
    )
    print(f"ref losses : {[round(x, 6) for x in ref_losses]}")
    print(f"got losses : {[round(x, 6) for x in got_losses]}")
    print(f"rel drift  : {[f'{x:.2e}' for x in rel]}")
    print(f"ref gnorms : {[round(x, 6) for x in ref_gnorms]}")
    print(f"got gnorms : {[round(x, 6) for x in got_gnorms]}")

    np.testing.assert_allclose(got_losses, ref_losses, rtol=2e-4)
    np.testing.assert_allclose(got_gnorms, ref_gnorms, rtol=2e-3)
    # the trajectory must actually move (optimizer really stepping)
    assert abs(ref_losses[-1] - ref_losses[0]) > 1e-4


def test_training_trajectory_matches_reference_pe():
    """Same trajectory harness for the PE dual-QK variant: whisper_pe
    freeze preset ('cs' substring, abs_task.py:1165-1168 — the per-head
    gate stays frozen), post-softmax attention maps feeding the CS loss
    (MultiHeadAttentionPE returns w, model.py:156-179; the loss consumes
    p_cols here)."""
    tok = WhisperTokenizer()
    micro = _make_batches(tok)
    # reference PE gate is hardcoded to 12 heads (model.py:121)
    dims = dict(_dims(), n_audio_head=12, n_text_head=12,
                n_audio_state=96, n_text_state=96)
    rngm = np.random.RandomState(5)
    head_mask = (rngm.rand(dims["n_text_layer"], dims["n_text_head"]) > 0.5
                 ).astype(np.float32)

    model = make_torch_model(pe_whisper=True, n_vocab=VOCAB,
                             n_state=96, n_head=12)
    cfg = ASRModelConfig(
        whisper=WhisperConfig(**dims, pe_attention=True,
                              compute_dtype=jnp.float32),
        cs_weight=CS_WEIGHT,
        c_val_attention=C_VAL,
        lsm_weight=LSM,
        use_specaug=False,
        head_mask=tuple(tuple(float(v) for v in r) for r in head_mask),
    )
    params = params_from_state_dict(
        {k: v.detach().clone() for k, v in model.state_dict().items()},
        cfg.whisper,
    )
    ref_losses, ref_gnorms = _torch_trajectory(
        model, micro, tok, head_mask, freeze_substr="cs"
    )

    tx, mask = build_tx(
        params,
        OptimConfig(lr=LR, warmup_steps=WARMUP, grad_clip=CLIP,
                    weight_decay=0.01, betas=(0.9, 0.99), eps=1e-6),
        freeze_preset="whisper_pe",
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, tx, accum_grad=ACCUM,
                              trainable_mask=mask, donate=False)

    got_losses, got_gnorms = [], []
    for step in range(STEPS):
        speech = np.stack([micro[step * ACCUM + a][0] for a in range(ACCUM)])
        text = np.stack([micro[step * ACCUM + a][1] for a in range(ACCUM)])
        ys_in = np.concatenate(
            [np.full((ACCUM, B, 1), tok.special.sot),
             np.where(text == -1, tok.special.eot, text)], axis=2
        )
        labels = np.stack(
            [attention_target_labels(ys_in[a], tok) for a in range(ACCUM)]
        )
        batch = {
            "speech": jnp.asarray(speech),
            "speech_lengths": jnp.full((ACCUM, B), speech.shape[-1], jnp.int32),
            "text": jnp.asarray(text.astype(np.int32)),
            "cs_labels": jnp.asarray(labels),
        }
        state, stats = step_fn(state, batch)
        got_losses.append(float(stats["loss"]))
        got_gnorms.append(float(stats["grad_norm"]))

    rel = np.abs(np.array(got_losses) - np.array(ref_losses)) / np.array(
        ref_losses
    )
    print(f"PE ref losses : {[round(x, 6) for x in ref_losses]}")
    print(f"PE got losses : {[round(x, 6) for x in got_losses]}")
    print(f"PE rel drift  : {[f'{x:.2e}' for x in rel]}")
    np.testing.assert_allclose(got_losses, ref_losses, rtol=2e-4)
    np.testing.assert_allclose(got_gnorms, ref_gnorms, rtol=2e-3)
    assert abs(ref_losses[-1] - ref_losses[0]) > 1e-5


def _torch_side_forward(model, mel, tokens, side_layers):
    """Reference side-network TRAIN forward with grad (whisper_encoder.py
    :137-205 + whisper_decoder.py:117-165): returns (logits, trunk self-
    attn maps). The decoder side memory is recomputed from the FUSED
    encoder output, exactly like the reference (:129)."""
    import torch
    import torch.nn.functional as F

    enc, dec = model.encoder, model.decoder
    es, ds = model.encoder_sidenetwork, model.decoder_sidenetwork

    x = F.gelu(enc.conv1(mel))
    x = F.gelu(enc.conv2(x)).permute(0, 2, 1)
    x = (x + enc.positional_embedding[: x.size(1)]).to(x.dtype)
    xd = es.downsample_input(x)
    sb = 0
    for i in range(len(enc.blocks)):
        x, _ = enc.blocks[i](x)
        if i in side_layers:
            inter = es.downsample_intermediate_layers[sb](x)
            g = torch.sigmoid(es.sigmoid_gate_intermediate_layers[sb])
            xd = (1.0 - g) * inter + g * xd
            xd, _ = es.blocks[sb](xd)
            sb += 1
    x = enc.ln_post(x)
    xd = es.ln_post(es.upsample_output(xd))
    g = torch.sigmoid(es.sigmoid_gate_output)
    enc_out = (1.0 - g) * x + g * xd

    t = dec.token_embedding(tokens) + dec.positional_embedding[: tokens.size(1)]
    t = t.to(enc_out.dtype)
    td = ds.downsample_input(t)
    side_mem = ds.downsample_encoder_input(enc_out)
    maps = []
    sb = 0
    for i in range(len(dec.blocks)):
        t, att = dec.blocks[i](t, enc_out, mask=dec.mask)
        if i in side_layers:
            inter = ds.downsample_intermediate_layers[sb](t)
            g = torch.sigmoid(ds.sigmoid_gate_intermediate_layers[sb])
            td = (1.0 - g) * inter + g * td
            td, _ = ds.blocks[sb](td, side_mem, mask=ds.mask)
            sb += 1
        maps.append(att)
    dec.ln(t)  # trunk head computed then replaced (:160-163)
    t = ds.ln(ds.upsample_output(td))
    logits = (t @ dec.token_embedding.weight.T).float()
    return logits, torch.stack(maps)


def test_training_trajectory_matches_reference_side():
    """Trajectory parity for the third PET family: ladder side network
    ('sidenetwork' freeze preset — trunk frozen, side ladder trains),
    CS loss on the trunk attention maps."""
    import torch

    from reference_oracle import import_reference_whisper, tiny_dims
    from test_logmel import _torch_oracle as torch_logmel

    tok = WhisperTokenizer()
    micro = _make_batches(tok)
    dims = _dims()
    side_layers = [0, 1]
    rngm = np.random.RandomState(9)
    head_mask = (rngm.rand(dims["n_text_layer"], dims["n_text_head"]) > 0.5
                 ).astype(np.float32)

    wm = import_reference_whisper()
    torch.manual_seed(4)
    model = wm.Whisper(
        tiny_dims(wm, n_vocab=VOCAB, n_state=64, n_head=4),
        side_network=True,
        side_network_conf={"n_dim": 32, "n_head": 4, "layers": side_layers},
    ).eval()
    torch.nn.init.normal_(model.decoder.positional_embedding, 0.0, 0.02)

    from agacs_tpu.models.whisper import SideNetworkConfig

    cfg = ASRModelConfig(
        whisper=WhisperConfig(
            **dims, compute_dtype=jnp.float32,
            side_network=SideNetworkConfig(n_dim=32, n_head=4,
                                           layers=tuple(side_layers)),
        ),
        cs_weight=CS_WEIGHT,
        c_val_attention=C_VAL,
        lsm_weight=LSM,
        use_specaug=False,
        head_mask=tuple(tuple(float(v) for v in r) for r in head_mask),
    )
    params = params_from_state_dict(
        {k: v.detach().clone() for k, v in model.state_dict().items()},
        cfg.whisper,
    )

    # ---- torch trajectory with the side forward ---------------------
    from test_cs_loss import _torch_oracle_loss

    sot, eot = tok.special.sot, tok.special.eot
    for name, p in model.named_parameters():
        p.requires_grad = "sidenetwork" in name  # 'sidenetwork' preset
    trainable = [p for p in model.parameters() if p.requires_grad]
    opt = torch.optim.AdamW(trainable, lr=LR, weight_decay=0.01,
                            betas=(0.9, 0.99), eps=1e-6)

    def warmup_factor(k):
        return WARMUP**0.5 * min(k**-0.5, k * WARMUP**-1.5)

    def lsm_loss(x, target):
        v = x.size(2)
        bsz = x.size(0)
        x = x.reshape(-1, v)
        target = target.reshape(-1)
        with torch.no_grad():
            true_dist = torch.full_like(x, LSM / (v - 1))
            ignore = target == -1
            ts = target.masked_fill(ignore, 0)
            true_dist.scatter_(1, ts.unsqueeze(1), 1.0 - LSM)
        kl = torch.nn.functional.kl_div(
            torch.log_softmax(x, dim=1), true_dist, reduction="none"
        )
        return kl.masked_fill(ignore.unsqueeze(1), 0).sum() / bsz

    ref_losses, ref_gnorms = [], []
    update = 0
    for step in range(STEPS):
        opt.zero_grad()
        step_losses = []
        for a in range(ACCUM):
            speech, text = micro[step * ACCUM + a]
            mel = torch.from_numpy(torch_logmel(speech))
            tt = torch.from_numpy(text)
            valid = tt != -1
            ys_in = torch.cat(
                [torch.full((B, 1), sot), torch.where(valid, tt, eot)], dim=1
            )
            ys_out = torch.full((B, T_TEXT + 1), -1, dtype=torch.long)
            for i in range(B):
                n = int(valid[i].sum())
                ys_out[i, :n] = tt[i, :n]
                ys_out[i, n] = eot
            logits, maps = _torch_side_forward(model, mel, ys_in, side_layers)
            loss = CS_WEIGHT * _torch_oracle_loss(
                maps, ys_in.numpy(), tok, head_mask, c=C_VAL
            ) + lsm_loss(logits, ys_out)
            step_losses.append(float(loss))
            (loss / ACCUM).backward()
        ref_gnorms.append(float(torch.nn.utils.clip_grad_norm_(trainable, CLIP)))
        update += 1
        for g in opt.param_groups:
            g["lr"] = LR * warmup_factor(update)
        opt.step()
        ref_losses.append(float(np.mean(step_losses)))

    # ---- agacs_tpu trajectory ---------------------------------------
    tx, mask = build_tx(
        params,
        OptimConfig(lr=LR, warmup_steps=WARMUP, grad_clip=CLIP,
                    weight_decay=0.01, betas=(0.9, 0.99), eps=1e-6),
        freeze_preset="sidenetwork",
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, tx, accum_grad=ACCUM,
                              trainable_mask=mask, donate=False)
    got_losses, got_gnorms = [], []
    for step in range(STEPS):
        speech = np.stack([micro[step * ACCUM + a][0] for a in range(ACCUM)])
        text = np.stack([micro[step * ACCUM + a][1] for a in range(ACCUM)])
        ys_in = np.concatenate(
            [np.full((ACCUM, B, 1), sot), np.where(text == -1, eot, text)],
            axis=2,
        )
        labels = np.stack(
            [attention_target_labels(ys_in[a], tok) for a in range(ACCUM)]
        )
        batch = {
            "speech": jnp.asarray(speech),
            "speech_lengths": jnp.full((ACCUM, B), speech.shape[-1], jnp.int32),
            "text": jnp.asarray(text.astype(np.int32)),
            "cs_labels": jnp.asarray(labels),
        }
        state, stats = step_fn(state, batch)
        got_losses.append(float(stats["loss"]))
        got_gnorms.append(float(stats["grad_norm"]))

    rel = np.abs(np.array(got_losses) - np.array(ref_losses)) / np.array(
        ref_losses
    )
    print(f"SIDE ref losses : {[round(x, 6) for x in ref_losses]}")
    print(f"SIDE got losses : {[round(x, 6) for x in got_losses]}")
    print(f"SIDE rel drift  : {[f'{x:.2e}' for x in rel]}")
    np.testing.assert_allclose(got_losses, ref_losses, rtol=2e-4)
    np.testing.assert_allclose(got_gnorms, ref_gnorms, rtol=2e-3)
    assert abs(ref_losses[-1] - ref_losses[0]) > 1e-5
