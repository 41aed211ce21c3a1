"""Measure the reference implementation's training-step throughput on CPU.

Builds the reference's modified Whisper-small (random init — identical
compute graph to pretrained), runs its actual training computation the way
`espnet_model.py` drives it: log-mel (torch.stft recipe) -> encoder ->
decoder blocks collecting all 12 self-attention maps -> label-smoothed CE
+ CS-style MSE on the map columns -> backward. Reports audio-sec/s.

Writes the number used as TORCH_CPU_BASELINE_AUDIO_SEC_PER_S in bench.py.
"""

import sys
import time
import types

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, "/root/reference/espnet/whisper")
if "numba" not in sys.modules:
    fake = types.ModuleType("numba")
    fake.jit = lambda *a, **k: (lambda f: f)
    sys.modules["numba"] = fake
import whisper.model as wm  # noqa: E402

BATCH = 8
SECONDS = 15
STEPS = 3


def main():
    torch.manual_seed(0)
    dims = wm.ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=768, n_audio_head=12,
        n_audio_layer=12, n_vocab=51865, n_text_ctx=448, n_text_state=768,
        n_text_head=12, n_text_layer=12,
    )
    model = wm.Whisper(dims, adapter=True)
    torch.nn.init.normal_(model.decoder.positional_embedding, 0.0, 0.02)
    model.train()

    # adapter-only fine-tuning, like run_whisper1ststage/2ndstage
    for name, p in model.named_parameters():
        p.requires_grad = "adapter" in name
    opt = torch.optim.AdamW(
        [p for p in model.parameters() if p.requires_grad], lr=1e-3
    )

    rng = np.random.RandomState(0)
    s = SECONDS * 16000
    audio = torch.from_numpy((rng.randn(BATCH, s) * 0.05).astype(np.float32))
    tokens = torch.from_numpy(rng.randint(100, 50000, (BATCH, 32)))
    window = torch.hann_window(400)

    def one_step():
        # frontend (whisper_encoder.py:105-135)
        stft = torch.stft(audio, 400, 160, window=window, return_complex=True)
        mag = stft[..., :-1].abs() ** 2
        filters = torch.rand(80, 201)  # stand-in mel filters, same matmul cost
        mel = filters @ mag
        log_spec = torch.clamp(mel, min=1e-10).log10()
        log_spec = torch.maximum(
            log_spec, log_spec.view(BATCH, -1).max(dim=-1)[0][:, None, None] - 8.0
        )
        feats = (log_spec + 4.0) / 4.0

        # encoder
        x = F.gelu(model.encoder.conv1(feats))
        x = F.gelu(model.encoder.conv2(x)).permute(0, 2, 1)
        x = x + model.encoder.positional_embedding[: x.shape[1]]
        for block in model.encoder.blocks:
            x, _ = block(x)
        enc = model.encoder.ln_post(x)

        # decoder with attention-map collection (whisper_decoder.py:150-158)
        y = model.decoder.token_embedding(tokens) + model.decoder.positional_embedding[:32]
        maps = []
        for block in model.decoder.blocks:
            y, att = block(y, enc, mask=model.decoder.mask)
            maps.append(att)
        y = model.decoder.ln(y)
        logits = y @ model.decoder.token_embedding.weight.T
        att_map = torch.stack(maps)

        loss_att = F.cross_entropy(
            logits.reshape(-1, 51865), tokens.reshape(-1), label_smoothing=0.1
        )
        cols = att_map[..., 1:3]
        cols = torch.where(torch.isfinite(cols), cols, torch.zeros(()))
        loss_cs = ((cols - 0.6) ** 2).mean()
        loss = loss_att + 0.01 * loss_cs

        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(STEPS):
        one_step()
    dt = time.perf_counter() - t0
    print(
        f"torch CPU reference: {STEPS} steps in {dt:.1f}s -> "
        f"{STEPS * BATCH * SECONDS / dt:.2f} audio_sec/s"
    )


if __name__ == "__main__":
    main()
