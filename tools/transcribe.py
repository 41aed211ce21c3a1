"""Single-file transcription — the `code_util/whisper_check.py` /
`espnet/inference.py` equivalent: config + checkpoint + one audio file →
text on stdout.

  PYTHONPATH=. python tools/transcribe.py exp/x/config.yaml \
      exp/x/valid.acc.ave.params.npz utterance.wav [--beam_size 1]
"""

import argparse

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("params")
    ap.add_argument("wav")
    ap.add_argument("--beam_size", type=int, default=1)
    ap.add_argument("--max_steps", type=int, default=200)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--long_form", action="store_true",
                    help="stock-whisper 30 s windowed transcription with "
                         "timestamps + language detection "
                         "(decode/transcribe.py) instead of the ESPnet "
                         "prompt path")
    ap.add_argument("--language", default=None,
                    help="long-form: language code (default: detect)")
    ap.add_argument("--initial_prompt", default=None,
                    help="long-form: text for the <|startofprev|> window "
                         "of the first decode (stock transcribe.py:46)")
    ap.add_argument("--no_condition_on_previous_text", action="store_true",
                    help="long-form: do not feed decoded text back as the "
                         "next window's prompt context")
    ap.add_argument("--cross_kv_int8", action="store_true",
                    help="int8 precomputed cross-KV (kernel path only)")
    args = ap.parse_args()

    from agacs_tpu.data.io import read_wav
    from agacs_tpu.decode.speech2text import Speech2Text
    from agacs_tpu.train.checkpoint import load_pytree_like
    from agacs_tpu.utils.config import load_yaml, task_from_dict
    from agacs_tpu.utils.runtime import setup

    setup()
    task = task_from_dict(
        load_yaml(args.config), compute_dtype=getattr(jnp, args.compute_dtype)
    )
    assert task.kind == "whisper", "use bin/decode for the conformer family"
    if args.cross_kv_int8:
        import dataclasses

        task = dataclasses.replace(
            task,
            cfg=dataclasses.replace(
                task.cfg,
                whisper=dataclasses.replace(
                    task.cfg.whisper, cross_kv_int8=True
                ),
            ),
        )
    params = load_pytree_like(
        args.params, task.init_fn(jax.random.PRNGKey(0), task.cfg)
    )
    s2t = Speech2Text(
        params, task.cfg, beam_size=args.beam_size, max_steps=args.max_steps
    )
    audio, sr = read_wav(args.wav)
    assert sr == 16000
    if args.long_form:
        from agacs_tpu.decode.transcribe import transcribe

        out = transcribe(
            params, task.cfg.whisper, audio,
            language=args.language,
            initial_prompt=args.initial_prompt,
            condition_on_previous_text=not args.no_condition_on_previous_text,
            beam_size=args.beam_size,
        )
        for seg in out["segments"]:
            print(f"[{seg.start:7.2f} -> {seg.end:7.2f}] {seg.text}")
        print(f"# language: {out['language']}")
        return
    result = s2t(audio)[0]
    print(result.text)
    print(f"# 1/RTF: {s2t.inverse_rtf:.1f}x realtime (incl compile)")


if __name__ == "__main__":
    main()
