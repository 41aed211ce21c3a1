"""Decoding CLI — the `espnet2.bin.asr_inference` / recipe stage-12
equivalent: data dir -> hyp.trn + ref.trn + RTF report.

  python -m agacs_tpu.bin.decode --config exp/x/config.yaml \
      --params exp/x/valid.acc.ave.params.npz \
      --data_dir data/dev --output_dir exp/x/decode_dev \
      [--beam_size 1] [--max_steps 200] [--batch_size 8] \
      [--ctc_weight 0.3] [--lm_exp exp/lm]        # conformer family

Whisper family: greedy/beam with the dual-language hyp primer
(asr_inference.py:319-331). Conformer family: joint CTC/attention beam
with optional LM shallow fusion (beam_search.py score composition).
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

import jax
import jax.numpy as jnp

from agacs_tpu.data import ASRDataset
from agacs_tpu.data.sampler import bucket_length
from agacs_tpu.decode.speech2text import Speech2Text
from agacs_tpu.eval.scoring import write_trn
from agacs_tpu.train.checkpoint import load_pytree_like
from agacs_tpu.utils.config import load_yaml, task_from_dict


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--decode_config", default=None,
                   help="decode-option YAML (the reference's "
                        "decode_asr_whisper.yaml / decode_asr.yaml: "
                        "beam_size, ctc_weight, lm_weight, penalty, "
                        "maxlenratio); CLI flags override it")
    p.add_argument("--params", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--beam_size", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=200,
                   help="generated-token cap; 0 = derive from maxlenratio "
                        "(0.0 -> encoder frame count, beam_search.py:365)")
    p.add_argument("--maxlenratio", type=float, default=0.0)
    p.add_argument("--decode_loop", default="scan",
                   choices=["scan", "while"],
                   help="AR loop form: scan (fixed trip count — the fast "
                        "TPU form, XLA pipelines the per-step matmuls) or "
                        "while (early exit; only wins when the step cap "
                        "is far above real hypothesis lengths)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--length_bonus", type=float, default=0.0)
    p.add_argument("--ctc_weight", type=float, default=0.3,
                   help="CTC weight in the joint beam (conformer family)")
    p.add_argument("--lm_exp", default=None,
                   help="LM experiment dir for shallow fusion (conformer)")
    p.add_argument("--lm_weight", type=float, default=0.3)
    p.add_argument("--ngram_file", default=None,
                   help="ngram npz from bin/ngram_train (whisper family)")
    p.add_argument("--ngram_weight", type=float, default=0.3)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--cross_kv_int8", action="store_true",
                   help="store precomputed cross-attention K/V int8 "
                   "(halves the dominant HBM term of AR decode; whisper "
                   "kernel path only)")
    p.add_argument("--transducer_search", default="default",
                   choices=("default", "tsd", "alsd", "nsc", "maes"),
                   help="beam>1 transducer search: 'default' = the "
                        "reference's default_beam_search (per-utterance, "
                        "host-side, supports --lm_exp fusion), 'tsd' / "
                        "'alsd' = batched jitted time-sync / "
                        "align-length-sync beams (decode/transducer_tsd.py), "
                        "'nsc' / 'maes' = N-step-constrained / modified "
                        "adaptive expansion (host-side, "
                        "decode/transducer_nsc.py)")
    p.add_argument("--transducer_u_max", type=int, default=50,
                   help="ALSD label-length cap (BeamSearchTransducer "
                        "u_max); raise for utterances with long "
                        "transcripts")
    return p


def _apply_decode_config(args, path: str, raw_argv: list[str]) -> None:
    """Apply a decode-option YAML (decode_asr_whisper.yaml schema) as
    argparse defaults; explicitly-given CLI flags win. A config bearing
    maxlenratio means "derive maxlen from frames" (max_steps 0) unless
    --max_steps was given."""
    dc = load_yaml(path)
    key_map = {"penalty": "length_bonus"}
    given = {a.split("=")[0].lstrip("-").replace("-", "_")
             for a in raw_argv if a.startswith("--")}
    for k, v in dc.items():
        dest = key_map.get(k, k)
        if hasattr(args, dest) and dest not in given:
            cur = getattr(args, dest)
            setattr(args, dest, type(cur)(v) if cur is not None else v)
    if "maxlenratio" in dc and "max_steps" not in given:
        args.max_steps = 0


def _load_lm(args):
    """(lm_params, lm_cfg) from --lm_exp/--lm_weight, or (None, None).
    Shared by all three decode families."""
    if not (args.lm_exp and args.lm_weight > 0.0):
        return None, None
    from agacs_tpu.models.lm import init_lm_params

    lm_cfg = _load_lm_config(args.lm_exp)
    lm_params = load_pytree_like(
        os.path.join(args.lm_exp, "valid.loss.ave.params.npz"),
        init_lm_params(jax.random.PRNGKey(0), lm_cfg),
    )
    return lm_params, lm_cfg


def _load_lm_config(lm_exp: str):
    """Rebuild the LM config from the LM experiment's own config.yaml
    (written by bin/lm_train) — hardcoded defaults would silently mis-load
    any non-default LM."""
    from agacs_tpu.models.lm import TransformerLMConfig

    path = os.path.join(lm_exp, "config.yaml")
    if not os.path.exists(path):
        logging.warning("%s missing; assuming default LM architecture", path)
        return TransformerLMConfig(compute_dtype=jnp.float32)
    conf = load_yaml(path).get("lm_conf", {})
    return TransformerLMConfig(compute_dtype=jnp.float32, **conf)


def _chunked_decode(args, ds, decode_chunk):
    """Shared batched-decode driver: length-sorted chunks, 1-second
    bucketed padding (closed jit shape set), in-process RTF accounting.
    `decode_chunk(audio, lens) -> list[token ids]` does the model work."""
    import time

    hyps, refs = {}, {}
    chunk_secs: list[tuple[float, float]] = []  # (decode_s, audio_s)
    utts = sorted(ds.utt_ids, key=ds.num_samples)
    for i in range(0, len(utts), args.batch_size):
        chunk = utts[i : i + args.batch_size]
        items = [ds[u] for u in chunk]
        s_max = bucket_length(max(len(it["speech"]) for it in items))
        audio = np.zeros((len(items), s_max), np.float32)
        lens = np.zeros((len(items),), np.int32)
        for k_i, it in enumerate(items):
            audio[k_i, : len(it["speech"])] = it["speech"]
            lens[k_i] = len(it["speech"])
        t0 = time.perf_counter()
        rows = decode_chunk(jnp.asarray(audio), jnp.asarray(lens))
        chunk_secs.append(
            (time.perf_counter() - t0, float(lens.sum()) / 16000.0)
        )
        for u, ids in zip(chunk, rows):
            hyps[u] = ds.tokenizer.decode(ids)
            refs[u] = ds.text[u]
        logging.info("decoded %d/%d", min(i + args.batch_size, len(utts)), len(utts))
    decode_sec = sum(d for d, _ in chunk_secs)
    audio_sec = sum(a for _, a in chunk_secs)
    rtf = decode_sec / max(audio_sec, 1e-9)
    report = {"rtf": rtf, "inverse_rtf": 1.0 / max(rtf, 1e-9),
              "audio_seconds": audio_sec, "decode_seconds": decode_sec,
              "n_utts": len(utts)}
    if len(chunk_secs) > 1:
        # steady-state RTF: the first chunk pays jit compilation (the
        # reference's log-scraped RTF amortizes it over thousands of
        # utterances; on small sets report both)
        warm_d = sum(d for d, _ in chunk_secs[1:])
        warm_a = sum(a for _, a in chunk_secs[1:])
        report["rtf_warm"] = warm_d / max(warm_a, 1e-9)
        report["inverse_rtf_warm"] = 1.0 / max(report["rtf_warm"], 1e-9)
    return hyps, refs, report


def _decode_conformer(args, task, params, ds):
    from agacs_tpu.decode.joint_beam import joint_beam_decode
    from agacs_tpu.models import conformer_asr

    cfg = task.cfg
    lm_params, lm_cfg = _load_lm(args)

    enc_fn = jax.jit(lambda p, s, l: conformer_asr.encode(p, cfg, s, l))

    def decode_chunk(audio, lens):
        enc, enc_lens = enc_fn(params, audio, lens)
        ctc_logp = None
        if args.ctc_weight > 0 and "ctc" in params:
            logits = (
                jnp.dot(enc, params["ctc"]["w"].astype(enc.dtype))
                + params["ctc"]["b"].astype(enc.dtype)
            ).astype(jnp.float32)
            ctc_logp = jax.nn.log_softmax(logits, -1)
        # maxlenratio==0 semantics: maxlen = encoder frames
        # (beam_search.py:365-371); max_steps>0 is an explicit cap
        max_steps = (
            args.max_steps if args.max_steps > 0 else int(enc.shape[1])
        )
        tokens, lens_out, _ = joint_beam_decode(
            params["decoder"], cfg.decoder, enc, enc_lens,
            ctc_logp=ctc_logp, ctc_frame_lens=enc_lens,
            lm_params=lm_params, lm_cfg=lm_cfg,
            beam_size=args.beam_size, pre_beam=max(2 * args.beam_size, 4),
            max_steps=max_steps, sos=cfg.sos, eos=cfg.eos,
            ctc_weight=args.ctc_weight if ctc_logp is not None else 0.0,
            lm_weight=args.lm_weight if lm_params is not None else 0.0,
            length_bonus=args.length_bonus,
            loop=args.decode_loop,
        )
        tokens, lens_out = np.asarray(tokens), np.asarray(lens_out)
        return [
            [t for t in row[1:n].tolist() if t not in (cfg.sos, cfg.eos)]
            for row, n in zip(tokens, lens_out)
        ]

    return _chunked_decode(args, ds, decode_chunk)


def _decode_transducer(args, task, params, ds):
    """Transducer family: batched jitted greedy (beam_size 1) or the
    reference's default_beam_search per utterance (asr_inference.py:177-185
    BeamSearchTransducer)."""
    from agacs_tpu.models import transducer_asr
    from agacs_tpu.models.transducer import (
        default_beam_search,
        greedy_search_scan,
    )

    cfg = task.cfg
    if args.lm_exp and args.beam_size <= 1:
        logging.warning(
            "--lm_exp has no effect with greedy decoding (beam_size<=1); "
            "LM fusion requires --beam_size > 1 with "
            "--transducer_search default",
        )
        lm_params = lm_cfg = None
    elif args.transducer_search != "default" and args.beam_size > 1 \
            and args.lm_exp:
        logging.warning(
            "--lm_exp is not supported by the %s search; LM fusion "
            "is available with --transducer_search default",
            args.transducer_search,
        )
        lm_params = lm_cfg = None
    else:
        lm_params, lm_cfg = _load_lm(args)
    enc_fn = jax.jit(lambda p, s, l: transducer_asr.encode(p, cfg, s, l))
    greedy_fn = jax.jit(
        lambda p, e, el: greedy_search_scan(p, cfg.decoder, e, el)
    )
    blank = cfg.decoder.blank_id

    def decode_chunk(audio, lens):
        enc, enc_lens = enc_fn(params, audio, lens)
        if args.beam_size <= 1:
            tokens, n_emit = greedy_fn(params["transducer"], enc, enc_lens)
            tokens, n_emit = np.asarray(tokens), np.asarray(n_emit)
            return [
                [t for t in tokens[k, : n_emit[k]].tolist() if t != blank]
                for k in range(tokens.shape[0])
            ]
        if args.transducer_search in ("tsd", "alsd"):
            from agacs_tpu.decode.transducer_tsd import (
                alsd_beam_search,
                tsd_beam_search,
            )

            if args.transducer_search == "tsd":
                tokens, n, _ = tsd_beam_search(
                    params["transducer"], cfg.decoder, enc, enc_lens,
                    beam=args.beam_size,
                )
            else:
                tokens, n, _ = alsd_beam_search(
                    params["transducer"], cfg.decoder, enc, enc_lens,
                    beam=args.beam_size, u_max=args.transducer_u_max,
                )
            tokens, n = np.asarray(tokens), np.asarray(n)
            return [
                [t for t in tokens[k, 0, : n[k, 0]].tolist() if t != blank]
                for k in range(tokens.shape[0])
            ]
        enc_np = np.asarray(enc)
        rows = []
        for k in range(enc_np.shape[0]):
            e = enc_np[k, : int(enc_lens[k])]
            if args.transducer_search == "nsc":
                from agacs_tpu.decode.transducer_nsc import nsc_beam_search

                nbest = nsc_beam_search(
                    params["transducer"], cfg.decoder, e,
                    beam_size=args.beam_size,
                )
            elif args.transducer_search == "maes":
                from agacs_tpu.decode.transducer_nsc import maes_beam_search

                nbest = maes_beam_search(
                    params["transducer"], cfg.decoder, e,
                    beam_size=args.beam_size,
                )
            else:
                nbest = default_beam_search(
                    params["transducer"], cfg.decoder, e,
                    beam_size=args.beam_size,
                    lm_params=lm_params, lm_cfg=lm_cfg,
                    lm_weight=args.lm_weight if lm_params is not None else 0.0,
                    lm_sos=lm_cfg.sos if lm_cfg is not None else 50258,
                )
            rows.append(nbest[0][1])
        return rows

    return _chunked_decode(args, ds, decode_chunk)


def _decode_whisper(args, task, params, ds):
    cfg = task.cfg
    if args.cross_kv_int8:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, whisper=dataclasses.replace(cfg.whisper, cross_kv_int8=True)
        )
    lm_params, lm_cfg = _load_lm(args)
    ngram_lm = None
    if args.ngram_file:
        from agacs_tpu.models.ngram import load_ngram

        ngram_lm = load_ngram(args.ngram_file)
    s2t = Speech2Text(
        params, cfg, beam_size=args.beam_size,
        max_steps=args.max_steps if args.max_steps > 0 else None,
        maxlenratio=args.maxlenratio,
        length_bonus=args.length_bonus,
        ctc_weight=args.ctc_weight if "ctc" in params else 0.0,
        lm_params=lm_params, lm_cfg=lm_cfg, lm_weight=args.lm_weight,
        ngram_lm=ngram_lm,
        ngram_weight=args.ngram_weight if ngram_lm is not None else 0.0,
        loop=args.decode_loop,
    )
    hyps, refs = {}, {}
    utts = sorted(ds.utt_ids, key=ds.num_samples)
    for i in range(0, len(utts), args.batch_size):
        chunk = utts[i : i + args.batch_size]
        items = [ds[u] for u in chunk]
        s_max = bucket_length(max(len(it["speech"]) for it in items))
        audio = np.zeros((len(items), s_max), np.float32)
        lens = np.zeros((len(items),), np.int32)
        for k, it in enumerate(items):
            audio[k, : len(it["speech"])] = it["speech"]
            lens[k] = len(it["speech"])
        results = s2t(audio, lengths=lens)
        for u, r in zip(chunk, results):
            hyps[u] = r.text
            refs[u] = ds.text[u]
        logging.info("decoded %d/%d (running 1/RTF=%.1fx)",
                     min(i + args.batch_size, len(utts)), len(utts),
                     s2t.inverse_rtf)
    rtf_report = {
        "rtf": s2t.rtf, "inverse_rtf": s2t.inverse_rtf,
        "audio_seconds": s2t._audio_seconds,
        "decode_seconds": s2t._decode_seconds, "n_utts": len(utts),
    }
    return hyps, refs, rtf_report


def main(argv: list[str] | None = None) -> dict:
    from agacs_tpu.utils.runtime import setup as _runtime_setup

    _runtime_setup()
    parser = build_argparser()
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    if args.decode_config:
        _apply_decode_config(
            args, args.decode_config,
            argv if argv is not None else os.sys.argv[1:],
        )

    cfg_dict = load_yaml(args.config)
    task = task_from_dict(
        cfg_dict, compute_dtype=getattr(jnp, args.compute_dtype)
    )
    params = task.init_fn(jax.random.PRNGKey(0), task.cfg)
    if cfg_dict.get("freeze_quant") == "int8" and cfg_dict.get("freeze_param"):
        # int8-trained checkpoints store the frozen trunk as {w_q, w_s}
        # (trainer.quantize_frozen_linears) — mirror that structure in the
        # template so names/dtypes line up; decode then runs the trunk on
        # the MXU int8 path too.
        from agacs_tpu.train.freeze import trainable_mask
        from agacs_tpu.train.trainer import quantize_frozen_linears

        params = quantize_frozen_linears(
            params, trainable_mask(params, cfg_dict["freeze_param"])
        )
    params = load_pytree_like(args.params, params)

    ds = ASRDataset(args.data_dir, with_cs_labels=False)
    if task.kind == "whisper":
        hyps, refs, rtf_report = _decode_whisper(args, task, params, ds)
    elif task.kind == "transducer":
        hyps, refs, rtf_report = _decode_transducer(args, task, params, ds)
    else:
        hyps, refs, rtf_report = _decode_conformer(args, task, params, ds)

    os.makedirs(args.output_dir, exist_ok=True)
    write_trn(os.path.join(args.output_dir, "hyp.trn"), hyps)
    write_trn(os.path.join(args.output_dir, "ref.trn"), refs)
    with open(os.path.join(args.output_dir, "rtf.json"), "w") as f:
        json.dump(rtf_report, f, indent=1)
    logging.info("RTF=%.4f (decode %.1fs / audio %.1fs)",
                 rtf_report["rtf"], rtf_report["decode_seconds"],
                 rtf_report["audio_seconds"])
    return {"hyps": hyps, "refs": refs, "rtf": rtf_report}


if __name__ == "__main__":
    main()
