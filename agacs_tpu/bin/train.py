"""Training CLI — the `espnet2.bin.asr_train` equivalent.

  python -m agacs_tpu.bin.train \
      --config conf/train_whisper_adapter_csloss.yaml \
      --train_dir data/train --valid_dir data/valid \
      --exp_dir exp/whisper_2nd [--override model_conf.cs_weight=0.02 ...] \
      [--freeze_param adapter] [--init_param exp/stage1/valid.acc.ave.params.npz] \
      [--resume]

Single-process, all local devices via the mesh (the JAX runtime owns
multi-host coordination; no launcher layer like espnet2/bin/launch.py is
needed on TPU).
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from agacs_tpu.data import ASRDataset, collate_batch, num_elements_batches
from agacs_tpu.data.sampler import bucket_length
from agacs_tpu.models.checkpoint import load_torch_whisper
from agacs_tpu.parallel import make_mesh, shard_batch, shard_params
from agacs_tpu.parallel.mesh import local_batch_rows
from agacs_tpu.train.checkpoint import CheckpointManager, load_pytree_like
from agacs_tpu.train.freeze import count_trainable
from agacs_tpu.train.reporter import Reporter
from agacs_tpu.train.trainer import (
    build_tx,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from agacs_tpu.utils.config import (
    apply_overrides,
    dump_resolved,
    load_yaml,
    optim_config_from_dict,
    task_from_dict,
    trainer_config_from_dict,
)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--train_dir", required=True)
    p.add_argument("--valid_dir", required=True)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--override", nargs="*", default=[])
    p.add_argument("--freeze_param", default=None)
    p.add_argument("--init_param", default=None,
                   help=".params.npz checkpoint or OpenAI .pt file")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--batch_bins", type=int, default=None)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--tensor_parallel", type=int, default=1)
    p.add_argument("--optim_state_shard", action="store_true",
                   help="ZeRO-1 equivalent: shard Adam moments over the "
                        "data axis (reference fairscale OSS option, "
                        "trainer.py:193-199); for full-FT configs")
    p.add_argument("--batch_type", default=None,
                   choices=["numel", "fixed_shapes"],
                   help="overrides the config batch_type. numel = "
                        "reference NumElementsBatchSampler packing (with "
                        "a B grid); fixed_shapes = geometric-bucket "
                        "packing with a CLOSED (B,S) shape set (~13 "
                        "train-step compiles per run instead of ~100, "
                        "tools/shape_census.py)")
    p.add_argument("--print_config", action="store_true",
                   help="dump the resolved config (abs_task.py:1019-1024) "
                        "and exit")
    p.add_argument("--detect_anomaly", action="store_true",
                   help="jax_debug_nans: fail fast on the op producing a "
                        "NaN (the reference's torch detect_anomaly, "
                        "abs_task.py:1140-1142)")
    p.add_argument("--ckpt_backend", default="npz", choices=["npz", "orbax"],
                   help="orbax: sharded multi-host-safe checkpoint dirs")
    p.add_argument("--num_att_plot", type=int, default=3,
                   help="attention-map PNGs per eval epoch "
                        "(trainer.py:802+ --num_att_plot; 0 disables)")
    return p


def load_init_params(spec: str, params, cfg):
    """--init_param with --ignore_init_mismatch semantics
    (abs_task.py:1317-1325): missing/mismatched leaves keep their init.

    Supports the reference's mapping syntax
    `path[:src_prefix[:dst_prefix[:exclude1,exclude2]]]`
    (espnet2 load_pretrained_model): npz keys under src_prefix load into
    dst_prefix, exclude prefixes are skipped."""
    parts = spec.split(":")
    path = parts[0]
    src = parts[1] if len(parts) > 1 else ""
    dst = parts[2] if len(parts) > 2 else ""
    exclude = tuple(p for p in (parts[3].split(",") if len(parts) > 3 else ())
                    if p)
    if path.endswith(".pt") or path.endswith(".pth"):
        loaded, _ = load_torch_whisper(path, cfg.whisper)
        return loaded

    import numpy as np

    import jax

    data = dict(np.load(path).items())
    if src or dst:
        src_p = src + "/" if src else ""
        dst_p = dst + "/" if dst else ""
        remapped = {}
        for k, v in data.items():
            if src_p and not (k == src or k.startswith(src_p)):
                continue
            nk = dst_p + k[len(src_p):] if src_p else dst_p + k
            remapped[nk] = v
        data = remapped
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def name(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    out = []
    n_loaded = 0
    for kp, tmpl in flat:
        k = name(kp)
        skip = any(k == e or k.startswith(e + "/") for e in exclude)
        arr = data.get(k) if not skip else None
        if arr is not None and arr.dtype.kind == "V" and arr.dtype.itemsize == 2:
            # legacy raw-saved bf16 leaf (see checkpoint.load_pytree_like)
            import ml_dtypes

            arr = arr.view(ml_dtypes.bfloat16)
        if arr is not None and k.endswith("token_emb") \
                and arr.shape[1:] == tmpl.shape[1:] \
                and arr.shape[0] != tmpl.shape[0]:
            # tp-padded vocab rows (parallel/mesh.pad_vocab_rows): adapt a
            # padded checkpoint to an unpadded init or vice versa, instead
            # of silently dropping the largest parameter via the
            # ignore-mismatch fallback
            if arr.shape[0] > tmpl.shape[0]:
                arr = arr[: tmpl.shape[0]]
            else:
                arr = np.pad(
                    arr, [(0, tmpl.shape[0] - arr.shape[0])]
                    + [(0, 0)] * (arr.ndim - 1)
                )
        if arr is not None and arr.shape == tmpl.shape:
            out.append(jax.numpy.asarray(arr, dtype=tmpl.dtype))
            n_loaded += 1
        else:
            out.append(tmpl)
    logging.info("init_param: loaded %d/%d leaves from %s", n_loaded,
                 len(flat), path)
    return jax.tree_util.tree_unflatten(treedef, out)


def main(argv: list[str] | None = None) -> dict:
    from agacs_tpu.utils.runtime import setup as _runtime_setup

    _runtime_setup()
    args = build_argparser().parse_args(argv)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )

    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)
    raw = apply_overrides(load_yaml(args.config), args.override)
    if args.print_config:
        import dataclasses as _dc

        import yaml as _yaml

        task = task_from_dict(raw, compute_dtype=getattr(jnp, args.compute_dtype))

        def clean(x):
            if isinstance(x, dict):
                return {k: clean(v) for k, v in x.items()}
            if isinstance(x, (list, tuple)):
                return [clean(v) for v in x]
            if isinstance(x, (str, int, float, bool)) or x is None:
                return x
            return str(x)

        resolved = dict(raw)
        resolved["_resolved_model_config"] = clean(
            _dc.asdict(_dc.replace(task.cfg))
            if _dc.is_dataclass(task.cfg) else str(task.cfg)
        )
        print(_yaml.safe_dump(resolved, allow_unicode=True,
                              default_flow_style=False, sort_keys=False))
        return {"printed": True}
    dtype = getattr(jnp, args.compute_dtype)
    task = task_from_dict(raw, compute_dtype=dtype)
    cfg = task.cfg
    optim_cfg = optim_config_from_dict(raw)
    tcfg = trainer_config_from_dict(raw)
    if args.max_epoch is not None:
        import dataclasses

        tcfg = dataclasses.replace(tcfg, max_epoch=args.max_epoch)
    if args.batch_bins is not None:
        import dataclasses

        tcfg = dataclasses.replace(tcfg, batch_bins=args.batch_bins)
    freeze = args.freeze_param or tcfg.freeze_param
    if freeze:
        # record the RESOLVED freeze in the dumped config: decode rebuilds
        # the int8 param template from config.yaml's freeze_param +
        # freeze_quant (bin/decode.py), which a CLI-only --freeze_param
        # would otherwise leave out.
        raw = {**raw, "freeze_param": freeze}

    os.makedirs(args.exp_dir, exist_ok=True)
    if jax.process_index() == 0:
        dump_resolved(os.path.join(args.exp_dir, "config.yaml"), raw)

    # mesh first: the sampler's batch-size grid depends on the data axis
    import math

    mesh = make_mesh(n_model=args.tensor_parallel)
    n_data = mesh.shape["data"]
    n_proc = jax.process_count()
    is_primary = jax.process_index() == 0
    # B multiples of lcm(8, n_data): bounds the compiled (B,S,T) shape set
    # and keeps every batch shardable over the data axis
    b_grid = 8 * n_data // math.gcd(8, n_data)

    # data
    from agacs_tpu.data.augment import augment_from_dict

    # lid_ce CS loss consumes lid-mode labels (adapt/cs_loss.py getlid
    # semantics) instead of the shipped attention-pattern labels
    cs_mode = getattr(task.cfg, "cs_loss_type", "attention")
    train_ds = ASRDataset(
        args.train_dir, augment=augment_from_dict(raw, seed=tcfg.seed),
        cs_label_mode=cs_mode,
    )
    valid_ds = ASRDataset(args.valid_dir, cs_label_mode=cs_mode)
    from agacs_tpu.data.shapes import collect_num_samples

    train_lens = collect_num_samples(train_ds)
    valid_lens = collect_num_samples(valid_ds)

    batch_type = args.batch_type or tcfg.batch_type
    if batch_type == "fixed_shapes":
        from agacs_tpu.data.sampler import (
            fixed_shape_batches,
            geometric_s_buckets,
        )

        _sbuckets = geometric_s_buckets(ratio=tcfg.shape_ratio)

        def sample_epoch(lens, shuffle=False, seed=0):
            return fixed_shape_batches(
                lens, tcfg.batch_bins, b_grid=b_grid,
                shuffle_batches=shuffle, seed=seed,
                ratio=tcfg.shape_ratio,
            )

        def s_pad_of(mx):
            for s in _sbuckets:
                if mx <= s:
                    return s
            return _sbuckets[-1]
    elif batch_type in ("sorted", "unsorted", "folded", "length"):
        # reference-parity batch types (build_batch_sampler.py); these
        # don't respect b_grid, so ragged batches may take the replicated
        # mesh path — numel/fixed_shapes remain the TPU-native choices
        from agacs_tpu.data.sampler import (
            folded_batches,
            length_batches,
            sorted_batches,
            unsorted_batches,
        )

        _ds_of = {id(train_lens): train_ds, id(valid_lens): valid_ds}

        def sample_epoch(lens, shuffle=False, seed=0):
            if batch_type == "sorted":
                batches = sorted_batches(lens, tcfg.batch_size)
            elif batch_type == "unsorted":
                batches = unsorted_batches(list(lens), tcfg.batch_size)
            else:
                ds = _ds_of[id(lens)]
                tok_lens = {u: ds.num_tokens(u) for u in lens}
                if batch_type == "folded":
                    batches = folded_batches(
                        [lens, tok_lens], tcfg.batch_size,
                        list(tcfg.fold_length),
                    )
                else:
                    batches = length_batches([lens, tok_lens], tcfg.batch_bins)
            if shuffle:
                np.random.RandomState(seed).shuffle(batches)
            return batches

        def s_pad_of(mx):
            from agacs_tpu.data.sampler import bucket_length as _bl

            return _bl(mx, 16000, 30 * 16000)
    else:

        def sample_epoch(lens, shuffle=False, seed=0):
            return num_elements_batches(
                lens, tcfg.batch_bins, b_grid=b_grid,
                shuffle_batches=shuffle, seed=seed,
            )

        def s_pad_of(mx):
            from agacs_tpu.data.sampler import bucket_length as _bl

            return _bl(mx, 16000, 30 * 16000)

    valid_batches = sample_epoch(valid_lens)
    logging.info(
        "train: %d utts, valid: %d utts (%d batches); %d process(es), "
        "b_grid %d, batch_type %s", len(train_ds), len(valid_ds),
        len(valid_batches), n_proc, b_grid, batch_type,
    )

    # model/optim
    rng = jax.random.PRNGKey(tcfg.seed)
    params = task.init_fn(rng, cfg)
    init_param = args.init_param or tcfg.init_param
    if init_param:
        logging.info("loading init params from %s", init_param)
        params = load_init_params(init_param, params, cfg)

    params = shard_params(mesh, params, tensor_parallel=args.tensor_parallel > 1)

    tx, mask = build_tx(params, optim_cfg, freeze_preset=freeze)
    if freeze and dtype == jnp.bfloat16:
        # frozen trunk stored bf16: same rounding as the per-use cast,
        # half the HBM reads (trainer.cast_frozen_params)
        from agacs_tpu.train.trainer import cast_frozen_params

        params = cast_frozen_params(params, mask)
    if freeze and tcfg.freeze_quant == "int8":
        # frozen trunk linears on the MXU int8 path (W8A8; ~2x bf16 peak,
        # docs/PERF.md). Changes the pytree, so rebuild optimizer + mask.
        from agacs_tpu.train.trainer import quantize_frozen_linears

        params = quantize_frozen_linears(params, mask)
        tx, mask = build_tx(params, optim_cfg, freeze_preset=freeze)
        logging.info("freeze_quant=int8: frozen trunk linears quantized")
    elif tcfg.freeze_quant not in (None, "none"):
        raise ValueError(f"unknown freeze_quant {tcfg.freeze_quant!r}"
                         if tcfg.freeze_quant != "int8"
                         else "freeze_quant=int8 requires freeze_param")
    n_train, n_total = count_trainable(params, mask)
    logging.info(
        "freeze_param=%s: %.2fM / %.2fM trainable",
        freeze, n_train / 1e6, n_total / 1e6,
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(tcfg.seed + 1))
    zero1 = args.optim_state_shard or tcfg.optim_state_shard

    def apply_zero1(state):
        # ZeRO-1 equivalent (reference optional fairscale OSS path,
        # trainer.py:193-199): Adam moments sharded over the data axis —
        # for full-FT configs where replicated moments (2x model, f32)
        # dominate per-chip HBM
        import dataclasses

        from agacs_tpu.parallel import opt_state_shard_stats, shard_opt_state

        state = dataclasses.replace(
            state, opt_state=shard_opt_state(mesh, state.opt_state)
        )
        st = opt_state_shard_stats(state.opt_state)
        logging.info(
            "optim_state_shard: %.1f MB sharded over data axis "
            "(%d leaves), %.1f MB replicated",
            st["sharded_bytes"] / 1e6, st["sharded_leaves"],
            st["replicated_bytes"] / 1e6,
        )
        return state

    if zero1:
        state = apply_zero1(state)

    mgr = CheckpointManager(
        args.exp_dir, keep_nbest=tcfg.keep_nbest_models,
        criterion=tcfg.best_model_criterion, backend=args.ckpt_backend,
    )
    history: dict = {}
    start_epoch = 1
    if args.resume:
        state, start_epoch, history = mgr.resume(state)
        logging.info("resumed at epoch %d", start_epoch)
        if zero1:
            # restored opt-state leaves come back replicated; re-shard
            state = apply_zero1(state)

    from agacs_tpu.train.observability import (
        TensorboardWriter,
        WandbSink,
        plot_attention_epoch,
        plot_history,
    )

    tb = (TensorboardWriter(os.path.join(args.exp_dir, "tensorboard"))
          if is_primary else None)
    wandb_sink = WandbSink(args.exp_dir) if is_primary else None
    att_utts = valid_ds.utt_ids[: max(args.num_att_plot, 0)]

    train_step = make_train_step(cfg, tx, loss_fn=task.loss_fn, trainable_mask=mask)
    eval_step = make_eval_step(cfg, loss_fn=task.loss_fn, return_preds=True)
    from agacs_tpu.train.error_calculator import ErrorCalculator

    err_calc = ErrorCalculator(train_ds.tokenizer.id_to_token)

    is_transducer = task.kind == "transducer"
    if is_transducer:
        # fused eval: ONE encoder pass feeds both the losses and the
        # batched greedy search for CER/WER — the ErrorCalculatorTransducer
        # role (espnet_model.py:131-147,
        # espnet2/asr/transducer/error_calculator.py)
        from agacs_tpu.models import transducer_asr

        @jax.jit
        def eval_step(p, batch):  # noqa: F811
            return transducer_asr.eval_step_with_greedy(
                p, cfg, batch, max_symbols=batch["text"].shape[1] + 8
            )
    reporter = Reporter()
    reporter.history = history

    def run_batches(ds, batch_ids, sub, step_fn, is_train):
        nonlocal state

        def make_batch(utts):
            # device_put in the prefetch thread: the host->device copy
            # overlaps the previous steps' compute. Padded shapes come
            # from the shared length tables (NOT the loaded rows) so (a)
            # the fixed_shapes policy controls the compiled-shape set and
            # (b) every host of a multi-process run agrees on the global
            # shape while collating only its own row block.
            s_pad = s_pad_of(max(ds.num_samples(u) for u in utts))
            t_pad = bucket_length(
                max(ds.num_tokens(u) for u in utts), 8, None
            )
            if n_proc > 1:
                # one global SPMD program on every host; batches that
                # don't divide the data axis are loaded in full and
                # replicated (serial tail)
                shardable = len(utts) % n_data == 0
                rows = (local_batch_rows(mesh, len(utts)) if shardable
                        else slice(None))
                batch = collate_batch(
                    [ds[u] for u in utts[rows]], pad_to=(s_pad, t_pad)
                )
                batch.pop("utt_ids")
                batch.pop("text_lengths")
                return shard_batch(mesh, batch, process_local=shardable)
            batch = collate_batch([ds[u] for u in utts], pad_to=(s_pad, t_pad))
            batch.pop("utt_ids")
            batch.pop("text_lengths")
            return shard_batch(mesh, batch)

        from agacs_tpu.data.prefetch import prefetch_batches

        batches = prefetch_batches(make_batch, batch_ids, lookahead=2)
        for i, (utts, batch) in enumerate(zip(batch_ids, batches)):
            with sub.measure_time("iter_time"):
                with sub.measure_time("step_time"):
                    if is_train:
                        state, stats = step_fn(state, batch)
                        preds = None
                    else:
                        stats, preds = step_fn(state.params, batch)
                    stats = {k: float(v) for k, v in stats.items()}
            if not is_train and preds is not None and n_proc > 1:
                # sharded outputs span non-addressable devices; the host
                # CER/WER pass needs the full arrays (identical on every
                # host, keeping the reported history in lockstep)
                from jax.experimental import multihost_utils

                preds = jax.tree.map(
                    lambda x: multihost_utils.process_allgather(x, tiled=True)
                    if isinstance(x, jax.Array) and not x.is_fully_addressable
                    else x,
                    preds,
                )
            if not is_train and preds is not None:
                if is_transducer:
                    # preds = greedy (tokens, n_emitted): ragged CER/WER
                    toks, n_emit = np.asarray(preds[0]), np.asarray(preds[1])
                    hyp_ids = [row[:k].tolist() for row, k in zip(toks, n_emit)]
                    cer, wer = err_calc.ragged(
                        hyp_ids, list(np.asarray(batch["text"]))
                    )
                else:
                    # eval-epoch cer/wer from teacher-forced argmax
                    # (espnet_model.py:955-959 ErrorCalculator semantics)
                    ys_hat, ys_out = preds
                    cer, wer = err_calc(np.asarray(ys_hat), np.asarray(ys_out))
                if cer is not None:
                    stats["cer"] = cer
                if wer is not None:
                    stats["wer"] = wer
            sub.register(stats, weight=len(utts))
            if (i + 1) % tcfg.log_interval == 0:
                logging.info(
                    "%s epoch %d batch %d/%d: %s",
                    sub.phase, sub.epoch, i + 1, len(batch_ids),
                    ", ".join(f"{k}={v:.4g}" for k, v in sorted(stats.items())),
                )

    bn_probe_fn = None
    if getattr(getattr(cfg, "encoder", None), "conv_norm", "") == "batch":
        from agacs_tpu.models.conformer_asr import bn_calibration_stats

        bn_probe_fn = jax.jit(
            lambda p, s, l: bn_calibration_stats(p, cfg, s, l)
        )

    best_metric_history = []
    for epoch in range(start_epoch, tcfg.max_epoch + 1):
        t0 = time.time()
        # identical on every host (shared lengths + seed): multi-host runs
        # keep the full global list and row-slice each batch in make_batch
        epoch_batches = sample_epoch(
            train_lens, shuffle=True, seed=tcfg.seed + epoch
        )

        sub = reporter.start_epoch("train", epoch)
        nonfinite_before = float(np.asarray(
            getattr(state.opt_state, "total_notfinite", 0)))
        run_batches(train_ds, epoch_batches, sub, train_step, True)
        train_stats = reporter.finish_epoch(sub)
        # abort when every optimizer step this epoch was skipped for
        # non-finite grads (reference trainer.py:450-456
        # all_steps_are_invalid)
        nonfinite_now = float(np.asarray(
            getattr(state.opt_state, "total_notfinite", 0)))
        if (len(epoch_batches) > 0
                and nonfinite_now - nonfinite_before >= len(epoch_batches)):
            raise RuntimeError(
                f"epoch {epoch}: all {len(epoch_batches)} steps had "
                "non-finite gradients; aborting (check lr/data)"
            )

        # conformer conv BatchNorm: refresh running buffers from a few
        # train batches before eval (the functional replacement for
        # torch's per-step EMA; conformer.apply_bn_stats)
        if bn_probe_fn is not None:
            from agacs_tpu.models.conformer import apply_bn_stats

            import dataclasses as _dc

            probes = epoch_batches[: min(8, len(epoch_batches))]
            acc_m = acc_v = None
            for utts in probes:
                batch = collate_batch([train_ds[u] for u in utts])
                m, v = bn_probe_fn(
                    state.params, jnp.asarray(batch["speech"]),
                    jnp.asarray(batch["speech_lengths"]),
                )
                acc_m = m if acc_m is None else acc_m + m
                acc_v = v if acc_v is None else acc_v + v
            if acc_m is not None:
                new_params = dict(state.params)
                new_params["encoder"] = apply_bn_stats(
                    state.params["encoder"],
                    acc_m / len(probes), acc_v / len(probes),
                )
                state = _dc.replace(state, params=new_params)

        sub = reporter.start_epoch("valid", epoch)
        run_batches(valid_ds, valid_batches, sub, eval_step, False)
        valid_stats = reporter.finish_epoch(sub)

        history[epoch] = reporter.history[epoch]
        mgr.save_epoch(epoch, state, history)

        # observability sinks (trainer.py:254-265, 802+; reporter plots)
        # — primary host only, like the reference's rank-0 logging
        if is_primary:
            tb.add_scalars(epoch, {
                f"{ph}/{k}": v
                for ph, d in history[epoch].items() for k, v in d.items()
            })
            wandb_sink.log_epoch(epoch, history[epoch])
            plot_history(history, os.path.join(args.exp_dir, "images"))
        if att_utts and task.kind == "whisper":
            if n_proc > 1:
                # the plot forward would be a collective program; running
                # it on the primary alone would deadlock the others
                logging.info("attention plots skipped in multi-host runs")
            else:
                try:
                    plot_attention_epoch(
                        state.params, cfg, valid_ds, att_utts, args.exp_dir,
                        epoch,
                    )
                except Exception as e:  # plotting must never kill training
                    logging.warning("attention plots failed: %s", e)
        logging.info("epoch %d done in %.1fs", epoch, time.time() - t0)

        # early stopping (trainer.py:459-463)
        if tcfg.patience is not None:
            phase, metric, mode = tcfg.best_model_criterion
            best = mgr.best_epoch(history)
            if best is not None and epoch - best >= int(tcfg.patience):
                logging.info("early stop: no %s improvement for %s epochs",
                             metric, tcfg.patience)
                break
        best_metric_history.append(valid_stats.get("acc"))

    avg = mgr.average_nbest(history, state.params)
    if is_primary:
        reporter.dump(os.path.join(args.exp_dir, "train_history.json"))
        phase, metric, _ = tcfg.best_model_criterion
        ave_path = os.path.join(args.exp_dir,
                                f"{phase}.{metric}.ave.params.npz")
        if os.path.exists(ave_path):
            # the reference uploads the final model as a wandb artifact
            # (trainer.py:406-414)
            wandb_sink.log_artifact(ave_path, kind="model")
        wandb_sink.finish()
    logging.info("done; n-best average written")
    return {"history": history, "exp_dir": args.exp_dir}


if __name__ == "__main__":
    main()
