#!/usr/bin/env bash
# SEAME two-stage attention-guided CS adaptation recipe — the equivalent of
# egs2/seame/asr1/run_whisper1ststage.sh + run_whisper2ndstage.sh + asr.sh
# stages 10-13, over this framework's CLIs.
#
# Starts from either a raw SEAME checkout ($SEAME + $SEAME_DEV_REPO, stage 0
# — the asr.sh stages 1/3 equivalent: prepare + format to flac.ark) or
# pre-made kaldi-style data dirs (wav.scp + text, 16 kHz):
#   $data/train $data/valid $data/devman $data/devsge
# Optionally $init_pt = an OpenAI whisper-small .pt checkpoint.
set -euo pipefail

data=${data:-data}
exp=${exp:-exp/seame_whisper}
init_pt=${init_pt:-}      # path to whisper small .pt (optional)
SEAME=${SEAME:-}          # raw corpus root (enables stage 0)
SEAME_DEV_REPO=${SEAME_DEV_REPO:-}  # SEAME-dev-set checkout
stage=${stage:-1}
stop_stage=${stop_stage:-6}
decode_sets=${decode_sets:-"devman devsge"}
python=${python:-python}

conf_dir="$(dirname "$0")/conf"

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ] && [ -n "${SEAME}" ]; then
  echo "=== stage 0: corpus prep (local/preprocess.py) + format to flac.ark ==="
  # segment-level prep goes to ${data}/prep; formatting slices segments
  # into utterance-level flac.ark dirs at the canonical split names, so
  # every later stage (incl. speed perturb) sees one-utterance-per-entry
  ${python} -m agacs_tpu.bin.prepare_seame \
    --data "${SEAME}" --repo "${SEAME_DEV_REPO}" --out "${data}/prep"
  for set in train valid devman devsge; do
    ${python} -m agacs_tpu.bin.format_data \
      --data_dir "${data}/prep/${set}" --outdir "${data}/${set}" \
      --audio_format flac.ark
  done
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "=== stage 1: speed perturb (0.9/1.0/1.1) ==="
  ${python} - <<EOF
from agacs_tpu.data.perturb import perturb_data_dir
perturb_data_dir("${data}/train", "${data}/train_sp")
EOF
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "=== stage 2: stage-1 fine-tune (adapters, CE only) ==="
  ${python} -m agacs_tpu.bin.train \
    --config "${conf_dir}/train_asr_whisper_small_adapter_encoder.yaml" \
    --train_dir "${data}/train_sp" --valid_dir "${data}/valid" \
    --exp_dir "${exp}/stage1" \
    ${init_pt:+--init_param "${init_pt}"}
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "=== stage 3: head counting (optional; default uses built-in mask) ==="
  ${python} -m agacs_tpu.bin.count_heads \
    --config "${exp}/stage1/config.yaml" \
    --params "${exp}/stage1/valid.acc.ave.params.npz" \
    --data_dir "${data}/train_sp" \
    --output "${exp}/attention_counts.json" || true
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "=== stage 4: stage-2 fine-tune (adapters + CS loss) ==="
  ${python} -m agacs_tpu.bin.train \
    --config "${conf_dir}/train_asr_whisper_small_adapter_csloss_2stage.yaml" \
    --train_dir "${data}/train_sp" --valid_dir "${data}/valid" \
    --exp_dir "${exp}/stage2" \
    --init_param "${exp}/stage1/valid.acc.ave.params.npz"
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "=== stage 5: decode + score (greedy, like decode_asr_whisper.yaml) ==="
  for set in ${decode_sets}; do
    out="${exp}/stage2/decode_${set}"
    ${python} -m agacs_tpu.bin.decode \
      --config "${exp}/stage2/config.yaml" \
      --decode_config "${conf_dir}/decode_asr_whisper.yaml" \
      --params "${exp}/stage2/valid.acc.ave.params.npz" \
      --data_dir "${data}/${set}" --output_dir "${out}"
    ${python} -m agacs_tpu.bin.score \
      --ref "${out}/ref.trn" --hyp "${out}/hyp.trn" \
      --output_dir "${out}/score"
  done
fi

if [ ${stage} -le 6 ] && [ ${stop_stage} -ge 6 ]; then
  echo "=== stage 6: pack model (asr.sh stage 14) ==="
  opts=""
  [ -f "${exp}/stage2/train_history.json" ] && \
    opts="${opts} --option ${exp}/stage2/train_history.json"
  [ -d "${exp}/stage2/images" ] && opts="${opts} --option ${exp}/stage2/images"
  # shellcheck disable=SC2086
  ${python} -m agacs_tpu.bin.pack pack \
    --train_config "${exp}/stage2/config.yaml" \
    --model_file "${exp}/stage2/valid.acc.ave.params.npz" \
    ${opts} \
    --outpath "${exp}/stage2/packed_model.tgz"
fi
