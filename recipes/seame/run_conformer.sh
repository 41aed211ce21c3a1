#!/usr/bin/env bash
# SEAME conformer+LM baseline recipe — the reference's
# egs2/seame/asr1/run.sh (asr.sh stages 1-13 for the conformer track):
# prep -> stats -> LM train -> ASR train -> joint CTC/attention decode
# with LM shallow fusion -> MER/CER/WER scoring.
#
# Data: either raw SEAME ($SEAME + $SEAME_DEV_REPO, stage 0 via
# run.sh-shared prep) or premade data dirs under $data.
set -euo pipefail

data=${data:-data}
exp=${exp:-exp/seame_conformer}
lm_exp=${lm_exp:-exp/lm}
stage=${stage:-1}
stop_stage=${stop_stage:-5}
decode_sets=${decode_sets:-"devman devsge"}
python=${python:-python}

conf_dir="$(dirname "$0")/conf"

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "=== stage 1: collect stats (GlobalMVN) ==="
  ${python} -m agacs_tpu.bin.collect_stats \
    --data_dir "${data}/train" --output_dir exp/stats
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "=== stage 2: transformer LM (asr.sh stages 6-9) ==="
  ${python} -m agacs_tpu.bin.lm_train \
    --train_text "${data}/train/text" --valid_text "${data}/valid/text" \
    --exp_dir "${lm_exp}"
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "=== stage 3: conformer hybrid CTC/attention training ==="
  ${python} -m agacs_tpu.bin.train \
    --config "${conf_dir}/train_asr_conformer.yaml" \
    --train_dir "${data}/train" --valid_dir "${data}/valid" \
    --exp_dir "${exp}"
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "=== stage 4: joint decode with LM fusion (decode_asr.yaml weights) ==="
  for set in ${decode_sets}; do
    out="${exp}/decode_${set}"
    ${python} -m agacs_tpu.bin.decode \
      --config "${exp}/config.yaml" \
      --params "${exp}/valid.acc.ave.params.npz" \
      --data_dir "${data}/${set}" --output_dir "${out}" \
      --decode_config "${conf_dir}/decode_asr.yaml" \
      --lm_exp "${lm_exp}"
  done
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "=== stage 5: scoring (MER + per-language) ==="
  for set in ${decode_sets}; do
    out="${exp}/decode_${set}"
    ${python} -m agacs_tpu.bin.score \
      --ref "${out}/ref.trn" --hyp "${out}/hyp.trn" \
      --output_dir "${out}/score" --per_bucket
  done
fi
