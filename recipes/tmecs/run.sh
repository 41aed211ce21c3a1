#!/usr/bin/env bash
# TMECS (Taiwan-accent Mandarin-English CS) recipe — the equivalent of
# egs2/tmecs/asr1/run_whisper*.sh: pick a variant config from conf/ and run
# train -> decode -> score over the test sets.
#
#   variant=train_asr_whisper_small_adapter_csloss data=data exp=exp ./run.sh
set -euo pipefail

data=${data:-data}
exp=${exp:-exp/tmecs}
variant=${variant:-train_asr_whisper_small_adapter_csloss}
init_pt=${init_pt:-}
decode_sets=${decode_sets:-"devman devsge test_ascend test_ntut test_ugrads test_sn"}
python=${python:-python}
conf_dir="$(dirname "$0")/conf"

${python} -m agacs_tpu.bin.train \
  --config "${conf_dir}/${variant}.yaml" \
  --train_dir "${data}/train" --valid_dir "${data}/valid" \
  --exp_dir "${exp}/${variant}" \
  ${init_pt:+--init_param "${init_pt}"}

for set in ${decode_sets}; do
  [ -d "${data}/${set}" ] || continue
  out="${exp}/${variant}/decode_${set}"
  ${python} -m agacs_tpu.bin.decode \
    --config "${exp}/${variant}/config.yaml" \
    --params "${exp}/${variant}/valid.acc.ave.params.npz" \
    --decode_config "${conf_dir}/decode_asr_whisper.yaml" \
    --data_dir "${data}/${set}" --output_dir "${out}"
  ${python} -m agacs_tpu.bin.score \
    --ref "${out}/ref.trn" --hyp "${out}/hyp.trn" \
    --output_dir "${out}/score" --per_bucket
done
