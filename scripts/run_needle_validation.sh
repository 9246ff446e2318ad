#!/bin/bash
# End-to-end needle-retrieval validation of the full pipeline:
#   synthetic data -> train -> streaming checkpoint -> scan->unscan convert
#   (exercised at load) -> eval_needle greedy decode -> accuracy.
#
# Validates, on one chip with a small model, the same path a released
# LWM-Text checkpoint takes through this framework (reference
# scripts/eval_needle.py:303-424 behavior): params:: streaming load,
# scan_axis rule tables, block-size left-padded prefill, resumable scoring.
#
# Usage: bash scripts/run_needle_validation.sh [WORKDIR]
set -eu

WORK=${1:-/tmp/needle_validation}
REPO=$(cd "$(dirname "$0")/.." && pwd)
TOK="$REPO/tests/fixtures/tokenizer"
SEQ=2048
MODEL_CFG="dict(vocab_size=512,hidden_size=512,intermediate_size=1376,num_hidden_layers=4,num_attention_heads=4,max_sequence_length=4096,scan_attention=True,scan_query_chunk_size=256,scan_key_chunk_size=256,scan_mlp=False,scan_layers=True,param_scan_axis=0,remat_block='nothing_saveable')"

mkdir -p "$WORK"
cd "$REPO"

echo "== 1/4: synthetic needle data (training + eval haystack) =="
python -m lwm_tpu.apps.create_needle_train_data \
  --tokenizer "$TOK" --seq_length $SEQ --n_train 8000 \
  --train_output "$WORK/train.jsonl" \
  --haystack_output "$WORK/haystack.jsonl"

echo "== 2/4: train (answer-masked CE; acc = needle-digit accuracy) =="
python -m lwm_tpu.train \
  --mesh_dim='1,1,1,1' --dtype=fp32 --total_steps=6000 --log_freq=200 \
  --save_model_freq=6000 \
  --update_llama_config="$MODEL_CFG" \
  --tokenizer="$TOK" \
  --train_dataset.type=json \
  --train_dataset.text_processor.fields='[question],answer,[postpad]' \
  --train_dataset.text_processor.subfield_separator='' \
  --train_dataset.json_dataset.path="$WORK/train.jsonl" \
  --train_dataset.json_dataset.seq_length=$SEQ \
  --train_dataset.json_dataset.batch_size=16 \
  --optimizer.adamw_optimizer.lr=1e-3 --optimizer.adamw_optimizer.end_lr=1e-4 \
  --optimizer.adamw_optimizer.lr_warmup_steps=200 \
  --optimizer.adamw_optimizer.lr_decay_steps=6000 \
  --logger.output_dir="$WORK/run" --logger.experiment_id=needle

CKPT=$(ls "$WORK"/run/needle*/streaming_params_* 2>/dev/null | tail -1)
[ -n "$CKPT" ] || CKPT=$(ls "$WORK"/run/needle*/streaming_params | tail -1)

echo "== 3/4: scan->unscan conversion of the trained checkpoint =="
python -m lwm_tpu.apps.convert_checkpoint \
  --direction=unscan --llama_config='debug' \
  --update_llama_config="$MODEL_CFG" \
  --scan_layers=True --param_scan_axis=0 \
  --streaming_path="$CKPT" \
  --output="$WORK/params_unscanned"

echo "== 4/4: needle eval (fresh haystacks + numbers, greedy decode;"
echo "        unscan_for_serving exercises the scan->unscan serving path) =="
python -m lwm_tpu.apps.eval_needle \
  --haystack_file="$WORK/haystack.jsonl" \
  --output_file="$WORK/results.json" \
  --context_lengths_min=500 --context_lengths_max=1500 \
  --n_context_length_intervals=3 --n_document_depth_intervals=3 \
  --n_rounds=2 \
  --mesh_dim='1,1,1,1' --dtype=fp32 \
  --update_llama_config="$MODEL_CFG" \
  --tokenizer="$TOK" \
  --unscan_for_serving=True \
  --load_checkpoint="params::$CKPT"

python - "$WORK/results.json" <<'EOF'
import json, sys
rs = json.load(open(sys.argv[1]))
n = sum(r["correct"] for r in rs)
print(f"needle accuracy: {n}/{len(rs)} = {n/len(rs):.1%}")
EOF
