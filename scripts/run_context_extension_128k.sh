#!/bin/bash
# Stage 4 of the staged context extension: 32K -> 128K (theta 1e7 — the
# released LWM family's 128K setting, reference README.md:114-117),
# warm-started from the stage-3 (32K/theta 2e6) checkpoint produced by
# scripts/run_context_extension.sh. Runs in bf16 compute (fp32 master
# params): at 128K the attention matmuls dominate and the MXU's bf16
# rate makes the stage ~3-4x cheaper than the fp32 recipe at identical
# retrieval quality (the needle task is a copy task — wide numerics
# margins).
#
# Usage: bash scripts/run_context_extension_128k.sh [WORKDIR] [STAGE3_CKPT]
set -eu

WORK=${1:-/tmp/ext}
REPO=$(cd "$(dirname "$0")/.." && pwd)
TOK="$REPO/tests/fixtures/tokenizer_bpe"
BASE_CFG="vocab_size=2048,hidden_size=768,intermediate_size=2048,num_hidden_layers=6,num_attention_heads=6,scan_attention=True,scan_mlp=False,scan_layers=True,param_scan_axis=0,remat_block='nothing_saveable'"
CKPT3=${2:-$(ls -d "$WORK"/run_ext32k/*/streaming_params_* 2>/dev/null | tail -1)}
[ -n "$CKPT3" ] || { echo "no stage-3 checkpoint under $WORK/run_ext32k"; exit 1; }
STEPS=${STEPS:-350}

cd "$REPO"

if [ ! -f "$WORK/needle_128k.jsonl" ]; then
  JAX_PLATFORMS=cpu python -m lwm_tpu.apps.create_needle_train_data \
    --tokenizer "$TOK" --seq_length 131072 --n_train 400 \
    --filler_mode pool --n_distractors 2 --qa_all_needles \
    --min_context_tokens 16384 --seed 6 \
    --train_output "$WORK/needle_128k.jsonl"
fi

echo "== stage 4: extend to 131072 ctx, theta 1e7 (from $CKPT3) =="
python -m lwm_tpu.train \
  --mesh_dim='1,1,1,1' --dtype=bf16 --total_steps=$STEPS --log_freq=25 \
  --save_model_freq=$STEPS --load_checkpoint="params::$CKPT3" \
  --update_llama_config="dict($BASE_CFG,max_sequence_length=131072,theta=10000000,scan_query_chunk_size=2048,scan_key_chunk_size=2048)" \
  --tokenizer="$TOK" \
  --train_dataset.type=json \
  --train_dataset.text_processor.fields='[question],answer,[postpad]' \
  --train_dataset.text_processor.subfield_separator='' \
  --train_dataset.json_dataset.path="$WORK/needle_128k.jsonl" \
  --train_dataset.json_dataset.seq_length=131072 \
  --train_dataset.json_dataset.batch_size=1 \
  --optimizer.adamw_optimizer.lr=3e-4 --optimizer.adamw_optimizer.end_lr=1e-4 \
  --optimizer.adamw_optimizer.lr_warmup_steps=50 \
  --optimizer.adamw_optimizer.lr_decay_steps=$STEPS \
  --logger.output_dir="$WORK/run_ext128k" --logger.experiment_id="ext128k"
CKPT4=$(ls "$WORK"/run_ext128k/ext128k*/streaming_params_* 2>/dev/null | tail -1)
echo "stage-4 ckpt: $CKPT4"

echo "== eval: fresh-needle retrieval at up to 126K context =="
python -m lwm_tpu.apps.eval_needle \
  --haystack_file="$WORK/haystack.jsonl" \
  --output_file="$WORK/results_128k.json" \
  --context_lengths_min=32768 --context_lengths_max=126000 \
  --n_context_length_intervals=3 --n_document_depth_intervals=3 \
  --n_rounds=2 \
  --load_checkpoint="params::$CKPT4" \
  --unscan_for_serving=True \
  --update_llama_config="dict($BASE_CFG,max_sequence_length=131072,theta=10000000,scan_query_chunk_size=2048,scan_key_chunk_size=2048)" \
  --tokenizer="$TOK" \
  --mesh_dim='1,1,1,1' --dtype=bf16 \
  --max_tokens_per_batch=131072
python -m lwm_tpu.apps.summarize_needle "$WORK/results_128k.json" || true
echo "done: $WORK/results_128k.json"
