#!/bin/bash
# Vision-needle retrieval at long context (VERDICT r4 task 5): train a
# VideoLLaMA pattern-retrieval model through staged context extension
# (the text recipe of run_context_extension.sh applied to vision), then
# measure text-keyed target-frame retrieval on fresh contexts over a
# context-length x depth grid up to 128 frames = 32,896 vision tokens
# (>= 32K; reference vision-language long-context claim README.md:86-88).
#
#   stage A:  1-8 frames   (seq 2560,  theta 1e4, fp32) — learn the task
#   stage B:  8-32 frames  (seq 8448,  theta 2e5, bf16) — extend
#   stage C: 96-128 frames (seq 33024, theta 2e6, bf16) — extend to 32K+
#   eval: frames {32, 64, 128} x depths {0,25,50,75,100} x 2 rounds
#
# Usage: bash scripts/run_vision_needle.sh [WORKDIR]
set -eu

WORK=${1:-/tmp/vneedle}
REPO=$(cd "$(dirname "$0")/.." && pwd)
TOK="$REPO/tests/fixtures/tokenizer"
BASE_CFG="vocab_size=512,vision_vocab_size=8448,hidden_size=384,intermediate_size=1024,num_hidden_layers=4,num_attention_heads=6,scan_attention=True,scan_query_chunk_size=256,scan_key_chunk_size=256,scan_mlp=False,scan_layers=True,param_scan_axis=0,remat_block='nothing_saveable',sample_mode='all'"

cd "$REPO"
mkdir -p "$WORK"

gen () {  # gen OUTPUT ARGS...  (idempotent)
  local OUT=$1; shift
  [ -f "$WORK/$OUT" ] && return 0
  python -m lwm_tpu.apps.create_vision_needle_data --output "$WORK/$OUT" "$@"
}

echo "== 0/4: data =="
gen train_short.jsonl --n_train 24000 --min_frames 1 --max_frames 8 --seed 11
gen train_mid.jsonl --n_train 4000 --min_frames 8 --max_frames 32 --seed 12
gen train_long.jsonl --n_train 1200 --min_frames 96 --max_frames 128 --seed 13

stage () {  # stage NAME DATA SEQ THETA STEPS BATCH LR DTYPE [WARM_CKPT]
  local NAME=$1 DATA=$2 SEQ=$3 THETA=$4 STEPS=$5 BATCH=$6 LR=$7 DTYPE=$8
  local WARM=${9:-}
  if [ -e "$WORK/run_$NAME/done" ]; then return 0; fi
  local LOAD=()
  [ -n "$WARM" ] && LOAD=(--load_checkpoint="params::$WARM")
  python -m lwm_tpu.train \
    --modality='vision,text' \
    --mesh_dim='1,1,1,1' --dtype=$DTYPE --total_steps=$STEPS \
    --log_freq=100 --save_model_freq=$STEPS \
    "${LOAD[@]}" \
    --update_llama_config="dict($BASE_CFG,max_sequence_length=$SEQ,theta=$THETA)" \
    --tokenizer="$TOK" \
    --train_dataset.type=json_vision \
    --train_dataset.vision_text_processor.fields_from_example='fields' \
    --train_dataset.json_vision_dataset.path="$WORK/$DATA" \
    --train_dataset.json_vision_dataset.seq_length=$SEQ \
    --train_dataset.json_vision_dataset.batch_size=$BATCH \
    --train_dataset.json_vision_dataset.mode=pad \
    --optimizer.adamw_optimizer.lr=$LR \
    --optimizer.adamw_optimizer.end_lr=1e-4 \
    --optimizer.adamw_optimizer.lr_warmup_steps=100 \
    --optimizer.adamw_optimizer.lr_decay_steps=$STEPS \
    --logger.output_dir="$WORK/run_$NAME" --logger.experiment_id=v
  touch "$WORK/run_$NAME/done"
}

ckpt () { ls "$WORK"/run_$1/v*/streaming_params* | tail -1; }

echo "== 1/4: stage A (1-8 frames, learn the task) =="
stage A train_short.jsonl 2560 10000 3000 16 1e-3 fp32
echo "== 2/4: stage B (8-32 frames) =="
stage B train_mid.jsonl 8448 200000 800 4 5e-4 bf16 "$(ckpt A)"
echo "== 3/4: stage C (96-128 frames, 32K+ vision tokens) =="
stage C train_long.jsonl 33024 2000000 400 1 3e-4 bf16 "$(ckpt B)"

echo "== 4/4: eval grid =="
python -m lwm_tpu.apps.eval_vision_needle \
  --checkpoint "$(ckpt C)" \
  --tokenizer "$TOK" \
  --update_llama_config "dict($BASE_CFG,max_sequence_length=33024,theta=2000000)" \
  --n_frames 32,64,128 --depths 0,25,50,75,100 --rounds 2 \
  --output "$WORK/results.json"
echo "results in $WORK/results.json"
