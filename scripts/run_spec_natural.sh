#!/bin/bash
# Speculative decoding measured on NATURAL text (VERDICT r3 task 6): the
# round-3 numbers (3.42x lookup, 1.99x draft) were taken on the copy task
# with copy-agreement 1.00 — the acceptance best case. This script trains
# the BPE needle model family in-framework (same recipe as stage 1 of
# scripts/run_context_extension.sh: copy warm start -> mixed needle QA)
# plus a 2L/256 draft on the SAME data, then measures draft-k and
# prompt-lookup speculation in three prompt regimes:
#   copy      — "{span} REPEAT: " (the round-3 best case, for reference)
#   haystack  — fresh filler prose, free-running continuation (acceptance
#               FLOOR: the filler draws words near-uniformly, less
#               predictable than real prose)
#   needleqa  — haystack + needle + retrieval question (the long-context
#               QA serving workload the speculation docs claim)
#
# Usage: bash scripts/run_spec_natural.sh [WORKDIR]
set -eu

WORK=${1:-/tmp/specnat}
REPO=$(cd "$(dirname "$0")/.." && pwd)
TOK="$REPO/tests/fixtures/tokenizer_bpe"
TARGET_CFG="dict(vocab_size=2048,hidden_size=768,intermediate_size=2048,num_hidden_layers=6,num_attention_heads=6,max_sequence_length=2048,scan_attention=True,scan_query_chunk_size=256,scan_key_chunk_size=256,scan_mlp=False,scan_layers=True,param_scan_axis=0,remat_block='nothing_saveable',theta=10000)"
DRAFT_CFG="dict(vocab_size=2048,hidden_size=256,intermediate_size=768,num_hidden_layers=2,num_attention_heads=2,max_sequence_length=2048,scan_attention=True,scan_query_chunk_size=256,scan_key_chunk_size=256,scan_mlp=False,scan_layers=True,param_scan_axis=0,remat_block='nothing_saveable',theta=10000)"

cd "$REPO"
mkdir -p "$WORK"

gen () {  # gen OUTPUT ARGS...  (idempotent)
  local OUT=$1; shift
  [ -f "$WORK/$OUT" ] && return 0
  python -m lwm_tpu.apps."$@"
}

echo "== 0/4: synthetic data (skips existing files) =="
gen copy.jsonl create_copy_pretrain_data \
  --tokenizer "$TOK" --seq_length 512 --n_train 8000 \
  --output "$WORK/copy.jsonl"
gen copy_mix.jsonl create_copy_pretrain_data \
  --tokenizer "$TOK" --seq_length 1024 --n_train 12000 \
  --output "$WORK/copy_mix.jsonl" --seed 3
gen needle_short.jsonl create_needle_train_data \
  --tokenizer "$TOK" --seq_length 1024 --n_train 24000 \
  --filler_mode pool --n_distractors 2 --qa_all_needles \
  --min_context_tokens 32 --max_context_tokens 450 \
  --train_output "$WORK/needle_short.jsonl"
gen needle_long.jsonl create_needle_train_data \
  --tokenizer "$TOK" --seq_length 2048 --n_train 8000 \
  --filler_mode pool --n_distractors 2 --qa_all_needles \
  --min_context_tokens 256 --seed 2 \
  --train_output "$WORK/needle_long.jsonl"
if [ ! -f "$WORK/train_mixed.jsonl" ]; then
  python - "$WORK" <<'EOF'
import random, sys
w = sys.argv[1]
rng = random.Random(99)
copy_ = open(f"{w}/copy_mix.jsonl").read().strip().splitlines()
a = open(f"{w}/needle_short.jsonl").read().strip().splitlines()
b = open(f"{w}/needle_long.jsonl").read().strip().splitlines()
rng.shuffle(copy_); rng.shuffle(a); rng.shuffle(b)
groups = []
for i in range(min(len(copy_), len(a))):
    pair = [copy_[i], a[i]]
    rng.shuffle(pair)
    groups.append(pair)
a = a[len(copy_):]
groups += [[a[i], a[i + 1]] for i in range(0, len(a) - 1, 2)]
groups += [[x] for x in b]
rng.shuffle(groups)
with open(f"{w}/train_mixed.jsonl", "w") as f:
    for g in groups:
        f.write("\n".join(g) + "\n")
EOF
fi

train () {  # train NAME CFG COPY_STEPS MIX_STEPS COPY_BATCH MIX_BATCH [WARM]
  local NAME=$1 CFG=$2 COPY_STEPS=$3 MIX_STEPS=$4 CB=$5 MB=$6
  if [ ! -e "$WORK/run_$NAME/done" ]; then
    python -m lwm_tpu.train \
      --mesh_dim='1,1,1,1' --dtype=fp32 --total_steps=$COPY_STEPS \
      --log_freq=200 --save_model_freq=$COPY_STEPS \
      --update_llama_config="$CFG" --tokenizer="$TOK" \
      --train_dataset.type=json \
      --train_dataset.text_processor.fields='[question],answer,[postpad]' \
      --train_dataset.text_processor.subfield_separator='' \
      --train_dataset.json_dataset.path="$WORK/copy.jsonl" \
      --train_dataset.json_dataset.seq_length=512 \
      --train_dataset.json_dataset.batch_size=$CB \
      --optimizer.adamw_optimizer.lr=1e-3 --optimizer.adamw_optimizer.end_lr=3e-4 \
      --optimizer.adamw_optimizer.lr_warmup_steps=100 \
      --optimizer.adamw_optimizer.lr_decay_steps=$COPY_STEPS \
      --logger.output_dir="$WORK/run_${NAME}_copy" --logger.experiment_id=c
    COPY_CKPT=$(ls "$WORK"/run_${NAME}_copy/c*/streaming_params* | tail -1)
    python -m lwm_tpu.train \
      --mesh_dim='1,1,1,1' --dtype=fp32 --total_steps=$MIX_STEPS \
      --log_freq=250 --save_model_freq=$MIX_STEPS \
      --load_checkpoint="params::$COPY_CKPT" \
      --update_llama_config="$CFG" --tokenizer="$TOK" \
      --train_dataset.type=json \
      --train_dataset.text_processor.fields='[question],answer,[postpad]' \
      --train_dataset.text_processor.subfield_separator='' \
      --train_dataset.json_dataset.path="$WORK/train_mixed.jsonl" \
      --train_dataset.json_dataset.seq_length=2048 \
      --train_dataset.json_dataset.batch_size=$MB \
      --optimizer.adamw_optimizer.lr=1e-3 --optimizer.adamw_optimizer.end_lr=1e-4 \
      --optimizer.adamw_optimizer.lr_warmup_steps=200 \
      --optimizer.adamw_optimizer.lr_decay_steps=$MIX_STEPS \
      --logger.output_dir="$WORK/run_$NAME" --logger.experiment_id=m
    touch "$WORK/run_$NAME/done"
  fi
}

echo "== 1/4: target (6L/768 BPE needle model, copy warm start) =="
train target "$TARGET_CFG" 1500 4000 64 16
TARGET_CKPT=$(ls "$WORK"/run_target/m*/streaming_params* | tail -1)

echo "== 2/4: draft (2L/256, same data) =="
train draft "$DRAFT_CFG" 1000 2500 64 16
DRAFT_CKPT=$(ls "$WORK"/run_draft/m*/streaming_params* | tail -1)

echo "== 3/4: free-running LM loss sanity =="
echo "target: $TARGET_CKPT"
echo "draft:  $DRAFT_CKPT"

echo "== 4/4: spec decode bench, all prompt regimes =="
BENCH_ENV="SPEC_TOKENIZER=$TOK SPEC_TARGET=params::$TARGET_CKPT SPEC_DRAFT=params::$DRAFT_CKPT"
export SPEC_TOKENIZER="$TOK" SPEC_TARGET="params::$TARGET_CKPT" SPEC_DRAFT="params::$DRAFT_CKPT"
export SPEC_TARGET_CFG='{"vocab_size":2048}' SPEC_DRAFT_CFG='{"vocab_size":2048}'
for prompts in copy haystack needleqa; do
  for mode in draft lookup; do
    SPEC_MODE=$mode SPEC_PROMPTS=$prompts SPEC_NEW=160 \
      python benchmarks/spec_decode_bench.py | tee -a "$WORK/results.txt"
  done
done
echo "results in $WORK/results.txt"
