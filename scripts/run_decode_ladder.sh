#!/bin/bash
# Deep-prompt decode ladder at the reference's signature context lengths
# (VERDICT r3 task 7): decode-only tok/s at 128K/256K/512K/1M prompts on
# ONE chip, 256M-shaped model, int8 KV cache + 4:1 GQA (kv_heads=2 of 8)
# — the serving-side half of the 1M-context story the single-chip train
# side can't reach (reference README.md:76-88 claims 1M context as the
# headline capability).
#
# HBM accounting (16G v5e-lite), per 1M-token row:
#   int8 KV cache: 2(k,v) x 14L x 2 kv-heads x 1,048,576 x 128 = 7.0 GiB
#     (+ fp32 scales [b,2,14,1M] = 112 MiB)   — bf16 MHA would be 56 GiB
#   weights (bf16 256M): 0.5 GiB
#   prefill transients: flash attention + scan_mlp chunking + logits_tail=1
#     keep them O(chunk), not O(T) x hidden/intermediate
#
# Usage: bash scripts/run_decode_ladder.sh [OUTDIR]
set -eu
OUT=${1:-/tmp/ladder}
REPO=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p "$OUT"
cd "$REPO"

for PROMPT in 131072 262144 524288 1048576; do
  LOG="$OUT/ladder_${PROMPT}.log"
  [ -f "$LOG" ] && grep -q "decode:" "$LOG" && { echo "skip $PROMPT (done)"; continue; }
  echo "== prompt $PROMPT =="
  # >=512K one-shot prefill over-commits HBM (1M: 21.9 GiB demand vs
  # 15.75 GiB; 512K survived one cold run in r4 but kills the worker on
  # the warm re-run). The serving layer admits long prompts in chunks,
  # so the deep rungs prefill in 128K chunks over the donated int8
  # cache (bit-exact vs one-shot: DECODE_CHECK in decode_bench.py)
  CHUNK=0
  [ "$PROMPT" -ge 524288 ] && CHUNK=131072
  DECODE_PROMPT=$PROMPT DECODE_NEW=256 DECODE_KV_DTYPE=int8 \
  DECODE_KV_HEADS=2 DECODE_SPLIT=1 DECODE_PREFILL_CHUNK=$CHUNK \
    python benchmarks/decode_bench.py 2>&1 | tee "$LOG"
done
grep -h "decode:" "$OUT"/ladder_*.log
