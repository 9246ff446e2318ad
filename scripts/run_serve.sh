#! /bin/bash
# In-flight batching serving (lwm_tpu/apps/serve.py): requests from a
# JSONL file (or stdin when INPUT_FILE is empty) through a slot pool.
# QUANTIZE=1 turns on int8 weight-only quantization at load.
export SCRIPT_DIR="$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )"
export PROJECT_DIR="$( cd -- "$( dirname -- "$SCRIPT_DIR" )" &> /dev/null && pwd )"
cd $PROJECT_DIR
export PYTHONPATH="$PYTHONPATH:$PROJECT_DIR"

python3 -u -m lwm_tpu.apps.serve \
    --input_file="${INPUT_FILE:-}" \
    --output_file="${OUTPUT_FILE:-completions.jsonl}" \
    --slots="${SLOTS:-8}" \
    --cache_len="${CACHE_LEN:-4096}" \
    --prompt_buckets="${PROMPT_BUCKETS:-256,1024,2048}" \
    --max_new_tokens="${MAX_NEW_TOKENS:-256}" \
    --temperature="${TEMPERATURE:-0.0}" \
    --quantize_weights="${QUANTIZE:-False}" \
    --dtype='bf16' \
    --load_llama_config="${LLAMA_CONFIG:-7b}" \
    --update_llama_config="dict(scan_attention=False,scan_mlp=False,theta=${THETA:-50000000})" \
    --tokenizer="${TOKENIZER:-LargeWorldModel/LWM-Text-1M}" \
    --load_checkpoint="params::${CHECKPOINT:-}"
