#! /bin/bash
# Video/image QA serving (lwm_tpu/apps/serve_vision.py): VQGAN-encode
# the video ONCE into a shared vision-masked prefix, then answer a
# stream of questions in-flight. QUESTIONS_FILE empty = interactive
# stdin. PREFIX_CACHE persists the built video KV across restarts.
# LOOKUP_K>0 adds draft-free speculation for quoting answers.
export SCRIPT_DIR="$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )"
export PROJECT_DIR="$( cd -- "$( dirname -- "$SCRIPT_DIR" )" &> /dev/null && pwd )"
cd $PROJECT_DIR
export PYTHONPATH="$PYTHONPATH:$PROJECT_DIR"

python3 -u -m lwm_tpu.apps.serve_vision \
    --input_file="${INPUT_FILE:-}" \
    --input_codes_file="${INPUT_CODES_FILE:-}" \
    --vqgan_checkpoint="${VQGAN_CHECKPOINT:-}" \
    --questions_file="${QUESTIONS_FILE:-}" \
    --output_file="${OUTPUT_FILE:-answers.jsonl}" \
    --slots="${SLOTS:-4}" \
    --cache_len="${CACHE_LEN:-1024}" \
    --prompt_buckets="${PROMPT_BUCKETS:-64,128,256}" \
    --max_new_tokens="${MAX_NEW_TOKENS:-256}" \
    --temperature="${TEMPERATURE:-0.0}" \
    --max_n_frames="${MAX_N_FRAMES:-8}" \
    --prefix_cache="${PREFIX_CACHE:-}" \
    --lookup_k="${LOOKUP_K:-0}" \
    --dtype='bf16' \
    --load_llama_config="${LLAMA_CONFIG:-7b}" \
    --update_llama_config="dict(scan_attention=False,scan_mlp=False,theta=${THETA:-50000000})" \
    --tokenizer="${TOKENIZER:-LargeWorldModel/LWM-Text-1M}" \
    --load_checkpoint="params::${CHECKPOINT:-}"
