#! /bin/bash
export SCRIPT_DIR="$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )"
export PROJECT_DIR="$( cd -- "$( dirname -- "$SCRIPT_DIR" )" &> /dev/null && pwd )"
cd $PROJECT_DIR
export PYTHONPATH="$PYTHONPATH:$PROJECT_DIR"
export LIBTPU_INIT_ARGS="--xla_enable_async_collective_permute=true --xla_tpu_enable_async_collective_fusion=true --xla_tpu_overlap_compute_collective_tc=true --xla_enable_async_all_gather=true"

python3 -u -m lwm_tpu.apps.eval_needle \
    --mesh_dim='!1,-1,4,1' \
    --dtype='fp32' \
    --load_llama_config='7b' \
    --update_llama_config="dict(theta=10000000,max_sequence_length=131072,scan_attention=True,scan_query_chunk_size=1024,scan_key_chunk_size=1024,scan_mlp=True,scan_mlp_chunk_size=1024,scan_layers=True)" \
    --tokenizer="${TOKENIZER:-LargeWorldModel/LWM-Text-1M}" \
    --load_checkpoint="params::${CHECKPOINT:-}" \
    --haystack_file="${HAYSTACK:-data/pg19.jsonl}" \
    --max_tokens_per_batch=2000000 \
    --output_file="${OUTPUT_FILE:-needle_results.json}" \
    --context_lengths_min=1000 \
    --context_lengths_max=32000 \
    --n_context_length_intervals=3 \
    --n_document_depth_intervals=3 \
    --n_rounds=2
