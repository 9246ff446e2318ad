#! /bin/bash
export SCRIPT_DIR="$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )"
export PROJECT_DIR="$( cd -- "$( dirname -- "$SCRIPT_DIR" )" &> /dev/null && pwd )"
cd $PROJECT_DIR
export PYTHONPATH="$PYTHONPATH:$PROJECT_DIR"

python3 -u -m lwm_tpu.apps.eval_needle_multi \
    --mesh_dim='!1,-1,4,1' \
    --dtype='fp32' \
    --load_llama_config='7b' \
    --update_llama_config="dict(theta=10000000,max_sequence_length=131072,scan_attention=True,scan_query_chunk_size=1024,scan_key_chunk_size=1024,scan_mlp=True,scan_mlp_chunk_size=1024,scan_layers=True)" \
    --tokenizer="${TOKENIZER:-LargeWorldModel/LWM-Text-1M}" \
    --load_checkpoint="params::${CHECKPOINT:-}" \
    --haystack_file="${HAYSTACK:-data/pg19.jsonl}" \
    --n_needles_total=4 --n_needles_retrieve=4 \
    --n_context_length_intervals=3 --n_document_depth_intervals=10 --n_rounds=2
