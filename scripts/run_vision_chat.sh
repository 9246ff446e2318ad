#! /bin/bash
export SCRIPT_DIR="$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )"
export PROJECT_DIR="$( cd -- "$( dirname -- "$SCRIPT_DIR" )" &> /dev/null && pwd )"
cd $PROJECT_DIR
export PYTHONPATH="$PYTHONPATH:$PROJECT_DIR"

python3 -u -m lwm_tpu.apps.vision_chat \
    --prompt="${PROMPT:-What is happening in this video?}" \
    --input_file="${INPUT_FILE:-}" \
    --vqgan_checkpoint="${VQGAN_CHECKPOINT:-}" \
    --mesh_dim='!1,1,-1,1' \
    --dtype='fp32' \
    --load_llama_config='7b' \
    --update_llama_config="dict(sample_mode='text',theta=50000000,max_sequence_length=131072,scan_attention=False,scan_query_chunk_size=128,scan_key_chunk_size=128,scan_mlp=False,scan_mlp_chunk_size=2048,scan_layers=True)" \
    --tokenizer="${TOKENIZER:-LargeWorldModel/LWM-Text-1M}" \
    --load_checkpoint="params::${CHECKPOINT:-}" \
    --max_n_frames=8 --temperature=0.2
