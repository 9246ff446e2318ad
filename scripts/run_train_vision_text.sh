#! /bin/bash
# Vision-text (VideoLLaMA) training launch template.
export SCRIPT_DIR="$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )"
export PROJECT_DIR="$( cd -- "$( dirname -- "$SCRIPT_DIR" )" &> /dev/null && pwd )"
cd $PROJECT_DIR
export PYTHONPATH="$PYTHONPATH:$PROJECT_DIR"
export LIBTPU_INIT_ARGS="--xla_tpu_megacore_fusion_allow_ags=false --xla_enable_async_collective_permute=true --xla_tpu_enable_ag_backward_pipelining=true --xla_tpu_enable_data_parallel_all_reduce_opt=true --xla_tpu_data_parallel_opt_different_sized_ops=true --xla_tpu_enable_async_collective_fusion=true --xla_tpu_enable_async_collective_fusion_multiple_steps=true --xla_tpu_overlap_compute_collective_tc=true --xla_enable_async_all_gather=true"

python3 -u -m lwm_tpu.train \
    --modality='vision,text' \
    --mesh_dim='!1,-1,2,2' \
    --dtype='bf16' \
    --total_steps=200 \
    --log_freq=1 \
    --save_milestone_freq=10 \
    --load_llama_config='debug' \
    --update_llama_config="dict(theta=50000000,max_sequence_length=32768,scan_attention=True,scan_query_chunk_size=512,scan_key_chunk_size=512,scan_mlp=True,scan_mlp_chunk_size=1024,scan_layers=True)" \
    --tokenizer="${TOKENIZER:-LargeWorldModel/LWM-Text-1M}" \
    --optimizer.type='adamw' \
    --optimizer.adamw_optimizer.lr=8e-5 \
    --optimizer.adamw_optimizer.end_lr=8e-5 \
    --optimizer.adamw_optimizer.lr_warmup_steps=5 \
    --optimizer.adamw_optimizer.lr_decay_steps=200 \
    --train_dataset.type='json_vision' \
    --train_dataset.vision_text_processor.fields_from_example='fields' \
    --train_dataset.json_vision_dataset.path="${DATASET:-}" \
    --train_dataset.json_vision_dataset.seq_length=32768 \
    --train_dataset.json_vision_dataset.batch_size=16 \
    --train_dataset.json_vision_dataset.mode='no_pad' \
    --checkpointer.save_optimizer_state=True \
    --logger.output_dir="${OUTPUT_DIR:-/tmp/lwm_tpu}"
