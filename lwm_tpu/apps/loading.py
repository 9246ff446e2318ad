"""Shared inference-app model loading: resolve the model config from flags,
stream the checkpoint onto CPU, then shard each leaf onto the mesh with a
dtype cast (reference pattern: vision_generation.py:85-104,
vision_chat.py:182-194, eval_needle.py:353-372)."""

from __future__ import annotations

import jax

from lwm_tpu.checkpoint import StreamingCheckpointer
from lwm_tpu.parallel import make_shard_and_gather_fns, match_partition_rules
from lwm_tpu.parallel.partition import tree_apply
from lwm_tpu.utils import get_float_dtype_by_name


def resolve_model_config(config_cls, flags, tokenizer=None):
    """Preset → scan-knob overlay → eval'd updates → forced token ids/mesh."""
    if flags.load_llama_config != "":
        llama_config = config_cls.load_config(flags.load_llama_config)
        updates = config_cls(**flags.llama)
        llama_config.update(
            dict(
                scan_attention=updates.scan_attention,
                scan_mlp=updates.scan_mlp,
                scan_query_chunk_size=updates.scan_query_chunk_size,
                scan_key_chunk_size=updates.scan_key_chunk_size,
                scan_mlp_chunk_size=updates.scan_mlp_chunk_size,
                scan_layers=updates.scan_layers,
                param_scan_axis=updates.param_scan_axis,
            )
        )
    else:
        llama_config = config_cls(**flags.llama)
    if flags.update_llama_config != "":
        llama_config.update(dict(eval(flags.update_llama_config)))
    if tokenizer is not None:
        llama_config.update(
            dict(
                bos_token_id=tokenizer.bos_token_id,
                eos_token_id=tokenizer.eos_token_id,
            )
        )
    llama_config.update(dict(mesh_dim=flags.mesh_dim))
    return llama_config


def load_sharded_params(
    config_cls, llama_config, load_checkpoint, mesh, dtype,
    unscan_for_serving=False,
):
    """Stream checkpoint to host, then place each leaf sharded on the mesh.
    Returns (params_pytree, partition_spec_tree).

    unscan_for_serving=True converts a scanned checkpoint (stacked [L, ...]
    weights) to the unscanned per-layer layout on the host and flips
    llama_config.scan_layers — decoding with scanned layers drags the full
    stacked KV cache through the per-layer loop (~3.7x slower serving,
    measured; see NOTES.md). Training should stay scanned."""
    dtype = get_float_dtype_by_name(dtype)
    with jax.default_device(jax.devices("cpu")[0]):
        _, params = StreamingCheckpointer.load_trainstate_checkpoint(
            load_checkpoint, disallow_trainstate=True, max_buffer_size=32 * 2**30
        )
    if unscan_for_serving and llama_config.scan_layers:
        from lwm_tpu.utils.checkpoint_convert import unscan_params

        params = {
            "params": unscan_params(
                params["params"],
                llama_config.num_hidden_layers,
                scan_axis=llama_config.param_scan_axis,
            )
        }
        llama_config.update(dict(scan_layers=False))
    model_ps = match_partition_rules(
        config_cls.get_partition_rules(
            llama_config.scan_layers, llama_config.param_scan_axis
        ),
        params,
    )
    # explicit NamedShardings: device_put moves host leaves straight to
    # their mesh placement (cast to inference dtype leaf-by-leaf)
    shard_fns, _ = make_shard_and_gather_fns(model_ps, mesh, dtype)
    params = tree_apply(shard_fns, params)
    return params, model_ps
