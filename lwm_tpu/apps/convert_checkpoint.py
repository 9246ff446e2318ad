"""Checkpoint conversion CLI.

Directions:
  hf_to_streaming:  HF torch LlamaForCausalLM dir → lwm_tpu streaming
                    checkpoint (loadable via `params::PATH`)
  streaming_to_hf:  lwm_tpu streaming params → HF torch model dir
  unscan / rescan:  flip the scanned-layer stacking of a streaming ckpt

Examples:
  python -m lwm_tpu.apps.convert_checkpoint --direction=hf_to_streaming \\
      --hf_path=LargeWorldModel/LWM-Text-1M --output=/ckpt/streaming_params \\
      --llama_config=7b --scan_layers=True
"""

from __future__ import annotations

import numpy as np
from absl.app import run

from lwm_tpu.checkpoint import StreamingCheckpointer
from lwm_tpu.models.llama import LLaMAConfig
from lwm_tpu.utils import define_flags_with_default
from lwm_tpu.utils.checkpoint_convert import (
    flax_to_torch_llama,
    scan_params,
    torch_llama_to_flax,
    unscan_params,
)

FLAGS, FLAGS_DEF = define_flags_with_default(
    direction="hf_to_streaming",
    hf_path="",
    streaming_path="",
    output="",
    llama_config="7b",
    update_llama_config="",
    scan_layers=True,
    param_scan_axis=0,
    float_dtype="fp32",
)


def main(argv):
    assert FLAGS.output != ""
    config = LLaMAConfig.load_config(FLAGS.llama_config)
    if FLAGS.update_llama_config:
        config.update(dict(eval(FLAGS.update_llama_config)))
    config.update(
        dict(scan_layers=FLAGS.scan_layers, param_scan_axis=FLAGS.param_scan_axis)
    )

    if FLAGS.direction == "hf_to_streaming":
        import torch
        from transformers import LlamaForCausalLM

        model = LlamaForCausalLM.from_pretrained(
            FLAGS.hf_path, torch_dtype=torch.float32
        )
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = torch_llama_to_flax(sd, config)
        StreamingCheckpointer.save_train_state_to_file(
            params, FLAGS.output, float_dtype=FLAGS.float_dtype
        )
        print(f"wrote streaming params to {FLAGS.output}")
    elif FLAGS.direction == "streaming_to_hf":
        import torch
        from transformers import LlamaConfig as HFLlamaConfig
        from transformers import LlamaForCausalLM

        params = StreamingCheckpointer.load_checkpoint(FLAGS.streaming_path)
        sd = flax_to_torch_llama(params, config)
        hf_config = HFLlamaConfig(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            num_key_value_heads=(
                getattr(config, "num_key_value_heads", None)
                or config.num_attention_heads
            ),
            max_position_embeddings=config.max_sequence_length,
            rms_norm_eps=config.rms_norm_eps,
            rope_theta=float(config.theta),
            attention_bias=False,
            tie_word_embeddings=False,
        )
        model = LlamaForCausalLM(hf_config)
        model.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            strict=False,
        )
        model.save_pretrained(FLAGS.output)
        print(f"wrote HF model to {FLAGS.output}")
    elif FLAGS.direction in ("unscan", "rescan"):
        params = StreamingCheckpointer.load_checkpoint(FLAGS.streaming_path)
        if FLAGS.direction == "unscan":
            params = unscan_params(
                params, config.num_hidden_layers, scan_axis=FLAGS.param_scan_axis
            )
        else:
            params = scan_params(
                params, config.num_hidden_layers, scan_axis=FLAGS.param_scan_axis
            )
        StreamingCheckpointer.save_train_state_to_file(
            params, FLAGS.output, float_dtype=FLAGS.float_dtype
        )
        print(f"wrote converted params to {FLAGS.output}")
    else:
        raise ValueError(f"unknown direction: {FLAGS.direction}")


if __name__ == "__main__":
    run(main)
