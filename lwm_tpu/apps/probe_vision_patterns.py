"""Score a pattern-trained VideoLLaMA checkpoint by GENERATING frames with
the CFG sampler and comparing tokens to the deterministic target pattern —
the vision analogue of probe_needle_digits: it validates the whole
text→vision generation path (vte/dual-head training → sample_mode='vision'
head selection → doubled-batch CFG loop → 257-token EOF framing) with a
learnable task rather than random weights.

Prompts are rebuilt through VisionTextProcessor so the probe's token layout
is exactly the training layout (bos + text + <vision> framing tokens).

Usage:
  python -m lwm_tpu.apps.probe_vision_patterns \
      --checkpoint <streaming_params> --tokenizer tests/fixtures/tokenizer \
      --update_llama_config "dict(hidden_size=384,...)" [--n_patterns 12]
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--update_llama_config", default="")
    p.add_argument("--n_patterns", type=int, default=12)
    p.add_argument("--cfg_scale", type=float, default=1.0)
    p.add_argument("--platform", default="default",
                   choices=["cpu", "tpu", "default"])
    args = p.parse_args()

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from transformers import AutoTokenizer, GenerationConfig

    from lwm_tpu.apps.create_vision_train_data import (
        _NAMES, PROMPT_TEMPLATE, pattern_frame,
    )
    from lwm_tpu.checkpoint import StreamingCheckpointer
    from lwm_tpu.data.vision import VisionTextProcessor
    from lwm_tpu.models.vision_llama import (
        FlaxVideoLLaMAForCausalLM, VideoLLaMAConfig,
    )

    enc = AutoTokenizer.from_pretrained(args.tokenizer)
    proc = VisionTextProcessor(
        VisionTextProcessor.get_default_config(
            dict(fields_from_example="fields")
        ),
        enc,
    )

    cfg = VideoLLaMAConfig(mesh_dim=None, scan_attention=False,
                           sample_mode="vision")
    if args.update_llama_config:
        cfg.update(dict(eval(args.update_llama_config)))
    cfg.update(dict(mesh_dim=None, scan_attention=False,
                    sample_mode="vision"))
    params = StreamingCheckpointer.load_checkpoint(args.checkpoint)
    # the HF wrapper's apply adds the {"params": ...} layer itself
    if "params" in params:
        params = params["params"]

    model = FlaxVideoLLaMAForCausalLM(
        cfg, input_shape=(2, 8), seed=0, _do_init=False, dtype=jnp.float32
    )

    code_hits = frame_hits = eof_hits = total_codes = 0
    for cls in range(args.n_patterns):
        target = pattern_frame(cls)
        example = {
            "fields": "[text],vision",
            "text": PROMPT_TEMPLATE.format(name=_NAMES[cls]),
            "vision": target,
        }
        tokens, _, vision, _ = proc(example)
        first_code = vision.index(True)
        prompt = np.asarray([tokens[:first_code]] * 2, np.int32)  # cond+uncond
        out = model.generate_vision(
            jnp.asarray(prompt),
            jnp.ones((1,), jnp.float32) * args.cfg_scale,
            vision_masks=jnp.zeros(prompt.shape, bool),
            attention_mask=jnp.ones(prompt.shape, jnp.int32),
            prng_key=jax.random.PRNGKey(cls),
            params=params,
            generation_config=GenerationConfig(
                max_new_tokens=257, min_new_tokens=257, do_sample=True,
                top_k=1, temperature=1.0, pad_token_id=0,
            ),
        )
        gen = np.asarray(out.sequences)[0, prompt.shape[1]:]
        hits = int((gen[:256] == np.asarray(target)).sum())
        code_hits += hits
        total_codes += 256
        frame_hits += hits == 256
        eof_hits += int(gen[256] == proc.config.eof_token)
        print(f"pattern {cls:2d} ({_NAMES[cls]}): {hits}/256 codes, "
              f"eof {'ok' if gen[256] == proc.config.eof_token else 'BAD'}")

    print(
        f"code acc {code_hits}/{total_codes} = {code_hits/total_codes:.2%}  "
        f"whole-frame {frame_hits}/{args.n_patterns} = "
        f"{frame_hits/args.n_patterns:.1%}  eof {eof_hits}/{args.n_patterns}"
    )


if __name__ == "__main__":
    main()
