"""Vision-needle retrieval eval: fresh long synthetic videos (noise
frames + ONE learnable pattern frame at a controlled depth), scored by
whether the model NAMES the pattern after the video — retrieval accuracy
over a context-length × depth grid, the vision analogue of
apps/eval_needle.py (reference scripts/eval_needle.py harness shape;
vision-language long-context claim, reference README.md:86-88).

Contexts are generated on the fly (seeded, disjoint from training
seeds) and rebuilt through VisionTextProcessor so the token layout is
exactly the training layout. Results are written incrementally and are
resumable by key, like the text needle harness.

Usage:
  python -m lwm_tpu.apps.eval_vision_needle \
      --checkpoint <streaming_params> --tokenizer tests/fixtures/tokenizer \
      --update_llama_config "dict(hidden_size=384,...)" \
      --n_frames 32,64,128 --depths 0,25,50,75,100 --rounds 2 \
      --output /tmp/vneedle/results.json
"""

from __future__ import annotations

import argparse
import json
import os
import random


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--update_llama_config", default="")
    p.add_argument("--n_patterns", type=int, default=12)
    p.add_argument("--n_codes", type=int, default=8192)
    p.add_argument("--n_per_frame", type=int, default=256)
    p.add_argument("--n_frames", default="32,64,128")
    p.add_argument("--depths", default="0,25,50,75,100")
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--seed", type=int, default=20260820)
    # char-level fixture tokenizer: " eleven" + eos is 8 tokens — the
    # budget must cover the LONGEST class name or long names auto-miss
    p.add_argument("--max_new_tokens", type=int, default=10)
    p.add_argument("--pad_multiple", type=int, default=256)
    p.add_argument("--output", required=True)
    p.add_argument("--platform", default="default",
                   choices=["cpu", "tpu", "default"])
    args = p.parse_args()

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np
    from transformers import AutoTokenizer, GenerationConfig

    from lwm_tpu.apps.create_vision_needle_data import build_example
    from lwm_tpu.apps.create_vision_train_data import _NAMES
    from lwm_tpu.checkpoint import StreamingCheckpointer
    from lwm_tpu.data.vision import VisionTextProcessor
    from lwm_tpu.models.vision_llama import (
        FlaxVideoLLaMAForCausalLM, VideoLLaMAConfig,
    )

    enc = AutoTokenizer.from_pretrained(args.tokenizer)
    proc = VisionTextProcessor(
        VisionTextProcessor.get_default_config(
            dict(fields_from_example="fields",
                 n_tokens_per_frame=args.n_per_frame)
        ),
        enc,
    )

    cfg = VideoLLaMAConfig(mesh_dim=None, sample_mode="text")
    if args.update_llama_config:
        cfg.update(dict(eval(args.update_llama_config)))
    # answers are text; prefill must ride the flash prefill-over-cache
    # kernel (scan_attention=False dispatches _inference_attn at q>1).
    # remat off: useless at inference, and the remat closed_call trips a
    # jax MLIR lowering-cache KeyError at 33K-token prompts.
    cfg.update(dict(mesh_dim=None, sample_mode="text",
                    scan_attention=False, remat_block="none"))
    params = StreamingCheckpointer.load_checkpoint(args.checkpoint)
    if "params" in params:
        params = params["params"]

    model = FlaxVideoLLaMAForCausalLM(
        cfg, input_shape=(1, 8), seed=0, _do_init=False, dtype=jnp.float32
    )
    params = jax.device_put(params)

    # AOT-compile one greedy-generate program per padded prompt length:
    # on the axon TPU tunnel the plain jit dispatch of this program dies
    # with an opaque runtime UNIMPLEMENTED, while the SAME lowered
    # executable runs fine through the AOT path (lower().compile() then
    # call) — and AOT is what we want anyway (one compile per length).
    from transformers import GenerationConfig

    gen_cfg = GenerationConfig(
        max_new_tokens=args.max_new_tokens, do_sample=False,
        pad_token_id=0, eos_token_id=enc.eos_token_id,
    )

    def _gen(params_, ids_, vm_, am_):
        return model.generate(
            ids_, vision_masks=vm_, attention_mask=am_, params=params_,
            generation_config=gen_cfg,
        ).sequences

    exe_cache = {}

    def run_generate(ids_, vm_, am_):
        L_ = ids_.shape[1]
        if L_ not in exe_cache:
            exe_cache[L_] = jax.jit(_gen).lower(
                params, ids_, vm_, am_
            ).compile()
        return exe_cache[L_](params, ids_, vm_, am_)

    results = {}
    if os.path.exists(args.output):
        with open(args.output) as f:
            results = json.load(f)

    frames_list = [int(x) for x in args.n_frames.split(",")]
    depths = [int(x) for x in args.depths.split(",")]
    n_correct = n_total = 0
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)

    for F in frames_list:
        for depth in depths:
            for rnd in range(args.rounds):
                key = f"frames{F}_depth{depth}_round{rnd}"
                if key in results:
                    n_total += 1
                    n_correct += int(results[key]["correct"])
                    continue
                rng = random.Random(
                    (args.seed, F, depth, rnd).__hash__() & 0x7FFFFFFF
                )
                cls = rng.randrange(args.n_patterns)
                needle_pos = round(depth / 100 * (F - 1))
                ex = build_example(rng, F, needle_pos, cls, args.n_codes,
                                   args.n_per_frame)
                tokens, masks, vision, _ = proc(ex)
                # the prompt ends where the loss-trained answer begins
                ans_start = next(
                    i for i, m in enumerate(masks) if m > 0
                )
                prompt = tokens[:ans_start]
                vm = vision[:ans_start]
                # left-pad to a fixed multiple: one compiled prefill per
                # context length, and q stays kernel-aligned
                L = -(-len(prompt) // args.pad_multiple) * args.pad_multiple
                ids = np.zeros((1, L), np.int32)
                vmask = np.zeros((1, L), bool)
                amask = np.zeros((1, L), np.int32)
                ids[0, -len(prompt):] = prompt
                vmask[0, -len(prompt):] = vm
                amask[0, -len(prompt):] = 1
                out = run_generate(
                    jnp.asarray(ids), jnp.asarray(vmask), jnp.asarray(amask)
                )
                gen = np.asarray(out)[0, L:]
                text = enc.decode(gen, skip_special_tokens=True)
                want = _NAMES[cls]
                correct = want in text.split()
                results[key] = {
                    "n_frames": F,
                    "vision_tokens": F * (args.n_per_frame + 1),
                    "depth_pct": depth,
                    "round": rnd,
                    "target": want,
                    "answer": text.strip(),
                    "correct": bool(correct),
                }
                n_total += 1
                n_correct += int(correct)
                with open(args.output, "w") as f:
                    json.dump(results, f, indent=1)
                print(
                    f"{key}: target={want!r} answer={text.strip()!r} "
                    f"{'OK' if correct else 'MISS'}  "
                    f"({n_correct}/{n_total} so far)",
                    flush=True,
                )

    print(f"total: {n_correct}/{n_total} = {n_correct / max(n_total, 1):.1%}")


if __name__ == "__main__":
    main()
