"""Text → image / video generation (reference lwm/vision_generation.py).

Two-phase sampling: frame 1 (257 tokens) with the image CFG/top-k/temp
knobs, then frames 2..N autoregressively with the video knobs. CFG runs
cond+uncond (`"<s><vision>"`) as one doubled batch. VQGAN decodes the
256-code frames to pixels; PNG via PIL or MP4 via imageio at 4 fps.

Run: python -m lwm_tpu.apps.vision_generation --prompt=... --output_file=out.png ...
"""

from __future__ import annotations

import numpy as np
from absl.app import run
from tqdm import tqdm
from transformers import AutoTokenizer, GenerationConfig

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as PS

from lwm_tpu.apps.loading import load_sharded_params, resolve_model_config
from lwm_tpu.models.vision_llama import FlaxVideoLLaMAForCausalLM, VideoLLaMAConfig
from lwm_tpu.models.vqgan import VQGAN
from lwm_tpu.parallel.mesh import DistributedConfig
from lwm_tpu.parallel.partition import specs_to_shardings, with_sharding_constraint
from lwm_tpu.utils import (
    JaxRNG,
    define_flags_with_default,
    get_float_dtype_by_name,
    next_rng,
    set_random_seed,
)

FLAGS, FLAGS_DEF = define_flags_with_default(
    prompt="Fireworks over the city",
    output_file="",
    temperature_image=1.0,
    temperature_video=1.0,
    top_k_image=8192,
    top_k_video=100,
    cfg_scale_image=1.0,
    cfg_scale_video=1.0,
    vqgan_checkpoint="",
    n_frames=1,
    seed=1234,
    mesh_dim="1,-1,1,1",
    dtype="fp32",
    load_llama_config="",
    update_llama_config="",
    load_checkpoint="",
    tokenizer="LargeWorldModel/LWM-Text-1M",
    llama=VideoLLaMAConfig.get_default_config(),
    jax_distributed=DistributedConfig.get_default_config(),
)

TOKENS_PER_FRAME = 257  # 256 VQ codes + EOF/EOV


def main(argv):
    assert FLAGS.output_file != ""
    if FLAGS.output_file.endswith("mp4"):
        assert FLAGS.n_frames > 1
    elif FLAGS.output_file.endswith(("png", "jpg")):
        assert FLAGS.n_frames == 1
    else:
        raise ValueError(f"unsupported output extension: {FLAGS.output_file}")

    DistributedConfig.initialize(FLAGS.jax_distributed)
    set_random_seed(FLAGS.seed)

    vqgan = VQGAN(FLAGS.vqgan_checkpoint, replicate=False)
    mesh = VideoLLaMAConfig.get_jax_mesh(FLAGS.mesh_dim)
    tokenizer = AutoTokenizer.from_pretrained(FLAGS.tokenizer)
    prefix_tokenizer = AutoTokenizer.from_pretrained(
        FLAGS.tokenizer, truncation_side="left", padding_side="left"
    )
    llama_config = resolve_model_config(VideoLLaMAConfig, FLAGS, tokenizer)
    params, model_ps = load_sharded_params(
        VideoLLaMAConfig, llama_config, FLAGS.load_checkpoint, mesh, FLAGS.dtype
    )
    model = FlaxVideoLLaMAForCausalLM(
        llama_config,
        input_shape=(512, 8192),
        seed=FLAGS.seed,
        _do_init=False,
        dtype=get_float_dtype_by_name(FLAGS.dtype),
    )

    def _forward_generate(params, rng, batch, n_tokens, cfg_scale, top_k, temperature):
        batch = with_sharding_constraint(batch, PS(("dp", "fsdp"), "sp"))
        cfg_scales = (
            jnp.ones((batch["input_ids"].shape[0] // 2,), jnp.float32) * cfg_scale
        )
        rng_generator = JaxRNG(rng)
        output = model.generate_vision(
            batch["input_ids"],
            cfg_scales,
            attention_mask=batch["attention_mask"],
            vision_masks=batch["vision_masks"],
            params=params["params"],
            prng_key=rng_generator(),
            generation_config=GenerationConfig(
                max_new_tokens=n_tokens,
                min_new_tokens=n_tokens,
                pad_token_id=tokenizer.pad_token_id,
                temperature=temperature,
                do_sample=True,
                top_k=top_k,
            ),
        ).sequences[:, batch["input_ids"].shape[1]:]
        return output, rng_generator()

    replicated = specs_to_shardings(PS(), mesh)
    _sharded_forward_generate = jax.jit(
        _forward_generate,
        in_shardings=(specs_to_shardings(model_ps, mesh), replicated, replicated),
        out_shardings=(replicated, replicated),
        static_argnums=(3, 4, 5, 6),
    )

    state = {"rng": next_rng()}

    def generate_frames(prompts, vision_prefix, n_tokens, cfg, top_k, temp,
                        max_input_length=128):
        """One CFG batch: [cond prompts; uncond "<s><vision>"], optional
        vision prefix codes appended to both halves."""
        uncond_prompts = ["<s><vision>"] * len(prompts)
        inputs = prefix_tokenizer(
            prompts + uncond_prompts,
            padding="max_length",
            truncation=True,
            max_length=max_input_length,
            return_tensors="np",
        )
        input_ids = inputs.input_ids
        attention_mask = inputs.attention_mask
        vision_masks = np.zeros(input_ids.shape, dtype=bool)
        if vision_prefix is not None:
            prefix2 = np.concatenate([vision_prefix, vision_prefix], axis=0)
            input_ids = np.concatenate([input_ids, prefix2], axis=1)
            attention_mask = np.concatenate(
                [attention_mask, np.ones(prefix2.shape, attention_mask.dtype)], axis=1
            )
            vision_masks = np.concatenate(
                [vision_masks, np.ones(prefix2.shape, bool)], axis=1
            )
        batch = dict(
            input_ids=input_ids,
            attention_mask=attention_mask,
            vision_masks=vision_masks,
        )
        with mesh:
            output, state["rng"] = _sharded_forward_generate(
                params, state["rng"], batch, n_tokens, cfg, top_k, temp
            )
        output = jax.device_get(output)
        return np.split(output, 2, axis=0)[0]  # cond half

    prompts = [FLAGS.prompt]
    image_prompts = [
        f"<s>You are a helpful assistant. USER: Generate an image of {p} "
        f"ASSISTANT: <vision>"
        for p in prompts
    ]
    first = generate_frames(
        image_prompts, None, TOKENS_PER_FRAME,
        FLAGS.cfg_scale_image, FLAGS.top_k_image, FLAGS.temperature_image,
    ).reshape(len(prompts), TOKENS_PER_FRAME)

    if FLAGS.n_frames == 1:
        from PIL import Image

        image = vqgan.decode(first[:, :-1].reshape(-1, 16, 16))
        image = ((jax.device_get(image) + 1) * 127.5).astype(np.uint8)
        Image.fromarray(image[0]).save(FLAGS.output_file)
        print("done")
        return

    video_prompts = [
        f"<s>You are a helpful assistant. USER: Generate a video of {p} "
        f"ASSISTANT: <vision>"
        for p in prompts
    ]
    rest = generate_frames(
        video_prompts, first.astype(np.int32),
        (FLAGS.n_frames - 1) * TOKENS_PER_FRAME,
        FLAGS.cfg_scale_video, FLAGS.top_k_video, FLAGS.temperature_video,
    ).reshape(len(prompts), FLAGS.n_frames - 1, TOKENS_PER_FRAME)
    frames = np.concatenate([first[:, None], rest], axis=1)
    codes = frames[:, :, :-1].reshape(-1, FLAGS.n_frames, 16, 16)

    for v in codes:
        pixels = vqgan.decode(v)
        pixels = ((jax.device_get(pixels) + 1) * 127.5).astype(np.uint8)
        write_video(FLAGS.output_file, pixels, fps=4)
    print("done")


def write_video(path, frames, fps=4):
    """MP4 writer: imageio+ffmpeg when available, else OpenCV."""
    try:
        import imageio

        writer = imageio.get_writer(path, fps=fps)
        for frame in frames:
            writer.append_data(frame)
        writer.close()
    except Exception:
        import cv2

        h, w = frames[0].shape[:2]
        out = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        for frame in frames:
            out.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        out.release()


if __name__ == "__main__":
    run(main)
