"""Image/video question answering (reference lwm/vision_chat.py).

Reads an image or video, VQGAN-encodes frames (+EOF per frame, EOV on the
last), builds a left-padded prompt rounded up to a multiple of
``block_size = max(scan chunks) × sp`` so the ring/blockwise prefill tiles
evenly, and samples an answer. Video decode uses OpenCV (decord is a
reference-only dependency not present here; the frame-sampling contract —
uniform max_n_frames — is identical).

Run: python -m lwm_tpu.apps.vision_chat --prompt="..." --input_file=v.mp4 ...
"""

from __future__ import annotations

import math
from functools import cached_property

import numpy as np
from absl.app import run
from PIL import Image
from tqdm import tqdm
from transformers import AutoTokenizer, GenerationConfig

import jax
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
    prompt="",
    input_file="",
    vqgan_checkpoint="",
    temperature=0.2,
    max_n_frames=8,
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


def read_video_frames(path, max_n_frames):
    """Uniformly sample up to max_n_frames RGB frames with OpenCV."""
    import cv2

    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if n <= 0:
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame)
        n = len(frames)
        if n == 0:
            raise ValueError(f"no frames decoded from {path}")
        idxs = (
            list(range(n))
            if n <= max_n_frames
            else np.linspace(0, n - 1, max_n_frames, dtype=int).tolist()
        )
        out = [cv2.cvtColor(frames[i], cv2.COLOR_BGR2RGB) for i in idxs]
    else:
        idxs = (
            list(range(n))
            if n <= max_n_frames
            else np.linspace(0, n - 1, max_n_frames, dtype=int).tolist()
        )
        out = []
        for i in idxs:
            cap.set(cv2.CAP_PROP_POS_FRAMES, i)
            ok, frame = cap.read()
            if not ok:
                continue
            out.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return np.stack(out)


def center_crop_resize(image: Image.Image, size: int) -> np.ndarray:
    """Short-side resize + center crop → [-1, 1] float array
    (reference vision_chat.py:59-74)."""
    width, height = image.size
    if width < height:
        new_width, new_height = size, int(size * height / width)
    else:
        new_width, new_height = int(size * width / height), size
    image = image.resize((new_width, new_height))
    left = (new_width - size) / 2
    top = (new_height - size) / 2
    image = image.crop((left, top, left + size, top + size))
    return np.array(image, dtype=np.float32) / 127.5 - 1


class Sampler:
    def __init__(self, flags=None):
        self.flags = flags or FLAGS
        self.mesh = VideoLLaMAConfig.get_jax_mesh(self.flags.mesh_dim)
        self.vqgan = VQGAN(self.flags.vqgan_checkpoint, replicate=False)
        self.prefix_tokenizer = AutoTokenizer.from_pretrained(
            self.flags.tokenizer, truncation_side="left", padding_side="left"
        )
        self.tokenizer = AutoTokenizer.from_pretrained(self.flags.tokenizer)
        self.n_tokens_per_frame = 257
        self.min_buffer_size = 256
        self.sharded_rng = next_rng()
        self._load_model()

    @property
    def block_size(self):
        return (
            max(self.config.scan_query_chunk_size, self.config.scan_key_chunk_size)
            * self.mesh.shape["sp"]
        )

    def _load_model(self):
        self.config = resolve_model_config(
            VideoLLaMAConfig, self.flags, self.tokenizer
        )
        self.params, self.model_ps = load_sharded_params(
            VideoLLaMAConfig, self.config, self.flags.load_checkpoint,
            self.mesh, self.flags.dtype,
        )
        self.model = FlaxVideoLLaMAForCausalLM(
            self.config,
            input_shape=(512, self.block_size),
            seed=self.flags.seed,
            _do_init=False,
            dtype=get_float_dtype_by_name(self.flags.dtype),
        )

    def _encode_vision(self, path, max_n_frames):
        """VQGAN-encode an image or video into the token stream with EOF per
        frame and EOV on the last frame."""
        if path.endswith((".png", ".jpg", ".jpeg")):
            image = Image.open(path).convert("RGB")
            frames = center_crop_resize(image, 256)[None]
        else:
            video = read_video_frames(path, max_n_frames)
            frames = np.stack(
                [center_crop_resize(Image.fromarray(f), 256) for f in video]
            )
        codes = jax.device_get(self.vqgan.encode(frames))[1].astype(int)
        tokens = []
        for t in range(len(codes)):
            tokens.extend(codes[t].reshape(-1).tolist())
            tokens.append(8193 if t == len(codes) - 1 else 8192)
        return tokens

    def construct_input(self, prompts, max_n_frames):
        """Left-padded prompt to a block_size multiple
        (reference vision_chat.py:110-145)."""
        max_input_length = (
            max_n_frames * self.n_tokens_per_frame + self.min_buffer_size
        )
        max_input_length = int(
            math.ceil(max_input_length / self.block_size) * self.block_size
        )
        vision_start = self.tokenizer.encode("<vision>")
        vision_end = self.tokenizer.encode("</vision>")

        input_ids = np.zeros((len(prompts), max_input_length), dtype=int)
        vision_masks = np.zeros((len(prompts), max_input_length), dtype=bool)
        attention_mask = np.zeros((len(prompts), max_input_length), dtype=int)
        for i, prompt in enumerate(tqdm(prompts)):
            vision = self._encode_vision(prompt["input_path"], max_n_frames)
            head = self.tokenizer.encode(
                f"<s>You are a helpful assistant. USER: {prompt['question']}\n"
            )
            tail = self.tokenizer.encode(" ASSISTANT:")
            tokens = head + vision_start + vision + vision_end + tail
            vm = (
                [False] * len(head)
                + [False] * len(vision_start)
                + [True] * len(vision)
                + [False] * len(vision_end)
                + [False] * len(tail)
            )
            assert len(tokens) < max_input_length, (len(tokens), max_input_length)
            input_ids[i, -len(tokens):] = tokens
            vision_masks[i, -len(tokens):] = vm
            attention_mask[i, -len(tokens):] = 1
        return dict(
            input_ids=input_ids,
            vision_masks=vision_masks,
            attention_mask=attention_mask,
        )

    @cached_property
    def _forward_generate(self):
        def fn(params, rng, batch):
            batch = with_sharding_constraint(batch, PS(("dp", "fsdp"), "sp"))
            rng_generator = JaxRNG(rng)
            output = self.model.generate(
                batch["input_ids"],
                vision_masks=batch["vision_masks"],
                attention_mask=batch["attention_mask"],
                params=params["params"],
                prng_key=rng_generator(),
                generation_config=GenerationConfig(
                    max_new_tokens=self.block_size,
                    pad_token_id=self.tokenizer.pad_token_id,
                    eos_token_id=self.tokenizer.eos_token_id,
                    temperature=self.flags.temperature,
                    do_sample=True,
                ),
            ).sequences[:, batch["input_ids"].shape[1]:]
            return output, rng_generator()

        replicated = specs_to_shardings(PS(), self.mesh)
        return jax.jit(
            fn,
            in_shardings=(
                specs_to_shardings(self.model_ps, self.mesh),
                replicated,
                replicated,
            ),
            out_shardings=(replicated, replicated),
        )

    def __call__(self, prompts, max_n_frames):
        batch = self.construct_input(prompts, max_n_frames)
        with self.mesh:
            output, self.sharded_rng = self._forward_generate(
                self.params, self.sharded_rng, batch
            )
            output = jax.device_get(output)
        output_text = []
        for text in self.tokenizer.batch_decode(output, skip_special_tokens=True):
            if self.tokenizer.eos_token in text:
                text = text.split(self.tokenizer.eos_token, maxsplit=1)[0]
            output_text.append(text)
        return output_text


def main(argv):
    assert FLAGS.prompt != ""
    assert FLAGS.input_file != ""
    DistributedConfig.initialize(FLAGS.jax_distributed)
    set_random_seed(FLAGS.seed)
    prompts = [{"input_path": FLAGS.input_file, "question": FLAGS.prompt}]
    sampler = Sampler()
    output = sampler(prompts, FLAGS.max_n_frames)[0]
    print(f"Question: {FLAGS.prompt}\nAnswer: {output}")


if __name__ == "__main__":
    run(main)
