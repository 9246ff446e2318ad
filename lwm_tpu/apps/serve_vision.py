"""Video/image QA serving: ingest the video ONCE, answer many questions.

The reference's chat app (lwm/vision_chat.py) re-prefills the full
video for every question. Here the video is the SHARED PREFIX: VQGAN
codes (+EOF/EOV framing, vision-masked) are prefilled once into a
frozen KV block, and a stream of text questions serves through the
in-flight pool (lwm_tpu/serve.py) — admission is O(question), the
video KV is stored once for the whole pool, and `--lookup_k` adds
draft-free speculation for quoting answers. Beyond-reference.

Prompt layout (prefix-first so the video can be shared):
  prefix : "<s>You are a helpful assistant. <vision>{codes}</vision>"
  request: "USER: {question}\n ASSISTANT:" → decode until EOS/budget

Input: `--input_file` (mp4/png/jpg via VQGAN, needs
`--vqgan_checkpoint`) or `--input_codes_file` (pre-tokenized VQ codes,
one JSON list per frame line — the vision data pipeline's format).
Questions: `--questions_file` JSONL ({"question": ..., optional
"max_new_tokens"/"temperature"}) or interactive stdin.

Run: python -m lwm_tpu.apps.serve_vision --load_checkpoint='params::...'
  --tokenizer=... --input_file=video.mp4 --vqgan_checkpoint=... \
  --questions_file=qs.jsonl [--lookup_k=7]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from absl.app import run

from lwm_tpu.checkpoint import StreamingCheckpointer
from lwm_tpu.models.vision_llama import (
    FlaxVideoLLaMAForCausalLM,
    VideoLLaMAConfig,
)
from lwm_tpu.serve import InflightServer
from lwm_tpu.utils import (
    define_flags_with_default,
    get_float_dtype_by_name,
    set_random_seed,
)
from lwm_tpu.utils.io import open_file

FLAGS, FLAGS_DEF = define_flags_with_default(
    input_file="",        # video/image → VQGAN (needs vqgan_checkpoint)
    input_codes_file="",  # pre-tokenized VQ codes (JSON list per frame)
    vqgan_checkpoint="",
    questions_file="",    # JSONL questions; empty = interactive stdin
    output_file="answers.jsonl",
    system_prompt="You are a helpful assistant. ",
    slots=4,
    cache_len=1024,
    prompt_buckets="64,128,256",
    max_new_tokens=256,
    temperature=0.0,
    lookup_k=0,
    lookup_ngram=3,
    admit_chunk=0,
    max_n_frames=8,
    prefix_chunk=2048,
    prefix_cache="",  # persist/reuse the built video KV block (loads if
                      # the path exists, else builds and saves)
    jax_platform="",
    seed=0,
    dtype="bf16",
    load_llama_config="",
    update_llama_config="",
    load_checkpoint="",
    tokenizer="LargeWorldModel/LWM-Text-1M",
    llama=VideoLLaMAConfig.get_default_config(),
)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def encode_video_tokens():
    """The video/image as VQ codes with EOF per frame / EOV on the last."""
    if FLAGS.input_codes_file:
        frames = []
        with open_file(FLAGS.input_codes_file, "r") as f:
            for line in f:
                if line.strip():
                    frames.append(np.asarray(json.loads(line), np.int32))
    else:
        from PIL import Image

        from lwm_tpu.apps.vision_chat import (
            center_crop_resize,
            read_video_frames,
        )
        from lwm_tpu.models.vqgan import VQGAN

        vqgan = VQGAN(FLAGS.vqgan_checkpoint, replicate=False)
        if FLAGS.input_file.endswith((".png", ".jpg", ".jpeg")):
            imgs = center_crop_resize(
                Image.open(FLAGS.input_file).convert("RGB"), 256
            )[None]
        else:
            video = read_video_frames(FLAGS.input_file, FLAGS.max_n_frames)
            imgs = np.stack(
                [center_crop_resize(Image.fromarray(f), 256) for f in video]
            )
        frames = list(jax.device_get(vqgan.encode(imgs))[1].astype(np.int32))
    tokens = []
    for t, codes in enumerate(frames):
        tokens.extend(np.asarray(codes).reshape(-1).tolist())
        tokens.append(8193 if t == len(frames) - 1 else 8192)
    return tokens


def load_model(enc):
    if FLAGS.load_llama_config != "":
        config = VideoLLaMAConfig.load_config(FLAGS.load_llama_config)
    else:
        config = VideoLLaMAConfig(**FLAGS.llama)
    if FLAGS.update_llama_config != "":
        config.update(dict(eval(FLAGS.update_llama_config)))
    config.update(dict(
        bos_token_id=enc.bos_token_id, eos_token_id=enc.eos_token_id,
        mesh_dim=None, decode_index="per_row", sample_mode="text",
    ))
    dtype = get_float_dtype_by_name(FLAGS.dtype)
    with jax.default_device(jax.devices("cpu")[0]):
        _, params = StreamingCheckpointer.load_trainstate_checkpoint(
            FLAGS.load_checkpoint, disallow_trainstate=True
        )
    params = params["params"] if "params" in params else params
    if config.scan_layers:
        from lwm_tpu.utils.checkpoint_convert import unscan_params

        log("unscanning stacked layers for serving...")
        params = unscan_params(
            params, config.num_hidden_layers, scan_axis=config.param_scan_axis
        )
        config.update(dict(scan_layers=False))
    params = jax.tree.map(
        lambda x: jnp.asarray(x, dtype) if jnp.issubdtype(
            jnp.asarray(x).dtype, jnp.floating) else jnp.asarray(x),
        params,
    )
    model = FlaxVideoLLaMAForCausalLM(
        config, input_shape=(1, 16), seed=FLAGS.seed, dtype=dtype,
        _do_init=False,
    )
    return model, params


def main(argv):
    if FLAGS.jax_platform:
        jax.config.update("jax_platforms", FLAGS.jax_platform)
    set_random_seed(FLAGS.seed)
    from transformers import AutoTokenizer

    enc = AutoTokenizer.from_pretrained(FLAGS.tokenizer)
    model, params = load_model(enc)

    log("encoding video...")
    vision = encode_video_tokens()
    head = enc.encode(f"<s>{FLAGS.system_prompt}")
    vstart = enc.encode("<vision>", add_special_tokens=False)
    vend = enc.encode("</vision>", add_special_tokens=False)
    prefix_ids = head + vstart + vision + vend
    prefix_vm = (
        [False] * (len(head) + len(vstart))
        + [True] * len(vision)
        + [False] * len(vend)
    )
    log(f"shared video prefix: {len(prefix_ids)} tokens "
        f"({len(vision)} vision); prefilling once...")

    buckets = tuple(int(b) for b in FLAGS.prompt_buckets.split(","))
    stop = tuple(t for t in (enc.eos_token_id,) if t is not None)
    srv = InflightServer(
        model, params, slots=FLAGS.slots, cache_len=FLAGS.cache_len,
        prompt_buckets=buckets, stop_tokens=stop, seed=FLAGS.seed,
        prefix_ids=prefix_ids, prefix_vision_masks=prefix_vm,
        prefix_chunk=FLAGS.prefix_chunk, prefix_cache_path=FLAGS.prefix_cache,
        lookup_k=FLAGS.lookup_k, lookup_ngram=FLAGS.lookup_ngram,
        admit_chunk=FLAGS.admit_chunk,
    )

    def encode_q(q):
        ids = enc.encode(f"USER: {q}\n ASSISTANT:", add_special_tokens=False)
        return [t for t in ids if t != enc.bos_token_id]

    if FLAGS.questions_file == "":
        log("interactive mode — one question per line (EOF to quit)")
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            srv.submit(encode_q(line), FLAGS.max_new_tokens, FLAGS.temperature)
            fin = srv.run()[-1]
            print(enc.decode(fin.tokens, skip_special_tokens=True), flush=True)
        return

    questions = {}
    with open_file(FLAGS.questions_file, "r") as f:
        for line in f:
            if not line.strip():
                continue
            req = json.loads(line)
            rid = srv.submit(
                encode_q(req["question"]),
                int(req.get("max_new_tokens", FLAGS.max_new_tokens)),
                float(req.get("temperature", FLAGS.temperature)),
            )
            questions[rid] = req["question"]
    log(f"{len(questions)} questions queued over {FLAGS.slots} slots")

    t0 = time.perf_counter()
    n_tokens = 0
    with open_file(FLAGS.output_file, "w") as out:
        while srv.queue or any(l is not None for l in srv.live):
            for fin in srv.step():
                n_tokens += len(fin.tokens)
                out.write(json.dumps(dict(
                    id=fin.req_id,
                    question=questions[fin.req_id],
                    answer=enc.decode(fin.tokens, skip_special_tokens=True),
                    stopped=fin.stopped,
                    n_tokens=len(fin.tokens),
                )) + "\n")
    dt = time.perf_counter() - t0
    log(
        f"answered {len(questions)} questions / {n_tokens} tokens in "
        f"{dt:.1f}s ({n_tokens / dt:.1f} tok/s) → {FLAGS.output_file}"
    )
    log(srv.stats_line())


if __name__ == "__main__":
    run(main)
