"""Batch/interactive serving CLI over the in-flight batching server.

Loads a streamed checkpoint (scan→unscan for serving), optionally
quantizes the dense weights to int8, and serves prompts through
`lwm_tpu.serve.InflightServer` — requests are admitted into cache slots
the moment one frees, so a mixed batch of short answers and long
generations keeps the chip busy end to end (see docs/serving.md).

Input modes:
- `--input_file=requests.jsonl`: one JSON object per line with
  `prompt` (string) and optional `max_new_tokens` / `temperature`;
  completions stream to `--output_file` (JSONL: req id, prompt,
  completion, stop reason) in COMPLETION order, not submission order.
- no input_file: interactive — read one prompt per stdin line, print
  the completion.

Single-host serving path (the per-row decode write is not sp-routed):
the model runs unsharded on the default device; use the lockstep apps
for multi-chip sharded inference.

Run: python -m lwm_tpu.apps.serve --load_checkpoint='params::...' \
    --tokenizer=... --slots=8 --cache_len=4096 [--quantize_weights]

Reference parity note: the reference (LargeWorldModel/LWM) serves only
via batch generate inside its eval/chat scripts; this app is
beyond-reference (SURVEY.md §2 has no serving runtime entry).
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
from lwm_tpu.models.llama import FlaxLLaMAForCausalLM, LLaMAConfig
from lwm_tpu.serve import InflightServer
from lwm_tpu.utils import (
    define_flags_with_default,
    get_float_dtype_by_name,
    set_random_seed,
)
from lwm_tpu.utils.io import open_file

FLAGS, FLAGS_DEF = define_flags_with_default(
    input_file="",
    output_file="completions.jsonl",
    slots=8,
    cache_len=4096,
    prompt_buckets="256,1024,2048",
    max_new_tokens=256,
    temperature=0.0,
    quantize_weights=False,  # int8 weight quantization at load
    quant_dense="int8",  # impl spelling when --quantize_weights: 'int8'
                         # (auto → the XLA dequant-matmul, measured
                         # fastest: 1.29x bf16 decode), 'int8_xla'
                         # (forced XLA), 'int8_w8a8' (native int8 MXU —
                         # measured slower; accuracy caveat in
                         # ops/quant.py)
    prefix_file="",  # shared-prefix serving: a text file (the document /
                     # transcript every request asks about) prefilled ONCE
                     # into a frozen KV block; prompts are suffix-only and
                     # cache_len bounds only the suffix (docs/serving.md)
    prefix_chunk=2048,
    prefix_cache="",  # persist/reuse the built prefix KV block (a document
                      # index): loads it if the path exists, else builds
                      # from --prefix_file and saves here
    lookup_k=0,  # >0: in-flight prompt-lookup speculation — greedy slots
                 # verify k context-copied tokens per step (7 → q=8 rides
                 # the TPU prefill kernel); free on quoting workloads
    lookup_ngram=3,
    admit_chunk=0,  # >0: chunked admission — long prompts prefill this
                    # many tokens per step between decode rounds (running
                    # requests never stall longer than one chunk); prompts
                    # beyond the largest bucket are accepted in this mode
    mesh_dim="1,1,1,1",  # sharded serving: dp/fsdp/tp only (sp must be 1
                         # — per-row decode writes keep the cache's seq
                         # dim unsharded); e.g. '!1,1,-1,1' for tp
    jax_platform="",  # e.g. 'cpu' (the JAX_PLATFORMS env var is ignored
                      # under the axon TPU plugin; only the config works)
    seed=0,
    dtype="bf16",
    load_llama_config="",
    update_llama_config="",
    load_checkpoint="",
    tokenizer="LargeWorldModel/LWM-Text-1M",
    llama=LLaMAConfig.get_default_config(),
)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def load_model():
    from transformers import AutoTokenizer

    enc = AutoTokenizer.from_pretrained(FLAGS.tokenizer)
    if FLAGS.load_llama_config != "":
        config = LLaMAConfig.load_config(FLAGS.load_llama_config)
    else:
        config = LLaMAConfig(**FLAGS.llama)
    if FLAGS.update_llama_config != "":
        config.update(dict(eval(FLAGS.update_llama_config)))
    mesh = None
    mesh_dim = None
    if FLAGS.mesh_dim and FLAGS.mesh_dim.lstrip("!") not in ("1,1,1,1", ""):
        mesh = LLaMAConfig.get_jax_mesh(FLAGS.mesh_dim)
        if mesh.size == 1:
            mesh = None
        else:
            mesh_dim = FLAGS.mesh_dim
    config.update(dict(
        bos_token_id=enc.bos_token_id, eos_token_id=enc.eos_token_id,
        # in-flight serving: per-row decode writes (sharded over
        # dp/fsdp/tp when a mesh is given; sp stays 1)
        mesh_dim=mesh_dim, decode_index="per_row",
        max_sequence_length=max(config.max_sequence_length, FLAGS.cache_len),
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
    if FLAGS.quantize_weights:
        from lwm_tpu.ops.quant import quantize_params_int8

        log(f"quantizing dense weights to int8 ({FLAGS.quant_dense})...")
        with jax.default_device(jax.devices("cpu")[0]):
            params = quantize_params_int8(params)
        config.update(dict(quant_dense=FLAGS.quant_dense))

    if mesh is not None:
        from lwm_tpu.parallel import (
            make_shard_and_gather_fns,
            match_partition_rules,
        )
        from lwm_tpu.parallel.partition import tree_apply

        log(f"sharding params over mesh {dict(mesh.shape)}...")
        ps = match_partition_rules(
            LLaMAConfig.get_partition_rules(
                config.scan_layers, config.param_scan_axis
            ),
            params,
        )
        # int8 kernels pass through uncast (maybe_cast touches floats only)
        shard_fns, _ = make_shard_and_gather_fns(ps, mesh, dtype)
        params = tree_apply(shard_fns, params)

    model = FlaxLLaMAForCausalLM(
        config, input_shape=(1, 16), seed=FLAGS.seed, dtype=dtype,
        _do_init=False,
    )
    return model, params, enc, mesh


def main(argv):
    if FLAGS.jax_platform:
        jax.config.update("jax_platforms", FLAGS.jax_platform)
    set_random_seed(FLAGS.seed)
    model, params, enc, mesh = load_model()
    buckets = tuple(int(b) for b in FLAGS.prompt_buckets.split(","))
    stop = tuple(t for t in (enc.eos_token_id,) if t is not None)
    prefix_ids = None
    if FLAGS.prefix_file:
        with open_file(FLAGS.prefix_file, "r") as f:
            text = f.read()
        prefix_ids = enc.encode(text)
        if enc.bos_token_id is not None and (
            not prefix_ids or prefix_ids[0] != enc.bos_token_id
        ):
            prefix_ids = [enc.bos_token_id] + prefix_ids
        log(f"shared prefix: {len(prefix_ids)} tokens (prefilling once)")
    srv = InflightServer(
        model, params, slots=FLAGS.slots, cache_len=FLAGS.cache_len,
        prompt_buckets=buckets, stop_tokens=stop, seed=FLAGS.seed,
        mesh=mesh, prefix_ids=prefix_ids, prefix_chunk=FLAGS.prefix_chunk,
        prefix_cache_path=FLAGS.prefix_cache,
        lookup_k=FLAGS.lookup_k, lookup_ngram=FLAGS.lookup_ngram,
        admit_chunk=FLAGS.admit_chunk,
    )

    def encode(text):
        ids = enc.encode(text)
        if prefix_ids is not None:
            # prompts continue the shared prefix — the bos lives there
            return [t for t in ids if t != enc.bos_token_id]
        if enc.bos_token_id is not None and (
            not ids or ids[0] != enc.bos_token_id
        ):
            ids = [enc.bos_token_id] + ids
        return ids

    if FLAGS.input_file == "":
        log("interactive mode — one prompt per line (EOF to quit)")
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            srv.submit(encode(line), FLAGS.max_new_tokens, FLAGS.temperature)
            fin = srv.run()[-1]
            print(enc.decode(fin.tokens, skip_special_tokens=True), flush=True)
        return

    prompts = {}
    with open_file(FLAGS.input_file, "r") as f:
        for line in f:
            if not line.strip():
                continue
            req = json.loads(line)
            rid = srv.submit(
                encode(req["prompt"]),
                int(req.get("max_new_tokens", FLAGS.max_new_tokens)),
                float(req.get("temperature", FLAGS.temperature)),
            )
            prompts[rid] = req["prompt"]
    log(f"{len(prompts)} requests queued over {FLAGS.slots} slots")

    t0 = time.perf_counter()
    n_tokens = 0
    with open_file(FLAGS.output_file, "w") as out:
        while srv.queue or any(l is not None for l in srv.live):
            for fin in srv.step():
                n_tokens += len(fin.tokens)
                out.write(json.dumps(dict(
                    id=fin.req_id,
                    prompt=prompts[fin.req_id],
                    completion=enc.decode(
                        fin.tokens, skip_special_tokens=True
                    ),
                    stopped=fin.stopped,
                    n_tokens=len(fin.tokens),
                )) + "\n")
    dt = time.perf_counter() - t0
    log(
        f"served {len(prompts)} requests / {n_tokens} tokens in {dt:.1f}s "
        f"({n_tokens / dt:.1f} tok/s) → {FLAGS.output_file}"
    )
    log(srv.stats_line())


if __name__ == "__main__":
    run(main)
