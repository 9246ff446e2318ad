"""In-flight lookup speculation vs plain in-flight serving.

Serves a pool of copy-task requests ("{span} REPEAT: " → the model
emits {span}) through InflightServer twice — lookup_k=K vs lookup_k=0 —
with a COPY-TRAINED target, so acceptance is the model's real quoting
behavior, not an oracle. Outputs are asserted token-identical (the
lookup contract: every emitted token is the target's own greedy
choice). Reports tok/s, the speedup, and tokens-per-round (≈ 1 + mean
accepted length).

Env: SLB_PLATFORM ('cpu' for tunnel-down runs), SLB_TARGET (streaming
params of the serving model; default: the copy-trained 6L/768 target),
SLB_TARGET_CFG (JSON config overrides), SLB_K (default 7), SLB_NGRAM
(3), SLB_SLOTS (4), SLB_REQS (8), SLB_NEW (160), SLB_CACHE (512).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if os.environ.get("SLB_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SLB_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from lwm_tpu.checkpoint import StreamingCheckpointer
from lwm_tpu.models import FlaxLLaMAForCausalLM, LLaMAConfig
from lwm_tpu.serve import InflightServer
from lwm_tpu.utils.checkpoint_convert import unscan_params

TARGET = os.environ.get(
    "SLB_TARGET", "params::/tmp/needle/runcd/needle--4a695860/streaming_params"
)
TOKENIZER = os.environ.get("SLB_TOKENIZER", "tests/fixtures/tokenizer")
K = int(os.environ.get("SLB_K", 7))
NGRAM = int(os.environ.get("SLB_NGRAM", 3))
SLOTS = int(os.environ.get("SLB_SLOTS", 4))
REQS = int(os.environ.get("SLB_REQS", 8))
NEW = int(os.environ.get("SLB_NEW", 160))
CACHE = int(os.environ.get("SLB_CACHE", 512))

TARGET_CFG = dict(
    vocab_size=512, hidden_size=768, intermediate_size=2048,
    num_hidden_layers=6, num_attention_heads=6,
)
TARGET_CFG.update(json.loads(os.environ.get("SLB_TARGET_CFG", "{}")))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def load_target():
    cfg = LLaMAConfig(
        **TARGET_CFG, max_sequence_length=CACHE, scan_attention=False,
        scan_mlp=False, scan_layers=False, mesh_dim=None,
        decode_index="per_row",
    )
    with jax.default_device(jax.devices("cpu")[0]):
        _, params = StreamingCheckpointer.load_trainstate_checkpoint(
            TARGET, disallow_trainstate=True
        )
    # training checkpoints are scanned — unscan for serving
    params = unscan_params(
        params["params"], cfg.num_hidden_layers, scan_axis=0
    )
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    model = FlaxLLaMAForCausalLM(
        cfg, input_shape=(1, 16), seed=0, _do_init=False
    )
    return model, params


def copy_prompts(n, seed=123):
    """Fresh '{span} REPEAT: ' prompts (spans the model never saw) —
    same recipe as spec_decode_bench.copy_prompts."""
    import random

    from transformers import AutoTokenizer

    from lwm_tpu.apps.create_needle_train_data import make_filler_sentences

    enc = AutoTokenizer.from_pretrained(TOKENIZER)
    rng = random.Random(seed)
    prompts = []
    for _ in range(10_000):
        if len(prompts) >= n:
            break
        span = make_filler_sentences(rng, rng.randint(2, 4))
        toks = enc.encode(span + " REPEAT: ", add_special_tokens=False)
        if not (120 <= len(toks) <= 160):
            continue
        prompts.append([enc.bos_token_id] + toks)
    assert len(prompts) >= n, "not enough prompts in the length window"
    return prompts


def serve(model, params, prompts, k):
    srv = InflightServer(
        model, params, slots=SLOTS, cache_len=CACHE,
        prompt_buckets=(256,), lookup_k=k, lookup_ngram=NGRAM,
    )
    t0 = time.perf_counter()
    for p in prompts:
        srv.submit(p, NEW)
    done = sorted(srv.run(), key=lambda f: f.req_id)
    dt = time.perf_counter() - t0
    return done, dt, srv._step


def main():
    log(f"loading target {TARGET_CFG['num_hidden_layers']}L/"
        f"{TARGET_CFG['hidden_size']}...")
    model, params = load_target()
    prompts = copy_prompts(REQS)

    log("warmup (compile both arms)...")
    serve(model, params, prompts[:SLOTS], K)
    serve(model, params, prompts[:SLOTS], 0)

    log("lookup arm...")
    done_l, t_l, rounds_l = serve(model, params, prompts, K)
    log("plain arm...")
    done_p, t_p, rounds_p = serve(model, params, prompts, 0)

    for a, b in zip(done_l, done_p):
        np.testing.assert_array_equal(a.tokens, b.tokens)

    toks = sum(len(f.tokens) for f in done_l)
    print(
        f"in-flight lookup (k={K}): {toks / t_l:.1f} tok/s vs plain "
        f"{toks / t_p:.1f} tok/s — {t_p / t_l:.2f}x  "
        f"[{toks} tokens in {rounds_l} vs {rounds_p} rounds = "
        f"{toks / max(rounds_l, 1):.2f} tok/round pooled, copy-trained "
        f"{TARGET_CFG['num_hidden_layers']}L/{TARGET_CFG['hidden_size']}, "
        f"slots={SLOTS} reqs={REQS} new={NEW}, outputs identical]"
    )


if __name__ == "__main__":
    main()
