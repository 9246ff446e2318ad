"""Speculative-decoding throughput: draft-k + one-verify vs plain greedy.

Decode streams all target weights+cache per token; speculative decoding
(`lwm_tpu/speculative.py`) verifies k+1 tokens per target forward, so the
speedup ≈ tokens-per-verify × (1 − draft overhead). Acceptance is
data+model dependent — this bench uses models TRAINED IN-FRAMEWORK on the
deterministic copy task ("{span} REPEAT: " → "{span}"), where a converged
target reproduces the span and a much smaller converged draft agrees with
it, giving a realistic high-acceptance serving regime (the same shape as
greedy decoding with a distilled draft in production).

`SPEC_MODE=lookup` benches draft-FREE prompt-lookup speculation instead:
the copy task is its ideal regime — the span to emit is literally in the
prompt, so the trailing-ngram lookup proposes the true continuation and
the only cost per accepted run of k tokens is one verify forward. No
draft checkpoint is loaded in that mode.

Env:
  SPEC_MODE     'draft' (default) or 'lookup' (prompt-lookup, no draft)
  SPEC_PROMPTS  'copy' (default): "{span} REPEAT: " prompts — the
                high-acceptance regime (agreement 1.00 by construction).
                'haystack': fresh pg19-style filler prose, model
                free-runs the continuation — the acceptance FLOOR (the
                filler is word-salad, LESS predictable than real prose).
                'needleqa': haystack + hidden needle + question — the
                long-context QA serving workload the README claims
                speculation for; the answer quotes the context.
  SPEC_PROMPT_TOKENS  prompt length for haystack/needleqa (default 1024)
  SPEC_TARGET   streaming params of the target (default: the copy-trained
                6L/768 from scripts/run_needle_validation.sh machinery)
  SPEC_DRAFT    streaming params of the draft (2L/256 copy-trained)
  SPEC_K        draft tokens per verify (default 7 → verify q-len 8)
  SPEC_NGRAM    lookup trailing-ngram length (default 3, lookup mode)
  SPEC_NEW      new tokens (default 192)
  SPEC_BATCH    rows in lockstep (default 1)

Both checkpoints are scanned (training layout); they are unscanned at
load for serving (NOTES.md: scanned serving is ~3.7x slower).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if os.environ.get("SPEC_PLATFORM"):  # e.g. 'cpu' — the JAX_PLATFORMS env
    # var is ignored under the axon TPU plugin, only the config knob works
    jax.config.update("jax_platforms", os.environ["SPEC_PLATFORM"])
import jax.numpy as jnp
import numpy as np
from jax import lax

from lwm_tpu.models import FlaxLLaMAForCausalLM, LLaMAConfig

TARGET = os.environ.get(
    "SPEC_TARGET", "params::/tmp/needle/runcd/needle--4a695860/streaming_params"
)
DRAFT = os.environ.get(
    "SPEC_DRAFT", "params::/tmp/spec/draftcopy/streaming_params"
)
TOKENIZER = os.environ.get("SPEC_TOKENIZER", "tests/fixtures/tokenizer")
MODE = os.environ.get("SPEC_MODE", "draft")
PROMPTS = os.environ.get("SPEC_PROMPTS", "copy")
PROMPT_TOKENS = int(os.environ.get("SPEC_PROMPT_TOKENS", 1024))
K = int(os.environ.get("SPEC_K", 7))
NGRAM = int(os.environ.get("SPEC_NGRAM", 3))
NEW = int(os.environ.get("SPEC_NEW", 192))
BATCH = int(os.environ.get("SPEC_BATCH", 1))

TARGET_CFG = dict(
    vocab_size=512, hidden_size=768, intermediate_size=2048,
    num_hidden_layers=6, num_attention_heads=6,
)
DRAFT_CFG = dict(
    vocab_size=512, hidden_size=256, intermediate_size=768,
    num_hidden_layers=2, num_attention_heads=2,
)
# env JSON overrides, e.g. SPEC_TARGET_CFG='{"hidden_size":1024,...}'
import json as _json

TARGET_CFG.update(_json.loads(os.environ.get("SPEC_TARGET_CFG", "{}")))
DRAFT_CFG.update(_json.loads(os.environ.get("SPEC_DRAFT_CFG", "{}")))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def load_unscanned(spec, cfg_kwargs):
    from lwm_tpu.checkpoint import StreamingCheckpointer
    from lwm_tpu.utils.checkpoint_convert import unscan_params

    cfg = LLaMAConfig(
        max_sequence_length=4096, scan_attention=False, scan_mlp=False,
        scan_layers=False, mesh_dim=None, theta=10000, **cfg_kwargs,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        _, params = StreamingCheckpointer.load_trainstate_checkpoint(
            spec, disallow_trainstate=True
        )
    params = unscan_params(
        params["params"], cfg.num_hidden_layers, scan_axis=0
    )
    model = FlaxLLaMAForCausalLM(
        cfg, input_shape=(1, 16), seed=0, dtype=jnp.bfloat16, _do_init=False
    )
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    return model, params


def copy_prompts(n, seed=123):
    """Fresh '{span} REPEAT: ' prompts (spans the models never saw)."""
    import random

    from transformers import AutoTokenizer

    from lwm_tpu.apps.create_needle_train_data import make_filler_sentences

    enc = AutoTokenizer.from_pretrained(TOKENIZER)
    rng = random.Random(seed)
    rows, spans = [], []
    # grow the span sentence-by-sentence until its tokenization lands in
    # the 120-180 window (tokenizer-agnostic: the char-level fixture
    # needs 3-4 sentences, the BPE fixture 8-12; both stay inside the
    # training span budget, create_copy_pretrain_data: 40..0.42*512)
    for _ in range(10_000):
        if len(rows) >= n:
            break
        span, n_sent = "", 0
        while n_sent < 64:
            span = (span + " " if span else "") + make_filler_sentences(
                rng, 1
            )
            n_sent += 1
            if len(enc.encode(span, add_special_tokens=False)) >= 120:
                break
        toks = enc.encode(span + " REPEAT: ", add_special_tokens=False)
        if not (120 <= len(toks) <= 180):
            continue
        rows.append([enc.bos_token_id] + toks)
        spans.append(span)
    assert len(rows) >= n, f"only {len(rows)} prompts in the length window"
    width = min(len(r) for r in rows)
    ids = np.asarray([r[-width:] for r in rows], np.int32)  # head-trim to align
    return jnp.asarray(ids), spans, enc


def haystack_prompts(n, seed=123):
    """Fresh pg19-style filler prose (the needle eval's haystack text),
    cut mid-document: the model free-runs its continuation. This is the
    acceptance FLOOR — the filler draws words near-uniformly, so it is
    LESS predictable than real prose; real-text acceptance lands between
    this and the copy task's 1.00."""
    import random

    from transformers import AutoTokenizer

    from lwm_tpu.apps.create_needle_train_data import make_filler_sentences

    enc = AutoTokenizer.from_pretrained(TOKENIZER)
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        toks = []
        while len(toks) < PROMPT_TOKENS:
            s = " " + make_filler_sentences(rng, 4).strip()
            toks += enc.encode(s, add_special_tokens=False)
        rows.append([enc.bos_token_id] + toks[: PROMPT_TOKENS - 1])
    return jnp.asarray(np.asarray(rows, np.int32)), None, enc


def needleqa_prompts(n, seed=123):
    """The long-context QA serving workload: haystack + hidden needle +
    retrieval question; the answer quotes the context (the regime the
    lookup proposer is matched to)."""
    import random

    from transformers import AutoTokenizer

    from lwm_tpu.apps.create_needle_train_data import (
        NEEDLE_TEMPLATE,
        RETRIEVAL_QUESTION,
        insert_needle_tokens,
        make_filler_sentences,
    )
    from lwm_tpu.apps.eval_needle import PROMPT_TEMPLATE, RANDOM_NEEDLE_CITIES

    enc = AutoTokenizer.from_pretrained(TOKENIZER)
    rng = random.Random(seed)
    period_tokens = set(
        enc.encode(".", add_special_tokens=False)
        + enc.encode("text.", add_special_tokens=False)[-1:]
    )
    rows = []
    for _ in range(n):
        city = rng.choice(RANDOM_NEEDLE_CITIES)
        number = str(rng.randint(10**6, 10**7 - 1))
        filler = []
        while len(filler) < PROMPT_TOKENS:
            filler += enc.encode(
                " " + make_filler_sentences(rng, 4).strip(),
                add_special_tokens=False,
            )
        # leave room for the scaffold + needle inside the prompt budget
        scaffold = PROMPT_TEMPLATE.format(
            context="", question=RETRIEVAL_QUESTION.format(city)
        )
        needle = NEEDLE_TEMPLATE.format(city=city, rnd_number=number)
        overhead = len(enc.encode(scaffold + needle, add_special_tokens=False))
        filler = filler[: PROMPT_TOKENS - overhead - 8]
        ctx = insert_needle_tokens(
            enc, filler, needle, rng.randint(10, 90), period_tokens
        )
        prompt = PROMPT_TEMPLATE.format(
            context=enc.decode(ctx),
            question=RETRIEVAL_QUESTION.format(city),
        )
        rows.append(
            [enc.bos_token_id]
            + enc.encode(prompt, add_special_tokens=False)
        )
    width = min(len(r) for r in rows)
    ids = np.asarray([r[-width:] for r in rows], np.int32)
    return jnp.asarray(ids), None, enc


def plain_greedy(model, params, ids, new_tokens, cache_len):
    """Baseline: one-jit prefill + fori_loop greedy decode (decode_bench)."""
    b, prompt = ids.shape

    def fwd(params, cache, tok, pos):
        out, vars_ = model.module.apply(
            {"params": params, "cache": cache},
            tok, jnp.ones((b, cache_len), dtype="i4"), None, pos,
            True, False, False, False, True, mutable=["cache"],
        )
        return vars_["cache"], jnp.argmax(out.logits[:, -1:], -1).astype("i4")

    @jax.jit
    def run(params, ids):
        cache = model.init_cache(b, cache_len)
        pos = jnp.broadcast_to(jnp.arange(prompt, dtype="i4")[None], (b, prompt))
        cache, tok = fwd(params, cache, ids, pos)

        def body(i, carry):
            cache, tok, toks = carry
            pos = jnp.full((b, 1), prompt + i, dtype="i4")
            cache, tok = fwd(params, cache, tok, pos)
            return cache, tok, lax.dynamic_update_slice(toks, tok, (0, i))

        toks = jnp.zeros((b, new_tokens), dtype="i4")
        _, _, toks = lax.fori_loop(0, new_tokens, body, (cache, tok, toks))
        return toks  # timing baseline: NEW decode forwards (like decode_bench)

    return run


def main():
    from lwm_tpu.speculative import prompt_lookup_generate, speculative_generate

    log(f"mode={MODE}; loading target (unscanned for serving)...")
    target, t_params = load_unscanned(TARGET, TARGET_CFG)
    if MODE == "draft":
        draft, d_params = load_unscanned(DRAFT, DRAFT_CFG)
    builder = {
        "copy": copy_prompts,
        "haystack": haystack_prompts,
        "needleqa": needleqa_prompts,
    }[PROMPTS]
    ids, spans, enc = builder(BATCH)
    b, prompt = ids.shape
    cache_len = -(-(prompt + NEW + K + 1) // 1024) * 1024
    log(f"prompt {prompt} tokens x{b}; cache {cache_len}")

    # --- plain greedy baseline ---
    run_plain = plain_greedy(target, t_params, ids, NEW, cache_len)
    log("compiling plain greedy...")
    out_plain = jax.device_get(run_plain(t_params, ids))
    t0 = time.perf_counter()
    out_plain = jax.device_get(run_plain(t_params, ids))
    t_plain = time.perf_counter() - t0

    # --- speculative ---
    log("compiling speculative...")
    if MODE == "lookup":
        def run_spec():
            return prompt_lookup_generate(
                target, t_params, ids, NEW, k=K, ngram=NGRAM,
                cache_len=cache_len,
            )
    else:
        def run_spec():
            return speculative_generate(
                target, draft, t_params, d_params, ids, NEW, k=K,
                cache_len=cache_len,
            )
    res = run_spec()
    jax.device_get(res.sequences)
    t0 = time.perf_counter()
    res = run_spec()
    seq = jax.device_get(res.sequences)
    t_spec = time.perf_counter() - t0
    accepted = int(res.accepted)
    steps = int(res.steps)

    # sanity: the target really copies (accuracy of span reproduction);
    # non-copy prompt modes have no ground-truth span — report NaN there
    gen = enc.decode(np.asarray(seq[0, prompt:]), skip_special_tokens=True)
    if spans is not None:
        span0 = spans[0][: len(gen)]
        agree = np.mean(
            [a == b for a, b in zip(gen.split(), span0.split())]
        ) if gen else 0.0
    else:
        agree = float("nan")
        log(f"sample continuation [{PROMPTS}]: {gen[:160]!r}")

    plain_rate = b * NEW / t_plain
    spec_rate = b * NEW / t_spec
    proposer = (
        f"prompt-lookup ngram={NGRAM} (draft-free)" if MODE == "lookup"
        else f"draft {DRAFT_CFG['num_hidden_layers']}L/{DRAFT_CFG['hidden_size']}"
    )
    print(
        f"speculative decode [{MODE}/{PROMPTS}]: {spec_rate:.1f} tok/s vs "
        f"plain {plain_rate:.1f} tok/s — {spec_rate / plain_rate:.2f}x  "
        f"[k={K} batch={b} accepted/step={accepted / max(steps, 1):.2f} "
        f"verifies={steps} tokens/verify={b * NEW / max(steps, 1):.2f} "
        f"copy-agreement={agree:.2f}] "
        f"(target {TARGET_CFG['num_hidden_layers']}L/{TARGET_CFG['hidden_size']} "
        f"in-framework-trained, {proposer}, {prompt}-token prompt "
        f"+ {NEW} new, one compiled dispatch each)"
    )


if __name__ == "__main__":
    main()
