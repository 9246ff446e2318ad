"""int8 serving ACCURACY gate on a real trained checkpoint.

VERDICT r4 weak #5: the int8 weight/KV accuracy story was bounded by
toy models because no released checkpoint loads offline. The
in-framework-trained needle-QA target (scripts/run_spec_natural.sh)
is a real trained model with a CHECKABLE long-context behavior —
retrieving a 7-digit needle number — so quantization accuracy can be
gated on task correctness, not logits drift alone:

  arms: bf16 | int8 weights (XLA dequant-matmul) | int8 weights+int8 KV
  per arm: greedy answers for N fresh needle-QA prompts; report
  (a) needle-retrieval accuracy (the number appears in the answer) and
  (b) token agreement with the bf16 arm over the first 16 tokens.

Gate intent: int8 arms should retrieve within a few points of bf16.
Run (after run_spec_natural.sh):
  SPEC_TOKENIZER=tests/fixtures/tokenizer_bpe \
  SPEC_TARGET=params::/tmp/specnat/run_target/m*/streaming_params_4000 \
  SPEC_TARGET_CFG='{"vocab_size":2048}' python benchmarks/quant_accuracy_gate.py
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from spec_decode_bench import (  # noqa: E402  (sibling module)
    TARGET, TARGET_CFG, TOKENIZER, load_unscanned, log, plain_greedy,
)

N = int(os.environ.get("GATE_N", 24))
NEW = int(os.environ.get("GATE_NEW", 24))
PROMPT_TOKENS = int(os.environ.get("GATE_PROMPT_TOKENS", 1024))


def build_prompts(enc, n, seed=7):
    """needle-QA prompts WITH their ground-truth numbers (the spec
    bench's builder, keeping the needles for correctness scoring)."""
    from lwm_tpu.apps.create_needle_train_data import (
        NEEDLE_TEMPLATE, RETRIEVAL_QUESTION, insert_needle_tokens,
        make_filler_sentences,
    )
    from lwm_tpu.apps.eval_needle import PROMPT_TEMPLATE, RANDOM_NEEDLE_CITIES

    rng = random.Random(seed)
    period_tokens = set(
        enc.encode(".", add_special_tokens=False)
        + enc.encode("text.", add_special_tokens=False)[-1:]
    )
    rows, numbers = [], []
    for _ in range(n):
        city = rng.choice(RANDOM_NEEDLE_CITIES)
        number = str(rng.randint(10**6, 10**7 - 1))
        filler = []
        while len(filler) < PROMPT_TOKENS:
            filler += enc.encode(
                " " + make_filler_sentences(rng, 4).strip(),
                add_special_tokens=False,
            )
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
            [enc.bos_token_id] + enc.encode(prompt, add_special_tokens=False)
        )
        numbers.append(number)
    width = min(len(r) for r in rows)
    ids = np.asarray([r[-width:] for r in rows], np.int32)
    return jnp.asarray(ids), numbers


def main():
    from transformers import AutoTokenizer

    from lwm_tpu.ops.quant import quantize_params_int8

    enc = AutoTokenizer.from_pretrained(TOKENIZER)
    ids, numbers = build_prompts(enc, N)
    cache_len = -(-(ids.shape[1] + NEW) // 1024) * 1024

    log(f"{N} needle-QA prompts x {ids.shape[1]} tokens; loading target...")
    model_bf16, params_bf16 = load_unscanned(TARGET, TARGET_CFG)

    arms = {}

    def run_arm(name, cfg_extra, params):
        from lwm_tpu.models.llama import FlaxLLaMAForCausalLM, LLaMAConfig

        cfg = LLaMAConfig(
            max_sequence_length=4096, scan_attention=False, scan_mlp=False,
            scan_layers=False, mesh_dim=None, theta=10000,
            **{**TARGET_CFG, **cfg_extra},
        )
        m = FlaxLLaMAForCausalLM(
            cfg, input_shape=(1, 16), seed=0, dtype=jnp.bfloat16,
            _do_init=False,
        )
        log(f"arm {name}: compiling + decoding...")
        toks = np.asarray(
            jax.device_get(plain_greedy(m, params, ids, NEW, cache_len)(
                params, ids
            ))
        )
        arms[name] = toks
        hits = sum(
            1 for i in range(N)
            if numbers[i] in enc.decode(toks[i], skip_special_tokens=True)
        )
        agree = ""
        if "bf16" in arms and name != "bf16":
            a = (arms["bf16"][:, :16] == toks[:, :16]).mean()
            agree = f"  bf16-token-agreement@16 {a:.3f}"
        print(
            f"{name}: needle retrieval {hits}/{N} = {hits / N:.1%}{agree}",
            flush=True,
        )

    run_arm("bf16", {}, params_bf16)
    params_int8 = quantize_params_int8(params_bf16)
    run_arm("int8-weights", {"quant_dense": "int8_xla"}, params_int8)
    run_arm(
        "int8-weights+int8-kv",
        {"quant_dense": "int8_xla", "kv_cache_dtype": "int8"},
        params_int8,
    )


if __name__ == "__main__":
    main()
