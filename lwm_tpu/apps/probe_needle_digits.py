"""Teacher-forced needle-retrieval probe: the fast, decode-free measure of
whether a checkpoint actually retrieves (vs. memorizes).

Builds FRESH eval-style needle prompts (new random numbers/cities/filler),
teacher-forces the answer sentence through one forward pass, and reports
argmax accuracy on the digit positions plus full-number accuracy. Because
the numbers are fresh, any accuracy above 10%/digit is in-context retrieval
— training-set accuracy cannot leak in. Runs on CPU by default so it can
probe checkpoints while the TPU trains.

Usage:
  python -m lwm_tpu.apps.probe_needle_digits \
      --checkpoint <streaming_params path> --tokenizer tests/fixtures/tokenizer \
      --update_llama_config "dict(hidden_size=768,...)" [--n 24] [--platform cpu]
"""

from __future__ import annotations

import argparse
import random

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--update_llama_config", default="")
    p.add_argument("--n", type=int, default=24)
    p.add_argument("--ctx_min", type=int, default=200)
    p.add_argument("--ctx_max", type=int, default=800)
    p.add_argument("--n_distractors", type=int, default=0)
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "default"])
    args = p.parse_args()

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from lwm_tpu.apps.create_needle_train_data import (
        NEEDLE_TEMPLATE, RETRIEVAL_QUESTION, insert_needle_tokens,
        make_filler_sentences,
    )
    from lwm_tpu.apps.eval_needle import PROMPT_TEMPLATE, RANDOM_NEEDLE_CITIES
    from lwm_tpu.checkpoint import StreamingCheckpointer
    from lwm_tpu.models.llama import FlaxLLaMAForCausalLMModule, LLaMAConfig

    enc = AutoTokenizer.from_pretrained(args.tokenizer)
    period_tokens = set(
        enc.encode(".", add_special_tokens=False)
        + enc.encode("text.", add_special_tokens=False)[-1:]
    )
    rng = random.Random(args.seed)
    filler = enc.encode(
        make_filler_sentences(rng, 3000), add_special_tokens=False
    )

    cfg = LLaMAConfig(mesh_dim=None, scan_attention=False)
    if args.update_llama_config:
        cfg.update(dict(eval(args.update_llama_config)))
    cfg.update(dict(mesh_dim=None, scan_attention=False))
    model = FlaxLLaMAForCausalLMModule(cfg, dtype=jnp.float32)
    params = StreamingCheckpointer.load_checkpoint(args.checkpoint)
    if "params" not in params:
        params = {"params": params}

    @jax.jit
    def forward(ids):
        pos = jnp.arange(ids.shape[1])[None]
        return model.apply(
            params, ids, attention_mask=jnp.ones_like(ids),
            position_ids=pos, deterministic=True,
        ).logits

    digit_hits = number_hits = total_digits = 0
    for _ in range(args.n):
        cities = rng.sample(RANDOM_NEEDLE_CITIES, 1 + args.n_distractors)
        numbers = [str(rng.randint(10 ** 6, 10 ** 7 - 1)) for _ in cities]
        ctx_len = rng.randint(args.ctx_min, args.ctx_max)
        off = rng.randint(0, len(filler) - ctx_len - 1)
        ctx = filler[off : off + ctx_len]
        for c, num in zip(cities, numbers):
            ctx = insert_needle_tokens(
                enc, ctx, NEEDLE_TEMPLATE.format(city=c, rnd_number=num),
                rng.randint(0, 100), period_tokens,
            )
        city, number = cities[0], numbers[0]
        prompt = PROMPT_TEMPLATE.format(
            context=enc.decode(ctx), question=RETRIEVAL_QUESTION.format(city)
        )
        answer = f"The special magic {city} number is: {number}"
        # fields tokenized SEPARATELY, exactly like TextProcessor with
        # fields='[question],answer' and subfield_separator='' — joint
        # prompt+answer encoding shifts BPE merges at the field boundary
        # and misaligns the teacher-forced positions
        ids = (
            [cfg.bos_token_id]
            + enc.encode(prompt, add_special_tokens=False)
            + enc.encode(answer, add_special_tokens=False)
        )
        stem = f"The special magic {city} number is:"
        dig_ids = enc.encode(answer, add_special_tokens=False)[
            len(enc.encode(stem, add_special_tokens=False)):
        ]
        preds = np.asarray(
            jnp.argmax(forward(jnp.asarray([ids], jnp.int32))[0], -1)
        )
        tgt = np.asarray(ids[1:])
        dstart = len(ids) - 1 - len(dig_ids)
        hits = preds[:-1][dstart:] == tgt[dstart:]
        digit_hits += int(hits.sum())
        total_digits += len(dig_ids)
        number_hits += int(hits.all())

    print(
        f"digit acc {digit_hits}/{total_digits} = {digit_hits/total_digits:.2%}"
        f"  full-number {number_hits}/{args.n} = {number_hits/args.n:.1%}"
    )


if __name__ == "__main__":
    main()
