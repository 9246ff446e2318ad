"""Generate the pure-copy pretask that warm-starts needle-retrieval training.

Each example is ``{span} REPEAT: `` → ``{span}``: a fresh word-salad span the
model must reproduce verbatim, with loss only on the repeat (fields
``[question],answer,[postpad]``). Spans vary in length, so the task is only
solvable by content-keyed copying — training it to convergence (loss <0.01
within ~600 steps for a 6L/768 model) forms the induction/copy circuit that
keyed needle retrieval then reuses. Measured motivation: without this warm
start, the digit loss of the needle task sits at chance for >7k steps; with
it, retrieval forms within ~250 steps (NOTES.md round-2).

Examples are exactly --seq_length tokens (bos + question + answer + postpad
+ eos) so any integer multiple packs row-aligned with other exact-length
datasets in the same training stream.

Usage:
  python -m lwm_tpu.apps.create_copy_pretrain_data \
      --tokenizer tests/fixtures/tokenizer --seq_length 512 \
      --n_train 8000 --output /tmp/needle/copy.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import random

from transformers import AutoTokenizer

from lwm_tpu.apps.create_needle_train_data import make_filler_sentences


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tokenizer", type=str, required=True)
    p.add_argument("--seq_length", type=int, default=512)
    p.add_argument("--n_train", type=int, default=8000)
    p.add_argument("--min_span_tokens", type=int, default=40)
    p.add_argument("--max_span_frac", type=float, default=0.42,
                   help="span budget as a fraction of seq_length (the span "
                        "appears twice plus scaffold/padding)")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--output", type=str, required=True)
    args = p.parse_args()

    rng = random.Random(args.seed)
    enc = AutoTokenizer.from_pretrained(args.tokenizer)
    max_span = int(args.seq_length * args.max_span_frac)

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    n = 0
    with open(args.output, "w") as f:
        while n < args.n_train:
            span = make_filler_sentences(rng, rng.randint(4, 20))
            toks = enc.encode(span, add_special_tokens=False)
            if not (args.min_span_tokens <= len(toks) <= max_span):
                continue
            question = span + " REPEAT: "
            used = (
                1
                + len(enc.encode(question, add_special_tokens=False))
                + len(toks)
                + 1
            )
            pad = args.seq_length - used
            if pad < 0:
                continue
            # token-exact by construction — byte-level BPE re-encodes a
            # token-sliced decode differently (see exact_token_text)
            from lwm_tpu.apps.create_needle_train_data import exact_token_text

            postpad = exact_token_text(enc, pad, rng)
            total = used + len(enc.encode(postpad, add_special_tokens=False))
            if total != args.seq_length:  # belt-and-braces: retry
                continue
            f.write(
                json.dumps(
                    {"question": question, "answer": span, "postpad": postpad}
                )
                + "\n"
            )
            n += 1
    print(f"wrote {n} exact-{args.seq_length}-token copy examples to "
          f"{args.output}")


if __name__ == "__main__":
    main()
