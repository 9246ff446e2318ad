"""Rebuild the BPE-2048 tokenizer fixture (tests/fixtures/tokenizer_bpe).

A byte-level BPE trained on the synthetic needle/filler vocabulary, with
**LLaMA-style individual-digit splitting** (sentencepiece's
split_digits=true, which the released LWM tokenizers use — reference
models tokenize "4819203" as seven digit pieces). Without it, BPE merges
digits into hundreds of rare 2-3-digit tokens ('48', '19', '03', ...)
whose embeddings barely train, and the needle-retrieval induction circuit
never forms over them: measured on the round-3 staged-extension run, the
same recipe that reaches 98%+ digit retrieval with digit-split tokens
sat at argmax-chance (3.4% digit acc ON TRAINING DATA, loss stuck at the
scaffold floor) with merged digit tokens, while the non-digit scaffold
trained to 99%+. Digit splitting is what makes "copy the number you
found" a task over ten frequent, well-trained tokens instead of a
thousand rare ones.

Run:  python tests/fixtures/make_bpe_tokenizer.py
"""

import os
import random
import sys

from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def training_corpus():
    from lwm_tpu.apps.create_needle_train_data import (
        NEEDLE_TEMPLATE,
        RETRIEVAL_QUESTION,
        make_filler_sentences,
    )
    from lwm_tpu.apps.eval_needle import PROMPT_TEMPLATE, RANDOM_NEEDLE_CITIES

    rng = random.Random(0)
    for _ in range(2000):
        yield make_filler_sentences(rng, 20)
    # scaffold/template text so prompt words get whole-word tokens
    for city in RANDOM_NEEDLE_CITIES:
        num = str(rng.randint(10**6, 10**7 - 1))
        yield PROMPT_TEMPLATE.format(
            context=NEEDLE_TEMPLATE.format(city=city, rnd_number=num),
            question=RETRIEVAL_QUESTION.format(city),
        ) + f" The special magic {city} number is: {num}"
    for _ in range(200):
        yield " ".join(str(rng.randint(0, 10**7)) for _ in range(20))


def main(out_dir):
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        # LLaMA-style: every digit is its own piece, before byte-level
        pre_tokenizers.Digits(individual_digits=True),
        pre_tokenizers.ByteLevel(add_prefix_space=False),
    ])
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=2048,
        special_tokens=["<unk>", "<s>", "</s>", "<pad>"],
        show_progress=False,
    )
    tok.train_from_iterator(training_corpus(), trainer)

    from transformers import PreTrainedTokenizerFast

    hf = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>",
        bos_token="<s>",
        eos_token="</s>",
        pad_token="<pad>",
        clean_up_tokenization_spaces=False,
    )
    hf.save_pretrained(out_dir)
    # sanity: digits must be individual pieces everywhere
    toks = hf.tokenize("is: 4819203\n")
    digit_toks = [t for t in toks if any(c.isdigit() for c in t)]
    assert len(digit_toks) == 7, toks
    print("saved", out_dir, "vocab", hf.vocab_size)
    print("sample:", hf.tokenize("The special magic Amsterdam number is: 4819203"))


if __name__ == "__main__":
    main(os.path.join(os.path.dirname(__file__), "tokenizer_bpe"))
