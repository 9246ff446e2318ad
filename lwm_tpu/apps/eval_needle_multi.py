"""Multi-needle haystack eval (reference scripts/eval_needle_multi.py):
inserts ``n_needles_total`` city/number needles at sampled depths and asks
the model to retrieve ``n_needles_retrieve`` of them; per-needle correctness
is substring presence. Resumable by (context_length, seed) key.

Run: python -m lwm_tpu.apps.eval_needle_multi --haystack_file=... ...
"""

from __future__ import annotations

import json
import math
import random
import time

import numpy as np
from absl.app import run
from tqdm import tqdm

import jax

from lwm_tpu.apps.eval_needle import (
    PROMPT_TEMPLATE,
    RANDOM_NEEDLE_CITIES,
    LLMNeedleHaystackTester,
    NeedleInserter,
)
from lwm_tpu.apps.sampler import TextSampler
from lwm_tpu.checkpoint import StreamingCheckpointer
from lwm_tpu.models.llama import LLaMAConfig
from lwm_tpu.parallel.mesh import DistributedConfig
from lwm_tpu.utils import define_flags_with_default, set_random_seed
from lwm_tpu.utils.io import check_exists, open_file

FLAGS, FLAGS_DEF = define_flags_with_default(
    haystack_file="",
    max_tokens_per_batch=2000000,
    output_file="results.json",
    context_lengths_min=1000,
    context_lengths_max=32000,
    n_context_length_intervals=3,
    n_document_depth_intervals=3,
    n_rounds=2,
    n_needles_total=4,
    n_needles_retrieve=4,
    seed=1234,
    mesh_dim="1,-1,1,1",
    dtype="fp32",
    load_llama_config="",
    update_llama_config="",
    load_checkpoint="",
    unscan_for_serving=False,  # unscan stacked layers at load: ~3.7x decode
    tokenizer="LargeWorldModel/LWM-Text-1M",
    checkpointer=StreamingCheckpointer.get_default_config(),
    llama=LLaMAConfig.get_default_config(),
    jax_distributed=DistributedConfig.get_default_config(),
)


class MultiNeedleTester(LLMNeedleHaystackTester):
    def __init__(self, flags=None, **kwargs):
        self.flags = flags or FLAGS
        kwargs.setdefault("sampler", TextSampler(self.flags, greedy=True))
        kwargs.setdefault(
            "retrieval_question",
            "What are the special magic numbers for {}?",
        )
        super().__init__(**kwargs)

    def create_multi_context(self, needles_info, cities_retrieve, context,
                             context_length, seed):
        assert all(city in needles_info for city in cities_retrieve)
        for city, (rnd_number, depth_percent) in needles_info.items():
            needle = self.needle_template.format(city=city, rnd_number=rnd_number)
            context = self.inserter.insert(
                needle, context, depth_percent, context_length
            )
        if len(cities_retrieve) == 1:
            question = f"What is the special magic number for {cities_retrieve[0]}?"
        else:
            joined = ", ".join(cities_retrieve[:-1]) + ", and " + cities_retrieve[-1]
            question = self.retrieval_question.format(joined)
        return {
            "context": context,
            "context_length": int(context_length),
            "needles_info": needles_info,
            "question": question,
            "cities_to_retrieve": cities_retrieve,
            "seed": seed,
        }

    def run_test(self):
        flags = self.flags

        def _key(result):
            return (result["context_length"], result["seed"])

        results, completed = [], set()
        if check_exists(flags.output_file):
            with open_file(flags.output_file, "r") as f:
                results = json.load(f)
            completed = {_key(r) for r in results}
        print("completed", len(completed))

        full_contexts = self.read_context_files(flags.n_rounds)
        full_tokens = [
            self.enc.encode(c, add_special_tokens=False)
            for c in tqdm(full_contexts, desc="tokenize haystacks")
        ]

        start = time.time()
        for context_length in self.context_lengths:
            trim_contexts = [
                self.enc.decode(toks[:context_length]) for toks in full_tokens
            ]
            max_input_length = self.compute_max_input_length(context_length)
            contexts = []
            for i in range(flags.n_rounds):
                if (int(context_length), i) in completed:
                    continue
                cities = random.sample(RANDOM_NEEDLE_CITIES, flags.n_needles_total)
                depths = random.sample(
                    list(self.document_depth_percents), flags.n_needles_total
                )
                cities_retrieve = random.sample(cities, flags.n_needles_retrieve)
                needles_info = {
                    city: (
                        str(self.generate_random_number(self.rnd_number_digits)),
                        depth,
                    )
                    for city, depth in zip(cities, depths)
                }
                contexts.append(
                    self.create_multi_context(
                        needles_info, cities_retrieve, trim_contexts[i],
                        context_length, i,
                    )
                )
            if not contexts:
                continue

            B = flags.max_tokens_per_batch / (max_input_length + self.model.block_size)
            B = int(B / self.model.data_dim) * self.model.data_dim
            if B < self.model.data_dim:
                B = self.model.data_dim
            elif B > len(contexts):
                B = int(math.ceil(len(contexts) / self.model.data_dim) * self.model.data_dim)
            n_pad = 0 if len(contexts) % B == 0 else B - len(contexts) % B
            for _ in range(n_pad):
                contexts.insert(0, contexts[0])

            pbar = tqdm(total=len(contexts))
            for i in range(0, len(contexts), B):
                contexts_i = contexts[i : i + B]
                prompts = [
                    PROMPT_TEMPLATE.format(
                        context=c["context"], question=c["question"]
                    )
                    for c in contexts_i
                ]
                outs = self.model(prompts, max_input_length)
                for j, (context, out) in enumerate(zip(contexts_i, outs)):
                    if i + j < n_pad:
                        continue
                    answers = [
                        context["needles_info"][city][0]
                        for city in context["cities_to_retrieve"]
                    ]
                    results.append(
                        {
                            "context_length": context["context_length"],
                            "needles_info": context["needles_info"],
                            "question": context["question"],
                            "answer": answers,
                            "response": out,
                            "correct": [a in out for a in answers],
                            "seed": context["seed"],
                        }
                    )
                    print(results[-1]["correct"], out, answers)
                if jax.process_index() == 0:
                    with open_file(flags.output_file, "w") as f:
                        json.dump(results, f)
                pbar.update(len(contexts_i))
            pbar.close()
        print("elapsed", time.time() - start)
        print("done")


def main(argv):
    DistributedConfig.initialize(FLAGS.jax_distributed)
    set_random_seed(FLAGS.seed)
    tester = MultiNeedleTester(
        haystack_file=FLAGS.haystack_file,
        context_lengths_min=FLAGS.context_lengths_min,
        context_lengths_max=FLAGS.context_lengths_max,
        context_lengths_num_intervals=FLAGS.n_context_length_intervals,
        document_depth_percent_intervals=FLAGS.n_document_depth_intervals,
    )
    tester.start_test()


if __name__ == "__main__":
    run(main)
