"""Needle-in-a-haystack long-context eval (reference scripts/eval_needle.py).

Builds haystacks from a JSONL text corpus, inserts a "special magic number"
needle at a grid of (context length × depth × round), batches prompts to
max_tokens_per_batch, greedy-decodes, scores by substring match, and writes
incremental JSON results resumable by (context_length, depth, seed) key.

Deviation from the reference: needle insertion token math uses the model's
own tokenizer rather than tiktoken's gpt-4 encoding (tiktoken requires a
network fetch for its BPE ranks; this environment is hermetic). Semantics
are identical — insert at a sentence boundary nearest depth%.

Run: python -m lwm_tpu.apps.eval_needle --haystack_file=pg19.jsonl ...
"""

from __future__ import annotations

import json
import math
import os
import random
import time

import numpy as np
from absl.app import run
from tqdm import tqdm

import jax

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

PROMPT_TEMPLATE = (
    "You are a helpful assistant. USER: {context} {question} Don't give "
    "information outside the document or repeat your findings. Keep your "
    "response short and direct. ASSISTANT: "
)

RANDOM_NEEDLE_CITIES = [
    "Chicago", "Yangon", "Antananarivo", "Colombo", "Almaty", "Sydney",
    "Mexico City", "Seattle", "Lagos", "Amsterdam", "Belgrade", "Cairo",
    "Baghdad", "Damascus", "Kigali", "Dakar", "Sofia", "Victoria",
    "Tashkent", "Mumbai", "Barcelona", "Amman", "Toronto", "Bratislava",
    "Johannesburg", "Thimphu", "Bangkok", "Santiago", "San Francisco",
    "Paris", "Rabat", "Copenhagen", "Madrid", "Ho Chi Minh City",
    "Sarajevo", "Delhi", "Istanbul", "Khartoum", "Helsinki", "Doha",
    "Kuala Lumpur", "Budapest", "Shanghai", "Moscow", "Los Angeles",
    "Oslo", "Berlin", "Bangalore", "Tokyo", "Melbourne", "Port Louis",
    "Lisbon", "Nairobi", "Kampala", "Lima", "Maputo", "Vancouver",
    "Dubai", "Jakarta", "Yerevan", "Beirut", "Athens", "Bucharest",
    "Brussels", "Tunis", "Astana", "Seoul", "Buenos Aires", "Vienna",
]


class NeedleInserter:
    """Token-level needle insertion at a sentence boundary nearest depth%."""

    def __init__(self, tokenizer, final_context_length_buffer=200):
        self.enc = tokenizer
        self.buffer = final_context_length_buffer
        self.period_tokens = set(
            tokenizer.encode(".", add_special_tokens=False)
            + tokenizer.encode("text.", add_special_tokens=False)[-1:]
        )

    def insert(self, needle, context, depth_percent, context_length):
        tokens_needle = self.enc.encode(needle, add_special_tokens=False)
        tokens_context = self.enc.encode(context, add_special_tokens=False)
        context_length -= self.buffer
        if len(tokens_context) + len(tokens_needle) > context_length:
            tokens_context = tokens_context[: context_length - len(tokens_needle)]
        if depth_percent == 100:
            tokens_new = tokens_context + tokens_needle
        else:
            insertion_point = int(len(tokens_context) * (depth_percent / 100))
            tokens_new = tokens_context[:insertion_point]
            while tokens_new and tokens_new[-1] not in self.period_tokens:
                insertion_point -= 1
                tokens_new = tokens_context[:insertion_point]
            tokens_new = (
                tokens_new + tokens_needle + tokens_context[insertion_point:]
            )
        return self.enc.decode(tokens_new)


class LLMNeedleHaystackTester:
    def __init__(
        self,
        haystack_file="",
        retrieval_question="What is the special magic {} number?",
        rnd_number_digits=7,
        context_lengths_min=1000,
        context_lengths_max=126000,
        context_lengths_num_intervals=10,
        document_depth_percent_min=0,
        document_depth_percent_max=100,
        document_depth_percent_intervals=10,
        sampler=None,
    ):
        assert haystack_file, "haystack_file required"
        self.needle_template = "\nThe special magic {city} number is: {rnd_number}\n"
        self.retrieval_question = retrieval_question
        self.rnd_number_digits = rnd_number_digits
        self.haystack_file = haystack_file
        self.context_lengths = np.round(
            np.linspace(
                context_lengths_min, context_lengths_max,
                num=context_lengths_num_intervals, endpoint=True,
            )
        ).astype(int)
        self.document_depth_percents = np.round(
            np.linspace(
                document_depth_percent_min, document_depth_percent_max,
                num=document_depth_percent_intervals, endpoint=True,
            )
        ).astype(int)
        # "USER:" stops the rollout at the next dialogue turn — QA-format
        # models without a trained eos otherwise degenerate into repeated
        # USER/ASSISTANT loops after the answer (round-2 artifacts)
        self.model = sampler if sampler is not None else TextSampler(
            FLAGS, greedy=True, stop_strings=("USER:", "\nUSER")
        )
        self.enc = self.model.tokenizer
        self.inserter = NeedleInserter(self.enc)

    def generate_random_number(self, num_digits):
        return random.randint(10 ** (num_digits - 1), 10**num_digits - 1)

    def read_context_files(self, n):
        max_context_length = max(self.context_lengths)
        contexts = []
        with open_file(self.haystack_file, "r") as f:
            for _ in range(n):
                context, toks = "", 0
                while toks < max_context_length:
                    line = f.readline()
                    if not line:
                        f.seek(0)
                        line = f.readline()
                    text = json.loads(line)["text"]
                    context += text
                    toks += len(self.enc.encode(text, add_special_tokens=False))
                contexts.append(context)
        return contexts

    def create_context_entry(self, needle_rnd_number, random_city, trim_context,
                             context_length, depth_percent, seed):
        needle = self.needle_template.format(
            city=random_city, rnd_number=needle_rnd_number
        )
        question = self.retrieval_question.format(random_city)
        context = self.inserter.insert(
            needle, trim_context, depth_percent, context_length
        )
        return {
            "context": context,
            "context_length": int(context_length),
            "depth_percent": float(depth_percent),
            "needle": needle,
            "question": question,
            "needle_rnd_number": needle_rnd_number,
            "seed": seed,
        }

    def compute_max_input_length(self, context_length, buffer=1024):
        block_size = self.model.block_size
        return int(
            math.ceil((context_length + buffer) / block_size) * block_size
        )

    def run_test(self):
        def _key(result):
            return (result["context_length"], result["depth_percent"], result["seed"])

        results, completed = [], set()
        if check_exists(FLAGS.output_file):
            with open_file(FLAGS.output_file, "r") as f:
                results = json.load(f)
            completed = {_key(r) for r in results}
        print("completed", len(completed))

        full_contexts = self.read_context_files(FLAGS.n_rounds)
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
            for depth_percent in self.document_depth_percents:
                for i in range(FLAGS.n_rounds):
                    if (int(context_length), float(depth_percent), i) in completed:
                        continue
                    random_city = random.choice(RANDOM_NEEDLE_CITIES)
                    needle_rnd_number = str(
                        self.generate_random_number(self.rnd_number_digits)
                    )
                    contexts.append(
                        self.create_context_entry(
                            needle_rnd_number, random_city, trim_contexts[i],
                            context_length, depth_percent, i,
                        )
                    )
            if not contexts:
                continue

            # batch size from the token budget, rounded to the data dims
            B = FLAGS.max_tokens_per_batch / (max_input_length + self.model.block_size)
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
                    results.append(
                        {
                            "context_length": context["context_length"],
                            "depth_percent": context["depth_percent"],
                            "response": out,
                            "answer": context["needle_rnd_number"],
                            "correct": context["needle_rnd_number"] in out,
                            "seed": context["seed"],
                        }
                    )
                    print(results[-1])
                if jax.process_index() == 0:
                    with open_file(FLAGS.output_file, "w") as f:
                        json.dump(results, f)
                pbar.update(len(contexts_i))
            pbar.close()
        print("elapsed", time.time() - start)
        print("done")

    def start_test(self):
        print("\nStarting Needle In A Haystack Testing...")
        print(
            f"- Context Lengths: {len(self.context_lengths)}, "
            f"Min: {min(self.context_lengths)}, Max: {max(self.context_lengths)}"
        )
        print(
            f"- Document Depths: {len(self.document_depth_percents)}, "
            f"Min: {min(self.document_depth_percents)}%, "
            f"Max: {max(self.document_depth_percents)}%\n"
        )
        self.run_test()


def main(argv):
    DistributedConfig.initialize(FLAGS.jax_distributed)
    set_random_seed(FLAGS.seed)
    tester = LLMNeedleHaystackTester(
        haystack_file=FLAGS.haystack_file,
        context_lengths_min=FLAGS.context_lengths_min,
        context_lengths_max=FLAGS.context_lengths_max,
        context_lengths_num_intervals=FLAGS.n_context_length_intervals,
        document_depth_percent_intervals=FLAGS.n_document_depth_intervals,
    )
    tester.start_test()


if __name__ == "__main__":
    run(main)
