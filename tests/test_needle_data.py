"""Needle training-data generator: exact-length packing alignment and
needle/answer consistency (feeds scripts/run_needle_validation.sh)."""

import json
import subprocess
import sys

import pytest
from transformers import AutoTokenizer

from lwm_tpu.data import TextProcessor

TOKENIZER_PATH = "tests/fixtures/tokenizer"


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    out = tmp_path_factory.mktemp("needle")
    subprocess.run(
        [
            sys.executable, "-m", "lwm_tpu.apps.create_needle_train_data",
            "--tokenizer", TOKENIZER_PATH, "--seq_length", "512",
            "--n_train", "20", "--min_context_tokens", "64",
            "--train_output", str(out / "train.jsonl"),
            "--haystack_output", str(out / "hay.jsonl"),
            "--haystack_sentences", "200",
        ],
        check=True,
    )
    return out


def test_examples_exact_seq_length(generated):
    tokenizer = AutoTokenizer.from_pretrained(TOKENIZER_PATH)
    proc = TextProcessor(
        TextProcessor.get_default_config(
            dict(fields="[question],answer,[postpad]", subfield_separator="")
        ),
        tokenizer,
    )
    lines = [json.loads(l) for l in open(generated / "train.jsonl")]
    assert len(lines) == 20
    for ex in lines:
        tokens, masks = proc(ex)
        # exact-length examples keep the packed stream aligned to example
        # boundaries, so no example straddles a training chunk
        assert len(tokens) == 512
        # loss only on the supervised answer + eos
        assert 0 < sum(masks) < 64
        assert masks[0] == 0.0 and masks[-1] == 1.0


def test_needle_present_and_answer_consistent(generated):
    for line in open(generated / "train.jsonl"):
        ex = json.loads(line)
        number = ex["answer"].rsplit(": ", 1)[-1]
        assert number.isdigit() and len(number) == 7
        assert f"number is: {number}" in ex["question"]
        # the question asks about the needle's city
        city = ex["answer"].split("special magic ")[1].rsplit(" number", 1)[0]
        assert f"What is the special magic {city} number?" in ex["question"]


@pytest.fixture(scope="module")
def generated_dense(tmp_path_factory):
    """pool filler + distractors + a QA round per needle (the
    retrieval-training recipe)."""
    out = tmp_path_factory.mktemp("needle_dense")
    subprocess.run(
        [
            sys.executable, "-m", "lwm_tpu.apps.create_needle_train_data",
            "--tokenizer", TOKENIZER_PATH, "--seq_length", "1024",
            "--n_train", "8", "--min_context_tokens", "64",
            "--max_context_tokens", "300", "--filler_mode", "pool",
            "--n_distractors", "2", "--qa_all_needles",
            "--train_output", str(out / "train.jsonl"),
        ],
        check=True,
    )
    return out


def test_dense_mode_one_qa_round_per_needle(generated_dense):
    import re

    tokenizer = AutoTokenizer.from_pretrained(TOKENIZER_PATH)
    proc = TextProcessor(
        TextProcessor.get_default_config(
            dict(fields="[question],answer,[postpad]", subfield_separator="")
        ),
        tokenizer,
    )
    lines = [json.loads(l) for l in open(generated_dense / "train.jsonl")]
    assert len(lines) == 8
    for ex in lines:
        tokens, _ = proc(ex)
        assert len(tokens) == 1024  # two examples pack per 2048 row
        needles = re.findall(
            r"special magic ([^:?]+?) number is: (\d{7})", ex["question"]
        )
        answers = re.findall(
            r"special magic ([^:?]+?) number is: (\d{7})", ex["answer"]
        )
        # 1 asked + 2 distractors, every one answered, values matching
        assert len(needles) == 3 and sorted(needles) == sorted(answers)
        # distinct cities so retrieval must be keyed
        assert len({c for c, _ in needles}) == 3


def test_haystack_lines_are_text_json(generated):
    lines = [json.loads(l) for l in open(generated / "hay.jsonl")]
    assert lines and all(
        isinstance(l["text"], str) and l["text"].endswith(". ") for l in lines
    )
