"""End-to-end needle validation on a from-scratch model (VERDICT round-1
item 6 / reference behavior scripts/eval_needle.py:303-424).

Pipeline, all through the real framework surfaces:
  1. generate synthetic retrieval training data (haystack filler + the
     eval's exact needle/question/answer format, reference
     eval_needle.py needle_template)
  2. train a small scan_layers model with `python -m lwm_tpu.train`
  3. convert the streaming checkpoint scan->unscan
     (checkpoint_convert.unscan_params via apps.convert_checkpoint)
  4. round-trip it through HF torch (streaming_to_hf -> hf_to_streaming)
  5. run `lwm_tpu.apps.eval_needle` on the round-tripped checkpoint and
     require a nonzero retrieval score

Usage: python scripts/validate_needle_e2e.py [workdir]
Writes RESULTS to <workdir>/needle_results.json and prints the score.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOKENIZER = os.path.join(REPO, "tests", "fixtures", "tokenizer")

CITIES = [
    "Chicago", "Yangon", "Antananarivo", "Colombo", "Almaty", "Sydney",
    "Seattle", "Lagos", "Amsterdam", "Belgrade", "Cairo", "Baghdad",
    "Tashkent", "Mumbai", "Barcelona", "Amman", "Toronto", "Bangkok",
    "Paris", "Rabat", "Copenhagen", "Madrid", "Sarajevo", "Delhi",
    "Helsinki", "Doha", "Budapest", "Shanghai", "Moscow", "Oslo",
    "Berlin", "Tokyo", "Melbourne", "Lisbon", "Nairobi", "Lima",
    "Dubai", "Jakarta", "Yerevan", "Beirut", "Athens", "Bucharest",
]

FILLER_WORDS = (
    "the quick brown fox jumps over a lazy dog while rain falls on green "
    "hills and ships sail across the wide grey sea toward distant harbors "
    "carrying grain wine cloth and stories from far away lands"
).split()


def filler_sentence(rng):
    n = rng.randint(6, 14)
    words = [rng.choice(FILLER_WORDS) for _ in range(n)]
    return " ".join(words).capitalize() + "."


def make_episode(rng, n_filler=24):
    """One training document in the eval's exact prompt format."""
    city = rng.choice(CITIES)
    number = rng.randint(10**6, 10**7 - 1)
    needle = f"\nThe special magic {city} number is: {number}\n"
    sentences = [filler_sentence(rng) for _ in range(n_filler)]
    pos = rng.randint(0, len(sentences))
    sentences.insert(pos, needle.strip())
    context = " ".join(sentences)
    question = f"What is the special magic {city} number?"
    prompt = (
        "You are a helpful assistant. USER: {context} {question} Don't give "
        "information outside the document or repeat your findings. Keep your "
        "response short and direct. ASSISTANT: "
    ).format(context=context, question=question)
    return {"prompt": prompt, "answer": f" {number}"}


def sh(args, **env):
    e = dict(os.environ)
    e.update({k: str(v) for k, v in env.items()})
    print("+", " ".join(args[:6]), "...", flush=True)
    subprocess.run(args, check=True, env=e, cwd=REPO)


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/needle_e2e"
    os.makedirs(work, exist_ok=True)
    rng = random.Random(0)

    train_path = os.path.join(work, "train.jsonl")
    if not os.path.exists(train_path):
        with open(train_path, "w") as f:
            for _ in range(20000):
                ep = make_episode(rng)
                f.write(json.dumps({"prompt": ep["prompt"], "answer": ep["answer"]}) + "\n")

    haystack_path = os.path.join(work, "haystack.jsonl")
    if not os.path.exists(haystack_path):
        with open(haystack_path, "w") as f:
            for _ in range(3000):
                f.write(json.dumps({"text": filler_sentence(rng) + " "}) + "\n")

    # max_seq 4096 > train seq 1024: the eval left-pads prompts to a
    # block_size multiple plus its own 1024-token buffer; block_size 128
    # keeps greedy decode short (max_new_tokens = block_size)
    model_updates = (
        "dict(max_sequence_length=4096,hidden_size=256,intermediate_size=768,"
        "num_hidden_layers=4,num_attention_heads=4,vocab_size=32000,"
        "scan_attention=False,scan_mlp=False,scan_layers=True,param_scan_axis=0,"
        "scan_query_chunk_size=128,scan_key_chunk_size=128,theta=10000)"
    )
    out_dir = os.path.join(work, "run")
    ckpt = os.path.join(out_dir, "needle", "streaming_params")
    if not os.path.exists(ckpt):
        sh([
            sys.executable, "-m", "lwm_tpu.train",
            "--mesh_dim=1,1,1,1", "--dtype=fp32",
            f"--tokenizer={TOKENIZER}",
            "--load_llama_config=debug",
            f"--update_llama_config={model_updates}",
            "--total_steps=1500", "--log_freq=100",
            "--save_model_freq=1500",
            "--train_dataset.type=json",
            # loss only on the answer tokens: prompt is loss-masked
            "--train_dataset.text_processor.fields=[prompt],answer",
            f"--train_dataset.json_dataset.path={train_path}",
            "--train_dataset.json_dataset.seq_length=1024",
            "--train_dataset.json_dataset.batch_size=16",
            "--optimizer.adamw_optimizer.lr=1e-3",
            "--optimizer.adamw_optimizer.end_lr=1e-4",
            "--optimizer.adamw_optimizer.lr_warmup_steps=100",
            "--optimizer.adamw_optimizer.lr_decay_steps=1500",
            "--optimizer.adamw_optimizer.weight_decay=0.01",
            f"--logger.output_dir={out_dir}",
            "--logger.experiment_id=needle", "--logger.append_uuid=False",
        ])

    # scan -> unscan (serving layout), then round-trip through HF torch
    unscanned = os.path.join(work, "params_unscanned")
    sh([
        sys.executable, "-m", "lwm_tpu.apps.convert_checkpoint",
        "--direction=unscan", f"--streaming_path={ckpt}",
        f"--output={unscanned}", "--llama_config=debug",
        f"--update_llama_config={model_updates}",
        "--scan_layers=True", "--param_scan_axis=0",
    ])
    hf_dir = os.path.join(work, "hf_model")
    sh([
        sys.executable, "-m", "lwm_tpu.apps.convert_checkpoint",
        "--direction=streaming_to_hf", f"--streaming_path={unscanned}",
        f"--output={hf_dir}", "--llama_config=debug",
        f"--update_llama_config={model_updates}", "--scan_layers=False",
    ])
    roundtrip = os.path.join(work, "params_roundtrip")
    sh([
        sys.executable, "-m", "lwm_tpu.apps.convert_checkpoint",
        "--direction=hf_to_streaming", f"--hf_path={hf_dir}",
        f"--output={roundtrip}", "--llama_config=debug",
        f"--update_llama_config={model_updates}", "--scan_layers=False",
    ])

    results = os.path.join(work, "needle_results.json")
    if os.path.exists(results):
        os.remove(results)
    sh([
        sys.executable, "-m", "lwm_tpu.apps.eval_needle",
        f"--haystack_file={haystack_path}",
        f"--output_file={results}",
        "--context_lengths_min=600", "--context_lengths_max=900",
        "--n_context_length_intervals=2",
        "--n_document_depth_intervals=3", "--n_rounds=2",
        "--mesh_dim=1,1,1,1", "--dtype=fp32",
        "--load_llama_config=debug",
        f"--update_llama_config={model_updates.replace('scan_layers=True', 'scan_layers=False')}",
        f"--load_checkpoint=params::{roundtrip}",
        f"--tokenizer={TOKENIZER}",
        "--max_tokens_per_batch=8192",
    ])

    with open(results) as f:
        entries = json.load(f)
    scores = [e["correct"] for e in entries]
    acc = sum(scores) / max(1, len(scores))
    print(f"NEEDLE E2E: {sum(scores)}/{len(scores)} correct = {acc:.2%}")
    assert acc > 0, "needle retrieval score must be nonzero"
    return acc


if __name__ == "__main__":
    main()
