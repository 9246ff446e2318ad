"""End-to-end trainer regression: a short run through the real CLI on the
8-device CPU mesh — ring attention path, sharded loader, checkpoint save,
autoresume. Slow (~2-4 min); the canary for the whole stack."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_train(tmp_path, jsonl, extra):
    code = f"""
import sys, jax
jax.config.update("jax_platforms", "cpu")
sys.argv = [
    "train", "--mesh_dim=1,2,1,4", "--dtype=fp32",
    "--log_freq=2",
    "--tokenizer={REPO}/tests/fixtures/tokenizer",
    "--load_llama_config=debug",
    "--update_llama_config=dict(max_sequence_length=256,hidden_size=64,intermediate_size=128,num_attention_heads=4,theta=10000,scan_attention=True,scan_query_chunk_size=32,scan_key_chunk_size=32,scan_mlp=True,scan_mlp_chunk_size=32,scan_layers=True)",
    "--train_dataset.type=json",
    "--train_dataset.text_processor.fields=text",
    "--train_dataset.json_dataset.path={jsonl}",
    "--train_dataset.json_dataset.seq_length=64",
    "--train_dataset.json_dataset.batch_size=8",
    "--optimizer.adamw_optimizer.lr=3e-3",
    "--optimizer.adamw_optimizer.lr_warmup_steps=2",
    "--optimizer.adamw_optimizer.lr_decay_steps=50",
    "--logger.output_dir={tmp_path}",
    "--logger.experiment_id=e2e", "--logger.append_uuid=False",
] + {extra!r}
from lwm_tpu.train import run
run()
"""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO
    result = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=500,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    return result


@pytest.fixture()
def jsonl(tmp_path):
    import random

    random.seed(0)
    words = ["the", "magic", "number", "needle", "haystack", "model"]
    path = tmp_path / "train.jsonl"
    with open(path, "w") as f:
        for _ in range(500):
            f.write(
                json.dumps({"text": " ".join(random.choices(words, k=20))}) + "\n"
            )
    return str(path)


def test_train_checkpoint_autoresume(tmp_path, jsonl):
    run_train(
        tmp_path, jsonl,
        ["--total_steps=6", "--save_model_freq=5",
         "--checkpointer.save_optimizer_state=True", "--autoresume=True"],
    )
    exp = tmp_path / "e2e"
    assert (exp / "streaming_train_state").exists()
    assert (exp / "dataset.pkl").exists()
    metrics = [json.loads(l) for l in open(exp / "metrics.jsonl")]
    losses = [m["loss"] for m in metrics if "loss" in m]
    # vocab 32000 → initial CE ≈ ln(32000) ≈ 10.4; must descend, not blow up
    assert losses and losses[-1] < losses[0], losses

    # autoresume continues from step 5
    run_train(
        tmp_path, jsonl,
        ["--total_steps=10", "--save_model_freq=5",
         "--checkpointer.save_optimizer_state=True", "--autoresume=True"],
    )
    metrics = [json.loads(l) for l in open(exp / "metrics.jsonl")]
    steps = [m["step"] for m in metrics if "step" in m]
    assert max(steps) == 10, steps


def test_train_params_warm_start(tmp_path, jsonl):
    """`--load_checkpoint=params::` warm start: fresh optimizer, params from
    a prior run's streaming_params (regression: the checkpointer returns a
    FrozenDict while the TrainState pytree uses plain dicts — the trainer
    must reconcile the container types before the pjit'd trainstate build)."""
    run_train(
        tmp_path, jsonl,
        ["--total_steps=4", "--save_model_freq=3"],
    )
    params_ckpt = tmp_path / "e2e" / "streaming_params"
    assert params_ckpt.exists()
    warm = tmp_path / "warm"
    run_train(
        warm, jsonl,
        ["--total_steps=4", "--save_model_freq=0",
         f"--load_checkpoint=params::{params_ckpt}"],
    )
    metrics = [json.loads(l) for l in open(warm / "e2e" / "metrics.jsonl")]
    losses = [m["loss"] for m in metrics if "loss" in m]
    # warm-started params continue from run-1's trained values, so the very
    # first logged loss sits below fresh-init CE ≈ ln(32000) ≈ 10.37
    assert losses and losses[0] < 10.0, losses
