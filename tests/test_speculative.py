"""Speculative decoding: exact greedy parity with the target model for
any draft, full acceptance when draft == target, batching, GQA/int8
target compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwm_tpu.models import FlaxLLaMAForCausalLM, LLaMAConfig
from lwm_tpu.speculative import speculative_generate


def serving_config(layers=2, hidden=64, **kw):
    base = dict(
        vocab_size=128,
        hidden_size=hidden,
        intermediate_size=hidden * 2,
        num_hidden_layers=layers,
        num_attention_heads=4,
        max_sequence_length=2048,
        scan_attention=False,
        scan_mlp=False,
        scan_layers=False,
        mesh_dim=None,
    )
    base.update(kw)
    return LLaMAConfig(**base)


def greedy_rollout(model, params, ids, new_tokens):
    """Plain greedy decoding by repeated full forwards (oracle)."""
    cur = jnp.asarray(ids)
    for _ in range(new_tokens):
        logits = model(cur, params=params).logits
        nxt = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(cur.dtype)
        cur = jnp.concatenate([cur, nxt], axis=1)
    return np.asarray(cur)


class TestGreedyParity:
    @pytest.mark.parametrize("k", [1, 3, 7])
    def test_mismatched_draft_exact(self, k):
        """An unrelated random draft must still yield the target's exact
        greedy output (only throughput may suffer)."""
        target = FlaxLLaMAForCausalLM(
            serving_config(layers=2), input_shape=(1, 8), seed=0
        )
        draft = FlaxLLaMAForCausalLM(
            serving_config(layers=1, hidden=32), input_shape=(1, 8), seed=7
        )
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 12), 2, 128)
        out = speculative_generate(
            target, draft, target.params, draft.params, ids,
            max_new_tokens=16, k=k, cache_len=128,
        )
        ref = greedy_rollout(target, target.params, ids, 16)
        np.testing.assert_array_equal(
            np.asarray(out.sequences), ref[:, : out.sequences.shape[1]]
        )

    def test_batched_rows_exact(self):
        target = FlaxLLaMAForCausalLM(
            serving_config(layers=2), input_shape=(1, 8), seed=0
        )
        draft = FlaxLLaMAForCausalLM(
            serving_config(layers=1, hidden=32), input_shape=(1, 8), seed=7
        )
        ids = jax.random.randint(jax.random.PRNGKey(3), (3, 10), 2, 128)
        out = speculative_generate(
            target, draft, target.params, draft.params, ids,
            max_new_tokens=12, k=3, cache_len=128,
        )
        ref = greedy_rollout(target, target.params, ids, 12)
        np.testing.assert_array_equal(
            np.asarray(out.sequences), ref[:, : out.sequences.shape[1]]
        )


class TestAcceptance:
    def test_draft_equals_target_accepts_everything(self):
        """draft == target → every draft token verifies; k+1 tokens per
        verify forward."""
        model = FlaxLLaMAForCausalLM(
            serving_config(layers=2), input_shape=(1, 8), seed=0
        )
        ids = jax.random.randint(jax.random.PRNGKey(4), (1, 8), 2, 128)
        k, new = 3, 16
        out = speculative_generate(
            model, model, model.params, model.params, ids,
            max_new_tokens=new, k=k, cache_len=128,
        )
        steps = int(out.steps)
        accepted = int(out.accepted)
        assert accepted == steps * k, (accepted, steps)
        # ceil(new / (k+1)) verify forwards suffice at full acceptance
        assert steps == -(-new // (k + 1)), steps
        ref = greedy_rollout(model, model.params, ids, new)
        np.testing.assert_array_equal(
            np.asarray(out.sequences), ref[:, : out.sequences.shape[1]]
        )


class TestHeterogeneousTargets:
    def test_gqa_int8_target(self):
        """Target with a GQA int8 cache; draft plain MHA — caches are
        independent, the contract is unchanged (int8 changes which greedy
        sequence the TARGET produces, so the oracle uses the same cache
        config via generate)."""
        target = FlaxLLaMAForCausalLM(
            serving_config(layers=2, num_key_value_heads=2,
                           kv_cache_dtype="int8"),
            input_shape=(1, 8), seed=0,
        )
        draft = FlaxLLaMAForCausalLM(
            serving_config(layers=1, hidden=32), input_shape=(1, 8), seed=7
        )
        ids = jax.random.randint(jax.random.PRNGKey(5), (1, 10), 2, 128)
        out = speculative_generate(
            target, draft, target.params, draft.params, ids,
            max_new_tokens=8, k=3, cache_len=128,
        )
        # int8-cache greedy oracle: HF generate with the same cache dtype
        ref = target.generate(
            ids, max_new_tokens=8, do_sample=False, pad_token_id=0,
            eos_token_id=None,
        ).sequences
        np.testing.assert_array_equal(
            np.asarray(out.sequences), np.asarray(ref)[:, :out.sequences.shape[1]]
        )
