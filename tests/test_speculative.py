"""Speculative decoding: exact greedy parity with the target model for
any draft, full acceptance when draft == target, batching, GQA/int8
target compatibility; sampling mode's acceptance kernel obeys the
speculative-sampling lemma and end-to-end marginals match plain
ancestral sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwm_tpu.models import FlaxLLaMAForCausalLM, LLaMAConfig
from lwm_tpu.speculative import (
    _lookup_proposals,
    accept_and_emit,
    prompt_lookup_generate,
    speculative_generate,
)


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


class TestSamplingMode:
    def test_acceptance_kernel_emission_law(self):
        """Speculative-sampling lemma: with proposals drawn from d_probs,
        the token emitted at each position is distributed exactly as
        t_probs[i] — regardless of how different pd and pt are."""
        V, k, N = 5, 3, 40_000
        rng = np.random.default_rng(0)
        pd = rng.dirichlet(np.ones(V), size=k).astype(np.float32)
        pt = rng.dirichlet(np.ones(V), size=k + 1).astype(np.float32)

        def trial(key):
            pkey, akey = jax.random.split(key)
            props = jax.vmap(
                lambda kj, p: jax.random.categorical(kj, jnp.log(p))
            )(jax.random.split(pkey, k), jnp.asarray(pd)).astype(jnp.int32)
            m, c = accept_and_emit(akey, props, jnp.asarray(pd), jnp.asarray(pt))
            first = jnp.where(m >= 1, props[0], c)
            second = jnp.where(m >= 2, props[1], c)
            return first, second, m

        first, second, m = jax.jit(jax.vmap(trial))(
            jax.random.split(jax.random.PRNGKey(1), N)
        )
        first, second, m = map(np.asarray, (first, second, m))

        hist1 = np.bincount(first, minlength=V) / N
        np.testing.assert_allclose(hist1, pt[0], atol=0.02)
        # position 2 only emits when position 1 accepted; conditioned on
        # that, the lemma still gives exactly pt[1]
        sec = second[m >= 1]
        hist2 = np.bincount(sec, minlength=V) / len(sec)
        np.testing.assert_allclose(hist2, pt[1], atol=0.02)

    def test_end_to_end_marginals_match_plain_sampling(self):
        """Sequences from sampling-mode speculative decode are distributed
        as plain warped ancestral sampling from the target (per-position
        marginal comparison over many seeds; a mismatched draft)."""
        V, temp, new, N = 16, 1.0, 3, 400
        target = FlaxLLaMAForCausalLM(
            serving_config(layers=1, hidden=32, vocab_size=V,
                           num_attention_heads=2),
            input_shape=(1, 8), seed=0,
        )
        draft = FlaxLLaMAForCausalLM(
            serving_config(layers=1, hidden=16, vocab_size=V,
                           num_attention_heads=2),
            input_shape=(1, 8), seed=9,
        )
        ids = jnp.asarray([[1, 5, 2, 7]], jnp.int32)

        # plain ancestral oracle, one jitted program over all seeds
        # (fixed-size buffer: causal masking makes trailing zeros inert)
        prompt = ids.shape[1]

        def plain(key):
            def step(buf, ki):
                i, k_ = ki
                logits = target(buf, params=target.params).logits
                step_logits = jnp.take_along_axis(
                    logits, (prompt - 1 + i)[None, None, None].astype(jnp.int32)
                    .repeat(logits.shape[-1], -1), axis=1,
                )[:, 0] / temp
                tok = jax.random.categorical(k_, step_logits, axis=-1)
                buf = jax.lax.dynamic_update_slice(
                    buf, tok[:, None].astype(jnp.int32),
                    (0, (prompt + i).astype(jnp.int32)),
                )
                return buf, tok

            buf = jnp.zeros((1, prompt + new), jnp.int32)
            buf = jax.lax.dynamic_update_slice(buf, ids, (0, 0))
            _, toks = jax.lax.scan(
                step, buf,
                (jnp.arange(new), jax.random.split(key, new)),
            )
            return toks[:, 0]  # [new]

        plain_toks = np.asarray(
            jax.jit(jax.vmap(plain))(jax.random.split(jax.random.PRNGKey(2), N))
        )  # [N, new]

        spec_toks = np.stack([
            np.asarray(
                speculative_generate(
                    target, draft, target.params, draft.params, ids,
                    max_new_tokens=new, k=2, cache_len=64,
                    temperature=temp, prng_key=jax.random.PRNGKey(10_000 + i),
                ).sequences
            )[0, ids.shape[1]:]
            for i in range(N)
        ])  # [N, new]

        for pos in range(new):
            p = np.bincount(plain_toks[:, pos], minlength=V) / N
            q = np.bincount(spec_toks[:, pos], minlength=V) / N
            tv = 0.5 * np.abs(p - q).sum()
            assert tv < 0.15, (pos, tv, p, q)

    def test_low_temperature_matches_greedy(self):
        target = FlaxLLaMAForCausalLM(
            serving_config(layers=2), input_shape=(1, 8), seed=0
        )
        draft = FlaxLLaMAForCausalLM(
            serving_config(layers=1, hidden=32), input_shape=(1, 8), seed=7
        )
        ids = jax.random.randint(jax.random.PRNGKey(6), (1, 9), 2, 128)
        out = speculative_generate(
            target, draft, target.params, draft.params, ids,
            max_new_tokens=10, k=3, cache_len=128,
            temperature=1e-4, prng_key=jax.random.PRNGKey(0),
        )
        ref = greedy_rollout(target, target.params, ids, 10)
        np.testing.assert_array_equal(
            np.asarray(out.sequences), ref[:, : out.sequences.shape[1]]
        )

    def test_sampling_rejects_batch_gt_one(self):
        target = FlaxLLaMAForCausalLM(
            serving_config(layers=1), input_shape=(1, 8), seed=0
        )
        ids = jnp.ones((2, 6), jnp.int32)
        with pytest.raises(AssertionError, match="batch-1"):
            speculative_generate(
                target, target, target.params, target.params, ids,
                max_new_tokens=4, k=2, cache_len=64, temperature=1.0,
            )


class TestPromptLookup:
    def test_lookup_proposals_continue_last_occurrence(self):
        """Unit: trailing ngram [7,8,9] occurred twice earlier; proposals
        must continue the MOST RECENT earlier occurrence."""
        L, g, k = 32, 3, 4
        seq = np.zeros((2, L), np.int32)
        # row 0: ...7 8 9 (1 2 3 4)... then 7 8 9 (5 6 ...) then current 7 8 9
        seq[0, 2:9] = [7, 8, 9, 1, 2, 3, 4]
        seq[0, 10:15] = [7, 8, 9, 5, 6]
        n = 20
        seq[0, n - g + 1: n + 1] = [7, 8, 9]
        # row 1: no earlier occurrence of its trailing gram [3, 3, 3]
        seq[1, n - g + 1: n + 1] = [3, 3, 3]
        tok = jnp.asarray(seq[:, n])
        props = np.asarray(
            _lookup_proposals(jnp.asarray(seq), jnp.asarray(n), tok, k, g)
        )
        np.testing.assert_array_equal(props[0], [5, 6, 0, 0])  # recent one
        np.testing.assert_array_equal(props[1], [3, 3, 3, 3])  # fallback=tok

    def test_greedy_exact_any_proposals(self):
        """Lookup proposals are arbitrary guesses on a random model — the
        output must still be the target's exact greedy sequence."""
        target = FlaxLLaMAForCausalLM(
            serving_config(layers=2), input_shape=(1, 8), seed=0
        )
        # a prompt WITH internal repetition so the lookup actually fires
        ids = jnp.asarray(
            [[5, 6, 7, 8, 9, 5, 6, 7, 8, 9, 5, 6]], jnp.int32
        )
        out = prompt_lookup_generate(
            target, target.params, ids, max_new_tokens=14, k=4, ngram=3,
            cache_len=128,
        )
        ref = greedy_rollout(target, target.params, ids, 14)
        np.testing.assert_array_equal(
            np.asarray(out.sequences), ref[:, : out.sequences.shape[1]]
        )

    def test_greedy_exact_batched(self):
        target = FlaxLLaMAForCausalLM(
            serving_config(layers=2), input_shape=(1, 8), seed=0
        )
        ids = jax.random.randint(jax.random.PRNGKey(8), (3, 10), 2, 128)
        out = prompt_lookup_generate(
            target, target.params, ids, max_new_tokens=10, k=3, ngram=2,
            cache_len=128,
        )
        ref = greedy_rollout(target, target.params, ids, 10)
        np.testing.assert_array_equal(
            np.asarray(out.sequences), ref[:, : out.sequences.shape[1]]
        )

    def test_sampling_marginals_match_plain(self):
        """Delta-proposal rejection sampling (one-hot d_probs) still emits
        exactly the target distribution."""
        V, temp, new, N = 16, 1.0, 3, 600
        target = FlaxLLaMAForCausalLM(
            serving_config(layers=1, hidden=32, vocab_size=V,
                           num_attention_heads=2),
            input_shape=(1, 8), seed=0,
        )
        ids = jnp.asarray([[1, 5, 2, 7]], jnp.int32)
        prompt = ids.shape[1]

        def plain(key):
            def step(buf, ki):
                i, k_ = ki
                logits = target(buf, params=target.params).logits
                step_logits = jnp.take_along_axis(
                    logits, (prompt - 1 + i)[None, None, None].astype(jnp.int32)
                    .repeat(logits.shape[-1], -1), axis=1,
                )[:, 0] / temp
                tok = jax.random.categorical(k_, step_logits, axis=-1)
                buf = jax.lax.dynamic_update_slice(
                    buf, tok[:, None].astype(jnp.int32),
                    (0, (prompt + i).astype(jnp.int32)),
                )
                return buf, tok

            buf = jnp.zeros((1, prompt + new), jnp.int32)
            buf = jax.lax.dynamic_update_slice(buf, ids, (0, 0))
            _, toks = jax.lax.scan(
                step, buf, (jnp.arange(new), jax.random.split(key, new))
            )
            return toks[:, 0]

        plain_toks = np.asarray(
            jax.jit(jax.vmap(plain))(jax.random.split(jax.random.PRNGKey(3), N))
        )
        spec_toks = np.stack([
            np.asarray(
                prompt_lookup_generate(
                    target, target.params, ids, max_new_tokens=new, k=2,
                    ngram=2, cache_len=64, temperature=temp,
                    prng_key=jax.random.PRNGKey(20_000 + i),
                ).sequences
            )[0, prompt:]
            for i in range(N)
        ])
        for pos in range(new):
            p = np.bincount(plain_toks[:, pos], minlength=V) / N
            q = np.bincount(spec_toks[:, pos], minlength=V) / N
            tv = 0.5 * np.abs(p - q).sum()
            assert tv < 0.15, (pos, tv, p, q)


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
