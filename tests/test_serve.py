"""In-flight batching server (lwm_tpu/serve.py) + per-row decode cache
writes (models/llama.py decode_index='per_row').

The load-bearing property: a request served in-flight — admitted into a
half-busy pool, decoding next to slots at other depths — must emit
exactly what a standalone batch-1 greedy rollout emits. Everything else
(admission order, slot reuse, stop tokens, temperature plumbing) layers
on that.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwm_tpu.models import FlaxLLaMAForCausalLM, LLaMAConfig
from lwm_tpu.serve import InflightServer


def serving_config(**kw):
    base = dict(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_sequence_length=256, scan_attention=False, scan_mlp=False,
        scan_layers=False, mesh_dim=None, attn_impl="xla",
        decode_index="per_row",
    )
    base.update(kw)
    return LLaMAConfig(**base)


def greedy_rollout(model, params, prompt, new):
    """Oracle: full re-forward batch-1 greedy decode."""
    seq = np.asarray(prompt, np.int32).reshape(1, -1)
    for _ in range(new):
        logits = model(jnp.asarray(seq), params=params).logits
        seq = np.concatenate(
            [seq, [[int(jnp.argmax(logits[0, -1]))]]], axis=1
        )
    return seq[0, len(prompt):]


@pytest.fixture(scope="module")
def model():
    return FlaxLLaMAForCausalLM(serving_config(), input_shape=(1, 8), seed=0)


class TestPerRowCacheWrites:
    def test_rows_land_at_their_positions(self, model):
        """Two rows decoding at different depths write their k/v at their
        own positions, and a shared-index model at the same depth agrees
        row-by-row."""
        cfg = serving_config()
        m = FlaxLLaMAForCausalLM(cfg, input_shape=(1, 8), seed=0)
        T = 32
        cache = m.init_cache(2, T)

        # prefill rows together to depth 4 (positions 0..3)
        ids = jax.random.randint(jax.random.PRNGKey(0), (2, 4), 2, 120)
        mask = (jnp.arange(T)[None] < 4).astype("i4").repeat(2, 0)
        pos = jnp.broadcast_to(jnp.arange(4, dtype="i4"), (2, 4))
        _, vars_ = m.module.apply(
            {"params": m.params, "cache": cache}, ids, mask, None, pos,
            True, False, False, False, True, mutable=["cache"],
        )
        cache = vars_["cache"]

        # now decode row 0 at position 4 and row 1 at position 7
        lengths = jnp.asarray([4, 7], jnp.int32)
        tok = jnp.asarray([[9], [11]], jnp.int32)
        mask = (jnp.arange(T)[None] <= lengths[:, None]).astype("i4")
        from lwm_tpu.serve import _set_cache_index

        cache = _set_cache_index(cache, jnp.max(lengths))
        _, vars_ = m.module.apply(
            {"params": m.params, "cache": cache},
            tok, mask, None, lengths[:, None],
            True, False, False, False, True, mutable=["cache"],
        )
        ck = vars_["cache"]["transformer"]["h"]["0"]["attention"]["cached_key"]
        # head-major [b, h, T, d]: row 0 wrote position 4, row 1 position 7
        assert np.abs(np.asarray(ck[0, :, 4])).sum() > 0
        assert np.abs(np.asarray(ck[1, :, 7])).sum() > 0
        assert np.abs(np.asarray(ck[0, :, 5:])).sum() == 0
        assert np.abs(np.asarray(ck[1, :, 5:7])).sum() == 0


class TestInflightServer:
    def test_single_request_matches_rollout(self, model):
        srv = InflightServer(
            model, model.params, slots=2, cache_len=64,
            prompt_buckets=(8, 16),
        )
        prompt = [5, 9, 2, 77, 31]
        rid = srv.submit(prompt, max_new_tokens=10)
        done = srv.run()
        assert [f.req_id for f in done] == [rid]
        np.testing.assert_array_equal(
            done[0].tokens, greedy_rollout(model, model.params, prompt, 10)
        )

    def test_staggered_admission_exactness(self, model):
        """Admit a second request while the first is mid-decode: both must
        match their solo rollouts (slots at different depths in one
        decode batch)."""
        srv = InflightServer(
            model, model.params, slots=2, cache_len=64,
            prompt_buckets=(8, 16),
        )
        p1 = [3, 14, 15, 92, 65, 35]
        p2 = [27, 18, 28]
        r1 = srv.submit(p1, max_new_tokens=12)
        for _ in range(4):   # run r1 alone for a few steps
            srv.step()
        r2 = srv.submit(p2, max_new_tokens=9)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[r1].tokens, greedy_rollout(model, model.params, p1, 12)
        )
        np.testing.assert_array_equal(
            done[r2].tokens, greedy_rollout(model, model.params, p2, 9)
        )

    def test_more_requests_than_slots(self, model):
        """5 requests through 2 slots: slot reuse after retirement, all
        outputs exact, completion covers every id."""
        srv = InflightServer(
            model, model.params, slots=2, cache_len=64,
            prompt_buckets=(8,),
        )
        prompts = [
            [7, 3], [100, 90, 80, 70], [1, 2, 3], [42], [9, 9, 9, 9, 9],
        ]
        news = [6, 4, 8, 3, 5]
        ids = [srv.submit(p, n) for p, n in zip(prompts, news)]
        done = {f.req_id: f for f in srv.run()}
        assert set(done) == set(ids)
        for rid, p, n in zip(ids, prompts, news):
            np.testing.assert_array_equal(
                done[rid].tokens, greedy_rollout(model, model.params, p, n)
            )

    def test_stop_token(self, model):
        """A stop token retires the request early, flagged 'eos'."""
        # find what the model emits greedily, then declare its 3rd token
        # a stop token
        prompt = [5, 9, 2, 77, 31]
        toks = greedy_rollout(model, model.params, prompt, 8)
        stop = int(toks[2])
        srv = InflightServer(
            model, model.params, slots=1, cache_len=64,
            prompt_buckets=(8,), stop_tokens=(stop,),
        )
        srv.submit(prompt, max_new_tokens=8)
        done = srv.run()
        assert done[0].stopped == "eos"
        np.testing.assert_array_equal(done[0].tokens, toks[:3])

    def test_sampling_reproducible_and_divergent(self, model):
        """temperature > 0: same seed → same tokens; different seed →
        (overwhelmingly) different."""
        prompt = [5, 9, 2, 77, 31]

        def run(seed):
            srv = InflightServer(
                model, model.params, slots=1, cache_len=64,
                prompt_buckets=(8,), seed=seed,
            )
            srv.submit(prompt, max_new_tokens=12, temperature=1.0)
            return srv.run()[0].tokens

        a, b, c = run(7), run(7), run(8)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_int8_cache_pool(self):
        """Per-row writes cover the quantized cache scales too."""
        m = FlaxLLaMAForCausalLM(
            serving_config(kv_cache_dtype="int8"), input_shape=(1, 8), seed=0
        )
        srv = InflightServer(
            m, m.params, slots=2, cache_len=64, prompt_buckets=(8,),
        )
        p1, p2 = [3, 14, 15, 92], [27, 18]
        r1 = srv.submit(p1, max_new_tokens=6)
        srv.step(); srv.step()
        r2 = srv.submit(p2, max_new_tokens=6)
        done = {f.req_id: f for f in srv.run()}
        # int8 path: compare against the SAME model's solo rollout through
        # its own quantized cache (generate), not the fp oracle
        for rid, p in [(r1, p1), (r2, p2)]:
            want = m.generate(
                jnp.asarray([p], jnp.int32), params=m.params,
                max_length=len(p) + 6, do_sample=False, pad_token_id=0,
            ).sequences[0, len(p):]
            np.testing.assert_array_equal(done[rid].tokens, np.asarray(want))

    def test_tp_sharded_pool(self, model):
        """Sharded serving: an fsdp=2 x tp=4 mesh (sp=1, all 8 forced-CPU
        devices) pool with staggered admission matches the unsharded solo
        rollouts."""
        cfg = serving_config(mesh_dim="1,2,4,1")
        m = FlaxLLaMAForCausalLM(
            cfg, input_shape=(1, 8), seed=0, _do_init=False
        )
        mesh = type(cfg).get_jax_mesh("1,2,4,1")
        srv = InflightServer(
            m, model.params, slots=2, cache_len=64, prompt_buckets=(8,),
            mesh=mesh,
        )
        p1, p2 = [3, 14, 15, 92, 65], [27, 18, 28]
        r1 = srv.submit(p1, max_new_tokens=8)
        srv.step(); srv.step()
        r2 = srv.submit(p2, max_new_tokens=6)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[r1].tokens, greedy_rollout(model, model.params, p1, 8)
        )
        np.testing.assert_array_equal(
            done[r2].tokens, greedy_rollout(model, model.params, p2, 6)
        )

    def test_sp_slot_pool_matches_solo(self, model):
        """sp>1 WITHOUT a prefix: each slot's suffix cache shards over sp
        (VERDICT r3 task 5 — long per-request contexts with no shared
        document). Staggered admission on a 1,1,2,2 mesh must emit
        exactly the unsharded solo rollouts (the per-row decode write
        routes to the sp shard owning the row's position)."""
        cfg = serving_config(mesh_dim="1,2,2,2")
        m = FlaxLLaMAForCausalLM(
            cfg, input_shape=(1, 8), seed=0, _do_init=False
        )
        mesh = type(cfg).get_jax_mesh("1,2,2,2")
        srv = InflightServer(
            m, model.params, slots=2, cache_len=64, prompt_buckets=(8,),
            mesh=mesh,
        )
        assert srv._sp_slots
        p1, p2 = [3, 14, 15, 92, 65], [27, 18, 28]
        r1 = srv.submit(p1, max_new_tokens=8)
        srv.step(); srv.step()
        r2 = srv.submit(p2, max_new_tokens=6)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[r1].tokens, greedy_rollout(model, model.params, p1, 8)
        )
        np.testing.assert_array_equal(
            done[r2].tokens, greedy_rollout(model, model.params, p2, 6)
        )

    def test_sp_slot_pool_chunked_admission(self, model):
        """Chunked (Sarathi-style) admission into an sp-sharded slot pool:
        the staged small cache prefills in chunks, then adopts into the
        sp-sharded pool. Exactness again."""
        cfg = serving_config(mesh_dim="1,2,1,4")
        m = FlaxLLaMAForCausalLM(
            cfg, input_shape=(1, 8), seed=0, _do_init=False
        )
        mesh = type(cfg).get_jax_mesh("1,2,1,4")
        srv = InflightServer(
            m, model.params, slots=2, cache_len=64, prompt_buckets=(8,),
            mesh=mesh, admit_chunk=8,
        )
        rng = np.random.default_rng(5)
        p = rng.integers(2, 120, 19).tolist()
        rid = srv.submit(p, max_new_tokens=6)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[rid].tokens, greedy_rollout(model, model.params, p, 6)
        )

    def test_sp_slots_lookup_exact_hostile_proposals(self, model):
        """lookup_k on an sp=2 (dp-and-tp too, 1,2,2,2) mesh (VERDICT r4 task 7): random-weight
        model → proposals are hostile; the widened per-row verify writes
        must still land exactly on the sp-sharded slot caches."""
        cfg = serving_config(mesh_dim="1,2,2,2")
        m = FlaxLLaMAForCausalLM(
            cfg, input_shape=(1, 8), seed=0, _do_init=False
        )
        mesh = type(cfg).get_jax_mesh("1,2,2,2")
        srv = InflightServer(
            m, model.params, slots=2, cache_len=64, prompt_buckets=(8,),
            mesh=mesh, lookup_k=7,
        )
        p1, p2 = [3, 14, 15, 92, 65], [27, 18, 28]
        r1 = srv.submit(p1, max_new_tokens=10)
        srv.step()
        r2 = srv.submit(p2, max_new_tokens=7)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[r1].tokens, greedy_rollout(model, model.params, p1, 10)
        )
        np.testing.assert_array_equal(
            done[r2].tokens, greedy_rollout(model, model.params, p2, 7)
        )

    def test_sp_slots_lookup_block_straddles_shard(self, model, monkeypatch):
        """Oracle proposals force full 8-wide accepted verify blocks that
        must cross an sp shard boundary (cache 128, sp=4 → boundaries at
        32/64/96) while decoding 40 tokens from a depth-5 prompt. Every
        emitted token must equal the batch-1 greedy rollout — the
        straddling block write routes each token to its owning shard."""
        import lwm_tpu.serve as serve_mod

        p = [5, 9, 2, 77, 31]
        # fixed-shape oracle: one compile for all 40 steps (the growing-
        # shape rollout helper would recompile per emitted token)
        L = len(p) + 40
        seq = np.zeros((1, L), np.int32)
        seq[0, :len(p)] = p
        fwd = jax.jit(
            lambda ids, mask: model(
                ids, attention_mask=mask, params=model.params
            ).logits
        )
        n = len(p)
        for _ in range(40):
            mask = (np.arange(L) < n).astype(np.int32)[None]
            logits = fwd(jnp.asarray(seq), jnp.asarray(mask))
            seq[0, n] = int(jnp.argmax(logits[0, n - 1]))
            n += 1
        want = seq[0, len(p):]
        future = list(want)

        def oracle(ctx, k, ngram):
            done_n = len(ctx) - len(p) - 1
            nxt = future[done_n + 1: done_n + 1 + k]
            if len(nxt) < k:
                nxt = nxt + [0] * (k - len(nxt))
            return np.asarray(nxt, np.int32)

        monkeypatch.setattr(serve_mod, "_lookup_proposal", oracle)
        cfg = serving_config(mesh_dim="1,1,2,4")
        m = FlaxLLaMAForCausalLM(
            cfg, input_shape=(1, 8), seed=0, _do_init=False
        )
        mesh = type(cfg).get_jax_mesh("1,1,2,4")
        srv = InflightServer(
            m, model.params, slots=2, cache_len=128, prompt_buckets=(8,),
            mesh=mesh, lookup_k=7,
        )
        rid = srv.submit(p, max_new_tokens=40)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(done[rid].tokens, want)
        # 1 admission token + 39 more in ceil(39/8) = 5 verify rounds:
        # acceleration survives the sp-sharded cache
        assert srv._step <= 6, f"took {srv._step} rounds for 40 tokens"

    def test_sp_slots_lookup_width_bound(self, model):
        cfg = serving_config(mesh_dim="1,2,2,2")
        m = FlaxLLaMAForCausalLM(
            cfg, input_shape=(1, 8), seed=0, _do_init=False
        )
        mesh = type(cfg).get_jax_mesh("1,2,2,2")
        with pytest.raises(ValueError, match="lookup_k"):
            InflightServer(
                m, None, slots=2, cache_len=64, mesh=mesh, lookup_k=64
            )

    def test_rejects_shared_index_model(self, model):
        m = FlaxLLaMAForCausalLM(
            serving_config(decode_index="shared"), input_shape=(1, 8), seed=0
        )
        with pytest.raises(ValueError, match="per_row"):
            InflightServer(m, m.params, slots=1, cache_len=64)

    def test_budget_validation(self, model):
        srv = InflightServer(
            model, model.params, slots=1, cache_len=32, prompt_buckets=(8,),
        )
        assert srv.cache_len == 128  # rounded up for the decode kernels
        with pytest.raises(ValueError, match="exceeds"):
            srv.submit([1, 2, 3], max_new_tokens=126)


class TestSharedPrefix:
    """Shared-prefix pools (prefix_ids=): every request must emit exactly
    what a plain greedy rollout over [prefix + prompt] emits, while the
    slot caches hold only the suffix."""

    def test_prefix_pool_matches_full_rollout(self, model):
        prefix = list(range(2, 42))          # 40-token shared document
        srv = InflightServer(
            model, model.params, slots=2, cache_len=64,
            prompt_buckets=(8,), prefix_ids=prefix,
        )
        # suffix-only cache: pool seq dim is cache_len (rounded up to the
        # kernels' 128 multiple), prefix block is 128
        ck = srv.cache["transformer"]["h"]["0"]["attention"]
        assert ck["cached_key"].shape[2] == 128
        assert ck["prefix_key"].shape == (
            1, ck["cached_key"].shape[1], 128, ck["cached_key"].shape[3],
        )

        p1, p2 = [3, 14, 15, 92], [27, 18, 28, 66, 91]
        r1 = srv.submit(p1, max_new_tokens=8)
        srv.step(); srv.step()               # staggered depths
        r2 = srv.submit(p2, max_new_tokens=6)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[r1].tokens,
            greedy_rollout(model, model.params, prefix + p1, 8),
        )
        np.testing.assert_array_equal(
            done[r2].tokens,
            greedy_rollout(model, model.params, prefix + p2, 6),
        )

    def test_prefix_chunked_build_and_slot_reuse(self, model):
        """A prefix longer than the build chunk (forcing the multi-chunk
        prefill loop) + more requests than slots (slot retirement with the
        prefix in place)."""
        rng = np.random.default_rng(0)
        prefix = rng.integers(2, 120, 70).tolist()
        srv = InflightServer(
            model, model.params, slots=2, cache_len=64,
            prompt_buckets=(8,), prefix_ids=prefix, prefix_chunk=32,
        )
        prompts = [[3, 14, 15], [27, 18], [92, 65, 35, 89], [7, 9]]
        rids = [srv.submit(p, max_new_tokens=5) for p in prompts]
        done = {f.req_id: f for f in srv.run()}
        assert set(done) == set(rids)
        for rid, p in zip(rids, prompts):
            np.testing.assert_array_equal(
                done[rid].tokens,
                greedy_rollout(model, model.params, prefix + p, 5),
            )

    def test_prefix_int8_cache(self, model):
        """int8 KV cache: the prefix block quantizes through the same
        cache layer (scales ride along); outputs match the int8-cache
        model's own full rollout."""
        cfg = serving_config(kv_cache_dtype="int8")
        m = FlaxLLaMAForCausalLM(cfg, input_shape=(1, 8), seed=0)
        prefix = list(range(2, 34))
        srv = InflightServer(
            m, m.params, slots=2, cache_len=64,
            prompt_buckets=(8,), prefix_ids=prefix,
        )
        ck = srv.cache["transformer"]["h"]["0"]["attention"]
        assert ck["prefix_key"].dtype == jnp.int8
        assert "prefix_key_scale" in ck

        p = [3, 14, 15, 92]
        rid = srv.submit(p, max_new_tokens=6)
        done = {f.req_id: f for f in srv.run()}
        # oracle: the same int8-cache model serving [prefix + p] as one
        # contiguous prompt (per-token scales make the quantized blocks
        # bit-identical; a cache-free fp32 rollout would not be)
        solo = InflightServer(
            m, m.params, slots=1, cache_len=64, prompt_buckets=(64,),
        )
        solo_rid = solo.submit(list(prefix) + p, max_new_tokens=6)
        want = {f.req_id: f for f in solo.run()}[solo_rid].tokens
        np.testing.assert_array_equal(done[rid].tokens, want)


class TestInflightLookup:
    """In-flight prompt-lookup speculation (lookup_k > 0): exactness for
    ANY proposals, acceleration when proposals are right, compose with a
    shared prefix."""

    def test_exactness_with_arbitrary_proposals(self, model):
        """Random-weight model → proposals are effectively hostile; every
        emitted token must still be the plain greedy choice."""
        srv = InflightServer(
            model, model.params, slots=2, cache_len=64,
            prompt_buckets=(8,), lookup_k=4,
        )
        p1, p2 = [3, 14, 15, 92, 65], [27, 18, 28]
        r1 = srv.submit(p1, max_new_tokens=10)
        srv.step()
        r2 = srv.submit(p2, max_new_tokens=7)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[r1].tokens, greedy_rollout(model, model.params, p1, 10)
        )
        np.testing.assert_array_equal(
            done[r2].tokens, greedy_rollout(model, model.params, p2, 7)
        )

    def test_oracle_proposals_accelerate(self, model, monkeypatch):
        """With proposals that ARE the continuation, a request finishes in
        ~max_new/(k+1) verify rounds instead of max_new — and the output
        is still exact."""
        import lwm_tpu.serve as serve_mod

        p = [5, 9, 2, 77, 31]
        want = greedy_rollout(model, model.params, p, 12)
        future = list(want)

        def oracle(ctx, k, ngram):
            # continuation after the already-emitted tokens
            done_n = len(ctx) - len(p) - 1  # minus prompt and first token
            nxt = future[done_n + 1: done_n + 1 + k]
            if len(nxt) < k:
                nxt = nxt + [0] * (k - len(nxt))
            return np.asarray(nxt, np.int32)

        monkeypatch.setattr(serve_mod, "_lookup_proposal", oracle)
        srv = InflightServer(
            model, model.params, slots=1, cache_len=64,
            prompt_buckets=(8,), lookup_k=3,
        )
        rid = srv.submit(p, max_new_tokens=12)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(done[rid].tokens, want)
        # 1 admission token + 11 more in ceil(11/4) = 3 verify rounds
        assert srv._step <= 4, f"took {srv._step} rounds for 12 tokens"

    def test_lookup_composes_with_prefix(self, model):
        prefix = list(range(2, 42))
        srv = InflightServer(
            model, model.params, slots=2, cache_len=64,
            prompt_buckets=(8,), prefix_ids=prefix, lookup_k=4,
        )
        p = [3, 14, 15, 92]
        rid = srv.submit(p, max_new_tokens=8)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[rid].tokens,
            greedy_rollout(model, model.params, prefix + p, 8),
        )

    def test_sampled_rows_ride_along(self, model):
        """A temperature>0 row in a speculating pool: no speculation for
        it, budget respected, greedy neighbor stays exact."""
        srv = InflightServer(
            model, model.params, slots=2, cache_len=64,
            prompt_buckets=(8,), lookup_k=4, seed=3,
        )
        rg = srv.submit([3, 14, 15], max_new_tokens=8)          # greedy
        rs = srv.submit([27, 18], max_new_tokens=6, temperature=0.9)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[rg].tokens,
            greedy_rollout(model, model.params, [3, 14, 15], 8),
        )
        assert len(done[rs].tokens) <= 6

    def test_headroom_validation(self, model):
        srv = InflightServer(
            model, model.params, slots=1, cache_len=64,
            prompt_buckets=(8,), lookup_k=4,
        )
        assert srv.cache_len == 128  # 64 rounds up for the decode kernels
        with pytest.raises(ValueError, match="lookup_k"):
            srv.submit([1] * 8, max_new_tokens=119)  # 8+119+4 > 128


class TestShardedPrefixAndLookup:
    """Prefix pools and lookup speculation on dp/fsdp/tp meshes (sp=1):
    the XLA concat path auto-partitions under GSPMD; outputs must match
    the unsharded full-prompt rollouts."""

    def test_prefix_pool_on_tp_mesh(self, model):
        cfg = serving_config(mesh_dim="1,2,4,1")
        m = FlaxLLaMAForCausalLM(
            cfg, input_shape=(1, 8), seed=0, _do_init=False
        )
        mesh = type(cfg).get_jax_mesh("1,2,4,1")
        prefix = list(range(2, 42))
        srv = InflightServer(
            m, model.params, slots=2, cache_len=64, prompt_buckets=(8,),
            mesh=mesh, prefix_ids=prefix,
        )
        p1, p2 = [3, 14, 15, 92], [27, 18, 28]
        r1 = srv.submit(p1, max_new_tokens=6)
        srv.step()
        r2 = srv.submit(p2, max_new_tokens=5)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[r1].tokens,
            greedy_rollout(model, model.params, prefix + p1, 6),
        )
        np.testing.assert_array_equal(
            done[r2].tokens,
            greedy_rollout(model, model.params, prefix + p2, 5),
        )

    def test_lookup_on_tp_mesh(self, model):
        cfg = serving_config(mesh_dim="1,2,4,1")
        m = FlaxLLaMAForCausalLM(
            cfg, input_shape=(1, 8), seed=0, _do_init=False
        )
        mesh = type(cfg).get_jax_mesh("1,2,4,1")
        srv = InflightServer(
            m, model.params, slots=2, cache_len=64, prompt_buckets=(8,),
            mesh=mesh, lookup_k=4,
        )
        p = [3, 14, 15, 92, 65]
        rid = srv.submit(p, max_new_tokens=8)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[rid].tokens, greedy_rollout(model, model.params, p, 8)
        )

    def test_prefix_pool_on_tp_mesh_kernel_path(self, model):
        """attn_impl='pallas': the sharded prefix DECODE rides the
        shard_map'd flash-decoding kernels (interpret mode on the CPU
        mesh); prefill takes the XLA path. Outputs still exact."""
        cfg = serving_config(mesh_dim="1,2,4,1", attn_impl="pallas")
        m = FlaxLLaMAForCausalLM(
            cfg, input_shape=(1, 8), seed=0, _do_init=False
        )
        mesh = type(cfg).get_jax_mesh("1,2,4,1")
        prefix = list(range(2, 42))
        srv = InflightServer(
            m, model.params, slots=2, cache_len=64, prompt_buckets=(8,),
            mesh=mesh, prefix_ids=prefix,
        )
        p = [3, 14, 15, 92]
        rid = srv.submit(p, max_new_tokens=6)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[rid].tokens,
            greedy_rollout(model, model.params, prefix + p, 6),
        )


class TestVisionPrefixServing:
    """VideoLLaMA through the pool: the VIDEO is the shared prefix
    (vision-masked VQ codes embedded through vte), questions and answers
    are text — LWM's video-QA scenario as a serving workload."""

    def test_video_prefix_pool_matches_full_rollout(self):
        from lwm_tpu.models.vision_llama import (
            FlaxVideoLLaMAForCausalLM,
            VideoLLaMAConfig,
        )

        cfg = VideoLLaMAConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_sequence_length=256, scan_attention=False, scan_mlp=False,
            scan_layers=False, mesh_dim=None, attn_impl="xla",
            decode_index="per_row", sample_mode="text",
        )
        m = FlaxVideoLLaMAForCausalLM(cfg, input_shape=(1, 8), seed=0)
        rng = np.random.default_rng(5)
        video = rng.integers(0, 8192, 32).astype(np.int32)   # VQ codes
        vmask = np.ones(32, bool)

        srv = InflightServer(
            m, m.params, slots=2, cache_len=64, prompt_buckets=(8,),
            prefix_ids=video, prefix_vision_masks=vmask,
        )
        q1, q2 = [3, 14, 15], [27, 18, 28, 66]
        r1 = srv.submit(q1, max_new_tokens=6)
        srv.step()
        r2 = srv.submit(q2, max_new_tokens=5)
        done = {f.req_id: f for f in srv.run()}

        def rollout(question, new):
            seq = np.concatenate([video, np.asarray(question, np.int32)])
            vm = np.concatenate([vmask, np.zeros(len(question), bool)])
            out = []
            for _ in range(new):
                logits = m(
                    jnp.asarray(seq)[None],
                    vision_masks=jnp.asarray(vm)[None],
                    params=m.params,
                ).logits
                nxt = int(jnp.argmax(logits[0, -1]))
                out.append(nxt)
                seq = np.concatenate([seq, [nxt]])
                vm = np.concatenate([vm, [False]])
            return np.asarray(out, np.int32)

        np.testing.assert_array_equal(done[r1].tokens, rollout(q1, 6))
        np.testing.assert_array_equal(done[r2].tokens, rollout(q2, 5))

    def test_inline_vision_prompts_match_full_rollout(self):
        # no shared prefix: each request carries its OWN video codes in
        # the prompt via submit(vision_masks=...) — per-request videos
        # served in-flight (the naive arm of vision_qa_bench rides this)
        from lwm_tpu.models.vision_llama import (
            FlaxVideoLLaMAForCausalLM,
            VideoLLaMAConfig,
        )

        cfg = VideoLLaMAConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_sequence_length=256, scan_attention=False, scan_mlp=False,
            scan_layers=False, mesh_dim=None, attn_impl="xla",
            decode_index="per_row", sample_mode="text",
        )
        m = FlaxVideoLLaMAForCausalLM(cfg, input_shape=(1, 8), seed=0)
        rng = np.random.default_rng(9)
        vids = [rng.integers(0, 8192, 24).astype(np.int32) for _ in range(2)]
        qs = [[3, 14, 15], [27, 18, 28, 66]]

        srv = InflightServer(
            m, m.params, slots=2, cache_len=64, prompt_buckets=(32,),
        )
        rids = []
        for vid, q in zip(vids, qs):
            prompt = np.concatenate([vid, np.asarray(q, np.int32)])
            vm = np.concatenate([np.ones(len(vid), bool),
                                 np.zeros(len(q), bool)])
            rids.append(srv.submit(prompt, max_new_tokens=5,
                                   vision_masks=vm))
        done = {f.req_id: f for f in srv.run()}

        # chunked admission takes the same masks through _chunk_fn
        srv_c = InflightServer(
            m, m.params, slots=2, cache_len=64, prompt_buckets=(32,),
            admit_chunk=8,
        )
        rids_c = []
        for vid, q in zip(vids, qs):
            prompt = np.concatenate([vid, np.asarray(q, np.int32)])
            vm = np.concatenate([np.ones(len(vid), bool),
                                 np.zeros(len(q), bool)])
            rids_c.append(srv_c.submit(prompt, max_new_tokens=5,
                                       vision_masks=vm))
        done_c = {f.req_id: f for f in srv_c.run()}

        def rollout(vid, question, new):
            seq = np.concatenate([vid, np.asarray(question, np.int32)])
            vm = np.concatenate([np.ones(len(vid), bool),
                                 np.zeros(len(question), bool)])
            out = []
            for _ in range(new):
                logits = m(
                    jnp.asarray(seq)[None],
                    vision_masks=jnp.asarray(vm)[None],
                    params=m.params,
                ).logits
                nxt = int(jnp.argmax(logits[0, -1]))
                out.append(nxt)
                seq = np.concatenate([seq, [nxt]])
                vm = np.concatenate([vm, [False]])
            return np.asarray(out, np.int32)

        for i, (vid, q) in enumerate(zip(vids, qs)):
            ref = rollout(vid, q, 5)
            np.testing.assert_array_equal(done[rids[i]].tokens, ref)
            np.testing.assert_array_equal(done_c[rids_c[i]].tokens, ref)

    def test_vision_masks_length_validated(self):
        from lwm_tpu.models.vision_llama import (
            FlaxVideoLLaMAForCausalLM,
            VideoLLaMAConfig,
        )

        cfg = VideoLLaMAConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_sequence_length=256, scan_attention=False, scan_mlp=False,
            scan_layers=False, mesh_dim=None, attn_impl="xla",
            decode_index="per_row", sample_mode="text",
        )
        m = FlaxVideoLLaMAForCausalLM(cfg, input_shape=(1, 8), seed=0)
        srv = InflightServer(m, m.params, slots=2, cache_len=64,
                             prompt_buckets=(8,))
        with pytest.raises(ValueError, match="vision_masks length"):
            srv.submit([1, 2, 3], max_new_tokens=2, vision_masks=[True])

    def test_vision_pool_rejects_non_text_sample_mode(self):
        from lwm_tpu.models.vision_llama import (
            FlaxVideoLLaMAForCausalLM,
            VideoLLaMAConfig,
        )

        cfg = VideoLLaMAConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_sequence_length=256, scan_attention=False, scan_mlp=False,
            scan_layers=False, mesh_dim=None, attn_impl="xla",
            decode_index="per_row", sample_mode="all",
        )
        m = FlaxVideoLLaMAForCausalLM(
            cfg, input_shape=(1, 8), seed=0, _do_init=False
        )
        with pytest.raises(ValueError, match="sample_mode"):
            InflightServer(m, None, slots=1, cache_len=64)


class TestPrefixPersistence:
    """A built prefix KV block saves to disk and a fresh server loads it
    (skipping the build) with identical outputs — the document-index
    workflow."""

    def test_save_and_reload_prefix(self, model, tmp_path):
        prefix = list(range(2, 42))
        path = str(tmp_path / "doc_index")
        srv1 = InflightServer(
            model, model.params, slots=2, cache_len=64, prompt_buckets=(8,),
            prefix_ids=prefix, prefix_cache_path=path,
        )
        import os

        assert os.path.exists(path)
        p = [3, 14, 15, 92]
        r1 = srv1.submit(p, max_new_tokens=6)
        want = {f.req_id: f for f in srv1.run()}[r1].tokens

        # fresh server: loads the index, never builds
        import lwm_tpu.serve as serve_mod

        orig = serve_mod.build_prefix_cache

        def boom(*a, **kw):
            raise AssertionError("build should have been skipped")

        serve_mod.build_prefix_cache = boom
        try:
            srv2 = InflightServer(
                model, model.params, slots=2, cache_len=64,
                prompt_buckets=(8,),
                prefix_ids=prefix, prefix_cache_path=path,
            )
        finally:
            serve_mod.build_prefix_cache = orig
        r2 = srv2.submit(p, max_new_tokens=6)
        got = {f.req_id: f for f in srv2.run()}[r2].tokens
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(
            want, greedy_rollout(model, model.params, prefix + p, 6)
        )

    def test_stale_index_rejected(self, model, tmp_path):
        path = str(tmp_path / "doc_index")
        InflightServer(
            model, model.params, slots=1, cache_len=64, prompt_buckets=(8,),
            prefix_ids=list(range(2, 42)), prefix_cache_path=path,
        )
        with pytest.raises(ValueError, match="stale"):
            InflightServer(
                model, model.params, slots=1, cache_len=64,
                prompt_buckets=(8,),
                prefix_ids=list(range(2, 30)), prefix_cache_path=path,
            )


def test_stats_counters(model):
    """Host-observed stats: rounds, emitted, lookup acceptance."""
    srv = InflightServer(
        model, model.params, slots=2, cache_len=64, prompt_buckets=(8,),
        lookup_k=3,
    )
    srv.submit([3, 14, 15], max_new_tokens=7)
    srv.run()
    s = srv.stats
    assert s["admitted"] == 1
    assert s["emitted"] == 7            # includes the admission token
    assert s["rounds"] >= 1
    assert s["spec_rows"] == s["rounds"]  # one greedy row per round
    assert s["decode_s"] > 0 and s["prefill_s"] > 0
    assert "tok/round" in srv.stats_line()


class TestChunkedAdmission:
    """admit_chunk > 0: long prompts prefill in chunks BETWEEN decode
    rounds — running slots keep emitting while an admission is staged,
    and outputs stay exact. Prompts beyond the largest bucket are
    accepted (one compiled program per chunk size)."""

    def test_chunked_exactness_beyond_buckets(self, model):
        srv = InflightServer(
            model, model.params, slots=2, cache_len=64, prompt_buckets=(8,),
            admit_chunk=16,
        )
        rng = np.random.default_rng(3)
        p = rng.integers(2, 120, 40).tolist()   # 40 > bucket 8 → chunked
        rid = srv.submit(p, max_new_tokens=6)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[rid].tokens, greedy_rollout(model, model.params, p, 6)
        )

    def test_decode_interleaves_with_staged_admission(self, model):
        srv = InflightServer(
            model, model.params, slots=2, cache_len=64, prompt_buckets=(8,),
            admit_chunk=8,
        )
        ra = srv.submit([3, 14, 15], max_new_tokens=12)
        srv.step()                       # A admitted + 0/1 decode
        rng = np.random.default_rng(4)
        pb = rng.integers(2, 120, 32).tolist()   # 4 chunks of 8
        rb = srv.submit(pb, max_new_tokens=4)
        srv.step()                       # stages B + its first chunk
        assert srv._pending              # 8/32 prefilled
        a_before = len(srv.live[0].emitted)
        steps_while_pending = 0
        while srv._pending:
            srv.step()
            steps_while_pending += 1
            # A kept decoding between B's chunks
            assert len(srv.live[0].emitted) > a_before
            a_before = len(srv.live[0].emitted)
        assert steps_while_pending == 3  # chunks at 16, 24, 32
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[ra].tokens,
            greedy_rollout(model, model.params, [3, 14, 15], 12),
        )
        np.testing.assert_array_equal(
            done[rb].tokens, greedy_rollout(model, model.params, pb, 4)
        )

    def test_chunked_with_prefix(self, model):
        prefix = list(range(2, 42))
        srv = InflightServer(
            model, model.params, slots=2, cache_len=64, prompt_buckets=(8,),
            prefix_ids=prefix, admit_chunk=8,
        )
        rng = np.random.default_rng(5)
        p = rng.integers(2, 120, 20).tolist()
        rid = srv.submit(p, max_new_tokens=5)
        done = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            done[rid].tokens,
            greedy_rollout(model, model.params, prefix + p, 5),
        )


class TestStreamingAndCancel:
    def test_on_token_streams_in_order(self, model):
        seen = []
        srv = InflightServer(
            model, model.params, slots=2, cache_len=64, prompt_buckets=(8,),
            lookup_k=3,   # multi-token rounds must stream in order too
        )
        p = [5, 9, 2, 77, 31]
        rid = srv.submit(
            p, max_new_tokens=9,
            on_token=lambda r, t: seen.append((r, t)),
        )
        done = {f.req_id: f for f in srv.run()}
        assert [r for r, _ in seen] == [rid] * 9
        np.testing.assert_array_equal(
            np.asarray([t for _, t in seen]), done[rid].tokens
        )

    def test_cancel_everywhere(self, model):
        srv = InflightServer(
            model, model.params, slots=1, cache_len=64, prompt_buckets=(8,),
        )
        r1 = srv.submit([3, 14, 15], max_new_tokens=10)   # will go live
        r2 = srv.submit([27, 18], max_new_tokens=10)       # stays queued
        srv.step(); srv.step()
        assert srv.cancel(r2)                 # cancel from the queue
        assert srv.cancel(r1)                 # cancel live mid-decode
        assert not srv.cancel(999)
        done = {f.req_id: f for f in srv.finished}
        assert done[r2].stopped == "cancelled" and len(done[r2].tokens) == 0
        assert done[r1].stopped == "cancelled" and len(done[r1].tokens) >= 1
        # freed slot serves the next request exactly
        r3 = srv.submit([5, 9, 2], max_new_tokens=6)
        out = {f.req_id: f for f in srv.run()}
        np.testing.assert_array_equal(
            out[r3].tokens, greedy_rollout(model, model.params, [5, 9, 2], 6)
        )
