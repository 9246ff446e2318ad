"""LLaMA model: init, forward, scan/unscan parity, ring-vs-local parity on
the mesh, KV-cache decode consistency, and generate()."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwm_tpu.models import FlaxLLaMAForCausalLM, LLaMAConfig
from lwm_tpu.parallel import match_partition_rules


def tiny_config(**kw):
    base = dict(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_sequence_length=256,
        scan_attention=True,
        scan_mlp=True,
        scan_query_chunk_size=32,
        scan_key_chunk_size=32,
        scan_mlp_chunk_size=32,
        scan_layers=True,
        param_scan_axis=0,
        mesh_dim=None,
    )
    base.update(kw)
    return LLaMAConfig(**base)


def make_model(config, seed=0):
    model = FlaxLLaMAForCausalLM(config, input_shape=(1, 16), seed=seed)
    return model


class TestForward:
    def test_forward_shapes(self):
        config = tiny_config()
        model = make_model(config)
        ids = jax.random.randint(jax.random.PRNGKey(0), (2, 128), 0, 128)
        out = model(ids)
        assert out.logits.shape == (2, 128, 128)
        assert not np.any(np.isnan(np.asarray(out.logits)))

    def test_scan_vs_unscan_logits(self):
        """Same weights, scanned vs unrolled layers → identical logits."""
        cfg_scan = tiny_config(scan_layers=True)
        cfg_unroll = tiny_config(scan_layers=False)
        m_scan = make_model(cfg_scan)
        m_unroll = make_model(cfg_unroll)

        # rebuild unscanned params from the scanned tree (split axis 0)
        import flax

        flat = flax.traverse_util.flatten_dict(m_scan.params)
        unrolled = {}
        for key, val in flat.items():
            if "scan_decoder" in key:
                for layer in range(cfg_scan.num_hidden_layers):
                    new_key = tuple(
                        str(layer) if part == "scan_decoder" else part
                        for part in key
                    )
                    unrolled[new_key] = val[layer]
            else:
                unrolled[key] = val
        params_unroll = flax.traverse_util.unflatten_dict(unrolled)

        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 64), 0, 128)
        lo_scan = m_scan(ids, params=m_scan.params).logits
        lo_unroll = m_unroll(ids, params=params_unroll).logits
        np.testing.assert_allclose(
            np.asarray(lo_scan), np.asarray(lo_unroll), atol=1e-5, rtol=1e-5
        )

    def test_logits_tail_matches_full(self):
        """logits_tail=N must equal the last N rows of the full-head
        output — serving prefill reads one row, and the sliced head is
        what keeps a 256K-prompt prefill from materializing [1, seq,
        vocab] logits (decode_bench OOM at 15.6G)."""
        cfg_full = tiny_config()
        m_full = make_model(cfg_full)
        cfg_tail = tiny_config(logits_tail=1)
        m_tail = FlaxLLaMAForCausalLM(cfg_tail, input_shape=(1, 16), seed=0)
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 96), 0, 128)
        full = m_full(ids, params=m_full.params).logits
        tail = m_tail(ids, params=m_full.params).logits
        assert tail.shape == (2, 1, 128)
        np.testing.assert_allclose(
            np.asarray(full[:, -1:]), np.asarray(tail), atol=1e-6
        )

    def test_ring_vs_short_path_parity(self):
        """seq > chunk (ring/blockwise path) must equal seq <= chunk
        (plain path) on the shared prefix."""
        config = tiny_config(scan_query_chunk_size=32, scan_key_chunk_size=32)
        model = make_model(config)
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 64), 0, 128)
        long_logits = model(ids).logits  # 64 > 32 → blockwise path
        cfg_short = tiny_config(scan_attention=False)
        m_short = FlaxLLaMAForCausalLM(cfg_short, input_shape=(1, 16))
        short_logits = m_short(ids, params=model.params).logits
        np.testing.assert_allclose(
            np.asarray(long_logits), np.asarray(short_logits), atol=1e-4, rtol=1e-4
        )

    def test_partition_rules_cover_params(self):
        config = tiny_config()
        model = make_model(config)
        rules = LLaMAConfig.get_partition_rules(
            scan_layers=True, scan_axis=0
        )
        specs = match_partition_rules(rules, model.params)  # no ValueError
        import flax

        flat = flax.traverse_util.flatten_dict(specs)
        wq = [v for k, v in flat.items() if "wq" in k][0]
        assert wq == jax.sharding.PartitionSpec(None, ("fsdp", "sp"), "tp")


class TestMeshParity:
    def test_mesh_forward_matches_local(self, devices8):
        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 128), 0, 128)
        cfg_local = tiny_config()
        model = make_model(cfg_local)
        local_logits = model(ids).logits

        cfg_mesh = tiny_config(mesh_dim="1,1,2,4")
        m_mesh = FlaxLLaMAForCausalLM(cfg_mesh, input_shape=(1, 16))
        mesh = LLaMAConfig.get_jax_mesh("1,1,2,4")
        with mesh:
            mesh_logits = m_mesh(ids, params=model.params).logits
        np.testing.assert_allclose(
            np.asarray(local_logits), np.asarray(mesh_logits), atol=2e-4, rtol=2e-4
        )


class TestDecode:
    def test_cached_decode_matches_full_forward(self):
        """Prefill+decode through the KV cache must reproduce the logits of
        one full forward pass (no mesh)."""
        config = tiny_config(scan_attention=False)
        model = make_model(config)
        ids = jax.random.randint(jax.random.PRNGKey(4), (1, 24), 0, 128)
        full = model(ids).logits  # [1, 24, V]

        max_len = 32
        past = model.init_cache(1, max_len)
        attn_mask = jnp.ones((1, max_len), dtype="i4")
        # prefill first 16
        pos = jnp.arange(16)[None, :]
        out = model(
            ids[:, :16], attention_mask=attn_mask, position_ids=pos,
            past_key_values=past,
        )
        past = out.past_key_values
        np.testing.assert_allclose(
            np.asarray(out.logits), np.asarray(full[:, :16]), atol=1e-4, rtol=1e-4
        )
        # decode tokens 16..23 one at a time
        for t in range(16, 24):
            out = model(
                ids[:, t : t + 1],
                attention_mask=attn_mask,
                position_ids=jnp.array([[t]]),
                past_key_values=past,
            )
            past = out.past_key_values
            np.testing.assert_allclose(
                np.asarray(out.logits[:, 0]),
                np.asarray(full[:, t]),
                atol=1e-4,
                rtol=1e-4,
            )

    def test_mesh_cached_decode(self, devices8):
        """Decode through the sp-sharded cache on the mesh matches local."""
        cfg_local = tiny_config(scan_attention=False)
        model = make_model(cfg_local)
        ids = jax.random.randint(jax.random.PRNGKey(5), (2, 24), 0, 128)
        full = model(ids).logits

        cfg_mesh = tiny_config(scan_attention=False, mesh_dim="1,1,2,4")
        m_mesh = FlaxLLaMAForCausalLM(cfg_mesh, input_shape=(1, 16))
        mesh = LLaMAConfig.get_jax_mesh("1,1,2,4")
        max_len = 32
        with mesh:
            past = m_mesh.init_cache(2, max_len)
            attn_mask = jnp.ones((2, max_len), dtype="i4")
            pos = jnp.broadcast_to(jnp.arange(16)[None, :], (2, 16))
            out = m_mesh(
                ids[:, :16], attention_mask=attn_mask, position_ids=pos,
                past_key_values=past, params=model.params,
            )
            past = out.past_key_values
            np.testing.assert_allclose(
                np.asarray(out.logits), np.asarray(full[:, :16]),
                atol=2e-4, rtol=2e-4,
            )
            for t in range(16, 20):
                out = m_mesh(
                    ids[:, t : t + 1],
                    attention_mask=attn_mask,
                    position_ids=jnp.broadcast_to(jnp.array([[t]]), (2, 1)),
                    past_key_values=past,
                    params=model.params,
                )
                past = out.past_key_values
                np.testing.assert_allclose(
                    np.asarray(out.logits[:, 0]), np.asarray(full[:, t]),
                    atol=2e-4, rtol=2e-4,
                )


class TestGenerate:
    def test_greedy_generate(self):
        config = tiny_config(scan_attention=False)
        model = make_model(config)
        ids = jax.random.randint(jax.random.PRNGKey(6), (2, 8), 2, 128)
        out = model.generate(
            ids,
            max_length=16,
            do_sample=False,
            pad_token_id=0,
        )
        seqs = out.sequences
        assert seqs.shape == (2, 16)
        np.testing.assert_array_equal(np.asarray(seqs[:, :8]), np.asarray(ids))

    def test_greedy_matches_argmax_rollout(self):
        """generate() must equal a manual argmax rollout over full forwards."""
        config = tiny_config(scan_attention=False)
        model = make_model(config)
        ids = jax.random.randint(jax.random.PRNGKey(7), (1, 8), 2, 128)
        out = model.generate(ids, max_length=12, do_sample=False, pad_token_id=0)
        cur = ids
        for _ in range(4):
            logits = model(cur).logits
            nxt = jnp.argmax(logits[:, -1], axis=-1)[:, None]
            cur = jnp.concatenate([cur, nxt], axis=1)
        np.testing.assert_array_equal(np.asarray(out.sequences), np.asarray(cur))


class TestRingPrefillGenerate:
    def test_generate_with_scan_attention_on_mesh(self, devices8):
        """The eval_needle configuration: ring/blockwise prefill (seq >
        chunks) writing the KV cache, then single-token decode through the
        sp-sharded cache."""
        cfg = tiny_config(
            scan_attention=True,
            scan_query_chunk_size=16,
            scan_key_chunk_size=16,
            mesh_dim="1,1,2,4",
        )
        model = FlaxLLaMAForCausalLM(cfg, input_shape=(1, 16), seed=0)
        cfg_local = tiny_config(scan_attention=False)
        m_local = FlaxLLaMAForCausalLM(cfg_local, input_shape=(1, 16), _do_init=False)

        ids = jax.random.randint(jax.random.PRNGKey(11), (2, 64), 2, 128)
        mesh = LLaMAConfig.get_jax_mesh("1,1,2,4")
        with mesh:
            out = model.generate(
                ids, max_length=72, do_sample=False, pad_token_id=0
            ).sequences
        # reference rollout without mesh/ring
        local = m_local.generate(
            ids, max_length=72, do_sample=False, pad_token_id=0,
            params=model.params,
        ).sequences
        np.testing.assert_array_equal(np.asarray(out), np.asarray(local))


class TestPartitionRuleVariants:
    """All three rule tables must cover their corresponding param trees
    (scan axis 0 / axis 1 / unscanned) — released-checkpoint parity."""

    @pytest.mark.parametrize(
        "scan_layers,scan_axis", [(True, 0), (True, 1), (False, 0)]
    )
    def test_rules_cover_params(self, scan_layers, scan_axis):
        cfg = tiny_config(scan_layers=scan_layers, param_scan_axis=scan_axis)
        model = make_model(cfg)
        rules = LLaMAConfig.get_partition_rules(scan_layers, scan_axis)
        specs = match_partition_rules(rules, model.params)  # raises if a leaf is uncovered
        import flax

        flat_params = flax.traverse_util.flatten_dict(model.params)
        flat_specs = flax.traverse_util.flatten_dict(specs)
        # every sharded spec must have rank ≤ the param rank
        for key, spec in flat_specs.items():
            param = flat_params[key]
            assert len(spec) <= param.ndim, (key, spec, param.shape)

    def test_scan_axis1_param_shapes(self):
        cfg = tiny_config(scan_layers=True, param_scan_axis=1)
        model = make_model(cfg)
        import flax

        flat = flax.traverse_util.flatten_dict(model.params)
        wq = [v for k, v in flat.items() if "wq" in k][0]
        # layer dim stacked at axis 1: [in, L, out]
        assert wq.shape == (64, 2, 64), wq.shape

    def test_vision_rules_cover(self):
        from lwm_tpu.models import FlaxVideoLLaMAForCausalLM, VideoLLaMAConfig

        cfg = VideoLLaMAConfig(
            vocab_size=128, vision_vocab_size=96, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
            max_sequence_length=128, scan_attention=False, scan_mlp=False,
            scan_layers=False, mesh_dim=None,
        )
        model = FlaxVideoLLaMAForCausalLM(cfg, input_shape=(1, 8), seed=0)
        rules = VideoLLaMAConfig.get_partition_rules(False, 0)
        match_partition_rules(rules, model.params)  # no uncovered leaves


class TestAttentionDropoutModel:
    """attn_pdrop>0 through the model: ring path on a tp>1 mesh (exercises
    the per-tp-shard rng fold) and the meshless blockwise fallback."""

    def _check(self, model, ids, ctx=None):
        import contextlib

        with (ctx or contextlib.nullcontext()):
            det = model(ids).logits
            d1 = model(ids, dropout_rng=jax.random.PRNGKey(1), train=True).logits
            d2 = model(ids, dropout_rng=jax.random.PRNGKey(1), train=True).logits
            d3 = model(ids, dropout_rng=jax.random.PRNGKey(2), train=True).logits
        assert np.isfinite(np.asarray(d1)).all()
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        assert not np.allclose(np.asarray(d1), np.asarray(det), atol=1e-3)
        assert not np.allclose(np.asarray(d1), np.asarray(d3), atol=1e-3)

    def test_ring_dropout_on_mesh(self, devices8):
        cfg = tiny_config(attn_pdrop=0.3, mesh_dim="1,1,2,4")
        model = FlaxLLaMAForCausalLM(cfg, input_shape=(1, 16))
        ids = jax.random.randint(jax.random.PRNGKey(11), (2, 128), 0, 128)
        self._check(model, ids, LLaMAConfig.get_jax_mesh("1,1,2,4"))

    def test_local_dropout_fallback(self):
        cfg = tiny_config(attn_pdrop=0.3)
        model = make_model(cfg)
        ids = jax.random.randint(jax.random.PRNGKey(11), (2, 128), 0, 128)
        self._check(model, ids)

    def test_short_seq_dropout(self):
        # seq <= chunk sizes -> the non-ring path must also honor attn_pdrop
        cfg = tiny_config(attn_pdrop=0.3)
        model = make_model(cfg)
        ids = jax.random.randint(jax.random.PRNGKey(11), (2, 16), 0, 128)
        self._check(model, ids)


class TestUnscanForServing:
    def test_loaded_unscanned_matches_scanned(self, tmp_path, devices8):
        """load_sharded_params(unscan_for_serving=True) must produce the same
        logits as the scanned checkpoint it came from (serving runs ~3.7x
        faster unscanned — NOTES.md)."""
        from lwm_tpu.apps.loading import load_sharded_params
        from lwm_tpu.checkpoint import StreamingCheckpointer

        cfg = tiny_config(scan_layers=True, param_scan_axis=0, mesh_dim="1,1,2,4")
        model = FlaxLLaMAForCausalLM(tiny_config(scan_layers=True), seed=3)
        ids = jax.random.randint(jax.random.PRNGKey(7), (2, 64), 0, 128)
        ref_logits = np.asarray(model(ids).logits)

        ckpt = StreamingCheckpointer(
            StreamingCheckpointer.get_default_config(dict(float_dtype="fp32")),
            str(tmp_path),
        )
        ckpt.save_checkpoint(model.params, "params_ckpt")  # params:: wraps on load
        mesh = LLaMAConfig.get_jax_mesh("1,1,2,4")
        params, _ = load_sharded_params(
            LLaMAConfig, cfg, f"params::{tmp_path}/params_ckpt", mesh, "fp32",
            unscan_for_serving=True,
        )
        assert cfg.scan_layers is False  # flipped by the loader
        m2 = FlaxLLaMAForCausalLM(cfg, input_shape=(1, 64), _do_init=False)
        with mesh:
            out = np.asarray(m2(ids, params=params["params"]).logits)
        np.testing.assert_allclose(out, ref_logits, atol=2e-4, rtol=2e-4)


class TestInt8KVCache:
    def test_cached_decode_close_to_full_forward(self):
        """int8 KV cache: prefill+decode logits ≈ uncached full forward
        (per-token/head symmetric quantization error only)."""
        config = tiny_config(scan_attention=False, kv_cache_dtype="int8")
        model = make_model(config)
        ids = jax.random.randint(jax.random.PRNGKey(4), (1, 24), 0, 128)
        full = np.asarray(make_model(tiny_config(scan_attention=False))(ids).logits)

        max_len = 32
        past = model.init_cache(1, max_len)
        assert past["transformer"]["h"]["scan_decoder"]["attention"][
            "cached_key"
        ].dtype == jnp.int8
        attn_mask = jnp.ones((1, max_len), dtype="i4")
        out = model(
            ids[:, :16],
            attention_mask=attn_mask,
            position_ids=jnp.arange(16)[None],
            past_key_values=past,
        )
        logits = [np.asarray(out.logits)]
        past = out.past_key_values
        for t in range(16, 24):
            out = model(
                ids[:, t : t + 1],
                attention_mask=attn_mask,
                position_ids=jnp.full((1, 1), t),
                past_key_values=past,
            )
            logits.append(np.asarray(out.logits))
            past = out.past_key_values
        got = np.concatenate(logits, axis=1)
        err = np.abs(got - full).max() / (np.abs(full).max() + 1e-6)
        assert err < 0.05, err

    def test_generate_int8_on_mesh(self, devices8):
        """Routed sp decode writes work with the quantized cache + scales."""
        cfg = tiny_config(
            scan_attention=False, kv_cache_dtype="int8", mesh_dim="1,1,2,4"
        )
        model = FlaxLLaMAForCausalLM(cfg, input_shape=(1, 16))
        ids = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 128)
        mesh = LLaMAConfig.get_jax_mesh("1,1,2,4")
        with mesh:
            seqs = model.generate(
                ids, max_length=32, do_sample=False, pad_token_id=0
            ).sequences
        assert seqs.shape == (2, 32)
        # same prompt twice -> deterministic greedy continuation
        np.testing.assert_array_equal(np.asarray(seqs), np.asarray(seqs))


class TestAttnImplKnob:
    def test_xla_impl_matches_default(self):
        cfg_a = tiny_config()
        cfg_b = tiny_config(attn_impl="xla")
        m = make_model(cfg_a)
        m2 = FlaxLLaMAForCausalLM(cfg_b, input_shape=(1, 16), _do_init=False)
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 64), 0, 128)
        np.testing.assert_allclose(
            np.asarray(m(ids).logits),
            np.asarray(m2(ids, params=m.params).logits),
            atol=1e-5, rtol=1e-5,
        )
