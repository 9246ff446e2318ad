"""VideoLLaMA: embedding mix, sample modes, dual loss shape, CFG sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from transformers import GenerationConfig

from lwm_tpu.models import FlaxVideoLLaMAForCausalLM, VideoLLaMAConfig
from lwm_tpu.parallel import match_partition_rules


def tiny_config(**kw):
    base = dict(
        vocab_size=128,
        vision_vocab_size=96,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_sequence_length=256,
        scan_attention=False,
        scan_mlp=False,
        scan_query_chunk_size=32,
        scan_key_chunk_size=32,
        scan_mlp_chunk_size=32,
        scan_layers=True,
        param_scan_axis=0,
        mesh_dim=None,
        sample_mode="all",
    )
    base.update(kw)
    return VideoLLaMAConfig(**base)


@pytest.fixture(scope="module")
def model_and_inputs():
    config = tiny_config()
    model = FlaxVideoLLaMAForCausalLM(config, input_shape=(1, 16), seed=0)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 32), 0, 96)
    vm = jnp.zeros((2, 32), bool).at[:, 8:24].set(True)
    return model, ids, vm


class TestVideoLLaMA:
    def test_dual_logits_shapes(self, model_and_inputs):
        model, ids, vm = model_and_inputs
        out = model(ids, vision_masks=vm)
        vision_logits, lm_logits = out.logits
        assert vision_logits.shape == (2, 32, 96)
        assert lm_logits.shape == (2, 32, 128)

    def test_sample_mode_selects_head(self, model_and_inputs):
        model, ids, vm = model_and_inputs
        cfg_v = tiny_config(sample_mode="vision")
        m_v = FlaxVideoLLaMAForCausalLM(cfg_v, input_shape=(1, 16), _do_init=False)
        out_v = m_v(ids, vision_masks=vm, params=model.params)
        assert out_v.logits.shape == (2, 32, 96)
        cfg_t = tiny_config(sample_mode="text")
        m_t = FlaxVideoLLaMAForCausalLM(cfg_t, input_shape=(1, 16), _do_init=False)
        out_t = m_t(ids, vision_masks=vm, params=model.params)
        assert out_t.logits.shape == (2, 32, 128)
        both = model(ids, vision_masks=vm)
        np.testing.assert_allclose(
            np.asarray(out_v.logits), np.asarray(both.logits[0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out_t.logits), np.asarray(both.logits[1]), atol=1e-6
        )

    def test_embedding_mix_uses_vte_for_vision(self, model_and_inputs):
        """Changing a vision-masked token id must change logits (routed
        through vte); flipping its mask to text routes through wte instead."""
        model, ids, vm = model_and_inputs
        out1 = model(ids, vision_masks=vm).logits[1]
        ids2 = ids.at[0, 10].set((ids[0, 10] + 1) % 96)
        out2 = model(ids2, vision_masks=vm).logits[1]
        assert not np.allclose(np.asarray(out1), np.asarray(out2))
        # same ids, different modality mask → different embedding path
        vm3 = vm.at[0, 10].set(False)
        out3 = model(ids, vision_masks=vm3).logits[1]
        assert not np.allclose(np.asarray(out1), np.asarray(out3))

    def test_partition_rules_cover(self, model_and_inputs):
        model, _, _ = model_and_inputs
        rules = VideoLLaMAConfig.get_partition_rules(True, 0)
        specs = match_partition_rules(rules, model.params)  # no error
        import flax

        flat = flax.traverse_util.flatten_dict(specs)
        vte = [v for k, v in flat.items() if "vte" in k][0]
        assert vte == jax.sharding.PartitionSpec("tp", ("fsdp", "sp"))

    def test_cfg_generate_vision(self):
        """CFG doubled batch: cond+uncond halves get identical tokens, and
        every 257th generated token is EOF (8192 in the real vocab; here the
        forced id is still 8192 — use a vision vocab big enough)."""
        config = tiny_config(sample_mode="vision", vision_vocab_size=8448)
        model = FlaxVideoLLaMAForCausalLM(config, input_shape=(1, 8), seed=0)
        b = 2  # 1 cond + 1 uncond
        prompt = jax.random.randint(jax.random.PRNGKey(1), (b, 8), 0, 8192)
        vm = jnp.zeros((b, 8), bool)
        cfg_scales = jnp.ones((1,), jnp.float32) * 2.0
        out = model.generate_vision(
            prompt,
            cfg_scales,
            vision_masks=vm,
            attention_mask=jnp.ones((b, 8), jnp.int32),
            prng_key=jax.random.PRNGKey(2),
            generation_config=GenerationConfig(
                max_new_tokens=12, min_new_tokens=12, do_sample=True,
                top_k=50, temperature=1.0, pad_token_id=0,
            ),
        )
        seqs = np.asarray(out.sequences)
        assert seqs.shape == (2, 20)
        # cond and uncond halves share the generated suffix
        np.testing.assert_array_equal(seqs[0, 8:], seqs[1, 8:])
        assert not np.any(np.isnan(seqs))

    def test_cfg_forces_eof_every_257(self):
        config = tiny_config(sample_mode="vision", vision_vocab_size=8448,
                             max_sequence_length=600)
        model = FlaxVideoLLaMAForCausalLM(config, input_shape=(1, 8), seed=0)
        prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 4), 0, 8192)
        vm = jnp.zeros((2, 4), bool)
        out = model.generate_vision(
            prompt,
            jnp.ones((1,), jnp.float32),
            vision_masks=vm,
            attention_mask=jnp.ones((2, 4), jnp.int32),
            prng_key=jax.random.PRNGKey(4),
            generation_config=GenerationConfig(
                max_new_tokens=300, min_new_tokens=300, do_sample=True,
                top_k=0, temperature=1.0, pad_token_id=0,
            ),
        )
        seqs = np.asarray(out.sequences)
        # generated positions count from the end of the prompt: the 257th
        # generated token closes the first 256-token frame with EOF 8192
        assert seqs[0, 4 + 256] == 8192