"""Checkpoint interop: flax↔torch round-trip exactness and — the strong
check — logits parity between our flax model and HF's torch
LlamaForCausalLM on converted weights (validates RoPE/RMSNorm/SwiGLU
semantics against the canonical implementation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwm_tpu.models import FlaxLLaMAForCausalLM, LLaMAConfig
from lwm_tpu.utils.checkpoint_convert import (
    flax_to_torch_llama,
    scan_params,
    torch_llama_to_flax,
    unscan_params,
)


def tiny_config(**kw):
    base = dict(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_sequence_length=128,
        scan_attention=False,
        scan_mlp=False,
        scan_layers=False,
        param_scan_axis=0,
        mesh_dim=None,
    )
    base.update(kw)
    return LLaMAConfig(**base)


class TestScanConvert:
    def test_scan_unscan_roundtrip(self):
        config = tiny_config(scan_layers=True)
        model = FlaxLLaMAForCausalLM(config, input_shape=(1, 8), seed=0)
        unscanned = unscan_params(model.params, 2, scan_axis=0)
        rescanned = scan_params(unscanned, 2, scan_axis=0)
        flat_a = jax.tree_util.tree_leaves(model.params)
        flat_b = jax.tree_util.tree_leaves(rescanned)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTorchInterop:
    def test_flax_torch_flax_roundtrip(self):
        config = tiny_config()
        model = FlaxLLaMAForCausalLM(config, input_shape=(1, 8), seed=0)
        sd = flax_to_torch_llama(model.params, config)
        back = torch_llama_to_flax(sd, config, scan_layers=False)
        flat_a = dict(
            jax.tree_util.tree_flatten_with_path(model.params)[0]
        )
        flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
        assert flat_a.keys() == flat_b.keys()
        for key in flat_a:
            np.testing.assert_allclose(
                np.asarray(flat_a[key]), np.asarray(flat_b[key]), atol=1e-6,
                err_msg=str(key),
            )

    def test_logits_parity_with_hf_torch(self):
        """Converted weights through HF's torch Llama must reproduce our
        logits (fp32, tolerance-bounded) — the sampling-API parity contract
        (BASELINE.md)."""
        torch = pytest.importorskip("torch")
        from transformers import LlamaConfig as HFLlamaConfig
        from transformers import LlamaForCausalLM

        config = tiny_config()
        model = FlaxLLaMAForCausalLM(config, input_shape=(1, 8), seed=0)
        ids = np.asarray(
            jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 128)
        )
        flax_logits = np.asarray(model(jnp.asarray(ids)).logits)

        hf_config = HFLlamaConfig(
            vocab_size=128,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=4,
            max_position_embeddings=128,
            rms_norm_eps=config.rms_norm_eps,
            rope_theta=float(config.theta),
            attention_bias=False,
            tie_word_embeddings=False,
        )
        hf_model = LlamaForCausalLM(hf_config)
        sd = {
            key: torch.from_numpy(np.ascontiguousarray(val))
            for key, val in flax_to_torch_llama(model.params, config).items()
        }
        missing, unexpected = hf_model.load_state_dict(sd, strict=False)
        assert not unexpected, unexpected
        # rotary tables are buffers, not params — fine to be "missing"
        assert all("rotary" in m or "masked_bias" in m for m in missing), missing
        hf_model.eval()
        with torch.no_grad():
            torch_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
        np.testing.assert_allclose(flax_logits, torch_logits, atol=2e-4, rtol=2e-4)
