"""Weight-only int8 serving quantization (ops/quant.py).

Layers: (1) quantize_weight error bound, (2) the Pallas dequant-matmul
kernel vs the XLA oracle (interpret mode — same dispatch convention as
the attention kernels), (3) Int8Dense wiring inside the full model:
logits from a quant_dense='int8' model on converted params must equal
the fp model run on the DEQUANTIZED params (q*scale) — this isolates the
plumbing from quantization error — plus a loose bound against the
original fp params, and decode-path parity through the KV cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwm_tpu.models import FlaxLLaMAForCausalLM, LLaMAConfig
from lwm_tpu.ops.quant import (
    int8_matmul_pallas,
    int8_matmul_xla,
    quantize_params_int8,
    quantize_weight,
)


class TestQuantizeWeight:
    def test_error_bound_and_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (96, 160), jnp.float32)
        q, s = quantize_weight(w)
        assert q.dtype == jnp.int8 and s.shape == (160,)
        err = np.abs(np.asarray(w) - np.asarray(q, np.float32) * np.asarray(s))
        assert (err <= np.asarray(s) / 2 + 1e-7).all()

    def test_extreme_columns(self):
        """A zero column and a huge column both survive."""
        w = np.zeros((32, 3), np.float32)
        w[:, 1] = 1e4
        w[0, 2] = -7.0
        q, s = quantize_weight(jnp.asarray(w))
        back = np.asarray(q, np.float32) * np.asarray(s)
        np.testing.assert_allclose(back[:, 0], 0.0)
        np.testing.assert_allclose(back[:, 1], 1e4, rtol=1e-2)
        np.testing.assert_allclose(back[0, 2], -7.0, rtol=1e-2)


class TestKernelVsOracle:
    @pytest.mark.parametrize("m,d,f", [(8, 256, 384), (3, 128, 128),
                                       (130, 512, 640)])
    def test_matches_xla(self, m, d, f):
        kx, kw, ks = jax.random.split(jax.random.PRNGKey(1), 3)
        x = jax.random.normal(kx, (m, d), jnp.float32)
        w_q = jax.random.randint(kw, (d, f), -127, 128).astype(jnp.int8)
        scale = jax.random.uniform(ks, (f,), jnp.float32, 0.01, 0.1)
        got = int8_matmul_pallas(x, w_q, scale, interpret=True)
        want = int8_matmul_xla(x, w_q, scale)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-5
        )

    def test_blocked_accumulation(self):
        """d and f larger than the block caps: multi-step accumulation."""
        kx, kw = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(kx, (8, 1536), jnp.float32)
        w_q = jax.random.randint(kw, (1536, 1280), -127, 128).astype(jnp.int8)
        scale = jnp.full((1280,), 0.02, jnp.float32)
        got = int8_matmul_pallas(
            x, w_q, scale, block_d=512, block_f=256, interpret=True
        )
        want = int8_matmul_xla(x, w_q, scale)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-5
        )


def serving_config(**kw):
    base = dict(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_sequence_length=128, scan_attention=False, scan_mlp=False,
        scan_layers=False, mesh_dim=None, attn_impl="xla",
    )
    base.update(kw)
    return LLaMAConfig(**base)


class TestModelWiring:
    def test_quant_logits_equal_dequantized_fp(self):
        """quant model on (q, s) == fp model on q*s — exact plumbing check,
        no quantization-error slop."""
        fp = FlaxLLaMAForCausalLM(serving_config(), input_shape=(1, 8), seed=0)
        qparams = quantize_params_int8(fp.params)

        qmodel = FlaxLLaMAForCausalLM(
            serving_config(quant_dense="int8"), input_shape=(1, 8),
            seed=0, _do_init=False,
        )
        # fp model run on explicitly dequantized params
        from flax.traverse_util import flatten_dict, unflatten_dict

        flat = flatten_dict(qparams)
        deq = {}
        for path, leaf in flat.items():
            if path[-1] == "scale":
                continue
            if (path[:-1] + ("scale",)) in flat:
                s = flat[path[:-1] + ("scale",)]
                deq[path] = leaf.astype(jnp.float32) * s
            else:
                deq[path] = leaf
        deq = unflatten_dict(deq)

        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0, 128)
        got = qmodel(ids, params=qparams).logits
        want = fp(ids, params=deq).logits
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
        )

    def test_quant_close_to_fp(self):
        """End-to-end quantization error at fp32 compute stays small for a
        2-layer model (per-matmul relative error ~ 1/254)."""
        fp = FlaxLLaMAForCausalLM(serving_config(), input_shape=(1, 8), seed=0)
        qmodel = FlaxLLaMAForCausalLM(
            serving_config(quant_dense="int8"), input_shape=(1, 8),
            seed=0, _do_init=False,
        )
        qparams = quantize_params_int8(fp.params)
        ids = jax.random.randint(jax.random.PRNGKey(4), (1, 16), 0, 128)
        lf = np.asarray(fp(ids, params=fp.params).logits, np.float32)
        lq = np.asarray(qmodel(ids, params=qparams).logits, np.float32)
        denom = np.abs(lf).max()
        assert np.abs(lq - lf).max() / denom < 0.05, (
            np.abs(lq - lf).max(), denom
        )

    def test_decode_path_with_cache(self):
        """Greedy decode through the KV cache on the quant model matches
        the fp model on dequantized params token-for-token."""
        fp = FlaxLLaMAForCausalLM(serving_config(), input_shape=(1, 8), seed=0)
        qparams = quantize_params_int8(fp.params)
        qmodel = FlaxLLaMAForCausalLM(
            serving_config(quant_dense="int8"), input_shape=(1, 8),
            seed=0, _do_init=False,
        )
        ids = jnp.asarray([[5, 9, 2, 77, 31]], jnp.int32)
        out = qmodel.generate(
            ids, params=qparams, max_length=15, do_sample=False,
            pad_token_id=0,
        ).sequences

        # oracle: fp generate on dequantized params
        from flax.traverse_util import flatten_dict, unflatten_dict

        flat = flatten_dict(qparams)
        deq = {}
        for path, leaf in flat.items():
            if path[-1] == "scale":
                continue
            if (path[:-1] + ("scale",)) in flat:
                deq[path] = leaf.astype(jnp.float32) * flat[path[:-1] + ("scale",)]
            else:
                deq[path] = leaf
        want = fp.generate(
            jnp.asarray(ids), params=unflatten_dict(deq), max_length=15,
            do_sample=False, pad_token_id=0,
        ).sequences
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))

    def test_scanned_tree_conversion(self):
        """Stacked [L, d, f] kernels quantize per (layer, column)."""
        fp = FlaxLLaMAForCausalLM(
            serving_config(scan_layers=True, param_scan_axis=0),
            input_shape=(1, 8), seed=0,
        )
        qparams = quantize_params_int8(fp.params)
        from flax.traverse_util import flatten_dict

        flat = flatten_dict(qparams)
        wq = [v for k, v in flat.items() if k[-2:] == ("wq", "kernel")]
        sq = [v for k, v in flat.items() if k[-2:] == ("wq", "scale")]
        assert wq[0].dtype == jnp.int8 and wq[0].ndim == 3
        assert sq[0].shape == (2, 64)  # [L, f]


class TestW8A8:
    """Native-int8 MXU path: dynamic per-row activation quant + int8×int8
    dot (no per-weight VPU convert — the W8A16 kernel is convert-bound at
    decode GEMV shapes, NOTES.md round-2)."""

    @pytest.mark.parametrize("m,d,f", [(8, 256, 384), (3, 128, 128),
                                       (130, 512, 640)])
    def test_kernel_matches_xla_oracle(self, m, d, f):
        from lwm_tpu.ops.quant import (
            quantize_activations,
            w8a8_matmul_pallas,
            w8a8_matmul_xla,
        )

        kx, kw, ks = jax.random.split(jax.random.PRNGKey(7), 3)
        x = jax.random.normal(kx, (m, d), jnp.float32)
        w_q = jax.random.randint(kw, (d, f), -127, 128).astype(jnp.int8)
        scale = jax.random.uniform(ks, (f,), jnp.float32, 0.01, 0.1)
        x_q, x_s = quantize_activations(x)
        got = w8a8_matmul_pallas(
            x_q, x_s, w_q, scale, out_dtype=jnp.float32, interpret=True
        )
        want = w8a8_matmul_xla(x, w_q, scale)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-5
        )

    def test_close_to_fp_matmul(self):
        """W8A8 error vs the fp matmul is bounded by the two quant steps
        (relative error ~ 1/127 per operand on well-scaled inputs)."""
        from lwm_tpu.ops.quant import w8a8_matmul_xla

        kx, kw = jax.random.split(jax.random.PRNGKey(8))
        x = jax.random.normal(kx, (16, 256), jnp.float32)
        w = jax.random.normal(kw, (256, 384), jnp.float32) * 0.05
        q, s = quantize_weight(w)
        got = np.asarray(w8a8_matmul_xla(x, q, s))
        want = np.asarray(x @ w)
        denom = np.abs(want).max()
        assert np.abs(got - want).max() / denom < 0.03

    def test_model_w8a8_close_to_fp(self):
        """quant_dense='int8_w8a8' end-to-end logits stay near fp."""
        fp = FlaxLLaMAForCausalLM(serving_config(), input_shape=(1, 8), seed=0)
        qmodel = FlaxLLaMAForCausalLM(
            serving_config(quant_dense="int8_w8a8"), input_shape=(1, 8),
            seed=0, _do_init=False,
        )
        qparams = quantize_params_int8(fp.params)
        ids = jax.random.randint(jax.random.PRNGKey(9), (1, 16), 0, 128)
        lf = np.asarray(fp(ids, params=fp.params).logits, np.float32)
        lq = np.asarray(qmodel(ids, params=qparams).logits, np.float32)
        denom = np.abs(lf).max()
        assert np.abs(lq - lf).max() / denom < 0.08, (
            np.abs(lq - lf).max(), denom
        )

    def test_int8_xla_spelling_matches_int8(self):
        """quant_dense='int8_xla' (A/B knob) computes the same math as
        'int8': since round 3, 'auto' resolves to the XLA impl on EVERY
        backend (it measured fastest on TPU — ops/quant.py docstring), so
        the two spellings are bitwise-identical everywhere."""
        fp = FlaxLLaMAForCausalLM(serving_config(), input_shape=(1, 8), seed=0)
        qparams = quantize_params_int8(fp.params)
        ids = jax.random.randint(jax.random.PRNGKey(10), (1, 12), 0, 128)
        logits = {}
        for spelling in ("int8", "int8_xla"):
            qm = FlaxLLaMAForCausalLM(
                serving_config(quant_dense=spelling), input_shape=(1, 8),
                seed=0, _do_init=False,
            )
            logits[spelling] = np.asarray(qm(ids, params=qparams).logits)
        np.testing.assert_array_equal(logits["int8"], logits["int8_xla"])


class TestW8A8Exclusion:
    def test_lm_head_keeps_fp_activations_under_w8a8(self):
        """Int8Dense(impl='w8a8') named 'lm_head' must take the
        weight-only path (fp activations into the logits — the
        outlier-sensitivity mitigation, ops/quant.py W8A8_EXCLUDE),
        while an ordinary layer actually quantizes activations."""
        import flax.linen as nn

        from lwm_tpu.ops.quant import (
            Int8Dense,
            int8_matmul_xla,
            quantize_weight,
            w8a8_matmul_xla,
        )

        class Pair(nn.Module):
            @nn.compact
            def __call__(self, x):
                a = Int8Dense(features=48, impl="w8a8", name="lm_head")(x)
                b = Int8Dense(features=48, impl="w8a8", name="wq")(x)
                return a, b

        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (4, 32), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 48)) * 0.1
        q, s = quantize_weight(w)
        params = {
            "lm_head": {"kernel": q, "scale": s},
            "wq": {"kernel": q, "scale": s},
        }
        a, b = Pair().apply({"params": params}, x)
        want_head = int8_matmul_xla(x, q, s)     # weight-only, fp acts
        want_body = w8a8_matmul_xla(x, q, s)     # activation-quantized
        np.testing.assert_array_equal(np.asarray(a), np.asarray(want_head))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(want_body))
        # and the two paths genuinely differ (the exclusion is load-bearing)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0
