"""Flash-decoding Pallas kernel vs the XLA oracle (interpret mode on CPU).

kv is HEAD-MAJOR [b, h, T, d] — the cache storage layout (llama.py
`_concatenate_to_cache`): folding (b, h) into the kernel grid is then a
free reshape instead of a per-step full-cache transpose."""

import jax
import jax.numpy as jnp
import numpy as np

from lwm_tpu.ops.pallas_decode import flash_decode_pallas


def oracle_decode(q, k, v, mask):
    """Plain masked softmax attention for q_len==1 (the llama
    _inference_attn mesh-less path). k, v head-major [b, h, T, d]."""
    bias = jnp.where(mask[:, None, None, :], 0.0, -1e30)
    logits = jnp.einsum("bqhd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits / np.sqrt(q.shape[-1]) + bias
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bqhd", probs, v.astype(jnp.float32)).astype(q.dtype)


def quantize(x):
    """Per-(head, token) symmetric int8; scale [b, h, T] (no trailing
    singleton — mirrors llama._quantize_kv)."""
    scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(scale / 127.0, 1e-8)
    qx = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return qx.astype(jnp.int8), scale


class TestFlashDecode:
    def _setup(self, b=2, T=512, h=4, d=64, kv_len=300, seed=0):
        rng = jax.random.PRNGKey(seed)
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (b, 1, h, d), jnp.float32)
        k = jax.random.normal(kk, (b, h, T, d), jnp.float32)
        v = jax.random.normal(kv, (b, h, T, d), jnp.float32)
        mask = jnp.arange(T)[None, :] < kv_len
        mask = jnp.broadcast_to(mask, (b, T))
        return q, k, v, mask, kv_len

    def test_matches_oracle(self):
        q, k, v, mask, kv_len = self._setup()
        out = flash_decode_pallas(q, k, v, mask, kv_len, block_k=128, interpret=True)
        ref = oracle_decode(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_block_skip_equals_full_scan(self):
        """kv_len bounds only skip work; result must equal scanning all
        blocks (the mask already zeroes the tail)."""
        q, k, v, mask, kv_len = self._setup(T=1024, kv_len=130)
        out_skip = flash_decode_pallas(q, k, v, mask, kv_len, block_k=128, interpret=True)
        out_full = flash_decode_pallas(q, k, v, mask, 1024, block_k=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out_skip), np.asarray(out_full), atol=1e-6
        )

    def test_left_padding_holes(self):
        """Left-padded prompts leave invalid positions at the FRONT; the
        kernel must honor the mask, not just a length cutoff."""
        q, k, v, _, _ = self._setup(b=1, T=256)
        mask = (jnp.arange(256)[None, :] >= 64) & (jnp.arange(256)[None, :] < 200)
        out = flash_decode_pallas(q, k, v, mask, 200, block_k=64, interpret=True)
        ref = oracle_decode(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_int8_quantized_cache(self):
        q, k, v, mask, kv_len = self._setup(T=512, kv_len=400, seed=3)
        kq, ks = quantize(k)
        vq, vs = quantize(v)
        out = flash_decode_pallas(
            q, kq, vq, mask, kv_len, k_scale=ks, v_scale=vs,
            block_k=128, interpret=True,
        )
        # oracle on the dequantized cache: the kernel must match the
        # dequantize-then-attend semantics (not add extra error)
        ref = oracle_decode(
            q,
            kq.astype(jnp.float32) * ks[..., None],
            vq.astype(jnp.float32) * vs[..., None],
            mask,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_bf16_inputs(self):
        q, k, v, mask, kv_len = self._setup(seed=5)
        q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        out = flash_decode_pallas(q, k, v, mask, kv_len, block_k=128, interpret=True)
        ref = oracle_decode(q, k, v, mask)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
        )

    def test_nondivisible_block_falls_back(self):
        q, k, v, mask, kv_len = self._setup(T=384, kv_len=300)
        out = flash_decode_pallas(q, k, v, mask, kv_len, block_k=256, interpret=True)
        ref = oracle_decode(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
