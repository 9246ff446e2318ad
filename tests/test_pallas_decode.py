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


class TestFlashPrefillWithCache:
    """The llama `_inference_attn` prefill branch: flash kernel with
    q_offset = cache index + per-key bias, vs the XLA fallback math
    (exact-mask oracle). Mirrors llama.py use_prefill_kernel."""

    def _oracle(self, q, k_sm, v_sm, mask4):
        bias = jnp.where(mask4, 0.0, -1e30)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k_sm.astype(jnp.float32))
        logits = logits / np.sqrt(q.shape[-1]) + bias
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v_sm.astype(jnp.float32))

    def _run(self, b=2, h=4, d=64, T=256, q_len=32, cache_idx=64, holes=False):
        from lwm_tpu.ops.blockwise import BIG_NEG
        from lwm_tpu.ops.pallas_flash import flash_attention_fwd_pallas

        rng = jax.random.PRNGKey(7)
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (b, q_len, h, d), jnp.float32)
        k_sm = jax.random.normal(kk, (b, T, h, d), jnp.float32)
        v_sm = jax.random.normal(kv, (b, T, h, d), jnp.float32)

        # per-key validity: everything < cache_idx + q_len, optionally with
        # left-padding holes at the front
        key_valid = jnp.arange(T)[None, :] < (cache_idx + q_len)
        if holes:
            key_valid = key_valid & (jnp.arange(T)[None, :] >= 24)
        key_valid = jnp.broadcast_to(key_valid, (b, T))

        # the 4-D mask exactly as llama.__call__ builds it for the
        # cached-decode branch: causal frontier from the cache index
        causal = (
            jnp.arange(T)[None] <= (jnp.arange(q_len) + cache_idx)[:, None]
        )[None, None]
        mask4 = jnp.broadcast_to(causal, (b, 1, q_len, T)) & key_valid[:, None, None, :]

        ref = self._oracle(q, k_sm, v_sm, mask4)

        key_mask = mask4[:, 0, -1, :]
        bias = jnp.where(key_mask, 0.0, BIG_NEG)[:, None, None, :]
        out, _ = flash_attention_fwd_pallas(
            q, k_sm, v_sm, bias=bias.astype(jnp.float32),
            causal=True, q_offset=jnp.asarray(cache_idx, jnp.int32),
            block_q=32, block_k=128, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_prefill_at_cache_offset(self):
        self._run()

    def test_prefill_with_left_padding_holes(self):
        self._run(holes=True)

    def test_prefill_from_zero(self):
        self._run(cache_idx=0, q_len=64)

    def test_traced_offset(self):
        """q_offset arrives traced (cache_index is a device scalar)."""
        from lwm_tpu.ops.blockwise import BIG_NEG
        from lwm_tpu.ops.pallas_flash import flash_attention_fwd_pallas

        b, h, d, T, q_len = 1, 2, 64, 256, 32
        rng = jax.random.PRNGKey(9)
        q = jax.random.normal(rng, (b, q_len, h, d), jnp.float32)
        k_sm = jax.random.normal(rng, (b, T, h, d), jnp.float32)
        v_sm = jax.random.normal(rng, (b, T, h, d), jnp.float32)

        @jax.jit
        def run(cache_idx):
            key_mask = jnp.arange(T)[None, :] < (cache_idx + q_len)
            bias = jnp.where(key_mask, 0.0, BIG_NEG)[:, None, None, :]
            out, _ = flash_attention_fwd_pallas(
                q, k_sm, v_sm, bias=jnp.broadcast_to(bias, (b, 1, 1, T)).astype(jnp.float32),
                causal=True, q_offset=cache_idx,
                block_q=32, block_k=128, interpret=True,
            )
            return out

        out = run(jnp.asarray(128, jnp.int32))
        causal = (
            jnp.arange(T)[None] <= (jnp.arange(q_len) + 128)[:, None]
        )[None, None]
        mask4 = jnp.broadcast_to(causal, (b, 1, q_len, T)) & (
            jnp.arange(T)[None, :] < 128 + q_len
        )[:, None, None, :]
        ref = self._oracle(q, k_sm, v_sm, mask4)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )
