"""Pallas flash kernels vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwm_tpu.ops import reference_attention
from lwm_tpu.ops.pallas_flash import (
    flash_attention_bwd_pallas,
    flash_attention_fwd_pallas,
)


def make_qkv(rng, b, s, h, d, skv=None, dtype=jnp.float32):
    skv = skv or s
    kq, kk, kv = jax.random.split(rng, 3)
    return (
        jax.random.normal(kq, (b, s, h, d), dtype),
        jax.random.normal(kk, (b, skv, h, d), dtype),
        jax.random.normal(kv, (b, skv, h, d), dtype),
    )


class TestPallasFwd:
    def test_causal_matches_reference(self):
        q, k, v = make_qkv(jax.random.PRNGKey(0), 2, 256, 2, 32)
        out, lse = flash_attention_fwd_pallas(
            q, k, v, block_q=64, block_k=64, interpret=True
        )
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_bias_and_segments(self):
        q, k, v = make_qkv(jax.random.PRNGKey(1), 1, 128, 2, 16)
        bias = jnp.where(
            jnp.arange(128)[None, None, None, :] < 112, 0.0,
            jnp.finfo(jnp.float32).min,
        ) * jnp.ones((1, 1, 1, 128))
        seg = (jnp.arange(128)[None, :] // 32).astype(jnp.int32)
        out, _ = flash_attention_fwd_pallas(
            q, k, v, bias, seg, seg, block_q=32, block_k=32, interpret=True
        )
        ref = reference_attention(q, k, v, bias=bias, segment_ids=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_offsets_ring_step_semantics(self):
        """Computing block (q_offset=128, kv at 0..128) must equal the
        corresponding slice of full attention when combined manually."""
        b, s, h, d = 1, 256, 2, 16
        q, k, v = make_qkv(jax.random.PRNGKey(2), b, s, h, d)
        # second half of q against first half of kv: fully visible
        out, lse = flash_attention_fwd_pallas(
            q[:, 128:], k[:, :128], v[:, :128],
            q_offset=128, kv_offset=0, block_q=64, block_k=64, interpret=True,
        )
        ref = reference_attention(
            q[:, 128:], k[:, :128], v[:, :128], causal=True,
            q_offset=128, kv_offset=0,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_kv_block_pick_is_lane_aligned(self):
        # kv blocks tile the LANE dimension of the logits/stats tiles, so
        # _pick_block must only return multiples of 128 there. 4224 (a
        # 16-frame video prefix + question, 33*128) has 8-aligned divisors
        # like 704 that are NOT lane-aligned — picking one trips the
        # kernel's _lane_tile assert (observed in vision_qa_bench).
        from lwm_tpu.ops.pallas_flash import NUM_LANES, _pick_block

        assert _pick_block(4224, 512, 2048, step=NUM_LANES) == 384
        for size in (4224, 1152, 32768, 33280):
            bk = _pick_block(size, 512, 2048, step=NUM_LANES)
            assert size % bk == 0
            assert bk % NUM_LANES == 0 or bk == size
        # sublane (query) picks keep full 8-step resolution
        assert _pick_block(32800, 512, 2048) % 8 == 0

    def test_lane_unfriendly_kv_extent_matches_reference(self):
        # skv = 1152 = 9*128: no 128-multiple divisor in (128, 1152) except
        # 384; the pick must land there and the kernel must stay exact.
        b, sq, h, d, skv = 1, 16, 1, 32, 1152
        q, k, v = make_qkv(jax.random.PRNGKey(11), b, sq, h, d, skv=skv)
        out, _ = flash_attention_fwd_pallas(
            q, k, v, causal=True, q_offset=skv - sq, block_q=512, block_k=512,
            interpret=True,
        )
        ref = reference_attention(q, k, v, causal=True, q_offset=skv - sq)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_fully_masked_rows_zero(self):
        q, k, v = make_qkv(jax.random.PRNGKey(3), 1, 64, 2, 16)
        # kv strictly in the future of all q rows → all masked
        out, lse = flash_attention_fwd_pallas(
            q, k, v, q_offset=0, kv_offset=1000, block_q=32, block_k=32,
            interpret=True,
        )
        assert not np.any(np.isnan(np.asarray(out)))
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestPallasBwd:
    # both lse/delta operand layouts: lane-replicated [bh, sq, 128] (small-
    # stats fast path) and splash-style sublane-replicated [bh, 8, sq]
    # (extreme-context fit path; in-kernel selector-dot relayout)
    @pytest.mark.parametrize("stats_sub8", ["0", "1"])
    def test_grads_match_reference(self, stats_sub8, monkeypatch):
        monkeypatch.setenv("LWM_PALLAS_STATS_SUB8", stats_sub8)
        b, s, h, d = 1, 128, 2, 16
        q, k, v = make_qkv(jax.random.PRNGKey(4), b, s, h, d)
        w = jax.random.normal(jax.random.PRNGKey(5), (b, s, h, d))

        out, lse = flash_attention_fwd_pallas(
            q, k, v, block_q=32, block_k=32, interpret=True
        )
        g = w  # d(sum(out*w))/d(out) = w
        delta = jnp.einsum("bqhd,bqhd->bhq", g, out)
        dq, dk, dv = flash_attention_bwd_pallas(
            q, k, v, g, lse, delta, block_q=32, block_k=32, interpret=True
        )

        def loss_ref(q, k, v):
            return jnp.sum(reference_attention(q, k, v) * w)

        rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=1e-4, rtol=1e-4)

    def test_q_segmented_bwd_matches_single_shot(self):
        """q_segments=4: per-segment dq concat + fp32 dk/dv accumulation
        must reproduce the whole-sq backward (incl. bias, segments, GQA,
        dropout, and a ring-style q_offset)."""
        b, s, h, hkv, d = 2, 128, 4, 2, 16
        kq, kk, kv, kw = jax.random.split(jax.random.PRNGKey(40), 4)
        q = jax.random.normal(kq, (b, s, h, d))
        k = jax.random.normal(kk, (b, s, hkv, d))
        v = jax.random.normal(kv, (b, s, hkv, d))
        w = jax.random.normal(kw, (b, s, h, d))
        bias = jnp.where(
            jnp.arange(s)[None, None, None, :] < 100, 0.0, -1e30
        ) * jnp.ones((b, 1, 1, 1))
        seg_ids = jnp.broadcast_to(
            (jnp.arange(s)[None, :] // 32).astype(jnp.int32), (b, s)
        )
        rng = jax.random.key_data(jax.random.PRNGKey(7))
        kwargs = dict(
            block_q=16, block_k=32, interpret=True, q_offset=64,
            dropout_rng=rng, attn_pdrop=0.25,
        )
        out, lse = flash_attention_fwd_pallas(
            q, k, v, bias, seg_ids, seg_ids, **kwargs
        )
        out4, lse4 = flash_attention_fwd_pallas(
            q, k, v, bias, seg_ids, seg_ids, q_segments=4, **kwargs
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out4))
        np.testing.assert_array_equal(np.asarray(lse), np.asarray(lse4))
        delta = jnp.einsum("bqhd,bqhd->bhq", w, out)
        one = flash_attention_bwd_pallas(
            q, k, v, w, lse, delta, bias, seg_ids, seg_ids,
            q_segments=1, **kwargs,
        )
        segd = flash_attention_bwd_pallas(
            q, k, v, w, lse, delta, bias, seg_ids, seg_ids,
            q_segments=4, **kwargs,
        )
        for a, b_ in zip(one, segd):
            assert a.shape == b_.shape
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5
            )

    def test_sub8_layout_bit_exact_vs_lane_layout(self, monkeypatch):
        """The selector-dot relayout must be EXACT (0/1 weights, HIGHEST
        precision): both layouts produce identical grads bit for bit."""
        b, s, h, d = 2, 128, 2, 32
        q, k, v = make_qkv(jax.random.PRNGKey(14), b, s, h, d)
        w = jax.random.normal(jax.random.PRNGKey(15), (b, s, h, d))
        out, lse = flash_attention_fwd_pallas(
            q, k, v, block_q=32, block_k=32, interpret=True
        )
        delta = jnp.einsum("bqhd,bqhd->bhq", w, out)
        grads = {}
        for mode in ("0", "1"):
            monkeypatch.setenv("LWM_PALLAS_STATS_SUB8", mode)
            grads[mode] = flash_attention_bwd_pallas(
                q, k, v, w, lse, delta, block_q=32, block_k=32, interpret=True
            )
        for a, b_ in zip(grads["0"], grads["1"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_grads_with_bias_segments(self):
        b, s, h, d = 2, 128, 2, 16
        q, k, v = make_qkv(jax.random.PRNGKey(6), b, s, h, d)
        bias = jnp.where(
            jnp.arange(s)[None, None, None, :] < 100, 0.0, -1e9
        ) * jnp.ones((b, 1, 1, s))
        seg = (jnp.arange(s)[None, :] // 64).astype(jnp.int32) * jnp.ones(
            (b, 1), jnp.int32
        )
        w = jax.random.normal(jax.random.PRNGKey(7), (b, s, h, d))
        out, lse = flash_attention_fwd_pallas(
            q, k, v, bias, seg, seg, block_q=32, block_k=32, interpret=True
        )
        delta = jnp.einsum("bqhd,bqhd->bhq", w, out)
        dq, dk, dv = flash_attention_bwd_pallas(
            q, k, v, w, lse, delta, bias, seg, seg,
            block_q=32, block_k=32, interpret=True,
        )

        def loss_ref(q, k, v):
            return jnp.sum(reference_attention(q, k, v, bias=bias, segment_ids=seg) * w)

        rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=1e-4, rtol=1e-4)


class TestPallasGeneralBias:
    """Full §2.7 bias contract: any broadcastable [b|1, h|1, sq|1, skv]."""

    def test_full_bias_forward(self):
        b, s, h, d = 1, 128, 2, 16
        q, k, v = make_qkv(jax.random.PRNGKey(8), b, s, h, d)
        bias = 0.5 * jax.random.normal(jax.random.PRNGKey(9), (b, 1, s, s))
        out, _ = flash_attention_fwd_pallas(
            q, k, v, bias, block_q=32, block_k=32, interpret=True
        )
        ref = reference_attention(q, k, v, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_per_head_full_bias_forward(self):
        b, s, h, d = 2, 64, 2, 16
        q, k, v = make_qkv(jax.random.PRNGKey(10), b, s, h, d)
        bias = 0.5 * jax.random.normal(jax.random.PRNGKey(11), (b, h, s, s))
        out, _ = flash_attention_fwd_pallas(
            q, k, v, bias, block_q=32, block_k=32, interpret=True
        )
        ref = reference_attention(q, k, v, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_per_head_per_key_bias_forward(self):
        b, s, h, d = 1, 64, 2, 16
        q, k, v = make_qkv(jax.random.PRNGKey(12), b, s, h, d)
        bias = 0.5 * jax.random.normal(jax.random.PRNGKey(13), (b, h, 1, s))
        out, _ = flash_attention_fwd_pallas(
            q, k, v, bias, block_q=32, block_k=32, interpret=True
        )
        ref = reference_attention(q, k, v, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_full_bias_grads(self):
        b, s, h, d = 1, 64, 2, 16
        q, k, v = make_qkv(jax.random.PRNGKey(14), b, s, h, d)
        bias = 0.5 * jax.random.normal(jax.random.PRNGKey(15), (b, h, s, s))
        w = jax.random.normal(jax.random.PRNGKey(16), (b, s, h, d))
        out, lse = flash_attention_fwd_pallas(
            q, k, v, bias, block_q=32, block_k=32, interpret=True
        )
        delta = jnp.einsum("bqhd,bqhd->bhq", w, out)
        dq, dk, dv = flash_attention_bwd_pallas(
            q, k, v, w, lse, delta, bias, block_q=32, block_k=32, interpret=True
        )

        def loss_ref(q, k, v):
            return jnp.sum(reference_attention(q, k, v, bias=bias) * w)

        rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=1e-4, rtol=1e-4)


class TestPallasDropout:
    """In-kernel dropout RNG (pltpu.prng_*): masks keyed by (batch·head,
    global tile coords), so fwd/bwd draw identical masks. The Pallas bit
    stream differs from the XLA oracle's threefry — tests check
    determinism, mean preservation, and grad consistency against an
    explicit-mask reference (mask recovered from the kernel's own output)."""

    PDROP = 0.3

    def _setup(self, b=1, s=128, h=2, d=16, seed=20):
        q, k, v = make_qkv(jax.random.PRNGKey(seed), b, s, h, d)
        rng = jax.random.key_data(jax.random.PRNGKey(99))
        return q, k, v, rng

    def test_deterministic_across_calls(self):
        q, k, v, rng = self._setup()
        out1, lse1 = flash_attention_fwd_pallas(
            q, k, v, block_q=32, block_k=32, interpret=True,
            dropout_rng=rng, attn_pdrop=self.PDROP,
        )
        out2, lse2 = flash_attention_fwd_pallas(
            q, k, v, block_q=32, block_k=32, interpret=True,
            dropout_rng=rng, attn_pdrop=self.PDROP,
        )
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        np.testing.assert_array_equal(np.asarray(lse1), np.asarray(lse2))

    def test_different_rng_different_mask(self):
        q, k, v, rng = self._setup()
        rng2 = jax.random.key_data(jax.random.PRNGKey(123))
        out1, _ = flash_attention_fwd_pallas(
            q, k, v, block_q=32, block_k=32, interpret=True,
            dropout_rng=rng, attn_pdrop=self.PDROP,
        )
        out2, _ = flash_attention_fwd_pallas(
            q, k, v, block_q=32, block_k=32, interpret=True,
            dropout_rng=rng2, attn_pdrop=self.PDROP,
        )
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_mean_preserving(self):
        """Averaged over many independent rngs, dropped attention ≈
        undropped (inverted scaling compensates)."""
        q, k, v, _ = self._setup(s=64)
        base = reference_attention(q, k, v)
        acc = 0.0
        n = 24
        for i in range(n):
            rng = jax.random.key_data(jax.random.PRNGKey(1000 + i))
            out, _ = flash_attention_fwd_pallas(
                q, k, v, block_q=32, block_k=32, interpret=True,
                dropout_rng=rng, attn_pdrop=self.PDROP,
            )
            acc = acc + np.asarray(out, np.float64)
        err = np.abs(acc / n - np.asarray(base, np.float64)).mean()
        scale = np.abs(np.asarray(base)).mean()
        assert err < 0.15 * scale, (err, scale)

    def test_grads_match_explicit_mask_reference(self):
        """Recover the keep mask from the kernel's own forward (one-hot v
        probes), then check fwd and bwd against an autodiffed reference
        that applies the SAME mask — validates fwd/bwd mask consistency
        and the dropout calculus without needing matching bit streams."""
        b, s, h, d = 1, 64, 1, 16
        q, k, v, rng = self._setup(b=b, s=s, h=h, d=d, seed=21)
        bq = bk = 32

        # recover per-(q,k) keep: run the kernel with v = one-hot per key
        # chunk, pdrop'd output column j is nonzero iff keep[i, j]
        keep = np.zeros((s, s), bool)
        out_nd, lse = flash_attention_fwd_pallas(
            q, k, v, block_q=bq, block_k=bk, interpret=True
        )
        for j0 in range(0, s, d):
            probe = jnp.zeros((b, s, h, d), jnp.float32)
            for jj in range(d):
                probe = probe.at[:, j0 + jj, :, jj].set(1.0)
            outp, _ = flash_attention_fwd_pallas(
                q, k, probe, block_q=bq, block_k=bk, interpret=True,
                dropout_rng=rng, attn_pdrop=self.PDROP,
            )
            # outp[0, i, 0, jj] = p̂[i, j0+jj] (scaled dropped prob)
            keep[:, j0:j0 + d] = np.asarray(outp[0, :, 0, :]) != 0.0

        keep_j = jnp.asarray(keep)

        def ref_dropped(q, k, v):
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
            causal = jnp.tril(jnp.ones((s, s), bool))
            logits = jnp.where(causal[None, None], logits, -1e30)
            p = jax.nn.softmax(logits, axis=-1)
            p = jnp.where(keep_j[None, None], p / (1 - self.PDROP), 0.0)
            return jnp.einsum("bhqk,bkhd->bqhd", p, v)

        out, lse = flash_attention_fwd_pallas(
            q, k, v, block_q=bq, block_k=bk, interpret=True,
            dropout_rng=rng, attn_pdrop=self.PDROP,
        )
        ref = ref_dropped(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

        w = jax.random.normal(jax.random.PRNGKey(7), (b, s, h, d))
        delta = jnp.einsum("bqhd,bqhd->bhq", w, out)
        dq, dk, dv = flash_attention_bwd_pallas(
            q, k, v, w, lse, delta, block_q=bq, block_k=bk, interpret=True,
            dropout_rng=rng, attn_pdrop=self.PDROP,
        )
        rq, rk, rv = jax.grad(
            lambda q, k, v: jnp.sum(ref_dropped(q, k, v) * w), argnums=(0, 1, 2)
        )(q, k, v)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=1e-4, rtol=1e-4)
