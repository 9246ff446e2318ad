"""Attention kernel correctness: blockwise / ring / inference vs the
full-materialization oracle, forward and backward, on an 8-device CPU mesh."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as PS

from lwm_tpu.ops import blockwise_attn, reference_attention, ring_attention
from lwm_tpu.ops.ring import ring_attention_inference
from lwm_tpu.parallel import create_mesh


def make_qkv(rng, b, s, h, d, skv=None, dtype=jnp.float32):
    skv = skv or s
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, s, h, d), dtype)
    k = jax.random.normal(kk, (b, skv, h, d), dtype)
    v = jax.random.normal(kv, (b, skv, h, d), dtype)
    return q, k, v


class TestBlockwise:
    @pytest.mark.parametrize("cq,ck", [(64, 64), (32, 128), (256, 256)])
    def test_causal_matches_reference(self, cq, ck):
        q, k, v = make_qkv(jax.random.PRNGKey(0), 2, 256, 4, 32)
        out = blockwise_attn(q, k, v, query_chunk_size=cq, key_chunk_size=ck)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    def test_bias_and_segments(self):
        rng = jax.random.PRNGKey(1)
        q, k, v = make_qkv(rng, 2, 128, 2, 16)
        # padding bias over kv positions + packed segments
        bias = jnp.where(
            jnp.arange(128)[None, None, None, :] < 100, 0.0, -1e9
        ).astype(jnp.float32) * jnp.ones((2, 1, 1, 128))
        seg = (jnp.arange(128)[None, :] // 32).astype(jnp.int32) * jnp.ones((2, 1), jnp.int32)
        out = blockwise_attn(
            q, k, v, bias=bias, segment_ids=seg,
            query_chunk_size=32, key_chunk_size=32,
        )
        ref = reference_attention(q, k, v, bias=bias, segment_ids=seg)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    def test_grads_match_reference(self):
        q, k, v = make_qkv(jax.random.PRNGKey(2), 1, 128, 2, 16)

        def loss_block(q, k, v):
            return jnp.sum(
                blockwise_attn(q, k, v, query_chunk_size=32, key_chunk_size=32) ** 2
            )

        def loss_ref(q, k, v):
            return jnp.sum(reference_attention(q, k, v) ** 2)

        g1 = jax.grad(loss_block, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)

    def test_fully_masked_rows_zero(self):
        q, k, v = make_qkv(jax.random.PRNGKey(3), 1, 64, 2, 16)
        seg = jnp.concatenate(
            [jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), jnp.int32)], -1
        )
        # the reference masks with finfo.min (llama.py:532-536); rows whose
        # every key is masked at that magnitude must yield 0, not NaN
        bias = jnp.full((1, 1, 1, 64), jnp.finfo(jnp.float32).min)
        out = blockwise_attn(q, k, v, bias=bias, segment_ids=seg,
                             query_chunk_size=32, key_chunk_size=32)
        assert not np.any(np.isnan(out))
        np.testing.assert_allclose(out, np.zeros_like(out), atol=1e-6)


@pytest.fixture(scope="module")
def mesh():
    import jax as _jax

    assert len(_jax.devices()) == 8
    return create_mesh("1,1,2,4")  # tp=2, sp=4


def run_ring(mesh, q, k, v, bias, seg, blockwise_kwargs):
    fn = shard_map(
        partial(
            ring_attention,
            axis_name="sp",
            float32_logits=True,
            cache_idx=None,
            blockwise_kwargs=blockwise_kwargs,
        ),
        mesh=mesh,
        in_specs=(
            PS(("dp", "fsdp"), "sp", "tp", None),
            PS(("dp", "fsdp"), "sp", "tp", None),
            PS(("dp", "fsdp"), "sp", "tp", None),
            PS(("dp", "fsdp"), None, None, None),
            PS(("dp", "fsdp"), None),
        ),
        out_specs=PS(("dp", "fsdp"), "sp", "tp", None),
        check_vma=False,
    )
    return fn(q, k, v, bias, seg)


class TestRingAttention:
    BKW = dict(
        causal_block_size=1,
        deterministic=True,
        dropout_rng=None,
        attn_pdrop=0.0,
        query_chunk_size=32,
        key_chunk_size=32,
        dtype=jnp.float32,
        policy=jax.checkpoint_policies.nothing_saveable,
        precision=None,
        prevent_cse=True,
    )

    def test_forward_matches_reference(self, mesh):
        q, k, v = make_qkv(jax.random.PRNGKey(4), 2, 256, 4, 32)
        bias = jnp.where(
            jnp.arange(256)[None, None, None, :] < 240, 0.0, jnp.finfo(jnp.float32).min
        ) * jnp.ones((2, 1, 1, 256))
        seg = (jnp.arange(256)[None, :] // 64).astype(jnp.int32) * jnp.ones((2, 1), jnp.int32)
        with mesh:
            out = run_ring(mesh, q, k, v, bias, seg, self.BKW)
        ref = reference_attention(q, k, v, bias=bias, segment_ids=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_forward_no_bias_no_seg(self, mesh):
        q, k, v = make_qkv(jax.random.PRNGKey(5), 1, 128, 2, 16)
        with mesh:
            out = run_ring(mesh, q, k, v, None, None, self.BKW)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_backward_matches_reference(self, mesh):
        q, k, v = make_qkv(jax.random.PRNGKey(6), 1, 128, 2, 16)
        seg = jnp.zeros((1, 128), jnp.int32)
        w = jax.random.normal(jax.random.PRNGKey(7), (1, 128, 2, 16))

        def loss_ring(q, k, v):
            with mesh:
                out = run_ring(mesh, q, k, v, None, seg, self.BKW)
            return jnp.sum(out * w)

        def loss_ref(q, k, v):
            return jnp.sum(reference_attention(q, k, v) * w)

        g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
                err_msg=f"d{name} mismatch",
            )

    def test_backward_with_bias_and_segments(self, mesh):
        q, k, v = make_qkv(jax.random.PRNGKey(8), 2, 128, 2, 16)
        bias = jnp.where(
            jnp.arange(128)[None, None, None, :] < 112, 0.0, -1e9
        ) * jnp.ones((2, 1, 1, 128))
        seg = (jnp.arange(128)[None, :] // 32).astype(jnp.int32) * jnp.ones((2, 1), jnp.int32)
        w = jax.random.normal(jax.random.PRNGKey(9), (2, 128, 2, 16))

        def loss_ring(q, k, v):
            with mesh:
                out = run_ring(mesh, q, k, v, bias, seg, self.BKW)
            return jnp.sum(out * w)

        def loss_ref(q, k, v):
            return jnp.sum(reference_attention(q, k, v, bias=bias, segment_ids=seg) * w)

        g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
                err_msg=f"d{name} mismatch",
            )

    def test_bf16_forward_tolerance(self, mesh):
        q, k, v = make_qkv(jax.random.PRNGKey(10), 1, 128, 2, 16, dtype=jnp.bfloat16)
        bkw = dict(self.BKW, dtype=jnp.bfloat16)
        with mesh:
            out = run_ring(mesh, q, k, v, None, None, bkw)
        ref = reference_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
        )


class TestRingInference:
    def test_decode_single_token(self, mesh):
        b, skv, h, d = 2, 256, 4, 32
        rng = jax.random.PRNGKey(11)
        q, k, v = make_qkv(rng, b, 1, h, d, skv=skv)
        # causal mask for a query at position 200 with full kv cache
        kv_len = 201
        mask = (jnp.arange(skv)[None, None, None, :] < kv_len) * jnp.ones(
            (b, 1, 1, skv), bool
        )
        fn = shard_map(
            partial(ring_attention_inference, axis_name="sp", q_sharded=False),
            mesh=mesh,
            in_specs=(
                PS(("dp", "fsdp"), None, "tp", None),
                PS(("dp", "fsdp"), "tp", "sp", None),
                PS(("dp", "fsdp"), "tp", "sp", None),
                PS(("dp", "fsdp"), None, None, None),
            ),
            out_specs=PS(("dp", "fsdp"), None, "tp", None),
            check_vma=False,
        )
        with mesh:
            out = fn(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), mask)
        bias = jnp.where(mask, 0.0, -1e9)
        ref = reference_attention(q, k, v, bias=bias, causal=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_prefill_sharded_q(self, mesh):
        b, s, h, d = 1, 128, 2, 16
        q, k, v = make_qkv(jax.random.PRNGKey(12), b, s, h, d)
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        mask = jnp.broadcast_to(causal, (b, 1, s, s))
        fn = shard_map(
            partial(ring_attention_inference, axis_name="sp", q_sharded=True),
            mesh=mesh,
            in_specs=(
                PS(("dp", "fsdp"), "sp", "tp", None),
                PS(("dp", "fsdp"), "tp", "sp", None),
                PS(("dp", "fsdp"), "tp", "sp", None),
                PS(("dp", "fsdp"), None, "sp", None),
            ),
            out_specs=PS(("dp", "fsdp"), "sp", "tp", None),
            check_vma=False,
        )
        with mesh:
            out = fn(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), mask)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_prefill_grads_match_reference(self, mesh):
        # TRAINING dispatches here for seq <= chunk on an sp>1 mesh
        # (llama.py attention dispatch): the pmax combine must be
        # differentiable (stop_gradient'd stabilization shift) and give
        # the oracle's gradients
        b, s, h, d = 1, 128, 2, 16
        q, k, v = make_qkv(jax.random.PRNGKey(13), b, s, h, d)
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        mask = jnp.broadcast_to(causal, (b, 1, s, s))
        fn = shard_map(
            partial(ring_attention_inference, axis_name="sp", q_sharded=True),
            mesh=mesh,
            in_specs=(
                PS(("dp", "fsdp"), "sp", "tp", None),
                PS(("dp", "fsdp"), "tp", "sp", None),
                PS(("dp", "fsdp"), "tp", "sp", None),
                PS(("dp", "fsdp"), None, "sp", None),
            ),
            out_specs=PS(("dp", "fsdp"), "sp", "tp", None),
            check_vma=False,
        )
        w = jax.random.normal(jax.random.PRNGKey(14), (b, s, h, d))

        def loss_sharded(q, k, v):
            return jnp.sum(fn(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), mask) * w)

        def loss_ref(q, k, v):
            return jnp.sum(reference_attention(q, k, v) * w)

        with mesh:
            grads = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
        ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for g, rg in zip(grads, ref_grads):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(rg), atol=2e-5, rtol=2e-5
            )

    def test_decode_kernel_partials_match_xla(self, mesh):
        """Per-shard Pallas flash-decoding partials + psum combine
        (interpret mode) == the XLA chunked-flash path, including a
        left-padding hole and a shard that is entirely past the causal
        frontier (kv_len_loc == 0 on that shard)."""
        b, skv, h, d = 2, 512, 4, 32
        rng = jax.random.PRNGKey(15)
        q, k, v = make_qkv(rng, b, 1, h, d, skv=skv)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        # frontier at 300 (last sp shard of 4×128 fully masked), plus a
        # left-padding hole over [0, 40)
        valid = (jnp.arange(skv) < 300) & (jnp.arange(skv) >= 40)
        mask = jnp.broadcast_to(valid[None, None, None, :], (b, 1, 1, skv))

        def build(impl, interpret):
            return shard_map(
                partial(
                    ring_attention_inference, axis_name="sp",
                    q_sharded=False, impl=impl, interpret=interpret,
                ),
                mesh=mesh,
                in_specs=(
                    PS(("dp", "fsdp"), None, "tp", None),
                    PS(("dp", "fsdp"), "tp", "sp", None),
                    PS(("dp", "fsdp"), "tp", "sp", None),
                    PS(("dp", "fsdp"), None, None, None),
                ),
                out_specs=PS(("dp", "fsdp"), None, "tp", None),
                check_vma=False,
            )

        with mesh:
            out_kernel = build("pallas", True)(q, k, v, mask)
            out_xla = build("xla", False)(q, k, v, mask)
        np.testing.assert_allclose(
            np.asarray(out_kernel), np.asarray(out_xla), atol=2e-5, rtol=2e-5
        )


class TestFlashAttentionLocal:
    def test_forward_and_grads_match_reference(self):
        from lwm_tpu.ops import flash_attention

        q, k, v = make_qkv(jax.random.PRNGKey(20), 2, 128, 2, 16)
        bias = jnp.where(
            jnp.arange(128)[None, None, None, :] < 112, 0.0, -1e9
        ) * jnp.ones((2, 1, 1, 128))
        seg = (jnp.arange(128)[None, :] // 32).astype(jnp.int32) * jnp.ones(
            (2, 1), jnp.int32
        )
        w = jax.random.normal(jax.random.PRNGKey(21), (2, 128, 2, 16))

        def loss_flash(q, k, v):
            out = flash_attention(
                q, k, v, bias=bias, segment_ids=seg,
                query_chunk_size=32, key_chunk_size=32,
            )
            return jnp.sum(out * w)

        def loss_ref(q, k, v):
            return jnp.sum(
                reference_attention(q, k, v, bias=bias, segment_ids=seg) * w
            )

        o1 = flash_attention(q, k, v, bias=bias, segment_ids=seg,
                             query_chunk_size=32, key_chunk_size=32)
        o2 = reference_attention(q, k, v, bias=bias, segment_ids=seg)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5, rtol=1e-5)
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
                err_msg=f"d{name}",
            )

    def test_backward_memory_is_flash_not_quadratic(self):
        """Residuals must be exactly q,k,v,out,lse — no per-chunk stacking
        (the O(nq·nk) blowup that OOMed the naive autodiff path)."""
        import contextlib
        import io

        from jax.ad_checkpoint import print_saved_residuals

        from lwm_tpu.ops import flash_attention

        q, k, v = make_qkv(jax.random.PRNGKey(22), 1, 256, 2, 16)

        def f(q, k, v):
            return flash_attention(
                q, k, v, query_chunk_size=64, key_chunk_size=64
            ).sum()

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            print_saved_residuals(f, q, k, v)
        lines = [l for l in buf.getvalue().splitlines() if l.strip()]
        assert len(lines) <= 6, lines
        assert not any("scan" in l for l in lines), lines


class TestStripedRing:
    """Striped layout: permuted inputs through the striped ring must equal
    the reference on un-permuted arrays (fwd + bwd)."""

    BKW = dict(
        causal_block_size=1, deterministic=True, dropout_rng=None,
        attn_pdrop=0.0, query_chunk_size=32, key_chunk_size=32,
        dtype=jnp.float32, policy=None, precision=None, prevent_cse=True,
        layout="striped",
    )

    def _run(self, mesh, q, k, v, bias, seg):
        fn = shard_map(
            partial(ring_attention, axis_name="sp", blockwise_kwargs=self.BKW),
            mesh=mesh,
            in_specs=(
                PS(("dp", "fsdp"), "sp", "tp", None),
                PS(("dp", "fsdp"), "sp", "tp", None),
                PS(("dp", "fsdp"), "sp", "tp", None),
                PS(("dp", "fsdp"), None, None, None),
                PS(("dp", "fsdp"), None),
            ),
            out_specs=PS(("dp", "fsdp"), "sp", "tp", None),
            check_vma=False,
        )
        return fn(q, k, v, bias, seg)

    def test_forward_matches_reference(self, mesh):
        from lwm_tpu.ops.striped import stripe_permute, stripe_unpermute

        sp = mesh.shape["sp"]
        q, k, v = make_qkv(jax.random.PRNGKey(30), 2, 256, 4, 32)
        bias = jnp.where(
            jnp.arange(256)[None, None, None, :] < 240, 0.0, -1e9
        ) * jnp.ones((2, 1, 1, 256))
        seg = (jnp.arange(256)[None, :] // 64).astype(jnp.int32) * jnp.ones(
            (2, 1), jnp.int32
        )
        qp = jnp.asarray(stripe_permute(q, sp, axis=1))
        kp = jnp.asarray(stripe_permute(k, sp, axis=1))
        vp = jnp.asarray(stripe_permute(v, sp, axis=1))
        biasp = jnp.asarray(stripe_permute(bias, sp, axis=-1))
        segp = jnp.asarray(stripe_permute(seg, sp, axis=-1))
        with mesh:
            out_p = self._run(mesh, qp, kp, vp, biasp, segp)
        out = stripe_unpermute(np.asarray(out_p), sp, axis=1)
        ref = reference_attention(q, k, v, bias=bias, segment_ids=seg)
        np.testing.assert_allclose(out, np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_backward_matches_reference(self, mesh):
        from lwm_tpu.ops.striped import stripe_permute, stripe_unpermute

        sp = mesh.shape["sp"]
        q, k, v = make_qkv(jax.random.PRNGKey(31), 1, 128, 2, 16)
        w = jax.random.normal(jax.random.PRNGKey(32), (1, 128, 2, 16))
        wp = jnp.asarray(stripe_permute(w, sp, axis=1))

        def loss_striped(q, k, v):
            qp = jnp.asarray(stripe_permute(q, sp, axis=1))
            kp = jnp.asarray(stripe_permute(k, sp, axis=1))
            vp = jnp.asarray(stripe_permute(v, sp, axis=1))
            with mesh:
                out_p = self._run(mesh, qp, kp, vp, None, None)
            return jnp.sum(out_p * wp)

        def loss_ref(q, k, v):
            return jnp.sum(reference_attention(q, k, v) * w)

        g1 = jax.grad(loss_striped, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
                err_msg=f"d{name}",
            )


class TestAttentionDropout:
    """Flash-style attention dropout: masks keyed by global tile coords, so
    ring(sp>1) is bitwise-equal to the single-device blockwise oracle with
    the same rng and chunk sizes; custom-VJP grads match XLA autodiff."""

    PDROP = 0.3

    def bkw(self, rng, deterministic=False):
        return dict(
            causal_block_size=1,
            deterministic=deterministic,
            dropout_rng=rng,
            attn_pdrop=self.PDROP,
            query_chunk_size=32,
            key_chunk_size=32,
            dtype=jnp.float32,
            policy=jax.checkpoint_policies.nothing_saveable,
            precision=None,
            prevent_cse=True,
        )

    def setup_method(self, _):
        # pure-sp mesh (dp=fsdp=tp=1) over a 4-device subset: each device
        # sees the full (b, h) extents, so per-tile mask shapes — and hence
        # the masks themselves — align with the single-device oracle
        from jax.sharding import Mesh

        self.mesh = Mesh(
            np.array(jax.devices()[:4]).reshape(1, 1, 1, 4),
            ("dp", "fsdp", "tp", "sp"),
        )
        self.rng = jax.random.PRNGKey(7)
        self.q, self.k, self.v = make_qkv(jax.random.PRNGKey(5), 2, 256, 4, 32)
        self.seg = jnp.zeros((2, 256), jnp.int32)

    def oracle(self, q, k, v):
        return blockwise_attn(
            q, k, v, causal=True, query_chunk_size=32, key_chunk_size=32,
            deterministic=False, dropout_rng=self.rng, attn_pdrop=self.PDROP,
            dtype=jnp.float32,
        )

    def ring(self, q, k, v, deterministic=False):
        return run_ring(
            self.mesh, q, k, v,
            jnp.zeros((2, 1, 1, 256), jnp.float32), self.seg,
            self.bkw(self.rng, deterministic),
        )

    def test_ring_matches_oracle(self):
        out_ring = self.ring(self.q, self.k, self.v)
        out_oracle = self.oracle(self.q, self.k, self.v)
        np.testing.assert_allclose(out_ring, out_oracle, atol=1e-5, rtol=1e-5)
        # dropout is actually active and deterministic given the rng
        out_det = self.ring(self.q, self.k, self.v, deterministic=True)
        assert not np.allclose(out_ring, out_det, atol=1e-3)
        np.testing.assert_array_equal(out_ring, self.ring(self.q, self.k, self.v))

    def test_grads_match_oracle_autodiff(self):
        w = jax.random.normal(jax.random.PRNGKey(9), self.q.shape)

        def loss_ring(q, k, v):
            return jnp.sum(self.ring(q, k, v) * w)

        def loss_oracle(q, k, v):
            return jnp.sum(self.oracle(q, k, v) * w)

        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(self.q, self.k, self.v)
        go = jax.grad(loss_oracle, argnums=(0, 1, 2))(self.q, self.k, self.v)
        for a, b in zip(gr, go):
            np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-4)

    def test_mean_preserving(self):
        # inverted-scale dropout keeps the expected output near the
        # deterministic one (loose statistical check)
        outs = []
        for i in range(8):
            self.rng = jax.random.PRNGKey(100 + i)
            outs.append(self.oracle(self.q, self.k, self.v))
        mean = jnp.mean(jnp.stack(outs), axis=0)
        det = blockwise_attn(
            self.q, self.k, self.v, causal=True, query_chunk_size=32,
            key_chunk_size=32, dtype=jnp.float32,
        )
        err = jnp.abs(mean - det).mean() / (jnp.abs(det).mean() + 1e-6)
        assert err < 0.25, err


class TestPallasRingDropout:
    """Ring attention with in-kernel (element-keyed) dropout, Pallas
    interpret mode: the dropout mask is keyed by (local batch·head row,
    global positions), so on a pure-sp mesh (full local b, h extents —
    same caveat as the XLA-path TestAttentionDropout) the sp=4 ring must
    EXACTLY reproduce the single-device Pallas kernel."""

    PDROP = 0.25

    @pytest.fixture()
    def sp_mesh(self):
        from jax.sharding import Mesh

        return Mesh(
            np.array(jax.devices()[:4]).reshape(1, 1, 1, 4),
            ("dp", "fsdp", "tp", "sp"),
        )

    def _bkw(self, rng):
        return dict(
            causal_block_size=1,
            deterministic=False,
            dropout_rng=rng,
            attn_pdrop=self.PDROP,
            query_chunk_size=32,
            key_chunk_size=32,
            dtype=jnp.float32,
            policy=jax.checkpoint_policies.nothing_saveable,
            precision=None,
            prevent_cse=True,
        )

    def _run_ring_pallas(self, mesh, q, k, v, rng):
        fn = shard_map(
            partial(
                ring_attention,
                axis_name="sp",
                float32_logits=True,
                cache_idx=None,
                blockwise_kwargs=self._bkw(rng),
                impl="pallas",
                interpret=True,
            ),
            mesh=mesh,
            in_specs=(
                PS(("dp", "fsdp"), "sp", "tp", None),
                PS(("dp", "fsdp"), "sp", "tp", None),
                PS(("dp", "fsdp"), "sp", "tp", None),
            ),
            out_specs=PS(("dp", "fsdp"), "sp", "tp", None),
            check_vma=False,
        )
        return fn(q, k, v)

    def test_ring_matches_single_device_kernel(self, sp_mesh):
        from lwm_tpu.ops.pallas_flash import flash_attention_fwd_pallas

        q, k, v = make_qkv(jax.random.PRNGKey(30), 1, 128, 2, 16)
        rng = jax.random.key_data(jax.random.PRNGKey(77))
        with sp_mesh:
            out_ring = self._run_ring_pallas(sp_mesh, q, k, v, rng)
        out_single, _ = flash_attention_fwd_pallas(
            q, k, v, block_q=32, block_k=32, interpret=True,
            dropout_rng=rng, attn_pdrop=self.PDROP,
        )
        np.testing.assert_allclose(
            np.asarray(out_ring), np.asarray(out_single), atol=2e-5, rtol=2e-5
        )

    def test_ring_dropout_grads_finite_and_deterministic(self, sp_mesh):
        q, k, v = make_qkv(jax.random.PRNGKey(31), 1, 128, 2, 16)
        rng = jax.random.key_data(jax.random.PRNGKey(78))
        w = jax.random.normal(jax.random.PRNGKey(32), q.shape)

        def loss(q, k, v):
            with sp_mesh:
                return jnp.sum(self._run_ring_pallas(sp_mesh, q, k, v, rng) * w)

        g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            assert np.all(np.isfinite(np.asarray(a)))
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
