"""Shared-prefix attention ops (lwm_tpu/ops/prefix.py).

Oracle: plain softmax attention over the CONCATENATED [prefix ++ suffix]
keys — the prefix/suffix split with LSE-merged flash partials must be
exactly (to fp32 flash tolerance) the same attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwm_tpu.ops.prefix import (
    combine_lse,
    combine_raw_partials,
    decode_with_prefix,
)


def oracle_attn(q, k_full, v_full, mask_full):
    """q: [b,1,h,d]; k_full/v_full: head-major [b,h,T,d] (kv heads
    pre-expanded); mask_full: [b,T]."""
    q32 = q.astype(jnp.float32)
    logits = jnp.einsum("bqhd,bhkd->bhqk", q32, k_full.astype(jnp.float32))
    logits = logits / np.sqrt(q.shape[-1])
    logits = jnp.where(mask_full[:, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bqhd", probs, v_full.astype(jnp.float32))


def expand_kv(x, h):
    reps = h // x.shape[1]
    return jnp.repeat(x, reps, axis=1)


@pytest.mark.parametrize("h,h_kv", [(4, 4), (4, 2), (8, 2)])
@pytest.mark.parametrize("b", [1, 3])
def test_decode_with_prefix_matches_concat_oracle(b, h, h_kv):
    d, P, T = 32, 256, 128
    keys = jax.random.split(jax.random.PRNGKey(h * 10 + h_kv + b), 5)
    q = jax.random.normal(keys[0], (b, 1, h, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, h_kv, T, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, h_kv, T, d), jnp.float32)
    pk = jax.random.normal(keys[3], (1, h_kv, P, d), jnp.float32)
    pv = jax.random.normal(keys[4], (1, h_kv, P, d), jnp.float32)

    # per-row suffix depths; prefix valid up to 200 (padded tail masked)
    lengths = jnp.asarray(([5, 77, 128] * b)[:b], jnp.int32)
    key_mask = jnp.arange(T)[None] < lengths[:, None]
    prefix_true = 200
    prefix_mask = jnp.arange(P) < prefix_true

    got = decode_with_prefix(
        q, k, v, key_mask, jnp.max(lengths), pk, pv, prefix_mask,
        interpret=True,
    )

    k_full = jnp.concatenate(
        [jnp.broadcast_to(expand_kv(pk, h), (b, h, P, d)), expand_kv(k, h)],
        axis=2,
    )
    v_full = jnp.concatenate(
        [jnp.broadcast_to(expand_kv(pv, h), (b, h, P, d)), expand_kv(v, h)],
        axis=2,
    )
    mask_full = jnp.concatenate(
        [jnp.broadcast_to(prefix_mask[None], (b, P)), key_mask], axis=1
    )
    want = oracle_attn(q, k_full, v_full, mask_full)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_decode_with_prefix_int8_both_ranges():
    """int8 prefix + int8 suffix cache quantize/dequantize through the
    kernel path and stay within int8 round-trip tolerance of the fp32
    oracle."""
    b, h, h_kv, d, P, T = 2, 4, 2, 32, 128, 128
    keys = jax.random.split(jax.random.PRNGKey(7), 5)
    q = jax.random.normal(keys[0], (b, 1, h, d), jnp.float32)

    def quant(x):
        scale = jnp.maximum(jnp.max(jnp.abs(x), axis=-1) / 127.0, 1e-8)
        qx = jnp.clip(jnp.round(x / scale[..., None]), -127, 127)
        return qx.astype(jnp.int8), scale

    k = jax.random.normal(keys[1], (b, h_kv, T, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, h_kv, T, d), jnp.float32)
    pk = jax.random.normal(keys[3], (1, h_kv, P, d), jnp.float32)
    pv = jax.random.normal(keys[4], (1, h_kv, P, d), jnp.float32)
    k_q, k_s = quant(k)
    v_q, v_s = quant(v)
    pk_q, pk_s = quant(pk)
    pv_q, pv_s = quant(pv)

    lengths = jnp.asarray([40, 128], jnp.int32)
    key_mask = jnp.arange(T)[None] < lengths[:, None]
    prefix_mask = jnp.ones(P, bool)

    got = decode_with_prefix(
        q, k_q, v_q, key_mask, jnp.max(lengths), pk_q, pv_q, prefix_mask,
        k_scale=k_s, v_scale=v_s, pk_scale=pk_s, pv_scale=pv_s,
        interpret=True,
    )
    k_full = jnp.concatenate(
        [jnp.broadcast_to(expand_kv(pk, h), (b, h, P, d)), expand_kv(k, h)],
        axis=2,
    )
    v_full = jnp.concatenate(
        [jnp.broadcast_to(expand_kv(pv, h), (b, h, P, d)), expand_kv(v, h)],
        axis=2,
    )
    mask_full = jnp.concatenate(
        [jnp.broadcast_to(prefix_mask[None], (b, P)), key_mask], axis=1
    )
    want = oracle_attn(q, k_full, v_full, mask_full)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


def test_combine_degenerate_empty_range():
    """A range with zero valid keys (all-masked) must not poison the
    combine (its partial carries m = BIG_NEG, l = 0)."""
    b, h, d = 2, 4, 16
    key = jax.random.PRNGKey(3)
    o = jax.random.normal(key, (b, 1, h, d), jnp.float32)
    m = jnp.zeros((b, h, 1), jnp.float32)
    l = jnp.ones((b, h, 1), jnp.float32)
    from lwm_tpu.ops.blockwise import BIG_NEG

    # dead range's o is NaN — the kernel normalizes its accumulator by
    # l == 0; the combine must mask it out, not multiply by zero
    o_dead = jnp.full((b, 1, h, d), jnp.nan, jnp.float32)
    m_dead = jnp.full((b, h, 1), BIG_NEG, jnp.float32)
    l_dead = jnp.zeros((b, h, 1), jnp.float32)
    out = combine_raw_partials(o, m, l, o_dead, m_dead, l_dead)
    np.testing.assert_allclose(np.asarray(out), np.asarray(o), atol=1e-6)


def test_combine_lse_matches_single_softmax():
    """Splitting one softmax into two ranges and LSE-merging the
    normalized halves reproduces the whole."""
    b, sq, h, d, T = 1, 8, 2, 16, 64
    keys = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(keys[0], (b, sq, h, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, h, T, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, h, T, d), jnp.float32)

    def soft(qq, kk, vv):
        logits = jnp.einsum("bqhd,bhkd->bhqk", qq, kk) / np.sqrt(d)
        m = jnp.max(logits, -1, keepdims=True)
        e = jnp.exp(logits - m)
        l = jnp.sum(e, -1, keepdims=True)
        out = jnp.einsum("bhqk,bhkd->bqhd", e / l, vv)
        lse = (m + jnp.log(l))[..., 0]  # [b,h,q]
        return out, lse

    o1, lse1 = soft(q, k[:, :, :32], v[:, :, :32])
    o2, lse2 = soft(q, k[:, :, 32:], v[:, :, 32:])
    want, _ = soft(q, k, v)
    got = combine_lse(o1, lse1, o2, lse2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_decode_with_prefix_sharded_matches_oracle():
    """The shard_map'd kernel path on an fsdp=2 x tp=4 CPU mesh (interpret
    mode) matches the concat oracle: batch shards over fsdp, kv heads and
    the folded prefix query-head dim over tp, no collectives."""
    from lwm_tpu.models import LLaMAConfig
    from lwm_tpu.ops.prefix import decode_with_prefix_sharded

    mesh = LLaMAConfig.get_jax_mesh("1,2,4,1")
    b, h, h_kv, d, P, T = 4, 8, 4, 32, 256, 128
    keys = jax.random.split(jax.random.PRNGKey(21), 5)
    q = jax.random.normal(keys[0], (b, 1, h, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, h_kv, T, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, h_kv, T, d), jnp.float32)
    pk = jax.random.normal(keys[3], (1, h_kv, P, d), jnp.float32)
    pv = jax.random.normal(keys[4], (1, h_kv, P, d), jnp.float32)
    lengths = jnp.asarray([5, 77, 128, 40], jnp.int32)
    key_mask = jnp.arange(T)[None] < lengths[:, None]
    prefix_mask = jnp.arange(P) < 200

    with mesh:
        got = decode_with_prefix_sharded(
            mesh, q, k, v, key_mask, jnp.max(lengths), pk, pv, prefix_mask,
            interpret=True,
        )

    k_full = jnp.concatenate(
        [jnp.broadcast_to(expand_kv(pk, h), (b, h, P, d)), expand_kv(k, h)],
        axis=2,
    )
    v_full = jnp.concatenate(
        [jnp.broadcast_to(expand_kv(pv, h), (b, h, P, d)), expand_kv(v, h)],
        axis=2,
    )
    mask_full = jnp.concatenate(
        [jnp.broadcast_to(prefix_mask[None], (b, P)), key_mask], axis=1
    )
    want = oracle_attn(q, k_full, v_full, mask_full)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize(
    "mesh_dim,prefix_true",
    [
        ("1,2,2,2", 200),   # fsdp=2, tp=2, sp=2
        ("1,2,1,4", 200),   # fsdp=2, sp=4
        ("1,1,2,4", 60),    # sp=4 with shards 2-4 fully masked (P/sp=64)
    ],
)
def test_decode_with_prefix_sharded_sp_matches_oracle(mesh_dim, prefix_true):
    """sp>1: the PREFIX sequence shards over sp (each shard streams only
    its P/sp slice; the merge is pmax+psum of flash partials — VERDICT r2
    item 4). Exactness vs the concat oracle, including sp shards whose
    local prefix slice is entirely masked padding."""
    from lwm_tpu.models import LLaMAConfig
    from lwm_tpu.ops.prefix import decode_with_prefix_sharded

    mesh = LLaMAConfig.get_jax_mesh(mesh_dim)
    b, h, h_kv, d, P, T = 4, 8, 4, 32, 256, 128
    keys = jax.random.split(jax.random.PRNGKey(33), 5)
    q = jax.random.normal(keys[0], (b, 1, h, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, h_kv, T, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, h_kv, T, d), jnp.float32)
    pk = jax.random.normal(keys[3], (1, h_kv, P, d), jnp.float32)
    pv = jax.random.normal(keys[4], (1, h_kv, P, d), jnp.float32)
    lengths = jnp.asarray([5, 77, 128, 40], jnp.int32)
    key_mask = jnp.arange(T)[None] < lengths[:, None]
    prefix_mask = jnp.arange(P) < prefix_true

    with mesh:
        got = decode_with_prefix_sharded(
            mesh, q, k, v, key_mask, jnp.max(lengths), pk, pv, prefix_mask,
            interpret=True,
        )

    k_full = jnp.concatenate(
        [jnp.broadcast_to(expand_kv(pk, h), (b, h, P, d)), expand_kv(k, h)],
        axis=2,
    )
    v_full = jnp.concatenate(
        [jnp.broadcast_to(expand_kv(pv, h), (b, h, P, d)), expand_kv(v, h)],
        axis=2,
    )
    mask_full = jnp.concatenate(
        [jnp.broadcast_to(prefix_mask[None], (b, P)), key_mask], axis=1
    )
    want = oracle_attn(q, k_full, v_full, mask_full)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_decode_with_prefix_sharded_sp_int8():
    """sp-sharded prefix with int8 prefix + suffix caches: the per-shard
    scale slices ride the same sp sharding as the prefix KV."""
    from lwm_tpu.models import LLaMAConfig
    from lwm_tpu.ops.prefix import decode_with_prefix_sharded

    mesh = LLaMAConfig.get_jax_mesh("1,2,2,2")
    b, h, h_kv, d, P, T = 2, 4, 2, 32, 128, 128
    keys = jax.random.split(jax.random.PRNGKey(44), 5)
    q = jax.random.normal(keys[0], (b, 1, h, d), jnp.float32)

    def quant(x):
        scale = jnp.maximum(jnp.max(jnp.abs(x), axis=-1) / 127.0, 1e-8)
        qx = jnp.clip(jnp.round(x / scale[..., None]), -127, 127)
        return qx.astype(jnp.int8), scale

    k = jax.random.normal(keys[1], (b, h_kv, T, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, h_kv, T, d), jnp.float32)
    pk = jax.random.normal(keys[3], (1, h_kv, P, d), jnp.float32)
    pv = jax.random.normal(keys[4], (1, h_kv, P, d), jnp.float32)
    k_q, k_s = quant(k)
    v_q, v_s = quant(v)
    pk_q, pk_s = quant(pk)
    pv_q, pv_s = quant(pv)
    lengths = jnp.asarray([40, 128], jnp.int32)
    key_mask = jnp.arange(T)[None] < lengths[:, None]
    prefix_mask = jnp.ones(P, bool)

    with mesh:
        got = decode_with_prefix_sharded(
            mesh, q, k_q, v_q, key_mask, jnp.max(lengths), pk_q, pv_q,
            prefix_mask, k_scale=k_s, v_scale=v_s, pk_scale=pk_s,
            pv_scale=pv_s, interpret=True,
        )
    k_full = jnp.concatenate(
        [jnp.broadcast_to(expand_kv(pk, h), (b, h, P, d)), expand_kv(k, h)],
        axis=2,
    )
    v_full = jnp.concatenate(
        [jnp.broadcast_to(expand_kv(pv, h), (b, h, P, d)), expand_kv(v, h)],
        axis=2,
    )
    mask_full = jnp.concatenate(
        [jnp.broadcast_to(prefix_mask[None], (b, P)), key_mask], axis=1
    )
    want = oracle_attn(q, k_full, v_full, mask_full)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)
