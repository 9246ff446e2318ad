"""RingAttention over the `sp` mesh axis — the signature long-context
mechanism (SURVEY.md §2.7, §5.7).

Design (TPU-first, not a port): sequence activations are sharded over the
`sp` axis; KV blocks rotate around the ring via ``lax.ppermute`` while each
device folds the visiting block into an online-softmax accumulator. The
permute for step t+1 is issued *before* step t's compute so XLA's async
collective-permute overlaps communication with the matmuls
(``--xla_enable_async_collective_permute``). The backward pass is a
hand-written custom VJP: a second ring where (k, v, dk, dv) travel together
and dk/dv arrive home after a full revolution — so no per-ring-step
residuals are ever stored (memory = flash-attention residuals only:
q, k, v, out, lse).

Semantics match the reference ``ringattention`` contract
(reference llama.py:539-569): token-level causal by global position,
additive bias broadcastable over the global kv dim, segment-id masking,
fp32 logits. Bias is treated as non-learned (mask-derived): its cotangent
is zero, matching how LWM uses it.

The inference path (reference llama.py:599-614 ``ringattention_inference``)
uses a flash-decoding style partial-softmax combine instead of a ring:
q is replicated (decode) or all-gathered (short prefill), each device
attends over its local KV shard, and the partials merge with one
psum/pmax — O(q·d) communication instead of O(kv·d).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from lwm_tpu.ops.blockwise import (
    BIG_NEG,
    MASK_GUARD,
    _slice_bias,
    compute_block_with_kv,
    finalize_flash,
    init_flash_carry,
    pick_chunk as _pick_chunk,
)


@dataclasses.dataclass(frozen=True)
class RingConfig:
    axis_name: str = "sp"
    causal: bool = True
    query_chunk_size: int = 512
    key_chunk_size: int = 512
    dtype: Any = jnp.float32
    policy: Any = None
    precision: Any = None
    prevent_cse: bool = True
    float32_logits: bool = True


def ring_attention(
    q,
    k,
    v,
    attn_bias=None,
    segment_ids=None,
    *,
    axis_name="sp",
    float32_logits=True,
    cache_idx=None,
    blockwise_kwargs=None,
):
    """Train/prefill ring attention; call inside shard_map over `axis_name`.

    q/k/v: [b, s_local, h_local, d]; attn_bias: [b, 1|h, 1|S, S_global] or
    None (replicated over sp); segment_ids: [b, S_global] or None.
    Returns [b, s_local, h_local, d] in blockwise_kwargs['dtype'].
    """
    assert cache_idx is None, "cache_idx decode path uses ring_attention_inference"
    bkw = dict(blockwise_kwargs or {})
    assert bkw.pop("causal_block_size", 1) == 1, "only token-level causal supported"
    attn_pdrop = bkw.pop("attn_pdrop", 0.0)
    deterministic = bkw.pop("deterministic", True)
    bkw.pop("dropout_rng", None)
    if attn_pdrop > 0.0 and not deterministic:
        raise NotImplementedError("attention dropout inside ring attention")
    config = RingConfig(
        axis_name=axis_name,
        causal=True,
        query_chunk_size=bkw.pop("query_chunk_size", 512),
        key_chunk_size=bkw.pop("key_chunk_size", 512),
        dtype=bkw.pop("dtype", jnp.float32),
        policy=bkw.pop("policy", None),
        precision=bkw.pop("precision", None),
        prevent_cse=bkw.pop("prevent_cse", True),
        float32_logits=float32_logits,
    )
    return _ring_attention(q, k, v, attn_bias, segment_ids, config)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _ring_attention(q, k, v, bias, segment_ids, config):
    out, _ = _ring_attention_fwd(q, k, v, bias, segment_ids, config)
    return out


def _ring_perm(axis_size):
    return [(i, (i + 1) % axis_size) for i in range(axis_size)]


def _local_segs(segment_ids, my_idx, sq, src_idx, skv):
    """Slice replicated global segment ids to (q-local, kv-block) views."""
    if segment_ids is None:
        return None, None
    q_seg = lax.dynamic_slice_in_dim(segment_ids, my_idx * sq, sq, axis=-1)
    kv_seg = lax.dynamic_slice_in_dim(segment_ids, src_idx * skv, skv, axis=-1)
    return q_seg, kv_seg


def _ring_attention_fwd(q, k, v, bias, segment_ids, config):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    axis_size = lax.psum(1, config.axis_name)
    my_idx = lax.axis_index(config.axis_name)
    perm = _ring_perm(axis_size)

    q32 = q.astype(jnp.float32)
    q_offset = my_idx * sq
    cq = _pick_chunk(sq, config.query_chunk_size)
    ck = _pick_chunk(skv, config.key_chunk_size)

    o, m, l = init_flash_carry(b, sq, h, d)

    def step(t, carry):
        o, m, l, k_cur, v_cur = carry
        # issue the rotation first: compute below doesn't depend on it, so
        # async collective-permute rides ICI under this step's matmuls
        k_nxt = lax.ppermute(k_cur, config.axis_name, perm)
        v_nxt = lax.ppermute(v_cur, config.axis_name, perm)
        src = (my_idx - t) % axis_size
        kv_offset = src * skv
        q_seg, kv_seg = _local_segs(segment_ids, my_idx, sq, src, skv)

        def compute(oml):
            return compute_block_with_kv(
                q32, *oml, k_cur, v_cur, bias, q_seg, kv_seg,
                q_offset, kv_offset,
                causal=config.causal, query_chunk_size=cq, key_chunk_size=ck,
                scale=d ** -0.5, precision=config.precision,
                policy=None, prevent_cse=config.prevent_cse,
            )

        # blocks entirely above the causal diagonal contribute nothing
        fully_masked = jnp.logical_and(
            jnp.asarray(config.causal), kv_offset > q_offset + sq - 1
        )
        o, m, l = lax.cond(fully_masked, lambda oml: oml, compute, (o, m, l))
        return o, m, l, k_nxt, v_nxt

    o, m, l, _, _ = lax.fori_loop(0, axis_size, step, (o, m, l, k, v))
    out = finalize_flash(o, l).astype(config.dtype)
    lse = jnp.where(l > 0.0, m + jnp.log(jnp.maximum(l, 1e-30)), BIG_NEG)
    residuals = (q, k, v, bias, segment_ids, out, lse)
    return out, residuals


def _ring_attention_bwd(config, residuals, g):
    q, k, v, bias, segment_ids, out, lse = residuals
    b, sq, h, d = q.shape
    skv = k.shape[1]
    axis_size = lax.psum(1, config.axis_name)
    my_idx = lax.axis_index(config.axis_name)
    perm = _ring_perm(axis_size)

    q32 = q.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    # delta_i = sum_d dO_i · O_i  (the softmax-jacobian diagonal term)
    delta = jnp.einsum("bqhd,bqhd->bhq", g32, out.astype(jnp.float32))
    q_offset = my_idx * sq
    cq = _pick_chunk(sq, config.query_chunk_size)
    ck = _pick_chunk(skv, config.key_chunk_size)
    scale = d ** -0.5

    dq0 = jnp.zeros((b, sq, h, d), jnp.float32)
    dk0 = jnp.zeros((b, skv, h, d), jnp.float32)
    dv0 = jnp.zeros((b, skv, h, d), jnp.float32)

    def step(t, carry):
        dq, k_cur, v_cur, dk_cur, dv_cur = carry
        k_nxt = lax.ppermute(k_cur, config.axis_name, perm)
        v_nxt = lax.ppermute(v_cur, config.axis_name, perm)
        src = (my_idx - t) % axis_size
        kv_offset = src * skv
        q_seg, kv_seg = _local_segs(segment_ids, my_idx, sq, src, skv)

        def compute(args):
            dq, dk_b, dv_b = args
            ddq, ddk, ddv = _block_bwd(
                q32, k_cur, v_cur, g32, lse, delta, bias, q_seg, kv_seg,
                q_offset, kv_offset, causal=config.causal, scale=scale,
                query_chunk_size=cq, key_chunk_size=ck,
                precision=config.precision,
            )
            return dq + ddq, dk_b + ddk, dv_b + ddv

        fully_masked = jnp.logical_and(
            jnp.asarray(config.causal), kv_offset > q_offset + sq - 1
        )
        dq, dk_cur, dv_cur = lax.cond(
            fully_masked, lambda a: a, compute, (dq, dk_cur, dv_cur)
        )
        # dk/dv travel with their kv block; after axis_size hops they are home
        dk_nxt = lax.ppermute(dk_cur, config.axis_name, perm)
        dv_nxt = lax.ppermute(dv_cur, config.axis_name, perm)
        return dq, k_nxt, v_nxt, dk_nxt, dv_nxt

    dq, _, _, dk, dv = lax.fori_loop(0, axis_size, step, (dq0, k, v, dk0, dv0))
    dbias = None if bias is None else jnp.zeros_like(bias)  # mask-derived bias
    dseg = (
        None
        if segment_ids is None
        else np.zeros(segment_ids.shape, jax.dtypes.float0)
    )
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        dbias,
        dseg,
    )


_ring_attention.defvjp(_ring_attention_fwd, _ring_attention_bwd)


def _block_bwd(
    q32, k_block, v_block, g32, lse, delta, bias, q_seg, kv_seg,
    q_offset, kv_offset, *, causal, scale, query_chunk_size, key_chunk_size,
    precision,
):
    """Gradients of one (local-q × kv-block) tile, chunked.

    Returns (dq [b,sq,h,d], dk_block, dv_block [b,skv,h,d]) all fp32.
    """
    b, sq, h, d = q32.shape
    skv = k_block.shape[1]
    cq, ck = query_chunk_size, key_chunk_size
    nq, nk = sq // cq, skv // ck
    k32 = k_block.astype(jnp.float32)
    v32 = v_block.astype(jnp.float32)

    qs = q32.reshape(b, nq, cq, h, d).swapaxes(0, 1)
    gs = g32.reshape(b, nq, cq, h, d).swapaxes(0, 1)
    lses = lse.reshape(b, h, nq, cq).transpose(2, 0, 1, 3)
    deltas = delta.reshape(b, h, nq, cq).transpose(2, 0, 1, 3)

    def q_chunk_body(carry_kv, args):
        qi, q_c, g_c, lse_c, delta_c = args
        dk_b, dv_b = carry_kv
        q_start = q_offset + qi * cq
        qseg_c = (
            lax.dynamic_slice_in_dim(q_seg, qi * cq, cq, axis=-1)
            if q_seg is not None
            else None
        )

        def kv_chunk_body(carry, kj):
            dq_c, dk_b, dv_b = carry
            k_start = kv_offset + kj * ck
            k_c = lax.dynamic_slice_in_dim(k32, kj * ck, ck, axis=1)
            v_c = lax.dynamic_slice_in_dim(v32, kj * ck, ck, axis=1)
            kseg_c = (
                lax.dynamic_slice_in_dim(kv_seg, kj * ck, ck, axis=-1)
                if kv_seg is not None
                else None
            )

            def compute(carry):
                dq_c, dk_b, dv_b = carry
                logits = (
                    jnp.einsum("bqhd,bkhd->bhqk", q_c, k_c, precision=precision)
                    * scale
                )
                bias_c = _slice_bias(bias, q_start, cq, k_start, ck)
                if bias_c is not None:
                    logits = logits + bias_c.astype(jnp.float32)
                mask = None
                if causal:
                    qpos = q_start + lax.broadcasted_iota(jnp.int32, (cq, ck), 0)
                    kpos = k_start + lax.broadcasted_iota(jnp.int32, (cq, ck), 1)
                    mask = (kpos <= qpos)[None, None]
                if qseg_c is not None:
                    seg = (qseg_c[:, :, None] == kseg_c[:, None, :])[:, None]
                    mask = seg if mask is None else jnp.logical_and(mask, seg)
                if mask is not None:
                    logits = jnp.where(mask, logits, BIG_NEG)
                p = jnp.where(
                    logits > MASK_GUARD, jnp.exp(logits - lse_c[..., None]), 0.0
                )
                dv_contrib = jnp.einsum(
                    "bhqk,bqhd->bkhd", p, g_c, precision=precision
                )
                dp = jnp.einsum("bqhd,bkhd->bhqk", g_c, v_c, precision=precision)
                ds = p * (dp - delta_c[..., None]) * scale
                dq_new = dq_c + jnp.einsum(
                    "bhqk,bkhd->bqhd", ds, k_c, precision=precision
                )
                dk_contrib = jnp.einsum(
                    "bhqk,bqhd->bkhd", ds, q_c, precision=precision
                )
                dk_new = lax.dynamic_update_slice_in_dim(
                    dk_b,
                    lax.dynamic_slice_in_dim(dk_b, kj * ck, ck, 1) + dk_contrib,
                    kj * ck,
                    axis=1,
                )
                dv_new = lax.dynamic_update_slice_in_dim(
                    dv_b,
                    lax.dynamic_slice_in_dim(dv_b, kj * ck, ck, 1) + dv_contrib,
                    kj * ck,
                    axis=1,
                )
                return dq_new, dk_new, dv_new

            if causal:
                fully_masked = k_start > q_start + cq - 1
                new = lax.cond(fully_masked, lambda c: c, compute, carry)
            else:
                new = compute(carry)
            return new, None

        dq_c = jnp.zeros((b, cq, h, d), jnp.float32)
        (dq_c, dk_b, dv_b), _ = lax.scan(
            kv_chunk_body, (dq_c, dk_b, dv_b), jnp.arange(nk)
        )
        return (dk_b, dv_b), dq_c

    dk0 = jnp.zeros((b, skv, h, d), jnp.float32)
    dv0 = jnp.zeros((b, skv, h, d), jnp.float32)
    (dk_b, dv_b), dq_chunks = lax.scan(
        q_chunk_body, (dk0, dv0), (jnp.arange(nq), qs, gs, lses, deltas)
    )
    dq = dq_chunks.swapaxes(0, 1).reshape(b, sq, h, d)
    return dq, dk_b, dv_b


def ring_attention_inference(
    q,
    k,
    v,
    attention_mask,
    *,
    axis_name="sp",
    q_sharded=False,
    key_chunk_size=512,
):
    """Decode/short-prefill attention over an sp-sharded KV cache.

    Called inside shard_map. Instead of rotating KV around the ring, each
    device attends its (replicated or gathered) q over its local KV shard
    and the per-shard softmax partials merge with one pmax + psum — the
    flash-decoding pattern, which is the right TPU collective shape when
    q is tiny relative to kv (SURVEY.md §2.7 ringattention_inference).

    q: [b, sq_local, h, d] (replicated when q_sharded=False)
    k, v: [b, skv_local, h, d]
    attention_mask: bool [b, 1, sq_local, SKV_global]
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    axis_size = lax.psum(1, axis_name)
    my_idx = lax.axis_index(axis_name)

    if q_sharded and axis_size > 1:
        # short prefill: gather the (small) q and its mask rows across sp
        q = lax.all_gather(q, axis_name, axis=1, tiled=True)
        attention_mask = lax.all_gather(attention_mask, axis_name, axis=2, tiled=True)
    sq_g = q.shape[1]

    q32 = q.astype(jnp.float32)
    # local kv columns of the global mask
    mask_local = lax.dynamic_slice_in_dim(
        attention_mask, my_idx * skv, skv, axis=-1
    )
    bias_local = jnp.where(mask_local, 0.0, BIG_NEG).astype(jnp.float32)

    o, m, l = init_flash_carry(b, sq_g, h, d)
    cq = _pick_chunk(sq_g, 512)
    ck = _pick_chunk(skv, key_chunk_size)
    o, m, l = compute_block_with_kv(
        q32, o, m, l, k, v, bias_local, None, None, 0, 0,
        causal=False, query_chunk_size=cq, key_chunk_size=ck,
        scale=d ** -0.5,
    )

    if axis_size > 1:
        m_glob = lax.pmax(m, axis_name)
        corr = jnp.where(m > MASK_GUARD, jnp.exp(m - m_glob), 0.0)
        l_scaled = corr * l
        o_scaled = o * jnp.transpose(corr, (0, 2, 1))[..., None]
        l_sum = lax.psum(l_scaled, axis_name)
        o_sum = lax.psum(o_scaled, axis_name)
        out = finalize_flash(o_sum, l_sum)
    else:
        out = finalize_flash(o, l)

    if q_sharded and axis_size > 1:
        out = lax.dynamic_slice_in_dim(out, my_idx * sq, sq, axis=1)
    return out.astype(q.dtype)
