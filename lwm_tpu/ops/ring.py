"""RingAttention over the `sp` mesh axis — the signature long-context
mechanism (SURVEY.md §2.7, §5.7).

Design (TPU-first, not a port): sequence activations are sharded over `sp`;
KV blocks rotate around the ring via ``lax.ppermute`` while each device
folds the visiting block into a running partial-softmax accumulator. The
per-block compute is a Pallas flash kernel on TPU (ops/pallas_flash.py) or
the XLA blockwise oracle elsewhere; each block yields a *complete*
(out_t, lse_t) partial and ring steps merge with the log-sum-exp combine —
the same algebra as flash-decoding. The permute for step t+1 is issued
*before* step t's compute so XLA's async collective-permute overlaps
communication with the matmuls.

The backward is a hand-written custom VJP: a second ring where
(k, v, dk, dv) travel together and dk/dv arrive home after a full
revolution — no per-ring-step residuals are ever stored (memory =
flash residuals only: q, k, v, out, lse).

Semantics match the reference ``ringattention`` contract
(reference llama.py:539-569): token-level causal by global position,
additive per-key bias (mask-derived, broadcastable over the global kv dim),
segment-id masking, fp32 logits. Bias is non-learned: its cotangent is 0.

The inference path (reference llama.py:599-614 ``ringattention_inference``)
needs no ring at all: q is replicated (decode) or all-gathered (short
prefill), each device attends over its local KV shard, and partials merge
with one pmax + psum — O(q·d) communication instead of O(kv·d).
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
    _as_key_data,
    _slice_bias,
    compute_block_with_kv,
    tile_dropout_keep,
    finalize_flash,
    init_flash_carry,
    pick_chunk as _pick_chunk,
)


@dataclasses.dataclass(frozen=True)
class RingConfig:
    axis_name: Any = "sp"
    causal: bool = True
    query_chunk_size: int = 512
    key_chunk_size: int = 512
    dtype: Any = jnp.float32
    policy: Any = None
    precision: Any = None
    prevent_cse: bool = True
    float32_logits: bool = True
    impl: str = "auto"  # 'auto' | 'pallas' | 'xla'
    interpret: bool = False  # run Pallas kernels in interpret mode (tests)
    layout: str = "contiguous"  # 'contiguous' | 'striped' sp sharding
    attn_pdrop: float = 0.0  # active only when a dropout rng operand is given

    @property
    def use_pallas(self) -> bool:
        if self.impl == "auto":
            return jax.default_backend() == "tpu"
        return self.impl == "pallas"


# ---------------------------------------------------------------------------
# per-block partials: complete attention of local q over ONE kv block,
# returning (out_t [b,sq,h,d] f32, lse_t [b,h,sq] f32)
# ---------------------------------------------------------------------------


def _expand_kv_heads(x, h):
    """[b, s, h_kv, d] → [b, s, h, d] by group repeat (kv head i serves
    query heads [i·g, (i+1)·g) — matches the Pallas GQA index map and the
    model's _expand_kv). No-op at matching head counts."""
    h_kv = x.shape[2]
    if h_kv == h:
        return x
    return jnp.repeat(x, h // h_kv, axis=2)


def _reduce_kv_grad(dx, h_kv):
    """[b, s, h, d] grad → [b, s, h_kv, d]: sum each kv head's group."""
    b, s, h, d = dx.shape
    if h == h_kv:
        return dx
    return dx.reshape(b, s, h_kv, h // h_kv, d).sum(axis=3)


def _block_partial_fwd(q, k_blk, v_blk, bias_blk, q_seg, kv_seg,
                       q_offset, kv_offset, config, pos_stride=1, rng=None):
    """q arrives in its ORIGINAL dtype: the Pallas kernels multiply in the
    input dtype and accumulate fp32 (MXU-native); the XLA oracle casts.
    k_blk/v_blk may carry fewer heads than q (GQA): the Pallas kernel
    streams the narrow block natively; the XLA oracle expands it (block-
    transient)."""
    b, sq, h, d = q.shape
    skv = k_blk.shape[1]
    if config.use_pallas:
        from lwm_tpu.ops.pallas_flash import flash_attention_fwd_pallas

        out, lse = flash_attention_fwd_pallas(
            q, k_blk, v_blk, bias_blk, q_seg, kv_seg,
            causal=config.causal, q_offset=q_offset, kv_offset=kv_offset,
            pos_stride=pos_stride,
            block_q=config.query_chunk_size, block_k=config.key_chunk_size,
            dropout_rng=rng, attn_pdrop=config.attn_pdrop,
            interpret=config.interpret,
        )
        # out stays in the kernel's dtype (q.dtype): the kernel already
        # rounded its fp32 accumulator on write, so upcasting here would
        # only materialize a full-size fp32 copy (2 GiB at 1M×h512) —
        # the ring combine promotes per-element instead
        return out, lse
    k_blk = _expand_kv_heads(k_blk, h)
    v_blk = _expand_kv_heads(v_blk, h)
    cq = _pick_chunk(sq, config.query_chunk_size)
    ck = _pick_chunk(skv, config.key_chunk_size)
    o, m, l = init_flash_carry(b, sq, h, d)
    o, m, l = compute_block_with_kv(
        q.astype(jnp.float32), o, m, l, k_blk, v_blk, bias_blk, q_seg, kv_seg,
        q_offset, kv_offset,
        causal=config.causal, query_chunk_size=cq, key_chunk_size=ck,
        scale=d ** -0.5, precision=config.precision, pos_stride=pos_stride,
        dropout_rng=rng, attn_pdrop=config.attn_pdrop,
    )
    out = finalize_flash(o, l)
    lse = jnp.where(l > 0.0, m + jnp.log(jnp.maximum(l, 1e-30)), BIG_NEG)
    return out, lse


def _block_partial_bwd(q, k_blk, v_blk, g, lse, delta, bias_blk,
                       q_seg, kv_seg, q_offset, kv_offset, config,
                       pos_stride=1, rng=None):
    """(dq_contrib, dk_blk, dv_blk) for one (local q × kv block) pair —
    fp32 from the XLA oracle, input dtypes from the Pallas kernels (which
    accumulate fp32 in VMEM and round once on write).
    lse is the GLOBAL log-sum-exp (over all blocks), so p recomputed here is
    the true softmax probability restricted to this block.
    GQA (k_blk heads < q heads): the Pallas backward streams the narrow
    block natively and accumulates each group's dk/dv in-kernel — NOTHING
    is ever materialized at h heads (the expand transient was the 1M
    single-chip width wall, NOTES round-3 ladder). The XLA oracle expands
    block-transiently and reduces the grads back by group sum."""
    d = q.shape[-1]
    h, h_kv = q.shape[2], k_blk.shape[2]
    if config.use_pallas:
        from lwm_tpu.ops.pallas_flash import flash_attention_bwd_pallas

        # grads return in the KERNEL's output dtypes (q/k/v dtypes): the
        # kernel accumulated fp32 in VMEM and already rounded on write, so
        # an fp32 upcast here adds no precision — it only materializes
        # full-size fp32 copies (2 GiB dq at 1M×h512). The ring carries /
        # flash wrappers promote where they accumulate.
        return flash_attention_bwd_pallas(
            q, k_blk, v_blk, g, lse, delta, bias_blk, q_seg, kv_seg,
            causal=config.causal, q_offset=q_offset, kv_offset=kv_offset,
            pos_stride=pos_stride,
            block_q=config.query_chunk_size, block_k=config.key_chunk_size,
            dropout_rng=rng, attn_pdrop=config.attn_pdrop,
            interpret=config.interpret,
        )
    else:
        k_blk = _expand_kv_heads(k_blk, h)
        v_blk = _expand_kv_heads(v_blk, h)
        cq = _pick_chunk(q.shape[1], config.query_chunk_size)
        ck = _pick_chunk(k_blk.shape[1], config.key_chunk_size)
        dq, dk, dv = _block_bwd_xla(
            q.astype(jnp.float32), k_blk, v_blk, g.astype(jnp.float32),
            lse, delta, bias_blk, q_seg, kv_seg,
            q_offset, kv_offset, causal=config.causal, scale=d ** -0.5,
            query_chunk_size=cq, key_chunk_size=ck,
            precision=config.precision,
            pos_stride=pos_stride, dropout_rng=rng,
            attn_pdrop=config.attn_pdrop,
        )
    return dq, _reduce_kv_grad(dk, h_kv), _reduce_kv_grad(dv, h_kv)


def _chunked_delta(g, out):
    """delta[b,h,q] = Σ_d g·out in fp32. The one-shot einsum upcasts BOTH
    operands to fp32 first — at 1M×h512 that is 2×2 GiB of transients
    sitting inside the backward's peak (NOTES round-3 1M ladder, the
    '2×2.0G fp32 broadcasts'). Past ~1 GiB for the pair, compute it as a
    sequential lax.map over q segments so the fp32 casts stay
    segment-sized; the fp32 result itself is only b·h·q·4 bytes."""
    b, sq, h, d = g.shape
    full_bytes = 2 * b * sq * h * d * 4
    if full_bytes <= (1 << 30):
        return jnp.einsum(
            "bqhd,bqhd->bhq", g.astype(jnp.float32), out.astype(jnp.float32)
        )
    desired = full_bytes // (1 << 29)
    nseg = 1
    for cand in range(int(desired), int(desired) * 4 + 1):
        if sq % cand == 0:
            nseg = cand
            break
    if nseg == 1:
        return jnp.einsum(
            "bqhd,bqhd->bhq", g.astype(jnp.float32), out.astype(jnp.float32)
        )
    seg = sq // nseg

    def body(i):
        gs = lax.dynamic_slice_in_dim(g, i * seg, seg, 1)
        os_ = lax.dynamic_slice_in_dim(out, i * seg, seg, 1)
        return jnp.einsum(
            "bqhd,bqhd->bhq", gs.astype(jnp.float32), os_.astype(jnp.float32)
        )

    parts = lax.map(body, jnp.arange(nseg))        # [nseg, b, h, seg]
    return jnp.moveaxis(parts, 0, 2).reshape(b, h, sq)


def _combine_partials(carry, out_t, lse_t):
    """Fold one block partial into the running (num, m_run, denom):
    softmax(∪ blocks) = Σ_t out_t·exp(lse_t − M) / Σ_t exp(lse_t − M)."""
    num, m_run, denom = carry
    m_new = jnp.maximum(m_run, lse_t)
    c_old = jnp.where(m_run > MASK_GUARD, jnp.exp(m_run - m_new), 0.0)
    c_new = jnp.where(lse_t > MASK_GUARD, jnp.exp(lse_t - m_new), 0.0)
    num = (
        num * jnp.transpose(c_old, (0, 2, 1))[..., None]
        + out_t * jnp.transpose(c_new, (0, 2, 1))[..., None]
    )
    denom = denom * c_old + c_new
    return num, m_new, denom


def _finalize_partials(num, m_run, denom):
    d_t = jnp.transpose(denom, (0, 2, 1))[..., None]
    out = jnp.where(d_t > 0.0, num / jnp.maximum(d_t, 1e-30), 0.0)
    lse = jnp.where(denom > 0.0, m_run + jnp.log(jnp.maximum(denom, 1e-30)), BIG_NEG)
    return out, lse


# ---------------------------------------------------------------------------
# public train/prefill ring attention
# ---------------------------------------------------------------------------


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
    impl="auto",
    layout="contiguous",
    interpret=False,
):
    """Train/prefill ring attention; call inside shard_map over `axis_name`.

    q/k/v: [b, s_local, h_local, d]; attn_bias: [b, 1|h, 1, S_global] or
    None (replicated over sp); segment_ids: [b, S_global] or None.
    Returns [b, s_local, h_local, d] in blockwise_kwargs['dtype'].
    """
    assert cache_idx is None, "decode goes through ring_attention_inference"
    bkw = dict(blockwise_kwargs or {})
    assert bkw.pop("causal_block_size", 1) == 1, "token-level causal only"
    attn_pdrop = bkw.pop("attn_pdrop", 0.0)
    deterministic = bkw.pop("deterministic", True)
    dropout_rng = bkw.pop("dropout_rng", None)
    use_dropout = attn_pdrop > 0.0 and not deterministic
    if use_dropout and dropout_rng is None:
        raise ValueError("attn_pdrop > 0 and not deterministic needs dropout_rng")
    rng_data = _as_key_data(dropout_rng) if use_dropout else None
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
        impl=impl,
        layout=bkw.pop("layout", layout),
        attn_pdrop=float(attn_pdrop) if use_dropout else 0.0,
        interpret=interpret,
    )
    return _ring_attention(q, k, v, attn_bias, segment_ids, rng_data, config)


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _ring_attention(q, k, v, bias, segment_ids, rng_data, config):
    out, _ = _ring_attention_fwd(q, k, v, bias, segment_ids, rng_data, config)
    return out


def _ring_perm(axis_size):
    return [(i, (i + 1) % axis_size) for i in range(axis_size)]


def _local_segs(segment_ids, my_idx, sq, src_idx, skv):
    if segment_ids is None:
        return None, None
    q_seg = lax.dynamic_slice_in_dim(segment_ids, my_idx * sq, sq, axis=-1)
    kv_seg = lax.dynamic_slice_in_dim(segment_ids, src_idx * skv, skv, axis=-1)
    return q_seg, kv_seg


def _slice_block_bias(bias, kv_offset, skv, q_offset=None, sq=None):
    """Global bias [b, 1|h, 1|SQ, SK] → this block's [b, 1|h, 1|sq, skv].
    A bias with a materialized q dim (the general §2.7 contract) is sliced
    to the local q rows too; contiguous layout only (a striped layout would
    need a strided gather — the model's mask-derived bias is per-key)."""
    if bias is None:
        return None
    if bias.shape[-2] != 1:
        assert q_offset is not None and sq is not None
        bias = lax.dynamic_slice_in_dim(bias, q_offset, sq, axis=-2)
    return lax.dynamic_slice_in_dim(bias, kv_offset, skv, axis=-1)


def _ring_attention_fwd(q, k, v, bias, segment_ids, rng_data, config):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    axis_size = lax.psum(1, config.axis_name)
    my_idx = lax.axis_index(config.axis_name)
    perm = _ring_perm(axis_size)

    striped = config.layout == "striped"
    # contiguous: device i holds global positions [i·sq, (i+1)·sq);
    # striped: device i holds positions {i + j·sp} — every ring step then
    # carries a balanced ~half-masked tile load instead of all-or-nothing
    pos_stride = axis_size if striped else 1
    q_offset = my_idx if striped else my_idx * sq
    assert bias is None or bias.shape[-2] == 1 or not striped, (
        "a bias with a materialized q dim needs contiguous sp layout"
    )

    num = jnp.zeros((b, sq, h, d), jnp.float32)
    m_run = jnp.full((b, h, sq), BIG_NEG, jnp.float32)
    denom = jnp.zeros((b, h, sq), jnp.float32)

    def step(t, carry):
        num, m_run, denom, k_cur, v_cur = carry
        # rotate first: this step's compute doesn't depend on it, so async
        # collective-permute rides ICI under the matmuls
        k_nxt = lax.ppermute(k_cur, config.axis_name, perm)
        v_nxt = lax.ppermute(v_cur, config.axis_name, perm)
        src = (my_idx - t) % axis_size
        kv_offset = src if striped else src * skv
        q_seg, kv_seg = _local_segs(segment_ids, my_idx, sq, src, skv)
        bias_blk = _slice_block_bias(bias, src * skv, skv, my_idx * sq, sq)

        def compute(carry3):
            out_t, lse_t = _block_partial_fwd(
                q, k_cur, v_cur, bias_blk, q_seg, kv_seg,
                q_offset, kv_offset, config, pos_stride, rng_data,
            )
            return _combine_partials(carry3, out_t, lse_t)

        # only the contiguous layout has fully-masked ring steps
        fully_masked = jnp.logical_and(
            jnp.asarray(config.causal and not striped),
            kv_offset > q_offset + sq - 1,
        )
        num, m_run, denom = lax.cond(
            fully_masked, lambda c: c, compute, (num, m_run, denom)
        )
        return num, m_run, denom, k_nxt, v_nxt

    num, m_run, denom, _, _ = lax.fori_loop(
        0, axis_size, step, (num, m_run, denom, k, v)
    )
    from jax.ad_checkpoint import checkpoint_name

    out32, lse = _finalize_partials(num, m_run, denom)
    out = checkpoint_name(out32.astype(config.dtype), "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    residuals = (q, k, v, bias, segment_ids, rng_data, out, lse)
    return out, residuals


def _ring_attention_bwd(config, residuals, g):
    q, k, v, bias, segment_ids, rng_data, out, lse = residuals
    b, sq, h, d = q.shape
    skv = k.shape[1]
    axis_size = lax.psum(1, config.axis_name)
    my_idx = lax.axis_index(config.axis_name)
    perm = _ring_perm(axis_size)

    delta = _chunked_delta(g, out)
    striped = config.layout == "striped"
    pos_stride = axis_size if striped else 1
    q_offset = my_idx if striped else my_idx * sq

    dq0 = jnp.zeros((b, sq, h, d), jnp.float32)
    # dk/dv ride the ring at the (possibly narrow) kv head count
    dk0 = jnp.zeros((b, skv, k.shape[2], d), jnp.float32)
    dv0 = jnp.zeros((b, skv, v.shape[2], d), jnp.float32)

    def step(t, carry):
        dq, k_cur, v_cur, dk_cur, dv_cur = carry
        k_nxt = lax.ppermute(k_cur, config.axis_name, perm)
        v_nxt = lax.ppermute(v_cur, config.axis_name, perm)
        src = (my_idx - t) % axis_size
        kv_offset = src if striped else src * skv
        q_seg, kv_seg = _local_segs(segment_ids, my_idx, sq, src, skv)
        bias_blk = _slice_block_bias(bias, src * skv, skv, my_idx * sq, sq)

        def compute(args):
            dq, dk_b, dv_b = args
            ddq, ddk, ddv = _block_partial_bwd(
                q, k_cur, v_cur, g.astype(q.dtype), lse, delta, bias_blk,
                q_seg, kv_seg, q_offset, kv_offset, config, pos_stride,
                rng_data,
            )
            return dq + ddq, dk_b + ddk, dv_b + ddv

        fully_masked = jnp.logical_and(
            jnp.asarray(config.causal and not striped),
            kv_offset > q_offset + sq - 1,
        )
        dq, dk_cur, dv_cur = lax.cond(
            fully_masked, lambda a: a, compute, (dq, dk_cur, dv_cur)
        )
        # dk/dv travel with their kv block; after axis_size hops they're home
        dk_nxt = lax.ppermute(dk_cur, config.axis_name, perm)
        dv_nxt = lax.ppermute(dv_cur, config.axis_name, perm)
        return dq, k_nxt, v_nxt, dk_nxt, dv_nxt

    dq, _, _, dk, dv = lax.fori_loop(0, axis_size, step, (dq0, k, v, dk0, dv0))
    dbias = None if bias is None else jnp.zeros_like(bias)  # mask-derived
    dseg = (
        None
        if segment_ids is None
        else np.zeros(segment_ids.shape, jax.dtypes.float0)
    )
    drng = (
        None
        if rng_data is None
        else np.zeros(rng_data.shape, jax.dtypes.float0)
    )
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        dbias,
        dseg,
        drng,
    )


_ring_attention.defvjp(_ring_attention_fwd, _ring_attention_bwd)


# ---------------------------------------------------------------------------
# single-device flash attention (mesh-less counterpart of ring_attention)
# ---------------------------------------------------------------------------


def flash_attention(
    q,
    k,
    v,
    bias=None,
    segment_ids=None,
    *,
    causal=True,
    query_chunk_size=512,
    key_chunk_size=512,
    dtype=jnp.float32,
    precision=None,
    float32_logits=True,
    impl="auto",
):
    """Single-device flash attention with a hand-written backward: only
    (q, k, v, out, lse) are saved. Pallas kernels on TPU, XLA elsewhere.
    segment_ids here are LOCAL [b, s]."""
    config = RingConfig(
        axis_name=None,
        causal=causal,
        query_chunk_size=query_chunk_size,
        key_chunk_size=key_chunk_size,
        dtype=dtype,
        precision=precision,
        float32_logits=float32_logits,
        impl=impl,
    )
    return _flash_attention(q, k, v, bias, segment_ids, config)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _flash_attention(q, k, v, bias, segment_ids, config):
    out, _ = _flash_attention_fwd(q, k, v, bias, segment_ids, config)
    return out


def _flash_attention_fwd(q, k, v, bias, segment_ids, config):
    from jax.ad_checkpoint import checkpoint_name

    out32, lse = _block_partial_fwd(
        q, k, v, bias, segment_ids, segment_ids, 0, 0, config
    )
    out = checkpoint_name(out32.astype(config.dtype), "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, bias, segment_ids, out, lse)


def _flash_attention_bwd(config, residuals, g):
    q, k, v, bias, segment_ids, out, lse = residuals
    delta = _chunked_delta(g, out)
    dq, dk, dv = _block_partial_bwd(
        q, k, v, g.astype(q.dtype), lse, delta, bias, segment_ids,
        segment_ids, 0, 0, config
    )
    dbias = None if bias is None else jnp.zeros_like(bias)
    dseg = (
        None
        if segment_ids is None
        else np.zeros(segment_ids.shape, jax.dtypes.float0)
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dbias, dseg


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


# ---------------------------------------------------------------------------
# decode / short-prefill over an sp-sharded KV cache
# ---------------------------------------------------------------------------


def ring_attention_inference(
    q,
    k,
    v,
    attention_mask,
    *,
    axis_name="sp",
    q_sharded=False,
    key_chunk_size=512,
    impl="auto",
    interpret=False,
):
    """Flash-decoding combine over the sp-sharded KV cache: q replicated
    (decode) or all-gathered (short prefill), local partials merged with
    one pmax + psum (SURVEY.md §2.7 ringattention_inference).

    q: [b, sq_local, h, d]; k, v: HEAD-MAJOR [b, h, skv_local, d] (the
    cache storage layout — the decode kernel consumes it zero-copy);
    attention_mask: bool [b, 1, sq_local, SKV_global].

    Decode steps (sq==1) run the Pallas flash-decoding kernel per shard
    (impl='auto' on TPU, or interpret=True for tests) and merge the
    l-normalized partials; other shapes use the XLA chunked-flash tile.
    """
    b, sq, h, d = q.shape
    skv = k.shape[2]
    axis_size = lax.psum(1, axis_name)
    my_idx = lax.axis_index(axis_name)

    if q_sharded and axis_size > 1:
        q = lax.all_gather(q, axis_name, axis=1, tiled=True)
        attention_mask = lax.all_gather(attention_mask, axis_name, axis=2, tiled=True)
    sq_g = q.shape[1]

    mask_local = lax.dynamic_slice_in_dim(attention_mask, my_idx * skv, skv, axis=-1)

    use_kernel = sq_g == 1 and (
        impl == "pallas"
        or (impl == "auto" and jax.default_backend() == "tpu")
        or interpret
    )
    if use_kernel:
        from lwm_tpu.ops.pallas_decode import flash_decode_pallas

        key_mask = mask_local[:, 0, 0, :]  # [b, skv]
        # upper bound on valid local positions (block skipping only —
        # the kernel still applies the exact mask)
        kv_len_loc = jnp.max(
            jnp.where(key_mask, jnp.arange(skv, dtype=jnp.int32)[None] + 1, 0)
        )
        o, m, l = flash_decode_pallas(
            q, k, v, key_mask, kv_len_loc,
            interpret=interpret, return_partials=True,
        )
        # combine expects the un-normalized-accumulator convention of the
        # XLA tile: o·l (the kernel's o is already l-normalized)
        o = o.astype(jnp.float32) * jnp.transpose(l, (0, 2, 1))[..., None]
    else:
        q32 = q.astype(jnp.float32)
        bias_local = jnp.where(mask_local, 0.0, BIG_NEG).astype(jnp.float32)
        k_sm = jnp.transpose(k, (0, 2, 1, 3))
        v_sm = jnp.transpose(v, (0, 2, 1, 3))
        if k_sm.shape[2] != h:  # GQA cache: expand kv heads for the XLA tile
            k_sm = jnp.repeat(k_sm, h // k_sm.shape[2], axis=2)
            v_sm = jnp.repeat(v_sm, h // v_sm.shape[2], axis=2)
        o, m, l = init_flash_carry(b, sq_g, h, d)
        cq = _pick_chunk(sq_g, 512)
        ck = _pick_chunk(skv, key_chunk_size)
        o, m, l = compute_block_with_kv(
            q32, o, m, l, k_sm, v_sm, bias_local, None, None, 0, 0,
            causal=False, query_chunk_size=cq, key_chunk_size=ck,
            scale=d ** -0.5,
        )

    if axis_size > 1:
        # stop_gradient: pmax has no differentiation rule, and none is
        # needed — m_glob is a pure numerical-stabilization shift (the
        # combined softmax is invariant to it), so treating it as constant
        # gives the exact gradient. This keeps the short-prefill path
        # usable in TRAINING too (seq <= chunk on an sp>1 mesh dispatches
        # here; see llama.py attention dispatch).
        # (stop_gradient goes on the INPUT: jvp would otherwise still trace
        # through pmax before the outer stop_gradient zeroed the tangent)
        m_glob = lax.pmax(lax.stop_gradient(m), axis_name)
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


# ---------------------------------------------------------------------------
# XLA backward tile (oracle path)
# ---------------------------------------------------------------------------


def _block_bwd_xla(
    q32, k_block, v_block, g32, lse, delta, bias, q_seg, kv_seg,
    q_offset, kv_offset, *, causal, scale, query_chunk_size, key_chunk_size,
    precision, pos_stride=1, dropout_rng=None, attn_pdrop=0.0,
):
    """Gradients of one (local-q × kv-block) tile, chunked, pure XLA.
    `bias` here is the block-local per-key bias [b, 1|h, 1, skv] or None.
    Returns (dq [b,sq,h,d], dk_block, dv_block [b,skv,h,d]) all fp32."""
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
        q_start = q_offset + qi * cq * pos_stride
        qseg_c = (
            lax.dynamic_slice_in_dim(q_seg, qi * cq, cq, axis=-1)
            if q_seg is not None
            else None
        )

        def kv_chunk_body(carry, kj):
            dq_c, dk_b, dv_b = carry
            k_start = kv_offset + kj * ck * pos_stride
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
                if bias is not None:
                    bias_c = lax.dynamic_slice_in_dim(bias, kj * ck, ck, axis=-1)
                    logits = logits + bias_c.astype(jnp.float32)
                mask = None
                if causal:
                    qpos = q_start + lax.broadcasted_iota(jnp.int32, (cq, ck), 0) * pos_stride
                    kpos = k_start + lax.broadcasted_iota(jnp.int32, (cq, ck), 1) * pos_stride
                    mask = (kpos <= qpos)[None, None]
                if qseg_c is not None:
                    seg = (qseg_c[:, :, None] == kseg_c[:, None, :])[:, None]
                    mask = seg if mask is None else jnp.logical_and(mask, seg)
                if mask is not None:
                    logits = jnp.where(mask, logits, BIG_NEG)
                p = jnp.where(
                    logits > MASK_GUARD, jnp.exp(logits - lse_c[..., None]), 0.0
                )
                # forward applied dropout to the unnormalized weights; here
                # the same keep-mask (same global tile key) scales both the
                # dv contribution and d(p·v) — delta already equals
                # Σ_i s_i·keep_i(g·v_i)/(1-pd) since it's computed as g·out
                p_acc = p
                dp = jnp.einsum("bqhd,bkhd->bhqk", g_c, v_c, precision=precision)
                if dropout_rng is not None and attn_pdrop > 0.0:
                    keep = tile_dropout_keep(
                        dropout_rng, q_start, k_start, p.shape, attn_pdrop
                    )
                    inv = 1.0 / (1.0 - attn_pdrop)
                    p_acc = jnp.where(keep, p * inv, 0.0)
                    dp = jnp.where(keep, dp * inv, 0.0)
                dv_contrib = jnp.einsum(
                    "bhqk,bqhd->bkhd", p_acc, g_c, precision=precision
                )
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
                fully_masked = k_start > q_start + (cq - 1) * pos_stride
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
