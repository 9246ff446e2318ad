"""Blockwise (chunked) attention and feed-forward in pure XLA.

This is the in-device memory-bounding layer of the long-context stack
(SURVEY.md §5.7 step 1, reference contract §2.7 `blockwise_attn` /
`blockwise_feedforward`): q and kv are processed in chunks with an online
softmax so the full [s, s] logits matrix never materializes. It is also the
numerical oracle the Pallas kernels and the ring layer are tested against.

Conventions (shared by ring.py and the Pallas kernels):
- q: [b, sq, h, d]; k, v: [b, skv, h, d]
- carries: o [b, sq, h, d] fp32 (un-normalized), m, l [b, h, sq] fp32
- masking: additive bias (any broadcastable [b, 1|h, 1|sq_glob, skv_glob]),
  token-level causal by *global* positions (q_offset/kv_offset), and
  segment-id equality; fully-masked entries contribute exactly 0 via the
  `> MASK_GUARD` cutoff, so fully-masked rows yield 0 output, never NaN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

BIG_NEG = -1e30  # finite stand-in for -inf so online-softmax stays NaN-free
MASK_GUARD = -1e29  # anything below this is treated as fully masked


def pick_chunk(size: int, preferred: int) -> int:
    """Largest usable chunk: preferred if it divides size, else the whole
    extent (sizes in this stack are powers of two, so this rarely triggers)."""
    if preferred >= size:
        return size
    return preferred if size % preferred == 0 else size


def _as_key_data(rng):
    """Normalize a PRNG key (typed or raw uint32 data) to raw key data."""
    if rng is None:
        return None
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        return jax.random.key_data(rng)
    return rng


def tile_dropout_keep(rng_data, q_start, k_start, shape, attn_pdrop):
    """Keep-mask for one attention tile, keyed by the tile's GLOBAL
    (q_start, k_start) coordinates: any device / ring step / bwd recompute
    that visits the same tile draws the identical mask, which is what makes
    ring attention with dropout bitwise-equal to the single-device oracle
    (and makes the custom-VJP backward see the forward's mask)."""
    key = jax.random.wrap_key_data(rng_data)
    key = jax.random.fold_in(jax.random.fold_in(key, q_start), k_start)
    return jax.random.bernoulli(key, 1.0 - attn_pdrop, shape)


def _slice_bias(bias, q_start, cq, k_start, ck):
    """Slice a broadcastable bias [b, 1|h, 1|SQ, SK] to [b, *, 1|cq, ck]."""
    if bias is None:
        return None
    if bias.shape[-2] != 1:
        bias = lax.dynamic_slice_in_dim(bias, q_start, cq, axis=-2)
    return lax.dynamic_slice_in_dim(bias, k_start, ck, axis=-1)


def _slice_seg(seg, start, size):
    if seg is None:
        return None
    if seg.shape[-1] == size:
        # already local (caller pre-sliced)
        return seg
    return lax.dynamic_slice_in_dim(seg, start, size, axis=-1)


def flash_block_update(
    carry,
    q_chunk,
    k_chunk,
    v_chunk,
    bias_chunk,
    q_seg_chunk,
    kv_seg_chunk,
    q_start,
    k_start,
    *,
    causal: bool,
    scale: float,
    precision=None,
    pos_stride: int = 1,
    dropout_rng=None,
    attn_pdrop: float = 0.0,
):
    """One online-softmax update of carry=(o, m, l) with a (q_chunk, kv_chunk)
    tile. All inputs fp32 except v (any dtype). Shapes:
      q_chunk [b, cq, h, d]; k/v_chunk [b, ck, h, d]
      o [b, cq, h, d] fp32; m, l [b, h, cq] fp32
    """
    o, m, l = carry
    cq, ck = q_chunk.shape[1], k_chunk.shape[1]
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", q_chunk, k_chunk, precision=precision)
        * scale
    )
    if bias_chunk is not None:
        logits = logits + bias_chunk.astype(jnp.float32)
    mask = None
    if causal:
        qpos = q_start + lax.broadcasted_iota(jnp.int32, (cq, ck), 0) * pos_stride
        kpos = k_start + lax.broadcasted_iota(jnp.int32, (cq, ck), 1) * pos_stride
        mask = (kpos <= qpos)[None, None]
    if q_seg_chunk is not None:
        seg = (q_seg_chunk[:, :, None] == kv_seg_chunk[:, None, :])[:, None]
        mask = seg if mask is None else jnp.logical_and(mask, seg)
    if mask is not None:
        logits = jnp.where(mask, logits, BIG_NEG)

    m_new = jnp.maximum(m, jnp.max(logits, axis=-1))  # [b,h,cq]
    p = jnp.where(logits > MASK_GUARD, jnp.exp(logits - m_new[..., None]), 0.0)
    alpha = jnp.where(m > MASK_GUARD, jnp.exp(m - m_new), 0.0)  # [b,h,cq]
    # the denominator NEVER sees dropout: dropout(softmax(x)) = dropped
    # numerator / undropped row sum (row normalization is a scalar, so the
    # elementwise mask commutes with it)
    l_new = alpha * l + jnp.sum(p, axis=-1)
    p_acc = p
    if dropout_rng is not None and attn_pdrop > 0.0:
        keep = tile_dropout_keep(
            dropout_rng, q_start, k_start, p.shape, attn_pdrop
        )
        p_acc = jnp.where(keep, p / (1.0 - attn_pdrop), 0.0)
    o_new = (
        o * jnp.transpose(alpha, (0, 2, 1))[..., None]
        + jnp.einsum(
            "bhqk,bkhd->bqhd", p_acc, v_chunk.astype(jnp.float32),
            precision=precision,
        )
    )
    return o_new, m_new, l_new


def finalize_flash(o, l):
    """Normalize the online-softmax accumulator; fully-masked rows → 0."""
    l_t = jnp.transpose(l, (0, 2, 1))[..., None]  # [b,sq,h,1]
    return jnp.where(l_t > 0.0, o / jnp.maximum(l_t, 1e-30), 0.0)


def compute_block_with_kv(
    q,
    o,
    m,
    l,
    k_block,
    v_block,
    bias,
    q_seg,
    kv_seg,
    q_offset,
    kv_offset,
    *,
    causal=True,
    query_chunk_size=512,
    key_chunk_size=512,
    scale,
    precision=None,
    policy=None,
    prevent_cse=True,
    pos_stride=1,
    dropout_rng=None,
    attn_pdrop=0.0,
):
    """Update the full-local-q carry (o, m, l) with one kv block, chunked.

    q [b, sq, h, d] fp32; k_block/v_block [b, skv, h, d];
    bias: global broadcastable bias or None; q_seg [b, sq] local,
    kv_seg [b, skv] local; offsets are *global* positions (may be traced).
    Fully-causally-masked kv chunks are skipped with lax.cond.
    """
    b, sq, h, d = q.shape
    skv = k_block.shape[1]
    cq = min(query_chunk_size, sq)
    ck = min(key_chunk_size, skv)
    nq, nk = sq // cq, skv // ck
    assert sq % cq == 0 and skv % ck == 0, (sq, cq, skv, ck)

    k32 = k_block.astype(jnp.float32)

    def q_chunk_body(_, args):
        qi, q_c, o_c, m_c, l_c = args
        q_start = q_offset + qi * cq * pos_stride

        def kv_chunk_body(carry, kj):
            k_start = kv_offset + kj * ck * pos_stride
            k_c = lax.dynamic_slice_in_dim(k32, kj * ck, ck, axis=1)
            v_c = lax.dynamic_slice_in_dim(v_block, kj * ck, ck, axis=1)
            # bias is indexed LOCALLY (callers pass either the global bias
            # with zero offsets, or a pre-sliced per-block bias)
            bias_c = _slice_bias(bias, qi * cq, cq, kj * ck, ck)
            qseg_c = (
                lax.dynamic_slice_in_dim(q_seg, qi * cq, cq, axis=-1)
                if q_seg is not None
                else None
            )
            kseg_c = (
                lax.dynamic_slice_in_dim(kv_seg, kj * ck, ck, axis=-1)
                if kv_seg is not None
                else None
            )

            def compute(c):
                return flash_block_update(
                    c, q_c, k_c, v_c, bias_c, qseg_c, kseg_c, q_start, k_start,
                    causal=causal, scale=scale, precision=precision,
                    pos_stride=pos_stride, dropout_rng=dropout_rng,
                    attn_pdrop=attn_pdrop,
                )

            if policy is not None:
                compute = jax.checkpoint(
                    compute, policy=policy, prevent_cse=prevent_cse
                )
            if causal:
                # skip chunks strictly above the causal diagonal
                fully_masked = k_start > q_start + (cq - 1) * pos_stride
                new_carry = lax.cond(fully_masked, lambda c: c, compute, carry)
            else:
                new_carry = compute(carry)
            return new_carry, None

        (o_c, m_c, l_c), _ = lax.scan(
            kv_chunk_body, (o_c, m_c, l_c), jnp.arange(nk)
        )
        return None, (o_c, m_c, l_c)

    # chunked views of q and the carries
    qs = q.reshape(b, nq, cq, h, d).transpose(1, 0, 2, 3, 4)
    os = o.reshape(b, nq, cq, h, d).transpose(1, 0, 2, 3, 4)
    ms = m.reshape(b, h, nq, cq).transpose(2, 0, 1, 3)
    ls = l.reshape(b, h, nq, cq).transpose(2, 0, 1, 3)
    _, (os, ms, ls) = lax.scan(
        q_chunk_body, None, (jnp.arange(nq), qs, os, ms, ls)
    )
    o = os.transpose(1, 0, 2, 3, 4).reshape(b, sq, h, d)
    m = ms.transpose(1, 2, 0, 3).reshape(b, h, sq)
    l = ls.transpose(1, 2, 0, 3).reshape(b, h, sq)
    return o, m, l


def init_flash_carry(b, sq, h, d):
    o = jnp.zeros((b, sq, h, d), dtype=jnp.float32)
    m = jnp.full((b, h, sq), BIG_NEG, dtype=jnp.float32)
    l = jnp.zeros((b, h, sq), dtype=jnp.float32)
    return o, m, l


def blockwise_attn(
    q,
    k,
    v,
    bias=None,
    segment_ids=None,
    *,
    causal=True,
    query_chunk_size=512,
    key_chunk_size=512,
    deterministic=True,
    dropout_rng=None,
    attn_pdrop=0.0,
    dtype=jnp.float32,
    policy=None,
    precision=None,
    prevent_cse=True,
    float32_logits=True,
    q_offset=0,
    kv_offset=0,
):
    """Single-device blockwise attention (differentiable via XLA autodiff;
    memory bounded by chunk sizes). The oracle for ring/Pallas kernels.

    Attention dropout (reference ringattention contract §2.7) drops the
    unnormalized exp-weights with masks keyed by global tile coordinates
    (`tile_dropout_keep`), so results match ring attention with the same
    rng and chunk sizes exactly.
    """
    if deterministic or attn_pdrop <= 0.0:
        dropout_rng = None
    elif dropout_rng is None:
        raise ValueError("attn_pdrop > 0 and not deterministic needs dropout_rng")
    dropout_rng = _as_key_data(dropout_rng)
    b, sq, h, d = q.shape
    if float32_logits:
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
    q_seg = kv_seg = None
    if segment_ids is not None:
        if isinstance(segment_ids, tuple):
            q_seg, kv_seg = segment_ids
        else:
            q_seg = kv_seg = segment_ids
    o, m, l = init_flash_carry(b, sq, h, d)
    o, m, l = compute_block_with_kv(
        q.astype(jnp.float32), o, m, l, k, v, bias, q_seg, kv_seg,
        q_offset, kv_offset,
        causal=causal, query_chunk_size=pick_chunk(sq, query_chunk_size),
        key_chunk_size=pick_chunk(k.shape[1], key_chunk_size), scale=d ** -0.5,
        precision=precision, policy=policy, prevent_cse=prevent_cse,
        dropout_rng=dropout_rng, attn_pdrop=attn_pdrop,
    )
    return finalize_flash(o, l).astype(dtype)


def blockwise_ffn(remat_ffn, inputs, chunk_size=2048, pre_remat=False):
    """Apply a feed-forward module over sequence chunks with lax.scan
    (reference contract §2.7 `blockwise_feedforward`). ``remat_ffn`` is
    expected to already be remat-wrapped (nn.remat) by the caller.
    """
    del pre_remat
    b, s, dim = inputs.shape
    if s <= chunk_size:
        return remat_ffn(inputs)
    assert s % chunk_size == 0, (s, chunk_size)
    n = s // chunk_size
    x = inputs.reshape(b, n, chunk_size, dim).swapaxes(0, 1)

    def body(_, chunk):
        return None, remat_ffn(chunk)

    _, out = lax.scan(body, None, x)
    return out.swapaxes(0, 1).reshape(b, s, dim)
