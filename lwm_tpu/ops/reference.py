"""Plain full-materialization attention — the numerical oracle for every
other attention implementation in this package (tests only; O(s^2) memory)."""

import jax.numpy as jnp


def reference_attention(
    q,
    k,
    v,
    bias=None,
    segment_ids=None,
    causal=True,
    q_offset=0,
    kv_offset=0,
    dropout_rng=None,
    attn_pdrop=0.0,
    deterministic=True,
):
    """q: [b, sq, h, d]; k, v: [b, skv, h, d]; bias broadcastable to
    [b, 1|h, 1|sq, skv]; segment_ids: ([b, sq], [b, skv]) or [b, s] shared.

    Returns [b, sq, h, d] in q.dtype, computed in fp32.
    """
    orig_dtype = q.dtype
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    mask = None
    if causal:
        sq, skv = q.shape[1], k.shape[1]
        qpos = q_offset + jnp.arange(sq)[:, None]
        kpos = kv_offset + jnp.arange(skv)[None, :]
        mask = (kpos <= qpos)[None, None]
    if segment_ids is not None:
        if isinstance(segment_ids, tuple):
            q_seg, kv_seg = segment_ids
        else:
            q_seg = kv_seg = segment_ids
        seg_mask = (q_seg[:, :, None] == kv_seg[:, None, :])[:, None]
        mask = seg_mask if mask is None else jnp.logical_and(mask, seg_mask)
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    # rows that are entirely masked produce zeros, not NaN
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.where(logits > -1e29, jnp.exp(logits - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = jnp.where(l > 0.0, p / jnp.maximum(l, 1e-30), 0.0)
    if not deterministic and attn_pdrop > 0.0 and dropout_rng is not None:
        import jax

        keep = jax.random.bernoulli(dropout_rng, 1.0 - attn_pdrop, p.shape)
        p = jnp.where(keep, p / (1.0 - attn_pdrop), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return out.astype(orig_dtype)
