"""Shared-prefix attention for serving (beyond-reference).

The long-context serving pattern this framework exists for — one
million-token document (or video), many requests against it — re-pays
the document prefill on EVERY admission when each slot's cache must
hold the full context, and stores the same P tokens `slots` times.
A shared prefix fixes both: the document is prefilled ONCE into a
frozen batch-1 KV block, each slot's cache holds only its own suffix,
and attention combines the two ranges exactly by the flash partial rule
(softmax over [prefix ++ suffix] == LSE-merge of the per-range
partials).

Decode-step prefix attention uses a head-folding trick to stream the
prefix cache from HBM ONCE PER STEP (not once per slot): all slots see
the identical prefix with an identical all-valid mask, so the per-slot
queries fold into the query-HEAD dim of a single batch-1 kernel call —
[b, 1, h, d] → [1, 1, h_kv·(b·g), d] with kv-head-major ordering, which
the GQA decode kernel (`flash_decode_pallas`) consumes natively: query
head qh reads kv head qh // (b·g). The prefix HBM traffic therefore
amortizes across the whole pool — slots × cheaper than concatenating
the prefix into each slot's cache.

No reference equivalent (LWM serves single requests); the numerics are
the standard flash-decoding combine already used by
`ring_attention_inference` (ops/ring.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lwm_tpu.ops.blockwise import BIG_NEG

MASK_GUARD = BIG_NEG / 2  # partials with m below this saw no valid key


def _fold(q, h_kv):
    """[b, 1, h, d] → [1, 1, b·h, d], kv-head-major: all (batch, group)
    queries of one kv head are contiguous — with h = h_kv·g the folded
    head index is kvh·(b·g) + batch·g + gg, and the decode kernel's GQA
    routing (qh // group) maps it back to kvh for any (b, g)."""
    b, _, h, d = q.shape
    g = h // h_kv
    # [b, 1, h, d] -> [b, h_kv, g, d] -> [h_kv, b, g, d] -> [1, 1, h', d]
    return (
        q.reshape(b, h_kv, g, d)
        .transpose(1, 0, 2, 3)
        .reshape(1, 1, h_kv * b * g, d)
    )


def _unfold_o(o, b, h_kv, g, d):
    # [1, 1, h', d] -> [h_kv, b, g, d] -> [b, h_kv, g, d] -> [b, 1, h, d]
    return (
        o.reshape(h_kv, b, g, d)
        .transpose(1, 0, 2, 3)
        .reshape(b, 1, h_kv * g, d)
    )


def _unfold_ml(x, b, h_kv, g):
    # [1, h', 1] -> [h_kv, b, g] -> [b, h_kv, g] -> [b, h, 1]
    return x.reshape(h_kv, b, g).transpose(1, 0, 2).reshape(b, h_kv * g, 1)


def combine_raw_partials(o1, m1, l1, o2, m2, l2):
    """Merge two flash partials in the RAW-accumulator convention
    (o = Σ e^{s−m}·v, l = Σ e^{s−m}, per query). All [b, q|h dims] f32:
    o: [b, 1, h, d]; m, l: [b, h, 1]. Returns the normalized output
    [b, 1, h, d] f32."""
    m_glob = jnp.maximum(m1, m2)
    # ranges that saw no valid key (l == 0, m == BIG_NEG) contribute 0
    c1 = jnp.where(m1 > MASK_GUARD, jnp.exp(m1 - m_glob), 0.0)
    c2 = jnp.where(m2 > MASK_GUARD, jnp.exp(m2 - m_glob), 0.0)
    c1t = jnp.transpose(c1, (0, 2, 1))[..., None]
    c2t = jnp.transpose(c2, (0, 2, 1))[..., None]
    # an empty range's o can be NaN (kernel normalizes by l == 0), and
    # NaN·0 = NaN — mask, don't multiply
    o1 = jnp.where(c1t > 0, o1, 0.0)
    o2 = jnp.where(c2t > 0, o2, 0.0)
    l_sum = l1 * c1 + l2 * c2
    o_sum = o1 * c1t + o2 * c2t
    return o_sum / jnp.transpose(l_sum, (0, 2, 1))[..., None]


def decode_prefix_partials(q, pk, pv, prefix_mask, pk_scale=None,
                           pv_scale=None, *, interpret=False):
    """Flash-decoding partials of every slot's query against the shared
    prefix, one kernel call, prefix streamed once.

    q: [b, 1, h, d]; pk, pv: head-major [1, h_kv, P, d] (bf16/f32 or
    int8 with [1, h_kv, P] scales); prefix_mask: bool [P] (padded-tail
    validity — identical for every slot by construction).
    Returns raw-accumulator partials (o [b,1,h,d] f32, m, l [b,h,1] f32).
    """
    from lwm_tpu.ops.pallas_decode import flash_decode_pallas

    b, _, h, d = q.shape
    h_kv, P = pk.shape[1], pk.shape[2]
    g = h // h_kv
    qf = _fold(q, h_kv)
    kv_len = jnp.max(
        jnp.where(prefix_mask, jnp.arange(P, dtype=jnp.int32) + 1, 0)
    )
    o, m, l = flash_decode_pallas(
        qf, pk, pv, prefix_mask[None].astype(bool), kv_len,
        k_scale=pk_scale, v_scale=pv_scale,
        interpret=interpret, return_partials=True,
    )
    # kernel returns l-normalized o; combine wants the raw accumulator
    o = o.astype(jnp.float32) * jnp.transpose(l, (0, 2, 1))[..., None]
    return (
        _unfold_o(o, b, h_kv, g, d),
        _unfold_ml(m, b, h_kv, g),
        _unfold_ml(l, b, h_kv, g),
    )


def decode_slot_partials(q, k, v, key_mask, kv_len, k_scale=None,
                         v_scale=None, *, interpret=False):
    """Flash-decoding partials over the per-slot suffix cache.
    q: [b, 1, h, d]; k, v: head-major [b, h_kv, T, d];
    key_mask: bool [b, T]. Returns raw-accumulator partials."""
    from lwm_tpu.ops.pallas_decode import flash_decode_pallas

    o, m, l = flash_decode_pallas(
        q, k, v, key_mask, kv_len,
        k_scale=k_scale, v_scale=v_scale,
        interpret=interpret, return_partials=True,
    )
    o = o.astype(jnp.float32) * jnp.transpose(l, (0, 2, 1))[..., None]
    return o, m, l


def decode_with_prefix(q, k, v, key_mask, kv_len, pk, pv, prefix_mask, *,
                       k_scale=None, v_scale=None, pk_scale=None,
                       pv_scale=None, interpret=False):
    """One decode step attending to [shared prefix ++ own suffix cache].
    Shapes as in the partial helpers. Returns [b, 1, h, d] in q.dtype."""
    o_s, m_s, l_s = decode_slot_partials(
        q, k, v, key_mask, kv_len, k_scale, v_scale, interpret=interpret
    )
    o_p, m_p, l_p = decode_prefix_partials(
        q, pk, pv, prefix_mask, pk_scale, pv_scale, interpret=interpret
    )
    return combine_raw_partials(o_s, m_s, l_s, o_p, m_p, l_p).astype(q.dtype)


def _prefix_global_partials(o_p, m_p, l_p, *, sp_axis=None):
    """Raw prefix partials → globally-combined raw partials. With an sp
    axis, each shard holds the partials of its LOCAL slice of the prefix
    sequence; the cross-shard merge is the flash-decoding combine over
    the ring — O(q·d) comm (one pmax + two psums on [b,h,1]/[b,1,h,d]
    tensors), never O(P·d). Mirrors `ring_attention_inference`'s combine
    (reference llama.py:599-614 semantics for sp-sharded decode)."""
    if sp_axis is None:
        return o_p, m_p, l_p
    m_glob = jax.lax.pmax(m_p, sp_axis)
    c = jnp.where(m_p > MASK_GUARD, jnp.exp(m_p - m_glob), 0.0)
    ct = jnp.transpose(c, (0, 2, 1))[..., None]
    # fully-masked local ranges produce NaN o (normalized by l == 0):
    # mask before scaling — NaN·0 = NaN
    o_glob = jax.lax.psum(jnp.where(ct > 0, o_p, 0.0) * ct, sp_axis)
    l_glob = jax.lax.psum(l_p * c, sp_axis)
    return o_glob, m_glob, l_glob


def decode_with_prefix_local(q, k, v, key_mask, kv_len, pk, pv,
                             prefix_mask, k_scale=None, v_scale=None,
                             pk_scale=None, pv_scale=None, *,
                             sp_axis=None, interpret=False):
    """Shard-local body of the sharded prefix decode: suffix partials over
    the (seq-unsharded) slot cache + prefix partials over the LOCAL prefix
    slice, globally merged over `sp_axis` when given."""
    o_s, m_s, l_s = decode_slot_partials(
        q, k, v, key_mask, kv_len, k_scale, v_scale, interpret=interpret
    )
    o_p, m_p, l_p = decode_prefix_partials(
        q, pk, pv, prefix_mask, pk_scale, pv_scale, interpret=interpret
    )
    o_p, m_p, l_p = _prefix_global_partials(o_p, m_p, l_p, sp_axis=sp_axis)
    return combine_raw_partials(o_s, m_s, l_s, o_p, m_p, l_p).astype(q.dtype)


def decode_with_prefix_sharded(mesh, q, k, v, key_mask, kv_len, pk, pv,
                               prefix_mask, *, k_scale=None, v_scale=None,
                               pk_scale=None, pv_scale=None,
                               interpret=False):
    """`decode_with_prefix` over a (dp, fsdp, tp, sp) mesh.

    Batch rows shard over dp·fsdp and kv-head groups over tp (which also
    shards the head-folded prefix call's query-head dim) — no collectives
    on those axes. The PREFIX sequence shards over sp: a 1M-token
    document's KV block is the thing that outgrows one chip first, and
    sp is how the reference scales the sequence dim (llama.py:599-614).
    Each sp shard streams only its P/sp slice of the prefix; the merge is
    the flash partial combine (pmax + psum over [b,h,1]-sized stats —
    O(q·d) comm per step, never O(P·d)). Slot (suffix) caches stay
    seq-unsharded: every sp shard computes the same suffix partials
    redundantly (suffixes are short; the prefix stream dominates) and
    emits a replicated output.
    """
    from functools import partial as _partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as PS

    sp = mesh.shape.get("sp", 1)
    sp_axis = "sp" if sp > 1 else None
    if sp > 1 and pk.shape[2] % sp != 0:
        raise ValueError(
            f"prefix storage length {pk.shape[2]} must be a multiple of "
            f"sp={sp} (prefix builds pad to kernel/mesh multiples)"
        )
    dpf = mesh.shape.get("dp", 1) * mesh.shape.get("fsdp", 1)
    b_dim = ("dp", "fsdp") if q.shape[0] % dpf == 0 else None
    has_scales = k_scale is not None
    qs = PS(b_dim, None, "tp", None)
    kv = PS(b_dim, "tp", None, None)
    sc = PS(b_dim, "tp", None)
    pkv = PS(None, "tp", "sp", None)
    psc = PS(None, "tp", "sp")
    pm = PS("sp")

    body = _partial(
        decode_with_prefix_local, sp_axis=sp_axis, interpret=interpret
    )
    if has_scales:
        fn = shard_map(
            body,
            mesh=mesh,
            in_specs=(qs, kv, kv, PS(b_dim, None), PS(), pkv, pkv, pm,
                      sc, sc, psc, psc),
            out_specs=qs,
            check_vma=False,
        )
        return fn(q, k, v, key_mask, kv_len, pk, pv, prefix_mask,
                  k_scale, v_scale, pk_scale, pv_scale)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(qs, kv, kv, PS(b_dim, None), PS(), pkv, pkv, pm),
        out_specs=qs,
        check_vma=False,
    )
    return fn(q, k, v, key_mask, kv_len, pk, pv, prefix_mask)


def combine_lse(out1, lse1, out2, lse2):
    """Merge two NORMALIZED flash outputs by their log-sum-exp
    (prefill path: `flash_attention_fwd_pallas` returns (out, lse)).
    out: [b, sq, h, d]; lse: [b, h, sq]. Rows whose lse is BIG_NEG-like
    (no valid key in that range) contribute nothing."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.where(lse1 > MASK_GUARD, jnp.exp(lse1 - m), 0.0)
    w2 = jnp.where(lse2 > MASK_GUARD, jnp.exp(lse2 - m), 0.0)
    w1t = jnp.transpose(w1, (0, 2, 1))[..., None]
    w2t = jnp.transpose(w2, (0, 2, 1))[..., None]
    den = w1t + w2t
    return (out1.astype(jnp.float32) * w1t
            + out2.astype(jnp.float32) * w2t) / den
