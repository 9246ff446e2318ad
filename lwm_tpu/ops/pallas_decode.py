"""Pallas TPU flash-decoding kernel: one query token over a long
(optionally int8-quantized) KV cache.

Decode is HBM-bandwidth-bound: the whole step is one streaming read of the
cache. The XLA fallback (llama.py `_inference_attn`) materializes fp32
logits over the full cache and — with the int8 cache — first dequantizes
the entire cache to bf16 in HBM, spending MORE bandwidth than bf16. This
kernel streams K/V blocks once at their stored width (int8 = half the
bytes of bf16), folds the dequantization scales into the in-VMEM
arithmetic, and skips cache blocks past the current length entirely via
index-map redirection + @pl.when (an at-max-length cache costs only the
filled prefix).

Contract (matches `ring_attention_inference`, SURVEY.md §2.7, for the
single-device q_len==1 case): additive-mask semantics via a boolean
per-key mask, online softmax in fp32, output in q.dtype. Masking uses the
caller's mask (left-padded prompts leave holes, so a pure length cutoff
is not enough); `kv_len` bounds the scan for block skipping.

Grid: (b·h_kv, nk) with nk "arbitrary" — the (o, m, l) scratch
accumulates across kv blocks per (batch, kv-head) row. Under GQA the g
query heads of a group share the row: the q tile is [g, d] and one
streaming read of the kv head's cache serves all g heads (cache HBM
traffic drops by g versus expanded-MHA). q is a single token: logit
tiles are [g, bk] — far below MXU shape, which is irrelevant at decode
(the VPU/MXU is idle waiting on HBM either way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lwm_tpu.ops.blockwise import BIG_NEG

DEFAULT_BLOCK_K_DECODE = 1024


def _best_block_k(T, cap):
    """Largest divisor of T ≤ cap that is a lane multiple (128: the
    mask/scale blocks are [1, bk], so bk sits in the lane dim).

    Decode cost is dominated by per-tile grid overhead, so the block
    should stay as close to cap as divisibility allows: the old
    halve-until-divides search collapsed e.g. T=30976 to bk=256 — 4x
    the tiles of necessary — measured 128 vs 274 tok/s decode at a 32K
    cache. `round_cache_length` (llama.py) rounds cache allocations to
    1024 multiples precisely so this search lands on the cap."""
    if T <= cap:
        return T  # single whole-array block (always legal)
    for bk in range(cap - cap % 128, 127, -128):
        if T % bk == 0:
            return bk
    # no lane-aligned divisor (odd T, direct kernel callers only): halve
    bk = cap
    while T % bk:
        bk //= 2
    return bk


def _decode_kernel(
    kv_len_ref,  # scalar prefetch: [1] int32, valid cache length
    q_ref,       # [g, d] compute dtype — g grouped query heads (GQA;
                 # g == 1 under MHA) sharing this kv head's stream
    k_ref,       # [bk, d] cache dtype (bf16/f32 or int8)
    v_ref,       # [bk, d] cache dtype
    mask_ref,    # [1, bk] int32 (1 = attend)
    *rest,
    scale,
    quantized,
    partials,
):
    if quantized:
        ksc_ref, vsc_ref = rest[:2]
        rest = rest[2:]
    if partials:
        o_ref, m_out_ref, l_out_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest

    bk = k_ref.shape[0]
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, BIG_NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(j * bk < kv_len_ref[0])
    def _compute():
        q = q_ref[...]
        g = q.shape[0]
        k = k_ref[...].astype(q.dtype)
        logits = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [g, bk]
        if quantized:
            # fold the per-token k scales into the logits
            logits *= ksc_ref[...].astype(jnp.float32)
        logits = jnp.where(mask_ref[...] > 0, logits, BIG_NEG)

        m_prev = m_ref[...]          # [1, 128] lane-replicated row max
        l_prev = l_ref[...]
        m_curr = jnp.max(logits, axis=-1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        p = jnp.exp(logits - jnp.broadcast_to(m_next[:, :1], logits.shape))
        alpha = jnp.exp(m_prev - m_next)
        l_corr = alpha * l_prev
        l_next = jnp.sum(p, axis=-1)[:, None] + l_corr
        l_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
        if quantized:
            # fold the per-token v scales into p before the p·v dot
            p = p * vsc_ref[...].astype(jnp.float32)
        v = v_ref[...]
        d = v.shape[-1]
        acc_ref[...] *= jnp.broadcast_to((l_corr * l_inv)[:, :1], (g, d))
        pv = lax.dot_general(
            p.astype(q.dtype), v.astype(q.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] += pv * jnp.broadcast_to(l_inv[:, :1], (g, d))
        m_ref[...] = m_next
        l_ref[...] = l_next

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)
        if partials:
            # cross-shard flash-decoding combine (ring_attention_inference):
            # the accumulator is already l-normalized, so the combine
            # weight for this shard is l·exp(m − m_global)
            m_out_ref[...] = m_ref[...]
            l_out_ref[...] = l_ref[...]


def flash_decode_pallas(
    q, k, v, mask, kv_len, k_scale=None, v_scale=None, *,
    scale=None, block_k=DEFAULT_BLOCK_K_DECODE, interpret=False,
    return_partials=False,
):
    """One-token flash decoding over the full cache.

    q: [b, 1, h, d] (compute dtype); k, v: HEAD-MAJOR [b, h_kv, T, d]
    (bf16/f32 or int8) — the cache's storage layout, so folding
    (b, h_kv) into the kernel grid is a free reshape (a seq-major cache
    forced a full-cache physical transpose per decode step, which
    dominated the HBM traffic of serving). h_kv may be a divisor of h
    (GQA): query head qh reads kv head qh // (h // h_kv);
    mask: bool/int [b, T] (per-key validity — combines the causal frontier
    and any left-padding holes); kv_len: int32 scalar or [b] — upper bound
    on valid positions, used only to skip whole blocks;
    k_scale/v_scale: [b, h, T] fp32 when k/v are int8.
    Returns [b, 1, h, d] in q.dtype — or, with return_partials=True,
    (o [b, 1, h, d], m [b, h, 1] f32, l [b, h, 1] f32) where o is this
    shard's l-normalized partial: the sp-sharded combine
    (`ring_attention_inference`) merges shards as
    Σ o_i·w_i / Σ w_i with w_i = l_i·exp(m_i − max_i m_i).
    """
    b, one, h, d = q.shape
    assert one == 1, "flash_decode_pallas is the q_len==1 decode kernel"
    hkv, T = k.shape[1], k.shape[2]
    assert h % hkv == 0, f"q heads {h} not a multiple of kv heads {hkv}"
    g = h // hkv  # GQA group size (1 = MHA): the g query heads sharing a
    # kv head ride ONE streaming read of its cache — the kernel's q tile
    # is [g, d], so the cache HBM traffic drops by g versus expanded MHA
    scale = d ** -0.5 if scale is None else scale
    bk = _best_block_k(T, min(block_k, T))
    nk = T // bk

    quantized = k_scale is not None
    # fold heads: q [b, 1, h, d] -> [b*hkv, g, d] (group-major head order:
    # query head qh attends kv head qh // g); k/v [b, hkv, T, d] ->
    # [b*hkv, T, d] (contiguous — no data movement)
    qf = q.transpose(0, 2, 1, 3).reshape(b * hkv, g, d)
    kf = k.reshape(b * hkv, T, d)
    vf = v.reshape(b * hkv, T, d)
    mask_f = jnp.broadcast_to(
        mask.astype(jnp.int32)[:, None, :], (b, 1, T)
    )  # per-batch mask, heads share it
    kv_len = jnp.max(jnp.asarray(kv_len, jnp.int32)).reshape(1)

    def skip(j, kv_len_ref):
        # redirect the DMA of fully-skipped tail blocks to block 0
        return lax.select(j * bk < kv_len_ref[0], j, 0)

    inputs = [qf, kf, vf, mask_f]
    in_specs = [
        pl.BlockSpec((None, g, d), lambda bh, j, L: (bh, 0, 0)),
        pl.BlockSpec((None, bk, d), lambda bh, j, L: (bh, skip(j, L), 0)),
        pl.BlockSpec((None, bk, d), lambda bh, j, L: (bh, skip(j, L), 0)),
        pl.BlockSpec((None, 1, bk), lambda bh, j, L: (bh // hkv, 0, skip(j, L))),
    ]
    if quantized:
        # [b, hkv, T] -> [b*hkv, 1, T]: contiguous, free
        ksc = k_scale.astype(jnp.float32).reshape(b * hkv, 1, T)
        vsc = v_scale.astype(jnp.float32).reshape(b * hkv, 1, T)
        inputs += [ksc, vsc]
        in_specs += [
            pl.BlockSpec((None, 1, bk), lambda bh, j, L: (bh, 0, skip(j, L))),
            pl.BlockSpec((None, 1, bk), lambda bh, j, L: (bh, 0, skip(j, L))),
        ]

    kernel = functools.partial(
        _decode_kernel, scale=scale, quantized=quantized,
        partials=return_partials,
    )
    out_specs = pl.BlockSpec((None, g, d), lambda bh, j, L: (bh, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b * hkv, g, d), q.dtype)
    if return_partials:
        stat_spec = pl.BlockSpec((None, g, 128), lambda bh, j, L: (bh, 0, 0))
        stat_shape = jax.ShapeDtypeStruct((b * hkv, g, 128), jnp.float32)
        out_specs = [out_specs, stat_spec, stat_spec]
        out_shape = [out_shape, stat_shape, stat_shape]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * hkv, nk),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((g, d), jnp.float32),    # acc
                pltpu.VMEM((g, 128), jnp.float32),  # m
                pltpu.VMEM((g, 128), jnp.float32),  # l
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_len, *inputs)
    if return_partials:
        o, m, l = out
        return (
            o.reshape(b, h, 1, d).transpose(0, 2, 1, 3),
            m[..., 0].reshape(b, h, 1),
            l[..., 0].reshape(b, h, 1),
        )
    return out.reshape(b, h, 1, d).transpose(0, 2, 1, 3)
