"""Pallas TPU flash-attention kernels (forward + backward).

The TPU-native compute path for blockwise attention (SURVEY.md §2.7): the
(q-block × kv-block) tiling runs as a Mosaic kernel grid with online
softmax in VMEM — no XLA scan, no per-chunk residuals, MXU-shaped matmuls.
Used per ring step by ring_attention on TPU and standalone as the
single-device flash path. Causal masking is by *global* positions so the
same kernel serves every ring step: q_offset/kv_offset arrive via scalar
prefetch and feed both the in-kernel masks and the index-map block skipping.

Grid architecture (the jax official flash kernel's shape, extended for ring
offsets): 3-D grids iterate (batch·heads, q blocks, kv blocks) with the
innermost dim revisiting a resident output block / VMEM scratch:
- fwd   grid (bh, nq, nk): o + (m, l) scratch accumulate across kv blocks
- dq    grid (bh, nq, nk): dq output block resident across kv blocks
- dk/dv grid (bh, nk, nq): dk/dv output blocks resident across q blocks
Causally-skipped tiles cost only grid overhead: their index maps redirect
the DMA to block 0 and the tile compute is @pl.when-guarded off.

TPU layouts: the fwd lse OUTPUT is sublane-replicated [*, 8, sq]
(splash-attention's logsumexp layout — 16× smaller than the official
flash kernel's lane-replicated [*, sq, 128], which at 1M context is
4 GiB). The backward's lse/delta operands are DUAL-layout: lane-
replicated (zero in-kernel relayout) while the pair stays under ~1 GiB,
sublane-replicated (16× smaller, ~2-4% relayout cost via an exact
selector dot — _sub8_to_lanes) beyond, where HBM fit beats kernel
cycles; LWM_PALLAS_STATS_SUB8=0/1 overrides. q segment ids
lane-replicated [b, sq, 128]; kv segment ids sublane-replicated
[b, 8, skv]. Bias accepts the full §2.7 contract —
any broadcastable [b|1, h|1, sq|1, skv] — normalized to per-key
[b·g, 1, skv] (mode 1, the LWM mask-derived hot path) or full-tile
[b·g, sq, skv] (mode 2) records. Public wrappers use the package's
standard shapes ([b, s, h, d]; lse [b, h, sq]).

Semantics (must match lwm_tpu.ops.blockwise oracle): fp32 logits and
accumulators; additive per-key bias + segment equality + global-position
causal; fully-masked rows produce 0 (MASK_GUARD cutoff), never NaN;
backward recomputes p from (q, k, v, lse).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lwm_tpu.ops.blockwise import BIG_NEG, MASK_GUARD

import os

# swept on v5e at 32K ctx (with dimension_semantics set): (2048, 1024)
# fwd 23.3 ms = 47.9% MFU vs (1024, 512) 24.7 ms; fwd+bwd within noise.
# The f32 logits tile is block_q×block_k×4B (8MB here) and must fit VMEM
# alongside the q/k/v/acc blocks — 2048×2048 fails to compile.
DEFAULT_BLOCK_Q = int(os.environ.get("LWM_PALLAS_BLOCK_Q", 2048))
DEFAULT_BLOCK_K = int(os.environ.get("LWM_PALLAS_BLOCK_K", 1024))
# bwd kernels carry extra per-block refs (g, lse, delta, and the bias in
# the model path), so they get their own caps: swept best (1024, 1024) =
# 75.2 ms fwd+bwd vs 83.7 ms at (512, 512); (2048, 1024) OOMs scoped vmem
# in the model path even with the raised limit
DEFAULT_BLOCK_Q_BWD = int(os.environ.get("LWM_PALLAS_BLOCK_Q_BWD", 1024))
DEFAULT_BLOCK_K_BWD = int(os.environ.get("LWM_PALLAS_BLOCK_K_BWD", 1024))
NUM_LANES = 128
NUM_SUBLANES = 8


def _mask_logits(logits, q_pos0, k_pos0, bq, bk, q_seg, k_seg, causal,
                 pos_stride=1):
    """Apply causal + segment masks to a [bq, bk] f32 logits tile.
    pos_stride > 1 = striped sequence layout: local index i holds global
    position offset + i·stride."""
    mask = None
    if causal:
        qpos = q_pos0 + lax.broadcasted_iota(jnp.int32, (bq, bk), 0) * pos_stride
        kpos = k_pos0 + lax.broadcasted_iota(jnp.int32, (bq, bk), 1) * pos_stride
        mask = kpos <= qpos
    if q_seg is not None:
        seg = q_seg[:, None] == k_seg[None, :]
        mask = seg if mask is None else jnp.logical_and(mask, seg)
    if mask is not None:
        logits = jnp.where(mask, logits, BIG_NEG)
    return logits


def _tile_visible(q_off, kv_off, qi, kj, bq, bk, causal, pos_stride=1):
    """Whether tile (qi, kj) has any unmasked (causal) entry:
    min kv position ≤ max q position."""
    if not causal:
        return jnp.bool_(True)
    return (
        kv_off[0] + kj * bk * pos_stride
        <= q_off[0] + ((qi + 1) * bq - 1) * pos_stride
    )




def _lane_tile(x, n):
    """Lane-replicated [bq, 128] row stats → [bq, n] (tile or slice)."""
    if n == NUM_LANES:
        return x
    if n < NUM_LANES:
        return x[:, :n]
    assert n % NUM_LANES == 0, n
    return jnp.tile(x, (1, n // NUM_LANES))


def _stat_selector():
    """[8, 128] 0/1 selector: each lane column c picks sublane c % 8."""
    return (
        lax.broadcasted_iota(jnp.int32, (NUM_SUBLANES, NUM_LANES), 0)
        == lax.broadcasted_iota(jnp.int32, (NUM_SUBLANES, NUM_LANES), 1)
        % NUM_SUBLANES
    ).astype(jnp.float32)


def _sub8_to_lanes(x):
    """Sublane-replicated [8, bq] row stats → lane-replicated [bq, 128].

    The HBM layout for lse/delta is splash-attention's (jax
    splash_attention_kernel.py ~:2111): [rows, NUM_SUBLANES, sq] — an 8×
    replication instead of the official flash kernel's 128× lane
    replication, which at 1M context × 8 heads is the difference between
    256 MiB and 4 GiB PER STATS ARRAY (two in the backward: the round-4
    1M/h512 OOM's two largest allocations). The relayout to the lane-
    replicated form the tile arithmetic wants is one tiny MXU dot with an
    exact 0/1 selector — each output lane is a single 1·x product, so
    HIGHEST precision makes it bit-exact, no averaging."""
    return lax.dot_general(
        x, _stat_selector(), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _lanes_to_sub8(x):
    """Lane-replicated [bq, 128] row stats → sublane-replicated [8, bq]
    (the write-side twin of _sub8_to_lanes; sublane s picks lane s)."""
    sel = (
        lax.broadcasted_iota(jnp.int32, (NUM_SUBLANES, NUM_LANES), 0)
        == lax.broadcasted_iota(jnp.int32, (NUM_SUBLANES, NUM_LANES), 1)
    ).astype(jnp.float32)
    return lax.dot_general(
        sel, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _add_bias(logits, bias_ref, bias_mode):
    """bias_mode: 0 none, 1 per-key [*, 1, bk], 2 full tile [*, bq, bk]."""
    if bias_mode == 1:
        return logits + bias_ref[0, :][None, :].astype(jnp.float32)
    if bias_mode == 2:
        return logits + bias_ref[...].astype(jnp.float32)
    return logits


def _tile_keep(rng_ref, bh, q_pos0, k_pos0, shape, attn_pdrop, pos_stride=1):
    """In-kernel dropout keep-mask, keyed per ELEMENT by the GLOBAL
    (q position, k position) pair plus the batch·head row and the rng key
    words: every kernel (fwd, dq, dkv), ring step, and recompute that
    touches the same attention entry derives the identical keep bit —
    regardless of block sizes, backend, or interpret mode (a pure-compute
    counter-based hash, not the hardware PRNG, precisely so the bits are
    reproducible everywhere). Finalizer: lowbias32 (a public-domain
    avalanche hash). The XLA oracle (blockwise.tile_dropout_keep) keys by
    tile instead, so XLA-vs-Pallas dropout runs are statistically — not
    bitwise — equivalent."""
    qpos = (
        q_pos0 + lax.broadcasted_iota(jnp.int32, shape, 0) * pos_stride
    ).astype(jnp.uint32)
    kpos = (
        k_pos0 + lax.broadcasted_iota(jnp.int32, shape, 1) * pos_stride
    ).astype(jnp.uint32)
    x = (qpos * np.uint32(0x9E3779B1)) ^ (kpos * np.uint32(0x85EBCA77))
    x = x ^ (jnp.uint32(bh) * np.uint32(0xC2B2AE3D))
    x = x ^ rng_ref[0].astype(jnp.uint32)
    x = x ^ (rng_ref[1].astype(jnp.uint32) * np.uint32(0x27D4EB2F))
    x = x ^ (x >> 16)
    x = x * np.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * np.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    threshold = np.uint32(min(2**32 - 1, int((1.0 - attn_pdrop) * 2**32)))
    return x < threshold


def _fwd_kernel(
    q_off_ref, kv_off_ref, rng_ref,
    q_ref, k_ref, v_ref, *rest,
    causal, scale, bias_mode, has_seg, pos_stride, attn_pdrop,
):
    rest = list(rest)
    bias_ref = rest.pop(0) if bias_mode else None
    qseg_ref = rest.pop(0) if has_seg else None
    kseg_ref = rest.pop(0) if has_seg else None
    o_ref, lse_ref, acc_ref, m_ref, l_ref = rest

    bq, d = q_ref.shape
    bk = k_ref.shape[0]
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)
    q_pos0 = q_off_ref[0] + qi * bq * pos_stride
    k_pos0 = kv_off_ref[0] + kj * bk * pos_stride

    @pl.when(kj == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, BIG_NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(_tile_visible(q_off_ref, kv_off_ref, qi, kj, bq, bk, causal, pos_stride))
    def _compute():
        # MXU-native: bf16 (input-dtype) multiplications with fp32
        # accumulation — fp32×fp32 dots run at a fraction of MXU rate
        q = q_ref[...]
        k = k_ref[...]
        logits = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        logits = _add_bias(logits, bias_ref, bias_mode)
        q_seg = qseg_ref[:, 0] if has_seg else None
        k_seg = kseg_ref[0, :] if has_seg else None

        logits = _mask_logits(logits, q_pos0, k_pos0, bq, bk, q_seg, k_seg,
                              causal, pos_stride)
        # row stats live lane-replicated [bq, 128]; all arithmetic against
        # the [bq, bk] tile uses jnp.tile of those lanes — [bq, 1]
        # broadcasts lower to slow cross-lane moves on the VPU
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        m_curr = jnp.max(logits, axis=-1)[:, None]  # [bq, 1] → max fold
        m_next = jnp.maximum(m_prev, m_curr)  # [bq, 128]
        # no masked-entry guard: masked logits sit at BIG_NEG, so with any
        # real entry in the row exp underflows to 0; rows with NO real entry
        # yet produce garbage that is evicted by alpha once a real entry
        # arrives, and rows that never get one carry lse=BIG_NEG which the
        # ring/flash combine and finalize treat as fully-masked. The bwd
        # kernels MUST keep their guard (global lse can equal BIG_NEG there).
        p = jnp.exp(logits - _lane_tile(m_next, bk))
        alpha = jnp.exp(m_prev - m_next)  # [bq, 128]
        l_corr = alpha * l_prev
        l_next = jnp.sum(p, axis=-1)[:, None] + l_corr  # [bq, 128]
        l_next_inv_safe = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
        v = v_ref[...]
        p_acc = p
        if attn_pdrop > 0.0:
            # drop the unnormalized weights; the denominator stays intact
            # (dropout(softmax) = dropped numerator / undropped row sum)
            keep = _tile_keep(
                rng_ref, bh, q_pos0, k_pos0, p.shape, attn_pdrop,
                pos_stride,
            )
            p_acc = jnp.where(keep, p * (1.0 / (1.0 - attn_pdrop)), 0.0)
        # acc holds the RUNNING NORMALIZED output (official kernel scheme)
        acc_ref[...] *= _lane_tile(l_corr * l_next_inv_safe, d)
        o_curr = lax.dot_general(
            p_acc.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] += o_curr * _lane_tile(l_next_inv_safe, d)
        m_ref[...] = m_next
        l_ref[...] = l_next

    @pl.when(kj == nk - 1)
    def _finalize():
        l = l_ref[...]
        m = m_ref[...]
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)  # already normalized
        lse_ref[...] = _lanes_to_sub8(
            jnp.where(l > 0.0, m + jnp.log(jnp.maximum(l, 1e-30)), BIG_NEG)
        )


def _bwd_dq_kernel(
    q_off_ref, kv_off_ref, rng_ref,
    q_ref, k_ref, v_ref, *rest,
    causal, scale, bias_mode, has_seg, pos_stride, attn_pdrop,
    stats_sub8=False,
):
    rest = list(rest)
    bias_ref = rest.pop(0) if bias_mode else None
    qseg_ref = rest.pop(0) if has_seg else None
    kseg_ref = rest.pop(0) if has_seg else None
    g_ref, lse_ref, delta_ref, dq_ref, acc_ref = rest

    bq, d = q_ref.shape
    bk = k_ref.shape[0]
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)
    q_pos0 = q_off_ref[0] + qi * bq * pos_stride
    k_pos0 = kv_off_ref[0] + kj * bk * pos_stride

    @pl.when(kj == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(_tile_visible(q_off_ref, kv_off_ref, qi, kj, bq, bk, causal, pos_stride))
    def _compute():
        q = q_ref[...]
        k = k_ref[...]
        v = v_ref[...]
        g = g_ref[...]
        lse_t, delta_t = lse_ref[...], delta_ref[...]
        if stats_sub8:
            lse_t, delta_t = _sub8_to_lanes(lse_t), _sub8_to_lanes(delta_t)
        lse = _lane_tile(lse_t, bk)      # [bq, bk]
        delta = _lane_tile(delta_t, bk)  # [bq, bk]
        logits = (
            lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
        logits = _add_bias(logits, bias_ref, bias_mode)
        q_seg = qseg_ref[:, 0] if has_seg else None
        k_seg = kseg_ref[0, :] if has_seg else None
        logits = _mask_logits(logits, q_pos0, k_pos0, bq, bk, q_seg, k_seg,
                              causal, pos_stride)
        p = jnp.where(logits > MASK_GUARD, jnp.exp(logits - lse), 0.0)
        dp = lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if attn_pdrop > 0.0:
            keep = _tile_keep(
                rng_ref, bh, q_pos0, k_pos0, p.shape, attn_pdrop,
                pos_stride,
            )
            dp = jnp.where(keep, dp * (1.0 / (1.0 - attn_pdrop)), 0.0)
        ds = p * (dp - delta) * scale
        acc_ref[...] += lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kj == nk - 1)
    def _finalize():
        dq_ref[...] = acc_ref[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_off_ref, kv_off_ref, rng_ref,
    q_ref, k_ref, v_ref, *rest,
    causal, scale, bias_mode, has_seg, pos_stride, attn_pdrop,
    group=1, nq=None, h_kv=None, stats_sub8=False,
):
    """dk/dv for one kv row. GQA (group > 1): the grid's first dim runs
    over b·h_kv KV rows and the inner dim enumerates (group member gi,
    q block qi) = (t // nq, t % nq), so all of a group's query heads
    accumulate into the SAME narrow dk/dv block in fp32 VMEM — the
    full-head expand/reduce the XLA wrapper needs never materializes
    (at 1M context that expand is a 2×1GiB bf16 + 2×2GiB fp32 transient,
    the single-chip width wall — NOTES.md round-3 1M ladder)."""
    rest = list(rest)
    bias_ref = rest.pop(0) if bias_mode else None
    qseg_ref = rest.pop(0) if has_seg else None
    kseg_ref = rest.pop(0) if has_seg else None
    g_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc_ref, dv_acc_ref = rest

    bk, d = k_ref.shape
    bq = q_ref.shape[0]
    bh = pl.program_id(0)
    kj = pl.program_id(1)
    t = pl.program_id(2)
    nt = pl.num_programs(2)
    if nq is None:
        nq = nt
    qi = t % nq
    if group > 1:
        # dropout keys by the QUERY head's fwd/dq program row b·h + qh
        gi = t // nq
        bh = (bh // h_kv) * (group * h_kv) + (bh % h_kv) * group + gi
    q_pos0 = q_off_ref[0] + qi * bq * pos_stride
    k_pos0 = kv_off_ref[0] + kj * bk * pos_stride

    @pl.when(t == 0)
    def _init():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    @pl.when(_tile_visible(q_off_ref, kv_off_ref, qi, kj, bq, bk, causal, pos_stride))
    def _compute():
        q = q_ref[...]
        k = k_ref[...]
        v = v_ref[...]
        g = g_ref[...]
        lse_t, delta_t = lse_ref[...], delta_ref[...]
        if stats_sub8:
            lse_t, delta_t = _sub8_to_lanes(lse_t), _sub8_to_lanes(delta_t)
        lse = _lane_tile(lse_t, bk)      # [bq, bk]
        delta = _lane_tile(delta_t, bk)  # [bq, bk]
        logits = (
            lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
        logits = _add_bias(logits, bias_ref, bias_mode)
        q_seg = qseg_ref[:, 0] if has_seg else None
        k_seg = kseg_ref[0, :] if has_seg else None
        logits = _mask_logits(logits, q_pos0, k_pos0, bq, bk, q_seg, k_seg,
                              causal, pos_stride)
        p = jnp.where(logits > MASK_GUARD, jnp.exp(logits - lse), 0.0)
        p_acc = p
        if attn_pdrop > 0.0:
            keep = _tile_keep(
                rng_ref, bh, q_pos0, k_pos0, p.shape, attn_pdrop,
                pos_stride,
            )
            inv = 1.0 / (1.0 - attn_pdrop)
            p_acc = jnp.where(keep, p * inv, 0.0)
        dv_acc_ref[...] += lax.dot_general(
            p_acc.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if attn_pdrop > 0.0:
            dp = jnp.where(keep, dp * inv, 0.0)
        ds = p * (dp - delta) * scale
        dk_acc_ref[...] += lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == nt - 1)
    def _finalize():
        dk_ref[...] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc_ref[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _pick_block(size, preferred, cap, step=8):
    # cap: the f32 logits tile is block_q×block_k×4B and must fit VMEM
    # alongside the q/k/v/acc blocks (2048² would need 16MB alone).
    # Search EVERY step-aligned divisor descending from the preference:
    # the old halve-only search returned the WHOLE extent for sizes with
    # no power-of-two divisor ≥128 (e.g. 32800 = 2^5·5²·41 from a
    # 32768+32 admission bucket), which windows the full sequence into
    # VMEM — observed as a scoped-allocation compile failure at 32K and,
    # round-1, as ~1G of register spills.
    # step: the hardware alignment of the dimension the block tiles.
    # Query blocks live in the SUBLANE dimension (step=8); kv blocks live
    # in the LANE dimension, where every _lane_tile broadcast requires a
    # multiple of NUM_LANES (step=128) — an 8-aligned pick like 704 for a
    # 4224-long video prefix trips the kernel's lane assert.
    preferred = min(preferred, cap)
    if preferred >= size:
        return size
    start = preferred - preferred % step
    for b in range(start, step - 1, -step):
        if size % b == 0:
            return b
    if step == 8:
        return size  # degenerate 8-aligned extent: window it whole
    # no step-aligned divisor < size: the extent itself must satisfy the
    # lane alignment (callers guard skv % 128); window it whole
    return size


def _fold_heads(x):
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _unfold_heads(x, b, h):
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _prep_inputs(q, k, v, bias, q_seg, kv_seg, kv_head_major=False):
    """Fold heads and normalize the bias to one of the kernel's modes:
    mode 1 per-key [b·g, 1, skv]; mode 2 full tile [b·g, sq, skv]
    (g = h when the bias is per-head, else 1). Any broadcastable
    [b|1, h|1, sq|1, skv] additive bias (§2.7 contract) is accepted.

    kv_head_major: k/v arrive [b, h_kv, skv, d] (the KV cache's storage
    layout) and fold by pure reshape. The seq-major fold's transpose is
    not free at cache scale: XLA materializes it as a tiled copy whose
    lane dimension is the HEAD count — a 6-head fp32 32K cache pads
    21.3x (108MB → 2.25G per layer per k/v; OOM'd round-3 eval_needle)."""
    b, sq, h, d = q.shape
    if kv_head_major:
        skv = k.shape[2]
        qf = _fold_heads(q)
        kf = k.reshape(k.shape[0] * k.shape[1], skv, d)
        vf = v.reshape(v.shape[0] * v.shape[1], skv, d)
    else:
        skv = k.shape[1]
        qf, kf, vf = _fold_heads(q), _fold_heads(k), _fold_heads(v)
    has_seg = q_seg is not None
    bias_b, bias_mode, bias_per_head = None, 0, False
    if bias is not None:
        assert bias.ndim == 4, bias.shape
        bb, bh, bsq, bskv = bias.shape
        assert bskv == skv and bb in (1, b) and bh in (1, h) and bsq in (1, sq), (
            f"bias {bias.shape} not broadcastable to [{b},{h},{sq},{skv}]"
        )
        bias_per_head = bh == h
        g = h if bias_per_head else 1
        bias_b = jnp.broadcast_to(
            bias.astype(jnp.float32), (b, g, bsq, skv)
        ).reshape(b * g, bsq, skv)
        bias_mode = 1 if bsq == 1 else 2
    qseg_b = kseg_b = None
    if has_seg:
        qseg_b = lax.broadcast_in_dim(
            q_seg.astype(jnp.int32), (b, sq, NUM_LANES), (0, 1)
        )
        kseg_b = lax.broadcast_in_dim(
            kv_seg.astype(jnp.int32), (b, NUM_SUBLANES, skv), (0, 2)
        )
    return qf, kf, vf, bias_b, qseg_b, kseg_b, bias_mode, bias_per_head, has_seg


def _rep_sub8(x):
    """[b, h, s] row stats → [b·h, NUM_SUBLANES, s] (8× sublane
    replication — see _sub8_to_lanes for why not 128× lanes)."""
    b, h, s = x.shape
    return lax.broadcast_in_dim(
        x.astype(jnp.float32).reshape(b * h, s),
        (b * h, NUM_SUBLANES, s), (0, 2),
    )


def _rep_lanes(x):
    """[b, h, s] row stats → [b·h, s, NUM_LANES] (the official kernel's
    lane replication: zero in-kernel relayout, 512 B/row/array — used
    while the stats stay small; see flash_attention_bwd_pallas)."""
    b, h, s = x.shape
    return lax.broadcast_in_dim(
        x.astype(jnp.float32).reshape(b * h, s), (b * h, s, NUM_LANES), (0, 1)
    )


def _kv_index_maps(h, bq, bk, causal, pos_stride=1, bias_per_head=False,
                   kv_heads=None):
    """Index maps for fwd/dq grids (bh, nq, nk): skipped tiles redirect
    their kv DMA to block 0 (no wasted bandwidth). Scalar-prefetch refs
    arrive as trailing args. kv_heads < h (GQA) routes query head
    bh % h to kv row (bh // h)·kv_heads + (bh % h) // group — the narrow
    cache is consumed in place, never materialized at h heads."""
    kv_heads = h if kv_heads is None else kv_heads
    group = h // kv_heads

    def visible(qi, kj, q_off, kv_off):
        if not causal:
            return kj
        return lax.select(
            kv_off[0] + kj * bk * pos_stride
            <= q_off[0] + ((qi + 1) * bq - 1) * pos_stride,
            kj,
            0,
        )

    def bsel(bh):
        return bh if bias_per_head else bh // h

    def kv_row(bh):
        if group == 1:
            return bh
        return (bh // h) * kv_heads + (bh % h) // group

    def kv_map(bh, qi, kj, q_off, kv_off, *_):
        return (kv_row(bh), visible(qi, kj, q_off, kv_off), 0)

    def bias_map(bh, qi, kj, q_off, kv_off, *_):  # per-key bias [b·g, 1, skv]
        return (bsel(bh), 0, visible(qi, kj, q_off, kv_off))

    def bias_full_map(bh, qi, kj, q_off, kv_off, *_):  # full bias [b·g, sq, skv]
        return (bsel(bh), qi, visible(qi, kj, q_off, kv_off))

    def kseg_map(bh, qi, kj, q_off, kv_off, *_):
        return (bh // h, 0, visible(qi, kj, q_off, kv_off))

    return kv_map, bias_map, bias_full_map, kseg_map


def _q_index_maps_dkv(h, bq, bk, causal, pos_stride=1):
    """Index maps for the dkv grid (bh, nk, nq): skipped tiles redirect
    their q-side DMAs to the last q block."""

    def visible(kj, qi, q_off, kv_off, nq_minus_1, *_):
        if not causal:
            return qi
        return lax.select(
            kv_off[0] + kj * bk * pos_stride
            <= q_off[0] + ((qi + 1) * bq - 1) * pos_stride,
            qi,
            nq_minus_1,
        )

    return visible


def _rng_operand(dropout_rng):
    """Key data → the [2] int32 scalar-prefetch operand (zeros when unused)."""
    if dropout_rng is None:
        return jnp.zeros((2,), jnp.int32)
    rng = jnp.asarray(dropout_rng).reshape(-1)[:2]
    return lax.bitcast_convert_type(rng, jnp.int32)


def flash_attention_fwd_pallas(
    q, k, v, bias=None, q_seg=None, kv_seg=None, *,
    causal=True, q_offset=0, kv_offset=0, pos_stride=1, scale=None,
    block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K, interpret=False,
    dropout_rng=None, attn_pdrop=0.0, kv_head_major=False, q_segments=None,
):
    """Returns (out [b,sq,h,d] in q.dtype, lse [b,h,sq] f32).

    k/v may carry fewer heads than q (GQA): the kv index map routes each
    query head's tiles to its group's kv row, so the narrow cache is
    streamed directly (serving prefill-over-cache AND training — the
    backward kernels accumulate the group in-kernel, see
    flash_attention_bwd_pallas).

    kv_head_major=True: k/v are [b, h_kv, skv, d] (cache storage layout,
    folded by free reshape — see _prep_inputs).

    q_segments: like the backward's (q rows are independent in the fwd, so
    this is a plain scan with out/lse written per segment) — the folded
    q / unfolded-out transients then scale with the segment, which matters
    because the REMATTED fwd replays inside the backward's peak. None =
    auto (same ~1 GiB fold threshold as the backward; env override
    LWM_PALLAS_FWD_QSEG, falling back to LWM_PALLAS_BWD_QSEG so the one
    knob still tunes both passes together)."""
    b, sq, h, d = q.shape
    if q_segments is None:
        env_seg = os.environ.get(
            "LWM_PALLAS_FWD_QSEG",
            os.environ.get("LWM_PALLAS_BWD_QSEG", "auto"),
        )
        if env_seg == "auto":
            fold_bytes = 2 * b * h * sq * d * q.dtype.itemsize
            # auto threshold: ~1 GiB folded pair. Measured both ways at
            # the edge cases: the 1M x h256 GQA rung NEEDS segmentation
            # (the worker dies unsegmented), while the r2-era 512K x
            # h512 MHA rung now over-commits WITH or WITHOUT it (its
            # whole-step plan grew ~1 GiB past the budget since r2) —
            # so the threshold stays where the 1M rungs are safe;
            # LWM_PALLAS_*_QSEG overrides for anything else
            desired = max(1, fold_bytes // (1 << 29))
        else:
            desired = int(env_seg)
        q_segments = 1
        if desired > 1:
            for nseg in range(int(desired), int(desired) * 4 + 1):
                if sq % nseg == 0 and (sq // nseg) % NUM_SUBLANES == 0:
                    q_segments = nseg
                    break
    if q_segments > 1:
        # explicit callers must pick a clean divisor: a ragged segment
        # would silently leave tail rows of out/lse at their init values
        assert sq % q_segments == 0, (
            f"q_segments={q_segments} does not divide sq={sq}"
        )
        assert (sq // q_segments) % NUM_SUBLANES == 0, (
            f"segment length {sq // q_segments} not a multiple of "
            f"{NUM_SUBLANES} sublanes"
        )
        seg = sq // q_segments
        bias_has_q = bias is not None and bias.shape[-2] != 1

        def body(carry, i):
            out_c, lse_c = carry
            q0 = i * seg
            q_s = lax.dynamic_slice_in_dim(q, q0, seg, 1)
            bias_s = (
                lax.dynamic_slice_in_dim(bias, q0, seg, bias.ndim - 2)
                if bias_has_q else bias
            )
            qseg_s = (
                None if q_seg is None
                else lax.dynamic_slice_in_dim(q_seg, q0, seg, 1)
            )
            out_s, lse_s = flash_attention_fwd_pallas(
                q_s, k, v, bias_s, qseg_s, kv_seg,
                causal=causal, q_offset=q_offset + q0 * pos_stride,
                kv_offset=kv_offset, pos_stride=pos_stride, scale=scale,
                block_q=block_q, block_k=block_k, interpret=interpret,
                dropout_rng=dropout_rng, attn_pdrop=attn_pdrop,
                kv_head_major=kv_head_major, q_segments=1,
            )
            out_c = lax.dynamic_update_slice_in_dim(out_c, out_s, q0, axis=1)
            lse_c = lax.dynamic_update_slice_in_dim(lse_c, lse_s, q0, axis=2)
            return (out_c, lse_c), None

        out0 = jnp.zeros((b, sq, h, d), q.dtype)
        lse0 = jnp.full((b, h, sq), BIG_NEG, jnp.float32)
        (out, lse), _ = lax.scan(
            body, (out0, lse0), jnp.arange(q_segments)
        )
        return out, lse
    if kv_head_major:
        skv, h_kv = k.shape[2], k.shape[1]
    else:
        skv, h_kv = k.shape[1], k.shape[2]
    assert h % h_kv == 0, f"q heads {h} not a multiple of kv heads {h_kv}"
    scale = d ** -0.5 if scale is None else scale
    use_dropout = dropout_rng is not None and attn_pdrop > 0.0
    if not use_dropout:
        attn_pdrop = 0.0
    # dropout masks are element-keyed (global positions), so fwd and bwd
    # tile sizes are free to differ. bq is lane-aligned because it is the
    # LAST dim of the [8, bq] lse output block (an 8-aligned pick like
    # 1376 for a 33024-token video prompt fails Pallas lowering).
    bq = _pick_block(sq, block_q, DEFAULT_BLOCK_Q, step=NUM_LANES)
    bk = _pick_block(skv, block_k, DEFAULT_BLOCK_K, step=NUM_LANES)
    nq, nk = sq // bq, skv // bk

    qf, kf, vf, bias_b, qseg_b, kseg_b, bias_mode, bias_ph, has_seg = _prep_inputs(
        q, k, v, bias, q_seg, kv_seg, kv_head_major=kv_head_major
    )
    q_off = jnp.asarray([q_offset], jnp.int32)
    kv_off = jnp.asarray([kv_offset], jnp.int32)
    kv_map, bias_map, bias_full_map, kseg_map = _kv_index_maps(
        h, bq, bk, causal, pos_stride, bias_ph, kv_heads=h_kv
    )

    inputs = [qf, kf, vf]
    in_specs = [
        pl.BlockSpec((None, bq, d), lambda bh, qi, kj, *_: (bh, qi, 0)),
        pl.BlockSpec((None, bk, d), kv_map),
        pl.BlockSpec((None, bk, d), kv_map),
    ]
    if bias_mode == 1:
        inputs.append(bias_b)
        in_specs.append(pl.BlockSpec((None, 1, bk), bias_map))
    elif bias_mode == 2:
        inputs.append(bias_b)
        in_specs.append(pl.BlockSpec((None, bq, bk), bias_full_map))
    if has_seg:
        inputs += [qseg_b, kseg_b]
        in_specs += [
            pl.BlockSpec(
                (None, bq, NUM_LANES), lambda bh, qi, kj, *_: (bh // h, qi, 0)
            ),
            pl.BlockSpec((None, NUM_SUBLANES, bk), kseg_map),
        ]
    kernel = functools.partial(
        _fwd_kernel, causal=causal, scale=scale,
        bias_mode=bias_mode, has_seg=has_seg, pos_stride=pos_stride,
        attn_pdrop=attn_pdrop,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b * h, nq, nk),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((None, bq, d), lambda bh, qi, kj, *_: (bh, qi, 0)),
                pl.BlockSpec(
                    (None, NUM_SUBLANES, bq), lambda bh, qi, kj, *_: (bh, 0, qi)
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, d), jnp.float32),           # acc
                pltpu.VMEM((bq, NUM_LANES), jnp.float32),   # m
                pltpu.VMEM((bq, NUM_LANES), jnp.float32),   # l
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, NUM_SUBLANES, sq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_off, kv_off, _rng_operand(dropout_rng if use_dropout else None), *inputs)

    return _unfold_heads(out, b, h), lse[:, 0, :].reshape(b, h, sq)


def flash_attention_bwd_pallas(
    q, k, v, g, lse, delta, bias=None, q_seg=None, kv_seg=None, *,
    causal=True, q_offset=0, kv_offset=0, pos_stride=1, scale=None,
    block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K, interpret=False,
    dropout_rng=None, attn_pdrop=0.0, q_segments=None,
):
    """Returns (dq, dk, dv) in input dtypes. lse/delta: [b, h, sq] f32.

    q_segments > 1 runs the backward as a lax.scan over q row segments:
    per-segment dq concatenates, dk/dv accumulate in an fp32 carry. The
    folded q/g operands and stats transients then scale with the SEGMENT
    length, not sq — worth ~3 GiB at 1M×h512 where the whole-sq backward
    over-commits HBM. None = auto: segment only once the folded q/g pair
    would exceed ~1 GiB (LWM_PALLAS_BWD_QSEG overrides: an integer, or
    'auto'). Grid work is unchanged (causally-skipped tiles already cost
    ~nothing); the extra cost is nseg re-streams of the narrow kv in the
    dkv pass and the fp32 dk/dv carry read-modify-write per segment.
    """
    b, sq, h, d = q.shape
    if q_segments is None:
        env_seg = os.environ.get("LWM_PALLAS_BWD_QSEG", "auto")
        if env_seg == "auto":
            fold_bytes = 2 * b * h * sq * d * q.dtype.itemsize
            # auto threshold: ~1 GiB folded pair. Measured both ways at
            # the edge cases: the 1M x h256 GQA rung NEEDS segmentation
            # (the worker dies unsegmented), while the r2-era 512K x
            # h512 MHA rung now over-commits WITH or WITHOUT it (its
            # whole-step plan grew ~1 GiB past the budget since r2) —
            # so the threshold stays where the 1M rungs are safe;
            # LWM_PALLAS_*_QSEG overrides for anything else
            desired = max(1, fold_bytes // (1 << 29))
        else:
            desired = int(env_seg)
        q_segments = 1
        if desired > 1:
            for nseg in range(int(desired), int(desired) * 4 + 1):
                if sq % nseg == 0 and (sq // nseg) % NUM_SUBLANES == 0:
                    q_segments = nseg
                    break
    if q_segments <= 1:
        return _flash_attention_bwd_single(
            q, k, v, g, lse, delta, bias, q_seg, kv_seg,
            causal=causal, q_offset=q_offset, kv_offset=kv_offset,
            pos_stride=pos_stride, scale=scale, block_q=block_q,
            block_k=block_k, interpret=interpret, dropout_rng=dropout_rng,
            attn_pdrop=attn_pdrop,
        )

    skv, h_kv = k.shape[1], k.shape[2]
    # explicit callers must pick a clean divisor: a ragged segment would
    # silently zero the dq tail and drop those rows' dk/dv contributions
    assert sq % q_segments == 0, (
        f"q_segments={q_segments} does not divide sq={sq}"
    )
    assert (sq // q_segments) % NUM_SUBLANES == 0, (
        f"segment length {sq // q_segments} not a multiple of "
        f"{NUM_SUBLANES} sublanes"
    )
    seg = sq // q_segments
    bias_has_q = bias is not None and bias.shape[-2] != 1

    def body(carry, i):
        dq_c, dk_c, dv_c = carry
        q0 = i * seg
        q_s = lax.dynamic_slice_in_dim(q, q0, seg, 1)
        g_s = lax.dynamic_slice_in_dim(g, q0, seg, 1)
        lse_s = lax.dynamic_slice_in_dim(lse, q0, seg, 2)
        delta_s = lax.dynamic_slice_in_dim(delta, q0, seg, 2)
        bias_s = (
            lax.dynamic_slice_in_dim(bias, q0, seg, bias.ndim - 2)
            if bias_has_q else bias
        )
        qseg_s = (
            None if q_seg is None
            else lax.dynamic_slice_in_dim(q_seg, q0, seg, 1)
        )
        # dkv_dtype=f32 for NARROW (GQA) kv: each segment's dk/dv leave
        # the kernel unrounded so the carry sum matches the single-shot
        # fp32 VMEM accumulation (with bf16 kv the per-segment round-trip
        # otherwise makes segmented grads diverge from unsegmented).
        # Gated on h_kv < h because at MHA width the fp32 pair doubles a
        # full-width buffer inside the backward's peak (2x2 GiB at
        # 512K x h1024); MHA keeps the historical bf16-rounded carries.
        dq_s, dk_s, dv_s = _flash_attention_bwd_single(
            q_s, k, v, g_s, lse_s, delta_s, bias_s, qseg_s, kv_seg,
            causal=causal, q_offset=q_offset + q0 * pos_stride,
            kv_offset=kv_offset, pos_stride=pos_stride, scale=scale,
            block_q=block_q, block_k=block_k, interpret=interpret,
            dropout_rng=dropout_rng, attn_pdrop=attn_pdrop,
            dkv_dtype=jnp.float32 if h_kv < h else None,
        )
        # write the segment into a carried full-size dq (in-place update
        # slice — a scan-stacked ys would cost an extra full-dq buffer
        # plus a transpose copy at these sizes)
        dq_c = lax.dynamic_update_slice_in_dim(dq_c, dq_s, q0, axis=1)
        return (dq_c, dk_c + dk_s, dv_c + dv_s), None

    dk0 = jnp.zeros((b, skv, h_kv, d), jnp.float32)
    dq0 = jnp.zeros((b, sq, h, d), q.dtype)
    (dq, dk, dv), _ = lax.scan(
        body, (dq0, dk0, jnp.zeros_like(dk0)), jnp.arange(q_segments)
    )
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _flash_attention_bwd_single(
    q, k, v, g, lse, delta, bias=None, q_seg=None, kv_seg=None, *,
    causal=True, q_offset=0, kv_offset=0, pos_stride=1, scale=None,
    block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K, interpret=False,
    dropout_rng=None, attn_pdrop=0.0, dkv_dtype=None,
):
    """One-shot (whole-sq) backward. lse/delta: [b, h, sq] f32.

    dkv_dtype overrides the dk/dv output dtype (default: k/v dtypes) —
    the segmented backward passes f32 so its cross-segment carry sum
    stays rounding-free.

    k/v may carry fewer heads than q (GQA): dq streams the narrow kv rows
    through the same index maps as the forward, and dk/dv run on a
    (b·h_kv, nk, group·nq) grid whose inner dimension enumerates every
    (group member, q block) pair so the whole group accumulates into ONE
    narrow dk/dv block in fp32 VMEM. dk/dv return at h_kv heads. The
    expanded-kv transient this replaces (2× bf16 kv + 2× fp32 grads at h
    heads) was the single-chip memory wall at 1M context (NOTES.md
    round-3 1M ladder)."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    h_kv = k.shape[2]
    assert h % h_kv == 0, f"q heads {h} not a multiple of kv heads {h_kv}"
    group = h // h_kv
    scale = d ** -0.5 if scale is None else scale
    use_dropout = dropout_rng is not None and attn_pdrop > 0.0
    if not use_dropout:
        attn_pdrop = 0.0
    # bq lane-aligned: with sublane-replicated stats the [8, bq] blocks
    # put bq in the lane dimension (same constraint as the fwd lse)
    bq = _pick_block(sq, block_q, DEFAULT_BLOCK_Q_BWD, step=NUM_LANES)
    bk = _pick_block(skv, block_k, DEFAULT_BLOCK_K_BWD, step=NUM_LANES)
    nq, nk = sq // bq, skv // bk
    rng_op = _rng_operand(dropout_rng if use_dropout else None)

    qf, kf, vf, bias_b, qseg_b, kseg_b, bias_mode, bias_ph, has_seg = _prep_inputs(
        q, k, v, bias, q_seg, kv_seg
    )
    gf = _fold_heads(g)
    # stats layout: lane-replicated reads cost zero in-kernel work but
    # 512 B/row/array of HBM; past ~1 GiB for the pair (the extreme-context
    # regime: 1M × 8 heads would be 2 × 4 GiB — the round-4 OOM's top two
    # allocations) switch to the splash-style sublane replication
    # (16× smaller, ~2-4% kernel-side relayout cost).
    env_sub8 = os.environ.get("LWM_PALLAS_STATS_SUB8", "auto")
    if env_sub8 == "auto":
        stats_sub8 = 2 * b * h * sq * NUM_LANES * 4 > (1 << 30)
    else:
        stats_sub8 = env_sub8 == "1"
    rep = _rep_sub8 if stats_sub8 else _rep_lanes
    lse_r = rep(lse)
    delta_r = rep(delta)
    q_off = jnp.asarray([q_offset], jnp.int32)
    kv_off = jnp.asarray([kv_offset], jnp.int32)

    # ---- dq: grid (bh, nq, nk), dq block resident across kj ----
    kv_map, bias_map, bias_full_map, kseg_map = _kv_index_maps(
        h, bq, bk, causal, pos_stride, bias_ph, kv_heads=h_kv
    )
    dq_inputs = [qf, kf, vf]
    dq_specs = [
        pl.BlockSpec((None, bq, d), lambda bh, qi, kj, *_: (bh, qi, 0)),
        pl.BlockSpec((None, bk, d), kv_map),
        pl.BlockSpec((None, bk, d), kv_map),
    ]
    if bias_mode == 1:
        dq_inputs.append(bias_b)
        dq_specs.append(pl.BlockSpec((None, 1, bk), bias_map))
    elif bias_mode == 2:
        dq_inputs.append(bias_b)
        dq_specs.append(pl.BlockSpec((None, bq, bk), bias_full_map))
    if has_seg:
        dq_inputs += [qseg_b, kseg_b]
        dq_specs += [
            pl.BlockSpec(
                (None, bq, NUM_LANES), lambda bh, qi, kj, *_: (bh // h, qi, 0)
            ),
            pl.BlockSpec((None, NUM_SUBLANES, bk), kseg_map),
        ]
    dq_inputs += [gf, lse_r, delta_r]
    if stats_sub8:
        stat_spec = pl.BlockSpec(
            (None, NUM_SUBLANES, bq), lambda bh, qi, kj, *_: (bh, 0, qi)
        )
    else:
        stat_spec = pl.BlockSpec(
            (None, bq, NUM_LANES), lambda bh, qi, kj, *_: (bh, qi, 0)
        )
    dq_specs += [
        pl.BlockSpec((None, bq, d), lambda bh, qi, kj, *_: (bh, qi, 0)),
        stat_spec,
        stat_spec,
    ]
    dq_kernel = functools.partial(
        _bwd_dq_kernel, causal=causal, scale=scale,
        bias_mode=bias_mode, has_seg=has_seg, pos_stride=pos_stride,
        attn_pdrop=attn_pdrop, stats_sub8=stats_sub8,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b * h, nq, nk),
            in_specs=dq_specs,
            out_specs=pl.BlockSpec(
                (None, bq, d), lambda bh, qi, kj, *_: (bh, qi, 0)
            ),
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_off, kv_off, rng_op, *dq_inputs)

    # ---- dk/dv: grid (b·h_kv, nk, group·nq) — one program row per NARROW
    # kv row; the inner dim t enumerates (group member gi, q block qi) =
    # (t // nq, t % nq) so the group's dk/dv accumulate in place ----
    visible_q = _q_index_maps_dkv(h, bq, bk, causal, pos_stride)

    def q_row(bh, t):
        # query-head program row b·h + qh for (kv row bh, group member t//nq)
        if group == 1:
            return bh
        return (bh // h_kv) * h + (bh % h_kv) * group + t // nq

    def q_map(bh, kj, t, q_off_, kv_off_, *_):
        return (q_row(bh, t), visible_q(kj, t % nq, q_off_, kv_off_, nq - 1), 0)

    if stats_sub8:
        def stat_map(bh, kj, t, q_off_, kv_off_, *_):
            return (
                q_row(bh, t), 0,
                visible_q(kj, t % nq, q_off_, kv_off_, nq - 1),
            )

        dkv_stat_spec = pl.BlockSpec((None, NUM_SUBLANES, bq), stat_map)
    else:
        dkv_stat_spec = pl.BlockSpec((None, bq, NUM_LANES), q_map)

    def qseg_map(bh, kj, t, q_off_, kv_off_, *_):
        return (bh // h_kv, visible_q(kj, t % nq, q_off_, kv_off_, nq - 1), 0)

    def bias_bsel(bh, t):
        return q_row(bh, t) if bias_ph else bh // h_kv

    dkv_inputs = [qf, kf, vf]
    dkv_specs = [
        pl.BlockSpec((None, bq, d), q_map),
        pl.BlockSpec((None, bk, d), lambda bh, kj, qi, *_: (bh, kj, 0)),
        pl.BlockSpec((None, bk, d), lambda bh, kj, qi, *_: (bh, kj, 0)),
    ]
    if bias_mode == 1:
        dkv_inputs.append(bias_b)
        dkv_specs.append(
            pl.BlockSpec(
                (None, 1, bk), lambda bh, kj, t, *_: (bias_bsel(bh, t), 0, kj)
            )
        )
    elif bias_mode == 2:
        dkv_inputs.append(bias_b)
        dkv_specs.append(
            pl.BlockSpec(
                (None, bq, bk),
                lambda bh, kj, t, q_off_, kv_off_, *_: (
                    bias_bsel(bh, t),
                    visible_q(kj, t % nq, q_off_, kv_off_, nq - 1),
                    kj,
                ),
            )
        )
    if has_seg:
        dkv_inputs += [qseg_b, kseg_b]
        dkv_specs += [
            pl.BlockSpec((None, bq, NUM_LANES), qseg_map),
            pl.BlockSpec(
                (None, NUM_SUBLANES, bk), lambda bh, kj, t, *_: (bh // h_kv, 0, kj)
            ),
        ]
    dkv_inputs += [gf, lse_r, delta_r]
    dkv_specs += [
        pl.BlockSpec((None, bq, d), q_map),
        dkv_stat_spec,
        dkv_stat_spec,
    ]
    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, causal=causal, scale=scale,
        bias_mode=bias_mode, has_seg=has_seg, pos_stride=pos_stride,
        attn_pdrop=attn_pdrop, group=group, nq=nq, h_kv=h_kv,
        stats_sub8=stats_sub8,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b * h_kv, nk, group * nq),
            in_specs=dkv_specs,
            out_specs=[
                pl.BlockSpec((None, bk, d), lambda bh, kj, qi, *_: (bh, kj, 0)),
                pl.BlockSpec((None, bk, d), lambda bh, kj, qi, *_: (bh, kj, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, d), jnp.float32),
                pltpu.VMEM((bk, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h_kv, skv, d), dkv_dtype or k.dtype),
            jax.ShapeDtypeStruct((b * h_kv, skv, d), dkv_dtype or v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_off, kv_off, rng_op, *dkv_inputs)

    return (
        _unfold_heads(dq, b, h),
        _unfold_heads(dk, b, h_kv),
        _unfold_heads(dv, b, h_kv),
    )
