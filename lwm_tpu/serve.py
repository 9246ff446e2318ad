"""In-flight (continuous) batching serving driver.

The static-batch serving loop (benchmarks/decode_bench.py, HF generate)
locksteps a batch: every row prefills together, decodes together, and the
batch ends when the LAST row finishes — short requests pay for long
ones, and nothing new starts until the whole batch drains. Production
serving wants the vLLM-style alternative: a fixed pool of cache SLOTS,
each slot at its own depth, with requests admitted into free slots the
moment they open. That needs exactly one model capability the lockstep
loop doesn't: decode-time cache writes at a PER-ROW position. With
`LLaMAConfig(decode_index='per_row')` the attention layer writes each
row's k/v at `position_ids[:, 0]` (models/llama.py
`_concatenate_to_cache`) instead of the shared `cache_index`; everything
else was already per-row (the rotary gather takes per-row positions, the
decode masks take a per-key [b, T] mask, the Pallas flash-decoding
kernel takes per-row masks over the cache).

Design (all device work in TWO jitted programs, reused across the run):
- prefill(params, cache, ids[1, B], true_len, slot): runs the bucketed
  prompt through the model on a fresh batch-1 cache (the normal
  prefill-over-cache path, q_offset = 0), scatters that cache into the
  pool at `slot`, and returns the last real token's logits. One call per
  admission; B is a static bucket (powers-of-two retrace, like any
  serving system's shape buckets).
- decode(params, cache, tok[S], lengths[S], tau[S], rng): ONE step for
  all slots together. position_ids = lengths per row; attention mask =
  arange(T) <= length per row; the shared `cache_index` is set to
  max(lengths) inside the program (it only feeds the decode causal
  frontier and the kernel's block-skip bound, both of which need an
  upper bound, not an exact per-row value — the per-row mask does the
  exact part). tau[s] > 0 samples at that temperature; tau[s] == 0 is
  greedy. Inactive slots ride along at length 0 (one masked key) —
  their cost is one cache-line of the pool per layer.

Correctness contract (tested): a request served in-flight — admitted
into a half-busy pool, decoding next to slots at other depths — emits
exactly the tokens of a standalone batch-1 greedy/sampled rollout.
Right-padded slot layout: positions [0, len) are always real data
(prompt, then one decode write per step at position = length), so the
`arange <= length` mask never exposes garbage; bucket-padding junk
beyond the prompt is overwritten by decode writes before the mask
frontier reaches it.

The host loop (submit/step) holds the scheduler: admission, stop
tokens, per-request budgets. One device sync per step (the emitted
tokens feed the stop checks); amortize with more slots, not deeper
pipelining — decode is bandwidth-bound, so slots are nearly free until
the weight stream stops dominating (see docs/serving.md).

Reference parity note: the reference (LargeWorldModel/LWM) has no
serving runtime beyond batch generate; this subsystem is
beyond-reference. Composes with int8 KV cache, GQA, and int8 weights
(quant_dense) — the per-row write covers the quantized scales too.
"""

from __future__ import annotations

import os
import time as _time
from collections import deque
from contextlib import nullcontext
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds the largest bucket {buckets[-1]}")


def _set_cache_index(cache, value):
    def visit(path, leaf):
        if any(getattr(p, "key", None) == "cache_index" for p in path):
            return jnp.asarray(value, jnp.int32)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, cache)


def _slot_cache_shardings(cache, mesh):
    """NamedShardings for an sp-sharded slot pool: head-major [S, h, T, d]
    KV shards slots over (dp, fsdp), kv heads over tp, the SEQUENCE over
    sp; int8 scales [S, h, T] ride the same axes; cache_index replicates.
    Matches the model's decode read specs (models/llama.py
    _inference_attn) and the sp-routed per-row write."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as _PS

    def visit(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        if name in ("cached_key", "cached_value"):
            spec = _PS(("dp", "fsdp"), "tp", "sp", None)
        elif name in ("cached_key_scale", "cached_value_scale"):
            spec = _PS(("dp", "fsdp"), "tp", "sp")
        else:  # cache_index (prefix pools never take this path)
            spec = _PS()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(visit, cache)


def _is_vision_model(model):
    """VideoLLaMA-family modules take vision_masks before attention_mask."""
    import inspect

    return "vision_masks" in inspect.signature(
        type(model.module).__call__
    ).parameters


def _mk_apply(model):
    """Signature adapter: one positional-call shape for LLaMA and
    VideoLLaMA modules (suffix tokens are text — vision content lives in
    the shared prefix, built with its own vision_masks)."""
    vision = _is_vision_model(model)

    def apply_(variables, ids, mask, pos, vision_masks=None):
        if vision:
            vm = (
                vision_masks if vision_masks is not None
                else jnp.zeros(ids.shape, bool)
            )
            return model.module.apply(
                variables, ids, vm, mask, None, pos,
                True, False, False, False, True, mutable=["cache"],
            )
        return model.module.apply(
            variables, ids, mask, None, pos,
            True, False, False, False, True, mutable=["cache"],
        )

    return apply_


def _lookup_proposal(ctx, k, ngram):
    """Draft-free speculation proposal: the k tokens that followed the
    most recent EARLIER occurrence of ctx's trailing ngram (prompt-lookup
    decoding, host-side numpy twin of speculative.prompt_lookup_generate).
    Returns an int32 [k] array, or None when the tail never recurs."""
    L = ctx.shape[0]
    if L < ngram + 1:
        return None
    tail = ctx[L - ngram:]
    win = np.lib.stride_tricks.sliding_window_view(ctx, ngram)
    hit = np.flatnonzero((win == tail).all(1))
    hit = hit[hit < L - ngram]       # proper earlier occurrences only
    if hit.size == 0:
        return None
    s = int(hit[-1]) + ngram
    prop = ctx[s: s + k].astype(np.int32)
    if prop.shape[0] < k:
        prop = np.concatenate(
            [prop, np.full(k - prop.shape[0], ctx[-1], np.int32)]
        )
    return prop


def _is_prefix_leaf(path):
    return any(
        str(getattr(p, "key", "")).startswith("prefix_") for p in path
    )


def _graft_prefix(dst_cache, src_cache):
    """Copy prefix_* leaves from src into dst (same tree structure —
    prefix blocks are batch-1 regardless of the cache's slot count)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, d, s: s if _is_prefix_leaf(p) else d, dst_cache, src_cache
    )


def _inject_prefix(pool_cache, built_cache):
    """Fill the pool's zero prefix_* variables from a prefix-builder
    cache's cached_* (built by an ordinary batch-1 prefill — including
    int8 quantization + scales, which ride along by name:
    prefix_key ← cached_key, prefix_key_scale ← cached_key_scale, …)."""
    def walk(dst, src):
        out = {}
        for k, v in dst.items():
            if isinstance(v, dict):
                out[k] = walk(v, src[k])
            elif k.startswith("prefix_"):
                out[k] = src["cached_" + k[len("prefix_"):]]
            else:
                out[k] = v
        return out

    import flax.core

    return walk(
        flax.core.unfreeze(pool_cache), flax.core.unfreeze(built_cache)
    )


def save_prefix_cache(path, cache, P_store, P_true):
    """Persist a built prefix KV block (a document index: the expensive
    one-time prefill survives server restarts). Streams leaf-at-a-time
    through the checkpointer's chunked writer."""
    from lwm_tpu.checkpoint import StreamingCheckpointer

    StreamingCheckpointer.save_train_state_to_file(
        dict(
            prefix=cache,
            prefix_store=np.asarray(P_store, np.int32),
            prefix_tokens=np.asarray(P_true, np.int32),
        ),
        path,
    )


def load_prefix_cache(path):
    """Inverse of save_prefix_cache → (cache_tree, P_store, P_true)."""
    from lwm_tpu.checkpoint import StreamingCheckpointer

    tree = StreamingCheckpointer.load_checkpoint(path)
    return (
        tree["prefix"],
        int(tree["prefix_store"]),
        int(tree["prefix_tokens"]),
    )


def build_prefix_cache(model, params, prefix_ids, chunk=2048,
                       prefix_vision_masks=None, mesh=None):
    """Prefill a shared prefix ONCE into a frozen batch-1 KV block.

    Runs an ordinary chunked prefill (static chunk shapes, one compiled
    program reused across chunks) through a prefix_len=0 clone of the
    model, so the block inherits everything the cache layer does —
    head-major layout, GQA-narrow heads, int8 quantization. For
    VideoLLaMA models, prefix_vision_masks marks which prefix tokens are
    VQ codes (embedded through vte) — the video IS the shared prefix.
    Returns (cache_tree, P_store, P_true): P_store is P_true padded up
    to a kernel-friendly multiple of 128; pad rows are causally dead
    during the build and masked out of reads by config.prefix_tokens.
    """
    import copy as _copy

    prefix_ids = np.asarray(prefix_ids, np.int32).reshape(-1)
    P_true = int(prefix_ids.shape[0])
    P_store = -(-P_true // 128) * 128
    cfg = _copy.deepcopy(model.config)
    cfg.update(dict(
        decode_index="shared", prefix_len=0, prefix_tokens=0,
        # tp-sharded pools build their prefix ON the mesh (the params are
        # already sharded; a single-device build would OOM for the models
        # that need tp in the first place); unsharded pools build locally
        mesh_dim=model.config.mesh_dim if mesh is not None else None,
        # chunking already bounds prefill memory — keep every chunk on the
        # prefill-over-cache path (the ring path wants full sequences);
        # impl resolves by backend (a forced 'pallas' serving config must
        # not force the builder's prefill kernel on a CPU host)
        scan_attention=False, attn_impl="auto",
        max_sequence_length=max(cfg.max_sequence_length, P_store),
    ))
    builder = type(model)(
        cfg, input_shape=(1, 16), seed=0, dtype=model.dtype, _do_init=False
    )
    apply_ = _mk_apply(builder)
    ctx = mesh if mesh is not None else nullcontext()
    with ctx:
        cache = builder.init_cache(1, P_store)
    chunk = int(min(chunk, P_store))
    padded = -(-P_true // chunk) * chunk
    ids = np.zeros(padded, np.int32)
    ids[:P_true] = prefix_ids
    vmask = np.zeros(padded, bool)
    if prefix_vision_masks is not None:
        vmask[:P_true] = np.asarray(prefix_vision_masks, bool).reshape(-1)

    @jax.jit
    def step(params, cache, chunk_ids, chunk_vm, done):
        # keys valid through this chunk's end; intra-chunk causality and
        # the write offset come from the model's cache_index machinery
        mask = (jnp.arange(P_store)[None] < done + chunk).astype("i4")
        pos = (jnp.arange(chunk, dtype="i4") + done)[None]
        _, vars_ = apply_(
            {"params": params, "cache": cache},
            chunk_ids[None], mask, pos, vision_masks=chunk_vm[None],
        )
        return vars_["cache"]

    done = 0
    for i in range(0, padded, chunk):
        with ctx:
            cache = step(
                params, cache, jnp.asarray(ids[i: i + chunk]),
                jnp.asarray(vmask[i: i + chunk]),
                jnp.asarray(done, jnp.int32),
            )
        done += chunk
    return cache, P_store, P_true


@dataclass
class _Live:
    req_id: int
    emitted: list
    max_new: int
    temperature: float
    prompt: np.ndarray = None
    on_token: Optional[callable] = None


@dataclass
class Finished:
    req_id: int
    prompt: np.ndarray
    tokens: np.ndarray          # emitted tokens (stop token included if hit)
    stopped: str                # 'eos' | 'length' | 'cancelled'


class InflightServer:
    """Continuous-batching server over a fixed slot pool.

    model: FlaxLLaMAForCausalLM built with decode_index='per_row'
    (scan_layers=False serving layout recommended; see docs/serving.md).
    """

    def __init__(
        self,
        model,
        params,
        *,
        slots: int = 8,
        cache_len: int = 4096,
        prompt_buckets=(128, 512, 2048),
        stop_tokens=(),
        seed: int = 0,
        mesh=None,
        prefix_ids=None,
        prefix_chunk: int = 2048,
        prefix_vision_masks=None,
        prefix_cache_path: str = "",
        lookup_k: int = 0,
        lookup_ngram: int = 3,
        admit_chunk: int = 0,
    ):
        """mesh: optional jax.sharding.Mesh for sharded serving (tp for
        big models, dp/fsdp for slot throughput). With sp>1, the shared
        PREFIX shards over sp when one is given; otherwise each SLOT's
        suffix cache shards over sp (long per-request contexts — decode
        and the 1+lookup_k speculative verify both route writes per
        row/token to the owning shard). Pass params already
        sharded by the model's partition rules; the pool cache and
        activations follow by GSPMD propagation.

        prefix_ids: optional shared context (document / video tokens)
        every request decodes against. It is prefilled ONCE into a frozen
        batch-1 KV block (chunked by prefix_chunk); each slot's cache
        holds only its own suffix, prompts are suffix-only, and attention
        merges [prefix ++ suffix] exactly by flash partials (ops/prefix.py).
        Admission cost and per-slot cache HBM stop scaling with the
        document length.

        admit_chunk > 0 turns on CHUNKED ADMISSION (Sarathi-style): a
        long prompt prefills admit_chunk tokens per step() into a
        staging cache, with the pool's decode round running BETWEEN
        chunks — running requests never stall longer than one chunk.
        Prompts longer than the largest bucket are accepted in this
        mode (one compiled program per chunk size, any prompt length).

        lookup_k > 0 turns on IN-FLIGHT prompt-lookup speculation: each
        greedy slot proposes the k tokens that followed the latest
        earlier occurrence of its trailing lookup_ngram in its own
        context ([prefix +] prompt + emitted), and one widened decode
        step (q = 1+k, per-row block writes + per-row causal masks)
        verifies every slot at once. Emitted tokens are exactly the
        target's greedy choices for ANY proposals; sampled (tau > 0)
        rows ride along unspeculated. Decode is HBM-bound on TPU, so the
        verify width is nearly free and the speedup ≈ mean accepted
        length on quoting workloads (document QA over a shared prefix —
        the natural pairing). Costs k extra cache rows of headroom."""
        if getattr(model.config, "decode_index", "shared") != "per_row":
            raise ValueError(
                "InflightServer needs LLaMAConfig(decode_index='per_row') — "
                "slots decode at different depths in one batch"
            )
        if _is_vision_model(model) and (
            getattr(model.config, "sample_mode", "text") != "text"
        ):
            raise ValueError(
                "serving VideoLLaMA needs sample_mode='text' (answers are "
                "text; the video rides in the shared prefix — pass "
                "prefix_vision_masks)"
            )
        # round the slot cache to the kernels' friendly multiple: an
        # unaligned length silently disqualifies the Pallas prefill
        # kernel (xk % 128 gate in _inference_attn) — observed as a 17 GB
        # fp32 logits OOM on a 32K admission — and forces the decode
        # kernel onto narrow blocks (measured 2.1x slower, NOTES.md).
        # Prefer 1024 (matches round_cache_length on the generate path);
        # when the model's RoPE table (max_sequence_length) can't fit
        # that, fall back to the kernels' hard 128 requirement. Rounding
        # happens BEFORE the prefix path raises max_sequence_length so
        # the raise covers the rounded length, not the requested one.
        requested_cache = cache_len
        cache_len = -(-cache_len // 1024) * 1024
        has_prefix = (
            prefix_cache_path and os.path.exists(prefix_cache_path)
        ) or (prefix_ids is not None and len(prefix_ids) > 0)
        if cache_len > model.config.max_sequence_length:
            # small-model pools: 128 satisfies the kernels' hard gates
            # without outgrowing the RoPE table (the prefix path raises
            # max_sequence_length below, but honors the smaller cache)
            cache_len = -(-requested_cache // 128) * 128
        if not has_prefix and cache_len > model.config.max_sequence_length:
            raise ValueError(
                f"cache_len {requested_cache} (rounded to {cache_len} "
                f"for the decode kernels) exceeds the model's "
                f"max_sequence_length {model.config.max_sequence_length}"
            )
        self._pos0 = 0
        prefix_built = None
        if prefix_cache_path and os.path.exists(prefix_cache_path):
            # reuse a persisted document index — skip the build entirely
            prefix_built, P_store, P_true = load_prefix_cache(
                prefix_cache_path
            )
            if prefix_ids is not None and len(prefix_ids) != P_true:
                raise ValueError(
                    f"prefix cache at {prefix_cache_path} was built for "
                    f"{P_true} tokens, but prefix_ids has "
                    f"{len(prefix_ids)} — stale index?"
                )
        elif prefix_ids is not None and len(prefix_ids) > 0:
            prefix_built, P_store, P_true = build_prefix_cache(
                model, params, prefix_ids, prefix_chunk,
                prefix_vision_masks=prefix_vision_masks, mesh=mesh,
            )
            if prefix_cache_path:
                save_prefix_cache(
                    prefix_cache_path, prefix_built, P_store, P_true
                )
        if prefix_built is not None:
            import copy as _copy

            cfg = _copy.deepcopy(model.config)
            cfg.update(dict(
                prefix_len=P_store, prefix_tokens=P_true,
                max_sequence_length=max(
                    cfg.max_sequence_length, P_true + cache_len
                ),
            ))
            model = type(model)(
                cfg, input_shape=(1, 16), seed=seed, dtype=model.dtype,
                _do_init=False,
            )
            self._pos0 = P_true
        self._sp_slots = False
        if (
            mesh is not None
            and mesh.shape.get("sp", 1) > 1
            and prefix_built is None
        ):
            # no shared prefix: sp shards each SLOT's suffix cache
            # instead (long per-request contexts; reference
            # llama.py:599-614 decode contract). Decode AND the widened
            # speculative verify (1+lookup_k block) route per row/token
            # to the owning shard (models/llama.py sp_slot_caches —
            # the routed write unrolls the block per token, so a verify
            # block straddling a shard boundary is exact). The unroll
            # bounds the supported width.
            if lookup_k > 63:
                raise ValueError(
                    "sp>1 per-slot caches support lookup_k <= 63 (the "
                    "routed cache write unrolls the 1+k verify block "
                    "per token)"
                )
            if cache_len % mesh.shape["sp"] != 0:
                raise ValueError(
                    f"cache_len {cache_len} must divide the sp axis "
                    f"({mesh.shape['sp']}) for sp-sharded slot caches"
                )
            if not bool(getattr(model.config, "sp_slot_caches", False)):
                import copy as _copy

                cfg = _copy.deepcopy(model.config)
                cfg.update(dict(sp_slot_caches=True))
                model = type(model)(
                    cfg, input_shape=(1, 16), seed=seed, dtype=model.dtype,
                    _do_init=False,
                )
            self._sp_slots = True
        # batch dims shard over (dp, fsdp): the slot pool must divide
        # evenly, and the batch-1 admission prefill runs broadcast to one
        # row per (dp, fsdp) shard (shard_map divisibility; the extra rows
        # are copies — prefill compute is short, decode dominates)
        self._bshard = 1
        if mesh is not None:
            self._bshard = mesh.shape.get("dp", 1) * mesh.shape.get("fsdp", 1)
            if slots % self._bshard != 0:
                raise ValueError(
                    f"slots={slots} must be a multiple of dp*fsdp="
                    f"{self._bshard}"
                )
        self.lookup_k = int(lookup_k)
        self.lookup_ngram = int(lookup_ngram)
        self._prefix_np = (
            np.asarray(prefix_ids, np.int32).reshape(-1)
            if prefix_ids is not None else np.zeros(0, np.int32)
        )
        self.mesh = mesh
        self.model = model
        self._apply = _mk_apply(model)
        self.params = params
        self.slots = slots
        # round the slot cache to the kernels' friendly multiple: an
        self.cache_len = cache_len  # rounded above, before the prefix
                                    # path raised max_sequence_length
        self.prompt_buckets = tuple(sorted(b for b in prompt_buckets
                                           if b <= cache_len))
        self.stop_tokens = set(int(t) for t in stop_tokens)

        with self._ctx():
            self.cache = model.init_cache(slots, cache_len)
        if self._sp_slots:
            # commit the pool to the sp-sharded layout up front so the
            # decode program's routed write sees its real input sharding
            self.cache = jax.device_put(
                self.cache, _slot_cache_shardings(self.cache, mesh)
            )
        if prefix_built is not None:
            self.cache = _inject_prefix(self.cache, prefix_built)
        self.lengths = np.zeros(slots, np.int32)
        self.tokens = np.zeros(slots, np.int32)   # last emitted, per slot
        self.live: list[Optional[_Live]] = [None] * slots
        self.queue = deque()
        self.finished: list[Finished] = []
        self._next_id = 0
        self._step = 0
        self._key = jax.random.PRNGKey(seed)
        self._prefill_cache = {}
        self.admit_chunk = int(admit_chunk)
        self._pending = {}            # slot → staged chunked admission
        # host-observed counters (decode results are consumed with
        # np.asarray, which blocks, so the wall times are real)
        self.stats = dict(
            rounds=0, admitted=0, emitted=0, accepted=0, spec_rows=0,
            prefill_s=0.0, decode_s=0.0,
        )

        S, T, pos0 = slots, cache_len, self._pos0

        @partial(jax.jit, donate_argnums=(1,))
        def decode(params, cache, tok, lengths, tau, key):
            cache = _set_cache_index(cache, jnp.max(lengths))
            mask = (jnp.arange(T)[None] <= lengths[:, None]).astype("i4")
            # position_ids are GLOBAL (prefix + suffix index) for RoPE;
            # lengths/mask/cache_index stay in the suffix-local frame
            out, vars_ = self._apply(
                {"params": params, "cache": cache},
                tok[:, None], mask,
                (lengths[:, None] + pos0).astype("i4"),
            )
            logits = out.logits[:, 0].astype(jnp.float32)      # [S, V]
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            warped = logits / jnp.maximum(tau, 1e-6)[:, None]
            keys = jax.random.split(key, S)
            sampled = jax.vmap(
                lambda k, l: jax.random.categorical(k, l)
            )(keys, warped).astype(jnp.int32)
            nxt = jnp.where(tau > 0, sampled, greedy)
            return vars_["cache"], nxt

        self._decode = decode

        K = self.lookup_k
        if K > 0:

            @partial(jax.jit, donate_argnums=(1,))
            def spec(params, cache, toks, lengths, tau, key):
                """Widened decode: verify K proposals per slot in one
                forward. toks [S, 1+K]: col 0 = the slot's frontier token,
                cols 1..K = its proposals. Writes land per-row at
                lengths..lengths+K (rejected rows are overwritten by the
                next round's block before any read — the same O(1) rewind
                speculative.py uses)."""
                cache = _set_cache_index(cache, jnp.max(lengths))
                mask = (
                    jnp.arange(T)[None] <= lengths[:, None] + K
                ).astype("i4")
                pos = (
                    lengths[:, None] + jnp.arange(1 + K)[None] + pos0
                ).astype("i4")
                out, vars_ = self._apply(
                    {"params": params, "cache": cache}, toks, mask, pos,
                )
                logits = out.logits.astype(jnp.float32)       # [S, 1+K, V]
                greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                match = (greedy[:, :K] == toks[:, 1:]).astype(jnp.int32)
                n_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)
                keys = jax.random.split(key, S)
                sampled = jax.vmap(
                    lambda k_, l, t: jax.random.categorical(
                        k_, l / jnp.maximum(t, 1e-6)
                    )
                )(keys, logits[:, 0], tau).astype(jnp.int32)
                # sampled rows don't speculate: accept 0, emit the sample
                n_acc = jnp.where(tau > 0, 0, n_acc)
                greedy = greedy.at[:, 0].set(
                    jnp.where(tau > 0, sampled, greedy[:, 0])
                )
                # accepted proposals EQUAL the greedy outputs, so the
                # round's emissions are exactly greedy[:, :n_acc+1]
                return vars_["cache"], greedy, n_acc

            self._spec = spec

    def _ctx(self):
        """Mesh context for traces/compiles (sharding constraints inside
        the model resolve against the ambient mesh)."""
        return self.mesh if self.mesh is not None else nullcontext()

    def _prefill_fn(self, bucket):
        """Build (and cache) the admission program for one prompt bucket."""
        if bucket in self._prefill_cache:
            return self._prefill_cache[bucket]
        model, T, bp = self.model, self.cache_len, self._bshard
        pos0 = self._pos0

        @partial(jax.jit, donate_argnums=(1,))
        def prefill(params, pool, ids, vm, true_len, slot, tau, key):
            small = model.init_cache(bp, T)
            if pos0:
                # admission prompts attend to the shared prefix too —
                # graft the pool's frozen prefix block into the fresh cache
                small = _graft_prefix(small, pool)
            mask = jnp.broadcast_to(
                (jnp.arange(T)[None] < true_len).astype("i4"), (bp, T)
            )
            pos = jnp.broadcast_to(
                jnp.arange(bucket, dtype="i4")[None] + pos0, (bp, bucket)
            )
            out, vars_ = self._apply(
                {"params": params, "cache": small},
                jnp.broadcast_to(ids, (bp, bucket)), mask, pos,
                vision_masks=jnp.broadcast_to(vm, (bp, bucket)),
            )
            logits = lax.dynamic_index_in_dim(
                out.logits[0], true_len - 1, axis=0, keepdims=False
            ).astype(jnp.float32)                              # [V]
            greedy = jnp.argmax(logits).astype(jnp.int32)
            sampled = jax.random.categorical(
                key, logits / jnp.maximum(tau, 1e-6)
            ).astype(jnp.int32)
            tok = jnp.where(tau > 0, sampled, greedy)

            def adopt(path, big, one):
                if one.ndim == 0:     # cache_index: pool-level, set later
                    return big
                if _is_prefix_leaf(path):   # frozen, already in the pool
                    return big
                # rows of the broadcast prefill are identical — adopt row 0
                return lax.dynamic_update_slice_in_dim(
                    big, one[:1], slot, axis=0
                )

            pool = jax.tree_util.tree_map_with_path(
                adopt, pool, vars_["cache"]
            )
            return pool, tok

        self._prefill_cache[bucket] = prefill
        return prefill

    # ------------------------------------------- chunked admission programs

    @property
    def _chunk_fn(self):
        """One compiled program advances ANY staged admission by one
        admit_chunk-sized piece (chunk size is the only static shape, so
        arbitrary prompt lengths share it)."""
        if hasattr(self, "_chunk_fn_cached"):
            return self._chunk_fn_cached
        T, bp, C = self.cache_len, self._bshard, self.admit_chunk
        pos0 = self._pos0

        @jax.jit
        def advance(params, small, chunk_ids, chunk_vm, done, true_len):
            # keys valid through this chunk's end (pad rows in the final
            # chunk are causally dead; decode masks them by true length)
            mask = jnp.broadcast_to(
                (jnp.arange(T)[None] < done + C).astype("i4"), (bp, T)
            )
            pos = jnp.broadcast_to(
                (jnp.arange(C, dtype="i4") + done)[None] + pos0, (bp, C)
            )
            out, vars_ = self._apply(
                {"params": params, "cache": small},
                jnp.broadcast_to(chunk_ids[None], (bp, C)), mask, pos,
                vision_masks=jnp.broadcast_to(chunk_vm[None], (bp, C)),
            )
            # the first-token logits live in whichever chunk holds
            # position true_len-1 — return that row every chunk, the
            # host keeps the right one
            sel = jnp.clip(true_len - 1 - done, 0, C - 1)
            row = lax.dynamic_index_in_dim(
                out.logits[0], sel, axis=0, keepdims=False
            ).astype(jnp.float32)
            return vars_["cache"], row

        self._chunk_fn_cached = advance
        return advance

    @property
    def _adopt_fn(self):
        """Move a finished staged cache into the pool at its slot and
        emit the first token."""
        if hasattr(self, "_adopt_fn_cached"):
            return self._adopt_fn_cached

        @partial(jax.jit, donate_argnums=(0,))
        def adopt_pool(pool, small, slot, tau, key, row):
            greedy = jnp.argmax(row).astype(jnp.int32)
            sampled = jax.random.categorical(
                key, row / jnp.maximum(tau, 1e-6)
            ).astype(jnp.int32)
            tok = jnp.where(tau > 0, sampled, greedy)

            def adopt(path, big, one):
                if one.ndim == 0:
                    return big
                if _is_prefix_leaf(path):
                    return big
                return lax.dynamic_update_slice_in_dim(
                    big, one[:1], slot, axis=0
                )

            pool = jax.tree_util.tree_map_with_path(adopt, pool, small)
            return pool, tok

        self._adopt_fn_cached = adopt_pool
        return adopt_pool

    def _advance_pending(self):
        """One chunk of progress per staged admission; adopt the ones
        that finished (emitting their first token)."""
        C = self.admit_chunk
        for slot, st in list(self._pending.items()):
            t0 = _time.perf_counter()
            with self._ctx():
                st["small"], row = self._chunk_fn(
                    self.params, st["small"],
                    jnp.asarray(st["ids"][st["done"]: st["done"] + C]),
                    jnp.asarray(st["vm"][st["done"]: st["done"] + C]),
                    jnp.asarray(st["done"], jnp.int32),
                    jnp.asarray(st["true_len"], jnp.int32),
                )
            st["done"] += C
            if st["done"] >= st["true_len"]:
                # we stop at the first chunk crossing true_len, so THIS
                # chunk held position true_len-1 and `row` is the
                # first-token logits
                self._key, sub = jax.random.split(self._key)
                with self._ctx():
                    self.cache, tok = self._adopt_fn(
                        self.cache, st["small"],
                        jnp.asarray(slot, jnp.int32),
                        jnp.asarray(st["temp"], jnp.float32), sub, row,
                    )
                tok = int(tok)
                self.stats["admitted"] += 1
                self.stats["emitted"] += 1
                self.live[slot] = _Live(
                    st["rid"], [tok], st["max_new"], st["temp"],
                    st["prompt"], st["on_token"]
                )
                self._notify(self.live[slot], [tok])
                self.lengths[slot] = st["true_len"]
                self.tokens[slot] = tok
                del self._pending[slot]
                self._retire(slot)
            self.stats["prefill_s"] += _time.perf_counter() - t0

    # ------------------------------------------------------------- host API

    def submit(self, prompt_ids, max_new_tokens, temperature=0.0,
               on_token=None, vision_masks=None):
        """Queue a request; returns its id. Greedy when temperature == 0.
        on_token(req_id, token) streams each kept token as the host
        observes it (same order as the Finished.tokens array).
        vision_masks (VideoLLaMA pools): bool per prompt token — True rows
        embed through the vision token table, so a request can carry its
        OWN video/image codes inline (vs the pool-wide shared prefix).
        Generated tokens are always text (sample_mode='text')."""
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        if vision_masks is not None:
            vision_masks = np.asarray(vision_masks, bool).reshape(-1)
            if vision_masks.shape != prompt.shape:
                raise ValueError(
                    f"vision_masks length {vision_masks.shape[0]} != "
                    f"prompt length {prompt.shape[0]}"
                )
        if len(prompt) + max_new_tokens + self.lookup_k > self.cache_len:
            raise ValueError(
                f"prompt {len(prompt)} + max_new {max_new_tokens} "
                + (f"+ lookup_k {self.lookup_k} " if self.lookup_k else "")
                + f"exceeds cache_len {self.cache_len}"
            )
        if not (self.admit_chunk and len(prompt) > self.admit_chunk):
            # chunked admissions need no bucket (one program, any length)
            _bucket(len(prompt), self.prompt_buckets)  # validate at submit
        rid = self._next_id
        self._next_id += 1
        self.queue.append(
            (rid, prompt, int(max_new_tokens), float(temperature), on_token,
             vision_masks)
        )
        return rid

    def _admit(self):
        for slot in range(self.slots):
            if (
                self.live[slot] is not None
                or slot in self._pending
                or not self.queue
            ):
                continue
            rid, prompt, max_new, temp, on_token, vmask = self.queue.popleft()
            if self.admit_chunk and len(prompt) > self.admit_chunk:
                # stage a chunked admission: one admit_chunk piece per
                # step() so the pool's decode never stalls longer than
                # one chunk (Sarathi-style)
                C = self.admit_chunk
                n = -(-len(prompt) // C) * C
                ids = np.zeros(n, np.int32)
                ids[: len(prompt)] = prompt
                vm = np.zeros(n, bool)
                if vmask is not None:
                    vm[: len(prompt)] = vmask
                small = self.model.init_cache(self._bshard, self.cache_len)
                if self._pos0:
                    small = _graft_prefix(small, self.cache)
                self._pending[slot] = dict(
                    rid=rid, prompt=prompt, max_new=max_new, temp=temp,
                    ids=ids, vm=vm, done=0, true_len=len(prompt),
                    small=small, on_token=on_token,
                )
                continue
            bucket = _bucket(len(prompt), self.prompt_buckets)
            ids = np.zeros((1, bucket), np.int32)
            ids[0, : len(prompt)] = prompt
            vm = np.zeros((1, bucket), bool)
            if vmask is not None:
                vm[0, : len(prompt)] = vmask
            self._key, sub = jax.random.split(self._key)
            t0 = _time.perf_counter()
            with self._ctx():
                self.cache, tok = self._prefill_fn(bucket)(
                    self.params, self.cache, jnp.asarray(ids),
                    jnp.asarray(vm),
                    jnp.asarray(len(prompt), jnp.int32),
                    jnp.asarray(slot, jnp.int32),
                    jnp.asarray(temp, jnp.float32), sub,
                )
            tok = int(tok)
            self.stats["prefill_s"] += _time.perf_counter() - t0
            self.stats["admitted"] += 1
            self.stats["emitted"] += 1
            self.live[slot] = _Live(
                rid, [tok], max_new, temp, prompt, on_token
            )
            self._notify(self.live[slot], [tok])
            self.lengths[slot] = len(prompt)
            self.tokens[slot] = tok
            self._retire(slot)  # max_new == 1 or instant stop token

    def _notify(self, live, toks):
        if live.on_token is not None:
            for t in toks:
                live.on_token(live.req_id, int(t))

    def cancel(self, rid):
        """Cancel a request wherever it is — queued, staging (chunked
        admission), or live — finishing it with stopped='cancelled'
        (already-emitted tokens are kept). Returns False if unknown/done."""
        for i, item in enumerate(self.queue):
            if item[0] == rid:
                del self.queue[i]
                self.finished.append(Finished(
                    rid, item[1], np.zeros(0, np.int32), "cancelled"
                ))
                return True
        for slot, st in list(self._pending.items()):
            if st["rid"] == rid:
                del self._pending[slot]
                self.finished.append(Finished(
                    rid, st["prompt"], np.zeros(0, np.int32), "cancelled"
                ))
                return True
        for slot, live in enumerate(self.live):
            if live is not None and live.req_id == rid:
                self.finished.append(Finished(
                    rid, live.prompt,
                    np.asarray(live.emitted, np.int32), "cancelled",
                ))
                self.live[slot] = None
                self.lengths[slot] = 0
                self.tokens[slot] = 0
                return True
        return False

    def _retire(self, slot):
        """Finish the slot's request if its last token ended it."""
        live = self.live[slot]
        if live is None:
            return
        tok = live.emitted[-1]
        done = len(live.emitted) >= live.max_new or tok in self.stop_tokens
        if done:
            self.finished.append(Finished(
                req_id=live.req_id,
                prompt=live.prompt,
                tokens=np.asarray(live.emitted, np.int32),
                stopped="eos" if tok in self.stop_tokens else "length",
            ))
            self.live[slot] = None
            self.lengths[slot] = 0
            self.tokens[slot] = 0

    def step(self):
        """Admit whatever fits, then one decode step for every live slot
        (a speculative verify step when lookup_k > 0 — may emit several
        tokens per slot). Returns the requests finished during this step."""
        n_done = len(self.finished)
        self._admit()
        if self._pending:
            self._advance_pending()
        if any(l is not None for l in self.live):
            if self.lookup_k > 0:
                self._spec_step()
            else:
                self._plain_step()
            self._step += 1
        return self.finished[n_done:]

    def _plain_step(self):
        tau = np.asarray(
            [l.temperature if l else 0.0 for l in self.live], np.float32
        )
        self._key, sub = jax.random.split(self._key)
        t0 = _time.perf_counter()
        with self._ctx():
            self.cache, nxt = self._decode(
                self.params, self.cache,
                jnp.asarray(self.tokens), jnp.asarray(self.lengths),
                jnp.asarray(tau), sub,
            )
        nxt = np.asarray(nxt)
        self.stats["decode_s"] += _time.perf_counter() - t0
        self.stats["rounds"] += 1
        for slot, live in enumerate(self.live):
            if live is None:
                continue
            self.stats["emitted"] += 1
            live.emitted.append(int(nxt[slot]))
            self._notify(live, [int(nxt[slot])])
            self.lengths[slot] += 1
            self.tokens[slot] = int(nxt[slot])
            if self.lengths[slot] + 1 >= self.cache_len:
                live.max_new = len(live.emitted)  # out of cache: finish
            self._retire(slot)

    def _spec_step(self):
        """One verify round: per-slot lookup proposals, one widened
        forward, per-slot acceptance (greedy rows emit n_acc+1 tokens)."""
        K = self.lookup_k
        tau = np.asarray(
            [l.temperature if l else 0.0 for l in self.live], np.float32
        )
        toks = np.zeros((self.slots, 1 + K), np.int32)
        toks[:, 0] = self.tokens
        for slot, live in enumerate(self.live):
            if live is None:
                continue
            prop = None
            if live.temperature == 0:
                ctx = np.concatenate([
                    self._prefix_np, live.prompt,
                    np.asarray(live.emitted, np.int32),
                ])
                prop = _lookup_proposal(ctx, K, self.lookup_ngram)
            # no proposal: repeat the frontier token — acceptance only
            # happens when it MATCHES greedy, so exactness is unaffected
            toks[slot, 1:] = prop if prop is not None else self.tokens[slot]
        self._key, sub = jax.random.split(self._key)
        t0 = _time.perf_counter()
        with self._ctx():
            self.cache, greedy, n_acc = self._spec(
                self.params, self.cache, jnp.asarray(toks),
                jnp.asarray(self.lengths), jnp.asarray(tau), sub,
            )
        greedy, n_acc = np.asarray(greedy), np.asarray(n_acc)
        self.stats["decode_s"] += _time.perf_counter() - t0
        self.stats["rounds"] += 1
        for slot, live in enumerate(self.live):
            if live is None:
                continue
            kept = min(int(n_acc[slot]) + 1, live.max_new - len(live.emitted))
            new = [int(t) for t in greedy[slot, :kept]]
            for j, t in enumerate(new):        # stop token ends the row
                if t in self.stop_tokens:
                    new = new[: j + 1]
                    break
            if live.temperature == 0:
                self.stats["spec_rows"] += 1
                self.stats["accepted"] += int(n_acc[slot])
            self.stats["emitted"] += len(new)
            live.emitted.extend(new)
            self._notify(live, new)
            self.lengths[slot] += len(new)
            self.tokens[slot] = new[-1]
            if self.lengths[slot] + 1 + K >= self.cache_len:
                live.max_new = len(live.emitted)  # out of cache: finish
            self._retire(slot)

    def run(self):
        """Drive until the queue and all slots drain; returns all finished
        requests in completion order."""
        while (
            self.queue
            or self._pending
            or any(l is not None for l in self.live)
        ):
            self.step()
        return self.finished

    def stats_line(self):
        """One-line host-observed summary (tokens/round, phase walls,
        lookup acceptance when speculating)."""
        s = self.stats
        parts = [
            f"{s['admitted']} reqs",
            f"{s['emitted']} tokens in {s['rounds']} rounds"
            + (f" ({s['emitted'] / s['rounds']:.2f} tok/round)"
               if s["rounds"] else ""),
            f"prefill {s['prefill_s']:.2f}s",
            f"decode {s['decode_s']:.2f}s",
        ]
        if s["spec_rows"]:
            parts.append(
                f"lookup acceptance {s['accepted'] / s['spec_rows']:.2f}"
                f"/{self.lookup_k}"
            )
        return ", ".join(parts)
