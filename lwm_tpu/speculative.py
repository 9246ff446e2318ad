"""Speculative decoding: a small draft model proposes k tokens per step,
the target model verifies them in ONE forward, and every emitted token is
provably the target's own greedy choice.

Beyond-reference serving capability (the reference decodes one token per
target forward). Decode is HBM-bandwidth-bound — each target step streams
all weights + cache for ONE token — so verifying k+1 tokens in one
forward multiplies decode throughput by roughly the acceptance length,
while the draft's stream is a small fraction of the target's.

Design notes (TPU-first):
- The whole generate loop — draft fori_loop, verify forward, acceptance,
  cache rewind — lives inside ONE jitted program (`lax.while_loop`),
  following the serving rule in docs/serving.md: host round-trips per
  token would dominate at these step times.
- The verify forward is exactly the "prefill over an existing cache"
  path the serving stack already optimizes (llama.py `_inference_attn`
  with `q_offset = cache index` through the Pallas flash kernel); the
  default k=7 makes the verify q-length 8, the kernel's sublane quantum.
- Cache rewind is O(1): stale entries past the accepted frontier are
  left in place and masked out by the causal frontier, which derives
  from the `cache_index` leaves — rewinding is just resetting those
  scalars (the next iteration overwrites the stale rows in place).
- Batched rows run in lockstep: the per-iteration acceptance is the
  MINIMUM match length across rows (each row's emitted tokens are still
  exactly its own target-greedy tokens — a shorter accepted prefix is
  still a verified prefix). Throughput, not correctness, degrades when
  rows diverge; serve homogeneous batches for best speedup.

Greedy contract: for ANY draft model, `speculative_generate` emits the
token-for-token output of plain greedy decoding with the target
(tested in tests/test_speculative.py against mismatched drafts).

Sampling mode (`temperature=...`): standard rejection-sampling
speculative decoding — the draft PROPOSES x ~ p_d, the target accepts
with prob min(1, p_t(x)/p_d(x)), and a rejection emits a sample from
the residual distribution normalize(max(p_t − p_d, 0)). Each emitted
token is distributed EXACTLY as ancestral sampling from the (warped)
target — for any draft — by the standard speculative-sampling lemma;
`tests/test_speculative.py` checks the acceptance kernel's emission
law analytically against p_t and the end-to-end marginals empirically.
Temperature/top-k warps apply identically to both models' logits, so
exactness holds w.r.t. the warped target (the same distribution plain
warped sampling draws from). Sampling mode is batch-1 (lockstep
truncation of a batch would condition emitted tokens on acceptance,
biasing them toward min(p_d, p_t) — greedy mode has no such bias
because its tokens are deterministic).

`prompt_lookup_generate` is the draft-FREE variant: proposals are the
continuation of the most recent earlier occurrence of the current
trailing n-gram in the sequence itself (prompt + already-emitted
tokens). No draft model, no draft forward — the only cost over plain
decode is the verify width — and the same exactness contracts hold
(greedy: proposals are just guesses the verify checks; sampling: a
lookup proposal is a delta distribution, so accept-with-prob
min(1, p_t(x)/1) = p_t(x) and the residual is p_t with x zeroed,
renormalized — handled by the same acceptance kernel with one-hot
d_probs). This pays exactly where a long-context model reads from its
own context: needle retrieval, chat-over-documents, summarization.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _set_cache_index(cache, value):
    """Rewind/advance every `cache_index` leaf (scalar int32) of a flax
    cache collection; other leaves pass through."""

    def visit(path, leaf):
        if any(getattr(p, "key", None) == "cache_index" for p in path):
            return jnp.asarray(value, jnp.int32)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, cache)


def _decode_fn(model, cache_len):
    """One functional decode/verify step: tokens [b, s] at positions
    [b, s] against a mutable cache → (new_cache, logits [b, s, V])."""

    def fwd(params, cache, tok, pos):
        out, vars_ = model.module.apply(
            {"params": params, "cache": cache},
            tok,
            jnp.ones((tok.shape[0], cache_len), dtype="i4"),
            None,
            pos,
            True, False, False, False, True,
            mutable=["cache"],
        )
        return vars_["cache"], out.logits

    return fwd


def make_warp_fn(temperature: float, top_k: int | None):
    """Logit warp applied identically to draft and target: temperature
    scaling then top-k truncation (None/0 = no truncation)."""

    def warp(logits):
        logits = logits / jnp.asarray(temperature, logits.dtype)
        if top_k:
            kth = lax.top_k(logits, top_k)[0][..., -1:]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        return logits

    return warp


def accept_and_emit(key, proposals, d_probs, t_probs):
    """The rejection-sampling acceptance kernel (pure function, unit
    tested directly against the speculative-sampling lemma).

    proposals: [k] int32 — draft tokens for positions 1..k of this round
    d_probs:   [k, V]    — draft distribution each proposal was drawn from
    t_probs:   [k+1, V]  — target distributions for positions 1..k+1

    Returns (m, c): m in [0, k] = number of proposals accepted (the first
    rejection index), and c = the token emitted at position m+1 — a
    residual-distribution sample on rejection (m < k), the target's bonus
    sample on full acceptance (m == k). By the lemma, the emitted token
    at every position is distributed exactly as t_probs[i].
    """
    k = proposals.shape[0]
    ukey, rkey, bkey = jax.random.split(key, 3)
    idx = jnp.arange(k)
    p_t = t_probs[idx, proposals]                     # [k]
    p_d = d_probs[idx, proposals]                     # [k]
    u = jax.random.uniform(ukey, (k,))
    accept = u * p_d < p_t                            # min(1, pt/pd) test
    m = jnp.argmin(jnp.pad(accept, (0, 1)))           # first False, k if none
    residual = jnp.maximum(t_probs[:k] - d_probs, 0.0)  # [k, V]
    res_m = residual[jnp.minimum(m, k - 1)]
    rej = jax.random.categorical(rkey, jnp.log(res_m + 1e-30))
    bonus = jax.random.categorical(bkey, jnp.log(t_probs[k] + 1e-30))
    c = jnp.where(m < k, rej, bonus).astype(jnp.int32)
    return m.astype(jnp.int32), c


def _accept_scatter(sampling, warp, k, cache_len, b,
                    akey, n, seq, drafts, logits, d_probs):
    """Post-verify half of a speculative round, shared by the draft-model
    and prompt-lookup runners: acceptance length m (exact-match in greedy
    mode, rejection-sampling in sampling mode), the correction/bonus
    token, and the scatter of the m+1 emitted tokens into seq at
    positions n+1 .. n+1+m. Returns (seq, new_tok, m)."""
    if sampling:
        t_probs = jax.nn.softmax(warp(logits[0].astype(jnp.float32)), axis=-1)
        m, c = accept_and_emit(akey, drafts[0, 1:], d_probs, t_probs)
        t_at_m = jnp.full((b, 1), c)
    else:
        t_next = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # t_next[:, i] = target's token at position n+i+1
        # accept the longest verified prefix (min across rows)
        match = drafts[:, 1:] == t_next[:, :-1]            # [b, k]
        m_rows = jnp.argmin(
            jnp.pad(match, ((0, 0), (0, 1))), axis=1
        )                                                   # [b] in [0, k]
        m = jnp.min(m_rows)
        t_at_m = jnp.take_along_axis(t_next, jnp.full((b, 1), m), axis=1)

    # emit[i] for i < m: drafts[1+i] (accepted proposals);
    # emit[m]: the target's own token at position n+m+1; > m unused
    d_shift = jnp.pad(drafts[:, 1:], ((0, 0), (0, 1)))  # [b, k+1]
    emit = jnp.where(jnp.arange(k + 1)[None] < m, d_shift, t_at_m)
    # scatter emit[:, 0..m] into seq[:, n+1 .. n+1+m]
    write = jnp.arange(cache_len)[None]                 # [1, L]
    inside = (write >= n + 1) & (write <= n + 1 + m)
    idx = jnp.clip(write - (n + 1), 0, k)
    vals = jnp.take_along_axis(
        emit, jnp.broadcast_to(idx, (b, cache_len)), axis=1
    )
    seq = jnp.where(inside, vals, seq)
    return seq, t_at_m[:, 0], m


def _lookup_proposals(seq, n, tok, k, ngram):
    """Draft-free proposals: find the most recent occurrence, strictly
    before the current one, of the trailing `ngram` (seq[n-g+1 .. n],
    ending in `tok`), and propose the k tokens that followed it. Rows
    with no occurrence propose `tok` repeated (still-correct guesses).
    Positions past the final frontier hold zeros, so an overlong
    continuation proposes zeros — harmless, the verify rejects them."""
    b, L = seq.shape
    g = ngram
    idx = jnp.arange(L)
    key = jnp.take_along_axis(
        seq, jnp.broadcast_to(n - g + 1 + jnp.arange(g)[None], (b, g)), axis=1
    )                                                    # [b, g]
    eq = jnp.ones((b, L), bool)
    for j in range(g):  # g is tiny and static
        eq &= jnp.roll(seq, -j, axis=1) == key[:, j:j + 1]
    # occurrence must end at s+g-1 <= n-1 (the trailing ngram itself
    # starts at n-g+1 and is excluded by s <= n-g)
    score = jnp.where(eq & (idx[None] <= n - g), idx[None], -1)
    s_best = jnp.max(score, axis=1)                      # [b]
    found = s_best >= 0
    prop_idx = jnp.clip(s_best[:, None] + g + jnp.arange(k)[None], 0, L - 1)
    proposals = jnp.take_along_axis(seq, prop_idx, axis=1)  # [b, k]
    return jnp.where(found[:, None], proposals,
                     jnp.broadcast_to(tok[:, None], (b, k)))


@dataclass
class SpecResult:
    sequences: jax.Array   # [b, prompt + max_new_tokens] int32
    accepted: jax.Array    # [] int32 — total draft tokens accepted
    steps: jax.Array       # [] int32 — verify forwards executed


# compiled-runner cache: jax.jit caching is per-function-object, and the
# runner closes over the models, so rebuilding it per generate call would
# re-trace the whole draft+verify program every time (measured: ~2.5 s per
# call at toy scale — 50x the actual decode time)
_RUNNER_CACHE: dict = {}


def make_speculative_fn(
    target_model,
    draft_model,
    batch: int,
    prompt: int,
    max_new_tokens: int,
    k: int = 7,
    cache_len: int | None = None,
    temperature: float | None = None,
    top_k: int | None = None,
):
    """Build (and cache) the jitted speculative-decode runner for fixed
    shapes. Greedy mode (temperature=None): run(t_params, d_params, ids).
    Sampling mode: run(t_params, d_params, ids, prng_key), batch must
    be 1 (see module docstring). Both return (sequences, accepted,
    steps)."""
    b = batch
    sampling = temperature is not None
    if sampling:
        assert b == 1, "sampling mode is batch-1 (lockstep truncation bias)"
    # room for one overshooting iteration, rounded for the decode kernel
    need = prompt + max_new_tokens + k + 1
    if cache_len is None:
        cache_len = -(-need // 1024) * 1024
    assert cache_len >= need, (cache_len, need)

    key = (id(target_model), id(draft_model), b, prompt,
           max_new_tokens, k, cache_len, temperature, top_k)
    if key in _RUNNER_CACHE:
        return _RUNNER_CACHE[key][0]

    t_fwd = _decode_fn(target_model, cache_len)
    d_fwd = _decode_fn(draft_model, cache_len)
    warp = make_warp_fn(temperature, top_k) if sampling else None
    vocab = target_model.config.vocab_size

    @partial(jax.jit, static_argnums=())
    def run(target_params, draft_params, ids, rng=None):
        t_cache = target_model.init_cache(b, cache_len)
        d_cache = draft_model.init_cache(b, cache_len)

        seq = jnp.zeros((b, cache_len), jnp.int32)
        seq = lax.dynamic_update_slice(seq, ids.astype(jnp.int32), (0, 0))

        pos = jnp.broadcast_to(jnp.arange(prompt, dtype="i4")[None], (b, prompt))
        # prefill both models on the prompt; the target's last logits give
        # the (known-correct) token at position `prompt`
        t_cache, t_logits = t_fwd(target_params, t_cache, ids, pos)
        d_cache, _ = d_fwd(draft_params, d_cache, ids, pos)
        if sampling:
            rng, pkey = jax.random.split(rng)
            tok = jax.random.categorical(
                pkey, warp(t_logits[:, -1].astype(jnp.float32)), axis=-1
            ).astype(jnp.int32)
        else:
            rng = jax.random.PRNGKey(0)  # unused, uniform carry structure
            tok = jnp.argmax(t_logits[:, -1], axis=-1).astype(jnp.int32)
        seq = lax.dynamic_update_slice(seq, tok[:, None], (0, prompt))

        # invariant: both caches hold positions [0, n); seq[:, :n+1] is
        # final (token at n is final but not yet in either cache)
        def cond(carry):
            n, *_ = carry
            return n < prompt + max_new_tokens

        def body(carry):
            n, seq, tok, t_cache, d_cache, accepted, steps, rng = carry
            rng, dkey, akey = jax.random.split(rng, 3)

            # --- draft k tokens autoregressively (d_0 = tok is known) ---
            # k+1 steps, not k: the extra step ingests the draft's own
            # last proposal so its cache covers position n+k — at full
            # acceptance the next round starts at n+k+1 and would
            # otherwise attend an unwritten cache row (measured: one
            # garbage row poisons later rounds' acceptance)
            def draft_step(j, dc):
                d_cache, drafts, d_probs, key = dc
                d_cache, logits = d_fwd(
                    draft_params, d_cache, drafts[:, j][:, None],
                    jnp.broadcast_to((n + j)[None, None], (b, 1)).astype("i4"),
                )
                if sampling:
                    key, sk = jax.random.split(key)
                    wl = warp(logits[:, -1].astype(jnp.float32))     # [b, V]
                    nxt = jax.random.categorical(sk, wl, axis=-1).astype(jnp.int32)
                    d_probs = lax.dynamic_update_slice(
                        d_probs, jax.nn.softmax(wl, axis=-1)[None, 0], (j, 0)
                    )
                else:
                    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                drafts = lax.dynamic_update_slice(drafts, nxt[:, None], (0, j + 1))
                return d_cache, drafts, d_probs, key

            drafts = jnp.zeros((b, k + 2), jnp.int32)  # [k+1] = discarded
            drafts = lax.dynamic_update_slice(drafts, tok[:, None], (0, 0))
            d_probs = jnp.zeros(
                (k + 1, vocab) if sampling else (1, 1), jnp.float32
            )  # row k unused; dummy in greedy mode
            d_cache, drafts, d_probs, _ = lax.fori_loop(
                0, k + 1, draft_step, (d_cache, drafts, d_probs, dkey)
            )
            drafts = drafts[:, : k + 1]
            # draft cache now holds [0, n+k+1)

            # --- verify all k+1 tokens in ONE target forward ---
            vpos = jnp.broadcast_to(
                n + jnp.arange(k + 1, dtype=jnp.int32)[None], (b, k + 1)
            ).astype("i4")
            t_cache, logits = t_fwd(target_params, t_cache, drafts, vpos)
            # target cache now holds [0, n+k+1)

            seq, new_tok, m = _accept_scatter(
                sampling, warp, k, cache_len, b,
                akey, n, seq, drafts, logits, d_probs[:k],
            )
            n_new = n + m + 1
            # rewind both caches to hold exactly [0, n_new)
            t_cache = _set_cache_index(t_cache, n_new)
            d_cache = _set_cache_index(d_cache, n_new)
            return (
                n_new, seq, new_tok, t_cache, d_cache,
                accepted + m, steps + 1, rng,
            )

        n0 = jnp.asarray(prompt, jnp.int32)
        carry = (
            n0, seq, tok, _set_cache_index(t_cache, prompt),
            _set_cache_index(d_cache, prompt),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), rng,
        )
        n, seq, tok, _, _, accepted, steps, _ = lax.while_loop(cond, body, carry)
        return seq[:, : prompt + max_new_tokens], accepted, steps

    # hold model refs so id()-keyed entries can't alias freed objects
    _RUNNER_CACHE[key] = (run, target_model, draft_model)
    return run


def make_prompt_lookup_fn(
    target_model,
    batch: int,
    prompt: int,
    max_new_tokens: int,
    k: int = 7,
    ngram: int = 3,
    cache_len: int | None = None,
    temperature: float | None = None,
    top_k: int | None = None,
):
    """Build (and cache) the jitted prompt-lookup speculative runner —
    NO draft model; proposals come from the sequence itself (see module
    docstring). Greedy mode: run(t_params, ids); sampling mode:
    run(t_params, ids, prng_key), batch 1."""
    b = batch
    sampling = temperature is not None
    if sampling:
        assert b == 1, "sampling mode is batch-1 (lockstep truncation bias)"
    assert prompt >= ngram, (prompt, ngram)
    need = prompt + max_new_tokens + k + 1
    if cache_len is None:
        cache_len = -(-need // 1024) * 1024
    assert cache_len >= need, (cache_len, need)

    key = ("lookup", id(target_model), b, prompt, max_new_tokens, k,
           ngram, cache_len, temperature, top_k)
    if key in _RUNNER_CACHE:
        return _RUNNER_CACHE[key][0]

    t_fwd = _decode_fn(target_model, cache_len)
    warp = make_warp_fn(temperature, top_k) if sampling else None
    vocab = target_model.config.vocab_size

    @partial(jax.jit, static_argnums=())
    def run(target_params, ids, rng=None):
        t_cache = target_model.init_cache(b, cache_len)
        seq = jnp.zeros((b, cache_len), jnp.int32)
        seq = lax.dynamic_update_slice(seq, ids.astype(jnp.int32), (0, 0))

        pos = jnp.broadcast_to(jnp.arange(prompt, dtype="i4")[None], (b, prompt))
        t_cache, t_logits = t_fwd(target_params, t_cache, ids, pos)
        if sampling:
            rng, pkey = jax.random.split(rng)
            tok = jax.random.categorical(
                pkey, warp(t_logits[:, -1].astype(jnp.float32)), axis=-1
            ).astype(jnp.int32)
        else:
            rng = jax.random.PRNGKey(0)  # unused, uniform carry structure
            tok = jnp.argmax(t_logits[:, -1], axis=-1).astype(jnp.int32)
        seq = lax.dynamic_update_slice(seq, tok[:, None], (0, prompt))

        def cond(carry):
            n, *_ = carry
            return n < prompt + max_new_tokens

        def body(carry):
            n, seq, tok, t_cache, accepted, steps, rng = carry
            rng, akey = jax.random.split(rng)

            proposals = _lookup_proposals(seq, n, tok, k, ngram)
            drafts = jnp.concatenate([tok[:, None], proposals], axis=1)

            vpos = jnp.broadcast_to(
                n + jnp.arange(k + 1, dtype=jnp.int32)[None], (b, k + 1)
            ).astype("i4")
            t_cache, logits = t_fwd(target_params, t_cache, drafts, vpos)

            # a lookup proposal is a delta distribution → one-hot d_probs
            d_probs = (
                jax.nn.one_hot(drafts[0, 1:], vocab, dtype=jnp.float32)
                if sampling else None
            )
            seq, new_tok, m = _accept_scatter(
                sampling, warp, k, cache_len, b,
                akey, n, seq, drafts, logits, d_probs,
            )
            n_new = n + m + 1
            t_cache = _set_cache_index(t_cache, n_new)
            return (n_new, seq, new_tok, t_cache,
                    accepted + m, steps + 1, rng)

        carry = (
            jnp.asarray(prompt, jnp.int32), seq, tok,
            _set_cache_index(t_cache, prompt),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), rng,
        )
        n, seq, tok, _, accepted, steps, _ = lax.while_loop(cond, body, carry)
        return seq[:, : prompt + max_new_tokens], accepted, steps

    _RUNNER_CACHE[key] = (run, target_model)
    return run


def prompt_lookup_generate(
    target_model,
    target_params,
    input_ids,
    max_new_tokens: int,
    k: int = 7,
    ngram: int = 3,
    cache_len: int | None = None,
    temperature: float | None = None,
    top_k: int | None = None,
    prng_key=None,
):
    """Draft-free speculative decoding: propose the continuation of the
    most recent earlier occurrence of the trailing `ngram` in the
    sequence itself, verify k+1 tokens per target forward. Same
    exactness contracts as `speculative_generate` (greedy token-exact;
    sampling distribution-exact, batch 1). Pays where generation copies
    from context — retrieval answers, quoting, structured repetition —
    at zero draft-model cost."""
    b, prompt = input_ids.shape
    run = make_prompt_lookup_fn(
        target_model, b, prompt, max_new_tokens, k, ngram, cache_len,
        temperature, top_k,
    )
    if temperature is not None:
        if prng_key is None:
            prng_key = jax.random.PRNGKey(0)
        seq, accepted, steps = run(target_params, input_ids, prng_key)
    else:
        seq, accepted, steps = run(target_params, input_ids)
    return SpecResult(sequences=seq, accepted=accepted, steps=steps)


def speculative_generate(
    target_model,
    draft_model,
    target_params,
    draft_params,
    input_ids,
    max_new_tokens: int,
    k: int = 7,
    cache_len: int | None = None,
    temperature: float | None = None,
    top_k: int | None = None,
    prng_key=None,
):
    """Speculative decoding. Greedy by default: `sequences` equal plain
    greedy decoding with the target model alone. With `temperature`
    (and optional `top_k`), rejection-sampling mode: `sequences` are
    distributed exactly as plain warped ancestral sampling from the
    target (batch must be 1; pass `prng_key`).

    target_model/draft_model: FlaxLLaMAForCausalLM-style wrappers (serving
    configs: scan_layers=False, scan_attention=False — the caches are
    independent, so the draft can be any architecture, incl. GQA/int8).
    input_ids: [b, prompt] int32 (no padding — lockstep batching).
    k: draft tokens proposed per verify forward (k+1 = verify q-length;
    the default 7 aligns the verify step to the kernel's 8-row quantum).
    Repeated calls with the same models/shapes reuse one compiled program.
    """
    b, prompt = input_ids.shape
    run = make_speculative_fn(
        target_model, draft_model, b, prompt, max_new_tokens, k, cache_len,
        temperature, top_k,
    )
    if temperature is not None:
        if prng_key is None:
            prng_key = jax.random.PRNGKey(0)
        seq, accepted, steps = run(
            target_params, draft_params, input_ids, prng_key
        )
    else:
        seq, accepted, steps = run(target_params, draft_params, input_ids)
    return SpecResult(sequences=seq, accepted=accepted, steps=steps)
