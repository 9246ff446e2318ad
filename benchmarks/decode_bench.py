"""Decode throughput: prefill + greedy decode loop in ONE jitted program.

Everything runs inside jit, including parameter init (_do_init=False):
eager init would dispatch hundreds of individual ops through the TPU
tunnel. One compiled dispatch = the TPU's real serving rate.

scan_layers=False for serving: with scanned layers, flax nn.scan carries
the full stacked KV cache through the per-layer while loop (with per-trip
layout-conversion copies of the [L, b, T, h, d] buffers) — measured 3.7x
slower (116.5 vs 432 tok/s, same 256M model / 2K prompt / 256 new tokens,
1 v5e chip). Unscan checkpoints for serving with
`lwm_tpu.utils.checkpoint_convert.unscan_params`.
"""

import os
import sys
import time
from functools import partial

# bootstrap the repo root WITHOUT touching PYTHONPATH: this environment's
# TPU client is configured by a sitecustomize on the default PYTHONPATH
# (/root/.axon_site) — overriding PYTHONPATH silently degrades the TPU
# path ~400x (measured: 432 -> 1.0 tok/s on the identical program)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if os.environ.get("DECODE_PLATFORM"):  # e.g. 'cpu' for smoke runs — the
    # JAX_PLATFORMS env var is ignored under the axon TPU plugin
    jax.config.update("jax_platforms", os.environ["DECODE_PLATFORM"])
import jax.numpy as jnp
from jax import lax

from lwm_tpu.models import FlaxLLaMAForCausalLM, LLaMAConfig

PROMPT = int(os.environ.get("DECODE_PROMPT", 2048))
NEW = int(os.environ.get("DECODE_NEW", 256))
KV_DTYPE = os.environ.get("DECODE_KV_DTYPE", "auto")  # "int8" halves cache HBM
QUANT = os.environ.get("DECODE_QUANT", "none")  # "int8": weight-only-quantized
                                                # dense layers (half weight HBM)
ATTN_IMPL = os.environ.get("DECODE_ATTN_IMPL", "auto")  # "xla" for extreme ctx
KV_HEADS = int(os.environ.get("DECODE_KV_HEADS", 0))  # >0: GQA cache (of HEADS)
BATCH = int(os.environ.get("DECODE_BATCH", 1))  # rows decoded in lockstep
SPLIT = os.environ.get("DECODE_SPLIT", "0") == "1"  # separate prefill /
                                                    # decode programs (1M ctx)
# model size overrides (defaults = the 256M bench model)
HIDDEN = int(os.environ.get("DECODE_HIDDEN", 1024))
LAYERS = int(os.environ.get("DECODE_LAYERS", 14))
HEADS = int(os.environ.get("DECODE_HEADS", 8))
INTER = int(os.environ.get("DECODE_INTER", 3 * HIDDEN))
# long prompts must prefill through the flash path (full-materialization
# attention is O(prompt^2) memory); short ones use the plain path
SCAN_ATTN = PROMPT > 4096
# extreme prompts (>=256K) also need the chunked MLP during prefill: the
# unscanned feed-forward materializes [prompt, intermediate] bf16
# transients (1.5G each at 256K) across layers that together overflow HBM
SCAN_MLP = os.environ.get("DECODE_SCAN_MLP", "1" if PROMPT >= 200_000 else "0") == "1"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    # cache length rounds to the decode kernel's block multiple (the
    # generate path does this via prepare_inputs_for_generation through
    # round_cache_length; direct cache users do it themselves)
    total = -(-(PROMPT + NEW) // 1024) * 1024
    cfg = LLaMAConfig(
        vocab_size=32000, hidden_size=HIDDEN, intermediate_size=INTER,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        max_sequence_length=max(8192, total),
        scan_attention=SCAN_ATTN, scan_query_chunk_size=2048,
        scan_key_chunk_size=2048, scan_mlp=SCAN_MLP,
        scan_mlp_chunk_size=8192, scan_layers=False,
        kv_cache_dtype=KV_DTYPE, attn_impl=ATTN_IMPL, mesh_dim=None,
        num_key_value_heads=KV_HEADS or None, quant_dense=QUANT,
        # the bench only ever reads the last position's logits; without
        # this the prefill materializes [1, prompt, 32000] bf16 logits —
        # 15.6G at 256K, the binding allocation above 128K prompts
        logits_tail=1,
    )
    model = FlaxLLaMAForCausalLM(
        cfg, input_shape=(1, 16), seed=0, dtype=jnp.bfloat16, _do_init=False
    )

    @jax.jit
    def make_inputs(rng):
        dummy = jnp.zeros((1, 16), dtype="i4")
        params = model.module.init(
            {"params": rng, "dropout": rng},
            dummy, jnp.ones_like(dummy), None,
            jnp.broadcast_to(jnp.arange(16, dtype="i4"), (1, 16)),
            return_dict=False,
        )["params"]
        if QUANT.startswith("int8"):
            # init gives zero int8 kernels; randomize so the timed program
            # sees realistic (non-degenerate) data (covers int8, int8_xla,
            # int8_w8a8 — ADVICE r2)
            params = jax.tree.map(
                lambda x: jax.random.randint(
                    rng, x.shape, -127, 128, jnp.int32
                ).astype(jnp.int8) if x.dtype == jnp.int8 else x,
                params,
            )
        ids = jax.random.randint(rng, (BATCH, PROMPT), 0, 32000, dtype=jnp.int32)
        return params, ids

    log("init (jitted)...")
    params, ids = make_inputs(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log("init done")

    def fwd(params, cache, tok, pos):
        out, vars_ = model.module.apply(
            {"params": params, "cache": cache},
            tok, jnp.ones((BATCH, total), dtype="i4"), None, pos,
            True, False, False, False, True, mutable=["cache"],
        )
        return vars_["cache"], jnp.argmax(out.logits[:, -1:], axis=-1).astype("i4")

    @partial(jax.jit, static_argnums=(2,))
    def run(params, ids, new_tokens):
        cache = model.init_cache(BATCH, total)
        pos = jnp.broadcast_to(jnp.arange(PROMPT, dtype="i4")[None], (BATCH, PROMPT))
        cache, tok = fwd(params, cache, ids, pos)

        def body(i, carry):
            cache, tok, toks = carry
            pos = jnp.full((BATCH, 1), PROMPT + i, dtype="i4")
            cache, tok = fwd(params, cache, tok, pos)
            return cache, tok, lax.dynamic_update_slice(toks, tok, (0, i))

        toks = jnp.zeros((BATCH, new_tokens), dtype="i4")
        _, _, toks = lax.fori_loop(0, new_tokens, body, (cache, tok, toks))
        return toks

    if SPLIT:
        # extreme contexts (DECODE_PROMPT≈1M): prefill costs minutes, so
        # the fused layout above would pay it 4x (2 programs x warmup +
        # timed). Split instead: prefill ONCE as its own program (timed),
        # keep the cache on-device, and time a donated-cache decode-only
        # program — same kernels, one prefill execution total.
        #
        # DECODE_PREFILL_CHUNK=N prefills in N-token chunks over the cache
        # (the serving layer's chunked-admission pattern): one-shot 1M
        # prefill OOMs at 21.9G — the flash kernel's fp32 [heads, 1M, d]
        # output plus 1M-wide per-layer transients — while each 128K chunk
        # is O(chunk)-sized next to the int8 cache. Same kernels as
        # chunked admission (prefill-over-cache), cache donated through
        # the chunk loop so the 7G cache never copies.
        chunk = int(os.environ.get("DECODE_PREFILL_CHUNK", 0))

        @jax.jit
        def prefill(params, ids):
            cache = model.init_cache(BATCH, total)
            pos = jnp.broadcast_to(
                jnp.arange(PROMPT, dtype="i4")[None], (BATCH, PROMPT)
            )
            return fwd(params, cache, ids, pos)

        @partial(jax.jit, donate_argnums=(1,))
        def prefill_chunk(params, cache, ids_chunk, off):
            pos = off + jnp.broadcast_to(
                jnp.arange(chunk, dtype="i4")[None], (BATCH, chunk)
            )
            return fwd(params, cache, ids_chunk, pos)

        if chunk:
            assert PROMPT % chunk == 0, (PROMPT, chunk)

            def run_chunked_prefill():
                cache = model.init_cache(BATCH, total)
                for i in range(PROMPT // chunk):
                    cache, tok = prefill_chunk(
                        params, cache,
                        lax.dynamic_slice_in_dim(ids, i * chunk, chunk, axis=1),
                        jnp.int32(i * chunk),
                    )
                jax.device_get(tok)
                return cache, tok

            # pass 1 pays the one-time chunk-program compiles; pass 2 is
            # the timed warm run (the published prefill number — compile
            # time is not throughput). The pass-1 cache is dropped before
            # pass 2 inits its own: two live 1M caches (7 GiB each) plus
            # transients would overflow the 15.75 GiB budget.
            log(f"chunked prefill ({PROMPT // chunk} x {chunk}), "
                "pass 1: compile + warm...")
            cache, tok = run_chunked_prefill()
            del cache, tok
            log("chunked prefill pass 2: timed warm run...")
            t0 = time.perf_counter()
            cache, tok = run_chunked_prefill()
            prefill_s = time.perf_counter() - t0
            if os.environ.get("DECODE_CHECK"):
                # exactness: chunked prefill must reproduce one-shot
                # prefill — identical cache writes (k/v are per-token
                # projections) and the same next token (smoke-scale only;
                # one-shot is what OOMs at 1M)
                cache_ref, tok_ref = prefill(params, ids)
                mismatch = [
                    jax.tree_util.keystr(path)
                    for (path, a), b in zip(
                        jax.tree_util.tree_leaves_with_path(cache),
                        jax.tree_util.tree_leaves(cache_ref),
                    )
                    if not jnp.array_equal(a, b)
                ]
                assert not mismatch, f"cache mismatch: {mismatch}"
                assert jnp.array_equal(tok, tok_ref), (tok, tok_ref)
                log("DECODE_CHECK ok: chunked == one-shot (cache + token)")
                del cache_ref

        @partial(jax.jit, static_argnums=(3,), donate_argnums=(1,))
        def decode(params, cache, tok, new_tokens):
            def body(i, carry):
                cache, tok, toks = carry
                pos = jnp.full((BATCH, 1), PROMPT + i, dtype="i4")
                cache, tok = fwd(params, cache, tok, pos)
                return cache, tok, lax.dynamic_update_slice(toks, tok, (0, i))

            toks = jnp.zeros((BATCH, new_tokens), dtype="i4")
            cache, _, toks = lax.fori_loop(
                0, new_tokens, body, (cache, tok, toks)
            )
            return cache, toks

        # sync via device_get of a SMALL output: on the axon tunnel
        # platform block_until_ready does not block on execution, which
        # silently times async dispatch instead of the program (measured
        # 6-35 "tok/s" for a 272-tok/s decode)
        if not chunk:
            # AOT-compile then warm-run before timing, exactly as the
            # decode side does: the r4 ladder published prefill columns
            # where a 4x longer prompt prefilled 1.7x "faster" because
            # the number was dominated by XLA compile, not execution
            log("prefill AOT compile...")
            pre_exe = prefill.lower(params, ids).compile()
            log("prefill warm run...")
            cache, tok = pre_exe(params, ids)
            jax.device_get(tok)
            log("prefill timed run...")
            t0 = time.perf_counter()
            cache, tok = pre_exe(params, ids)
            jax.device_get(tok)
            prefill_s = time.perf_counter() - t0
        log(f"prefill done ({prefill_s:.1f}s); decode (compile+warmup)...")
        # AOT-compile the REAL program then warm-run it once: a warmup at
        # a smaller static new_tokens compiles a different program, so the
        # timed call would pay the NEW-token compile (measured 19.9s of
        # "decode" at 256K = mostly XLA compile, 12.9 "tok/s" for what is
        # actually a ~100 tok/s decode)
        dec_exe = decode.lower(params, cache, tok, NEW).compile()
        cache, w_toks = dec_exe(params, cache, tok)
        jax.device_get(w_toks)
        log("timing decode...")
        t0 = time.perf_counter()
        cache, toks = dec_exe(params, cache, tok)
        jax.device_get(toks)
        t_dec = time.perf_counter() - t0
        decode_rate = NEW / t_dec
        print(
            f"decode: {BATCH * decode_rate:.1f} tok/s decode-only; "
            f"prefill {prefill_s:.1f} s warm "
            f"({BATCH * PROMPT / prefill_s:.0f} tok/s) "
            f"[prompt={PROMPT} kv={KV_DTYPE} quant={QUANT} "
            f"kv_heads={KV_HEADS or HEADS} batch={BATCH} split"
            f"{f' chunk={chunk}' if chunk else ''}] "
            f"({n_params/1e6:.0f}M model bf16, {PROMPT} prompt + {NEW} "
            f"new tokens/row, decode program {t_dec:.3f} s)"
        )
        return

    log("compiling decode program...")
    jax.device_get(run(params, ids, NEW))  # compile + warmup
    # a second program with an 8-token decode tail isolates prefill cost:
    # decode-only rate = Δtokens / Δtime between the two programs
    short = max(1, min(8, NEW - 1))
    jax.device_get(run(params, ids, short))
    log("compiled; timing...")
    t0 = time.perf_counter()
    jax.device_get(run(params, ids, NEW))
    t_full = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(run(params, ids, short))
    t_short = time.perf_counter() - t0
    decode_rate = (NEW - short) / max(t_full - t_short, 1e-9)
    prefill_s = max(t_short - short / decode_rate, 0.0)
    print(
        f"decode: {BATCH * NEW / t_full:.1f} tok/s incl. prefill; "
        f"{BATCH * decode_rate:.1f} tok/s decode-only; "
        f"prefill {prefill_s*1e3:.0f} ms "
        f"[prompt={PROMPT} kv={KV_DTYPE} quant={QUANT} "
        f"kv_heads={KV_HEADS or HEADS} batch={BATCH}] "
        f"({n_params/1e6:.0f}M model bf16, {PROMPT} prompt + {NEW} new "
        f"tokens/row e2e {t_full:.3f} s, one compiled dispatch)"
    )


if __name__ == "__main__":
    main()
