"""Shared-prefix serving vs re-prefilling the document per request.

The long-context serving workload: one shared document of P tokens,
a stream of short requests against it. Arms:

  prefix   InflightServer(prefix_ids=doc): document prefilled ONCE into
           a frozen batch-1 KV block; slot caches hold only suffixes.
  naive    InflightServer without a prefix: every request's prompt is
           [doc + question], re-prefilling the document on admission
           and storing it per-slot (cache_len must fit P + suffix).

Both arms serve the same request stream end-to-end (admission + decode)
and the emitted tokens are asserted identical. The prefix arm's win has
two parts: admission work drops from O(P + q) to O(q), and the decode
step's cache traffic stops duplicating the document per slot (plus the
decode-time head-folding: the prefix block is streamed from HBM once
per STEP, not once per slot — ops/prefix.py).

Env: PB_PLATFORM ('cpu' for tunnel-down runs), PB_PREFIX (document
tokens, default 4096), PB_SLOTS (default 4), PB_REQS (default 8),
PB_NEW (new tokens per request, default 32), PB_LAYERS / PB_HIDDEN
(default 4L/512), PB_SUFFIX_CACHE (prefix-arm slot cache, default 512).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if os.environ.get("PB_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PB_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from lwm_tpu.models import FlaxLLaMAForCausalLM, LLaMAConfig
from lwm_tpu.serve import InflightServer

PREFIX = int(os.environ.get("PB_PREFIX", 4096))
SLOTS = int(os.environ.get("PB_SLOTS", 4))
REQS = int(os.environ.get("PB_REQS", 8))
NEW = int(os.environ.get("PB_NEW", 32))
LAYERS = int(os.environ.get("PB_LAYERS", 4))
HIDDEN = int(os.environ.get("PB_HIDDEN", 512))
SUFFIX_CACHE = int(os.environ.get("PB_SUFFIX_CACHE", 512))
PROMPT = 32  # question length (fixed — the document dominates)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def build_model():
    cfg = LLaMAConfig(
        vocab_size=512, hidden_size=HIDDEN, intermediate_size=HIDDEN * 3,
        num_hidden_layers=LAYERS, num_attention_heads=max(HIDDEN // 128, 2),
        max_sequence_length=2 * (PREFIX + SUFFIX_CACHE),
        scan_attention=False, scan_mlp=False, scan_layers=False,
        mesh_dim=None, decode_index="per_row",
    )
    model = FlaxLLaMAForCausalLM(
        cfg, input_shape=(1, 16), seed=0, dtype=jnp.bfloat16, _do_init=False
    )

    @jax.jit
    def init(rng):
        dummy = jnp.zeros((1, 16), dtype="i4")
        return model.module.init(
            {"params": rng, "dropout": rng},
            dummy, jnp.ones_like(dummy), None,
            jnp.broadcast_to(jnp.arange(16, dtype="i4"), (1, 16)),
            return_dict=False,
        )["params"]

    return model, init(jax.random.PRNGKey(0))


def serve(srv, reqs, *, full_prompt_doc=None):
    t0 = time.perf_counter()
    for p in reqs:
        prompt = list(full_prompt_doc) + list(p) if full_prompt_doc else p
        srv.submit(prompt, NEW)
    done = sorted(srv.run(), key=lambda f: f.req_id)
    dt = time.perf_counter() - t0
    return done, dt


def main():
    rng = np.random.default_rng(0)
    doc = rng.integers(2, 500, PREFIX).tolist()
    reqs = [rng.integers(2, 500, PROMPT).tolist() for _ in range(REQS)]

    log(f"building {LAYERS}L/{HIDDEN} model; doc={PREFIX} tokens...")
    model, params = build_model()

    # --- prefix arm -------------------------------------------------------
    log("prefix arm: one-time document prefill...")
    t0 = time.perf_counter()
    srv_p = InflightServer(
        model, params, slots=SLOTS, cache_len=SUFFIX_CACHE,
        prompt_buckets=(PROMPT,), prefix_ids=doc,
    )
    t_build = time.perf_counter() - t0
    log(f"  built in {t_build:.2f}s; warmup...")
    serve(srv_p, reqs[:1])
    srv_p2 = InflightServer(
        model, params, slots=SLOTS, cache_len=SUFFIX_CACHE,
        prompt_buckets=(PROMPT,), prefix_ids=doc,
    )
    log("  serving...")
    done_p, t_p = serve(srv_p2, reqs)

    # --- naive arm --------------------------------------------------------
    naive_cache = PREFIX + PROMPT + NEW + 64
    naive_bucket = PREFIX + PROMPT
    log(f"naive arm: per-request document prefill (cache {naive_cache})...")
    srv_n = InflightServer(
        model, params, slots=SLOTS, cache_len=naive_cache,
        prompt_buckets=(naive_bucket,),
    )
    serve(srv_n, reqs[:1], full_prompt_doc=doc)  # warmup/compile
    srv_n2 = InflightServer(
        model, params, slots=SLOTS, cache_len=naive_cache,
        prompt_buckets=(naive_bucket,),
    )
    log("  serving...")
    done_n, t_n = serve(srv_n2, reqs, full_prompt_doc=doc)

    for fp, fn in zip(done_p, done_n):
        np.testing.assert_array_equal(fp.tokens, fn.tokens)

    toks = sum(len(f.tokens) for f in done_p)
    print(
        f"shared-prefix serving: {toks / t_p:.1f} tok/s vs naive "
        f"{toks / t_n:.1f} tok/s — {t_n / t_p:.2f}x  "
        f"[doc={PREFIX} slots={SLOTS} reqs={REQS} q={PROMPT} new={NEW}, "
        f"{LAYERS}L/{HIDDEN} bf16, one-time prefix build {t_build:.2f}s, "
        f"outputs identical]"
    )


if __name__ == "__main__":
    main()
