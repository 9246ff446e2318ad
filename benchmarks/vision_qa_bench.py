"""Video-QA serving timing: shared-video-prefix pool vs per-question
re-prefill (the reference chat app's pattern, lwm/vision_chat.py).

A VideoLLaMA pool serves text questions against a video that was
VQGAN-coded ONCE into the shared prefix (vision-masked KV block); the
naive arm serves the SAME pool but each request's prompt carries the
full [video + question] inline (submit(vision_masks=...)), re-prefilling
the video per request — exactly what the reference's chat loop does.
Both arms ride InflightServer, so host scheduling and per-step dispatch
cost are identical and the delta is the re-prefilled video: admission
FLOPs (O(P+q) vs O(q)) and per-slot cache HBM (P+q+new vs q+new).
Random weights — scheduling/prefill cost is content-independent;
emitted tokens are asserted identical between arms (same math:
LSE-merged [prefix ++ suffix] == monolithic attention).

Env: VQB_FRAMES (default 16 → 16·257 = 4112 prefix tokens),
VQB_REQS (8), VQB_NEW (24), VQB_SLOTS (4), VQB_LAYERS (4),
VQB_HIDDEN (512), VQB_PLATFORM ('cpu' for tunnel-down runs),
VQB_CHUNK (admission chunk for the naive arm's long prompts, 2048).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if os.environ.get("VQB_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VQB_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from lwm_tpu.models.vision_llama import (
    FlaxVideoLLaMAForCausalLM,
    VideoLLaMAConfig,
)
from lwm_tpu.serve import InflightServer

FRAMES = int(os.environ.get("VQB_FRAMES", 16))
REQS = int(os.environ.get("VQB_REQS", 8))
NEW = int(os.environ.get("VQB_NEW", 24))
SLOTS = int(os.environ.get("VQB_SLOTS", 4))
LAYERS = int(os.environ.get("VQB_LAYERS", 4))
HIDDEN = int(os.environ.get("VQB_HIDDEN", 512))
PROMPT = 32


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    # FRAMES frames of 256 VQ codes + EOF (8192) each, EOV (8193) last —
    # the vision pipeline's framing (reference data.py:206-213)
    codes = []
    vmask = []
    for f in range(FRAMES):
        frame = rng.integers(0, 8192, 256).tolist() + [
            8193 if f == FRAMES - 1 else 8192
        ]
        codes += frame
        vmask += [True] * 257
    P = len(codes)
    reqs = [rng.integers(8500, 8900, PROMPT).tolist() for _ in range(REQS)]

    cfg = VideoLLaMAConfig(
        vocab_size=9000, hidden_size=HIDDEN, intermediate_size=HIDDEN * 3,
        num_hidden_layers=LAYERS, num_attention_heads=max(HIDDEN // 128, 2),
        max_sequence_length=2 * (P + 1024),
        scan_attention=False, scan_mlp=False, scan_layers=False,
        mesh_dim=None, decode_index="per_row", sample_mode="text",
    )
    model = FlaxVideoLLaMAForCausalLM(
        cfg, input_shape=(1, 16), seed=0, dtype=jnp.bfloat16, _do_init=False
    )

    @jax.jit
    def init(rng_):
        dummy = jnp.zeros((1, 16), dtype="i4")
        return model.module.init(
            {"params": rng_, "dropout": rng_},
            dummy, jnp.zeros((1, 16), bool), jnp.ones_like(dummy), None,
            jnp.broadcast_to(jnp.arange(16, dtype="i4"), (1, 16)),
            return_dict=False,
        )["params"]

    log(f"init {LAYERS}L/{HIDDEN} VideoLLaMA; video = {FRAMES} frames "
        f"({P} prefix tokens)...")
    params = init(jax.random.PRNGKey(0))

    # --- shared-video-prefix arm ------------------------------------------
    log("prefix arm: one-time video prefill...")
    t0 = time.perf_counter()
    srv = InflightServer(
        model, params, slots=SLOTS, cache_len=1024,
        prompt_buckets=(PROMPT,), prefix_ids=codes,
        prefix_vision_masks=vmask,
    )
    t_build = time.perf_counter() - t0
    for p in reqs[:1]:
        srv.submit(p, NEW)
    srv.run()  # warmup/compile
    srv2 = InflightServer(
        model, params, slots=SLOTS, cache_len=1024,
        prompt_buckets=(PROMPT,), prefix_ids=codes,
        prefix_vision_masks=vmask,
    )
    t0 = time.perf_counter()
    for p in reqs:
        srv2.submit(p, NEW)
    done_p = sorted(srv2.run(), key=lambda f: f.req_id)
    t_p = time.perf_counter() - t0

    # --- naive arm: per-question full [video + question] prefill ----------
    # the SAME pool, but each request carries the video inline
    # (submit(vision_masks=...)) and re-prefills it on admission via
    # chunked admission — the reference chat loop's cost profile with
    # identical host scheduling to the prefix arm
    log("naive arm: per-question video re-prefill through the pool...")
    CHUNK = int(os.environ.get("VQB_CHUNK", 2048))
    naive_cache = P + PROMPT + NEW + 64
    vm_full = np.concatenate([np.asarray(vmask), np.zeros(PROMPT, bool)])

    def naive_server():
        return InflightServer(
            model, params, slots=SLOTS, cache_len=naive_cache,
            prompt_buckets=(PROMPT,), admit_chunk=CHUNK,
        )

    srv_n = naive_server()
    srv_n.submit(np.concatenate([codes, reqs[0]]), NEW,
                 vision_masks=vm_full)
    srv_n.run()  # warmup/compile
    srv_n2 = naive_server()
    t0 = time.perf_counter()
    for p in reqs:
        srv_n2.submit(np.concatenate([codes, p]), NEW,
                      vision_masks=vm_full)
    done_n = sorted(srv_n2.run(), key=lambda f: f.req_id)
    outs_n = [f.tokens for f in done_n]
    t_n = time.perf_counter() - t0

    # soft agreement check: with RANDOM bf16 weights the two arms'
    # mathematically-equivalent attentions (LSE-merged partials vs
    # monolithic) differ in summation order, and near-uniform logits let
    # bf16 noise flip greedy argmax after a few tokens. Strict
    # token-exactness of the prefix pool is pinned at fp32 in
    # tests/test_serve.py; here we just report the agreement.
    agree = total = 0
    for fp, on in zip(done_p, outs_n):
        n = min(len(fp.tokens), len(on))
        a = next(
            (j for j in range(n) if int(fp.tokens[j]) != int(on[j])), n
        )
        agree += a
        total += n
    toks = sum(len(f.tokens) for f in done_p)
    print(
        f"video-QA serving: {toks / t_p:.1f} tok/s (shared video prefix) "
        f"vs {toks / t_n:.1f} tok/s (per-question re-prefill) — "
        f"{t_n / t_p:.2f}x  [video {FRAMES} frames = {P} tokens, "
        f"reqs={REQS} q={PROMPT} new={NEW}, {LAYERS}L/{HIDDEN} bf16, "
        f"one-time video build {t_build:.2f}s, greedy agreement "
        f"{agree}/{total} (random-weight bf16 argmax noise; fp32 "
        f"exactness pinned in tests)]"
    )


if __name__ == "__main__":
    main()
