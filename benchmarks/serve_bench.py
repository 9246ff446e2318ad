"""In-flight batching vs static-wave serving throughput.

Both arms run the SAME two jitted programs (InflightServer's admission
prefill + all-slots decode step) — the measurement isolates the
scheduler: continuous admission (a request enters the moment a slot
frees) versus static waves (admit `slots` requests, DRAIN them all,
admit the next wave — the lockstep batch-generate pattern). With mixed
output lengths the wave arm idles finished slots until the wave's
longest request drains; the continuous arm backfills them, so its win
is ~ E[max(new) / mean(new)] of the length mix at full queue pressure.

Env:
  SERVE_PLATFORM  force backend ('cpu' for tunnel-down runs)
  SERVE_SLOTS     pool size (default 8)
  SERVE_REQS      number of requests (default 48)
  SERVE_CACHE     cache_len per slot (default 1024)
  SERVE_SEED      request-mix seed (default 0)
  SERVE_LAYERS / SERVE_HIDDEN  model size (default 6L/768 — the bench
                  model is random-weight; scheduling cost is
                  content-independent)
  SERVE_MESH      serve over a mesh, e.g. '1,2,4,1' (sp must be 1;
                  slots % dp*fsdp == 0); params shard by the model's
                  partition rules
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if os.environ.get("SERVE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SERVE_PLATFORM"])

import numpy as np

from lwm_tpu.models import FlaxLLaMAForCausalLM, LLaMAConfig
from lwm_tpu.serve import InflightServer

SLOTS = int(os.environ.get("SERVE_SLOTS", 8))
REQS = int(os.environ.get("SERVE_REQS", 48))
CACHE = int(os.environ.get("SERVE_CACHE", 1024))
SEED = int(os.environ.get("SERVE_SEED", 0))
LAYERS = int(os.environ.get("SERVE_LAYERS", 6))
HIDDEN = int(os.environ.get("SERVE_HIDDEN", 768))
MESH = os.environ.get("SERVE_MESH", "")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def build_model():
    import jax.numpy as jnp

    cfg = LLaMAConfig(
        vocab_size=512, hidden_size=HIDDEN, intermediate_size=HIDDEN * 3,
        num_hidden_layers=LAYERS, num_attention_heads=max(HIDDEN // 128, 2),
        max_sequence_length=max(4096, CACHE), scan_attention=False,
        scan_mlp=False, scan_layers=False, mesh_dim=MESH or None,
        decode_index="per_row",
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

    params = init(jax.random.PRNGKey(0))
    mesh = None
    if MESH:
        from lwm_tpu.parallel import (
            make_shard_and_gather_fns, match_partition_rules,
        )
        from lwm_tpu.parallel.partition import tree_apply

        mesh = LLaMAConfig.get_jax_mesh(MESH)
        ps = match_partition_rules(
            LLaMAConfig.get_partition_rules(False, 0), params
        )
        shard_fns, _ = make_shard_and_gather_fns(ps, mesh, jnp.bfloat16)
        params = tree_apply(shard_fns, params)
    return model, params, mesh


def request_mix(rng):
    """Realistic skew: mostly short answers, a few long generations."""
    reqs = []
    for _ in range(REQS):
        prompt_len = int(rng.integers(24, 120))
        new = int(rng.choice([12, 24, 32, 48, 160], p=[.3, .25, .2, .15, .1]))
        prompt = rng.integers(2, 500, prompt_len).astype(np.int32)
        reqs.append((prompt, new))
    return reqs


def run(model, params, reqs, continuous, mesh=None):
    srv = InflightServer(
        model, params, slots=SLOTS, cache_len=CACHE, prompt_buckets=(128,),
        mesh=mesh,
    )
    t0 = time.perf_counter()
    if continuous:
        for prompt, new in reqs:
            srv.submit(prompt, new)
        done = srv.run()
    else:
        for i in range(0, len(reqs), SLOTS):         # wave = admit, DRAIN
            for prompt, new in reqs[i: i + SLOTS]:
                srv.submit(prompt, new)
            srv.run()
        done = srv.finished                          # run() returns all-so-far
    dt = time.perf_counter() - t0
    toks = sum(len(f.tokens) for f in done)
    assert len(done) == len(reqs)
    return toks, dt, done


def main():
    rng = np.random.default_rng(SEED)
    log(f"building {LAYERS}L/{HIDDEN} model...")
    model, params, mesh = build_model()
    reqs = request_mix(rng)

    log("warmup (compile both programs)...")
    run(model, params, reqs[: SLOTS + 2], True, mesh)

    log("continuous arm...")
    toks_c, t_c, done_c = run(model, params, reqs, True, mesh)
    log("wave arm...")
    toks_w, t_w, _ = run(model, params, reqs, False, mesh)
    assert toks_c == toks_w

    if mesh is None:
        # exactness spot-check vs standalone decode of one request
        # (meshed exactness is covered by tests/test_serve.py)
        p, n = reqs[0][0], reqs[0][1]
        solo = InflightServer(
            model, params, slots=1, cache_len=CACHE, prompt_buckets=(128,),
        )
        solo.submit(p, n)
        want = solo.run()[0].tokens
        got = next(f.tokens for f in done_c if f.req_id == 0)
        np.testing.assert_array_equal(got, want)

    extra = f" mesh={MESH}" if MESH else ", exactness spot-check OK"
    print(
        f"in-flight serving: {toks_c / t_c:.1f} tok/s vs wave "
        f"{toks_w / t_w:.1f} tok/s — {t_w / t_c:.2f}x  "
        f"[slots={SLOTS} reqs={REQS} mixed 12-160 new tokens, "
        f"{LAYERS}L/{HIDDEN} bf16{extra}]"
    )


if __name__ == "__main__":
    main()
