"""Flash-kernel microbenchmark (fwd and fwd+bwd) on the local TPU.

Run from the repo root with no JAX_PLATFORMS override:
    python benchmarks/kernel_bench.py
"""

import os
import sys
import time

# bootstrap the repo root WITHOUT touching PYTHONPATH (overriding it
# degrades this environment's TPU client ~400x — see NOTES.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lwm_tpu.ops.pallas_flash import flash_attention_fwd_pallas
from lwm_tpu.ops.ring import flash_attention


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / n


def main(b=1, s=32768, h=8, d=128, peak=197e12):
    # env overrides: decompose model-level MFU at other shapes
    # (KB_SEQ=524288 KB_HEADS=2 KB_KV_HEADS=1 for the 512K rung's
    # attention geometry; KB_CHUNK sets both kernel block preferences)
    s = int(os.environ.get("KB_SEQ", s))
    h = int(os.environ.get("KB_HEADS", h))
    h_kv = int(os.environ.get("KB_KV_HEADS", h))
    d = int(os.environ.get("KB_D", d))
    chunk = int(os.environ.get("KB_CHUNK", 8192))
    n_rep = int(os.environ.get("KB_N", 5))
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h_kv, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h_kv, d), jnp.bfloat16)

    fwd = jax.jit(lambda q, k, v: flash_attention_fwd_pallas(q, k, v)[0])
    t_fwd = timed(fwd, q, k, v, n=n_rep)
    flops_fwd = 4 * b * h * s * s * d * 0.5  # 2 matmuls, causal half
    print(f"flash fwd ({s=} {h=} {h_kv=} {d=}): {t_fwd*1e3:.1f} ms, "
          f"MFU {flops_fwd/t_fwd/peak:.3f}")

    def full(q, k, v):
        def loss(q, k, v):
            return flash_attention(
                q, k, v, query_chunk_size=chunk, key_chunk_size=chunk,
                dtype=jnp.bfloat16,
            ).astype(jnp.float32).sum()  # preferred >= caps: env caps decide

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    t_full = timed(jax.jit(full), q, k, v, n=n_rep)
    flops_full = flops_fwd * 3.5  # fwd + dq + dkv, rough
    print(f"flash fwd+bwd: {t_full*1e3:.1f} ms, "
          f"MFU(3.5x est) {flops_full/t_full/peak:.3f}")


if __name__ == "__main__":
    main()
