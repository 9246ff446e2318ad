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
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d), jnp.bfloat16)

    fwd = jax.jit(lambda q, k, v: flash_attention_fwd_pallas(q, k, v)[0])
    t_fwd = timed(fwd, q, k, v)
    flops_fwd = 4 * b * h * s * s * d * 0.5  # 2 matmuls, causal half
    print(f"flash fwd: {t_fwd*1e3:.1f} ms, MFU {flops_fwd/t_fwd/peak:.3f}")

    def full(q, k, v):
        def loss(q, k, v):
            return flash_attention(
                q, k, v, query_chunk_size=8192, key_chunk_size=8192,
                dtype=jnp.bfloat16,
            ).astype(jnp.float32).sum()  # preferred >= caps: env caps decide

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    t_full = timed(jax.jit(full), q, k, v)
    flops_full = flops_fwd * 3.5  # fwd + dq + dkv, rough
    print(f"flash fwd+bwd: {t_full*1e3:.1f} ms, MFU(3.5x est) {flops_full/t_full/peak:.3f}")


if __name__ == "__main__":
    main()
