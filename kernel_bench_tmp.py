import time, os
import jax, jax.numpy as jnp
from lwm_tpu.ops.pallas_flash import flash_attention_fwd_pallas, flash_attention_bwd_pallas
from lwm_tpu.ops.ring import flash_attention

b, s, h, d = 1, 32768, 8, 128
q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d), jnp.bfloat16)
PEAK = 197e12

def timed(fn, *args, n=5):
    out = fn(*args); jax.device_get(jax.tree_util.tree_leaves(out)[0][0,0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][0,0])
    return (time.perf_counter() - t0) / n

fwd = jax.jit(lambda q,k,v: flash_attention_fwd_pallas(q,k,v)[0])
t_fwd = timed(fwd, q, k, v)
flops_fwd = 4 * b * h * s * s * d * 0.5  # 2 matmuls, causal half
print(f"flash fwd: {t_fwd*1e3:.1f} ms, MFU {flops_fwd/t_fwd/PEAK:.3f}")

def full(q, k, v):
    def loss(q, k, v):
        return flash_attention(q, k, v, dtype=jnp.bfloat16).astype(jnp.float32).sum()
    return jax.grad(loss, argnums=(0,1,2))(q, k, v)
fullj = jax.jit(full)
t_full = timed(fullj, q, k, v)
flops_full = flops_fwd * 3.5  # fwd(1) + dq(1.25) + dkv(1.25) roughly
print(f"flash fwd+bwd: {t_full*1e3:.1f} ms, MFU(3.5x est) {flops_full/t_full/PEAK:.3f}")
