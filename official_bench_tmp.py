import time
import jax, jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention, BlockSizes

b, h, s, d = 1, 8, 32768, 128
q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.bfloat16)
PEAK = 197e12
bs = BlockSizes(block_q=1024, block_k_major=512, block_k=512, block_b=1,
                block_q_major_dkv=1024, block_k_major_dkv=512, block_k_dkv=512,
                block_q_dkv=1024, block_k_major_dq=512, block_k_dq=512, block_q_dq=1024)
fn = jax.jit(lambda q,k,v: flash_attention(q, k, v, causal=True, block_sizes=bs))
out = fn(q,k,v); jax.device_get(out[0,0,0])
t0 = time.perf_counter()
for _ in range(5): out = fn(q,k,v)
jax.device_get(out[0,0,0])
t = (time.perf_counter()-t0)/5
flops = 4*b*h*s*s*d*0.5
print(f"official flash fwd: {t*1e3:.1f} ms, MFU {flops/t/PEAK:.3f}")
