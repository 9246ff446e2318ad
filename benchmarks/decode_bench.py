import time
import jax, jax.numpy as jnp
from lwm_tpu.models import FlaxLLaMAForCausalLM, LLaMAConfig

cfg = LLaMAConfig(
    vocab_size=32000, hidden_size=1024, intermediate_size=3072,
    num_hidden_layers=14, num_attention_heads=8, max_sequence_length=8192,
    scan_attention=True, scan_query_chunk_size=512, scan_key_chunk_size=512,
    scan_mlp=True, scan_mlp_chunk_size=512, scan_layers=True, mesh_dim=None)
model = FlaxLLaMAForCausalLM(cfg, input_shape=(1, 16), seed=0, dtype=jnp.bfloat16)
ids = jax.random.randint(jax.random.PRNGKey(0), (1, 2048), 0, 32000)
gen = jax.jit(lambda p, i: model.generate(
    i, max_length=2048 + 256, do_sample=False, pad_token_id=0, params=p
).sequences)
out = gen(model.params, ids); jax.device_get(out[0, -1])
t0 = time.perf_counter()
out = gen(model.params, ids); jax.device_get(out[0, -1])
t = time.perf_counter() - t0
print(f"decode: 256 new tokens (2K prompt, 256M model) in {t:.2f}s = {256/t:.1f} tok/s")
