"""lwm-tpu: a TPU-native long-context multimodal framework.

Built from scratch on JAX/XLA/Pallas with jax.sharding meshes. Provides the
capabilities of LargeWorldModel/LWM (million-token text + vision-language
training, inference, and generation) re-designed TPU-first:

- first-party Pallas RingAttention kernels (fwd/bwd, online softmax, KV ring)
- a 4-axis ``(dp, fsdp, tp, sp)`` parallelism substrate
- sequence-sharded data loading and KV caching
- streaming sharded checkpointing with resumable datasets
- VQGAN video tokenizer, CFG generation, needle evals
"""

__version__ = "0.1.0"

# Public API (heavier submodules import lazily — `import lwm_tpu` stays cheap)
from lwm_tpu import ops, parallel, utils  # noqa: E402,F401
