"""LWM-Text: LLaMA-architecture decoder built on the lwm_tpu ring-attention
substrate.

Behavioral contracts mirrored from the reference (SURVEY.md §2 items 1-6;
reference lwm/llama.py) so released LWM checkpoints load and shard
identically: parameter tree names (wte/wq/wk/wv/wo/w1/w2/w3/attention_norm/
ffn_norm/ln_f/lm_head, scan collection 'scan_decoder'), partition-rule
tables for (scan_layers, param_scan_axis) ∈ {(T,0),(T,1),(F,·)}
(reference llama.py:221-283), RoPE as complex rotation with configurable
theta (llama.py:344-375), fp32-accumulated RMSNorm (llama.py:320-341), the
attention dispatch rule `scan_attention and q_len > max(chunk sizes)` →
ring attention (llama.py:525), and the sequence-sharded KV cache with
axis-index-routed single-token writes (llama.py:440-492).

The compute paths themselves are this package's own: lwm_tpu.ops ring
attention (custom-VJP ring over `sp`) for train/prefill and the
flash-decoding partial-softmax combine for decode.
"""

from __future__ import annotations

import json
from functools import lru_cache, partial
from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax.core.frozen_dict import FrozenDict, freeze, unfreeze
from flax.linen import partitioning as nn_partitioning
from flax.traverse_util import flatten_dict, unflatten_dict
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as PS
from ml_collections import ConfigDict
from transformers import PretrainedConfig
from transformers.modeling_flax_outputs import FlaxBaseModelOutput, FlaxCausalLMOutput
from transformers.modeling_flax_utils import FlaxPreTrainedModel

from lwm_tpu.ops import ring_attention
from lwm_tpu.ops.blockwise import blockwise_attn
from lwm_tpu.ops.ring import flash_attention, ring_attention_inference
from lwm_tpu.parallel import with_sharding_constraint
from lwm_tpu.parallel.mesh import create_mesh
from lwm_tpu.utils.flags import function_args_to_config
from lwm_tpu.utils.io import load_pickle, open_file

remat = nn_partitioning.remat

# Public LLaMA/LWM model dimensions (reference llama.py:33-130).
LLAMA_STANDARD_CONFIGS = {
    "200m": dict(vocab_size=32000, hidden_size=1024, intermediate_size=2048,
                 num_hidden_layers=14, num_attention_heads=8,
                 max_sequence_length=2048, initializer_range=0.02,
                 rms_norm_eps=1e-6, use_cache=True, tie_word_embeddings=False),
    "1b": dict(vocab_size=32000, hidden_size=2048, intermediate_size=5504,
               num_hidden_layers=22, num_attention_heads=16,
               max_sequence_length=2048, initializer_range=0.02,
               rms_norm_eps=1e-6, use_cache=True, tie_word_embeddings=False),
    "3b": dict(vocab_size=32000, hidden_size=3200, intermediate_size=8640,
               num_hidden_layers=26, num_attention_heads=32,
               max_sequence_length=2048, initializer_range=0.02,
               rms_norm_eps=1e-6, use_cache=True, tie_word_embeddings=False),
    "7b": dict(vocab_size=32000, hidden_size=4096, intermediate_size=11008,
               num_hidden_layers=32, num_attention_heads=32,
               max_sequence_length=4096, initializer_range=0.02,
               rms_norm_eps=1e-6, use_cache=True, tie_word_embeddings=False),
    "13b": dict(vocab_size=32000, hidden_size=5120, intermediate_size=13824,
                num_hidden_layers=40, num_attention_heads=40,
                max_sequence_length=2048, initializer_range=0.02,
                rms_norm_eps=1e-6, use_cache=True, tie_word_embeddings=False),
    "30b": dict(vocab_size=32000, hidden_size=6656, intermediate_size=17920,
                num_hidden_layers=60, num_attention_heads=52,
                max_sequence_length=2048, initializer_range=0.02,
                rms_norm_eps=1e-6, use_cache=True, tie_word_embeddings=False),
    "65b": dict(vocab_size=32000, hidden_size=8192, intermediate_size=22016,
                num_hidden_layers=80, num_attention_heads=64,
                max_sequence_length=2048, initializer_range=0.02,
                rms_norm_eps=1e-5, use_cache=True, tie_word_embeddings=False),
    "debug": dict(vocab_size=32000, hidden_size=256, intermediate_size=256,
                  num_hidden_layers=2, num_attention_heads=2,
                  max_sequence_length=2048, initializer_range=0.02,
                  rms_norm_eps=1e-6, use_cache=True, tie_word_embeddings=False),
}


@lru_cache(maxsize=8)
def _cached_mesh(mesh_dim: str):
    return create_mesh(mesh_dim)


class LLaMAConfig(PretrainedConfig):
    model_type = "lwm_llama"

    def __init__(
        self,
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=None,  # GQA: kv heads (None = MHA). Must
                                   # divide num_attention_heads; tp must
                                   # divide it on a mesh. Beyond-reference
                                   # (the reference is MHA-only): shrinks
                                   # the serving KV cache and its decode
                                   # HBM stream by heads/kv_heads.
        max_sequence_length=4096,
        rms_norm_eps=1e-6,
        initializer_range=0.02,
        use_cache=True,
        bos_token_id=0,
        eos_token_id=1,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
        tie_word_embeddings=False,
        scan_attention=True,
        scan_mlp=True,
        scan_query_chunk_size=1024,
        scan_key_chunk_size=1024,
        scan_mlp_chunk_size=1024,
        scan_layers=True,
        param_scan_axis=0,
        remat_block="save_flash",  # keep flash out/lse; "nothing_saveable"
                                   # trades ~10% step time for minimum memory
        sp_layout="contiguous",  # 'striped' balances the causal ring (training only)
        kv_cache_dtype="auto",  # "int8": quantized serving cache (half HBM)
        quant_dense="none",  # "int8": weight-only-quantized serving dense
                             # layers (ops/quant.py Int8Dense) — params
                             # from quantize_params_int8; halves the
                             # per-token weight HBM stream at decode
        attn_impl="auto",  # "xla": oracle path (no Pallas); extreme-context
                           # single-chip serving prefill avoids the folded
                           # custom-call layouts that blow up HBM there
        decode_index="shared",  # "per_row": decode cache writes land at
                                # position_ids[:, 0] per row instead of the
                                # shared cache_index — slots at different
                                # depths decode in one batch (serve.py
                                # in-flight batching). Single-host serving
                                # path (no sp-routed write).
        sp_slot_caches=False,  # per_row pools on sp>1 meshes: shard each
                               # SLOT's suffix cache over sp and route the
                               # per-row decode write to the owning shard
                               # (serve.py pools serving long per-request
                               # contexts with no shared prefix; reference
                               # llama.py:599-614 sp decode contract).
        prefix_len=0,  # shared-prefix serving (ops/prefix.py): storage
                       # length of the frozen batch-1 prefix KV block each
                       # attention layer carries in its cache collection
                       # (0 = off). Padded to a kernel-friendly multiple;
                       # prefix_tokens is the true token count.
        prefix_tokens=0,
        logits_tail=0,  # >0: __call__ projects only the last N positions
                        # through lm_head. Serving prefill needs one row of
                        # logits; the full [b, seq, vocab] tensor is the
                        # dominant HBM allocation at extreme contexts
                        # (15.6G at a 256K prompt x 32000 vocab bf16).
        mesh_dim=None,
        theta=10000,
        **kwargs,
    ):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.initializer_range = initializer_range
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        if num_key_value_heads is not None and (
            num_attention_heads % num_key_value_heads != 0
        ):
            raise ValueError(
                f"num_key_value_heads={num_key_value_heads} must divide "
                f"num_attention_heads={num_attention_heads}"
            )
        self.num_key_value_heads = num_key_value_heads
        self.max_sequence_length = max_sequence_length
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.resid_pdrop = resid_pdrop
        self.embd_pdrop = embd_pdrop
        self.attn_pdrop = attn_pdrop
        self.scan_attention = scan_attention
        self.scan_mlp = scan_mlp
        self.scan_query_chunk_size = scan_query_chunk_size
        self.scan_key_chunk_size = scan_key_chunk_size
        self.scan_mlp_chunk_size = scan_mlp_chunk_size
        self.scan_layers = scan_layers
        self.param_scan_axis = param_scan_axis
        self.kv_cache_dtype = kv_cache_dtype
        self.quant_dense = quant_dense
        self.attn_impl = attn_impl
        self.decode_index = decode_index
        self.sp_slot_caches = sp_slot_caches
        self.remat_block = remat_block
        self.sp_layout = sp_layout
        self.prefix_len = prefix_len
        self.prefix_tokens = prefix_tokens
        self.logits_tail = logits_tail
        self.mesh_dim = mesh_dim
        self.theta = theta
        super().__init__(
            bos_token_id=bos_token_id,
            eos_token_id=eos_token_id,
            tie_word_embeddings=tie_word_embeddings,
            **kwargs,
        )

    @classmethod
    def get_default_config(cls, updates=None):
        config = function_args_to_config(cls.__init__, none_arg_types=dict(mesh_dim=str))
        if updates is not None:
            config.update(ConfigDict(updates).copy_and_resolve_references())
        return config

    @staticmethod
    def get_jax_mesh(mesh_dim):
        return _cached_mesh(mesh_dim)

    @staticmethod
    def get_ranks_and_size(mesh):
        from lwm_tpu.parallel.mesh import get_ranks_and_size

        out = get_ranks_and_size(mesh)
        out["mesh"] = mesh
        return out

    @staticmethod
    def get_partition_rules(scan_layers=False, scan_axis=0):
        """Regex → PartitionSpec tables; must match the reference exactly so
        released checkpoints shard identically (reference llama.py:221-283).
        Ordered: first match wins."""
        if scan_layers:
            if scan_axis == 0:
                return (
                    ("transformer/wte/embedding", PS("tp", ("fsdp", "sp"))),
                    ("attention/(wq|wk|wv)/kernel", PS(None, ("fsdp", "sp"), "tp")),
                    ("attention/wo/kernel", PS(None, "tp", ("fsdp", "sp"))),
                    ("feed_forward/w1/kernel", PS(None, ("fsdp", "sp"), "tp")),
                    ("feed_forward/w2/kernel", PS(None, "tp", ("fsdp", "sp"))),
                    ("feed_forward/w3/kernel", PS(None, ("fsdp", "sp"), "tp")),
                    ("attention_norm/kernel", PS(None, None)),
                    ("ffn_norm/kernel", PS(None, None)),
                    ("transformer/ln_f/kernel", PS(None)),
                    ("lm_head/kernel", PS(("fsdp", "sp"), "tp")),
                    (".*", PS(None)),
                )
            elif scan_axis == 1:
                return (
                    ("transformer/wte/embedding", PS("tp", ("fsdp", "sp"))),
                    ("attention/(wq|wk|wv)/kernel", PS(("fsdp", "sp"), None, "tp")),
                    ("attention/wo/kernel", PS("tp", None, ("fsdp", "sp"))),
                    ("feed_forward/w1/kernel", PS(("fsdp", "sp"), None, "tp")),
                    ("feed_forward/w2/kernel", PS("tp", None, ("fsdp", "sp"))),
                    ("feed_forward/w3/kernel", PS(("fsdp", "sp"), None, "tp")),
                    ("attention_norm/kernel", PS(None, None)),
                    ("ffn_norm/kernel", PS(None, None)),
                    ("transformer/ln_f/kernel", PS(None)),
                    ("lm_head/kernel", PS(("fsdp", "sp"), "tp")),
                    (".*", PS(None)),
                )
            raise ValueError(f"invalid scan_axis {scan_axis}")
        return (
            ("transformer/wte/embedding", PS("tp", ("fsdp", "sp"))),
            ("attention/(wq|wk|wv)/kernel", PS(("fsdp", "sp"), "tp")),
            ("attention/wo/kernel", PS("tp", ("fsdp", "sp"))),
            ("feed_forward/w1/kernel", PS(("fsdp", "sp"), "tp")),
            ("feed_forward/w2/kernel", PS("tp", ("fsdp", "sp"))),
            ("feed_forward/w3/kernel", PS(("fsdp", "sp"), "tp")),
            ("attention_norm/kernel", PS(None)),
            ("ffn_norm/kernel", PS(None)),
            ("transformer/ln_f/kernel", PS(None)),
            ("lm_head/kernel", PS(("fsdp", "sp"), "tp")),
            (".*", PS(None)),
        )

    @staticmethod
    def get_weight_decay_exclusions():
        return tuple()

    @staticmethod
    def get_frozen_param_exclusions(freeze_base):
        return ("vte", "vision_head") if freeze_base else tuple()

    @staticmethod
    def rng_keys():
        return ("params", "dropout")

    @classmethod
    def load_config(cls, path):
        """'7b' preset | 'pickle::/path.pkl' | 'json::/path.json'
        (reference llama.py:300-312)."""
        if path in LLAMA_STANDARD_CONFIGS:
            return cls.from_dict(LLAMA_STANDARD_CONFIGS[path])
        load_type, load_path = path.split("::", 1)
        if load_type == "pickle":
            return cls.from_dict(load_pickle(load_path)["llama_config"])
        if load_type == "json":
            with open_file(load_path, "r") as fin:
                return cls.from_dict(json.loads(fin.read()))
        raise ValueError(f"unsupported config load type: {path}")


class RMSNorm(nn.Module):
    """RMS layer norm with fp32 accumulation (reference llama.py:320-341);
    the learned scale is named 'kernel' for partition-rule parity."""

    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param(
            "kernel", nn.initializers.ones, (self.dim,), self.param_dtype
        )
        x32 = jnp.asarray(x, dtype=jnp.float32)
        x32 = x32 * lax.rsqrt(jnp.mean(jnp.square(x32), -1, keepdims=True) + self.eps)
        return (x32 * jnp.asarray(weight, jnp.float32)).astype(self.dtype)


FREQS_FACTOR = 4096  # fine-table period of the factored RoPE table


def precompute_freqs_cis(dim, end, theta=10000.0, dtype=jnp.float32):
    """Factored complex RoPE table (reference llama.py:344-350 semantics).

    e^{i·t·f} = coarse[t // F] · fine[t % F] with both factors computed in
    fp64 on the host: a 1M-position table costs ~1MB of program constants
    instead of 130MB+ of materialized [end, dim/2] complex64 (which
    overflows the remote-compile request at 512K+), and large positions
    keep full fp64 angle accuracy (a single fp32 t·f loses ~0.03 rad at
    t≈5e5). `theta` scales with context length (10M@128K/256K, 25M@512K,
    50M@1M — README.md:114-117). Returns (coarse, fine) complex64;
    index with take_freqs_cis."""
    del dtype
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))
    F = min(FREQS_FACTOR, end)
    n_coarse = (end + F - 1) // F
    t_coarse = (np.arange(n_coarse, dtype=np.float64) * F)
    t_fine = np.arange(F, dtype=np.float64)
    coarse = np.exp(1j * np.outer(t_coarse, freqs))
    fine = np.exp(1j * np.outer(t_fine, freqs))
    return (
        jnp.asarray(coarse, jnp.complex64),
        jnp.asarray(fine, jnp.complex64),
    )


def take_freqs_cis(freqs_cis, position_ids):
    """Gather rotary factors for positions: [b, s] int → [b, s, dim//2]
    complex64, from the factored (coarse, fine) table."""
    coarse, fine = freqs_cis
    F = fine.shape[0]
    return jnp.take(coarse, position_ids // F, axis=0) * jnp.take(
        fine, position_ids % F, axis=0
    )


def apply_rotary_emb(xq, xk, freqs_cis, dtype=jnp.float32):
    """Rotate q/k pairs by position in fp32 complex arithmetic
    (reference llama.py:353-375). freqs_cis: [b, s, dim//2] complex."""

    def rotate(x):
        xr = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
        xc = lax.complex(xr[..., 0], xr[..., 1])
        xc = xc * freqs_cis[:, :, None, :]
        out = jnp.stack([jnp.real(xc), jnp.imag(xc)], axis=-1)
        return out.reshape(*x.shape).astype(dtype)

    return rotate(xq), rotate(xk)


def _dense_cls(config):
    """nn.Dense, or — with `quant_dense='int8'` — the weight-only-
    quantized serving Int8Dense (ops/quant.py): same construction kwargs,
    same 'kernel' param name (partition rules keep matching), int8 kernel
    + per-output-channel scale populated by `quantize_params_int8`."""
    qd = getattr(config, "quant_dense", "none") or "none"
    if qd.startswith("int8"):
        from lwm_tpu.ops.quant import Int8Dense

        # 'int8' → auto impl (Pallas dequant-matmul on TPU); 'int8_xla'
        # forces the XLA dequant-matmul (same math, XLA-scheduled);
        # 'int8_w8a8' → native int8 MXU matmul with dynamic per-row
        # activation quantization (no per-weight convert on the VPU)
        known = {"int8": "auto", "int8_xla": "xla", "int8_w8a8": "w8a8"}
        if qd not in known:
            raise ValueError(
                f"unknown quant_dense spelling {qd!r}; expected one of "
                f"{sorted(known)} — refusing to silently fall back to the "
                "W8A16 path (an A/B would measure the wrong kernel)"
            )
        return partial(Int8Dense, impl=known[qd])
    if qd != "none":
        raise ValueError(f"unknown quant_dense {qd!r} (use 'none' or int8*)")
    return nn.Dense


class FlaxLLaMAAttention(nn.Module):
    config: LLaMAConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    precision: Optional[Union[jax.lax.Precision, str]] = None

    def setup(self):
        config = self.config
        self.embed_dim = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = (
            config.num_key_value_heads or config.num_attention_heads
        )
        self.kv_groups = self.num_heads // self.num_kv_heads
        self.head_dim = self.embed_dim // self.num_heads
        if config.mesh_dim is not None:
            tp = LLaMAConfig.get_jax_mesh(config.mesh_dim).shape["tp"]
            if self.num_kv_heads % tp != 0:
                raise ValueError(
                    f"tp={tp} must divide num_key_value_heads="
                    f"{self.num_kv_heads} (the cache's head dim shards by tp)"
                )
        dense = partial(
            _dense_cls(config),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=jax.nn.initializers.normal(config.initializer_range),
            precision=self.precision,
        )
        self.wq = dense(self.num_heads * self.head_dim)
        self.wk = dense(self.num_kv_heads * self.head_dim)
        self.wv = dense(self.num_kv_heads * self.head_dim)
        self.wo = dense(self.embed_dim)
        self.resid_dropout = nn.Dropout(rate=config.resid_pdrop)
        self.freqs_cis = precompute_freqs_cis(
            self.head_dim, config.max_sequence_length, theta=config.theta
        )

    def _split_heads(self, x):
        return x.reshape(x.shape[:2] + (self.num_heads, self.head_dim))

    def _split_kv_heads(self, x):
        return x.reshape(x.shape[:2] + (self.num_kv_heads, self.head_dim))

    def _merge_heads(self, x):
        return x.reshape(x.shape[:2] + (self.embed_dim,))

    def _expand_kv(self, x, head_axis):
        """GQA: repeat kv heads group-wise to the query head count for
        paths without native grouped support (the Pallas decode kernel
        consumes the narrow cache directly). No-op under MHA."""
        if self.kv_groups == 1:
            return x
        return jnp.repeat(x, self.kv_groups, axis=head_axis)

    @property
    def _mesh(self):
        if self.config.mesh_dim is None:
            return None
        return LLaMAConfig.get_jax_mesh(self.config.mesh_dim)

    def _quantize_kv(self, x):
        """Per-(token, head) symmetric int8 quantization: scale = amax/127.
        x: head-major [b, h, s, d]; scale returned as [b, h, s] (no trailing
        singleton: a [..., 1] minor dim would be lane-padded 1→128 in HBM,
        inflating the stored scales 128×)."""
        scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        scale = jnp.maximum(scale / 127.0, 1e-8)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
        return q.astype(jnp.int8), scale

    def _dequantize_kv(self, q, scale):
        """q: [b, h, s, d] int8, scale: [b, h, s] → [b, h, s, d] compute dtype."""
        return (q.astype(jnp.float32) * scale[..., None]).astype(self.dtype)

    @nn.compact
    def _concatenate_to_cache(self, key, value, query, position_ids=None):
        """Sequence-sharded KV cache insert (reference llama.py:440-492).

        Storage is head-major [b, h, T, d]: the flash-decoding kernel folds
        (b, h) into its grid with a FREE reshape (seq-major [b, T, h, d]
        storage forced a full-cache physical transpose every decode step —
        measured as the dominant HBM traffic of serving), and the (T, d)
        minor dims tile (8, 128) naturally for any head count.

        Decode (q_len==1): the token's write is routed to the owning sp
        shard with axis-index arithmetic inside shard_map. Prefill: a plain
        dynamic_update_slice that GSPMD re-shards as needed.

        kv_cache_dtype="int8" stores the cache quantized (per-token,
        per-head symmetric scales) — halves serving HBM at long context;
        reads dequantize to the compute dtype.

        Takes [b, s, h, d] key/value (attention-module layout); returns
        head-major (key, value, key_scale, value_scale) with scales
        [b, h, T] fp32 (or None, None when not quantized).
        """
        use_int8 = getattr(self.config, "kv_cache_dtype", "auto") == "int8"
        is_initialized = self.has_variable("cache", "cached_key")
        cache_dtype = jnp.int8 if use_int8 else key.dtype
        key = key.transpose(0, 2, 1, 3)      # [b, h, s, d]
        value = value.transpose(0, 2, 1, 3)
        cached_key = self.variable("cache", "cached_key", jnp.zeros, key.shape, cache_dtype)
        cached_value = self.variable("cache", "cached_value", jnp.zeros, value.shape, cache_dtype)
        prefix_len = int(getattr(self.config, "prefix_len", 0) or 0)
        if prefix_len > 0:
            # shared-prefix serving (ops/prefix.py): a frozen batch-1 KV
            # block rides in the cache collection next to the per-slot
            # suffix cache; the server injects the real values (built by
            # an ordinary batch-1 prefill) after init_cache. Never written
            # here — decode combines [prefix ++ suffix] by flash partials.
            pshape = (1, key.shape[1], prefix_len, key.shape[3])
            self.variable("cache", "prefix_key", jnp.zeros, pshape, cache_dtype)
            self.variable("cache", "prefix_value", jnp.zeros, pshape, cache_dtype)
            if use_int8:
                self.variable(
                    "cache", "prefix_key_scale", jnp.zeros, pshape[:-1], jnp.float32
                )
                self.variable(
                    "cache", "prefix_value_scale", jnp.zeros, pshape[:-1], jnp.float32
                )
        if use_int8:
            scale_shape = key.shape[:-1]     # [b, h, s]
            key_scale = self.variable(
                "cache", "cached_key_scale", jnp.zeros, scale_shape, jnp.float32
            )
            value_scale = self.variable(
                "cache", "cached_value_scale", jnp.zeros, scale_shape, jnp.float32
            )
            key, key_sc = self._quantize_kv(key)
            value, value_sc = self._quantize_kv(value)
        cache_index = self.variable("cache", "cache_index", lambda: jnp.array(0, jnp.int32))

        if is_initialized:
            max_length = cached_key.value.shape[2]
            cur_index = cache_index.value
            mesh = self._mesh
            if mesh is not None and mesh.size == 1:
                # 1-device mesh: plain dynamic_update_slice. The routed
                # shard_map write wraps every decode-step cache update in
                # SPMD custom-calls whose layout assignment lane-pads the
                # cache by heads (see _inference_attn note).
                mesh = None
            routed = query.shape[1] == 1 and mesh is not None
            per_row = (
                getattr(self.config, "decode_index", "shared") == "per_row"
                and position_ids is not None
            )  # q > 1 writes a per-row BLOCK at the row's offset — the
            # in-flight speculative verify path (serve.py lookup_k)
            # per_row pools with sp_slot_caches shard each slot's cache
            # over sp: the decode write routes per ROW to the shard that
            # owns its position (the per-row twin of the shared-index
            # routed write below)
            sp_routed = (
                per_row
                and mesh is not None
                and bool(getattr(self.config, "sp_slot_caches", False))
                and mesh.shape.get("sp", 1) > 1
                # decode (q=1) and speculative-verify blocks (1+lookup_k):
                # the routed write unrolls per token, so bound the width.
                # Wider per-row writes (admission prefills into fresh
                # slot caches) take the GSPMD vmap path below.
                and query.shape[1] <= 64
            )
            if per_row and not sp_routed:
                # per_row caches (serving slot pools) otherwise keep the
                # cache's seq dim unsharded BY CONSTRUCTION — on any mesh,
                # including sp>1 (where sp shards the shared PREFIX,
                # ops/prefix.py, not the per-slot suffix) — so the plain
                # per-row write below is GSPMD-partitionable (batch/head
                # dims shard, the seq-dim scatter stays local per shard)
                routed = False

            def update_cache(cached, new, seq_axis):
                if per_row:
                    # each batch row lands at its own position (slots at
                    # different depths decode in one step, serve.py); the
                    # inner arrays are [h, T, d] / [h, T] → seq axis 1.
                    # With a shared prefix, position_ids are GLOBAL
                    # (prefix_tokens + suffix index) for RoPE; the write
                    # index into the suffix-only cache is local.
                    rows = position_ids[:, 0].astype(jnp.int32) - int(
                        getattr(self.config, "prefix_tokens", 0) or 0
                    )
                    if sp_routed:
                        # sp-sharded slot caches: each sp shard owns a
                        # contiguous sp_size slice of every slot's cache;
                        # a row's token writes only on the shard whose
                        # slice holds its position. q>1 blocks (the
                        # 1+lookup_k speculative verify) unroll per token
                        # so a block straddling a shard boundary lands
                        # each token on its owning shard exactly.
                        q_len = query.shape[1]

                        def insert_rows(c, x, r):
                            sp_size = max_length // mesh.shape["sp"]
                            base = r - lax.axis_index("sp") * sp_size
                            for j in range(q_len):
                                xj = (
                                    x if q_len == 1
                                    else lax.slice_in_dim(
                                        x, j, j + 1, axis=seq_axis
                                    )
                                )
                                local = base + j
                                hit = jnp.logical_and(
                                    local >= 0, local < sp_size
                                )
                                local = jnp.clip(local, 0, sp_size - 1)
                                c_new = jax.vmap(
                                    lambda cc, xx, ii:
                                    lax.dynamic_update_slice_in_dim(
                                        cc, xx, ii, axis=seq_axis - 1
                                    )
                                )(c, xj, local)
                                keep = hit.reshape(
                                    (-1,) + (1,) * (c.ndim - 1)
                                )
                                c = jnp.where(keep, c_new, c)
                            return c

                        spec = [("dp", "fsdp"), "tp", None, None][: cached.ndim]
                        cache_spec, new_spec = list(spec), list(spec)
                        cache_spec[seq_axis] = "sp"
                        return shard_map(
                            insert_rows,
                            mesh=mesh,
                            in_specs=(
                                PS(*cache_spec), PS(*new_spec),
                                PS(("dp", "fsdp")),
                            ),
                            out_specs=PS(*cache_spec),
                            check_vma=False,
                        )(cached, new, rows)
                    return jax.vmap(
                        lambda c, x, i: lax.dynamic_update_slice_in_dim(
                            c, x, i, axis=seq_axis - 1
                        )
                    )(cached, new, rows)
                if not routed:
                    start = (0,) * seq_axis + (cur_index,) + (0,) * (
                        cached.ndim - seq_axis - 1
                    )
                    return lax.dynamic_update_slice(cached, new, start)

                def insert(c, x, idx):
                    sp_size = max_length // mesh.shape["sp"]
                    local = idx - lax.axis_index("sp") * sp_size
                    hit = jnp.logical_and(local >= 0, local < sp_size)
                    local = jnp.clip(local, 0, sp_size - 1)
                    c_new = lax.dynamic_update_slice_in_dim(
                        c, x, local, axis=seq_axis
                    )
                    return jnp.where(hit, c_new, c)

                # head-major: heads at dim 1 ("tp"), sequence at seq_axis
                spec = [("dp", "fsdp"), "tp", None, None][: cached.ndim]
                cache_spec, new_spec = list(spec), list(spec)
                cache_spec[seq_axis] = "sp"
                return shard_map(
                    insert,
                    mesh=mesh,
                    in_specs=(PS(*cache_spec), PS(*new_spec), PS()),
                    out_specs=PS(*cache_spec),
                    check_vma=False,
                )(cached, new, cur_index)

            key = update_cache(cached_key.value, key, 2)
            value = update_cache(cached_value.value, value, 2)
            cached_key.value = key
            cached_value.value = value
            if use_int8:
                key_sc = update_cache(key_scale.value, key_sc, 2)
                value_sc = update_cache(value_scale.value, value_sc, 2)
                key_scale.value = key_sc
                value_scale.value = value_sc
            cache_index.value = cache_index.value + query.shape[1]
        if use_int8:
            # scales returned raw: the Pallas decode kernel consumes the
            # int8 cache directly (half the HBM stream); other paths
            # dequantize at the call site
            return key, value, key_sc, value_sc
        return key, value, None, None

    def _ring_train(self, xq, xk, xv, attention_bias, segment_ids, deterministic, dropout_rng):
        config = self.config
        use_dropout = (
            not deterministic
            and config.attn_pdrop > 0.0
            and dropout_rng is not None
        )
        blockwise_kwargs = dict(
            causal_block_size=1,
            deterministic=deterministic,
            dropout_rng=None,  # a traced rng can't ride the shard_map closure
            attn_pdrop=config.attn_pdrop,
            query_chunk_size=config.scan_query_chunk_size,
            key_chunk_size=config.scan_key_chunk_size,
            dtype=self.dtype,
            policy=jax.checkpoint_policies.nothing_saveable,
            precision=self.precision,
            prevent_cse=not config.scan_layers,
            layout=getattr(config, "sp_layout", "contiguous"),
        )
        mesh = self._mesh
        if mesh is None:
            if use_dropout:
                # blockwise oracle supports dropout (flash_attention's
                # custom VJP doesn't carry an rng); XLA-autodiff backward
                return blockwise_attn(
                    xq, xk, xv, bias=attention_bias, segment_ids=segment_ids,
                    causal=True,
                    query_chunk_size=config.scan_query_chunk_size,
                    key_chunk_size=config.scan_key_chunk_size,
                    deterministic=False,
                    dropout_rng=dropout_rng,
                    attn_pdrop=config.attn_pdrop,
                    dtype=self.dtype,
                    precision=self.precision,
                )
            # single-device fallback: same math, flash custom-VJP backward
            # (autodiff through the chunk scan would save O(nq·nk) residuals)
            return flash_attention(
                xq, xk, xv, bias=attention_bias, segment_ids=segment_ids,
                causal=True,
                query_chunk_size=config.scan_query_chunk_size,
                key_chunk_size=config.scan_key_chunk_size,
                dtype=self.dtype,
                precision=self.precision,
                impl=getattr(config, "attn_impl", "auto"),
            )

        def ring_body(q, k, v, bias, segs, rng):
            bkw = dict(blockwise_kwargs)
            if rng is not None:
                # decorrelate tp shards: tile keys are global over sp, but
                # different tp shards hold different heads of the same tile
                bkw["dropout_rng"] = jax.random.fold_in(
                    jax.random.wrap_key_data(rng), jax.lax.axis_index("tp")
                )
            return ring_attention(
                q, k, v, bias, segs,
                axis_name="sp", float32_logits=True, cache_idx=None,
                blockwise_kwargs=bkw,
                impl=getattr(config, "attn_impl", "auto"),
            )

        rng_data = None
        if use_dropout:
            rng_data = dropout_rng
            if jnp.issubdtype(rng_data.dtype, jax.dtypes.prng_key):
                rng_data = jax.random.key_data(rng_data)
        ring_fn = shard_map(
            ring_body if use_dropout else partial(ring_body, rng=None),
            mesh=mesh,
            in_specs=(
                PS(("dp", "fsdp"), "sp", "tp", None),
                PS(("dp", "fsdp"), "sp", "tp", None),
                PS(("dp", "fsdp"), "sp", "tp", None),
                PS(("dp", "fsdp"), None, None, None),
                PS(("dp", "fsdp"), None),
            ) + ((PS(None),) if use_dropout else ()),
            out_specs=PS(("dp", "fsdp"), "sp", "tp", None),
            check_vma=False,
        )
        if segment_ids is None:
            segment_ids = jnp.zeros(
                (xq.shape[0], attention_bias.shape[-1]), jnp.int32
            )
        if use_dropout:
            out = ring_fn(xq, xk, xv, attention_bias, segment_ids, rng_data)
        else:
            out = ring_fn(xq, xk, xv, attention_bias, segment_ids)
        return with_sharding_constraint(out, PS(("dp", "fsdp"), "sp", "tp", None))

    def _plain_attn_dropout(self, xq, xk, xv, mask, dropout_rng):
        """Full-materialization attention with dropout on the softmax
        weights — the short-sequence training path (seq ≤ scan chunks),
        matching the reference's non-scan `dot_product_attention_weights`
        semantics (reference llama.py:570-597). xq: [b,q,h,d]; xk, xv:
        head-major [b,h,k,d]."""
        pdrop = self.config.attn_pdrop
        xk = self._expand_kv(xk, 1)
        xv = self._expand_kv(xv, 1)
        bias = jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min)
        logits = jnp.einsum(
            "bqhd,bhkd->bhqk",
            xq.astype(jnp.float32),
            xk.astype(jnp.float32),
            precision=self.precision,
        ) / np.sqrt(self.head_dim)
        probs = jax.nn.softmax(logits + bias, axis=-1)
        keep = jax.random.bernoulli(dropout_rng, 1.0 - pdrop, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - pdrop), 0.0)
        out = jnp.einsum(
            "bhqk,bhkd->bqhd", probs, xv.astype(jnp.float32),
            precision=self.precision,
        )
        return out.astype(self.dtype)

    def _inference_attn(self, xq, xk, xv, attention_mask,
                        k_scale=None, v_scale=None, kv_len=None,
                        prefix=None):
        """Decode / short-prefill over (possibly cached) kv.
        xq: [b, q, h, d]; xk, xv: head-major [b, h, kv, d] (the cache's
        storage layout — the decode kernel folds (b, h) into its grid with
        a free reshape; seq-major storage cost a full-cache transpose per
        decode step). attention_mask: bool [b, 1, q, kv_total].
        k_scale/v_scale: [b, h, kv] int8-cache dequant scales (kernel path
        consumes them in-place); kv_len bounds the valid cache for block
        skipping. prefix: optional (pk, pv, pk_scale, pv_scale) frozen
        shared-prefix KV block [1, h_kv, P, d] (ops/prefix.py) — every row
        attends to it in full before its own (suffix) cache; outputs merge
        by flash partials."""
        mesh = self._mesh
        if mesh is not None and mesh.size == 1:
            # a trivial 1-device mesh (e.g. eval apps running the training
            # mesh grammar '1,1,1,1') must take the same single-chip kernel
            # paths as mesh_dim=None: the shard_map fallback below routes
            # long prefills through transpose copies whose layout puts the
            # HEAD count on the 128-lane axis — a 6-head fp32 cache padded
            # 21.3x OOM'd a 6L/768 model at 5K context (27.3G for a 108MB
            # cache, round-3 eval_needle). serve.py:111-117 normalizes the
            # same way at the CLI layer.
            mesh = None
        impl = getattr(self.config, "attn_impl", "auto")
        prefix_mask = None
        if prefix is not None:
            P = prefix[0].shape[2]
            p_true = int(getattr(self.config, "prefix_tokens", 0) or P)
            prefix_mask = jnp.arange(P) < p_true
        use_decode_kernel = (
            mesh is None
            and xq.shape[1] == 1
            and (impl == "pallas" or (impl == "auto" and jax.default_backend() == "tpu"))
        )
        if use_decode_kernel:
            from lwm_tpu.ops.pallas_decode import flash_decode_pallas

            if prefix is not None:
                from lwm_tpu.ops.prefix import decode_with_prefix

                return decode_with_prefix(
                    xq, xk, xv, attention_mask[:, 0, 0, :],
                    xk.shape[2] if kv_len is None else kv_len,
                    prefix[0], prefix[1], prefix_mask,
                    k_scale=k_scale, v_scale=v_scale,
                    pk_scale=prefix[2], pv_scale=prefix[3],
                )
            return flash_decode_pallas(
                xq, xk, xv, attention_mask[:, 0, 0, :],
                xk.shape[2] if kv_len is None else kv_len,
                k_scale=k_scale, v_scale=v_scale,
            )
        if (
            prefix is not None
            and mesh is not None
            and xq.shape[1] == 1
            and (impl == "pallas" or (impl == "auto" and jax.default_backend() == "tpu"))
        ):
            # sharded prefix decode on the kernel path: batch over
            # dp/fsdp, kv heads (and the folded prefix query-head dim)
            # over tp, and the PREFIX sequence over sp (each shard
            # streams P/sp; merge = pmax+psum of flash partials)
            from lwm_tpu.ops.prefix import decode_with_prefix_sharded

            return decode_with_prefix_sharded(
                mesh, xq, xk, xv, attention_mask[:, 0, 0, :],
                xk.shape[2] if kv_len is None else kv_len,
                prefix[0], prefix[1], prefix_mask,
                k_scale=k_scale, v_scale=v_scale,
                pk_scale=prefix[2], pv_scale=prefix[3],
                interpret=(jax.default_backend() != "tpu"),
            ).astype(self.dtype)
        if k_scale is not None:
            xk = self._dequantize_kv(xk, k_scale)
            xv = self._dequantize_kv(xv, v_scale)
        pk = pv = None
        if prefix is not None:
            pk, pv = prefix[0], prefix[1]
            if prefix[2] is not None:  # int8 prefix → compute dtype here
                pk = self._dequantize_kv(pk, prefix[2])
                pv = self._dequantize_kv(pv, prefix[3])
        # prefill over a (possibly much longer) cache: the flash kernel
        # with q_offset = cache write index. The XLA fallback materializes
        # f32 logits [b, h, q, T_max] against the FULL cache (2GB at
        # 2K q × 32K cache) and spends compute on the causally-dead tail;
        # the kernel's global-position causal masking + tile skipping
        # bound both to the written prefix.
        use_prefill_kernel = (
            mesh is None
            and xq.shape[1] > 1
            and kv_len is not None          # cache present (else plain causal)
            and (impl == "pallas" or (impl == "auto" and jax.default_backend() == "tpu"))
            and xq.shape[1] % 8 == 0
            and xk.shape[2] % 128 == 0
            and (pk is None or pk.shape[2] % 128 == 0)
        )
        if use_prefill_kernel:
            from lwm_tpu.ops.blockwise import BIG_NEG
            from lwm_tpu.ops.pallas_flash import flash_attention_fwd_pallas

            if (
                getattr(self.config, "decode_index", "shared") == "per_row"
                and xq.shape[1] <= 64
            ):
                # speculative-verify rows have PER-ROW causal frontiers
                # (serve.py lookup_k): the shared q_offset below is only an
                # upper bound, so exactness comes from the full-tile bias
                # (cheap at verify widths; admission prefills take the
                # per-key branch)
                bias = jnp.where(attention_mask, 0.0, BIG_NEG)
            else:
                # last query row's mask = key validity ∧ (kpos ≤ frontier);
                # conjoined with the kernel's per-row causal mask this is
                # exact for every row (rows share the frontier here)
                key_mask = attention_mask[:, 0, -1, :]
                bias = jnp.where(key_mask, 0.0, BIG_NEG)[:, None, None, :]
            out, lse = flash_attention_fwd_pallas(
                xq,
                xk,  # head-major cache consumed in place (kv_head_major):
                xv,  # the seq-major transpose is a 21x-padded copy at few
                bias=bias.astype(jnp.float32),  # heads; GQA routes via
                causal=True,                    # the index map
                q_offset=kv_len - xq.shape[1],
                kv_head_major=True,
            )
            if pk is not None:
                from lwm_tpu.ops.prefix import combine_lse

                b = xq.shape[0]
                pk_hm, pv_hm = pk, pv              # [1, h_kv, P, d]
                if b > 1:   # admission prefills are batch-1; this is the
                    # correctness fallback for wider prefix prefills
                    pk_hm = jnp.broadcast_to(pk_hm, (b,) + pk_hm.shape[1:])
                    pv_hm = jnp.broadcast_to(pv_hm, (b,) + pv_hm.shape[1:])
                p_bias = jnp.where(prefix_mask, 0.0, BIG_NEG)
                out_p, lse_p = flash_attention_fwd_pallas(
                    xq, pk_hm, pv_hm,
                    bias=p_bias[None, None, None, :].astype(jnp.float32),
                    causal=False,   # prompt tokens all see the whole prefix
                    kv_head_major=True,
                )
                out = combine_lse(out, lse, out_p, lse_p)
            return out.astype(self.dtype)
        if mesh is None or pk is not None:
            # GQA: the XLA fallback runs at the query head count (the
            # kernel paths above consumed the narrow cache natively; the
            # mesh path expands per-shard inside ring_attention_inference).
            # Prefix + mesh also lands here: with sp=1 the concat einsum
            # auto-partitions under GSPMD (batch over dp/fsdp, heads over
            # tp) — a sharded Pallas prefix path is a follow-up
            if pk is not None:
                # shared-prefix oracle: concat [prefix ++ suffix] (the
                # kernel paths above keep the ranges separate — this
                # full-materialization path is the numerics reference)
                b = xq.shape[0]
                xk = jnp.concatenate(
                    [jnp.broadcast_to(pk, (b,) + pk.shape[1:]), xk], axis=2
                )
                xv = jnp.concatenate(
                    [jnp.broadcast_to(pv, (b,) + pv.shape[1:]), xv], axis=2
                )
                p_mask = jnp.broadcast_to(
                    prefix_mask[None, None, None, :],
                    attention_mask.shape[:3] + (pk.shape[2],),
                )
                attention_mask = jnp.concatenate(
                    [p_mask, attention_mask], axis=-1
                )
            xk = self._expand_kv(xk, 1)
            xv = self._expand_kv(xv, 1)
            bias = jnp.where(attention_mask, 0.0, jnp.finfo(jnp.float32).min)
            logits = jnp.einsum(
                "bqhd,bhkd->bhqk",
                xq.astype(jnp.float32),
                xk.astype(jnp.float32),
                precision=self.precision,
            ) / np.sqrt(self.head_dim)
            logits = logits + bias  # [b,1,q,kv] broadcasts over heads
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum(
                "bhqk,bhkd->bqhd", probs, xv.astype(jnp.float32),
                precision=self.precision,
            )
            return out.astype(self.dtype)
        # mesh path: head-major cache [b, h, T, d] goes straight through —
        # decode steps run the per-shard flash-decoding kernel inside
        # shard_map, short prefills use the XLA chunked-flash tile
        # shard q over sp only when its length divides evenly (shard_map
        # requires it); odd prefill lengths (e.g. prompt+257 vision codes)
        # fall back to replicated q — fine, prefills here are short
        q_sharded = xq.shape[1] > 1 and xq.shape[1] % mesh.shape["sp"] == 0
        q_sp_dim = "sp" if q_sharded else None
        # batch shards over (dp, fsdp) only when it divides evenly —
        # undersized batches (e.g. HF's eval_shape(init_weights) trace at
        # batch 1 during wrapper construction) run replicated
        dpf = mesh.shape.get("dp", 1) * mesh.shape.get("fsdp", 1)
        b_dim = ("dp", "fsdp") if xq.shape[0] % dpf == 0 else None
        fn = shard_map(
            partial(
                ring_attention_inference,
                axis_name="sp",
                q_sharded=q_sharded,
                key_chunk_size=self.config.scan_key_chunk_size,
                impl=impl,
            ),
            mesh=mesh,
            in_specs=(
                PS(b_dim, q_sp_dim, "tp", None),
                PS(b_dim, "tp", "sp", None),
                PS(b_dim, "tp", "sp", None),
                PS(b_dim, None, q_sp_dim, None),
            ),
            out_specs=PS(b_dim, q_sp_dim, "tp", None),
            check_vma=False,
        )
        return fn(xq, xk, xv, attention_mask).astype(self.dtype)

    def __call__(
        self,
        hidden_states,
        attention_mask,
        segment_ids,
        position_ids,
        deterministic: bool = True,
        init_cache: bool = False,
        output_attentions: bool = False,
    ):
        config = self.config
        xq, xk, xv = self.wq(hidden_states), self.wk(hidden_states), self.wv(hidden_states)

        # decode steps (q_len 1) can't shard the singleton seq dim over sp
        kv_seq = None if xq.shape[1] == 1 else "sp"
        if xq.shape[1] == 1:
            xq = with_sharding_constraint(xq, PS(("dp", "fsdp"), None, "tp"))
        else:
            xq = with_sharding_constraint(xq, PS(("dp", "fsdp"), "sp", "tp"))
        xk = with_sharding_constraint(xk, PS(("dp", "fsdp"), kv_seq, "tp"))
        xv = with_sharding_constraint(xv, PS(("dp", "fsdp"), kv_seq, "tp"))

        xq = self._split_heads(xq)
        xk = self._split_kv_heads(xk)
        xv = self._split_kv_heads(xv)

        # constrain the gathered rotary table to the indices' (batch, seq)
        # sharding: with striped position_ids this is a true gather, and
        # without the constraint GSPMD back-propagates the head-dim split
        # from the rotary multiply onto it → involuntary full remat
        freqs_cis = take_freqs_cis(self.freqs_cis, position_ids)
        if freqs_cis.shape[1] > 1:
            freqs_cis = with_sharding_constraint(
                freqs_cis, PS(("dp", "fsdp"), "sp", None)
            )
        xq, xk = apply_rotary_emb(xq, xk, freqs_cis=freqs_cis, dtype=self.dtype)

        dropout_rng = None
        if not deterministic and config.attn_pdrop > 0.0:
            dropout_rng = self.make_rng("dropout")

        has_cache = self.has_variable("cache", "cached_key") or init_cache
        single_dev = self._mesh is None or self._mesh.size == 1
        use_ring = config.scan_attention and xq.shape[1] > max(
            config.scan_query_chunk_size, config.scan_key_chunk_size
        )
        if use_ring and has_cache and single_dev:
            # single-chip long prefill over a cache: the ring branch would
            # transpose + head-expand the FULL padded cache (its copies lay
            # the head count on the 128-lane axis: a 6-head fp32 cache
            # padded 21.3x OOM'd at 27.3G for a 108MB cache — round-3
            # eval_needle at 5K context on '1,1,1,1'). The prefill-over-
            # cache kernel in _inference_attn consumes the head-major
            # cache natively and bounds work to the written prefix.
            use_ring = False
        if use_ring and int(getattr(config, "prefix_len", 0) or 0) > 0:
            raise NotImplementedError(
                "shared-prefix models serve bucket-sized forwards; build "
                "the prefix itself with a prefix_len=0 model (serve.py "
                "chunks long prefixes through the cache)"
            )
        if use_ring:
            # long-sequence path: ring attention with bias-form padding mask
            if self.has_variable("cache", "cached_key") or init_cache:
                xk, xv, k_sc, v_sc = self._concatenate_to_cache(
                    xk, xv, xq, position_ids
                )
                if k_sc is not None:  # ring kernels need the dense cache
                    xk = self._dequantize_kv(xk, k_sc)
                    xv = self._dequantize_kv(xv, v_sc)
                # cache is head-major [b,h,T,d]; ring wants seq-major —
                # a one-time transpose (this branch is prefill-only)
                xk = xk.transpose(0, 2, 1, 3)
                xv = xv.transpose(0, 2, 1, 3)
            # grouped ring: kv stays NARROW through the flash/ring custom
            # VJPs end to end — saved residuals, ICI kv rotation, the fwd
            # HBM stream, AND the backward (the Pallas dkv grid accumulates
            # each group in-kernel; only the XLA oracle expands per kv
            # block transiently). Expand up front only when the narrow
            # heads can't shard over tp, or for the dropout blockwise
            # oracle (which has no GQA routing).
            mesh_ = self._mesh
            tp = 1 if mesh_ is None else mesh_.shape["tp"]
            use_dropout_oracle = (
                not deterministic
                and config.attn_pdrop > 0.0
                and dropout_rng is not None
                and mesh_ is None
            )
            if xk.shape[2] % tp != 0 or use_dropout_oracle:
                xk = self._expand_kv(xk, 2)
                xv = self._expand_kv(xv, 2)
            mask4 = jnp.expand_dims(attention_mask, axis=(-3, -2))  # [b,1,1,S]
            attention_bias = lax.select(
                mask4 > 0,
                jnp.full(mask4.shape, 0.0).astype(self.dtype),
                jnp.full(mask4.shape, jnp.finfo(self.dtype).min).astype(self.dtype),
            )
            attn_output = self._ring_train(
                xq, xk, xv, attention_bias, segment_ids, deterministic, dropout_rng
            )
        else:
            query_length, key_length = xq.shape[1], xk.shape[1]
            if self.has_variable("cache", "cached_key"):
                max_decoder_length = self.variables["cache"]["cached_key"].shape[2]
                per_row_q = (
                    getattr(config, "decode_index", "shared") == "per_row"
                    and position_ids is not None
                )
                if per_row_q:
                    # per-row frontiers (slots decode at different depths;
                    # speculative verify feeds q>1 rows per slot): row j of
                    # slot i sees keys at local positions ≤ its own write
                    # position — derived from position_ids, not the shared
                    # cache_index
                    local_pos = position_ids.astype(jnp.int32) - int(
                        getattr(config, "prefix_tokens", 0) or 0
                    )
                    causal_mask = (
                        jnp.arange(max_decoder_length)[None, None, :]
                        <= local_pos[:, :, None]
                    )[:, None]                     # [b, 1, q, T]
                else:
                    # decode: causal frontier derives from the write index
                    mask_shift = self.variables["cache"]["cache_index"]
                    causal_mask = (
                        jnp.arange(max_decoder_length)[None]
                        <= (jnp.arange(query_length) + mask_shift)[:, None]
                    )[None, None]
                segment_mask = None
            else:
                causal_mask = (
                    jnp.arange(key_length)[None]
                    <= jnp.arange(query_length)[:, None]
                )[None, None]
                if segment_ids is not None:
                    segment_mask = (
                        segment_ids[:, :, None] == segment_ids[:, None, :]
                    )[:, None]
                else:
                    segment_mask = None

            batch_size = hidden_states.shape[0]
            causal_mask = jnp.broadcast_to(
                causal_mask, (batch_size,) + causal_mask.shape[1:]
            )
            mask = jnp.broadcast_to(
                jnp.expand_dims(attention_mask, axis=(-3, -2)), causal_mask.shape
            ).astype(bool)
            mask = jnp.logical_and(mask, causal_mask)
            if segment_mask is not None:
                mask = jnp.logical_and(mask, segment_mask)

            kv_len = None
            k_sc = v_sc = None
            if self.has_variable("cache", "cached_key") or init_cache:
                if self.has_variable("cache", "cached_key"):
                    kv_len = (
                        self.variables["cache"]["cache_index"] + query_length
                    )
                xk, xv, k_sc, v_sc = self._concatenate_to_cache(
                    xk, xv, xq, position_ids
                )
            else:
                # no cache: match the head-major [b, h, s, d] kv contract
                # of _inference_attn / _plain_attn_dropout (XLA transposes
                # for the MXU dot anyway — this just makes it explicit)
                xk = xk.transpose(0, 2, 1, 3)
                xv = xv.transpose(0, 2, 1, 3)

            if not deterministic and config.attn_pdrop > 0.0 and dropout_rng is not None:
                # short-seq TRAINING with attention dropout: plain softmax
                # attention with inverted-scale dropout on the weights
                # (reference's non-scan path semantics); GSPMD shards it —
                # inputs already carry their sharding constraints
                if k_sc is not None:
                    xk = self._dequantize_kv(xk, k_sc)
                    xv = self._dequantize_kv(xv, v_sc)
                attn_output = self._plain_attn_dropout(
                    xq, xk, xv, mask, dropout_rng
                )
            else:
                prefix = None
                if (
                    int(getattr(config, "prefix_len", 0) or 0) > 0
                    and self.has_variable("cache", "prefix_key")
                ):
                    cache_vars = self.variables["cache"]
                    prefix = (
                        cache_vars["prefix_key"],
                        cache_vars["prefix_value"],
                        cache_vars.get("prefix_key_scale"),
                        cache_vars.get("prefix_value_scale"),
                    )
                attn_output = self._inference_attn(
                    xq, xk, xv, mask, k_sc, v_sc, kv_len, prefix=prefix
                )

        attn_output = self._merge_heads(attn_output)
        attn_output = self.wo(attn_output)
        attn_output = self.resid_dropout(attn_output, deterministic=deterministic)
        return (attn_output, None) if output_attentions else (attn_output,)


class FlaxLLaMAMLP(nn.Module):
    """SwiGLU feed-forward (reference llama.py:623-661)."""

    config: LLaMAConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    precision: Optional[Union[jax.lax.Precision, str]] = None

    def setup(self):
        config = self.config
        dense = partial(
            _dense_cls(config),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=jax.nn.initializers.normal(config.initializer_range),
            precision=self.precision,
        )
        self.w1 = dense(config.intermediate_size)
        self.w2 = dense(config.hidden_size)
        self.w3 = dense(config.intermediate_size)
        self.dropout = nn.Dropout(rate=config.resid_pdrop)

    def __call__(self, x, deterministic: bool = True):
        x = self.w2(nn.silu(self.w1(x)) * self.w3(x))
        return self.dropout(x, deterministic=deterministic)


class FlaxLLaMABlock(nn.Module):
    config: LLaMAConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    precision: Optional[Union[jax.lax.Precision, str]] = None

    def setup(self):
        mlp_module = FlaxLLaMAMLP
        if self.config.scan_mlp:
            mlp_module = remat(
                mlp_module,
                static_argnums=(1,),
                policy=jax.checkpoint_policies.nothing_saveable,
                prevent_cse=not self.config.scan_layers,
            )
        self.attention = FlaxLLaMAAttention(
            self.config, dtype=self.dtype, param_dtype=self.param_dtype,
            precision=self.precision,
        )
        self.feed_forward = mlp_module(
            self.config, dtype=self.dtype, param_dtype=self.param_dtype,
            precision=self.precision,
        )
        self.attention_norm = RMSNorm(
            self.config.hidden_size, eps=self.config.rms_norm_eps,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.ffn_norm = RMSNorm(
            self.config.hidden_size, eps=self.config.rms_norm_eps,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def __call__(
        self,
        hidden_states,
        attention_mask=None,
        segment_ids=None,
        position_ids=None,
        deterministic: bool = True,
        init_cache: bool = False,
        output_attentions: bool = False,
    ):
        attn_outputs = self.attention(
            self.attention_norm(hidden_states),
            attention_mask,
            segment_ids,
            position_ids,
            deterministic,
            init_cache,
            output_attentions,
        )
        hidden_states = hidden_states + attn_outputs[0]

        ffn_input = self.ffn_norm(hidden_states)
        if (
            self.config.scan_mlp
            and hidden_states.shape[1] >= self.config.scan_mlp_chunk_size
            and hidden_states.shape[1] % self.config.scan_mlp_chunk_size == 0
        ):
            # chunked feed-forward: the remat wrapper on feed_forward bounds
            # each chunk's intermediates; an unrolled loop (not lax.scan)
            # because flax modules cannot be called inside raw lax control
            # flow. deterministic is positional: nn.remat drops kwargs.
            chunk = self.config.scan_mlp_chunk_size
            n_chunks = hidden_states.shape[1] // chunk
            ffn_output = jnp.concatenate(
                [
                    self.feed_forward(
                        ffn_input[:, i * chunk : (i + 1) * chunk], deterministic
                    )
                    for i in range(n_chunks)
                ],
                axis=1,
            )
        else:
            ffn_output = self.feed_forward(ffn_input, deterministic)
        ffn_output = with_sharding_constraint(
            ffn_output, PS(("dp", "fsdp"), None, "tp")
        )
        hidden_states = hidden_states + ffn_output
        if self.config.scan_layers:
            return hidden_states, None
        return hidden_states


class FlaxLLaMABlockCollection(nn.Module):
    """Layer stack: nn.scan with stacked params on `param_scan_axis`
    (compiles the layer loop once; reference llama.py:898-979)."""

    config: LLaMAConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    precision: Optional[Union[jax.lax.Precision, str]] = None

    @nn.compact
    def __call__(
        self,
        hidden_states,
        attention_mask=None,
        segment_ids=None,
        position_ids=None,
        deterministic: bool = True,
        init_cache: bool = False,
        output_attentions: bool = False,
        output_hidden_states: bool = False,
    ):
        all_attentions = () if output_attentions else None
        all_hidden_states = () if output_hidden_states else None

        # block-level remat: without it each layer saves ~10 fp32
        # [b, s, hidden]-sized residuals (norms, projections, silu) and long
        # contexts OOM HBM. Skipped on cache paths (decode mutates the cache
        # collection inside, and no grads flow there anyway).
        block_module = FlaxLLaMABlock
        use_cache_path = init_cache or self.is_mutable_collection("cache")
        if self.config.remat_block != "none" and not use_cache_path:
            if self.config.remat_block == "save_flash":
                # keep the flash attention outputs (out, lse): the backward
                # recomputes only the cheap parts (norms, projections,
                # rotary, MLP) and skips the expensive flash fwd replay
                policy = jax.checkpoint_policies.save_only_these_names(
                    "flash_out", "flash_lse"
                )
            elif self.config.remat_block == "offload_flash":
                # as save_flash, but the kept residuals live in pinned host
                # memory: frees ~L·b·s·h bytes of HBM at long context for
                # one d2h/h2d stream per layer
                policy = jax.checkpoint_policies.save_and_offload_only_these_names(
                    names_which_can_be_saved=[],
                    names_which_can_be_offloaded=["flash_out", "flash_lse"],
                    offload_src="device",
                    offload_dst="pinned_host",
                )
            else:
                policy = getattr(jax.checkpoint_policies, self.config.remat_block)
            block_module = remat(
                FlaxLLaMABlock,
                static_argnums=(4, 5, 6),  # deterministic, init_cache, output_attentions
                policy=policy,
                prevent_cse=not self.config.scan_layers,
            )

        if self.config.scan_layers:
            initializing = self.is_mutable_collection("params")
            params_spec = (
                self.config.param_scan_axis
                if initializing
                else nn_partitioning.ScanIn(self.config.param_scan_axis)
            )
            hidden_states, _ = nn.scan(
                block_module,
                variable_axes={"params": params_spec, "cache": 0, "intermediates": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(
                    nn.broadcast, nn.broadcast, nn.broadcast,
                    nn.broadcast, nn.broadcast, nn.broadcast,
                ),
                length=self.config.num_hidden_layers,
                metadata_params={nn.PARTITION_NAME: "scan_decoder_layer"},
            )(
                self.config, name="scan_decoder", dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(
                hidden_states,
                attention_mask,
                segment_ids,
                position_ids,
                deterministic,
                init_cache,
                output_attentions,
            )
        else:
            for i in range(self.config.num_hidden_layers):
                if output_hidden_states:
                    all_hidden_states += (hidden_states,)
                hidden_states = block_module(
                    self.config, name=str(i), dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )(
                    hidden_states,
                    attention_mask,
                    segment_ids,
                    position_ids,
                    deterministic,
                    init_cache,
                    output_attentions,
                )
        return hidden_states, all_hidden_states, all_attentions


def embed_lookup(embed: nn.Embed, input_ids):
    """Embedding lookup with GSPMD-friendly sharding.

    The table is constrained replicated before the take — the same
    all-gather FSDP performs for every other weight — so the gather
    partitions as index-passthrough and the output is born with the
    indices' (batch, seq) sharding. Without this, GSPMD propagates the
    table's hidden-dim sharding (PS("tp", ("fsdp","sp"))) onto the gather
    output and falls back to "involuntary full rematerialization" of the
    [b, s, h] activation on every step (and the backward scatter mirrors
    it) — catastrophic at 1M-token context.
    """
    table = with_sharding_constraint(embed.embedding, PS(None, None))
    out = jnp.take(table.astype(embed.dtype), input_ids, axis=0)
    if out.ndim == 3 and out.shape[1] > 1:  # [b, s, h] train/prefill
        out = with_sharding_constraint(out, PS(("dp", "fsdp"), "sp", None))
    return out


class FlaxLLaMAModule(nn.Module):
    config: LLaMAConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    precision: Optional[Union[jax.lax.Precision, str]] = None

    def setup(self):
        self.wte = nn.Embed(
            self.config.vocab_size,
            self.config.hidden_size,
            embedding_init=jax.nn.initializers.normal(
                stddev=self.config.initializer_range
            ),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.dropout = nn.Dropout(rate=self.config.embd_pdrop)
        self.h = FlaxLLaMABlockCollection(
            self.config, dtype=self.dtype, param_dtype=self.param_dtype,
            precision=self.precision,
        )
        self.ln_f = RMSNorm(
            self.config.hidden_size, eps=self.config.rms_norm_eps,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def __call__(
        self,
        input_ids,
        attention_mask,
        segment_ids,
        position_ids,
        deterministic=True,
        init_cache: bool = False,
        output_attentions: bool = False,
        output_hidden_states: bool = False,
        return_dict: bool = True,
    ):
        assert input_ids.shape[1] <= self.config.max_sequence_length, (
            input_ids.shape[1], self.config.max_sequence_length
        )
        hidden_states = embed_lookup(self.wte, input_ids.astype("i4"))
        hidden_states = self.dropout(hidden_states, deterministic=deterministic)

        hidden_states, all_hidden_states, all_attentions = self.h(
            hidden_states,
            attention_mask,
            segment_ids=segment_ids,
            position_ids=position_ids,
            deterministic=deterministic,
            init_cache=init_cache,
            output_attentions=output_attentions,
            output_hidden_states=output_hidden_states,
        )
        hidden_states = self.ln_f(hidden_states)
        if output_hidden_states:
            all_hidden_states += (hidden_states,)

        if not return_dict:
            return tuple(
                v for v in (hidden_states, all_hidden_states, all_attentions)
                if v is not None
            )
        return FlaxBaseModelOutput(
            last_hidden_state=hidden_states,
            hidden_states=all_hidden_states,
            attentions=all_attentions,
        )


class FlaxLLaMAForCausalLMModule(nn.Module):
    config: LLaMAConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    precision: Optional[Union[jax.lax.Precision, str]] = None

    def forward_hidden(
        self,
        input_ids,
        attention_mask=None,
        segment_ids=None,
        position_ids=None,
        deterministic: bool = True,
    ):
        """Final (ln_f) hidden states without the lm_head projection — pairs
        with losses.fused_lm_cross_entropy so [seq, vocab] logits never
        materialize during long-context training."""
        batch_size, seq_length = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                default_position_ids(self.config, seq_length),
                (batch_size, seq_length),
            )
        outputs = self.transformer(
            input_ids, attention_mask, segment_ids, position_ids,
            deterministic=deterministic, return_dict=True,
        )
        return outputs.last_hidden_state

    def setup(self):
        self.transformer = FlaxLLaMAModule(self.config, dtype=self.dtype)
        # tied embeddings feed the fp wte kernel through lm_head.apply —
        # only an untied head owns a kernel that can be int8-quantized
        head_cls = (
            nn.Dense if self.config.tie_word_embeddings
            else _dense_cls(self.config)
        )
        self.lm_head = head_cls(
            self.config.vocab_size,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=jax.nn.initializers.normal(
                stddev=self.config.initializer_range
            ),
            precision=self.precision,
        )

    def __call__(
        self,
        input_ids,
        attention_mask=None,
        segment_ids=None,
        position_ids=None,
        deterministic: bool = True,
        init_cache: bool = False,
        output_attentions: bool = False,
        output_hidden_states: bool = False,
        return_dict: bool = True,
    ):
        batch_size, seq_length = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                default_position_ids(self.config, seq_length),
                (batch_size, seq_length),
            )
        outputs = self.transformer(
            input_ids,
            attention_mask,
            segment_ids,
            position_ids,
            deterministic=deterministic,
            init_cache=init_cache,
            output_attentions=output_attentions,
            output_hidden_states=output_hidden_states,
            return_dict=True,
        )
        hidden_states = outputs.last_hidden_state

        tail = getattr(self.config, "logits_tail", 0)
        if tail and seq_length > tail:
            hidden_states = hidden_states[:, -tail:]

        if self.config.tie_word_embeddings:
            shared_kernel = self.transformer.variables["params"]["wte"]["embedding"].T
            lm_logits = self.lm_head.apply(
                {"params": {"kernel": shared_kernel}}, hidden_states
            )
        else:
            lm_logits = self.lm_head(hidden_states)

        if not return_dict:
            return (lm_logits,) + (outputs.hidden_states, outputs.attentions)
        return FlaxCausalLMOutput(
            logits=lm_logits,
            hidden_states=outputs.hidden_states,
            attentions=outputs.attentions,
        )


class FlaxLLaMAPreTrainedModel(FlaxPreTrainedModel):
    """HF-compatible wrapper: init_weights / init_cache / __call__ / generate
    (reference llama.py:746-896)."""

    config_class = LLaMAConfig
    base_model_prefix = "transformer"
    module_class: nn.Module = None

    def __init__(
        self,
        config: LLaMAConfig,
        input_shape: Tuple = (1, 1),
        seed: int = 0,
        dtype: jnp.dtype = jnp.float32,
        _do_init: bool = True,
        **kwargs,
    ):
        module = self.module_class(config=config, dtype=dtype, **kwargs)
        super().__init__(
            config, module, input_shape=input_shape, seed=seed, dtype=dtype,
            _do_init=_do_init,
        )

    def init_weights(self, rng, input_shape, params: FrozenDict = None) -> FrozenDict:
        input_ids = jnp.zeros(input_shape, dtype="i4")
        attention_mask = jnp.ones_like(input_ids)
        position_ids = jnp.broadcast_to(
            jnp.arange(input_shape[-1]), input_shape
        )
        params_rng, dropout_rng = jax.random.split(rng)
        module_init_outputs = self.module.init(
            {"params": params_rng, "dropout": dropout_rng},
            input_ids, attention_mask, None, position_ids,
            return_dict=False,
        )
        random_params = module_init_outputs["params"]
        if params is not None:
            random_params = flatten_dict(unfreeze(random_params))
            params = flatten_dict(unfreeze(params))
            for missing_key in self._missing_keys:
                params[missing_key] = random_params[missing_key]
            self._missing_keys = set()
            return freeze(unflatten_dict(params))
        return random_params

    def init_cache(self, batch_size, max_length):
        # jitted: an eagerly-driven module.init is a large partially-eager
        # program, which the axon TPU client fails at runtime with
        # UNIMPLEMENTED (NOTES.md round-2 rule: outer-jit such programs).
        # Inside an outer jit this inlines; standalone it is one dispatch.
        @jax.jit
        def build():
            input_ids = jnp.ones((batch_size, max_length))
            attention_mask = jnp.ones_like(input_ids)
            position_ids = jnp.broadcast_to(
                jnp.arange(max_length)[None], input_ids.shape
            )
            return self.module.init(
                jax.random.PRNGKey(0), input_ids, attention_mask, None,
                position_ids, return_dict=False, init_cache=True,
            )["cache"]

        return build()

    def __call__(
        self,
        input_ids,
        attention_mask=None,
        segment_ids=None,
        position_ids=None,
        params: dict = None,
        past_key_values: dict = None,
        dropout_rng=None,
        train: bool = False,
        output_attentions: Optional[bool] = None,
        output_hidden_states: Optional[bool] = None,
        return_dict: Optional[bool] = None,
    ):
        output_attentions = (
            output_attentions
            if output_attentions is not None
            else self.config.output_attentions
        )
        output_hidden_states = (
            output_hidden_states
            if output_hidden_states is not None
            else self.config.output_hidden_states
        )
        return_dict = (
            return_dict if return_dict is not None else self.config.return_dict
        )
        batch_size, sequence_length = input_ids.shape
        if position_ids is None:
            if past_key_values is not None:
                raise ValueError(
                    "position_ids required when passing past_key_values"
                )
            position_ids = jnp.broadcast_to(
                jnp.arange(sequence_length)[None, :],
                (batch_size, sequence_length),
            )
        if attention_mask is None:
            attention_mask = jnp.ones((batch_size, sequence_length))

        rngs = {}
        if dropout_rng is not None:
            rngs["dropout"] = dropout_rng

        inputs = {"params": params or self.params}
        if past_key_values:
            inputs["cache"] = past_key_values
            mutable = ["cache"]
        else:
            mutable = False

        outputs = self.module.apply(
            inputs,
            jnp.array(input_ids, dtype="i4"),
            jnp.array(attention_mask, dtype="i4"),
            segment_ids,
            jnp.array(position_ids, dtype="i4"),
            not train,
            False,
            output_attentions,
            output_hidden_states,
            return_dict,
            rngs=rngs,
            mutable=mutable,
        )
        if past_key_values is not None and return_dict:
            outputs, past_key_values = outputs
            outputs["past_key_values"] = unfreeze(past_key_values["cache"])
            return outputs
        elif past_key_values is not None and not return_dict:
            outputs, past_key_values = outputs
            outputs = outputs[:1] + (unfreeze(past_key_values["cache"]),) + outputs[1:]
        return outputs


def default_position_ids(config, seq_length):
    """arange for the contiguous layout; the stripe-slot→position map when
    the loader feeds the striped sequence layout (ops/striped.py)."""
    if getattr(config, "sp_layout", "contiguous") == "striped" and config.mesh_dim:
        from lwm_tpu.ops.striped import stripe_positions

        sp = LLaMAConfig.get_jax_mesh(config.mesh_dim).shape["sp"]
        return jnp.asarray(stripe_positions(seq_length, sp), jnp.int32)[None]
    return jnp.arange(seq_length, dtype=jnp.int32)[None]


def round_cache_length(config, max_length):
    """KV cache and its mask are sp-sharded: round the cache length up to a
    multiple of the sp extent so generation works on sp>1 meshes (the
    reference requires sp=1 for its sampling apps; we pad instead — the
    tail positions are never written and stay causally masked).

    Single-device caches round up to a 1024 multiple instead: the
    flash-decoding kernel's block search (`ops.pallas_decode._best_block_k`)
    then always gets its full-size block — an unaligned length like 30976
    forces 256-wide blocks, measured 2.1x slower decode. The padding
    (≤1023 slots) is never written and stays masked."""
    if config.mesh_dim is None:
        if max_length > 1024:
            return int(-(-max_length // 1024) * 1024)
        return max_length
    sp = LLaMAConfig.get_jax_mesh(config.mesh_dim).shape["sp"]
    if max_length >= sp * 1024:
        # per-shard length a 1024 multiple → the per-shard decode kernel
        # always gets its full-size block (shorter caches land in the
        # single-whole-block case, which is always legal)
        return int(-(-max_length // (sp * 1024)) * (sp * 1024))
    return int(-(-max_length // sp) * sp)


class FlaxLLaMAForCausalLM(FlaxLLaMAPreTrainedModel):
    module_class = FlaxLLaMAForCausalLMModule

    def prepare_inputs_for_generation(self, input_ids, max_length, attention_mask=None):
        batch_size, seq_length = input_ids.shape
        cache_length = round_cache_length(self.config, max_length)
        past_key_values = self.init_cache(batch_size, cache_length)
        # left-padding convention: positions advance only over real tokens
        extended_attention_mask = jnp.ones((batch_size, cache_length), dtype="i4")
        if attention_mask is not None:
            position_ids = attention_mask.cumsum(axis=-1) - 1
            extended_attention_mask = lax.dynamic_update_slice(
                extended_attention_mask, attention_mask.astype("i4"), (0, 0)
            )
        else:
            position_ids = jnp.broadcast_to(
                jnp.arange(seq_length, dtype="i4")[None, :],
                (batch_size, seq_length),
            )
        return {
            "past_key_values": past_key_values,
            "attention_mask": extended_attention_mask,
            "position_ids": position_ids,
        }

    def update_inputs_for_generation(self, model_outputs, model_kwargs):
        model_kwargs["past_key_values"] = model_outputs.past_key_values
        model_kwargs["position_ids"] = model_kwargs["position_ids"][:, -1:] + 1
        return model_kwargs
