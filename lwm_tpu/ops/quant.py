"""Weight-only int8 quantization for serving.

Autoregressive decode is weight-bandwidth-bound: each token streams every
dense kernel (wq/wk/wv/wo/w1/w2/w3, lm_head) out of HBM once. Storing
those kernels as int8 with one fp32 scale per OUTPUT channel halves the
stream. Because the scale is per output column it commutes past the
contraction — ``x @ (q * s) == (x @ q) * s`` — so dequantization is a
single [1, f]-row multiply on the matmul result, never a materialized
bf16 copy of the weight.

Which impl wins (measured, v5e-lite, 256M decode, NOTES.md round-3):
the XLA-scheduled ``(x @ q.astype(dtype)) * scale`` — 1709.6 tok/s
decode-only vs 1324.3 bf16 (1.29x) vs 1256.4 for the Pallas
dequant-matmul kernel vs 1162.7 for the native-int8 W8A8 kernel. XLA's
GEMV emitter streams the int8 weight near the HBM roof and fuses the
convert; hand-written kernels at GEMV shapes only hurt. ``impl='auto'``
therefore resolves to the XLA path everywhere; the Pallas kernels stay
as explicit A/B knobs (``'pallas'``, ``'w8a8'``) and regression
oracles. The one kernel-level lesson that mattered is encoded in
``_gemv_blocks``: weight-block HBM segments must be wide (measured 155
vs 213 GB/s at 512- vs 4096-byte segments).

This pairs with the int8 KV cache (`kv_cache_dtype='int8'`,
models/llama.py + ops/pallas_decode.py): weights + cache are the two HBM
streams of a decode step. Reference parity note: the reference
(LargeWorldModel/LWM) has no quantized serving path — this is
beyond-reference, motivated by the serving-bandwidth studies in
NOTES.md.

Scope/contract:
- Post-training, symmetric, per-output-channel (axis-0 max / 127).
- Serving only: `Int8Dense` has no meaningful gradient story (params
  are int8); the trainer never constructs it.
- The Pallas path is single-device (serving meshes are `!1,1,1,1`-style
  or mesh_dim=None); under a >1-device mesh `Int8Dense` takes the XLA
  path, which GSPMD partitions like any dot.

W8A8 accuracy caveat (ADVICE r2): dynamic per-row activation quant is
outlier-sensitive on real LLM activations — a single large channel in a
row inflates that row's scale and crushes the rest to few effective
bits (the classic W8A8 failure mode; real models often need per-channel
activation scales or SmoothQuant-style outlier migration, which this
path deliberately does not implement). Mitigations here: (a) the logits
heads (`W8A8_EXCLUDE`: lm_head/vision_head) keep full-precision
activations under `impl='w8a8'` — they take the weight-only dequant
path instead, so greedy decode never argmaxes over
activation-quantized logits; (b) the end-to-end bound in
tests/test_quant.py is a toy-model sanity gate, NOT a real-model
accuracy claim — before serving a production checkpoint with
`int8_w8a8`, run a greedy-parity / perplexity check on that checkpoint
(see docs/serving.md). Measured gates on real in-framework-trained
checkpoints (round 5): int8 KV cache scores 100% retrieval parity with
bf16 on the vision-needle grid (30/30 across 32,896-token contexts);
int8 weights track bf16 greedy decode at 0.82-0.84 first-16-token
agreement on the needle-QA target — benchmarks/quant_accuracy_gate.py
runs the gate on any checkpoint.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# dense-kernel param names eligible for weight-only quantization (the
# bandwidth-dominant serving matmuls; reference param tree names)
QUANT_TARGETS = (
    "wq", "wk", "wv", "wo", "w1", "w2", "w3", "lm_head", "vision_head",
)

# layers that keep full-precision ACTIVATIONS even under impl='w8a8':
# greedy decode argmaxes the logits, so the output heads are where
# per-row activation-quant outlier error is least acceptable (see the
# module docstring); their weights stay int8 (dequant-matmul path).
W8A8_EXCLUDE = ("lm_head", "vision_head")


def quantize_weight(w):
    """Symmetric per-output-channel int8: returns (q int8 [d, f],
    scale f32 [f]) with w ≈ q * scale and |w - q*scale| ≤ scale/2."""
    w32 = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=0) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _block(n, cap, mult):
    """Largest divisor of n that is ≤ cap and a multiple of `mult`
    (falls back to n itself when n ≤ cap)."""
    if n <= cap:
        return n
    for b in range(cap - cap % mult, mult - 1, -mult):
        if n % b == 0:
            return b
    b = cap
    while n % b:
        b //= 2
    return b


def _int8_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nd):
    kd = pl.program_id(2)

    @pl.when(kd == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # int8 → compute dtype in VMEM: the HBM stream stays at 1 byte/weight
    acc_ref[...] += jnp.dot(
        x_ref[...], w_ref[...].astype(x_ref.dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kd == nd - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


def _gemv_blocks(mp, block_f, block_d):
    """GEMV-regime block choice: decode matmuls are a pure weight stream,
    and the stream's HBM efficiency is set by the contiguous segment each
    block reads from the [d, f] weight — a (bd, bf) block reads bd
    segments of bf bytes (int8). Small-f blocks (the old 512×512 default)
    produce short strided segments: measured 155 GB/s vs 213 GB/s with
    (bd=128, bf=4096) on a [1024, 32000] GEMV (benchmarks/
    quant_matmul_bench.py). Wide-m (prefill) shapes keep squarer blocks
    for MXU utilization."""
    if mp <= 64:
        return 4096, 128
    return block_f, block_d


def int8_matmul_pallas(
    x, w_q, scale, *, block_m=256, block_f=512, block_d=512,
    interpret=False,
):
    """x [m, d] (bf16/f32) @ int8 w_q [d, f], dequantized by per-column
    fp32 `scale` [f] on the way out: returns [m, f] in x.dtype."""
    m, d = x.shape
    d2, f = w_q.shape
    assert d == d2 and scale.shape == (f,), (x.shape, w_q.shape, scale.shape)
    # m: pad to a sublane multiple (decode GEMV is m = batch, often < 8)
    mp = -(-m // 8) * 8
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    block_f, block_d = _gemv_blocks(mp, block_f, block_d)
    bm = _block(mp, block_m, 8)
    bf = _block(f, block_f, 128)
    bd = _block(d, block_d, 128)
    nd = d // bd

    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel, nd=nd),
        grid=(mp // bm, f // bf, nd),
        in_specs=[
            pl.BlockSpec((bm, bd), lambda i, j, kd: (i, kd)),
            pl.BlockSpec((bd, bf), lambda i, j, kd: (kd, j)),
            pl.BlockSpec((1, bf), lambda i, j, kd: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bf), lambda i, j, kd: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, f), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bf), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w_q, scale.astype(jnp.float32).reshape(1, f))
    return out[:m] if mp != m else out


def int8_matmul_xla(x, w_q, scale):
    """Oracle / non-TPU fallback: same math, XLA-scheduled."""
    return (x @ w_q.astype(x.dtype)) * scale.astype(x.dtype)


def _w8a8_matmul_kernel(x_ref, sx_ref, w_ref, sw_ref, o_ref, acc_ref, *, nd):
    kd = pl.program_id(2)

    @pl.when(kd == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # int8 × int8 → int32 on the MXU directly: no per-weight VPU convert
    # anywhere (the W8A16 kernel above is convert-bound at GEMV shapes —
    # measured slower than bf16 XLA on a 256M decode, NOTES.md round-2)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(kd == nd - 1)
    def _():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * sx_ref[...] * sw_ref[...]
        ).astype(o_ref.dtype)


def w8a8_matmul_pallas(
    x_q, x_scale, w_q, w_scale, *, out_dtype, block_m=256, block_f=512,
    block_d=512, interpret=False,
):
    """Native-int8 MXU matmul: int8 x_q [m, d] (per-row f32 scale [m, 1])
    @ int8 w_q [d, f] (per-column f32 scale [f]) → [m, f] out_dtype.

    int32 accumulation is exact for d·127² ≤ 2³¹ (d ≲ 130K)."""
    m, d = x_q.shape
    d2, f = w_q.shape
    assert d == d2 and w_scale.shape == (f,) and x_scale.shape == (m, 1)
    mp = -(-m // 32) * 32  # int8 sublane tile is 32
    if mp != m:
        x_q = jnp.pad(x_q, ((0, mp - m), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, mp - m), (0, 0)))
    block_f, block_d = _gemv_blocks(mp, block_f, block_d)
    bm = _block(mp, block_m, 32)
    bf = _block(f, block_f, 128)
    bd = _block(d, block_d, 128)
    nd = d // bd

    out = pl.pallas_call(
        functools.partial(_w8a8_matmul_kernel, nd=nd),
        grid=(mp // bm, f // bf, nd),
        in_specs=[
            pl.BlockSpec((bm, bd), lambda i, j, kd: (i, kd)),
            pl.BlockSpec((bm, 1), lambda i, j, kd: (i, 0)),
            pl.BlockSpec((bd, bf), lambda i, j, kd: (kd, j)),
            pl.BlockSpec((1, bf), lambda i, j, kd: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bf), lambda i, j, kd: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, f), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bf), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_q, x_scale.astype(jnp.float32), w_q,
      w_scale.astype(jnp.float32).reshape(1, f))
    return out[:m] if mp != m else out


def quantize_activations(x):
    """Dynamic symmetric per-row int8: returns (x_q int8 [m, d],
    scale f32 [m, 1]) with x ≈ x_q * scale."""
    x32 = jnp.asarray(x, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, 1e-12)
    x_q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


def w8a8_matmul(x, w_q, w_scale, *, interpret=False):
    """x (f32/bf16) [..., d] @ int8 w_q [d, f]: quantize x per row, run the
    native-int8 kernel, dequantize by (row scale × column scale)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    x_q, x_scale = quantize_activations(x.reshape(-1, d))
    y = w8a8_matmul_pallas(
        x_q, x_scale, w_q, w_scale, out_dtype=x.dtype, interpret=interpret
    )
    return y.reshape(*lead, w_q.shape[-1])


def w8a8_matmul_xla(x, w_q, w_scale):
    """XLA oracle for the W8A8 path: same dynamic activation quant, the
    matmul in int32 via dot_general (exact), scales applied after."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    x_q, x_scale = quantize_activations(x.reshape(-1, d))
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * x_scale * w_scale.astype(jnp.float32)[None, :]
    return y.astype(x.dtype).reshape(*lead, w_q.shape[-1])


class Int8Dense(nn.Module):
    """Drop-in serving replacement for the reference tree's dense layers:
    params are `kernel` (int8, same name so the partition-rule tables
    keep matching) and `scale` (f32 per output channel). Populate via
    `quantize_params_int8`; fresh-init params are zeros (serving-only).

    Accepts the same construction kwargs as the `nn.Dense` partial in
    models/llama.py so the two are interchangeable at `setup()` sites.
    """

    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    kernel_init: Any = None    # accepted for nn.Dense API parity; the
    precision: Any = None      # int8 kernel is converter-populated
    impl: str = "auto"         # 'auto' | 'pallas' | 'xla' | 'w8a8'
    interpret: bool = False

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        kernel = self.param(
            "kernel", jax.nn.initializers.zeros, (d, self.features), jnp.int8
        )
        scale = self.param(
            "scale", jax.nn.initializers.ones, (self.features,), jnp.float32
        )
        x = jnp.asarray(x, self.dtype)
        impl = self.impl
        if impl == "w8a8" and self.name in W8A8_EXCLUDE:
            impl = "auto"  # logits heads: weight-only, fp activations
        if impl == "auto":
            # measured (v5e-lite, 256M decode, NOTES.md round-3): the
            # XLA-scheduled dequant-matmul decodes at 1709.6 tok/s vs
            # 1256.4 for the Pallas kernel and 1324.3 for bf16 — XLA's
            # GEMV emitter streams int8 weights near the HBM roof and
            # fuses the convert; keep 'pallas' as an explicit A/B knob
            impl = "xla"
        if impl == "w8a8" and jax.default_backend() not in ("tpu",) and not self.interpret:
            y = w8a8_matmul_xla(x, kernel, scale)  # CPU: same W8A8 math
        elif impl == "w8a8":
            y = w8a8_matmul(x, kernel, scale, interpret=self.interpret)
        elif impl == "pallas":
            lead = x.shape[:-1]
            y = int8_matmul_pallas(
                x.reshape(-1, d), kernel, scale, interpret=self.interpret
            ).reshape(*lead, self.features)
        else:
            y = int8_matmul_xla(x, kernel, scale)
        if self.use_bias:
            bias = self.param(
                "bias", jax.nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )
            y = y + jnp.asarray(bias, self.dtype)
        return y


def quantize_params_int8(params, targets=QUANT_TARGETS):
    """Convert a served param tree in place of the fp one: every
    `<name>/kernel` with <name> in `targets` becomes int8 plus a sibling
    `<name>/scale`. The result loads into a model built with
    `quant_dense='int8'` (same tree structure, same partition-rule
    matches on 'kernel'). Works on scanned or unscanned trees — scanned
    stacked kernels [L, d, f] are quantized per (layer, output channel).
    """
    flat = flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        if len(path) >= 2 and path[-1] == "kernel" and path[-2] in targets:
            if leaf.ndim == 2:
                q, s = quantize_weight(leaf)
            elif leaf.ndim == 3:  # scanned: [L, d, f] (scan_axis 0)
                q, s = jax.vmap(quantize_weight)(leaf)
            else:
                raise ValueError(f"unexpected kernel rank at {path}: {leaf.shape}")
            out[path] = q
            out[path[:-1] + ("scale",)] = s
        else:
            out[path] = leaf
    return unflatten_dict(out)
