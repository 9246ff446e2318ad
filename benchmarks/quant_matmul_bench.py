"""Microbench: serving-GEMV matmul kernels — bf16 XLA vs int8 W8A16
(Pallas dequant-matmul) vs int8 W8A8 (native int8 MXU).

Isolates the KERNEL cost of each quantized path from the end-to-end
decode program (dispatch, attention, collectives), at the exact matmul
shapes a decode step issues. Decode is weight-HBM-bound, so the
speed-of-light ratio for int8 weights is 2×; whatever fraction of that
the kernel delivers here bounds what it can deliver end-to-end.

QM_M (default 8) is the GEMV row count (batch after sublane padding).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from lwm_tpu.ops.quant import (
    int8_matmul_pallas,
    quantize_weight,
    w8a8_matmul,
)

M = int(os.environ.get("QM_M", 8))
STEPS = int(os.environ.get("QM_STEPS", 50))
# the 256M decode model's dense shapes (hidden 1024, inter 3072, vocab 32K)
SHAPES = [(1024, 1024), (1024, 3072), (3072, 1024), (1024, 32000)]


K = int(os.environ.get("QM_K", 8))  # distinct weights per loop iteration


def timeit(matmul, x, weight_copies):
    """Time matmuls inside ONE jitted fori_loop, K DISTINCT weight copies
    per iteration. Two sources of bias cancelled: per-dispatch tunnel
    overhead (~700us — loop inside jit), and per-fori-iteration overhead
    (~135us measured on axon — amortized over K matmuls/iteration).
    Distinct weights force a real HBM stream (one resident weight would
    sit in VMEM); the bump carries a data dependency so nothing is CSE'd
    or dead-coded."""

    @jax.jit
    def chain(x0, copies):  # weights as ARGS: closed-over arrays would be
        def body(i, xc):    # inlined as constants into the compile payload
            acc = jnp.float32(0)
            for wargs in copies:
                y = matmul(xc, *wargs)
                acc += jnp.mean(y, dtype=jnp.float32)
            return xc.at[:, 0].add((acc * 1e-6).astype(xc.dtype))

        return jax.lax.fori_loop(0, STEPS, body, x0)

    jax.device_get(chain(x, weight_copies))  # compile + warm
    t0 = time.perf_counter()
    out = chain(x, weight_copies)
    jax.device_get(out)
    per_iter = (time.perf_counter() - t0) / STEPS
    return (per_iter - LOOP_OVERHEAD_S) / K


LOOP_OVERHEAD_S = 0.0  # measured below and subtracted


def measure_loop_overhead(x):
    @jax.jit
    def chain(x0):
        def body(i, xc):
            return xc.at[:, 0].add(jnp.float32(1e-6).astype(xc.dtype))

        return jax.lax.fori_loop(0, STEPS, body, x0)

    jax.device_get(chain(x))
    t0 = time.perf_counter()
    jax.device_get(chain(x))
    return (time.perf_counter() - t0) / STEPS


def main():
    global LOOP_OVERHEAD_S
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.standard_normal((M, 1024)), jnp.bfloat16)
    LOOP_OVERHEAD_S = measure_loop_overhead(x0)
    print(
        f"m={M} steps={STEPS} k={K} device={jax.devices()[0].device_kind} "
        f"loop_overhead={LOOP_OVERHEAD_S*1e6:.1f}us/iter"
    )
    for d, f in SHAPES:
        x = jnp.asarray(rng.standard_normal((M, d)), jnp.bfloat16)
        ws_bf16, ws_q = [], []
        for i in range(K):
            w = jnp.asarray(
                rng.standard_normal((d, f)) * 0.02, jnp.bfloat16
            )
            wq, wscale = quantize_weight(w)
            ws_bf16.append((jax.device_put(w),))
            ws_q.append((jax.device_put(wq), jax.device_put(wscale)))

        t_bf16 = timeit(lambda a, b: a @ b, x, ws_bf16)
        t_w8a16 = timeit(int8_matmul_pallas, x, ws_q)
        t_w8a8 = timeit(w8a8_matmul, x, ws_q)

        bytes_bf16, bytes_i8 = d * f * 2, d * f + 4 * f
        gbps = lambda t, b: b / t / 1e9
        print(
            f"[{d}x{f}] bf16 {t_bf16*1e6:7.1f}us ({gbps(t_bf16, bytes_bf16):6.1f} GB/s) | "
            f"w8a16 {t_w8a16*1e6:7.1f}us ({t_bf16/t_w8a16:4.2f}x, {gbps(t_w8a16, bytes_i8):6.1f} GB/s) | "
            f"w8a8 {t_w8a8*1e6:7.1f}us ({t_bf16/t_w8a8:4.2f}x, {gbps(t_w8a8, bytes_i8):6.1f} GB/s)"
        )


if __name__ == "__main__":
    main()
