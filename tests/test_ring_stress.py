"""Deep-context multi-shard ring stress: sp=8 at 256K tokens (toy width).

VERDICT r2 item 8: the ring path's multi-shard coverage previously topped
out at seq=256 dryruns; hardware can't host sp>1 here, so this locks the
sp=8 numerics at a real long-context shape on the forced-CPU mesh. The
oracle is the single-device XLA blockwise path (`blockwise_attn`) — the
same oracle the kernel tests use — so a ring-schedule bug (wrong rotation
order, off-by-one block offsets, bad online-softmax rescale across ring
steps) cannot hide behind short sequences where every shard sees every
block in one or two hops.

Forward-only: O(T²) attention at 256K is ~2e12 FLOPs per pass on CPU;
backward coverage at depth exists at 8K in test_attention.py and the
custom-VJP ring grads are seq-length-invariant in structure.

Two tiers (this host has ONE core, so the 8 device threads serialize —
O(T²) wall time): 32K runs in the default suite; the full 256K tier is
env-gated (RING_STRESS_256K=1, ~20-30 min) and was run green once per
round — see NOTES.md. Both need the conftest's raised XLA-CPU collective
rendezvous timeouts (the stock 40s watchdog kills the process mid-ring).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as PS

from lwm_tpu.ops import ring_attention
from lwm_tpu.ops.blockwise import blockwise_attn
from lwm_tpu.parallel import create_mesh

import os

SEQ = 256 * 1024 if os.environ.get("RING_STRESS_256K") == "1" else 32 * 1024
CHUNK = 4096


def test_ring_sp8_256k_matches_blockwise_oracle():
    mesh = create_mesh("1,1,1,8")  # pure sp=8
    b, h, d = 1, 1, 16
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    # moderate-scale values: at 256K the softmax denominator sums ~T
    # terms, so fp32 accumulation error grows with T — keep logits tame
    q = jax.random.normal(keys[0], (b, SEQ, h, d), jnp.float32) * 0.5
    k = jax.random.normal(keys[1], (b, SEQ, h, d), jnp.float32) * 0.5
    v = jax.random.normal(keys[2], (b, SEQ, h, d), jnp.float32)

    bkw = dict(
        causal_block_size=1,
        deterministic=True,
        dropout_rng=None,
        attn_pdrop=0.0,
        query_chunk_size=CHUNK,
        key_chunk_size=CHUNK,
        dtype=jnp.float32,
        policy=jax.checkpoint_policies.nothing_saveable,
        precision=None,
        prevent_cse=True,
    )

    ring = shard_map(
        partial(
            ring_attention,
            axis_name="sp",
            float32_logits=True,
            cache_idx=None,
            blockwise_kwargs=bkw,
        ),
        mesh=mesh,
        in_specs=(
            PS(("dp", "fsdp"), "sp", "tp", None),
            PS(("dp", "fsdp"), "sp", "tp", None),
            PS(("dp", "fsdp"), "sp", "tp", None),
            PS(("dp", "fsdp"), None, None, None),
            PS(("dp", "fsdp"), None),
        ),
        out_specs=PS(("dp", "fsdp"), "sp", "tp", None),
        check_vma=False,
    )
    seg = jnp.zeros((b, SEQ), jnp.int32)
    with mesh:
        out = jax.jit(lambda *a: ring(*a))(q, k, v, None, seg)
    out = np.asarray(out)

    want = np.asarray(
        jax.jit(
            partial(
                blockwise_attn,
                causal=True,
                query_chunk_size=CHUNK,
                key_chunk_size=CHUNK,
                deterministic=True,
                dropout_rng=None,
                attn_pdrop=0.0,
                dtype=jnp.float32,
                policy=jax.checkpoint_policies.nothing_saveable,
                precision=None,
                prevent_cse=True,
                float32_logits=True,
            )
        )(q, k, v, None, None)
    )
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, want, atol=3e-5, rtol=3e-5)

    # spot-check absolute sanity at the extremes: the first row attends
    # only to itself (output == v[0]), guarding against a global
    # rotation/offset bug that allclose-vs-oracle would catch only if the
    # oracle were also wrong
    np.testing.assert_allclose(
        out[0, 0, 0], np.asarray(v[0, 0, 0]), atol=1e-5
    )
