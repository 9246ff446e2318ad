"""Striped sequence layout helpers (Striped Attention, arXiv:2311.09431).

With contiguous sp shards, causal masking makes the ring compute-imbalanced:
at ring step t a device either computes a full unmasked block or skips
entirely, and some device always computes — so wall-clock per step is a full
block regardless of causality (~2× the causal-optimal work).

The striped layout assigns device i the token positions {i, i+sp, i+2sp, …}:
every (device, ring-step) pair then carries a ~half-masked tile load, and
the causal saving is realized every step.

Layout mapping: global slot j (the array order fed to the model) holds the
token at position p(j) = (j // sq_local)·1 + (j % sq_local)·sp — i.e. device
i's local slot r is position i + r·sp. Batches (tokens, targets, masks) are
permuted once by the loader; position_ids carry the true positions so RoPE
and causal masks are exact; the loss is an elementwise sum, so training is
mathematically identical to the contiguous layout.
"""

from __future__ import annotations

import numpy as np


def stripe_positions(seq_length: int, sp: int) -> np.ndarray:
    """positions[j] = token position held at global slot j."""
    assert seq_length % sp == 0, (seq_length, sp)
    sq_local = seq_length // sp
    j = np.arange(seq_length)
    return (j // sq_local) + (j % sq_local) * sp


def _take(array, idx, axis):
    if isinstance(array, np.ndarray):
        return np.take(array, idx, axis=axis)
    import jax.numpy as jnp  # traced/device arrays stay in jax-land

    return jnp.take(array, idx, axis=axis)


def stripe_permute(array, sp: int, axis: int = -1):
    """Reorder a contiguous-position array into the striped slot layout:
    out[..., j, ...] = array[..., positions[j], ...]."""
    positions = stripe_positions(array.shape[axis], sp)
    return _take(array, positions, axis)


def stripe_unpermute(array, sp: int, axis: int = -1):
    """Inverse of stripe_permute (slot layout → position order)."""
    positions = stripe_positions(array.shape[axis], sp)
    inverse = np.empty_like(positions)
    inverse[positions] = np.arange(len(positions))
    return _take(array, inverse, axis)
