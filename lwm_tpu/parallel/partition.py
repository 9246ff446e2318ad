"""Partition-rule matching and shard/gather utilities.

Replaces the ``tux`` sharding helpers the reference consumes
(SURVEY.md §2.8: match_partition_rules, make_shard_and_gather_fns,
with_sharding_constraint). Rules are ``(regex, PartitionSpec)`` pairs matched
against '/'-joined parameter paths; first match wins.
"""

from __future__ import annotations

import re
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as PS


def tree_path_to_string(path, sep="/"):
    keys = []
    for key in path:
        if isinstance(key, jax.tree_util.SequenceKey):
            keys.append(str(key.idx))
        elif isinstance(key, jax.tree_util.DictKey):
            keys.append(str(key.key))
        elif isinstance(key, jax.tree_util.GetAttrKey):
            keys.append(str(key.name))
        elif isinstance(key, jax.tree_util.FlattenedIndexKey):
            keys.append(str(key.key))
        else:
            keys.append(str(key))
    return sep.join(keys)


def named_tree_map(f, tree, *rest, is_leaf=None, sep="/"):
    """tree_map where f receives the '/'-joined path string as first arg."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x, *r: f(tree_path_to_string(path, sep=sep), x, *r),
        tree,
        *rest,
        is_leaf=is_leaf,
    )


def match_partition_rules(rules, tree):
    """Map each leaf to the PartitionSpec of the first rule whose regex
    matches (``re.search``) the leaf's path string."""

    def get_spec(path, leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 0:
            return PS()  # scalars are always replicated
        for rule, spec in rules:
            if re.search(rule, path) is not None:
                return spec
        raise ValueError(f"no partition rule matched param path: {path}")

    return named_tree_map(get_spec, tree)


def _current_mesh():
    try:
        from jax._src import mesh as _mesh_lib

        return _mesh_lib.thread_resources.env.physical_mesh
    except Exception:  # pragma: no cover - future JAX refactors
        return jax.interpreters.pxla.thread_resources.env.physical_mesh


def with_sharding_constraint(x, partition_spec):
    """Mesh-context-aware sharding constraint; no-op outside a mesh."""
    mesh = _current_mesh()
    if mesh.empty:
        return x
    axis_names = set(mesh.axis_names)

    def flatten(spec_entry):
        if spec_entry is None:
            return []
        if isinstance(spec_entry, (tuple, list)):
            return list(spec_entry)
        return [spec_entry]

    names = set(sum((flatten(e) for e in partition_spec), []))
    if not names.issubset(axis_names):
        return x
    # a dim that doesn't divide its mesh axes can't take the constraint
    # (e.g. batch-1 prefix-builder forwards on a dp/fsdp mesh) — drop the
    # offending entries and let GSPMD propagate instead
    if hasattr(x, "shape") and len(partition_spec) <= len(x.shape):
        cleaned = []
        for dim, entry in enumerate(partition_spec):
            size = 1
            for name in flatten(entry):
                size *= mesh.shape[name]
            cleaned.append(entry if x.shape[dim] % size == 0 else None)
        partition_spec = type(partition_spec)(*cleaned)
    return jax.lax.with_sharding_constraint(x, partition_spec)


def make_shard_and_gather_fns(partition_specs, mesh, dtype_specs=None):
    """Per-leaf shard (host→device with NamedSharding, optional dtype cast)
    and gather (device→host numpy) function trees.

    ``dtype_specs`` may be a dtype (cast all float leaves) or a tree of
    dtypes. Mirrors the tux contract used at reference train.py:277-279 and
    vision_chat.py:189-191.
    """
    float_dtypes = (jnp.bfloat16, jnp.float16, jnp.float32, jnp.float64)

    def maybe_cast(x, dtype_spec):
        dtype = None
        if dtype_spec is not None and not isinstance(dtype_spec, (np.ndarray, jax.Array)):
            dtype = dtype_spec
        elif hasattr(dtype_spec, "dtype"):
            dtype = dtype_spec.dtype
        if dtype is not None and hasattr(x, "dtype") and x.dtype in float_dtypes:
            return x.astype(dtype)
        return x

    def make_shard_fn(spec, dtype_spec=None):
        sharding = NamedSharding(mesh, spec)

        def shard_fn(x):
            return jax.device_put(maybe_cast(x, dtype_spec), sharding)

        return shard_fn

    def make_gather_fn(spec, dtype_spec=None):
        def gather_fn(x):
            return jax.device_get(maybe_cast(x, dtype_spec))

        return gather_fn

    if dtype_specs is None or isinstance(dtype_specs, type) or hasattr(dtype_specs, "itemsize"):
        shard_fns = jax.tree_util.tree_map(
            lambda spec: make_shard_fn(spec, dtype_specs),
            partition_specs,
            is_leaf=lambda x: isinstance(x, PS),
        )
        gather_fns = jax.tree_util.tree_map(
            lambda spec: make_gather_fn(spec, dtype_specs),
            partition_specs,
            is_leaf=lambda x: isinstance(x, PS),
        )
    else:
        shard_fns = jax.tree_util.tree_map(
            make_shard_fn, partition_specs, dtype_specs,
            is_leaf=lambda x: isinstance(x, PS),
        )
        gather_fns = jax.tree_util.tree_map(
            make_gather_fn, partition_specs, dtype_specs,
            is_leaf=lambda x: isinstance(x, PS),
        )
    return shard_fns, gather_fns


def specs_to_shardings(tree, mesh):
    """PartitionSpec pytree → NamedSharding pytree for jax.jit shardings
    (jax ≥0.8 requires concrete Shardings outside a set_mesh context)."""
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        tree,
        is_leaf=lambda x: isinstance(x, PS),
    )


def tree_apply(fns, tree):
    """Apply a tree of functions leaf-wise to a matching tree of values."""
    return jax.tree_util.tree_map(lambda fn, x: fn(x), fns, tree)


def get_weight_decay_mask(exclusions):
    """Optax weight-decay mask: False for leaves whose path matches any
    exclusion regex (reference: tux.get_mask fed by
    get_weight_decay_exclusions, train.py:137)."""

    def decay(path, _):
        return all(re.search(rule, path) is None for rule in exclusions)

    def mask_fn(params):
        return named_tree_map(decay, params)

    return mask_fn


def get_frozen_mask(frozen_regexes):
    """Boolean tree: True where params are frozen (zero-grad)."""

    def frozen(path, _):
        return any(re.search(rule, path) is not None for rule in frozen_regexes)

    def mask_fn(params):
        return named_tree_map(frozen, params)

    return mask_fn


def get_frozen_base_mask(trainable_exclusions):
    """True (frozen) for every param whose path matches NONE of the
    trainable exclusions — the freeze-base finetuning mask fed by
    ``Config.get_frozen_param_exclusions(freeze_base=True)`` (reference
    llama.py:289-294: train only vte/vision_head on top of a frozen base)."""

    def frozen(path, _):
        return all(re.search(rule, path) is None for rule in trainable_exclusions)

    def mask_fn(params):
        return named_tree_map(frozen, params)

    return mask_fn


def global_sharded_batch(batch, mesh, pspecs):
    """Assemble host-local numpy batch shards into global jax.Arrays
    (reference data.py:501 host_local_array_to_global_array)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        def put(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))

        if isinstance(pspecs, PS):
            return jax.tree_util.tree_map(lambda x: put(x, pspecs), batch)
        return jax.tree_util.tree_map(put, batch, pspecs)
    return multihost_utils.host_local_array_to_global_array(batch, mesh, pspecs)
