"""Device-mesh construction for the 4-axis (dp, fsdp, tp, sp) substrate.

The mesh grammar follows the reference CLI contract (SURVEY.md §2.4;
reference llama.py:201-218): a comma-separated list of ints, one of which may
be ``-1`` (inferred from the device count), with an optional leading ``!``
meaning "reshape ``jax.devices()`` in raw enumeration order" instead of
letting ``mesh_utils`` optimize the physical layout.

Axis semantics (outermost → innermost, so that `sp`/`tp` ride ICI and
`dp`/`fsdp` may span DCN across slices):
  dp   — pure data parallelism (batch)
  fsdp — fully-sharded data parallelism (batch + weight shards)
  tp   — tensor parallelism (heads / hidden features)
  sp   — sequence parallelism (ring attention over the sequence dim)
"""

from __future__ import annotations

import dataclasses
import math

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

MESH_AXES = ("dp", "fsdp", "tp", "sp")


def parse_mesh_dims(mesh_dim: str, n_devices: int, n_axes: int = 4):
    """Parse the mesh_dim grammar into concrete per-axis sizes.

    Returns (dims, strict_order) where strict_order corresponds to a leading
    '!' (use raw device enumeration order).
    """
    s = mesh_dim.strip()
    strict_order = s.startswith("!")
    if strict_order:
        s = s[1:]
    dims = [int(x) for x in s.split(",")]
    if len(dims) != n_axes:
        raise ValueError(
            f"mesh_dim {mesh_dim!r} has {len(dims)} entries, expected {n_axes}"
        )
    if sum(d == -1 for d in dims) > 1:
        raise ValueError(f"mesh_dim {mesh_dim!r} has more than one -1 entry")
    if -1 in dims:
        known = math.prod(d for d in dims if d != -1)
        if n_devices % known != 0:
            raise ValueError(
                f"cannot infer -1 in {mesh_dim!r}: {n_devices} devices not "
                f"divisible by {known}"
            )
        dims[dims.index(-1)] = n_devices // known
    if math.prod(dims) != n_devices:
        raise ValueError(
            f"mesh_dim {mesh_dim!r} = {dims} does not cover {n_devices} devices"
        )
    return dims, strict_order


def create_mesh(
    mesh_dim: str,
    axis_names: tuple[str, ...] = MESH_AXES,
    devices=None,
) -> Mesh:
    """Build a ``jax.sharding.Mesh`` from the mesh_dim grammar."""
    if devices is None:
        devices = jax.devices()
    dims, strict_order = parse_mesh_dims(mesh_dim, len(devices), len(axis_names))
    if strict_order:
        device_array = np.asarray(devices).reshape(dims)
    else:
        device_array = mesh_utils.create_device_mesh(dims, devices=devices)
    return Mesh(device_array, axis_names)


def get_ranks_and_size(mesh: Mesh):
    """Host-level data/model parallel ranks for sharded data loading.

    Mirrors the node-rank bookkeeping contract (reference llama.py:205-218):
    the model-parallel submesh is (tp × sp); hosts are grouped so that hosts
    holding shards of the same batch rows form one "mp node group" and the
    data-parallel node rank indexes the (dp, fsdp) host groups.
    """
    out = dict(shard_on_batch=False)
    mp_size = mesh.shape["tp"] * mesh.shape["sp"]
    mp_node_size = max(1, mp_size // jax.local_device_count())
    dp_node_size = jax.process_count() // mp_node_size
    out["mp_node_size"] = mp_node_size
    out["dp_node_size"] = dp_node_size
    out["dp_node_rank"] = jax.process_index() // mp_node_size
    out["mp_node_rank"] = jax.process_index() % mp_node_size
    return out


@dataclasses.dataclass
class DistributedConfig:
    """Multi-host bootstrap (replaces tux.JaxDistributedConfig).

    All fields optional: on a single host this is a no-op; on a TPU pod the
    defaults let ``jax.distributed.initialize`` auto-detect from the TPU
    metadata server.
    """

    initialize_jax_distributed: bool = False
    coordinator_address: str | None = None
    num_processes: int | None = None
    process_id: int | None = None
    local_device_ids: str | None = None

    @classmethod
    def get_default_config(cls, updates=None):
        import ml_collections

        config = ml_collections.ConfigDict()
        config.initialize_jax_distributed = False
        config.coordinator_address = ml_collections.config_dict.placeholder(str)
        config.num_processes = ml_collections.config_dict.placeholder(int)
        config.process_id = ml_collections.config_dict.placeholder(int)
        config.local_device_ids = ml_collections.config_dict.placeholder(str)
        if updates is not None:
            config.update(ml_collections.ConfigDict(updates).copy_and_resolve_references())
        return config

    @classmethod
    def initialize(cls, config):
        if config.initialize_jax_distributed:
            local_device_ids = None
            if config.local_device_ids is not None:
                local_device_ids = [int(x) for x in config.local_device_ids.split(",")]
            jax.distributed.initialize(
                coordinator_address=config.coordinator_address,
                num_processes=config.num_processes,
                process_id=config.process_id,
                local_device_ids=local_device_ids,
            )


initialize_distributed = DistributedConfig.initialize
