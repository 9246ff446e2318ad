"""Chunk-streamed checkpointing for sharded train states.

Fulfils the StreamingCheckpointer contract the reference consumes from
``tux`` (SURVEY.md §2.8, §5.4; reference train.py:280-330):

- ``save_all(train_state, gather_fns, metadata=, dataset=, milestone=)``
  writes ``streaming_train_state`` / ``streaming_params`` (rolling) or
  ``*_<step>`` (milestone, kept forever), plus ``metadata.pkl`` /
  ``dataset.pkl``.
- ``load_trainstate_checkpoint(spec, ...)`` dispatches on path prefixes
  ``trainstate::``, ``trainstate_params::``, ``params::``, ``flax_params::``
  and returns ``(train_state, restored_params)``.
- shard_fns are applied leaf-at-a-time during the read, so each leaf is
  placed on device before the next one is decoded; the full tree never
  sits on the host at once.

On-disk format (v2), a msgpack record stream:

    {"format": "lwm-tpu-ckpt", "version": 2}                  # header
    ["leaf", [path...], dtype_name, [shape...], n_chunks]     # per leaf
    <raw bytes> * n_chunks                                    #   "
    ["obj", [path...], msgpack-packable value]                # non-arrays

Leaves are split into chunks of at most ``chunk_bytes`` (default 256 MiB):
row-wise along axis 0, or on the flattened element view when a single row
exceeds the budget. Every record therefore stays far below msgpack's 4 GiB
bin limit, and a multi-GB leaf (e.g. a 7B stacked-scan fp32 adam moment,
32x4096x4096 = 2.1 GB) round-trips without any single >2 GB buffer.

Saving pulls sharded ``jax.Array`` leaves to the host chunk-by-chunk
(device-side slice + per-chunk transfer), so host peak memory during a save
is one chunk — not one leaf, and never the whole tree.

Version-1 streams (``(path, flax-serialized-bytes)`` tuple records — the
tux/EasyLM lineage format, also produced by this repo's round-1 saves and
by external LWM checkpoint releases) are detected and loaded transparently.
"""

from __future__ import annotations

import os

import flax
import jax
import msgpack
import numpy as np
from flax.serialization import from_bytes, from_state_dict, to_state_dict
from flax.traverse_util import empty_node, flatten_dict, unflatten_dict
from ml_collections import ConfigDict

from lwm_tpu.utils.dtypes import get_float_dtype_by_name
from lwm_tpu.utils.io import open_file, save_pickle

_HEADER = {"format": "lwm-tpu-ckpt", "version": 2}
DEFAULT_CHUNK_BYTES = 256 * 2**20
_FLOAT_DTYPES = ("bfloat16", "float16", "float32", "float64")


def _dtype_from_name(name):
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def _chunk_ranges(shape, itemsize, chunk_bytes):
    """Yield (flat, start, stop) slicing plan covering the array.

    flat=False → slice rows along axis 0; flat=True → slice the flattened
    element view (single row bigger than the budget).
    """
    n_elems = int(np.prod(shape, dtype=np.int64)) if shape else 1
    if not shape:  # 0-d
        yield (True, 0, 1)
        return
    row_elems = n_elems // shape[0] if shape[0] else 0
    row_bytes = row_elems * itemsize
    if row_bytes > chunk_bytes:
        elems_per_chunk = max(1, chunk_bytes // itemsize)
        for start in range(0, n_elems, elems_per_chunk):
            yield (True, start, min(start + elems_per_chunk, n_elems))
    else:
        rows_per_chunk = max(1, chunk_bytes // max(1, row_bytes))
        for start in range(0, shape[0], rows_per_chunk):
            yield (False, start, min(start + rows_per_chunk, shape[0]))


def _write_leaf(fout, packer, key, value, gather_fn, float_dtype, chunk_bytes):
    """Stream one leaf to ``fout`` as a meta record + raw chunk records."""
    if value is None or isinstance(value, (str, bytes, bool)):
        fout.write(packer.pack(["obj", list(key), value]))
        return
    is_device = isinstance(value, jax.Array)
    if not is_device:
        value = np.asarray(value)
        if value.dtype == object:
            raise TypeError(f"cannot checkpoint object-dtype leaf at {key}")
    target = None
    if float_dtype and str(value.dtype) in _FLOAT_DTYPES:
        target = get_float_dtype_by_name(float_dtype)
    out_dtype = np.dtype(target) if target is not None else np.dtype(value.dtype)

    shape = tuple(int(d) for d in value.shape)
    plan = list(_chunk_ranges(shape, out_dtype.itemsize, chunk_bytes))
    fout.write(packer.pack(["leaf", list(key), out_dtype.name, list(shape), len(plan)]))

    flat = None
    for is_flat, start, stop in plan:
        if is_flat:
            if flat is None:
                flat = value.reshape(-1) if shape else value.reshape(1)
            chunk = flat[start:stop]
        else:
            chunk = value[start:stop]
        if gather_fn is not None:
            chunk = gather_fn(chunk)
        if is_device or isinstance(chunk, jax.Array):
            chunk = jax.device_get(chunk)
        if target is not None and chunk.dtype != out_dtype:
            chunk = chunk.astype(out_dtype)
        fout.write(packer.pack(np.ascontiguousarray(chunk).tobytes()))


def save_stream(flat_state, path, gather_fns=None, float_dtype=None,
                chunk_bytes=DEFAULT_CHUNK_BYTES):
    """Write a flattened ``{path_tuple: leaf}`` dict as a v2 record stream."""
    packer = msgpack.Packer()
    with open_file(path, "wb") as fout:
        fout.write(packer.pack(_HEADER))
        for key, value in flat_state.items():
            gather_fn = gather_fns.get(key) if gather_fns is not None else None
            _write_leaf(fout, packer, key, value, gather_fn, float_dtype, chunk_bytes)


def _read_stream(unpacker, first, on_leaf):
    """Drive one of the two record formats, calling ``on_leaf(key, value)``."""
    if isinstance(first, dict):  # v2 header
        version = first.get("version")
        if first.get("format") != "lwm-tpu-ckpt":
            raise ValueError(f"unrecognized checkpoint header: {first}")
        if version != 2:
            raise ValueError(f"unsupported checkpoint version: {version}")
        for record in unpacker:
            kind = record[0]
            if kind == "leaf":
                _, key, dtype_name, shape, n_chunks = record
                dtype = _dtype_from_name(dtype_name)
                arr = np.empty(shape, dtype=dtype)
                dst = arr.reshape(-1) if shape else arr.reshape(1)
                offset = 0
                for _ in range(n_chunks):
                    buf = next(unpacker)
                    part = np.frombuffer(buf, dtype=dtype)
                    dst[offset:offset + part.size] = part
                    offset += part.size
                on_leaf(tuple(key), arr if shape else arr.reshape(())[()])
            elif kind == "obj":
                _, key, value = record
                on_leaf(tuple(key), value)
            else:
                raise ValueError(f"unknown checkpoint record kind: {kind!r}")
    else:  # v1: stream of (path, flax-serialized-bytes) tuples
        key, value = first
        on_leaf(tuple(key), from_bytes(None, value))
        for key, value in unpacker:
            on_leaf(tuple(key), from_bytes(None, value))


def load_stream(path, shard_fns=None, remove_prefix=None,
                max_buffer_size=32 * 2**30):
    """Read a record stream into a flattened dict, applying ``shard_fns``
    per leaf as it is decoded (device placement before the next leaf)."""
    if remove_prefix is not None:
        remove_prefix = tuple(remove_prefix)
    out = {}

    def on_leaf(key, value):
        if remove_prefix is not None:
            if key[: len(remove_prefix)] != remove_prefix:
                return
            key = key[len(remove_prefix):]
        if shard_fns is not None:
            value = shard_fns[key](value)
        out[key] = value

    with open_file(path, "rb") as fin:
        unpacker = msgpack.Unpacker(
            fin, read_size=2**23, max_buffer_size=max_buffer_size
        )
        try:
            first = next(unpacker)
        except StopIteration:
            return out
        _read_stream(unpacker, first, on_leaf)
    return out


class StreamingCheckpointer:
    """Train-state checkpointer with the reference's save/load surface."""

    @staticmethod
    def get_default_config(updates=None):
        config = ConfigDict()
        config.float_dtype = "bf16"
        config.save_optimizer_state = False
        config.chunk_bytes = DEFAULT_CHUNK_BYTES
        if updates is not None:
            config.update(ConfigDict(updates).copy_and_resolve_references())
        return config

    def __init__(self, config, checkpoint_dir, enable=True):
        self.config = self.get_default_config(config)
        self.checkpoint_dir = checkpoint_dir
        self.enable = enable

    def save_checkpoint(self, train_state, filename, gather_fns=None):
        if not self.enable:
            return
        self.save_train_state_to_file(
            train_state,
            os.path.join(self.checkpoint_dir, filename),
            gather_fns=gather_fns,
            float_dtype=self.config.float_dtype,
            chunk_bytes=self.config.chunk_bytes,
        )

    @staticmethod
    def save_train_state_to_file(train_state, path, gather_fns=None,
                                 float_dtype=None,
                                 chunk_bytes=DEFAULT_CHUNK_BYTES):
        flat_state = flatten_dict(to_state_dict(train_state))
        if gather_fns is not None:
            gather_fns = flatten_dict(to_state_dict(gather_fns))
        save_stream(flat_state, path, gather_fns, float_dtype, chunk_bytes)

    def save_pickle(self, obj, filename):
        if self.enable:
            save_pickle(obj, os.path.join(self.checkpoint_dir, filename))

    def save_all(self, train_state, gather_fns, metadata=None, dataset=None,
                 milestone=False):
        step = int(jax.device_get(train_state.step))
        if self.config.save_optimizer_state:
            state, name = train_state, "streaming_train_state"
            state_gather_fns = gather_fns
        else:
            state, name = train_state.params["params"], "streaming_params"
            state_gather_fns = gather_fns.params["params"]
        suffix = f"_{step}" if milestone else ""  # milestones kept forever
        self.save_pickle(metadata, f"metadata{suffix}.pkl")
        self.save_pickle(dataset, f"dataset{suffix}.pkl")
        self.save_checkpoint(state, f"{name}{suffix}", state_gather_fns)

    @staticmethod
    def load_checkpoint(path, target=None, shard_fns=None,
                        remove_dict_prefix=None, max_buffer_size=32 * 2**30):
        if shard_fns is not None:
            shard_fns = flatten_dict(to_state_dict(shard_fns))
        flat_state = load_stream(path, shard_fns, remove_dict_prefix, max_buffer_size)
        if target is None:
            return unflatten_dict(flat_state)
        # carry over empty nodes so from_state_dict sees the full structure
        for key, value in flatten_dict(
            to_state_dict(target), keep_empty_nodes=True
        ).items():
            if key not in flat_state and value == empty_node:
                flat_state[key] = value
        return from_state_dict(target, unflatten_dict(flat_state))

    @staticmethod
    def load_flax_checkpoint(path, target=None, shard_fns=None):
        """Load a standard single-blob flax msgpack checkpoint (HF exports)."""
        with open_file(path, "rb") as fin:
            state_dict = flax.serialization.msgpack_restore(fin.read())
        if shard_fns is not None:
            state_dict = jax.tree_util.tree_map(
                lambda fn, x: fn(x), to_state_dict(shard_fns), state_dict
            )
        if target is None:
            return state_dict
        return from_state_dict(target, state_dict)

    @classmethod
    def load_trainstate_checkpoint(cls, load_from, trainstate_target=None,
                                   trainstate_shard_fns=None,
                                   disallow_trainstate=False,
                                   max_buffer_size=32 * 2**30):
        params_target = (
            trainstate_target.params["params"] if trainstate_target is not None else None
        )
        params_shard_fns = (
            trainstate_shard_fns.params["params"]
            if trainstate_shard_fns is not None else None
        )
        load_type, load_path = load_from.split("::", 1)
        if disallow_trainstate and load_type == "trainstate":
            raise ValueError("trainstate loading disallowed here")

        if load_type == "trainstate":
            train_state = cls.load_checkpoint(
                load_path, target=trainstate_target,
                shard_fns=trainstate_shard_fns, max_buffer_size=max_buffer_size,
            )
            return train_state, None

        if load_type == "trainstate_params":
            params = cls.load_checkpoint(
                load_path, target=params_target, shard_fns=params_shard_fns,
                remove_dict_prefix=("params", "params"),
                max_buffer_size=max_buffer_size,
            )
        elif load_type == "params":
            params = cls.load_checkpoint(
                load_path, target=params_target, shard_fns=params_shard_fns,
                max_buffer_size=max_buffer_size,
            )
        elif load_type == "flax_params":
            params = cls.load_flax_checkpoint(
                load_path, target=params_target, shard_fns=params_shard_fns
            )
        else:
            raise ValueError(f"invalid load_from type: {load_type}")
        return None, flax.core.frozen_dict.freeze({"params": params})
