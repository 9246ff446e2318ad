"""Text data pipeline: field-spec DSL tokenization, token-level sequence
packing, DP-sharded + SP-sliced loading, and resumable stream state.

Behavior contracts (SURVEY.md §2 items 10, 12-14; reference lwm/data.py):
- field DSL: comma-separated fields; `[field]` → loss mask 0.0; `field_a+b`
  joined by `subfield_separator`; specials `<|bos|>` / `<|eos|>`;
  `fields_from_example` reads the field list from the example itself;
  `prepend_text` prefixes the first field (docs/data.md:89-141).
- packing: a flat token buffer cut into (batch, seq_length) with
  input/target shifted by one and loss_masks aligned to targets.
- DP sharding: each host consumes only lines where
  index % dp_node_size == dp_node_rank (data.py:393).
- SP slicing: each host keeps only its sequence-parallel slice and the
  global batch is assembled with host_local_array_to_global_array
  (data.py:494-501).
- resume: (example index, byte seek offset, total tokens) checkpoint
  (data.py:513-526).
"""

from __future__ import annotations

import json
import time
from functools import partial
from multiprocessing import Pool

import jax
import numpy as np
from jax.sharding import PartitionSpec as PS
from ml_collections import ConfigDict

from lwm_tpu.parallel.partition import global_sharded_batch
from lwm_tpu.utils.io import open_file


class DatasetFactory:
    """Static factory over the dataset types (reference data.py:16-52)."""

    @staticmethod
    def get_default_config(updates=None):
        config = ConfigDict()
        config.type = "huggingface"
        config.text_processor = TextProcessor.get_default_config()
        config.huggingface_dataset = HuggingfaceDataset.get_default_config()
        config.json_dataset = JsonDataset.get_default_config()
        # vision configs resolved lazily to keep text-only imports light
        from lwm_tpu.data.vision import JsonVisionDataset, VisionTextProcessor

        config.vision_text_processor = VisionTextProcessor.get_default_config()
        config.json_vision_dataset = JsonVisionDataset.get_default_config()
        if updates is not None:
            config.update(ConfigDict(updates).copy_and_resolve_references())
        return config

    @classmethod
    def load_dataset(cls, config, tokenizer, **kwargs):
        config = cls.get_default_config(config)
        if config.type == "huggingface":
            text_processor = TextProcessor(config.text_processor, tokenizer)
            return HuggingfaceDataset(
                config.huggingface_dataset, tokenizer, text_processor, **kwargs
            )
        if config.type == "json":
            text_processor = TextProcessor(config.text_processor, tokenizer)
            return JsonDataset(config.json_dataset, tokenizer, text_processor, **kwargs)
        if config.type == "json_vision":
            from lwm_tpu.data.vision import JsonVisionDataset, VisionTextProcessor

            processor = VisionTextProcessor(config.vision_text_processor, tokenizer)
            return JsonVisionDataset(
                config.json_vision_dataset, tokenizer, processor, **kwargs
            )
        raise ValueError(f"unknown dataset type: {config.type}")

    def __init__(self):
        raise ValueError("DatasetFactory is static; do not instantiate")


class TextProcessor:
    """Field-spec DSL → (tokens, loss_masks) (reference data.py:55-123)."""

    @staticmethod
    def get_default_config(updates=None):
        config = ConfigDict()
        config.fields_from_example = ""
        config.fields = ""
        config.subfield_separator = " "
        config.add_bos_token = True
        config.add_eos_token = True
        config.prepend_text = ""
        if updates is not None:
            config.update(ConfigDict(updates).copy_and_resolve_references())
        return config

    def __init__(self, config, tokenizer):
        self.config = self.get_default_config(config)
        assert self.config.fields != "" or self.config.fields_from_example != "", (
            "either fields or fields_from_example must be specified"
        )
        self.tokenizer = tokenizer

    def __call__(self, example, has_aux=False, add_bos_token=True, add_eos_token=True):
        if has_aux:
            example, *aux = example
        else:
            aux = tuple()
        tokens, masks = [], []

        if add_bos_token and self.config.add_bos_token:
            tokens.append(self.tokenizer.bos_token_id)
            masks.append(0.0)

        if self.config.fields_from_example != "":
            fields = example[self.config.fields_from_example].split(",")
        else:
            fields = self.config.fields.split(",")

        for i, field in enumerate(fields):
            if field.startswith("[") and field.endswith("]"):
                field, mask = field[1:-1], 0.0  # loss-masked field
            else:
                mask = 1.0
            if field == "<|bos|>":
                tokens.append(self.tokenizer.bos_token_id)
                masks.append(mask)
            elif field == "<|eos|>":
                tokens.append(self.tokenizer.eos_token_id)
                masks.append(mask)
            else:
                text = self.config.subfield_separator.join(
                    example[sub] for sub in field.split("+")
                )
                if i == 0:
                    text = self.config.prepend_text + text
                ids = self.tokenizer.encode(text, add_special_tokens=False)
                tokens.extend(ids)
                masks.extend([mask] * len(ids))

        if add_eos_token and self.config.add_eos_token:
            tokens.append(self.tokenizer.eos_token_id)
            masks.append(1.0)
        return (tokens, masks, *aux)


def pack_batch(token_buffer, loss_mask_buffer, batch_size, seq_length, bos_id=None,
               always_start_with_bos=False):
    """Cut a flat token stream into one (batch, seq) training batch with
    next-token targets."""
    chunk = batch_size * seq_length
    batch = {
        "input_tokens": np.asarray(token_buffer[:chunk], np.int32).reshape(batch_size, -1),
        "target_tokens": np.asarray(token_buffer[1 : chunk + 1], np.int32).reshape(batch_size, -1),
        "loss_masks": np.asarray(loss_mask_buffer[1 : chunk + 1], np.float32).reshape(batch_size, -1),
    }
    if always_start_with_bos:
        batch["input_tokens"][:, 0] = bos_id
    return batch


def shard_batch_to_global(batch, node_info, seq_length, sp_layout="contiguous"):
    """Slice the host-local batch to this host's sp shard and assemble the
    global jax.Array (reference data.py:494-501). With sp_layout='striped'
    the sequence is first permuted into the stripe-slot order
    (ops/striped.py) so device shards hold interleaved token positions —
    the balanced-causal RingAttention layout."""
    mesh = node_info["mesh"]
    if sp_layout == "striped":
        from lwm_tpu.ops.striped import stripe_permute

        sp = mesh.shape["sp"]
        batch = {k: stripe_permute(v, sp, axis=1) for k, v in batch.items()}
    sp_nodes_size = max(1, mesh.shape["sp"] // jax.local_device_count())
    sp_nodes_rank = jax.process_index() % sp_nodes_size
    assert seq_length % sp_nodes_size == 0, (seq_length, sp_nodes_size)
    seq_chunk = seq_length // sp_nodes_size
    batch = {
        k: v[:, sp_nodes_rank * seq_chunk : (sp_nodes_rank + 1) * seq_chunk]
        for k, v in batch.items()
    }
    return global_sharded_batch(batch, mesh, PS(("dp", "fsdp"), "sp"))


class HuggingfaceDataset:
    """Streaming packer over datasets.load_dataset
    (reference data.py:242-330)."""

    @staticmethod
    def get_default_config(updates=None):
        config = ConfigDict()
        config.path = "c4"
        config.name = "en"
        config.split = "train"
        config.streaming = False
        config.seq_length = 1024
        config.batch_size = 8
        config.always_start_with_bos = False
        if updates is not None:
            config.update(ConfigDict(updates).copy_and_resolve_references())
        return config

    def __init__(self, config, tokenizer, text_processor, node_info=None):
        from datasets import load_dataset

        self.config = self.get_default_config(config)
        self._tokenizer = tokenizer
        self._text_processor = text_processor
        self._node_info = node_info
        name = self.config.name or None
        split = self.config.split or None
        self._dataset = load_dataset(
            self.config.path, name, split=split, streaming=self.config.streaming
        )

    def __iter__(self):
        chunk_size = self.config.batch_size * self.config.seq_length
        total_tokens = 0
        while True:
            token_buffer, loss_mask_buffer = [], []
            for index, example in enumerate(self._dataset):
                tokens, masks = self.text_processor(example)
                token_buffer.extend(tokens)
                loss_mask_buffer.extend(masks)
                while len(token_buffer) > chunk_size + 1:
                    total_tokens += chunk_size
                    metrics = {
                        "dataset_example_index": index,
                        "dataset_total_tokens": total_tokens,
                    }
                    batch = pack_batch(
                        token_buffer, loss_mask_buffer,
                        self.config.batch_size, self.config.seq_length,
                        bos_id=self._tokenizer.bos_token_id,
                        always_start_with_bos=self.config.always_start_with_bos,
                    )
                    yield batch, metrics
                    token_buffer = token_buffer[chunk_size:]
                    loss_mask_buffer = loss_mask_buffer[chunk_size:]

    def get_state_dict(self):
        return dict(config=self.config)

    def load_state_dict(self, state_dict):
        if "config" in state_dict:
            self.config.update(ConfigDict(state_dict["config"]))

    @property
    def seq_length(self):
        return self.config.seq_length

    @property
    def tokenizer(self):
        return self._tokenizer

    @property
    def text_processor(self):
        return self._text_processor

    @property
    def vocab_size(self):
        return len(self._tokenizer)


class JsonDataset:
    """JSONL dataset with byte-seek resume, DP line sharding, multiprocess
    double-buffered tokenization, and SP-sliced global batches
    (reference data.py:333-542)."""

    @staticmethod
    def get_default_config(updates=None):
        config = ConfigDict()
        config.path = ""
        config.seq_length = 1024
        config.batch_size = 8
        config.always_start_with_bos = False
        config.start_seek_loc = 0
        config.example_index_at_start = 0
        config.tokens_count_at_start = 0
        config.tokenizer_processes = 1
        config.tokenizer_parallel_chunk_size = 32
        config.tokenizer_parallel_batch_size = 1024
        config.throughput_average_window_size = 200
        config.pad = False
        config.use_data_sharded_loader = True
        config.return_local_batch = False
        config.use_native_buffer = True  # C++ packing buffer when available
        config.sp_layout = "contiguous"  # 'striped' for balanced ring training
        if updates is not None:
            config.update(ConfigDict(updates).copy_and_resolve_references())
        return config

    def __init__(self, config, tokenizer, text_processor, node_info):
        self.config = self.get_default_config(config)
        assert self.config.path != ""
        self._tokenizer = tokenizer
        self._text_processor = text_processor
        self._node_info = node_info
        self._index = self.config.example_index_at_start
        self._file_loc = self.config.start_seek_loc
        self._total_tokens = self.config.tokens_count_at_start

    def _parse_line(self, line):
        if not line or line == "\n":
            return None
        try:
            return json.loads(line)
        except json.decoder.JSONDecodeError:
            print(f"error parsing json line:\n{line}")
            return None

    def json_iterator(self):
        """Yields (example, file_loc, index) for this host's DP shard,
        wrapping to the start of file at EOF."""
        index, file_loc = self._index, self._file_loc
        dp_size = self._node_info["dp_node_size"] if self.config.use_data_sharded_loader else 1
        dp_rank = self._node_info["dp_node_rank"] if self.config.use_data_sharded_loader else 0
        with open_file(self.config.path, "r") as fin:
            fin.seek(file_loc)
            while True:
                line = fin.readline()
                file_loc = fin.tell()
                if not line:
                    index = 0
                    fin.seek(0)
                    continue
                data = self._parse_line(line)
                if data is not None and index % dp_size == dp_rank:
                    yield data, file_loc, index
                index += 1

    @staticmethod
    def _batched(iterator, batch_size):
        batch = []
        for example in iterator:
            batch.append(example)
            if len(batch) == batch_size:
                yield batch
                batch = []
        if batch:
            yield batch

    def parallel_example_iterator(self):
        """Tokenize with a process pool, double-buffered: the next chunk
        tokenizes while the current one is consumed (reference
        data.py:398-432)."""
        if self.config.tokenizer_processes == 1:
            for example, loc, index in self.json_iterator():
                yield self._text_processor((example, loc, index), has_aux=True)
            return
        batched_iterator = self._batched(
            self.json_iterator(), self.config.tokenizer_parallel_batch_size
        )
        map_fn = partial(self._text_processor, has_aux=True)
        with Pool(self.config.tokenizer_processes) as pool:
            next_batch = pool.map_async(
                map_fn, next(batched_iterator),
                chunksize=self.config.tokenizer_parallel_chunk_size,
            )
            while True:
                current_batch = next_batch
                next_batch = pool.map_async(
                    map_fn, next(batched_iterator),
                    chunksize=self.config.tokenizer_parallel_chunk_size,
                )
                yield from current_batch.get()

    def __iter__(self):
        global_chunk_size = self.config.batch_size * self.config.seq_length
        if self.config.use_data_sharded_loader:
            local_batch_size = self.config.batch_size // self._node_info["dp_node_size"]
        else:
            local_batch_size = self.config.batch_size
        chunk_size = local_batch_size * self.config.seq_length

        native = None
        if self.config.use_native_buffer and not self.config.pad:
            from lwm_tpu.native import NativeTokenBuffer, native_available

            if native_available():
                native = NativeTokenBuffer()
        token_buffer, loss_mask_buffer = [], []
        last_time = time.time()
        step_times = []
        start_time = time.time()
        start_tokens = self._total_tokens

        for tokens, loss_masks, loc, index in self.parallel_example_iterator():
            self._file_loc = loc
            self._index = index
            if self.config.pad:
                # one example per row, truncated/padded to seq_length+1
                tokens = list(tokens[: self.config.seq_length + 1])
                tokens.extend(
                    [self._tokenizer.bos_token_id]
                    * (self.config.seq_length + 1 - len(tokens))
                )
                loss_masks = list(loss_masks[: self.config.seq_length + 1])
                loss_masks.extend([0.0] * (self.config.seq_length + 1 - len(loss_masks)))
            if native is not None:
                native.append(tokens, loss_masks)
            else:
                token_buffer.extend(tokens)
                loss_mask_buffer.extend(loss_masks)

            while (len(native) if native is not None else len(token_buffer)) > chunk_size + 1:
                self._total_tokens += global_chunk_size
                step_times.append(time.time() - last_time)
                last_time = time.time()
                step_times = step_times[-self.config.throughput_average_window_size :]
                metrics = {
                    "dataset_file_loc": loc,
                    "dataset_example_index": index,
                    "dataset_total_tokens": self._total_tokens,
                    "dataset_accumulated_tps": (
                        (self._total_tokens - start_tokens)
                        / max(time.time() - start_time, 1e-8)
                    ),
                    "dataset_average_tps": global_chunk_size / max(np.mean(step_times), 1e-8),
                }
                if native is not None:
                    batch = native.emit(local_batch_size, self.config.seq_length)
                    if self.config.always_start_with_bos:
                        batch["input_tokens"][:, 0] = self._tokenizer.bos_token_id
                else:
                    batch = pack_batch(
                        token_buffer, loss_mask_buffer, local_batch_size,
                        self.config.seq_length,
                        bos_id=self._tokenizer.bos_token_id,
                        always_start_with_bos=self.config.always_start_with_bos,
                    )
                batch["input_vision_masks"] = np.zeros(batch["input_tokens"].shape, bool)
                batch["target_vision_masks"] = np.zeros(batch["input_tokens"].shape, bool)

                if self.config.use_data_sharded_loader and not self.config.return_local_batch:
                    batch = shard_batch_to_global(
                        batch, self._node_info, self.config.seq_length,
                        self.config.sp_layout,
                    )
                yield batch, metrics
                if native is None:
                    if self.config.pad:
                        token_buffer, loss_mask_buffer = [], []
                    else:
                        token_buffer = token_buffer[chunk_size:]
                        loss_mask_buffer = loss_mask_buffer[chunk_size:]

    def get_state_dict(self):
        return dict(
            config=self.config,
            index=self._index,
            file_loc=self._file_loc,
            total_tokens=self._total_tokens,
        )

    def load_state_dict(self, state_dict):
        if "config" in state_dict:
            self.config.update(ConfigDict(state_dict["config"]))
        self._index = state_dict.get("index", self.config.example_index_at_start)
        self._file_loc = state_dict.get("file_loc", self.config.start_seek_loc)
        self._total_tokens = state_dict.get(
            "total_tokens", self.config.tokens_count_at_start
        )

    @property
    def seq_length(self):
        return self.config.seq_length

    @property
    def tokenizer(self):
        return self._tokenizer

    @property
    def text_processor(self):
        return self._text_processor

    @property
    def vocab_size(self):
        return len(self._tokenizer)
