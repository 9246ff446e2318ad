"""Vision-text data pipeline: pre-tokenized VQ codes in JSONL interleaved
with text, frame framing with EOF/EOV specials, vision masks, and pad /
no-pad packing (SURVEY.md §2 item 11; reference lwm/data.py:126-239,
545-842).

Token framing contract: each 256-code frame (16×16 VQGAN latents) is
followed by EOF (8192), the last frame by EOV (8193); the whole clip is
wrapped in the text tokens `<vision>` ... `</vision>`. `vision_mask`
marks the VQ codes plus their EOF/EOV as vision positions (the embedding
mix and dual-head loss key off it).
"""

from __future__ import annotations

import json
import random
import time
from functools import partial
from multiprocessing import Pool

import numpy as np
from ml_collections import ConfigDict

from lwm_tpu.data.text import shard_batch_to_global
from lwm_tpu.utils.io import open_file


class VisionTextProcessor:
    @staticmethod
    def get_default_config(updates=None):
        config = ConfigDict()
        config.fields_from_example = ""
        config.subfield_separator = " "
        config.add_bos_token = True
        config.add_eos_token = True
        config.prepend_text = ""
        config.fields_index = -1
        config.eof_token = 8192  # end of each frame
        config.eov_token = 8193  # end of vision sequence
        config.n_tokens_per_frame = 256  # 16×16 VQ codes
        config.max_n_frames = -1
        if updates is not None:
            config.update(ConfigDict(updates).copy_and_resolve_references())
        return config

    def __init__(self, config, tokenizer):
        self.config = self.get_default_config(config)
        assert self.config.fields_from_example != "", "fields_from_example required"
        self.tokenizer = tokenizer
        self.vision_start = tokenizer.encode("<vision>")
        self.vision_end = tokenizer.encode("</vision>")

    def _append(self, buffers, token, mask, is_vision):
        tokens, masks, vision = buffers
        tokens.append(token)
        masks.append(mask)
        vision.append(is_vision)

    def __call__(self, example, has_aux=False, add_bos_token=True, add_eos_token=True):
        if has_aux:
            example, *aux = example
        else:
            aux = tuple()
        # deterministic per-line augmentation seed (reference data.py:158):
        # reproducible regardless of tokenizer-pool worker scheduling
        rand_state = random.Random(aux[-1] if aux else 0)
        tokens, masks, vision = [], [], []
        buffers = (tokens, masks, vision)

        fields = example[self.config.fields_from_example]
        if isinstance(fields, (tuple, list)):
            if self.config.fields_index >= 0:
                fields = fields[self.config.fields_index]
            else:
                fields = rand_state.choice(fields)
        fields = fields.split(",")

        if add_bos_token and self.config.add_bos_token:
            self._append(buffers, self.tokenizer.bos_token_id, 0.0, False)

        n_per_frame = self.config.n_tokens_per_frame
        for i, field in enumerate(fields):
            if field.startswith("[") and field.endswith("]"):
                field, mask = field[1:-1], 0.0
            else:
                mask = 1.0
            if field == "<|bos|>":
                self._append(buffers, self.tokenizer.bos_token_id, mask, False)
            elif field == "<|eos|>":
                self._append(buffers, self.tokenizer.eos_token_id, mask, False)
            elif "vision" in field:
                vq = list(example[field])
                n_frames = len(vq) // n_per_frame
                if 0 < self.config.max_n_frames < n_frames:
                    # uniform frame subsample (reference data.py:196-202)
                    idxs = np.linspace(0, n_frames - 1, self.config.max_n_frames).astype(int)
                    vq = [
                        tok
                        for idx in idxs
                        for tok in vq[idx * n_per_frame : (idx + 1) * n_per_frame]
                    ]
                    n_frames = self.config.max_n_frames
                assert n_frames > 0, len(vq)
                for tok in self.vision_start:
                    self._append(buffers, tok, mask, False)
                for j in range(n_frames):
                    frame = vq[j * n_per_frame : (j + 1) * n_per_frame]
                    terminator = (
                        self.config.eov_token
                        if j == n_frames - 1
                        else self.config.eof_token
                    )
                    for tok in frame:
                        self._append(buffers, tok, mask, True)
                    self._append(buffers, terminator, mask, True)
                for tok in self.vision_end:
                    self._append(buffers, tok, mask, False)
            else:
                text = self.config.subfield_separator.join(
                    example[sub] for sub in field.split("+")
                )
                if i == 0:
                    text = self.config.prepend_text + text
                for tok in self.tokenizer.encode(text):
                    self._append(buffers, tok, mask, False)

        if add_eos_token and self.config.add_eos_token:
            self._append(buffers, self.tokenizer.eos_token_id, 1.0, False)

        assert len(tokens) == len(masks) == len(vision)
        keep = True
        return (tokens, masks, vision, keep, *aux)


class JsonVisionDataset:
    """JSONL vision-text dataset with `pad` (one example per row) and
    `no_pad` (packed stream) modes (reference data.py:545-842)."""

    @staticmethod
    def get_default_config(updates=None):
        config = ConfigDict()
        config.path = ""
        config.seq_length = 384
        config.batch_size = 4
        config.always_start_with_bos = False
        config.start_seek_loc = 0
        config.example_index_at_start = 0
        config.tokens_count_at_start = 0
        config.tokenizer_processes = 1
        config.tokenizer_parallel_chunk_size = 32
        config.tokenizer_parallel_batch_size = 1024
        config.throughput_average_window_size = 200
        config.use_data_sharded_loader = True
        config.return_local_batch = False
        config.sp_layout = "contiguous"
        config.mode = "pad"
        if updates is not None:
            config.update(ConfigDict(updates).copy_and_resolve_references())
        return config

    def __init__(self, config, tokenizer, text_processor, node_info):
        self.config = self.get_default_config(config)
        assert self.config.path != ""
        self._node_info = node_info
        self._tokenizer = tokenizer
        self._text_processor = text_processor
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
        index, file_loc = self._index, self._file_loc
        dp_size = self._node_info["dp_node_size"] if self.config.use_data_sharded_loader else 1
        dp_rank = self._node_info["dp_node_rank"] if self.config.use_data_sharded_loader else 0
        with open_file(self.config.path, "r", block_size=50 * 2**20) as fin:
            fin.seek(file_loc)
            while True:
                line = fin.readline()
                file_loc = fin.tell()
                if not line:
                    index = 0
                    fin.seek(0)
                    continue
                if index % dp_size == dp_rank:
                    data = self._parse_line(line)
                    if data is not None:
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
        if self.config.mode == "pad":
            return self._iter_pad()
        if self.config.mode == "no_pad":
            return self._iter_no_pad()
        raise ValueError(f"unknown mode: {self.config.mode}")

    def _local_batch_size(self):
        if self.config.use_data_sharded_loader:
            return self.config.batch_size // self._node_info["dp_node_size"]
        return self.config.batch_size

    def _metrics(self, loc, index, step_times, start_time, start_tokens, chunk_size):
        return {
            "dataset_file_loc": loc,
            "dataset_example_index": index,
            "dataset_total_tokens": self._total_tokens,
            "dataset_accumulated_tps": (
                (self._total_tokens - start_tokens)
                / max(time.time() - start_time, 1e-8)
            ),
            "dataset_average_tps": chunk_size / max(np.mean(step_times), 1e-8),
        }

    def _maybe_global(self, batch):
        if self.config.use_data_sharded_loader and not self.config.return_local_batch:
            return shard_batch_to_global(
                batch, self._node_info, self.config.seq_length,
                self.config.sp_layout,
            )
        return batch

    def _iter_pad(self):
        """One example per row, bos-padded to seq_length."""
        seq = self.config.seq_length
        local_bs = self._local_batch_size()
        chunk_size = self.config.batch_size * seq
        bos = self._tokenizer.bos_token_id
        buffer = []
        step_times, last_time = [], time.time()
        start_time, start_tokens = time.time(), self._total_tokens
        for tokens, loss_masks, vision_masks, keep, loc, index in self.parallel_example_iterator():
            if not keep:
                continue
            self._file_loc = loc
            self._index = index
            buffer.append((tokens, loss_masks, vision_masks))
            while len(buffer) >= local_bs:
                self._total_tokens += chunk_size
                step_times.append(time.time() - last_time)
                last_time = time.time()
                step_times = step_times[-self.config.throughput_average_window_size :]
                batch = {
                    "input_tokens": np.full((local_bs, seq), bos, np.int32),
                    "target_tokens": np.full((local_bs, seq), bos, np.int32),
                    "loss_masks": np.zeros((local_bs, seq), np.float32),
                    "input_vision_masks": np.zeros((local_bs, seq), bool),
                    "target_vision_masks": np.zeros((local_bs, seq), bool),
                }
                for i in range(local_bs):
                    tokens, loss_masks, vision_masks = buffer[i]
                    if len(tokens) > seq:
                        tokens = tokens[: seq + 1]
                        loss_masks = loss_masks[: seq + 1]
                        vision_masks = vision_masks[: seq + 1]
                    inp, tgt = tokens[:-1], tokens[1:]
                    batch["input_tokens"][i, : len(inp)] = inp
                    batch["target_tokens"][i, : len(tgt)] = tgt
                    batch["input_vision_masks"][i, : len(inp)] = vision_masks[:-1]
                    batch["target_vision_masks"][i, : len(tgt)] = vision_masks[1:]
                    batch["loss_masks"][i, : len(tgt)] = loss_masks[1:]
                metrics = self._metrics(
                    loc, index, step_times, start_time, start_tokens, chunk_size
                )
                yield self._maybe_global(batch), metrics
                buffer = buffer[local_bs:]

    def _iter_no_pad(self):
        """Packed stream, like JsonDataset but with vision masks."""
        seq = self.config.seq_length
        local_bs = self._local_batch_size()
        global_chunk = self.config.batch_size * seq
        chunk = local_bs * seq
        tokens_buf, masks_buf, vision_buf = [], [], []
        step_times, last_time = [], time.time()
        start_time, start_tokens = time.time(), self._total_tokens
        for tokens, loss_masks, vision_masks, keep, loc, index in self.parallel_example_iterator():
            if not keep:
                continue
            self._file_loc = loc
            self._index = index
            tokens_buf.extend(tokens)
            masks_buf.extend(loss_masks)
            vision_buf.extend(vision_masks)
            while len(tokens_buf) > chunk + 1:
                self._total_tokens += global_chunk
                step_times.append(time.time() - last_time)
                last_time = time.time()
                step_times = step_times[-self.config.throughput_average_window_size :]
                batch = {
                    "input_tokens": np.asarray(tokens_buf[:chunk], np.int32).reshape(local_bs, -1),
                    "target_tokens": np.asarray(tokens_buf[1 : chunk + 1], np.int32).reshape(local_bs, -1),
                    "loss_masks": np.asarray(masks_buf[1 : chunk + 1], np.float32).reshape(local_bs, -1),
                    "input_vision_masks": np.asarray(vision_buf[:chunk], bool).reshape(local_bs, -1),
                    "target_vision_masks": np.asarray(vision_buf[1 : chunk + 1], bool).reshape(local_bs, -1),
                }
                metrics = self._metrics(
                    loc, index, step_times, start_time, start_tokens, global_chunk
                )
                yield self._maybe_global(batch), metrics
                tokens_buf = tokens_buf[chunk:]
                masks_buf = masks_buf[chunk:]
                vision_buf = vision_buf[chunk:]

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
