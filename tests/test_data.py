"""Data pipeline: field DSL, packing shapes, DP sharding, seek-resume
determinism, vision token framing."""

import json

import numpy as np
import pytest
from transformers import AutoTokenizer

from lwm_tpu.data import DatasetFactory, JsonDataset, TextProcessor
from lwm_tpu.data.vision import VisionTextProcessor

TOKENIZER_PATH = "tests/fixtures/tokenizer"


@pytest.fixture(scope="module")
def tokenizer():
    return AutoTokenizer.from_pretrained(TOKENIZER_PATH)


@pytest.fixture()
def jsonl_file(tmp_path):
    path = tmp_path / "data.jsonl"
    with open(path, "w") as f:
        for i in range(200):
            f.write(json.dumps({"text": f"the magic number is {i} in the haystack"}) + "\n")
    return str(path)


NODE_INFO = dict(dp_node_size=1, dp_node_rank=0, mp_node_size=1, mp_node_rank=0)


class TestTextProcessor:
    def test_basic_fields(self, tokenizer):
        proc = TextProcessor(
            TextProcessor.get_default_config(dict(fields="text")), tokenizer
        )
        tokens, masks = proc({"text": "the magic number"})
        assert tokens[0] == tokenizer.bos_token_id and masks[0] == 0.0
        assert tokens[-1] == tokenizer.eos_token_id and masks[-1] == 1.0
        assert all(m == 1.0 for m in masks[1:])

    def test_masked_field_and_join(self, tokenizer):
        proc = TextProcessor(
            TextProcessor.get_default_config(
                dict(fields="[question],answer", add_bos_token=False, add_eos_token=False)
            ),
            tokenizer,
        )
        tokens, masks = proc({"question": "the needle", "answer": "the haystack"})
        q_len = len(tokenizer.encode("the needle", add_special_tokens=False))
        assert all(m == 0.0 for m in masks[:q_len])
        assert all(m == 1.0 for m in masks[q_len:])

    def test_fields_from_example(self, tokenizer):
        proc = TextProcessor(
            TextProcessor.get_default_config(dict(fields_from_example="spec")),
            tokenizer,
        )
        tokens, masks = proc(
            {"spec": "[a],b", "a": "the model", "b": "the world"}
        )
        assert 0.0 in masks and 1.0 in masks

    def test_special_tokens_in_fields(self, tokenizer):
        proc = TextProcessor(
            TextProcessor.get_default_config(
                dict(fields="<|bos|>,text,<|eos|>", add_bos_token=False, add_eos_token=False)
            ),
            tokenizer,
        )
        tokens, masks = proc({"text": "hi"})
        assert tokens[0] == tokenizer.bos_token_id
        assert tokens[-1] == tokenizer.eos_token_id


class TestJsonDataset:
    def make(self, path, tokenizer, **updates):
        config = JsonDataset.get_default_config(
            dict(
                path=path, seq_length=64, batch_size=2,
                use_data_sharded_loader=False, **updates,
            )
        )
        proc = TextProcessor(
            TextProcessor.get_default_config(dict(fields="text")), tokenizer
        )
        return JsonDataset(config, tokenizer, proc, node_info=NODE_INFO)

    def test_batch_shapes_and_shift(self, tokenizer, jsonl_file):
        ds = self.make(jsonl_file, tokenizer)
        batch, metrics = next(iter(ds))
        assert batch["input_tokens"].shape == (2, 64)
        assert batch["target_tokens"].shape == (2, 64)
        assert batch["loss_masks"].shape == (2, 64)
        flat_in = batch["input_tokens"].reshape(-1)
        flat_tgt = batch["target_tokens"].reshape(-1)
        np.testing.assert_array_equal(flat_in[1:], flat_tgt[:-1])
        assert metrics["dataset_total_tokens"] == 128

    def test_seek_resume_determinism(self, tokenizer, jsonl_file):
        """Resume is exact at example granularity (byte seek): two resumes
        from the same state yield identical streams that continue past the
        checkpointed example index (reference data.py:513-526 semantics —
        the partial token buffer is intentionally dropped)."""
        ds = self.make(jsonl_file, tokenizer)
        it = iter(ds)
        for _ in range(3):
            next(it)
        state = ds.get_state_dict()

        resumed = []
        for _ in range(2):
            ds2 = self.make(jsonl_file, tokenizer)
            ds2.load_state_dict(state)
            batch, metrics = next(iter(ds2))
            resumed.append((batch, metrics))
        np.testing.assert_array_equal(
            resumed[0][0]["input_tokens"], resumed[1][0]["input_tokens"]
        )
        assert resumed[0][1]["dataset_example_index"] > state["index"]
        assert resumed[0][1]["dataset_total_tokens"] > state["total_tokens"]

    def test_dp_sharding_splits_lines(self, tokenizer, jsonl_file):
        config = JsonDataset.get_default_config(
            dict(path=jsonl_file, seq_length=32, batch_size=2,
                 use_data_sharded_loader=True, return_local_batch=True)
        )
        proc = TextProcessor(
            TextProcessor.get_default_config(dict(fields="text")), tokenizer
        )
        seen = []
        for rank in range(2):
            node_info = dict(dp_node_size=2, dp_node_rank=rank)
            ds = JsonDataset(config, tokenizer, proc, node_info=node_info)
            indices = []
            for data, loc, index in ds.json_iterator():
                indices.append(index)
                if len(indices) >= 5:
                    break
            seen.append(indices)
        assert all(i % 2 == 0 for i in seen[0])
        assert all(i % 2 == 1 for i in seen[1])

    def test_parallel_tokenization_matches_serial(self, tokenizer, jsonl_file):
        ds1 = self.make(jsonl_file, tokenizer, tokenizer_processes=1)
        ds2 = self.make(jsonl_file, tokenizer, tokenizer_processes=2,
                        tokenizer_parallel_batch_size=16,
                        tokenizer_parallel_chunk_size=4)
        b1, _ = next(iter(ds1))
        b2, _ = next(iter(ds2))
        np.testing.assert_array_equal(b1["input_tokens"], b2["input_tokens"])


class TestVisionProcessor:
    def test_frame_framing(self, tokenizer):
        proc = VisionTextProcessor(
            VisionTextProcessor.get_default_config(
                dict(fields_from_example="fields", n_tokens_per_frame=4)
            ),
            tokenizer,
        )
        example = {
            "fields": "[caption],vision_codes",
            "caption": "a video",
            "vision_codes": [1, 2, 3, 4, 5, 6, 7, 8],  # 2 frames of 4
        }
        tokens, masks, vision, keep, loc, idx = proc((example, 0, 0), has_aux=True)
        assert keep
        # EOF after frame 1, EOV after frame 2
        vis_positions = [t for t, v in zip(tokens, vision) if v]
        assert vis_positions == [1, 2, 3, 4, 8192, 5, 6, 7, 8, 8193]
        # <vision> wrapper tokens are text positions
        vstart = tokenizer.encode("<vision>")
        assert tokens[tokens.index(vstart[0])] == vstart[0]
        assert not vision[tokens.index(vstart[0])]

    def test_max_n_frames_subsample(self, tokenizer):
        proc = VisionTextProcessor(
            VisionTextProcessor.get_default_config(
                dict(fields_from_example="fields", n_tokens_per_frame=2, max_n_frames=2)
            ),
            tokenizer,
        )
        example = {
            "fields": "vision_codes",
            "vision_codes": [10, 11, 20, 21, 30, 31, 40, 41],  # 4 frames
        }
        tokens, masks, vision, keep, *_ = proc((example, 0, 5), has_aux=True)
        vis = [t for t, v in zip(tokens, vision) if v]
        # uniform subsample keeps first and last frames
        assert vis == [10, 11, 8192, 40, 41, 8193]


class TestFactory:
    def test_json_type(self, tokenizer, jsonl_file):
        config = DatasetFactory.get_default_config()
        config.type = "json"
        config.text_processor.fields = "text"
        config.json_dataset.path = jsonl_file
        config.json_dataset.use_data_sharded_loader = False
        ds = DatasetFactory.load_dataset(config, tokenizer, node_info=NODE_INFO)
        batch, _ = next(iter(ds))
        assert "input_tokens" in batch

    def test_unknown_type(self, tokenizer):
        config = DatasetFactory.get_default_config()
        config.type = "nope"
        with pytest.raises(ValueError):
            DatasetFactory.load_dataset(config, tokenizer)


class TestNativeBuffer:
    def test_native_available_and_matches_python(self, tokenizer, jsonl_file):
        from lwm_tpu.native import native_available

        assert native_available(), "g++ token buffer failed to build"
        proc_cfg = TextProcessor.get_default_config(dict(fields="text"))
        batches = {}
        for use_native in (True, False):
            config = JsonDataset.get_default_config(
                dict(path=jsonl_file, seq_length=64, batch_size=2,
                     use_data_sharded_loader=False, use_native_buffer=use_native)
            )
            proc = TextProcessor(proc_cfg, tokenizer)
            ds = JsonDataset(config, tokenizer, proc, node_info=NODE_INFO)
            it = iter(ds)
            batches[use_native] = [next(it)[0] for _ in range(4)]
        for b_nat, b_py in zip(batches[True], batches[False]):
            for key in ("input_tokens", "target_tokens", "loss_masks"):
                np.testing.assert_array_equal(b_nat[key], b_py[key], err_msg=key)

    def test_native_buffer_direct(self):
        from lwm_tpu.native import NativeTokenBuffer

        buf = NativeTokenBuffer()
        buf.append([1, 2, 3, 4, 5], [1.0, 0.0, 1.0, 1.0, 0.0], [0, 1, 1, 0, 0])
        assert len(buf) == 5
        assert buf.emit(1, 8) is None  # underfull
        buf.append(list(range(10, 20)), [1.0] * 10, [0] * 10)
        batch = buf.emit(2, 4, with_vision=True)
        np.testing.assert_array_equal(
            batch["input_tokens"].reshape(-1), [1, 2, 3, 4, 5, 10, 11, 12]
        )
        np.testing.assert_array_equal(
            batch["target_tokens"].reshape(-1), [2, 3, 4, 5, 10, 11, 12, 13]
        )
        np.testing.assert_array_equal(
            batch["input_vision_masks"].reshape(-1).astype(int),
            [0, 1, 1, 0, 0, 0, 0, 0],
        )
        assert len(buf) == 7  # consumed 8 of 15
