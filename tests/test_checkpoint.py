import os

import jax.numpy as jnp
import msgpack
import numpy as np
import optax
import pytest
from flax.serialization import to_bytes
from flax.training.train_state import TrainState

from lwm_tpu.checkpoint import StreamingCheckpointer, load_stream, save_stream


def make_state():
    params = {
        "params": {
            "dense": {"kernel": jnp.arange(12, dtype=jnp.float32).reshape(3, 4)},
            "norm": {"scale": jnp.ones((4,))},
        }
    }
    tx = optax.adamw(1e-3)
    return TrainState.create(apply_fn=None, params=params, tx=tx)


class TestStreamingCheckpointer:
    def test_trainstate_roundtrip(self, tmp_path):
        state = make_state()
        ckpt = StreamingCheckpointer(
            StreamingCheckpointer.get_default_config(
                dict(save_optimizer_state=True, float_dtype="fp32")
            ),
            str(tmp_path),
        )
        ckpt.save_checkpoint(state, "streaming_train_state")
        restored, _ = StreamingCheckpointer.load_trainstate_checkpoint(
            f"trainstate::{tmp_path}/streaming_train_state",
            trainstate_target=state,
        )
        np.testing.assert_array_equal(
            restored.params["params"]["dense"]["kernel"],
            state.params["params"]["dense"]["kernel"],
        )
        assert restored.step == state.step

    def test_params_only_roundtrip(self, tmp_path):
        state = make_state()
        ckpt = StreamingCheckpointer(
            StreamingCheckpointer.get_default_config(dict(float_dtype="fp32")),
            str(tmp_path),
        )
        ckpt.save_checkpoint(state.params["params"], "streaming_params")
        _, params = StreamingCheckpointer.load_trainstate_checkpoint(
            f"params::{tmp_path}/streaming_params",
            trainstate_target=state,
        )
        np.testing.assert_array_equal(
            params["params"]["dense"]["kernel"],
            state.params["params"]["dense"]["kernel"],
        )

    def test_save_all_and_bf16_cast(self, tmp_path):
        state = make_state()
        ckpt = StreamingCheckpointer(
            StreamingCheckpointer.get_default_config(dict(float_dtype="bf16")),
            str(tmp_path),
        )
        import jax as _jax

        gather_fns = _jax.tree_util.tree_map(lambda x: (lambda y: y), state)
        ckpt.save_all(state, gather_fns, metadata={"step": 0}, dataset={"idx": 1})
        assert os.path.exists(tmp_path / "streaming_params")
        assert os.path.exists(tmp_path / "metadata.pkl")
        assert os.path.exists(tmp_path / "dataset.pkl")
        loaded = StreamingCheckpointer.load_checkpoint(str(tmp_path / "streaming_params"))
        assert loaded["dense"]["kernel"].dtype == jnp.bfloat16

    def test_milestone_save_names(self, tmp_path):
        state = make_state()
        ckpt = StreamingCheckpointer(
            StreamingCheckpointer.get_default_config(dict(float_dtype="fp32")),
            str(tmp_path),
        )
        import jax as _jax

        gather_fns = _jax.tree_util.tree_map(lambda x: (lambda y: y), state)
        ckpt.save_all(state, gather_fns, metadata={}, dataset={}, milestone=True)
        assert os.path.exists(tmp_path / "streaming_params_0")
        assert os.path.exists(tmp_path / "metadata_0.pkl")


class TestChunkedStream:
    def test_multi_chunk_leaf_roundtrip(self, tmp_path):
        """A leaf far larger than chunk_bytes must round-trip via many
        row-chunk records (the >2GB-leaf path, exercised with a tiny budget)."""
        rng = np.random.RandomState(0)
        big = rng.randn(64, 37).astype(np.float32)  # 64 rows, ~9.5KB
        flat = {("a", "big"): big, ("a", "scalar"): np.float32(3.5)}
        path = str(tmp_path / "ckpt")
        save_stream(flat, path, chunk_bytes=1024)  # ~6 rows per chunk
        out = load_stream(path)
        np.testing.assert_array_equal(out[("a", "big")], big)
        assert out[("a", "scalar")] == np.float32(3.5)

    def test_row_larger_than_chunk_budget(self, tmp_path):
        """A single row above the budget falls back to flat-element chunking."""
        big = np.arange(4 * 1000, dtype=np.int32).reshape(4, 1000)  # 4KB rows
        path = str(tmp_path / "ckpt")
        save_stream({("w",): big}, path, chunk_bytes=512)
        out = load_stream(path)
        np.testing.assert_array_equal(out[("w",)], big)

    def test_bf16_and_int_dtypes(self, tmp_path):
        flat = {
            ("f",): np.ones((3, 3), np.float32),
            ("i",): np.arange(5, dtype=np.int64),
            ("b",): jnp.ones((2, 2), jnp.bfloat16),
        }
        path = str(tmp_path / "ckpt")
        save_stream(flat, path, float_dtype="bf16")
        out = load_stream(path)
        assert out[("f",)].dtype == jnp.bfloat16  # float leaves cast
        assert out[("i",)].dtype == np.int64  # ints untouched
        np.testing.assert_array_equal(np.asarray(out[("b",)]), np.ones((2, 2)))

    def test_v1_format_backward_compat(self, tmp_path):
        """Round-1 / tux-lineage streams of (path, flax-bytes) tuples load."""
        path = str(tmp_path / "v1")
        packer = msgpack.Packer()
        kernel = np.arange(6, dtype=np.float32).reshape(2, 3)
        with open(path, "wb") as f:
            f.write(packer.pack((("dense", "kernel"), to_bytes(kernel))))
            f.write(packer.pack((("norm", "scale"), to_bytes(np.ones(3, np.float32)))))
        out = load_stream(path)
        np.testing.assert_array_equal(out[("dense", "kernel")], kernel)

    def test_shard_fns_applied_per_leaf(self, tmp_path):
        calls = []

        def shard(x):
            calls.append(x.shape)
            return x * 2

        path = str(tmp_path / "ckpt")
        save_stream({("w",): np.ones((4, 4), np.float32)}, path)
        out = load_stream(path, shard_fns={("w",): shard})
        assert calls == [(4, 4)]
        np.testing.assert_array_equal(out[("w",)], 2 * np.ones((4, 4)))

    @pytest.mark.skipif(
        os.environ.get("LWM_TPU_BIG_CKPT_TEST", "") == "",
        reason="set LWM_TPU_BIG_CKPT_TEST=1 to run the real >2GB-leaf test",
    )
    def test_over_2gb_leaf(self, tmp_path):
        """A 7B-scan-shaped fp32 leaf (>2GB) saves and loads without any
        single >2GB record (msgpack bin limit) or host buffer."""
        # 32 x 4096 x 4096 fp32 = 2.147 GB, the 7B stacked-scan adam-moment shape
        big = np.ones((32, 4096, 4096), dtype=np.float32)
        big[5, 123, 456] = 7.0
        path = str(tmp_path / "big")
        save_stream({("mu", "wq"): big}, path)
        out = load_stream(path)
        assert out[("mu", "wq")].shape == (32, 4096, 4096)
        assert out[("mu", "wq")][5, 123, 456] == 7.0
        assert out[("mu", "wq")][0, 0, 0] == 1.0
