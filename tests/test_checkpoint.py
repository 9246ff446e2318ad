import os

import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from lwm_tpu.checkpoint import StreamingCheckpointer


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
