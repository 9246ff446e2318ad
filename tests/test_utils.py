import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as PS

from lwm_tpu.parallel import (
    create_mesh,
    get_weight_decay_mask,
    make_shard_and_gather_fns,
    match_partition_rules,
)
from lwm_tpu.parallel.mesh import parse_mesh_dims
from lwm_tpu.utils import (
    JaxRNG,
    cross_entropy_loss_and_accuracy,
    get_float_dtype_by_name,
    global_norm,
)


class TestMesh:
    def test_parse_basic(self):
        dims, strict = parse_mesh_dims("1,2,2,2", 8)
        assert dims == [1, 2, 2, 2] and not strict

    def test_parse_infer(self):
        dims, _ = parse_mesh_dims("1,-1,1,2", 8)
        assert dims == [1, 4, 1, 2]

    def test_parse_strict(self):
        dims, strict = parse_mesh_dims("!1,1,-1,1", 8)
        assert dims == [1, 1, 8, 1] and strict

    def test_parse_errors(self):
        with pytest.raises(ValueError):
            parse_mesh_dims("1,2,2", 8)
        with pytest.raises(ValueError):
            parse_mesh_dims("-1,-1,1,1", 8)
        with pytest.raises(ValueError):
            parse_mesh_dims("1,3,1,1", 8)

    def test_create_mesh(self, devices8):
        mesh = create_mesh("2,2,1,2")
        assert mesh.shape == {"dp": 2, "fsdp": 2, "tp": 1, "sp": 2}
        mesh = create_mesh("!1,1,-1,1")
        assert mesh.shape["tp"] == 8


class TestPartition:
    def test_match_rules(self):
        params = {
            "transformer": {"wte": {"embedding": np.zeros((8, 4))}},
            "lm_head": {"kernel": np.zeros((4, 8))},
            "norm": {"scale": np.zeros((4,))},
        }
        rules = (
            ("transformer/wte/embedding", PS("tp", ("fsdp", "sp"))),
            ("lm_head/kernel", PS(("fsdp", "sp"), "tp")),
            (".*", PS(None)),
        )
        specs = match_partition_rules(rules, params)
        assert specs["transformer"]["wte"]["embedding"] == PS("tp", ("fsdp", "sp"))
        assert specs["lm_head"]["kernel"] == PS(("fsdp", "sp"), "tp")
        assert specs["norm"]["scale"] == PS(None)

    def test_no_match_raises(self):
        with pytest.raises(ValueError):
            match_partition_rules((("nope", PS()),), {"a": np.zeros((2, 2))})

    def test_shard_and_gather(self, devices8):
        mesh = create_mesh("1,2,2,2")
        params = {"w": np.arange(32, dtype=np.float32).reshape(8, 4)}
        specs = match_partition_rules(((".*", PS("fsdp", "tp")),), params)
        shard_fns, gather_fns = make_shard_and_gather_fns(specs, mesh)
        sharded = jax.tree_util.tree_map(lambda f, x: f(x), shard_fns, params)
        assert sharded["w"].sharding.spec == PS("fsdp", "tp")
        gathered = jax.tree_util.tree_map(lambda f, x: f(x), gather_fns, sharded)
        np.testing.assert_array_equal(gathered["w"], params["w"])

    def test_weight_decay_mask(self):
        params = {"a": {"kernel": 1.0}, "ln": {"scale": 1.0}}
        mask = get_weight_decay_mask(["scale"])(params)
        assert mask["a"]["kernel"] is True
        assert mask["ln"]["scale"] is False


class TestRngAndLosses:
    def test_jax_rng(self):
        rng = JaxRNG.from_seed(0)
        k1 = rng()
        k2 = rng()
        assert not np.array_equal(k1, k2)
        named = rng(("params", "dropout"))
        assert set(named) == {"params", "dropout"}

    def test_cross_entropy(self):
        logits = jnp.zeros((2, 3, 5))
        tokens = jnp.zeros((2, 3), dtype=jnp.int32)
        loss, acc = cross_entropy_loss_and_accuracy(logits, tokens)
        np.testing.assert_allclose(float(loss), np.log(5.0), rtol=1e-5)

    def test_cross_entropy_masked(self):
        logits = np.zeros((1, 2, 4), dtype=np.float32)
        logits[0, 0, 1] = 100.0  # confident correct at pos 0
        tokens = jnp.array([[1, 2]])
        mask = jnp.array([[1.0, 0.0]])
        loss, acc = cross_entropy_loss_and_accuracy(jnp.array(logits), tokens, mask)
        assert float(loss) < 1e-4
        assert float(acc) == 1.0

    def test_global_norm(self):
        tree = {"a": jnp.array([3.0]), "b": jnp.array([4.0])}
        np.testing.assert_allclose(float(global_norm(tree)), 5.0, rtol=1e-6)

    def test_dtype_lookup(self):
        assert get_float_dtype_by_name("bf16") == jnp.bfloat16
        assert get_float_dtype_by_name("fp32") == jnp.float32


class TestChunkedAndFusedCE:
    def _setup(self):
        h = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 32))
        W = jax.random.normal(jax.random.PRNGKey(1), (32, 50)) * 0.1
        tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 64), 0, 50)
        valid = (jax.random.uniform(jax.random.PRNGKey(3), (2, 64)) > 0.3).astype(
            jnp.float32
        )
        return h, W, tokens, valid

    def test_chunked_matches_full(self):
        h, W, tokens, valid = self._setup()
        logits = h @ W
        l1, a1 = cross_entropy_loss_and_accuracy(logits, tokens, valid)
        l2, a2 = cross_entropy_loss_and_accuracy(logits, tokens, valid, chunk_size=16)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        np.testing.assert_allclose(float(a1), float(a2), rtol=1e-6)
        g1 = jax.grad(lambda x: cross_entropy_loss_and_accuracy(x, tokens, valid)[0])(logits)
        g2 = jax.grad(
            lambda x: cross_entropy_loss_and_accuracy(x, tokens, valid, chunk_size=16)[0]
        )(logits)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)

    def test_fused_matches_logits_path(self):
        from lwm_tpu.utils.losses import fused_lm_cross_entropy

        h, W, tokens, valid = self._setup()
        l1, a1 = cross_entropy_loss_and_accuracy(h @ W, tokens, valid)
        l2, a2 = fused_lm_cross_entropy(h, W, tokens, valid, chunk_size=16)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        np.testing.assert_allclose(float(a1), float(a2), rtol=1e-6)
        g1 = jax.grad(
            lambda h, W: cross_entropy_loss_and_accuracy(h @ W, tokens, valid)[0],
            argnums=(0, 1),
        )(h, W)
        g2 = jax.grad(
            lambda h, W: fused_lm_cross_entropy(h, W, tokens, valid, chunk_size=16)[0],
            argnums=(0, 1),
        )(h, W)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestFrozenBaseFinetuning:
    """freeze_base wiring: vte/vision_head update, base params stay frozen
    (reference llama.py:289-294 via get_frozen_param_exclusions)."""

    def test_frozen_base_mask_updates_only_vision_params(self):
        import optax
        from flax.training.train_state import TrainState

        from lwm_tpu.models.vision_llama import VideoLLaMAConfig
        from lwm_tpu.optim import OptimizerFactory
        from lwm_tpu.parallel.partition import get_frozen_base_mask

        params = {
            "params": {
                "transformer": {
                    "wte": {"embedding": jnp.ones((8, 4))},
                    "vte": {"embedding": jnp.ones((8, 4))},
                    "h": {"attention": {"wq": {"kernel": jnp.ones((4, 4))}}},
                },
                "vision_head": {"kernel": jnp.ones((4, 8))},
            }
        }
        mask_fn = get_frozen_base_mask(
            VideoLLaMAConfig.get_frozen_param_exclusions(True)
        )
        mask = mask_fn(params)
        assert mask["params"]["transformer"]["wte"]["embedding"] is True
        assert mask["params"]["transformer"]["vte"]["embedding"] is False
        assert mask["params"]["vision_head"]["kernel"] is False

        optimizer, _ = OptimizerFactory.get_optimizer(
            OptimizerFactory.get_default_config(
                dict(adamw_optimizer=dict(lr=0.1, lr_warmup_steps=1, lr_decay_steps=10))
            ),
            frozen_param_mask=mask_fn,
        )
        state = TrainState.create(apply_fn=None, params=params, tx=optimizer)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        # two steps: warmup lr is 0 at step 0
        new_state = state.apply_gradients(grads=grads).apply_gradients(grads=grads)
        p0, p1 = state.params["params"], new_state.params["params"]
        np.testing.assert_array_equal(  # frozen: unchanged
            p1["transformer"]["wte"]["embedding"], p0["transformer"]["wte"]["embedding"]
        )
        np.testing.assert_array_equal(
            p1["transformer"]["h"]["attention"]["wq"]["kernel"],
            p0["transformer"]["h"]["attention"]["wq"]["kernel"],
        )
        assert not np.allclose(  # trainable: moved
            p1["transformer"]["vte"]["embedding"], p0["transformer"]["vte"]["embedding"]
        )
        assert not np.allclose(p1["vision_head"]["kernel"], p0["vision_head"]["kernel"])
