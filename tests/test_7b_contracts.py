"""7B released-model contracts, proven without weights.

The reference's public value is running the released LWM-Text-7B family
(reference README.md:74-88); a rule-table or loader break would brick a
released-checkpoint load long before anyone has the 13 GB artifact in CI.
These tests lock the three contracts that loading depends on, at zero
weight cost:

1. The `7b` preset + every partition-rule table (scan axis 0 / 1 /
   unscanned; reference llama.py:221-283) cover EVERY parameter of the
   real 7B tree with a non-default rule, the specs are shardable on the
   4-axis mesh, and the tree is exactly llama-7B-shaped (param count).
2. The full train step AOT-lowers under those shardings on an 8-device
   (1,2,2,2) mesh — rules that match but don't partition would die here.
3. The v1 streaming-checkpoint reader loads a golden fixture written in
   the released (tux/EasyLM) wire format — bare msgpack
   ``(path, to_bytes(leaf))`` tuple records via a `params::` spec
   (reference train.py:337-344) — byte-for-byte independent of our own
   writer.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.training.train_state import TrainState
from jax.sharding import PartitionSpec as PS

from lwm_tpu.checkpoint import StreamingCheckpointer
from lwm_tpu.models.llama import (
    LLAMA_STANDARD_CONFIGS,
    FlaxLLaMAForCausalLMModule,
    LLaMAConfig,
)
from lwm_tpu.optim import OptimizerFactory
from lwm_tpu.parallel import match_partition_rules
from lwm_tpu.parallel.mesh import create_mesh
from lwm_tpu.parallel.partition import (
    get_weight_decay_mask,
    named_tree_map,
    specs_to_shardings,
)
from lwm_tpu.utils import JaxRNG

LLAMA_7B_PARAM_COUNT = 6_738_415_616  # exact llama-7B (vocab 32000)


def _golden_generator():
    """Load tests/fixtures/make_v1_golden.py as a module (tests/ is not a
    package; importlib keeps the fixture generator importable anywhere)."""
    import importlib.util

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "make_v1_golden.py"
    )
    spec = importlib.util.spec_from_file_location("make_v1_golden", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod

RULE_VARIANTS = [
    pytest.param(True, 0, id="scan_axis0"),
    pytest.param(True, 1, id="scan_axis1"),
    pytest.param(False, 0, id="unscanned"),
]


def make_7b_config(scan_layers, scan_axis, **updates):
    cfg = LLaMAConfig.from_dict(LLAMA_STANDARD_CONFIGS["7b"])
    cfg.update(
        dict(
            scan_layers=scan_layers,
            param_scan_axis=scan_axis,
            scan_attention=True,
            scan_mlp=True,
            scan_query_chunk_size=1024,
            scan_key_chunk_size=1024,
            scan_mlp_chunk_size=1024,
            max_sequence_length=2048,
            **updates,
        )
    )
    return cfg


def eval_shape_params(cfg, batch=8, seq=2048):
    model = FlaxLLaMAForCausalLMModule(cfg, dtype=jnp.bfloat16)

    def init_fn(rng):
        return model.init(
            JaxRNG(rng)(cfg.rng_keys()),
            input_ids=jnp.zeros((batch, seq), jnp.int32),
            position_ids=jnp.zeros((batch, seq), jnp.int32),
            attention_mask=jnp.ones((batch, seq), jnp.int32),
        )

    return model, init_fn, jax.eval_shape(init_fn, jax.random.PRNGKey(0))


@pytest.mark.parametrize("scan_layers,scan_axis", RULE_VARIANTS)
def test_7b_rules_cover_every_param(scan_layers, scan_axis):
    """Every leaf of the real 7B tree matches a rule BEFORE the catch-all,
    and its spec divides the (1,2,2,2) mesh — so a released checkpoint
    shards with no involuntarily-replicated weight matrices."""
    cfg = make_7b_config(scan_layers, scan_axis)
    _, _, shapes = eval_shape_params(cfg)
    rules = LLaMAConfig.get_partition_rules(scan_layers, scan_axis)
    assert rules[-1][0] == ".*"  # the catch-all is the default rule
    mesh = create_mesh("1,2,2,2")

    import re

    fallthrough = []

    def check(path, leaf):
        for rule, spec in rules[:-1]:
            if re.search(rule, path):
                break
        else:
            fallthrough.append((path, leaf.shape))
            return leaf
        # the matched spec must be rank-compatible and divide the mesh
        assert len(spec) <= leaf.ndim, (path, spec, leaf.shape)
        for dim, entry in enumerate(spec):
            names = (
                entry if isinstance(entry, tuple) else (entry,)
            ) if entry is not None else ()
            size = int(np.prod([mesh.shape[n] for n in names], initial=1))
            assert leaf.shape[dim] % size == 0, (path, spec, leaf.shape)
        return leaf

    named_tree_map(check, shapes["params"])
    assert fallthrough == [], (
        f"7B params covered only by the default rule: {fallthrough}"
    )

    total = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"])
    )
    assert total == LLAMA_7B_PARAM_COUNT, total

    # and the matcher itself accepts the tree (raises on zero matches)
    specs = match_partition_rules(rules, shapes)
    sharded = sum(
        1 for s in jax.tree.leaves(
            specs, is_leaf=lambda x: isinstance(x, PS)
        ) if any(e is not None for e in s)
    )
    # wte + lm_head + the 7 dense kernels (stacked leaves when scanned,
    # per-layer leaves otherwise)
    assert sharded == (9 if scan_layers else 7 * 32 + 2), sharded


@pytest.mark.parametrize("scan_layers,scan_axis", RULE_VARIANTS)
def test_7b_train_step_lowers_on_mesh(scan_layers, scan_axis):
    """AOT-lower the full 7B train step (fwd+bwd+adamw update) over a
    (1,2,2,2) dp/fsdp/tp/sp mesh from abstract shapes only: validates
    that the rule tables + activation constraints produce a partitionable
    program at real 7B dimensions (VERDICT r2 item 3)."""
    cfg = make_7b_config(scan_layers, scan_axis)
    batch, seq = 8, 2048
    model, init_fn, state_shapes_inner = eval_shape_params(cfg, batch, seq)
    optimizer, optimizer_info = OptimizerFactory.get_optimizer(
        OptimizerFactory.get_default_config(),
        get_weight_decay_mask(LLaMAConfig.get_weight_decay_exclusions()),
    )

    def make_state(rng):
        return TrainState.create(
            params=init_fn(rng), tx=optimizer, apply_fn=None
        )

    state_shapes = jax.eval_shape(make_state, jax.random.PRNGKey(0))
    partition = match_partition_rules(
        LLaMAConfig.get_partition_rules(scan_layers, scan_axis), state_shapes
    )
    mesh = create_mesh("1,2,2,2")
    state_shardings = specs_to_shardings(partition, mesh)
    batch_shardings = specs_to_shardings(PS(("dp", "fsdp"), "sp"), mesh)
    replicated = specs_to_shardings(PS(), mesh)

    from lwm_tpu.parallel import with_sharding_constraint
    from lwm_tpu.utils.losses import cross_entropy_loss_and_accuracy

    def train_step(state, rng, batch_tokens):
        batch_tokens = with_sharding_constraint(
            batch_tokens, PS(("dp", "fsdp"), "sp")
        )

        def loss_fn(params):
            logits = model.apply(
                params,
                batch_tokens["input_tokens"],
                deterministic=True,
                rngs=JaxRNG(rng)(cfg.rng_keys()),
            ).logits
            return cross_entropy_loss_and_accuracy(
                logits, batch_tokens["target_tokens"],
                batch_tokens["loss_masks"], chunk_size=1024,
            )

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads=grads), loss

    abstract_batch = {
        k: jax.ShapeDtypeStruct(
            (batch, seq), jnp.int32 if k != "loss_masks" else jnp.float32
        )
        for k in ("input_tokens", "target_tokens", "loss_masks")
    }
    with mesh:
        lowered = jax.jit(
            train_step,
            in_shardings=(state_shardings, replicated, batch_shardings),
            out_shardings=(state_shardings, None),
            donate_argnums=(0,),
        ).lower(
            state_shapes,
            jax.ShapeDtypeStruct((2,), jnp.uint32),
            abstract_batch,
        )
    text = lowered.as_text()
    assert "sharding" in text  # GSPMD annotations made it into the module


def test_v1_golden_fixture_loads():
    """The committed released-format (v1 tuple-record) stream loads through
    `params::` with exact values — locks the reader against the published
    LWM checkpoint wire format independent of our own writer."""
    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "v1_golden_params.ckpt"
    )
    _, params = StreamingCheckpointer.load_trainstate_checkpoint(
        f"params::{path}"
    )
    params = params["params"]

    # the fixture generator's seeded values (tests/fixtures/make_v1_golden.py)
    gen = _golden_generator()
    VOCAB, HIDDEN, INTER, LAYERS = gen.VOCAB, gen.HIDDEN, gen.INTER, gen.LAYERS
    expected = gen.make_params()
    flat_got, flat_want = {}, {}

    def collect(dst):
        def f(path, leaf):
            dst[path] = np.asarray(leaf)
            return leaf
        return f

    named_tree_map(collect(flat_got), params)
    named_tree_map(collect(flat_want), expected)
    assert set(flat_got) == set(flat_want)
    for key in flat_want:
        np.testing.assert_array_equal(flat_got[key], flat_want[key], err_msg=key)

    # and the loaded tree drives a real forward pass of the matching config
    cfg = LLaMAConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=INTER,
        num_hidden_layers=LAYERS, num_attention_heads=2,
        max_sequence_length=64, scan_layers=False, scan_attention=False,
        scan_mlp=False,
    )
    model = FlaxLLaMAForCausalLMModule(cfg, dtype=jnp.float32)
    ids = jnp.arange(16, dtype=jnp.int32)[None, :] % VOCAB
    logits = model.apply(
        {"params": params}, ids, deterministic=True
    ).logits
    assert logits.shape == (1, 16, VOCAB)
    assert bool(jnp.isfinite(logits).all())


def test_v1_golden_matches_model_tree():
    """The fixture's tree is exactly the unscanned model param tree — a
    renamed module would silently orphan released leaves otherwise."""
    gen = _golden_generator()
    VOCAB, HIDDEN, INTER, LAYERS = gen.VOCAB, gen.HIDDEN, gen.INTER, gen.LAYERS

    cfg = LLaMAConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=INTER,
        num_hidden_layers=LAYERS, num_attention_heads=2,
        max_sequence_length=64, scan_layers=False, scan_attention=False,
        scan_mlp=False,
    )
    _, _, shapes = eval_shape_params_small(cfg)
    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "v1_golden_params.ckpt"
    )
    _, params = StreamingCheckpointer.load_trainstate_checkpoint(
        f"params::{path}"
    )

    def paths(tree):
        out = set()
        named_tree_map(lambda p, x: out.add(p) or x, tree)
        return out

    assert paths(params["params"]) == paths(shapes["params"])
    shape_of = {}
    named_tree_map(
        lambda p, x: shape_of.__setitem__(p, tuple(x.shape)) or x,
        shapes["params"],
    )
    named_tree_map(
        lambda p, x: (
            np.testing.assert_equal(tuple(np.shape(x)), shape_of[p]) or x
        ),
        params["params"],
    )


def eval_shape_params_small(cfg, batch=1, seq=16):
    return eval_shape_params(cfg, batch=batch, seq=seq)


# ---------------------------------------------------------------------------
# Serving-side 7B contracts (VERDICT r3 task 4): a released checkpoint is
# SERVED, not just trained — init_cache at long-cache shapes, the decode
# step through the sp-sharded cache, and prefill-over-cache must all
# partition on the 4-axis mesh (reference llama.py:440-492, 599-614).
# ---------------------------------------------------------------------------

CACHE_T = 32768  # long-cache serving shape (released models serve >=32K)


def serving_cache_shardings(cache_shapes, mesh):
    """Sharding specs for the KV-cache collection on a (dp,fsdp,tp,sp)
    mesh, matching the model's internal decode contract
    (models/llama.py _inference_attn in_specs): cache is head-major
    [b, h, T, d] — batch over (dp, fsdp), kv heads over tp, SEQUENCE
    over sp (the reference's sp-sharded decode, ref llama.py:599-614);
    int8 scales [b, h, T] ride the same axes; prefix blocks are batch-1
    (replicated batch dim); cache_index is a replicated scalar."""

    def spec(path, leaf):
        name = path.split("/")[-1]
        if name in ("cached_key", "cached_value"):
            return PS(("dp", "fsdp"), "tp", "sp", None)
        if name in ("cached_key_scale", "cached_value_scale"):
            return PS(("dp", "fsdp"), "tp", "sp")
        if name in ("prefix_key", "prefix_value"):
            return PS(None, "tp", "sp", None)
        if name in ("prefix_key_scale", "prefix_value_scale"):
            return PS(None, "tp", "sp")
        assert name == "cache_index", path
        return PS()

    return specs_to_shardings(named_tree_map(spec, cache_shapes), mesh)


@pytest.mark.parametrize("kv_cache_dtype", ["auto", "int8"])
def test_7b_serving_cache_decode_prefill_lower_on_mesh(kv_cache_dtype):
    """AOT-lower the three serving programs at real 7B shapes (unscanned,
    the scan->unscan serving conversion's output form) on the (1,2,2,2)
    mesh: (a) init_cache at batch 8 x 32K cache, (b) one decode step
    (q=1: the query CANNOT shard over sp — replicated q, routed
    shard_map cache write), (c) a 2048-token prefill over the cache
    (q % sp == 0: q DOES shard over sp — the q_sp_dim polymorphism,
    models/llama.py:917-918). Rules that match but don't partition, or
    cache layouts GSPMD can't route, die in these lowerings."""
    cfg = make_7b_config(False, 0, kv_cache_dtype=kv_cache_dtype)
    cfg.update(dict(max_sequence_length=CACHE_T))
    batch = 8
    model = FlaxLLaMAForCausalLMModule(cfg, dtype=jnp.bfloat16)
    mesh = create_mesh("1,2,2,2")

    def init_cache_fn():
        input_ids = jnp.ones((batch, CACHE_T), jnp.int32)
        return model.init(
            jax.random.PRNGKey(0), input_ids, jnp.ones_like(input_ids),
            None,
            jnp.broadcast_to(jnp.arange(CACHE_T)[None], (batch, CACHE_T)),
            return_dict=False, init_cache=True,
        )["cache"]

    cache_shapes = jax.eval_shape(init_cache_fn)
    cache_shardings = serving_cache_shardings(cache_shapes, mesh)
    with mesh:
        lowered_init = jax.jit(
            init_cache_fn, out_shardings=cache_shardings
        ).lower()
    assert "sharding" in lowered_init.as_text()

    _, _, param_shapes = eval_shape_params(cfg, batch=1, seq=16)
    partition = match_partition_rules(
        LLaMAConfig.get_partition_rules(False, 0), param_shapes
    )
    param_shardings = specs_to_shardings(partition, mesh)
    replicated = specs_to_shardings(PS(), mesh)

    def decode_step(variables, cache, tok, mask, pos):
        out, muts = model.apply(
            {"params": variables["params"], "cache": cache},
            tok, mask, None, pos, True, mutable=["cache"],
        )
        return out.logits, muts["cache"]

    abstract = dict(
        tok=jax.ShapeDtypeStruct((batch, 1), jnp.int32),
        mask=jax.ShapeDtypeStruct((batch, CACHE_T), jnp.int32),
        pos=jax.ShapeDtypeStruct((batch, 1), jnp.int32),
    )
    with mesh:
        lowered_decode = jax.jit(
            decode_step,
            in_shardings=(
                param_shardings, cache_shardings,
                replicated, replicated, replicated,
            ),
            out_shardings=(None, cache_shardings),
        ).lower(
            param_shapes, cache_shapes,
            abstract["tok"], abstract["mask"], abstract["pos"],
        )
    assert "sharding" in lowered_decode.as_text()

    # prefill-over-cache: a 2048-token chunk lands at the cache index;
    # q=2048 divides sp=2, so the query shards over sp
    q = 2048
    with mesh:
        lowered_prefill = jax.jit(
            decode_step,
            in_shardings=(
                param_shardings, cache_shardings,
                replicated, replicated, replicated,
            ),
            out_shardings=(None, cache_shardings),
        ).lower(
            param_shapes, cache_shapes,
            jax.ShapeDtypeStruct((batch, q), jnp.int32),
            abstract["mask"],
            jax.ShapeDtypeStruct((batch, q), jnp.int32),
        )
    assert "sharding" in lowered_prefill.as_text()


def test_7b_unscan_roundtrip_matches_model_trees():
    """scan->unscan serving conversion at real 7B shapes: unscan_params of
    the scanned tree produces exactly the unscanned model's param tree
    (paths + shapes), and scan_params inverts it. Runs on int8 zeros —
    the contract under test is tree STRUCTURE at 7B scale, not values
    (values are covered at small shapes in test_interop.py)."""
    from lwm_tpu.utils.checkpoint_convert import scan_params, unscan_params

    cfg_scan = make_7b_config(True, 0)
    cfg_flat = make_7b_config(False, 0)
    _, _, shapes_scan = eval_shape_params(cfg_scan, batch=1, seq=16)
    _, _, shapes_flat = eval_shape_params(cfg_flat, batch=1, seq=16)

    def materialize(shapes):
        return jax.tree.map(lambda s: np.zeros(s.shape, np.int8), shapes)

    def path_shapes(tree):
        out = {}
        named_tree_map(
            lambda p, x: out.__setitem__(p, tuple(np.shape(x))) or x, tree
        )
        return out

    unscanned = unscan_params(
        materialize(shapes_scan["params"]), cfg_scan.num_hidden_layers,
        scan_axis=0,
    )
    assert path_shapes(unscanned) == path_shapes(shapes_flat["params"])

    rescanned = scan_params(
        unscanned, cfg_scan.num_hidden_layers, scan_axis=0
    )
    assert path_shapes(rescanned) == path_shapes(shapes_scan["params"])


# ---------------------------------------------------------------------------
# VideoLLaMA 7B twins: the multimodal rules (vte/vision_head,
# reference vision_llama.py:36-104) at real 7B shapes.
# ---------------------------------------------------------------------------

VIDEO_7B_PARAM_COUNT = LLAMA_7B_PARAM_COUNT + 2 * 8448 * 4096  # + vte + vision_head


def eval_shape_video_params(cfg, batch=1, seq=16):
    from lwm_tpu.models import FlaxVideoLLaMAForCausalLMModule

    model = FlaxVideoLLaMAForCausalLMModule(cfg, dtype=jnp.bfloat16)

    def init_fn(rng):
        return model.init(
            JaxRNG(rng)(cfg.rng_keys()),
            input_ids=jnp.zeros((batch, seq), jnp.int32),
            vision_masks=jnp.zeros((batch, seq), bool),
            position_ids=jnp.zeros((batch, seq), jnp.int32),
            attention_mask=jnp.ones((batch, seq), jnp.int32),
        )

    return model, init_fn, jax.eval_shape(init_fn, jax.random.PRNGKey(0))


@pytest.mark.parametrize("scan_layers,scan_axis", RULE_VARIANTS)
def test_7b_videollama_rules_cover_every_param(scan_layers, scan_axis):
    """Every leaf of the 7B VideoLLaMA tree (text 7B + vte + vision_head,
    vision vocab 8448) matches a non-default rule whose spec divides the
    (1,2,2,2) mesh, and the tree is exactly video-7B-shaped."""
    from lwm_tpu.models import VideoLLaMAConfig

    cfg = VideoLLaMAConfig.from_dict(
        dict(LLAMA_STANDARD_CONFIGS["7b"], vision_vocab_size=8448)
    )
    cfg.update(
        dict(
            scan_layers=scan_layers, param_scan_axis=scan_axis,
            scan_attention=True, scan_mlp=True,
            scan_query_chunk_size=1024, scan_key_chunk_size=1024,
            scan_mlp_chunk_size=1024, max_sequence_length=2048,
        )
    )
    _, _, shapes = eval_shape_video_params(cfg)
    rules = VideoLLaMAConfig.get_partition_rules(scan_layers, scan_axis)
    assert rules[-1][0] == ".*"
    mesh = create_mesh("1,2,2,2")

    import re

    fallthrough = []

    def check(path, leaf):
        for rule, spec in rules[:-1]:
            if re.search(rule, path):
                break
        else:
            fallthrough.append((path, leaf.shape))
            return leaf
        assert len(spec) <= leaf.ndim, (path, spec, leaf.shape)
        for dim, entry in enumerate(spec):
            names = (
                entry if isinstance(entry, tuple) else (entry,)
            ) if entry is not None else ()
            size = int(np.prod([mesh.shape[n] for n in names], initial=1))
            assert leaf.shape[dim] % size == 0, (path, spec, leaf.shape)
        return leaf

    named_tree_map(check, shapes["params"])
    assert fallthrough == [], (
        f"video-7B params covered only by the default rule: {fallthrough}"
    )

    total = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"])
    )
    assert total == VIDEO_7B_PARAM_COUNT, total

    specs = match_partition_rules(rules, shapes)
    sharded = sum(
        1 for s in jax.tree.leaves(
            specs, is_leaf=lambda x: isinstance(x, PS)
        ) if any(e is not None for e in s)
    )
    # text's sharded leaves + vte + vision_head
    assert sharded == (11 if scan_layers else 7 * 32 + 4), sharded
