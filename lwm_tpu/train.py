"""Training entry point: flags → mesh → dataset → model → sharded train loop
with eval, logging, checkpointing and autoresume.

Mirrors the reference app contract (SURVEY.md §2 item 15, §3.1; reference
lwm/train.py): modality switch 'text' vs 'vision,text', masked-CE loss (dual
0.5·(vision_ce + text_ce) for vision), pjit-sharded init/train/eval steps
with donated state, milestone checkpoints, dataset-state resume.

Run: python -m lwm_tpu.train --mesh_dim='1,-1,1,1' --load_llama_config='debug' ...
"""

from __future__ import annotations

import os
import pprint

import jax

if os.environ.get("LWM_PLATFORM"):
    # reliable platform pinning: in this image the axon TPU plugin
    # overrides the JAX_PLATFORMS env var, so CPU-targeted runs (tests,
    # smoke trains next to a busy chip) must pin through the config API
    jax.config.update("jax_platforms", os.environ["LWM_PLATFORM"])
import jax.numpy as jnp
import numpy as np
from absl import app, logging
import flax.core
from flax.training.train_state import TrainState
from jax.sharding import PartitionSpec as PS
from tqdm import tqdm, trange

from lwm_tpu.checkpoint import StreamingCheckpointer
from lwm_tpu.data import DatasetFactory
from lwm_tpu.models.llama import FlaxLLaMAForCausalLMModule, LLaMAConfig
from lwm_tpu.models.vision_llama import FlaxVideoLLaMAForCausalLMModule, VideoLLaMAConfig
from lwm_tpu.optim import OptimizerFactory
from lwm_tpu.parallel import (
    make_shard_and_gather_fns,
    match_partition_rules,
    with_sharding_constraint,
)
from lwm_tpu.parallel.partition import specs_to_shardings
from lwm_tpu.parallel.mesh import DistributedConfig
from lwm_tpu.utils import (
    JaxRNG,
    average_metrics,
    check_exists,
    cross_entropy_loss_and_accuracy,
    define_flags_with_default,
    get_float_dtype_by_name,
    get_user_flags,
    global_norm,
    load_pickle,
    next_rng,
    set_random_seed,
)
from lwm_tpu.parallel.partition import get_frozen_base_mask, get_weight_decay_mask
from lwm_tpu.utils.logging import MetricsLogger

FLAGS, FLAGS_DEF = define_flags_with_default(
    seed=42,
    mesh_dim="1,-1,1,1",
    dtype="fp32",
    modality="text",
    total_steps=10000,
    load_llama_config="",
    update_llama_config="",
    load_checkpoint="",
    load_dataset_state="",
    log_freq=50,
    profile_start_step=0,
    profile_steps=0,
    profile_dir="",
    save_model_freq=0,
    save_milestone_freq=0,
    eval_steps=0,
    tokenizer="openlm-research/open_llama_3b_v2",
    use_data_sharded_loader=True,
    sp_layout="contiguous",
    freeze_base=False,
    loss_chunk_size=0,
    fused_lm_loss=False,
    autoresume=False,
    train_dataset=DatasetFactory.get_default_config(),
    eval_dataset=DatasetFactory.get_default_config(),
    optimizer=OptimizerFactory.get_default_config(),
    checkpointer=StreamingCheckpointer.get_default_config(),
    llama=LLaMAConfig.get_default_config(),
    logger=MetricsLogger.get_default_config(),
    log_all_worker=False,
    jax_distributed=DistributedConfig.get_default_config(),
)


def build_model_config(flags, seq_length):
    """Layered config resolution (reference train.py:105-129): preset →
    scan-knob overlay → eval'd update dict → forced tokenizer/mesh fields."""
    if flags.modality == "text":
        config_cls = LLaMAConfig
    elif flags.modality == "vision,text":
        config_cls = VideoLLaMAConfig
    else:
        raise ValueError(f"unsupported modality: {flags.modality}")

    if flags.load_llama_config != "":
        llama_config = config_cls.load_config(flags.load_llama_config)
        updates = config_cls(**flags.llama)
        for key in (
            "scan_attention", "scan_mlp", "scan_query_chunk_size",
            "scan_key_chunk_size", "scan_mlp_chunk_size", "scan_layers",
            "param_scan_axis",
        ):
            setattr(llama_config, key, getattr(updates, key))
    else:
        llama_config = config_cls(**flags.llama)

    if flags.update_llama_config != "":
        llama_config.update(dict(eval(flags.update_llama_config)))

    llama_config.update(dict(mesh_dim=flags.mesh_dim))
    return config_cls, llama_config


def main(argv):
    DistributedConfig.initialize(FLAGS.jax_distributed)
    variant = get_user_flags(FLAGS, FLAGS_DEF)
    set_random_seed(FLAGS.seed)

    logger = MetricsLogger(
        config=FLAGS.logger,
        variant=variant,
        enable=FLAGS.log_all_worker or (jax.process_index() == 0),
    )
    output_dir = logger.output_dir

    if FLAGS.modality == "text":
        config_cls = LLaMAConfig
    else:
        config_cls = VideoLLaMAConfig

    mesh = config_cls.get_jax_mesh(FLAGS.mesh_dim)
    node_info = config_cls.get_ranks_and_size(mesh)

    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(FLAGS.tokenizer)

    # autoresume: pick up the rolling checkpoint + dataset state if present
    load_checkpoint = FLAGS.load_checkpoint
    load_dataset_state = FLAGS.load_dataset_state
    if FLAGS.autoresume and check_exists(
        os.path.join(output_dir, "streaming_train_state")
    ):
        logging.info("autoresuming from %s", output_dir)
        load_checkpoint = f"trainstate::{os.path.join(output_dir, 'streaming_train_state')}"
        load_dataset_state = os.path.join(output_dir, "dataset.pkl")

    train_dataset_config = FLAGS.train_dataset
    if FLAGS.sp_layout != "contiguous":
        train_dataset_config.json_dataset.sp_layout = FLAGS.sp_layout
        train_dataset_config.json_vision_dataset.sp_layout = FLAGS.sp_layout
    dataset = DatasetFactory.load_dataset(
        train_dataset_config, tokenizer, node_info=node_info
    )
    if load_dataset_state != "":
        dataset.load_state_dict(load_pickle(load_dataset_state))

    if FLAGS.eval_steps > 0:
        eval_dataset = DatasetFactory.load_dataset(
            FLAGS.eval_dataset, dataset.tokenizer, node_info=node_info
        )
        eval_iterator = iter(eval_dataset)

    seq_length = dataset.seq_length
    _, llama_config = build_model_config(FLAGS, seq_length)
    if llama_config.vocab_size < dataset.vocab_size:
        llama_config.update(dict(vocab_size=dataset.vocab_size))
    llama_config.update(
        dict(
            bos_token_id=dataset.tokenizer.bos_token_id,
            eos_token_id=dataset.tokenizer.eos_token_id,
            sp_layout=FLAGS.sp_layout,
        )
    )

    if FLAGS.modality == "text":
        model = FlaxLLaMAForCausalLMModule(
            llama_config, dtype=get_float_dtype_by_name(FLAGS.dtype)
        )
    else:
        if llama_config.sample_mode != "all":
            raise ValueError(
                "vision,text training needs sample_mode='all' (dual "
                f"vision+text logits); got sample_mode="
                f"'{llama_config.sample_mode}' — 'vision'/'text' are "
                "sampling-time modes (set them at generation, not here)"
            )
        model = FlaxVideoLLaMAForCausalLMModule(
            llama_config, dtype=get_float_dtype_by_name(FLAGS.dtype)
        )

    config_cls_ = LLaMAConfig if FLAGS.modality == "text" else VideoLLaMAConfig
    frozen_param_mask = None
    if FLAGS.freeze_base:
        # vision-finetune recipe: freeze the text base, train only the
        # params the config excludes from freezing (vte / vision_head)
        frozen_param_mask = get_frozen_base_mask(
            config_cls_.get_frozen_param_exclusions(True)
        )
    optimizer, optimizer_info = OptimizerFactory.get_optimizer(
        FLAGS.optimizer,
        get_weight_decay_mask(config_cls_.get_weight_decay_exclusions()),
        frozen_param_mask=frozen_param_mask,
    )

    def init_fn(rng):
        rng_generator = JaxRNG(rng)
        init_batch = 512
        if FLAGS.modality == "text":
            params = model.init(
                rng_generator(llama_config.rng_keys()),
                input_ids=jnp.zeros((init_batch, seq_length), jnp.int32),
                position_ids=jnp.zeros((init_batch, seq_length), jnp.int32),
                attention_mask=jnp.ones((init_batch, seq_length), jnp.int32),
            )
        else:
            params = model.init(
                rng_generator(llama_config.rng_keys()),
                input_ids=jnp.zeros((init_batch, seq_length), jnp.int32),
                vision_masks=jnp.zeros((init_batch, seq_length), bool),
                position_ids=jnp.zeros((init_batch, seq_length), jnp.int32),
                attention_mask=jnp.ones((init_batch, seq_length), jnp.int32),
            )
        return TrainState.create(params=params, tx=optimizer, apply_fn=None)

    def create_trainstate_from_params(params):
        return TrainState.create(params=params, tx=optimizer, apply_fn=None)

    def compute_loss(params, batch, rng_generator):
        if FLAGS.modality == "text":
            if FLAGS.fused_lm_loss:
                # logits never materialize: per-chunk lm_head + CE
                from lwm_tpu.utils.losses import fused_lm_cross_entropy

                hidden = model.apply(
                    params,
                    batch["input_tokens"],
                    deterministic=False,
                    rngs=rng_generator(llama_config.rng_keys()),
                    method="forward_hidden",
                )
                if llama_config.tie_word_embeddings:
                    lm_kernel = params["params"]["transformer"]["wte"]["embedding"].T
                else:
                    lm_kernel = params["params"]["lm_head"]["kernel"]
                loss, acc = fused_lm_cross_entropy(
                    hidden, lm_kernel, batch["target_tokens"],
                    batch["loss_masks"],
                    chunk_size=FLAGS.loss_chunk_size or 2048,
                )
                return loss, dict(acc=acc)
            logits = model.apply(
                params,
                batch["input_tokens"],
                deterministic=False,
                rngs=rng_generator(llama_config.rng_keys()),
            ).logits
            loss, acc = cross_entropy_loss_and_accuracy(
                logits, batch["target_tokens"], batch["loss_masks"],
                chunk_size=FLAGS.loss_chunk_size or None,
            )
            return loss, dict(acc=acc)
        vision_logits, text_logits = model.apply(
            params,
            batch["input_tokens"],
            batch["input_vision_masks"],
            deterministic=False,
            rngs=rng_generator(llama_config.rng_keys()),
        ).logits
        vision_loss, vision_acc = cross_entropy_loss_and_accuracy(
            vision_logits,
            jnp.where(batch["target_vision_masks"], batch["target_tokens"], 0),
            batch["loss_masks"] * batch["target_vision_masks"],
            chunk_size=FLAGS.loss_chunk_size or None,
        )
        text_loss, text_acc = cross_entropy_loss_and_accuracy(
            text_logits,
            jnp.where(batch["target_vision_masks"], 0, batch["target_tokens"]),
            batch["loss_masks"] * (1.0 - batch["target_vision_masks"]),
            chunk_size=FLAGS.loss_chunk_size or None,
        )
        loss = 0.5 * (vision_loss + text_loss)
        return loss, dict(
            vision_loss=vision_loss, vision_acc=vision_acc,
            text_loss=text_loss, text_acc=text_acc,
        )

    def train_step(train_state, rng, batch):
        rng_generator = JaxRNG(rng)
        batch = with_sharding_constraint(batch, PS(("dp", "fsdp"), "sp"))
        grad_fn = jax.value_and_grad(
            lambda p: compute_loss(p, batch, rng_generator), has_aux=True
        )
        (loss, loss_metrics), grads = grad_fn(train_state.params)
        train_state = train_state.apply_gradients(grads=grads)
        metrics = dict(
            loss=loss,
            learning_rate=optimizer_info["learning_rate_schedule"](train_state.step),
            param_norm=global_norm(train_state.params),
            gradient_norm=global_norm(grads),
            **loss_metrics,
        )
        return train_state, rng_generator(), metrics

    def eval_step(train_state, rng, batch):
        rng_generator = JaxRNG(rng)
        batch = with_sharding_constraint(batch, PS(("dp", "fsdp"), "sp"))
        loss, loss_metrics = compute_loss(train_state.params, batch, rng_generator)
        return rng_generator(), dict(eval_loss=loss, **{f"eval_{k}": v for k, v in loss_metrics.items()})

    train_state_shapes = jax.eval_shape(init_fn, next_rng())
    train_state_partition = match_partition_rules(
        config_cls_.get_partition_rules(
            llama_config.scan_layers, llama_config.param_scan_axis
        ),
        train_state_shapes,
    )
    shard_fns, gather_fns = make_shard_and_gather_fns(
        train_state_partition, mesh, train_state_shapes
    )
    checkpointer = StreamingCheckpointer(
        FLAGS.checkpointer, output_dir, enable=jax.process_index() == 0
    )

    state_shardings = specs_to_shardings(train_state_partition, mesh)
    replicated = specs_to_shardings(PS(), mesh)
    batch_sharding = specs_to_shardings(
        PS(("dp", "fsdp"), "sp") if FLAGS.use_data_sharded_loader else PS(), mesh
    )
    sharded_init_fn = jax.jit(
        init_fn,
        out_shardings=state_shardings,
    )
    sharded_create_trainstate_from_params = jax.jit(
        create_trainstate_from_params,
        in_shardings=(state_shardings.params,),
        out_shardings=state_shardings,
        donate_argnums=(0,),
    )
    sharded_train_step = jax.jit(
        train_step,
        in_shardings=(state_shardings, replicated, batch_sharding),
        out_shardings=(state_shardings, replicated, replicated),
        donate_argnums=(0, 1),
    )
    sharded_eval_step = jax.jit(
        eval_step,
        in_shardings=(state_shardings, replicated, batch_sharding),
        out_shardings=(replicated, replicated),
        donate_argnums=(1,),
    )

    def save_checkpoint(train_state, milestone=False):
        step = int(jax.device_get(train_state.step))
        metadata = dict(
            step=step,
            variant=variant,
            flags=variant,
            llama_config=llama_config.to_dict(),
        )
        checkpointer.save_all(
            train_state,
            gather_fns,
            metadata=metadata,
            dataset=dataset.get_state_dict(),
            milestone=milestone,
        )

    with mesh:
        train_state, restored_params = None, None
        if load_checkpoint != "":
            train_state, restored_params = checkpointer.load_trainstate_checkpoint(
                load_checkpoint, train_state_shapes, shard_fns
            )
        if train_state is None and restored_params is None:
            train_state = sharded_init_fn(next_rng())
        elif train_state is None and restored_params is not None:
            # the checkpointer returns a FrozenDict; the TrainState tree
            # (and so state_shardings.params) uses plain dicts — unfreeze
            # so the pjit in_shardings prefix matches the argument pytree
            train_state = sharded_create_trainstate_from_params(
                flax.core.unfreeze(restored_params)
            )
            del restored_params

        start_step = int(jax.device_get(train_state.step))
        if FLAGS.save_model_freq > 0:
            save_checkpoint(train_state)

        sharded_rng = next_rng()
        step_counter = trange(
            start_step, FLAGS.total_steps, ncols=0,
            disable=jax.process_index() > 0,
        )
        profiling = False
        for step, (batch, dataset_metrics) in zip(step_counter, dataset):
            # first-class trace capture (the reference delegates all perf
            # introspection to LIBTPU flags; we expose jax.profiler)
            if FLAGS.profile_steps > 0 and step == FLAGS.profile_start_step:
                jax.profiler.start_trace(
                    FLAGS.profile_dir or os.path.join(output_dir, "xprof")
                )
                profiling = True
            train_state, sharded_rng, metrics = sharded_train_step(
                train_state, sharded_rng, batch
            )
            if profiling and step >= FLAGS.profile_start_step + FLAGS.profile_steps - 1:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profiling = False
            if FLAGS.log_freq > 0 and (step + 1) % FLAGS.log_freq == 0:
                if FLAGS.eval_steps > 0:
                    eval_metric_list = []
                    for _ in range(FLAGS.eval_steps):
                        eval_batch, _ = next(eval_iterator)
                        sharded_rng, eval_metrics = sharded_eval_step(
                            train_state, sharded_rng, eval_batch
                        )
                        eval_metric_list.append(eval_metrics)
                    metrics.update(average_metrics(eval_metric_list))
                log_metrics = {"step": step + 1}
                log_metrics.update(metrics)
                log_metrics.update(dataset_metrics)
                log_metrics = jax.device_get(log_metrics)
                logger.log(log_metrics)
                if jax.process_index() == 0:
                    tqdm.write(pprint.pformat(
                        {k: v for k, v in log_metrics.items()
                         if not k.startswith("dataset_")}
                    ))
            if FLAGS.save_milestone_freq > 0 and (step + 1) % FLAGS.save_milestone_freq == 0:
                save_checkpoint(train_state, milestone=True)
            elif FLAGS.save_model_freq > 0 and (step + 1) % FLAGS.save_model_freq == 0:
                save_checkpoint(train_state)

        if FLAGS.save_model_freq > 0:
            save_checkpoint(train_state, milestone=True)


def run():
    app.run(main)


if __name__ == "__main__":
    run()
