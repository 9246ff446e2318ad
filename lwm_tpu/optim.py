"""Optimizer factory (replaces tux.OptimizerFactory, SURVEY.md §2.8).

Config surface matches the reference launch scripts
(run_train_text.sh:29-35): ``type='adamw'``, ``accumulate_gradient_steps``,
``adamw_optimizer.{weight_decay, lr, end_lr, lr_warmup_steps, lr_decay_steps,
b1, b2, clip_gradient, bf16_momentum}``; plus frozen-param masking used for
vision finetuning (freeze base, train vte/vision_head only).
"""

from __future__ import annotations

import jax.numpy as jnp
import ml_collections
import optax


class OptimizerFactory:
    @staticmethod
    def get_default_config(updates=None):
        config = ml_collections.ConfigDict()
        config.accumulate_gradient_steps = 1
        config.type = "adamw"
        config.palm_optimizer = PalmOptimizerFactory.get_default_config()
        config.adamw_optimizer = AdamWOptimizerFactory.get_default_config()
        if updates is not None:
            config.update(ml_collections.ConfigDict(updates).copy_and_resolve_references())
        return config

    @classmethod
    def get_optimizer(cls, config, weight_decay_mask=None, frozen_param_mask=None):
        config = cls.get_default_config(config)
        if config.type == "adamw":
            optimizer, optimizer_info = AdamWOptimizerFactory.get_optimizer(
                config.adamw_optimizer, weight_decay_mask
            )
        elif config.type == "palm":
            optimizer, optimizer_info = PalmOptimizerFactory.get_optimizer(
                config.palm_optimizer, weight_decay_mask
            )
        else:
            raise ValueError(f"unknown optimizer type: {config.type}")

        if config.accumulate_gradient_steps > 1:
            optimizer = optax.MultiSteps(optimizer, config.accumulate_gradient_steps)
            optimizer_info["accumulate_gradient_steps"] = config.accumulate_gradient_steps

        if frozen_param_mask is not None:
            # zero out updates of frozen params (freeze_llama_config behavior)
            optimizer = optax.multi_transform(
                {True: optax.set_to_zero(), False: optimizer},
                frozen_param_mask,
            )
        return optimizer, optimizer_info


class AdamWOptimizerFactory:
    @staticmethod
    def get_default_config(updates=None):
        config = ml_collections.ConfigDict()
        config.init_lr = 0.0
        config.end_lr = 0.001
        config.lr = 0.01
        config.lr_warmup_steps = 2000
        config.lr_decay_steps = 500000
        config.b1 = 0.9
        config.b2 = 0.95
        config.clip_gradient = 1.0
        config.weight_decay = 1e-4
        config.bf16_momentum = False
        config.multiply_by_parameter_scale = False
        if updates is not None:
            config.update(ml_collections.ConfigDict(updates).copy_and_resolve_references())
        return config

    @classmethod
    def get_optimizer(cls, config, weight_decay_mask=None):
        config = cls.get_default_config(config)
        learning_rate_schedule = optax.warmup_cosine_decay_schedule(
            init_value=config.init_lr,
            peak_value=config.lr,
            warmup_steps=config.lr_warmup_steps,
            decay_steps=config.lr_decay_steps,
            end_value=config.end_lr,
        )
        optimizer_info = dict(learning_rate_schedule=learning_rate_schedule)
        optimizer = optax.chain(
            optax.clip_by_global_norm(config.clip_gradient),
            optax.adamw(
                learning_rate=learning_rate_schedule,
                weight_decay=config.weight_decay,
                b1=config.b1,
                b2=config.b2,
                mask=weight_decay_mask,
                mu_dtype=jnp.bfloat16 if config.bf16_momentum else jnp.float32,
            ),
        )
        return optimizer, optimizer_info


class PalmOptimizerFactory:
    """PaLM-style optimizer: adafactor-like lr ~ 1/sqrt(step) with
    parameter-scale multiply — kept for config parity with tux."""

    @staticmethod
    def get_default_config(updates=None):
        config = ml_collections.ConfigDict()
        config.lr = 0.01
        config.lr_warmup_steps = 10000
        config.b1 = 0.9
        config.b2 = 0.99
        config.clip_gradient = 1.0
        config.weight_decay = 1e-4
        config.bf16_momentum = False
        if updates is not None:
            config.update(ml_collections.ConfigDict(updates).copy_and_resolve_references())
        return config

    @classmethod
    def get_optimizer(cls, config, weight_decay_mask=None):
        config = cls.get_default_config(config)

        def learning_rate_schedule(step):
            multiplier = config.lr / 0.01
            return multiplier / jnp.sqrt(jnp.maximum(step, config.lr_warmup_steps))

        def weight_decay_schedule(step):
            multiplier = config.weight_decay / 1e-4
            return -multiplier * jnp.square(learning_rate_schedule(step))

        optimizer_info = dict(
            learning_rate_schedule=learning_rate_schedule,
            weight_decay_schedule=weight_decay_schedule,
        )
        optimizer = optax.chain(
            optax.clip_by_global_norm(config.clip_gradient),
            optax.adafactor(
                learning_rate=learning_rate_schedule,
                multiply_by_parameter_scale=True,
                momentum=config.b1,
                decay_rate=config.b2,
                factored=False,
                clipping_threshold=None,
                dtype_momentum=jnp.bfloat16 if config.bf16_momentum else jnp.float32,
            ),
            optax_add_scheduled_weight_decay(
                lambda step: (weight_decay_schedule(step), weight_decay_mask)
            ),
        )
        return optimizer, optimizer_info


def optax_add_scheduled_weight_decay(schedule_fn):
    """optax transform adding schedule(step)*param to updates, with mask."""
    import jax

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("params required for weight decay")
        weight_decay, mask = schedule_fn(state.count)
        if callable(mask):
            mask = mask(params)

        def leaf(u, p, m=True):
            return u + weight_decay * p if m else u

        if mask is not None:
            updates = jax.tree_util.tree_map(leaf, updates, params, mask)
        else:
            updates = jax.tree_util.tree_map(leaf, updates, params)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)
