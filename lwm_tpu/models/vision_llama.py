"""VideoLLaMA: the multimodal LWM — text LLaMA plus a vision-token
embedding (`vte`), a dual `vision_head`/`lm_head`, vision-mask embedding
mixing, and a classifier-free-guidance autoregressive sampler.

Behavior contracts (SURVEY.md §2 items 7-8; reference lwm/vision_llama.py):
- vision vocab 8448 = 8192 VQ codes + 256 specials, EOF=8192, EOV=8193
  (vision_llama.py:30-32)
- embeddings mixed by `vision_masks`: text tokens through wte, vision
  tokens through vte (vision_llama.py:298-311)
- `sample_mode` ∈ {'all','text','vision'} selects which logits the
  module returns (vision_llama.py:423-439); decode-time single tokens
  embed through the head matching sample_mode
- CFG sampling: cond+uncond run as one doubled batch; mixed as
  uncond + cfg·(cond − uncond); EOF (8192) forced every 257th generated
  token to close each 256-token frame (vision_llama.py:539-553)
- partition rules add vte/vision_head entries (vision_llama.py:36-104)
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple, Union

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.core.frozen_dict import FrozenDict, freeze, unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict
from jax import lax
from jax.sharding import PartitionSpec as PS
from transformers import GenerationConfig
from transformers.generation.flax_utils import (
    FlaxLogitsProcessorList,
    FlaxSampleOutput,
)
from transformers.modeling_flax_outputs import FlaxBaseModelOutput, FlaxCausalLMOutput
from transformers.modeling_flax_utils import FlaxPreTrainedModel

from lwm_tpu.models.llama import (
    LLAMA_STANDARD_CONFIGS,
    FlaxLLaMABlockCollection,
    FlaxLLaMAPreTrainedModel,
    LLaMAConfig,
    RMSNorm,
    _dense_cls,
    embed_lookup,
)

VIDEO_LLAMA_STANDARD_CONFIGS = LLAMA_STANDARD_CONFIGS


@flax.struct.dataclass
class VideoLLaMADualOutput:
    """Output for sample_mode='all' (training): logits is the pair
    (vision_logits, lm_logits). transformers' ModelOutput cannot hold a
    tuple in its first field, hence this dedicated container."""

    logits: Tuple
    hidden_states: Optional[Tuple] = None
    attentions: Optional[Tuple] = None


class VideoLLaMAConfig(LLaMAConfig):
    model_type = "lwm_video_llama"

    def __init__(
        self,
        vision_vocab_size=8448,
        tie_vision_embeddings=False,
        sample_mode="all",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.vision_vocab_size = vision_vocab_size  # 8192 codes + 256 specials
        self.tie_vision_embeddings = tie_vision_embeddings
        self.sample_mode = sample_mode

    @staticmethod
    def get_partition_rules(scan_layers=False, scan_axis=0):
        """Text rules plus vte/vision_head (reference vision_llama.py:36-104)."""
        base = LLaMAConfig.get_partition_rules(scan_layers, scan_axis)
        extra = (
            ("transformer/vte/embedding", PS("tp", ("fsdp", "sp"))),
            ("vision_head/kernel", PS(("fsdp", "sp"), "tp")),
        )
        # insert before the catch-all '.*'
        return base[:-1] + extra + base[-1:]

    @classmethod
    def load_config(cls, path):
        if path in VIDEO_LLAMA_STANDARD_CONFIGS:
            return cls.from_dict(VIDEO_LLAMA_STANDARD_CONFIGS[path])
        return super().load_config(path)


class FlaxVideoLLaMAModule(nn.Module):
    config: VideoLLaMAConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    precision: Optional[Union[jax.lax.Precision, str]] = None

    def setup(self):
        embed = partial(
            nn.Embed,
            features=self.config.hidden_size,
            embedding_init=jax.nn.initializers.normal(
                stddev=self.config.initializer_range
            ),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.vte = embed(self.config.vision_vocab_size)
        self.wte = embed(self.config.vocab_size)
        self.dropout = nn.Dropout(rate=self.config.embd_pdrop)
        self.h = FlaxLLaMABlockCollection(
            self.config, dtype=self.dtype, param_dtype=self.param_dtype,
            precision=self.precision,
        )
        self.ln_f = RMSNorm(
            self.config.hidden_size, eps=self.config.rms_norm_eps,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def __call__(
        self,
        input_ids,
        vision_masks,
        attention_mask,
        segment_ids,
        position_ids,
        deterministic=True,
        init_cache: bool = False,
        output_attentions: bool = False,
        output_hidden_states: bool = False,
        return_dict: bool = True,
    ):
        input_ids = input_ids.astype("i4")
        if input_ids.shape[1] == 1:
            # decode step: embedding picked by the generation modality
            if self.config.sample_mode == "text":
                input_embeds = embed_lookup(self.wte, input_ids)
            elif self.config.sample_mode == "vision":
                input_embeds = embed_lookup(self.vte, input_ids)
            else:
                raise ValueError(
                    f"single-token decode requires sample_mode text|vision, "
                    f"got {self.config.sample_mode}"
                )
        else:
            text_embeds = embed_lookup(self.wte, jnp.where(vision_masks, 0, input_ids))
            vision_embeds = embed_lookup(self.vte, jnp.where(vision_masks, input_ids, 0))
            vm = vision_masks[..., None].astype("f4")
            input_embeds = text_embeds * (1 - vm) + vision_embeds * vm

        hidden_states = self.dropout(input_embeds, deterministic=deterministic)
        hidden_states, all_hidden_states, all_attentions = self.h(
            hidden_states,
            attention_mask,
            segment_ids,
            position_ids=position_ids,
            deterministic=deterministic,
            init_cache=init_cache,
            output_attentions=output_attentions,
            output_hidden_states=output_hidden_states,
        )
        hidden_states = self.ln_f(hidden_states)
        if output_hidden_states:
            all_hidden_states += (hidden_states,)
        if not return_dict:
            return tuple(
                v for v in (hidden_states, all_hidden_states, all_attentions)
                if v is not None
            )
        return FlaxBaseModelOutput(
            last_hidden_state=hidden_states,
            hidden_states=all_hidden_states,
            attentions=all_attentions,
        )


class FlaxVideoLLaMAForCausalLMModule(nn.Module):
    config: VideoLLaMAConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    precision: Optional[Union[jax.lax.Precision, str]] = None

    def setup(self):
        self.transformer = FlaxVideoLLaMAModule(self.config, dtype=self.dtype)
        head = partial(
            _dense_cls(self.config),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=jax.nn.initializers.normal(
                stddev=self.config.initializer_range
            ),
            precision=self.precision,
        )
        self.vision_head = head(self.config.vision_vocab_size)
        self.lm_head = head(self.config.vocab_size)

    def __call__(
        self,
        input_ids,
        vision_masks,
        attention_mask=None,
        segment_ids=None,
        position_ids=None,
        deterministic: bool = True,
        init_cache: bool = False,
        output_attentions: bool = False,
        output_hidden_states: bool = False,
        return_dict: bool = True,
    ):
        batch_size, seq_length = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if segment_ids is None:
            segment_ids = jnp.zeros_like(input_ids)
        if position_ids is None:
            if getattr(self.config, "sp_layout", "contiguous") == "striped":
                from lwm_tpu.models.llama import default_position_ids

                position_ids = jnp.broadcast_to(
                    default_position_ids(self.config, seq_length),
                    (batch_size, seq_length),
                )
            else:
                position_ids = jnp.broadcast_to(
                    jnp.clip(jnp.cumsum(attention_mask, axis=-1) - 1, min=0),
                    (batch_size, seq_length),
                )
        outputs = self.transformer(
            input_ids,
            vision_masks,
            attention_mask,
            segment_ids,
            position_ids,
            deterministic=deterministic,
            init_cache=init_cache,
            output_attentions=output_attentions,
            output_hidden_states=output_hidden_states,
            return_dict=True,
        )
        hidden_states = outputs.last_hidden_state

        if self.config.tie_vision_embeddings:
            shared = self.transformer.variables["params"]["vte"]["embedding"].T
            vision_logits = self.vision_head.apply({"params": {"kernel": shared}}, hidden_states)
        else:
            vision_logits = self.vision_head(hidden_states)
        if self.config.tie_word_embeddings:
            shared = self.transformer.variables["params"]["wte"]["embedding"].T
            lm_logits = self.lm_head.apply({"params": {"kernel": shared}}, hidden_states)
        else:
            lm_logits = self.lm_head(hidden_states)

        if self.config.sample_mode == "all":
            logits = (vision_logits, lm_logits)
        elif self.config.sample_mode == "vision":
            logits = vision_logits
        elif self.config.sample_mode == "text":
            logits = lm_logits
        else:
            raise ValueError(f"invalid sample_mode: {self.config.sample_mode}")
        if not return_dict:
            return (logits, outputs.hidden_states, outputs.attentions)
        if self.config.sample_mode == "all":
            return VideoLLaMADualOutput(
                logits=logits,
                hidden_states=outputs.hidden_states,
                attentions=outputs.attentions,
            )
        return FlaxCausalLMOutput(
            logits=logits,
            hidden_states=outputs.hidden_states,
            attentions=outputs.attentions,
        )


class FlaxVideoLLaMAPreTrainedModel(FlaxLLaMAPreTrainedModel):
    config_class = VideoLLaMAConfig
    base_model_prefix = "transformer"
    module_class: nn.Module = None

    def init_weights(self, rng, input_shape, params: FrozenDict = None) -> FrozenDict:
        input_ids = jnp.zeros(input_shape, dtype="i4")
        vision_masks = jnp.zeros(input_shape, dtype=bool)
        attention_mask = jnp.ones_like(input_ids)
        position_ids = jnp.broadcast_to(jnp.arange(input_shape[-1]), input_shape)
        params_rng, dropout_rng = jax.random.split(rng)
        module_init_outputs = self.module.init(
            {"params": params_rng, "dropout": dropout_rng},
            input_ids, vision_masks, attention_mask, None, position_ids,
            return_dict=False,
        )
        random_params = module_init_outputs["params"]
        if params is not None:
            random_params = flatten_dict(unfreeze(random_params))
            params = flatten_dict(unfreeze(params))
            for missing_key in self._missing_keys:
                params[missing_key] = random_params[missing_key]
            self._missing_keys = set()
            return freeze(unflatten_dict(params))
        return random_params

    def init_cache(self, batch_size, max_length):
        # jitted for the same reason as LLaMA's init_cache: eager
        # module.init is a partially-eager program the axon TPU client
        # fails with UNIMPLEMENTED (NOTES.md round-2)
        @jax.jit
        def build():
            input_ids = jnp.ones((batch_size, max_length))
            vision_masks = jnp.zeros((batch_size, max_length), dtype=bool)
            attention_mask = jnp.ones_like(input_ids)
            position_ids = jnp.broadcast_to(
                jnp.arange(max_length)[None], input_ids.shape
            )
            return self.module.init(
                jax.random.PRNGKey(0), input_ids, vision_masks,
                attention_mask, None, position_ids, return_dict=False,
                init_cache=True,
            )["cache"]

        return build()

    def __call__(
        self,
        input_ids,
        vision_masks=None,
        attention_mask=None,
        segment_ids=None,
        position_ids=None,
        params: dict = None,
        past_key_values: dict = None,
        dropout_rng=None,
        train: bool = False,
        output_attentions: Optional[bool] = None,
        output_hidden_states: Optional[bool] = None,
        return_dict: Optional[bool] = None,
    ):
        output_attentions = (
            output_attentions
            if output_attentions is not None
            else self.config.output_attentions
        )
        output_hidden_states = (
            output_hidden_states
            if output_hidden_states is not None
            else self.config.output_hidden_states
        )
        return_dict = (
            return_dict if return_dict is not None else self.config.return_dict
        )
        batch_size, sequence_length = input_ids.shape
        if vision_masks is None:
            vision_masks = jnp.zeros((batch_size, sequence_length), dtype=bool)
        if position_ids is None:
            if past_key_values is not None:
                raise ValueError(
                    "position_ids required when passing past_key_values"
                )
            position_ids = jnp.broadcast_to(
                jnp.arange(sequence_length)[None, :],
                (batch_size, sequence_length),
            )
        if attention_mask is None:
            attention_mask = jnp.ones((batch_size, sequence_length))

        rngs = {}
        if dropout_rng is not None:
            rngs["dropout"] = dropout_rng
        inputs = {"params": params or self.params}
        if past_key_values:
            inputs["cache"] = past_key_values
            mutable = ["cache"]
        else:
            mutable = False

        outputs = self.module.apply(
            inputs,
            jnp.array(input_ids, dtype="i4"),
            vision_masks,
            jnp.array(attention_mask, dtype="i4"),
            segment_ids,
            jnp.array(position_ids, dtype="i4"),
            not train,
            False,
            output_attentions,
            output_hidden_states,
            return_dict,
            rngs=rngs,
            mutable=mutable,
        )
        if past_key_values is not None and return_dict:
            outputs, past_key_values = outputs
            outputs["past_key_values"] = unfreeze(past_key_values["cache"])
            return outputs
        elif past_key_values is not None and not return_dict:
            outputs, past_key_values = outputs
            outputs = outputs[:1] + (unfreeze(past_key_values["cache"]),) + outputs[1:]
        return outputs


class FlaxVideoLLaMAForCausalLM(FlaxVideoLLaMAPreTrainedModel):
    module_class = FlaxVideoLLaMAForCausalLMModule

    def prepare_inputs_for_generation(
        self, input_ids, max_length, attention_mask=None, vision_masks=None
    ):
        from lwm_tpu.models.llama import round_cache_length

        batch_size, seq_length = input_ids.shape
        cache_length = round_cache_length(self.config, max_length)
        past_key_values = self.init_cache(batch_size, cache_length)
        extended_attention_mask = jnp.ones((batch_size, cache_length), dtype="i4")
        if attention_mask is not None:
            position_ids = attention_mask.cumsum(axis=-1) - 1
            extended_attention_mask = lax.dynamic_update_slice(
                extended_attention_mask, attention_mask.astype("i4"), (0, 0)
            )
        else:
            position_ids = jnp.broadcast_to(
                jnp.arange(seq_length, dtype="i4")[None, :],
                (batch_size, seq_length),
            )
        return {
            "past_key_values": past_key_values,
            "attention_mask": extended_attention_mask,
            "position_ids": position_ids,
            "vision_masks": vision_masks,
        }

    def update_inputs_for_generation(self, model_outputs, model_kwargs):
        return {
            "past_key_values": model_outputs.past_key_values,
            "position_ids": model_kwargs["position_ids"][:, -1:] + 1,
            "attention_mask": model_kwargs["attention_mask"],
            "vision_masks": model_kwargs["vision_masks"],
        }

    def _sample_vision(
        self,
        input_ids,
        max_length: Optional[int] = None,
        pad_token_id: Optional[int] = None,
        eos_token_id: Optional[int] = None,
        prng_key: Optional[jnp.ndarray] = None,
        logits_processor: Optional[FlaxLogitsProcessorList] = None,
        logits_warper: Optional[FlaxLogitsProcessorList] = None,
        cfg_scales: jnp.ndarray = 1.0,
        trace: bool = True,
        params: Optional[Dict[str, jnp.ndarray]] = None,
        model_kwargs: Optional[Dict[str, jnp.ndarray]] = None,
    ):
        """CFG decode loop (behavior contract: reference
        vision_llama.py:476-581; structure is this package's own).

        The batch is [cond; uncond] stacked along axis 0. One decode step =
        model forward on the previous token(s) → guidance-mixed logits →
        processor/warper → categorical sample → frame framing (every 257th
        generated token is overwritten with EOF 8192, closing a 256-code
        frame). The sampled token is written into BOTH batch halves so the
        cond and uncond streams stay in lockstep.
        """
        gen_cfg = self.generation_config
        max_length = gen_cfg.max_length if max_length is None else max_length
        pad_token_id = gen_cfg.pad_token_id if pad_token_id is None else pad_token_id
        eos_token_id = gen_cfg.eos_token_id if eos_token_id is None else eos_token_id
        rng = jax.random.PRNGKey(0) if prng_key is None else prng_key

        pair_batch, prompt_len = input_ids.shape  # 2b rows: [cond; uncond]
        eos = None if eos_token_id is None else jnp.asarray(eos_token_id, jnp.int32)

        # output buffer, prompt written at the front, pad elsewhere
        buffer = jnp.full((pair_batch, max_length), jnp.asarray(pad_token_id, jnp.int32))
        buffer = lax.dynamic_update_slice(buffer, input_ids.astype(jnp.int32), (0, 0))

        decode_kwargs = self.prepare_inputs_for_generation(
            input_ids, max_length, **(model_kwargs or {})
        )

        def guided_logits(step_logits, mix):
            """uncond + cfg·(cond − uncond) over the stacked pair batch."""
            cond, uncond = jnp.split(step_logits, 2, axis=0)
            return uncond + mix[:, None] * (cond - uncond)

        # loop state: (absolute write position, output buffer, tokens to
        # feed, per-row finished flags, rng, rolling cache kwargs)
        def decode_step(carry):
            pos, buffer, feed, finished, rng, decode_kwargs = carry
            rng, sample_rng = jax.random.split(rng)

            outputs = self(feed, params=params, **decode_kwargs)
            logits = guided_logits(outputs.logits[:, -1], cfg_scales)
            logits = logits_processor(buffer, logits, pos)
            logits = logits_warper(logits, logits, pos)
            sampled = jax.random.categorical(sample_rng, logits, axis=-1)

            # frame framing: the (257k)-th generated token is EOF
            ordinal = pos - prompt_len + 1  # 1-based generated-token index
            sampled = jnp.where(ordinal % 257 == 0, 8192, sampled)

            token = jnp.tile(sampled, 2)  # both halves advance identically
            if eos is not None:
                finished = finished | (token == eos)
            buffer = lax.dynamic_update_slice(buffer, token[:, None], (0, pos))
            decode_kwargs = self.update_inputs_for_generation(outputs, decode_kwargs)
            return (pos + 1, buffer, token[:, None], finished, rng, decode_kwargs)

        carry = (
            jnp.asarray(prompt_len),
            buffer,
            input_ids,
            jnp.zeros((pair_batch,), bool),
            rng,
            decode_kwargs,
        )
        # prefill: the multi-token prompt goes through one step eagerly
        # (blockwise/ring prefill path), producing the first sampled token
        if prompt_len > 1:
            carry = decode_step(carry)

        def keep_going(carry):
            pos, _, _, finished, _, _ = carry
            return (pos < max_length) & ~jnp.all(finished)

        if trace:
            carry = lax.while_loop(keep_going, decode_step, carry)
        else:  # debug: run the loop in python
            while keep_going(carry):
                carry = decode_step(carry)
        return FlaxSampleOutput(sequences=carry[1])

    def generate_vision(
        self,
        input_ids,
        cfg_scales,
        generation_config: Optional[GenerationConfig] = None,
        prng_key: Optional[jnp.ndarray] = None,
        trace: bool = True,
        params: Optional[Dict[str, jnp.ndarray]] = None,
        logits_processor: Optional[FlaxLogitsProcessorList] = None,
        **kwargs,
    ):
        """Sampling-only generate with classifier-free guidance
        (reference vision_llama.py:583-726)."""
        if generation_config is None:
            generation_config = self.generation_config
        import copy

        generation_config = copy.deepcopy(generation_config)
        model_kwargs = generation_config.update(**kwargs)
        generation_config.validate()

        logits_processor = logits_processor if logits_processor is not None else FlaxLogitsProcessorList()
        prng_key = prng_key if prng_key is not None else jax.random.PRNGKey(0)

        if generation_config.pad_token_id is None and generation_config.eos_token_id is not None:
            eos = generation_config.eos_token_id
            if isinstance(eos, list):
                eos = eos[0]
            generation_config.pad_token_id = eos

        input_ids_seq_length = input_ids.shape[-1]
        if generation_config.max_new_tokens is not None:
            generation_config.max_length = (
                generation_config.max_new_tokens + input_ids_seq_length
            )

        logits_processor = self._get_logits_processor(
            generation_config=generation_config,
            input_ids_seq_length=input_ids_seq_length,
            logits_processor=logits_processor,
        )
        if not (generation_config.do_sample and generation_config.num_beams == 1):
            raise NotImplementedError(
                "generate_vision supports sampling (do_sample=True, num_beams=1)"
            )
        logits_warper = self._get_logits_warper(generation_config=generation_config)
        return self._sample_vision(
            input_ids,
            generation_config.max_length,
            generation_config.pad_token_id,
            generation_config.eos_token_id,
            prng_key,
            logits_warper=logits_warper,
            logits_processor=logits_processor,
            cfg_scales=cfg_scales,
            trace=trace,
            params=params,
            model_kwargs=model_kwargs,
        )
