"""VQGAN image/video tokenizer (inference-only).

Encodes 256×256 RGB frames to 16×16 grids of codebook indices (8192 codes,
embed dim 64) and decodes them back; video folds time into the batch dim.
The module graph matches the released LWM VQGAN checkpoint layout
(reference lwm/vqgan.py: conv encoder/decoder with channel_mult
(1,2,2,4,6), GroupNorm+SiLU, no-attention mid block, nearest-codebook
quantizer), so its pickle params load directly. Flax auto-names
(Conv_0, GroupNorm_0, ...) therefore the submodule creation ORDER inside
each @nn.compact body is load-bearing — do not reorder.
"""

from __future__ import annotations

import pickle
from functools import cached_property, partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from ml_collections import ConfigDict
from transformers.configuration_utils import PretrainedConfig

from lwm_tpu.utils.flags import function_args_to_config
from lwm_tpu.utils.io import open_file


class VQGAN:
    """User-facing wrapper: loads pickle params, jit (single device) or
    pmap-replicated (multi device) encode/decode."""

    def __init__(self, vqgan_checkpoint, replicate=False, config_updates=None):
        """vqgan_checkpoint: pickle of the flax param tree (the released
        LWM VQGAN artifact layout — reference vqgan.py:14-25 loads the
        same pickle via tux.open_file). config_updates: optional dict for
        non-released sizes (debug-scale tests, custom tokenizers); the
        default config is the released 256x256/8192-code architecture,
        whose exact param-tree layout is locked by
        tests/fixtures/vqgan_released_tree.json."""
        assert vqgan_checkpoint != ""
        self.replicate = replicate
        self.config = VQGANConfig.get_default_config(config_updates)
        with open_file(vqgan_checkpoint, "rb") as f:
            self.params = pickle.load(f)
        if replicate:
            from flax import jax_utils

            self.params = jax_utils.replicate(self.params)
        self.model = VQGANModel(self.config)

    def _wrap(self, fn):
        if self.replicate:
            return jax.pmap(fn, devices=jax.local_devices())
        return jax.jit(fn)

    @cached_property
    def _encode(self):
        def fn(pixel_values, params):
            return self.model.apply(
                {"params": params}, pixel_values, method=self.model.encode
            )

        return partial(self._wrap(fn), params=self.params)

    @cached_property
    def _decode(self):
        def fn(encoding, params):
            return self.model.apply(
                {"params": params}, encoding, method=self.model.decode
            )

        return partial(self._wrap(fn), params=self.params)

    def encode(self, pixel_values):
        """pixel_values [b, 256, 256, 3] or [b, t, 256, 256, 3] in [-1, 1]
        → (quantized [.., 16, 16, 64], indices [.., 16, 16])."""
        return self._encode(pixel_values)

    def decode(self, encoding):
        """codebook indices [.., 16, 16] → pixels [.., 256, 256, 3]."""
        return self._decode(encoding)


class VQGANConfig(PretrainedConfig):
    model_type = "lwm_vqgan"

    def __init__(
        self,
        resolution=256,
        num_channels=3,
        hidden_channels=128,
        channel_mult=(1, 2, 2, 4, 6),
        num_res_blocks=2,
        attn_resolutions=(),
        no_attn_mid_block=True,
        z_channels=64,
        num_embeddings=8192,
        quantized_embed_dim=64,
        dropout=0.0,
        resample_with_conv=True,
        commitment_cost=0.25,
        **kwargs,
    ):
        self.resolution = resolution
        self.num_channels = num_channels
        self.hidden_channels = hidden_channels
        self.channel_mult = tuple(channel_mult)
        self.num_res_blocks = num_res_blocks
        self.attn_resolutions = tuple(attn_resolutions)
        self.no_attn_mid_block = no_attn_mid_block
        self.z_channels = z_channels
        self.num_embeddings = num_embeddings
        self.quantized_embed_dim = quantized_embed_dim
        self.dropout = dropout
        self.resample_with_conv = resample_with_conv
        self.commitment_cost = commitment_cost
        super().__init__(**kwargs)

    @property
    def num_resolutions(self):
        return len(self.channel_mult)

    @classmethod
    def get_default_config(cls, updates=None):
        config = function_args_to_config(cls.__init__)
        if updates is not None:
            config.update(ConfigDict(updates).copy_and_resolve_references())
        config.num_resolutions = len(config.channel_mult)
        return config


class VQGANModel(nn.Module):
    config: ConfigDict

    def setup(self):
        self.encoder = Encoder(self.config)
        self.decoder = Decoder(self.config)
        self.quantize = VectorQuantizer(
            self.config.num_embeddings, self.config.quantized_embed_dim
        )
        self.quant_conv = nn.Conv(self.config.quantized_embed_dim, [1, 1])
        self.post_quant_conv = nn.Conv(self.config.z_channels, [1, 1])

    def _fold_time(self, x):
        if x.ndim == 5:  # [b, t, h, w, c] video → fold t into batch
            return x.reshape(-1, *x.shape[2:]), x.shape[1]
        return x, None

    def encode(self, pixel_values):
        pixel_values, t = self._fold_time(pixel_values)
        h = self.encoder(pixel_values)
        h = self.quant_conv(h)
        quantized, indices = self.quantize(h)
        if t is not None:
            quantized = quantized.reshape(-1, t, *quantized.shape[1:])
            indices = indices.reshape(-1, t, *indices.shape[1:])
        return quantized, indices

    def decode(self, encoding, is_codebook_indices=True):
        if is_codebook_indices:
            encoding = self.quantize(None, encoding)
        encoding, t = self._fold_time(encoding)
        h = self.post_quant_conv(encoding)
        recon = self.decoder(h)
        if t is not None:
            recon = recon.reshape(-1, t, *recon.shape[1:])
        return jnp.clip(recon, -1, 1)

    def train_forward(self, pixel_values):
        """Training forward (beyond-reference — the reference ships the
        tokenizer inference-only, vqgan.py:105-146): returns
        (recon_preclip, z, z_q_raw, indices) for the VQ-VAE objective
        recon + ||sg(z) − e||² + β·||z − sg(e)||² (apps/train_vqgan.py).
        recon is pre-clip so saturation doesn't kill gradients."""
        pixel_values, _ = self._fold_time(pixel_values)
        z = self.quant_conv(self.encoder(pixel_values))
        z_q, indices, z_q_raw = self.quantize(z, return_raw=True)
        recon = self.decoder(self.post_quant_conv(z_q))
        return recon, z, z_q_raw, indices

    def __call__(self, pixel_values):
        return self.decode(self.encode(pixel_values)[1])


class Encoder(nn.Module):
    config: ConfigDict

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        assert pixel_values.shape[1] == pixel_values.shape[2] == cfg.resolution, (
            pixel_values.shape
        )
        h = nn.Conv(cfg.hidden_channels, [3, 3])(pixel_values)
        for i_level in range(cfg.num_resolutions):
            h = DownsamplingBlock(cfg, i_level)(h)
        h = MidBlock(cfg, cfg.no_attn_mid_block, cfg.dropout)(h)
        h = nn.GroupNorm()(h)
        h = nn.silu(h)
        return nn.Conv(cfg.z_channels, [3, 3])(h)


class Decoder(nn.Module):
    config: ConfigDict

    @nn.compact
    def __call__(self, h):
        cfg = self.config
        h = nn.Conv(
            cfg.hidden_channels * cfg.channel_mult[cfg.num_resolutions - 1], [3, 3]
        )(h)
        h = MidBlock(cfg, cfg.no_attn_mid_block, cfg.dropout)(h)
        for i_level in reversed(range(cfg.num_resolutions)):
            h = UpsamplingBlock(cfg, i_level)(h)
        h = nn.GroupNorm()(h)
        h = nn.silu(h)
        return nn.Conv(cfg.num_channels, [3, 3])(h)


class VectorQuantizer(nn.Module):
    n_e: int
    e_dim: int

    @nn.compact
    def __call__(self, z, encoding_indices=None, return_raw=False):
        embeddings = self.param(
            "embeddings",
            lambda rng, shape, dtype: jax.random.uniform(
                rng, shape, dtype, minval=-1.0 / self.n_e, maxval=1.0 / self.n_e
            ),
            [self.n_e, self.e_dim],
            jnp.float32,
        )
        if encoding_indices is not None:
            return embeddings[(encoding_indices,)]

        flat = z.reshape(-1, z.shape[-1])
        # ||z - e||² = ||z||² + ||e||² − 2⟨z, e⟩; argmin over the codebook
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(embeddings**2, axis=1)[None, :]
            - 2.0 * jnp.einsum("bd,nd->bn", flat, embeddings)
        )
        indices = jnp.argmin(d, axis=1)
        z_q_raw = embeddings[(indices,)].reshape(z.shape)
        z_q = z + jax.lax.stop_gradient(z_q_raw - z)  # straight-through
        indices = indices.reshape(z.shape[:-1])
        if return_raw:
            # training needs the raw lookup too: the STE output hides the
            # embedding inside stop_gradient, so the codebook loss
            # ||sg(z) − e||² must be computed on z_q_raw for the
            # embeddings to receive gradients (apps/train_vqgan.py)
            return z_q, indices, z_q_raw
        return z_q, indices


class ResnetBlock(nn.Module):
    out_channels: Optional[int] = None
    use_conv_shortcut: bool = False
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, h):
        out_channels = self.out_channels or h.shape[-1]
        residual = h
        h = nn.GroupNorm()(h)
        h = nn.silu(h)
        h = nn.Conv(out_channels, [3, 3])(h)
        h = nn.GroupNorm()(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout_prob, deterministic=True)(h)
        h = nn.Conv(out_channels, [3, 3])(h)
        if out_channels != residual.shape[-1]:
            kernel = [3, 3] if self.use_conv_shortcut else [1, 1]
            residual = nn.Conv(out_channels, kernel)(residual)
        return h + residual


class AttnBlock(nn.Module):
    @nn.compact
    def __call__(self, h):
        residual = h
        h = nn.GroupNorm()(h)
        q = nn.Conv(h.shape[-1], [1, 1])(h)
        k = nn.Conv(h.shape[-1], [1, 1])(h)
        v = nn.Conv(h.shape[-1], [1, 1])(h)
        q, k, v = (x.reshape(x.shape[0], -1, x.shape[-1]) for x in (q, k, v))
        w = jnp.einsum("bqd,bkd->bqk", q, k) * (h.shape[-1] ** -0.5)
        w = jax.nn.softmax(w, axis=-1)
        out = jnp.einsum("bqk,bkd->bqd", w, v).reshape(residual.shape)
        out = nn.Conv(out.shape[-1], [1, 1])(out)
        return out + residual


class Downsample(nn.Module):
    with_conv: bool

    @nn.compact
    def __call__(self, h):
        if self.with_conv:
            h = jnp.pad(h, [(0, 0), (0, 1), (0, 1), (0, 0)])
            h = nn.Conv(h.shape[-1], [3, 3], strides=[2, 2], padding="VALID")(h)
        else:
            h = nn.avg_pool(h, [2, 2], [2, 2])
        return h


class Upsample(nn.Module):
    with_conv: bool

    @nn.compact
    def __call__(self, h):
        b, height, width, c = h.shape
        h = jax.image.resize(h, (b, height * 2, width * 2, c), method="nearest")
        if self.with_conv:
            h = nn.Conv(h.shape[-1], [3, 3])(h)
        return h


class DownsamplingBlock(nn.Module):
    config: ConfigDict
    block_idx: int

    @nn.compact
    def __call__(self, h):
        cfg = self.config
        out = cfg.hidden_channels * cfg.channel_mult[self.block_idx]
        for _ in range(cfg.num_res_blocks):
            h = ResnetBlock(out, dropout_prob=cfg.dropout)(h)
            if h.shape[1] in cfg.attn_resolutions:
                h = AttnBlock()(h)
        if self.block_idx != cfg.num_resolutions - 1:
            h = Downsample(cfg.resample_with_conv)(h)
        return h


class UpsamplingBlock(nn.Module):
    config: ConfigDict
    block_idx: int

    @nn.compact
    def __call__(self, h):
        cfg = self.config
        out = cfg.hidden_channels * cfg.channel_mult[self.block_idx]
        for _ in range(cfg.num_res_blocks + 1):
            h = ResnetBlock(out, dropout_prob=cfg.dropout)(h)
            if h.shape[1] in cfg.attn_resolutions:
                h = AttnBlock()(h)
        if self.block_idx != 0:
            h = Upsample(cfg.resample_with_conv)(h)
        return h


class MidBlock(nn.Module):
    config: ConfigDict
    no_attn: bool
    dropout: float

    @nn.compact
    def __call__(self, h):
        h = ResnetBlock(dropout_prob=self.dropout)(h)
        if not self.no_attn:
            h = AttnBlock()(h)
        return ResnetBlock(dropout_prob=self.dropout)(h)
