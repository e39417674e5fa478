"""SDXL VAE (AutoencoderKL-equivalent) decoder + encoder, flax.linen, NHWC.

The reference decodes keyframe latents through diffusers' VAE with a
force_upcast-to-fp32 rule (reference diffusers_holder.py:114-143). Here the
decoder is a pure function; the fp32-upcast rule is honored by
instantiating with dtype=float32 regardless of the UNet compute dtype
(runtime/holder.py), matching `vae.config.force_upcast`.

Architecture per HF stabilityai/stable-diffusion-xl-base-1.0 vae/config.json:
block_out_channels (128,256,512,512), layers_per_block 2, GN eps 1e-6,
scaling_factor 0.13025.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from latentblending_tpu.models.configs import VAEConfig
from latentblending_tpu.models.layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    Upsample2D,
    VAEAttention,
    conv1x1,
    conv3x3,
)

Dtype = Any

_VAE_EPS = 1e-6


class VAEDecoder(nn.Module):
    cfg: VAEConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.cfg
        chans = list(reversed(cfg.block_out_channels))  # [512, 512, 256, 128]
        x = conv3x3(chans[0], self.dtype, self.param_dtype, "conv_in")(z.astype(self.dtype))

        # mid
        x = ResnetBlock2D(
            chans[0], use_time_emb=False, norm_num_groups=cfg.norm_num_groups, norm_eps=_VAE_EPS,
            dtype=self.dtype, param_dtype=self.param_dtype, name="mid_block_resnets_0",
        )(x)
        x = VAEAttention(
            chans[0], norm_num_groups=cfg.norm_num_groups, dtype=self.dtype, param_dtype=self.param_dtype,
            name="mid_block_attentions_0",
        )(x)
        x = ResnetBlock2D(
            chans[0], use_time_emb=False, norm_num_groups=cfg.norm_num_groups, norm_eps=_VAE_EPS,
            dtype=self.dtype, param_dtype=self.param_dtype, name="mid_block_resnets_1",
        )(x)

        # up
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(
                    ch, use_time_emb=False, norm_num_groups=cfg.norm_num_groups, norm_eps=_VAE_EPS,
                    dtype=self.dtype, param_dtype=self.param_dtype, name=f"up_blocks_{i}_resnets_{j}",
                )(x)
            if i < len(chans) - 1:
                x = Upsample2D(ch, dtype=self.dtype, param_dtype=self.param_dtype, name=f"up_blocks_{i}_upsamplers_0")(x)

        x = GroupNorm(cfg.norm_num_groups, eps=_VAE_EPS, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = conv3x3(cfg.out_channels, self.dtype, self.param_dtype, "conv_out")(x)
        return x


class VAEEncoder(nn.Module):
    cfg: VAEConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        chans = list(cfg.block_out_channels)
        x = conv3x3(chans[0], self.dtype, self.param_dtype, "conv_in")(x.astype(self.dtype))
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(
                    ch, use_time_emb=False, norm_num_groups=cfg.norm_num_groups, norm_eps=_VAE_EPS,
                    dtype=self.dtype, param_dtype=self.param_dtype, name=f"down_blocks_{i}_resnets_{j}",
                )(x)
            if i < len(chans) - 1:
                x = Downsample2D(ch, dtype=self.dtype, param_dtype=self.param_dtype, name=f"down_blocks_{i}_downsamplers_0")(x)

        x = ResnetBlock2D(
            chans[-1], use_time_emb=False, norm_num_groups=cfg.norm_num_groups, norm_eps=_VAE_EPS,
            dtype=self.dtype, param_dtype=self.param_dtype, name="mid_block_resnets_0",
        )(x)
        x = VAEAttention(
            chans[-1], norm_num_groups=cfg.norm_num_groups, dtype=self.dtype, param_dtype=self.param_dtype,
            name="mid_block_attentions_0",
        )(x)
        x = ResnetBlock2D(
            chans[-1], use_time_emb=False, norm_num_groups=cfg.norm_num_groups, norm_eps=_VAE_EPS,
            dtype=self.dtype, param_dtype=self.param_dtype, name="mid_block_resnets_1",
        )(x)
        x = GroupNorm(cfg.norm_num_groups, eps=_VAE_EPS, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = conv3x3(2 * cfg.latent_channels, self.dtype, self.param_dtype, "conv_out")(x)
        return x


class VAE(nn.Module):
    """Full AutoencoderKL: decode() is the hot path (keyframe rendering)."""

    cfg: VAEConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.decoder = VAEDecoder(self.cfg, self.dtype, self.param_dtype)
        self.encoder = VAEEncoder(self.cfg, self.dtype, self.param_dtype)
        self.post_quant_conv = conv1x1(self.cfg.latent_channels, self.dtype, self.param_dtype, "post_quant_conv")
        self.quant_conv = conv1x1(2 * self.cfg.latent_channels, self.dtype, self.param_dtype, "quant_conv")

    def decode(self, latents: jax.Array) -> jax.Array:
        """latents [B,h,w,4] (already divided by scaling_factor) → image in [-1,1]."""
        z = self.post_quant_conv(latents.astype(self.dtype))
        return self.decoder(z)

    def encode(self, image: jax.Array) -> tuple[jax.Array, jax.Array]:
        """image [B,H,W,3] in [-1,1] → (mean, logvar), each [B,h,w,4]."""
        h = self.encoder(image)
        moments = self.quant_conv(h)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def __call__(self, latents: jax.Array) -> jax.Array:
        return self.decode(latents)

    def full(self, latents: jax.Array, image: jax.Array):
        """Traces both decode and encode — use as the init method so the
        encoder's params are created: vae.init(rng, z, img, method=VAE.full)."""
        return self.decode(latents), self.encode(image)
