"""SDXL UNet (UNet2DConditionModel-equivalent), flax.linen, NHWC.

TPU-first re-implementation of the denoiser the reference calls through
diffusers at reference diffusers_holder.py:336-344, including SDXL
micro-conditioning (added pooled text embeds + 6 time ids,
diffusers_holder.py:258-289,:333). Architecture constants per the HF
config of stabilityai/stable-diffusion-xl-base-1.0 / sdxl-turbo
(identical apart from sample_size).

Layout: activations NHWC, conv kernels HWIO, attention [B, L, H, D] —
the shapes XLA tiles best onto the MXU. Parameter tree names mirror HF
checkpoint keys with list indices folded in ("down_blocks_1",
"attentions_0"), making safetensors conversion a rename+transpose
(models/weights.py).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from latentblending_tpu.models.configs import UNetConfig
from latentblending_tpu.models.layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    TimestepEmbedMLP,
    Transformer2D,
    Upsample2D,
    conv3x3,
    timestep_embedding,
)

Dtype = Any


class DownBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    heads: int
    tx_depth: int
    has_attn: bool
    add_downsample: bool
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        residuals = []
        for i in range(self.cfg.layers_per_block):
            x = ResnetBlock2D(
                self.out_channels,
                norm_num_groups=self.cfg.norm_num_groups,
                norm_eps=self.cfg.norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(x, temb)
            if self.has_attn:
                x = Transformer2D(
                    self.heads,
                    64,
                    self.tx_depth,
                    self.cfg.cross_attention_dim,
                    norm_num_groups=self.cfg.norm_num_groups,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"attentions_{i}",
                )(x, context)
            residuals.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, param_dtype=self.param_dtype, name="downsamplers_0")(x)
            residuals.append(x)
        return x, residuals


class UpBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    heads: int
    tx_depth: int
    has_attn: bool
    add_upsample: bool
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context):
        for i in range(self.cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(
                self.out_channels,
                norm_num_groups=self.cfg.norm_num_groups,
                norm_eps=self.cfg.norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(x, temb)
            if self.has_attn:
                x = Transformer2D(
                    self.heads,
                    64,
                    self.tx_depth,
                    self.cfg.cross_attention_dim,
                    norm_num_groups=self.cfg.norm_num_groups,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"attentions_{i}",
                )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, param_dtype=self.param_dtype, name="upsamplers_0")(x)
        return x


class MidBlock(nn.Module):
    cfg: UNetConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        ch = self.cfg.block_out_channels[-1]
        x = ResnetBlock2D(
            ch,
            norm_num_groups=self.cfg.norm_num_groups,
            norm_eps=self.cfg.norm_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="resnets_0",
        )(x, temb)
        x = Transformer2D(
            self.cfg.num_attention_heads[-1],
            64,
            self.cfg.transformer_layers_per_block[-1],
            self.cfg.cross_attention_dim,
            norm_num_groups=self.cfg.norm_num_groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attentions_0",
        )(x, context)
        x = ResnetBlock2D(
            ch,
            norm_num_groups=self.cfg.norm_num_groups,
            norm_eps=self.cfg.norm_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="resnets_1",
        )(x, temb)
        return x


class UNet2DCondition(nn.Module):
    """The SDXL denoiser.

    __call__(sample, timestep, encoder_hidden_states, text_embeds, time_ids):
      sample:   [B, H/8, W/8, 4] latents (already input-scaled)
      timestep: scalar or [B]
      encoder_hidden_states: [B, 77, cross_attention_dim]
      text_embeds: [B, pooled_dim]  (SDXL micro-conditioning)
      time_ids:  [B, 6]
    Returns predicted epsilon, same shape as sample.
    """

    cfg: UNetConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    # head dim is fixed at 64 for SDXL; tiny test configs scale heads instead.
    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        text_embeds: jax.Array,
        time_ids: jax.Array,
    ) -> jax.Array:
        cfg = self.cfg
        b = sample.shape[0]
        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (b,))

        # --- time + added-condition embeddings -----------------------------
        t_emb = timestep_embedding(
            timestep, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        emb = TimestepEmbedMLP(
            cfg.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="time_embedding"
        )(t_emb)

        # SDXL "text_time" addition embedding: pooled text embeds ++ per-id
        # sinusoidal embeddings of the 6 time_ids
        tid = time_ids.reshape(-1)
        tid_emb = timestep_embedding(tid, cfg.addition_time_embed_dim, cfg.flip_sin_to_cos, cfg.freq_shift)
        tid_emb = tid_emb.reshape(b, -1).astype(self.dtype)
        add_embeds = jnp.concatenate([text_embeds.astype(self.dtype), tid_emb], axis=-1)
        aug_emb = TimestepEmbedMLP(
            cfg.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="add_embedding"
        )(add_embeds)
        emb = emb + aug_emb

        context = encoder_hidden_states.astype(self.dtype)
        sample = sample.astype(self.dtype)

        # --- down path ------------------------------------------------------
        x = conv3x3(cfg.block_out_channels[0], self.dtype, self.param_dtype, "conv_in")(sample)
        skips = [x]
        n_levels = len(cfg.block_out_channels)
        for lvl in range(n_levels):
            x, res = DownBlock(
                cfg,
                cfg.block_out_channels[lvl],
                cfg.num_attention_heads[lvl],
                cfg.transformer_layers_per_block[lvl],
                cfg.down_block_has_attn[lvl],
                add_downsample=lvl < n_levels - 1,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"down_blocks_{lvl}",
            )(x, emb, context)
            skips.extend(res)

        # --- mid --------------------------------------------------------------
        x = MidBlock(cfg, dtype=self.dtype, param_dtype=self.param_dtype, name="mid_block")(x, emb, context)

        # --- up path ----------------------------------------------------------
        for i, lvl in enumerate(reversed(range(n_levels))):
            x = UpBlock(
                cfg,
                cfg.block_out_channels[lvl],
                cfg.num_attention_heads[lvl],
                cfg.transformer_layers_per_block[lvl],
                cfg.down_block_has_attn[lvl],
                add_upsample=lvl > 0,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"up_blocks_{i}",
            )(x, skips, emb, context)

        x = GroupNorm(cfg.norm_num_groups, eps=cfg.norm_eps, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = conv3x3(cfg.out_channels, self.dtype, self.param_dtype, "conv_out")(x)
        return x
