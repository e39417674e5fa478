"""Shared flax.linen building blocks for the SDXL stack, NHWC layout.

These re-implement, TPU-first, the layer semantics the reference gets from
diffusers' UNet2DConditionModel/AutoencoderKL internals (invoked at
reference diffusers_holder.py:336-344 and :135):

- All convs are NHWC/HWIO (XLA's preferred TPU layout; torch is NCHW/OIHW —
  weight conversion transposes in models/weights.py).
- GroupNorm statistics accumulate in float32 regardless of compute dtype.
- Attention uses jax.nn.dot_product_attention so XLA lowers to its fused
  TPU path; shapes stay static.
- Submodule names mirror the HF checkpoint key segments ("conv1",
  "time_emb_proj", "attn1", "ff") with list indices folded into the name
  ("resnets_0") so safetensors→pytree conversion is a pure rename+transpose.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal timestep embedding (matches diffusers get_timestep_embedding).

    timesteps: [B] float; returns [B, dim] float32.
    """
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        out = jnp.concatenate([cos, sin], axis=-1)
    else:
        out = jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis with float32 statistics."""

    num_groups: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        spatial = xf.shape[1:-1]
        g = self.num_groups
        xg = xf.reshape(xf.shape[0], -1, g, c // g)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.var(xg, axis=(1, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        xf = xg.reshape(xf.shape[0], *spatial, c)
        return (xf * scale + bias).astype(orig_dtype)


class LayerNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return out.astype(x.dtype)


def dense(features, dtype, param_dtype, name, use_bias=True):
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, param_dtype=param_dtype, name=name)


def conv3x3(features, dtype, param_dtype, name, stride=1):
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


def conv1x1(features, dtype, param_dtype, name):
    return nn.Conv(features, (1, 1), dtype=dtype, param_dtype=param_dtype, name=name)


class TimestepEmbedMLP(nn.Module):
    """TimestepEmbedding: linear_1 → silu → linear_2 (diffusers naming)."""

    embed_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = dense(self.embed_dim, self.dtype, self.param_dtype, "linear_1")(x)
        x = nn.silu(x)
        x = dense(self.embed_dim, self.dtype, self.param_dtype, "linear_2")(x)
        return x


def _use_flash_attention(lq: int, lk: int, mask) -> bool:
    """Pallas flash attention for big self-attention maps on TPU.

    XLA's plain path materializes [B,H,L,L] logits — 13GB at L=4096 with a
    20-wide CFG-folded stem batch (SDXL-base 1024²). The flash kernel keeps
    memory O(L·block). Cross-attention (lk=77) stays on the XLA path."""
    import os

    if os.environ.get("LB_FLASH") == "0":
        return False
    min_len = int(os.environ.get("LB_FLASH_MIN", "1024"))
    return jax.default_backend() == "tpu" and mask is None and lq == lk and lq >= min_len and lq % 512 == 0


def _flash_block_sizes(b: int, heads: int, lq: int, lk: int, dim_head: int = 64):
    """Flash-attention tile sizes. The kernel default (block 512) leaves MXU
    idle time at our shapes (d=64 heads); LB_FLASH_BQ / LB_FLASH_BK override
    for tuning, measured values become the default. Wide heads (the VAE's
    single d=512 head) get smaller tiles — q/k/v blocks scale with d and
    1024-tiles overflow the 16M VMEM scoped limit."""
    import os

    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    default = 1024 if dim_head <= 128 else 512
    bq = int(os.environ.get("LB_FLASH_BQ", "0")) or min(default, lq)
    bk = int(os.environ.get("LB_FLASH_BK", "0")) or min(default, lk)
    bq, bk = min(bq, lq), min(bk, lk)
    return BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )


class Attention(nn.Module):
    """Multi-head attention with separate q/k/v projections.

    context=None → self-attention. Mirrors diffusers Attention with
    use_linear_projection; out proj is named to_out_0.
    """

    query_dim: int
    heads: int
    dim_head: int = 64
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None, mask: Optional[jax.Array] = None) -> jax.Array:
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = dense(inner, self.dtype, self.param_dtype, "to_q", use_bias=False)(x)
        k = dense(inner, self.dtype, self.param_dtype, "to_k", use_bias=False)(ctx)
        v = dense(inner, self.dtype, self.param_dtype, "to_v", use_bias=False)(ctx)
        b, lq = q.shape[0], q.shape[1]
        lk = k.shape[1]
        q = q.reshape(b, lq, self.heads, self.dim_head)
        k = k.reshape(b, lk, self.heads, self.dim_head)
        v = v.reshape(b, lk, self.heads, self.dim_head)
        if _use_flash_attention(lq, lk, mask):
            from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

            out = flash_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                causal=False,
                sm_scale=float(1.0 / (self.dim_head**0.5)),
                block_sizes=_flash_block_sizes(b, self.heads, lq, lk, dim_head=self.dim_head),
            ).transpose(0, 2, 1, 3)
        else:
            bias = None
            if mask is not None:
                bias = mask.astype(q.dtype)
            out = jax.nn.dot_product_attention(q, k, v, bias=bias)
        out = out.reshape(b, lq, inner)
        return dense(self.query_dim, self.dtype, self.param_dtype, "to_out_0")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward: net_0.proj (dim→8·dim), gate, net_2 (4·dim→dim)."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.mult

        class _GEGLU(nn.Module):
            dtype: Dtype
            param_dtype: Dtype

            @nn.compact
            def __call__(self, h):
                h = dense(inner * 2, self.dtype, self.param_dtype, "proj")(h)
                h, gate = jnp.split(h, 2, axis=-1)
                return h * nn.gelu(gate)

        x = _GEGLU(self.dtype, self.param_dtype, name="net_0")(x)
        x = dense(self.dim, self.dtype, self.param_dtype, "net_2")(x)
        return x


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        h = LayerNorm(name="norm1")(x)
        x = x + Attention(
            self.dim, self.heads, self.dim_head, dtype=self.dtype, param_dtype=self.param_dtype, name="attn1"
        )(h)
        h = LayerNorm(name="norm2")(x)
        x = x + Attention(
            self.dim,
            self.heads,
            self.dim_head,
            context_dim=self.context_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn2",
        )(h, context)
        h = LayerNorm(name="norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN → linear proj_in → N blocks → proj_out → +res.

    use_linear_projection=True variant (SDXL)."""

    heads: int
    dim_head: int
    depth: int
    context_dim: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        x = GroupNorm(self.norm_num_groups, eps=1e-6, name="norm")(x)
        x = x.reshape(b, h * w, c)
        x = dense(inner, self.dtype, self.param_dtype, "proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                inner,
                self.heads,
                self.dim_head,
                self.context_dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"transformer_blocks_{i}",
            )(x, context)
        x = dense(c, self.dtype, self.param_dtype, "proj_out")(x)
        return x.reshape(b, h, w, c) + residual


class ResnetBlock2D(nn.Module):
    out_channels: int
    use_time_emb: bool = True
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        in_ch = x.shape[-1]
        h = GroupNorm(self.norm_num_groups, eps=self.norm_eps, name="norm1")(x)
        h = nn.silu(h)
        h = conv3x3(self.out_channels, self.dtype, self.param_dtype, "conv1")(h)
        if self.use_time_emb and temb is not None:
            t = dense(self.out_channels, self.dtype, self.param_dtype, "time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(self.norm_num_groups, eps=self.norm_eps, name="norm2")(h)
        h = nn.silu(h)
        h = conv3x3(self.out_channels, self.dtype, self.param_dtype, "conv2")(h)
        if in_ch != self.out_channels:
            x = conv1x1(self.out_channels, self.dtype, self.param_dtype, "conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return conv3x3(self.out_channels, self.dtype, self.param_dtype, "conv", stride=2)(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return conv3x3(self.out_channels, self.dtype, self.param_dtype, "conv")(x)


class VAEAttention(nn.Module):
    """Single-head attention block used in the VAE mid block (diffusers
    Attention inside UNetMidBlock2D with GN, q/k/v/out named group_norm,
    to_q, to_k, to_v, to_out_0)."""

    channels: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm(self.norm_num_groups, eps=1e-6, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = dense(c, self.dtype, self.param_dtype, "to_q")(y)
        k = dense(c, self.dtype, self.param_dtype, "to_k")(y)
        v = dense(c, self.dtype, self.param_dtype, "to_v")(y)
        L = h * w
        if _use_flash_attention(L, L, None):
            # the decoder's single-head attention runs at LATENT resolution —
            # L = 16384 at 1024² output. The XLA path materializes [B,1,L,L]
            # logits (1 GB/image); flash keeps it O(L·block)
            from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

            out = flash_attention(
                q[:, None], k[:, None], v[:, None],
                causal=False, sm_scale=float(1.0 / (c**0.5)),
                block_sizes=_flash_block_sizes(b, 1, L, L, dim_head=c),
            )[:, 0]
        else:
            out = jax.nn.dot_product_attention(
                q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
            ).reshape(b, L, c)
        out = out.reshape(b, h * w, c)
        out = dense(c, self.dtype, self.param_dtype, "to_out_0")(out)
        return out.reshape(b, h, w, c) + residual
