"""Test-only torch re-implementation of the SDXL UNet semantics (tiny
config) with HF/diffusers checkpoint key names.

Serves as the golden reference for tests/test_unet_parity.py: its
state_dict feeds models/weights.convert_unet_state_dict, so both the JAX
module math AND the full conversion path are verified in one comparison.
Written from the diffusers UNet2DConditionModel semantics (the model the
reference invokes at diffusers_holder.py:336-344); no code copied.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from latentblending_tpu.models.configs import UNetConfig


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    emb = t.float()[:, None] * torch.exp(exponent)[None, :]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)  # flip_sin_to_cos


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, groups, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_dim:
            self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)
        self.has_shortcut = in_ch != out_ch
        self.has_temb = bool(temb_dim)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if self.has_temb and temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        return (self.conv_shortcut(x) if self.has_shortcut else x) + h


class Attention(nn.Module):
    def __init__(self, query_dim, heads, dim_head, context_dim=None):
        super().__init__()
        inner = heads * dim_head
        ctx = context_dim or query_dim
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(ctx, inner, bias=False)
        self.to_v = nn.Linear(ctx, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, lq, _ = x.shape
        lk = ctx.shape[1]
        q = self.to_q(x).view(b, lq, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(ctx).view(b, lk, self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(ctx).view(b, lk, self.heads, self.dim_head).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, lq, self.heads * self.dim_head)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList([GEGLU(dim, inner), nn.Identity(), nn.Linear(inner, dim)])

    def forward(self, x):
        return self.net[2](self.net[1](self.net[0](x)))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, context_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, dim_head, context_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2D(nn.Module):
    def __init__(self, heads, dim_head, depth, channels, context_dim, groups):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Linear(channels, inner)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, heads, dim_head, context_dim) for _ in range(depth)]
        )
        self.proj_out = nn.Linear(inner, channels)

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        y = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.proj_in(y)
        for blk in self.transformer_blocks:
            y = blk(y, context)
        y = self.proj_out(y)
        return y.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


class Downsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class DownBlock(nn.Module):
    def __init__(self, cfg: UNetConfig, in_ch, out_ch, heads, depth, has_attn, add_down):
        super().__init__()
        self.resnets = nn.ModuleList()
        self.attentions = nn.ModuleList() if has_attn else None
        for i in range(cfg.layers_per_block):
            self.resnets.append(
                ResnetBlock(in_ch if i == 0 else out_ch, out_ch, cfg.time_embed_dim, cfg.norm_num_groups)
            )
            if has_attn:
                self.attentions.append(
                    Transformer2D(heads, 64, depth, out_ch, cfg.cross_attention_dim, cfg.norm_num_groups)
                )
        if add_down:
            self.downsamplers = nn.ModuleList([Downsample(out_ch)])
        self.add_down = add_down

    def forward(self, x, temb, ctx):
        res = []
        for i, rn in enumerate(self.resnets):
            x = rn(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x, ctx)
            res.append(x)
        if self.add_down:
            x = self.downsamplers[0](x)
            res.append(x)
        return x, res


class UpBlock(nn.Module):
    def __init__(self, cfg: UNetConfig, prev_ch, out_ch, skip_chs, heads, depth, has_attn, add_up):
        super().__init__()
        self.resnets = nn.ModuleList()
        self.attentions = nn.ModuleList() if has_attn else None
        ch = prev_ch
        for i in range(cfg.layers_per_block + 1):
            self.resnets.append(
                ResnetBlock(ch + skip_chs[i], out_ch, cfg.time_embed_dim, cfg.norm_num_groups)
            )
            ch = out_ch
            if has_attn:
                self.attentions.append(
                    Transformer2D(heads, 64, depth, out_ch, cfg.cross_attention_dim, cfg.norm_num_groups)
                )
        if add_up:
            self.upsamplers = nn.ModuleList([Upsample(out_ch)])
        self.add_up = add_up

    def forward(self, x, skips, temb, ctx):
        for i, rn in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = rn(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x, ctx)
        if self.add_up:
            x = self.upsamplers[0](x)
        return x


class MidBlock(nn.Module):
    def __init__(self, cfg: UNetConfig):
        super().__init__()
        ch = cfg.block_out_channels[-1]
        self.resnets = nn.ModuleList(
            [
                ResnetBlock(ch, ch, cfg.time_embed_dim, cfg.norm_num_groups),
                ResnetBlock(ch, ch, cfg.time_embed_dim, cfg.norm_num_groups),
            ]
        )
        self.attentions = nn.ModuleList(
            [
                Transformer2D(
                    cfg.num_attention_heads[-1], 64, cfg.transformer_layers_per_block[-1],
                    ch, cfg.cross_attention_dim, cfg.norm_num_groups,
                )
            ]
        )

    def forward(self, x, temb, ctx):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, ctx)
        return self.resnets[1](x, temb)


class TorchRefUNet(nn.Module):
    def __init__(self, cfg: UNetConfig, pooled_dim: int):
        super().__init__()
        self.cfg = cfg
        c0 = cfg.block_out_channels[0]
        self.conv_in = nn.Conv2d(cfg.in_channels, c0, 3, padding=1)
        self.time_embedding = TimestepEmbedding(c0, cfg.time_embed_dim)
        self.add_embedding = TimestepEmbedding(pooled_dim + 6 * cfg.addition_time_embed_dim, cfg.time_embed_dim)

        self.down_blocks = nn.ModuleList()
        n = len(cfg.block_out_channels)
        for lvl in range(n):
            in_ch = cfg.block_out_channels[max(lvl - 1, 0)]
            self.down_blocks.append(
                DownBlock(
                    cfg, in_ch, cfg.block_out_channels[lvl], cfg.num_attention_heads[lvl],
                    cfg.transformer_layers_per_block[lvl], cfg.down_block_has_attn[lvl], lvl < n - 1,
                )
            )
        self.mid_block = MidBlock(cfg)

        self.up_blocks = nn.ModuleList()
        # skip channels mirror the down path (conv_in + per-level residuals)
        skip_chs_all = [c0]
        for lvl in range(n):
            skip_chs_all += [cfg.block_out_channels[lvl]] * cfg.layers_per_block
            if lvl < n - 1:
                skip_chs_all.append(cfg.block_out_channels[lvl])
        prev = cfg.block_out_channels[-1]
        for i, lvl in enumerate(reversed(range(n))):
            take = cfg.layers_per_block + 1
            skips = list(reversed(skip_chs_all[-take:]))
            del skip_chs_all[-take:]
            self.up_blocks.append(
                UpBlock(
                    cfg, prev, cfg.block_out_channels[lvl], skips, cfg.num_attention_heads[lvl],
                    cfg.transformer_layers_per_block[lvl], cfg.down_block_has_attn[lvl], lvl > 0,
                )
            )
            prev = cfg.block_out_channels[lvl]
        self.conv_norm_out = nn.GroupNorm(cfg.norm_num_groups, c0, eps=cfg.norm_eps)
        self.conv_out = nn.Conv2d(c0, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timestep, encoder_hidden_states, text_embeds, time_ids):
        b = sample.shape[0]
        t = timestep.expand(b) if timestep.ndim == 0 else timestep
        emb = self.time_embedding(timestep_embedding(t, self.cfg.block_out_channels[0]))
        tid = timestep_embedding(time_ids.reshape(-1), self.cfg.addition_time_embed_dim).reshape(b, -1)
        emb = emb + self.add_embedding(torch.cat([text_embeds, tid], dim=-1))

        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            x, res = blk(x, emb, encoder_hidden_states)
            skips += res
        x = self.mid_block(x, emb, encoder_hidden_states)
        for blk in self.up_blocks:
            x = blk(x, skips, emb, encoder_hidden_states)
        return self.conv_out(F.silu(self.conv_norm_out(x)))
