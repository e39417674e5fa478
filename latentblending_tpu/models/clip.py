"""CLIP text encoders (ViT-L/14 and OpenCLIP bigG towers), flax.linen.

The reference obtains its 4-tuple text conditioning from
pipe.encode_prompt (reference diffusers_holder.py:79-96): per encoder the
PENULTIMATE hidden state (no final layer norm), concatenated across the two
towers to [B,77,2048]; the pooled embedding is text_encoder_2's projected
EOS-token feature. This module implements the towers; the 4-tuple assembly
lives in runtime/holder.py.

Parity against HF transformers' torch CLIPTextModel is tested in
tests/test_clip_parity.py via weight conversion (models/weights.py).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from latentblending_tpu.models.configs import CLIPTextConfig
from latentblending_tpu.models.layers import LayerNorm, dense

Dtype = Any


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        q = dense(c.hidden_size, self.dtype, self.param_dtype, "q_proj")(x)
        k = dense(c.hidden_size, self.dtype, self.param_dtype, "k_proj")(x)
        v = dense(c.hidden_size, self.dtype, self.param_dtype, "v_proj")(x)
        b, l, _ = x.shape
        q = q.reshape(b, l, c.num_heads, head_dim)
        k = k.reshape(b, l, c.num_heads, head_dim)
        v = v.reshape(b, l, c.num_heads, head_dim)
        out = jax.nn.dot_product_attention(q, k, v, bias=causal_mask.astype(q.dtype))
        out = out.reshape(b, l, c.hidden_size)
        return dense(c.hidden_size, self.dtype, self.param_dtype, "out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        c = self.cfg
        h = LayerNorm(eps=c.layer_norm_eps, name="layer_norm1")(x)
        x = x + CLIPAttention(c, self.dtype, self.param_dtype, name="self_attn")(h, causal_mask)
        h = LayerNorm(eps=c.layer_norm_eps, name="layer_norm2")(x)
        h = dense(c.intermediate_size, self.dtype, self.param_dtype, "mlp_fc1")(h)
        h = _act(c.hidden_act)(h)
        h = dense(c.hidden_size, self.dtype, self.param_dtype, "mlp_fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """Returns (penultimate_hidden, last_hidden, pooled).

    penultimate_hidden: output of layer N-1 (what SDXL conditions on),
    last_hidden: final_layer_norm(output of layer N),
    pooled: last_hidden at the first EOS position, projected if
    cfg.projection_dim is set (text_encoder_2), else raw.
    """

    cfg: CLIPTextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
        c = self.cfg
        b, l = input_ids.shape
        tok = nn.Embed(
            c.vocab_size, c.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name="token_embedding"
        )(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01), (c.max_position_embeddings, c.hidden_size), self.param_dtype
        )
        x = tok + pos[None, :l, :].astype(self.dtype)

        neg = jnp.finfo(jnp.float32).min
        causal_mask = jnp.triu(jnp.full((l, l), neg, jnp.float32), k=1)[None, None, :, :]

        penultimate = x
        for i in range(c.num_layers):
            if i == c.num_layers - 1:
                penultimate = x
            x = CLIPEncoderLayer(c, self.dtype, self.param_dtype, name=f"layers_{i}")(x, causal_mask)

        last_hidden = LayerNorm(eps=c.layer_norm_eps, name="final_layer_norm")(x)

        # first EOS position (HF convention for eos_token_id-aware pooling)
        is_eos = (input_ids == c.eos_token_id).astype(jnp.int32)
        has_eos = jnp.any(is_eos, axis=-1)
        eos_pos = jnp.where(has_eos, jnp.argmax(is_eos, axis=-1), jnp.argmax(input_ids, axis=-1))
        pooled = jnp.take_along_axis(last_hidden, eos_pos[:, None, None], axis=1)[:, 0, :]
        if c.projection_dim is not None:
            pooled = dense(c.projection_dim, self.dtype, self.param_dtype, "text_projection", use_bias=False)(pooled)
        return penultimate, last_hidden, pooled
