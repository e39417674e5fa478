"""Checkpoint-manifest parity anchors (VERDICT round-1 missing #2).

The round-1 UNet/VAE parity tests compare against torch mirrors written by
the same builder — a shared misreading of diffusers semantics would pass
both sides. diffusers itself is not installed here and there is no network,
so true golden-tensor tests are impossible; these tests instead anchor the
conversion path against EXTERNALLY PUBLISHED facts: the tensor shapes of
the actual `stabilityai/stable-diffusion-xl-base-1.0` checkpoint files
(unet/diffusion_pytorch_model.safetensors, vae/…), as documented by the HF
model card / safetensors index and the diffusers UNet2DConditionModel /
AutoencoderKL formats the reference loads (reference
latentblending/diffusers_holder.py:20-35, requirements.txt diffusers==0.25.0).

Why this is not circular: the anchor table below is a transcription of the
published checkpoint's key→shape manifest, not derived from this repo's
code. Feeding a synthetic state dict with exactly those shapes through our
converter (models/weights.py) and requiring every leaf to land on an
identically-shaped slot of our flax module's init tree pins, layer by
layer:

- the UP-BLOCK SKIP ORDER: diffusers up blocks pop skip connections
  deepest-first, so `up_blocks.0.resnets.2.conv1` has in-channels
  1280+640=1920 while resnets.0/1 have 1280+1280=2560. A reversed pop
  order swaps those shapes and total param count CANNOT catch it (the sum
  is symmetric) — the per-key anchors below do.
- the use_linear_projection=True format (proj_in/proj_out are 2-D Linear
  weights, not 1×1 convs),
- the GEGLU fused projection width (ff.net.0.proj: dim → 8·dim),
- SDXL micro-conditioning dims (add_embedding.linear_1: 2816 → 1280),
- attention projection shapes incl. cross-attention context width 2048.

The companion fact that `attention_head_dim=[5,10,20]` in the SDXL config
means NUMBER OF HEADS (head dim is 64 everywhere — the known diffusers
naming quirk; see the SDXL report arXiv:2307.01952 Table, and diffusers'
own `num_attention_heads = num_attention_heads or attention_head_dim`
fallback) is asserted on our configs at the bottom. Head count leaves all
parameter shapes unchanged, so no manifest can catch it — the config
assertion documents the interpretation with provenance instead.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from latentblending_tpu.models import configs as C
from latentblending_tpu.models.unet import UNet2DCondition
from latentblending_tpu.models.vae import VAE
from latentblending_tpu.models.weights import (
    convert_unet_state_dict,
    convert_vae_state_dict,
)

# ---------------------------------------------------------------------------
# stabilityai/stable-diffusion-xl-base-1.0 unet — published key→shape facts
# (torch layout: Linear [out,in], Conv [O,I,kH,kW]).
# ---------------------------------------------------------------------------
UNET_ANCHORS = {
    "conv_in.weight": (320, 4, 3, 3),
    "conv_in.bias": (320,),
    "time_embedding.linear_1.weight": (1280, 320),
    "time_embedding.linear_2.weight": (1280, 1280),
    # SDXL micro-conditioning: pooled 1280 + 6 time_ids × 256 = 2816
    "add_embedding.linear_1.weight": (1280, 2816),
    "add_embedding.linear_2.weight": (1280, 1280),
    # down level 0: DownBlock2D (no attention)
    "down_blocks.0.resnets.0.conv1.weight": (320, 320, 3, 3),
    "down_blocks.0.resnets.0.time_emb_proj.weight": (320, 1280),
    "down_blocks.0.resnets.1.conv2.weight": (320, 320, 3, 3),
    "down_blocks.0.downsamplers.0.conv.weight": (320, 320, 3, 3),
    # down level 1: CrossAttnDownBlock2D, 2 transformer layers
    "down_blocks.1.resnets.0.conv1.weight": (640, 320, 3, 3),
    "down_blocks.1.resnets.0.conv_shortcut.weight": (640, 320, 1, 1),
    "down_blocks.1.resnets.1.conv1.weight": (640, 640, 3, 3),
    "down_blocks.1.attentions.0.norm.weight": (640,),
    "down_blocks.1.attentions.0.proj_in.weight": (640, 640),  # Linear!
    "down_blocks.1.attentions.0.proj_out.weight": (640, 640),
    "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight": (640, 640),
    "down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k.weight": (640, 2048),
    "down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_out.0.weight": (640, 640),
    "down_blocks.1.attentions.0.transformer_blocks.1.ff.net.0.proj.weight": (5120, 640),
    "down_blocks.1.attentions.0.transformer_blocks.1.ff.net.2.weight": (640, 2560),
    "down_blocks.1.downsamplers.0.conv.weight": (640, 640, 3, 3),
    # down level 2: CrossAttnDownBlock2D, 10 transformer layers, NO downsampler
    "down_blocks.2.resnets.0.conv1.weight": (1280, 640, 3, 3),
    "down_blocks.2.resnets.0.conv_shortcut.weight": (1280, 640, 1, 1),
    "down_blocks.2.attentions.1.transformer_blocks.9.attn2.to_v.weight": (1280, 2048),
    "down_blocks.2.attentions.1.transformer_blocks.9.ff.net.0.proj.weight": (10240, 1280),
    # mid block (10 transformer layers)
    "mid_block.resnets.0.conv1.weight": (1280, 1280, 3, 3),
    "mid_block.attentions.0.transformer_blocks.9.attn1.to_q.weight": (1280, 1280),
    # up block 0 — THE skip-order discriminators
    "up_blocks.0.resnets.0.conv1.weight": (1280, 2560, 3, 3),
    "up_blocks.0.resnets.0.conv_shortcut.weight": (1280, 2560, 1, 1),
    "up_blocks.0.resnets.1.conv1.weight": (1280, 2560, 3, 3),
    "up_blocks.0.resnets.2.conv1.weight": (1280, 1920, 3, 3),
    "up_blocks.0.resnets.2.conv_shortcut.weight": (1280, 1920, 1, 1),
    "up_blocks.0.attentions.2.transformer_blocks.0.attn1.to_q.weight": (1280, 1280),
    "up_blocks.0.upsamplers.0.conv.weight": (1280, 1280, 3, 3),
    # up block 1
    "up_blocks.1.resnets.0.conv1.weight": (640, 1920, 3, 3),
    "up_blocks.1.resnets.1.conv1.weight": (640, 1280, 3, 3),
    "up_blocks.1.resnets.2.conv1.weight": (640, 960, 3, 3),
    "up_blocks.1.attentions.0.transformer_blocks.1.ff.net.2.weight": (640, 2560),
    "up_blocks.1.upsamplers.0.conv.weight": (640, 640, 3, 3),
    # up block 2: UpBlock2D (no attention, no upsampler)
    "up_blocks.2.resnets.0.conv1.weight": (320, 960, 3, 3),
    "up_blocks.2.resnets.1.conv1.weight": (320, 640, 3, 3),
    "up_blocks.2.resnets.2.conv1.weight": (320, 640, 3, 3),
    "up_blocks.2.resnets.2.conv_shortcut.weight": (320, 640, 1, 1),
    "conv_norm_out.weight": (320,),
    "conv_out.weight": (4, 320, 3, 3),
}

# stabilityai/stable-diffusion-xl-base-1.0 vae — published key→shape facts
VAE_ANCHORS = {
    "quant_conv.weight": (8, 8, 1, 1),
    "post_quant_conv.weight": (4, 4, 1, 1),
    "encoder.conv_in.weight": (128, 3, 3, 3),
    "encoder.down_blocks.0.resnets.0.conv1.weight": (128, 128, 3, 3),
    "encoder.down_blocks.0.downsamplers.0.conv.weight": (128, 128, 3, 3),
    "encoder.down_blocks.1.resnets.0.conv1.weight": (256, 128, 3, 3),
    "encoder.down_blocks.1.resnets.0.conv_shortcut.weight": (256, 128, 1, 1),
    "encoder.down_blocks.2.resnets.0.conv1.weight": (512, 256, 3, 3),
    "encoder.down_blocks.3.resnets.1.conv2.weight": (512, 512, 3, 3),
    "encoder.mid_block.resnets.0.conv1.weight": (512, 512, 3, 3),
    "encoder.mid_block.attentions.0.to_q.weight": (512, 512),
    "encoder.mid_block.attentions.0.group_norm.weight": (512,),
    "encoder.conv_norm_out.weight": (512,),
    "encoder.conv_out.weight": (8, 512, 3, 3),  # 2 × latent_channels
    "decoder.conv_in.weight": (512, 4, 3, 3),
    "decoder.mid_block.attentions.0.to_out.0.weight": (512, 512),
    # decoder up blocks run reversed(block_out_channels) = 512,512,256,128
    "decoder.up_blocks.0.resnets.0.conv1.weight": (512, 512, 3, 3),
    "decoder.up_blocks.0.upsamplers.0.conv.weight": (512, 512, 3, 3),
    "decoder.up_blocks.1.upsamplers.0.conv.weight": (512, 512, 3, 3),
    "decoder.up_blocks.2.resnets.0.conv1.weight": (256, 512, 3, 3),
    "decoder.up_blocks.2.resnets.0.conv_shortcut.weight": (256, 512, 1, 1),
    "decoder.up_blocks.2.resnets.1.conv1.weight": (256, 256, 3, 3),
    "decoder.up_blocks.2.upsamplers.0.conv.weight": (256, 256, 3, 3),
    "decoder.up_blocks.3.resnets.0.conv1.weight": (128, 256, 3, 3),
    "decoder.up_blocks.3.resnets.0.conv_shortcut.weight": (128, 256, 1, 1),
    "decoder.up_blocks.3.resnets.2.conv1.weight": (128, 128, 3, 3),
    "decoder.conv_norm_out.weight": (128,),
    "decoder.conv_out.weight": (3, 128, 3, 3),
}


def _unet_init_shapes():
    unet = UNet2DCondition(C.SDXL_BASE_UNET)
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 4)), jnp.float32(0.0),
        jnp.zeros((1, 77, 2048)), jnp.zeros((1, 1280)), jnp.zeros((1, 6)),
    )
    return flatten_dict(shapes["params"])


def _vae_init_shapes():
    import functools

    vae = VAE(C.SDXL_VAE)
    shapes = jax.eval_shape(
        functools.partial(vae.init, method=VAE.full),
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 16, 16, 3)),
    )
    return flatten_dict(shapes["params"])


def _check_anchors(anchors, convert, init_flat):
    synth = {k: np.zeros(shape, np.float16) for k, shape in anchors.items()}
    converted = flatten_dict(convert(synth))
    assert len(converted) == len(anchors), "converter dropped or merged anchor keys"
    missing, mismatched = [], []
    for path, value in converted.items():
        slot = init_flat.get(path)
        if slot is None:
            missing.append("/".join(path))
        elif tuple(slot.shape) != tuple(value.shape):
            mismatched.append(f"{'/'.join(path)}: ckpt {tuple(value.shape)} vs model {tuple(slot.shape)}")
    assert not missing, f"converted checkpoint keys with no slot in the flax tree: {missing}"
    assert not mismatched, f"shape mismatches vs published checkpoint manifest: {mismatched}"


def test_unet_checkpoint_manifest_anchors():
    _check_anchors(UNET_ANCHORS, convert_unet_state_dict, _unet_init_shapes())


def test_vae_checkpoint_manifest_anchors():
    _check_anchors(VAE_ANCHORS, convert_vae_state_dict, _vae_init_shapes())


def test_unet_absent_modules():
    """The published checkpoint has NO down_blocks.2 downsampler, NO
    up_blocks.2 upsampler and NO attention in down 0 / up 2 — extra modules
    in our tree would silently stay random-initialized after conversion."""
    flat = _unet_init_shapes()
    tops = {p[0] for p in flat}
    assert "down_blocks_2" in tops and "up_blocks_2" in tops
    seconds = {(p[0], p[1]) for p in flat}
    assert ("down_blocks_2", "downsamplers_0") not in seconds
    assert ("up_blocks_2", "upsamplers_0") not in seconds
    assert not any(a == "down_blocks_0" and b.startswith("attentions") for a, b in seconds)
    assert not any(a == "up_blocks_2" and b.startswith("attentions") for a, b in seconds)


def test_vae_decoder_has_no_final_upsampler():
    flat = _vae_init_shapes()
    mods = {p[1] for p in flat if p[0] == "decoder"}
    assert "up_blocks_2_upsamplers_0" in mods
    assert "up_blocks_3_upsamplers_0" not in mods


def test_sdxl_head_dim_is_64():
    """attention_head_dim=[5,10,20] in the SDXL config is the HEAD COUNT
    (diffusers quirk); head dim is 64 at every level (2307.01952). Our
    configs must encode that interpretation."""
    for cfg in (C.SDXL_BASE_UNET, C.SDXL_TURBO_UNET):
        for ch, heads in zip(cfg.block_out_channels, cfg.num_attention_heads):
            assert ch == heads * 64, (ch, heads)


def test_unet_total_tensor_count():
    """The published UNet checkpoint contains exactly 1680 tensors
    (diffusers format, safetensors index of
    stable-diffusion-xl-base-1.0/unet). Our init tree must match — a
    missing bias or an extra norm anywhere changes this count."""
    assert len(_unet_init_shapes()) == 1680


def test_vae_total_tensor_count():
    """AutoencoderKL (SD/SDXL VAE) has 248 tensors in diffusers format."""
    assert len(_vae_init_shapes()) == 248
