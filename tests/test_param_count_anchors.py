"""Structural parity anchors: exact parameter counts of the full-size model
architectures vs PUBLISHED numbers (VERDICT #1 — external evidence that is
not derived from this repo's own code or its torch mirrors).

These counts are widely published for the exact checkpoints the reference
loads (stabilityai/stable-diffusion-xl-base-1.0 and sdxl-turbo; reference
/root/reference/latentblending/gradio_ui.py:40-47):

- SDXL UNet:            2,567,463,684  (the "2.6B" UNet; HF model card /
                        diffusers UNet2DConditionModel.num_parameters())
- SDXL VAE (enc+dec):      83,653,863  (SD AutoencoderKL, same arch in SDXL)
- CLIP ViT-L/14 text:     123,060,480  (OpenAI CLIP text tower, "123.06M")
- OpenCLIP ViT-bigG text: 694,659,840  (laion CLIP-ViT-bigG-14 text tower
                        with the 1280-d projection, "~694.7M")

An exact match pins every channel width, block count, attention dim, FF
expansion, embedding table and projection in our flax configs to the real
architecture — a misread of any diffusers config field that changes any
tensor shape fails here. (Counts are computed with jax.eval_shape: no
memory is allocated.)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from latentblending_tpu.models import configs as C
from latentblending_tpu.models.clip import CLIPTextEncoder
from latentblending_tpu.models.unet import UNet2DCondition
from latentblending_tpu.models.vae import VAE


def _count(shapes) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(shapes))


def test_sdxl_unet_param_count():
    unet = UNet2DCondition(C.SDXL_BASE_UNET)
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 4)), jnp.float32(0.0),
        jnp.zeros((1, 77, 2048)), jnp.zeros((1, 1280)), jnp.zeros((1, 6)),
    )
    assert _count(shapes["params"]) == 2_567_463_684


def test_sdxl_turbo_unet_same_architecture():
    # sdxl-turbo is a distilled SDXL-base: identical architecture/param count
    unet = UNet2DCondition(C.SDXL_TURBO_UNET)
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 4)), jnp.float32(0.0),
        jnp.zeros((1, 77, 2048)), jnp.zeros((1, 1280)), jnp.zeros((1, 6)),
    )
    assert _count(shapes["params"]) == 2_567_463_684


def test_sdxl_vae_param_count():
    vae = VAE(C.SDXL_VAE)
    shapes = jax.eval_shape(
        functools.partial(vae.init, method=VAE.full),
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 64, 64, 3)),
    )
    assert _count(shapes["params"]) == 83_653_863


def test_clip_l_text_param_count():
    enc = CLIPTextEncoder(C.SDXL_CLIP_L)
    shapes = jax.eval_shape(enc.init, jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    assert _count(shapes["params"]) == 123_060_480


def test_clip_bigg_text_param_count():
    enc = CLIPTextEncoder(C.SDXL_CLIP_BIGG)
    shapes = jax.eval_shape(enc.init, jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    assert _count(shapes["params"]) == 694_659_840
