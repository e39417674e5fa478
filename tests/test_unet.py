import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.models.configs import TINY_UNET
from latentblending_tpu.models.layers import timestep_embedding
from latentblending_tpu.models.unet import UNet2DCondition
from latentblending_tpu.models.weights import convert_unet_state_dict


@pytest.fixture(scope="module")
def tiny_unet():
    unet = UNet2DCondition(TINY_UNET)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, TINY_UNET.cross_attention_dim))
    pooled = jnp.zeros((1, 64))
    tids = jnp.zeros((1, 6))
    params = unet.init(rng, sample, jnp.float32(999.0), ctx, pooled, tids)["params"]
    return unet, params


def test_unet_output_shape(tiny_unet):
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, TINY_UNET.cross_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (2, 64))
    tids = jnp.tile(jnp.array([[512.0, 512.0, 0.0, 0.0, 512.0, 512.0]]), (2, 1))
    out = unet.apply({"params": params}, x, jnp.float32(500.0), ctx, pooled, tids)
    assert out.shape == (2, 16, 16, 4)
    assert bool(jnp.isfinite(out).all())


def test_unet_deterministic_and_conditioning_sensitive(tiny_unet):
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ctx1 = jax.random.normal(jax.random.PRNGKey(2), (1, 77, TINY_UNET.cross_attention_dim))
    ctx2 = jax.random.normal(jax.random.PRNGKey(4), (1, 77, TINY_UNET.cross_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (1, 64))
    tids = jnp.array([[512.0, 512.0, 0.0, 0.0, 512.0, 512.0]])
    f = lambda c: unet.apply({"params": params}, x, jnp.float32(500.0), c, pooled, tids)
    a, b = f(ctx1), f(ctx1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(f(ctx1)), np.asarray(f(ctx2)))


def test_unet_timestep_sensitivity(tiny_unet):
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, TINY_UNET.cross_attention_dim))
    pooled = jnp.zeros((1, 64))
    tids = jnp.zeros((1, 6))
    f = lambda t: unet.apply({"params": params}, x, jnp.float32(t), ctx, pooled, tids)
    assert not np.allclose(np.asarray(f(999.0)), np.asarray(f(10.0)))


def test_timestep_embedding_matches_formula():
    # diffusers get_timestep_embedding with flip_sin_to_cos=True, shift=0
    t = np.array([0.0, 1.0, 500.0, 999.0], np.float32)
    dim = 32
    got = np.asarray(timestep_embedding(jnp.array(t), dim, True, 0.0))
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    ref = np.concatenate([np.cos(t[:, None] * freqs), np.sin(t[:, None] * freqs)], axis=1)
    # f32 sin/cos at phases up to ~999 differ from the f64 reference by ~1e-3;
    # torch computes in f32 as well, so this is the realistic parity bar.
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)


# Representative HF SDXL UNet checkpoint keys (from
# stabilityai/stable-diffusion-xl-base-1.0 unet safetensors; structure is
# identical for the tiny config) — asserts that conversion lands every one
# of them on an existing path of our initialized param tree.
HF_KEYS = [
    "conv_in.weight",
    "conv_in.bias",
    "time_embedding.linear_1.weight",
    "time_embedding.linear_2.bias",
    "add_embedding.linear_1.weight",
    "add_embedding.linear_2.weight",
    "down_blocks.0.resnets.0.norm1.weight",
    "down_blocks.0.resnets.0.conv1.weight",
    "down_blocks.0.resnets.0.time_emb_proj.weight",
    "down_blocks.0.resnets.0.norm2.weight",
    "down_blocks.0.resnets.0.conv2.weight",
    "down_blocks.0.downsamplers.0.conv.weight",
    "down_blocks.1.resnets.0.conv_shortcut.weight",
    "down_blocks.1.attentions.0.norm.weight",
    "down_blocks.1.attentions.0.proj_in.weight",
    "down_blocks.1.attentions.0.transformer_blocks.0.norm1.weight",
    "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight",
    "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_out.0.weight",
    "down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k.weight",
    "down_blocks.1.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
    "down_blocks.1.attentions.0.transformer_blocks.0.ff.net.2.weight",
    "down_blocks.1.attentions.0.proj_out.weight",
    "mid_block.resnets.0.conv1.weight",
    "mid_block.attentions.0.transformer_blocks.0.attn2.to_v.weight",
    "mid_block.resnets.1.conv2.weight",
    "up_blocks.0.resnets.0.conv_shortcut.weight",
    "up_blocks.0.resnets.2.conv1.weight",
    "up_blocks.0.attentions.2.transformer_blocks.0.norm3.weight",
    "up_blocks.0.upsamplers.0.conv.weight",
    "up_blocks.2.resnets.2.conv2.weight",
    "conv_norm_out.weight",
    "conv_out.bias",
]


def test_hf_key_conversion_lands_on_param_tree(tiny_unet):
    from flax.traverse_util import flatten_dict

    _, params = tiny_unet
    tree_paths = set(flatten_dict(params).keys())

    # synthesize a state dict with dummy arrays of plausible rank
    state = {}
    for k in HF_KEYS:
        rank = 1
        leaf = k.split(".")[-2]
        if k.endswith(".weight"):
            if "norm" in leaf or leaf == "norm":
                rank = 1
            elif "conv" in leaf or leaf in ("downsamplers", "upsamplers"):
                rank = 4
            else:
                rank = 2
        if k in ("down_blocks.0.downsamplers.0.conv.weight", "up_blocks.0.upsamplers.0.conv.weight"):
            rank = 4
        if k.endswith(".bias"):
            rank = 1
        state[k] = np.zeros((2,) * rank, np.float32)
    # fix conv-named keys that are actually linear (proj_in/out are 2D already)
    converted = convert_unet_state_dict(state)
    got_paths = set(flatten_dict(converted).keys())
    # tiny config has layers_per_block=1 → no resnets_2/attentions_2; those
    # keys document the real SDXL structure and are excluded here.
    missing = sorted(
        p
        for p in got_paths
        if p not in tree_paths
        and "resnets_2" not in "/".join(p)
        and "attentions_2" not in "/".join(p)
    )
    assert not missing, f"converted keys missing from param tree: {missing}"
