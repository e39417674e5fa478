import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.models.configs import TINY_VAE
from latentblending_tpu.models.vae import VAE
from latentblending_tpu.models.weights import convert_vae_state_dict


@pytest.fixture(scope="module")
def tiny_vae():
    vae = VAE(TINY_VAE)
    params = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4)), jnp.zeros((1, 32, 32, 3)), method=VAE.full
    )["params"]
    return vae, params


def test_decode_shape_and_upsampling(tiny_vae):
    vae, params = tiny_vae
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    img = vae.apply({"params": params}, z, method=vae.decode)
    # 3 upsample stages → ×8
    assert img.shape == (2, 64, 64, 3)
    assert bool(jnp.isfinite(img).all())


def test_encode_shape(tiny_vae):
    vae, params = tiny_vae
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    mean, logvar = vae.apply({"params": params}, x, method=vae.encode)
    assert mean.shape == (1, 4, 4, 4)
    assert logvar.shape == (1, 4, 4, 4)


HF_VAE_KEYS = [
    "post_quant_conv.weight",
    "quant_conv.bias",
    "decoder.conv_in.weight",
    "decoder.mid_block.resnets.0.norm1.weight",
    "decoder.mid_block.resnets.0.conv1.weight",
    "decoder.mid_block.attentions.0.group_norm.weight",
    "decoder.mid_block.attentions.0.to_q.weight",
    "decoder.mid_block.attentions.0.to_out.0.weight",
    "decoder.mid_block.resnets.1.conv2.weight",
    "decoder.up_blocks.0.resnets.0.conv1.weight",
    "decoder.up_blocks.0.upsamplers.0.conv.weight",
    "decoder.up_blocks.1.resnets.2.norm2.weight",
    "decoder.up_blocks.3.resnets.0.conv_shortcut.weight",
    "decoder.conv_norm_out.weight",
    "decoder.conv_out.bias",
    "encoder.conv_in.weight",
    "encoder.down_blocks.0.resnets.0.conv1.weight",
    "encoder.down_blocks.0.downsamplers.0.conv.weight",
    "encoder.mid_block.attentions.0.to_k.weight",
    "encoder.conv_out.weight",
]


def test_hf_vae_key_conversion_lands_on_param_tree(tiny_vae):
    from flax.traverse_util import flatten_dict

    _, params = tiny_vae
    tree_paths = set(flatten_dict(params).keys())
    state = {}
    for k in HF_VAE_KEYS:
        leaf = k.split(".")[-2]
        if k.endswith(".bias") or "norm" in leaf:
            rank = 1
        elif leaf in ("to_q", "to_k", "to_v", "to_out", "0") and "to_out" in k:
            rank = 2
        elif leaf.startswith("to_"):
            rank = 2
        else:
            rank = 4
        state[k] = np.zeros((2,) * rank, np.float32)
    converted = convert_vae_state_dict(state)
    got_paths = set(flatten_dict(converted).keys())
    # tiny config is structurally smaller than SDXL: layers_per_block 1 →
    # no resnets_2; equal adjacent channels → no conv_shortcut. Those keys
    # document the real SDXL structure; exclude them here.
    missing = sorted(
        p
        for p in got_paths
        if p not in tree_paths
        and "resnets_2" not in "/".join(p)
        and "conv_shortcut" not in p
    )
    assert not missing, f"converted keys missing from param tree: {missing}"
