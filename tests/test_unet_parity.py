"""Golden UNet parity: JAX UNet with weights converted from an
HF-key-named torch reference implementation (tests/torch_ref_unet.py).

Verifies the full conversion path (every checkpoint key) and the module
math (GroupNorm grouping, attention scaling, GEGLU gate order, skip
ordering, micro-conditioning embedding) in one comparison.
"""
import numpy as np
import pytest

from latentblending_tpu.models.configs import TINY_UNET
from latentblending_tpu.models.unet import UNet2DCondition
from latentblending_tpu.models.weights import convert_unet_state_dict, torch_state_dict_to_numpy

POOLED = 48


@pytest.fixture(scope="module")
def pair():
    torch = pytest.importorskip("torch")
    from tests.torch_ref_unet import TorchRefUNet

    torch.manual_seed(0)
    ref = TorchRefUNet(TINY_UNET, pooled_dim=POOLED).eval()
    params = convert_unet_state_dict(torch_state_dict_to_numpy(ref))
    unet = UNet2DCondition(TINY_UNET)
    return ref, unet, params


def test_all_keys_convert_into_param_tree(pair):
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict

    _, unet, params = pair
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)), jnp.float32(0.0),
        jnp.zeros((1, 77, TINY_UNET.cross_attention_dim)), jnp.zeros((1, POOLED)), jnp.zeros((1, 6)),
    )["params"]
    got = {k: v.shape for k, v in flatten_dict(params).items()}
    want = {k: v.shape for k, v in flatten_dict(shapes).items()}
    assert got == want


def test_output_parity(pair):
    import torch

    ref, unet, params = pair
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)  # NCHW for torch
    ctx = rng.normal(size=(2, 77, TINY_UNET.cross_attention_dim)).astype(np.float32)
    pooled = rng.normal(size=(2, POOLED)).astype(np.float32)
    tids = np.tile(np.array([[128.0, 128.0, 0.0, 0.0, 128.0, 128.0]], np.float32), (2, 1))
    t = np.float32(499.0)

    with torch.no_grad():
        want = ref(
            torch.tensor(x), torch.tensor(t), torch.tensor(ctx), torch.tensor(pooled), torch.tensor(tids)
        ).numpy()

    import jax.numpy as jnp

    got = unet.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),  # NHWC
        jnp.float32(t),
        jnp.asarray(ctx),
        jnp.asarray(pooled),
        jnp.asarray(tids),
    )
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, want, rtol=5e-3, atol=5e-4)
