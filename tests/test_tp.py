"""Tensor-parallel sharding: TP rules land on the right params and a
dp×tp mesh run matches single-device numerics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from latentblending_tpu.models.configs import TINY_UNET
from latentblending_tpu.models.unet import UNet2DCondition
from latentblending_tpu.parallel.mesh import make_mesh, shard_stem_batch
from latentblending_tpu.parallel.tp import shard_unet_params, unet_tp_specs


@pytest.fixture(scope="module")
def unet_and_params():
    unet = UNet2DCondition(TINY_UNET)
    params = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 4)), jnp.float32(0.0),
        jnp.zeros((1, 77, TINY_UNET.cross_attention_dim)), jnp.zeros((1, 48)), jnp.zeros((1, 6)),
    )["params"]
    return unet, params


def test_tp_rules_cover_attention_and_ff(unet_and_params):
    _, params = unet_and_params
    mesh = make_mesh(n_data=4, n_model=2)
    specs = flatten_dict(unet_tp_specs(params, mesh))
    qkv = [k for k in specs if k[-2] in ("to_q", "to_k", "to_v") and k[-1] == "kernel"]
    assert qkv, "no attention kernels found"
    from jax.sharding import PartitionSpec as P

    for k in qkv:
        assert specs[k] == P(None, "model"), k
    outs = [k for k in specs if k[-2] == "to_out_0" and k[-1] == "kernel"]
    for k in outs:
        assert specs[k] == P("model", None), k
    # convs replicated
    convs = [k for k in specs if k[-2] == "conv1" and k[-1] == "kernel"]
    for k in convs:
        assert specs[k] == P(), k


def test_tp_run_matches_single_device(unet_and_params):
    unet, params = unet_and_params
    mesh = make_mesh(n_data=4, n_model=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 77, TINY_UNET.cross_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (4, 48))
    tids = jnp.zeros((4, 6))

    f = jax.jit(lambda p, *a: unet.apply({"params": p}, *a))
    ref = f(params, x, jnp.float32(500.0), ctx, pooled, tids)

    pp = shard_unet_params(params, mesh)
    xs = shard_stem_batch(x, mesh)
    cs = shard_stem_batch(ctx, mesh)
    ps = shard_stem_batch(pooled, mesh)
    with mesh:
        out = f(pp, xs, jnp.float32(500.0), cs, ps, tids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
