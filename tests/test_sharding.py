"""Distributed tests on the 8-virtual-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): batched-stem sharding equivalence
and the driver's multi-chip dry run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate_params,
    shard_stem_batch,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_pad_to_multiple():
    assert pad_to_multiple(5, 8) == 8
    assert pad_to_multiple(8, 8) == 8
    assert pad_to_multiple(9, 8) == 16


def test_sharded_batch_equals_single_device():
    """The batched-tree contract: computing a sharded stem batch gives the
    same numbers as unsharded."""
    mesh = make_mesh()

    def step(params, x):
        return jnp.tanh(x @ params["w"]) + params["b"]

    params = {"w": jax.random.normal(jax.random.PRNGKey(0), (16, 16)), "b": jnp.ones((16,))}
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16))

    ref = jax.jit(step)(params, x)
    xp = shard_stem_batch(x, mesh)
    pp = replicate_params(params, mesh)
    out = jax.jit(step)(pp, xp)
    assert out.sharding.is_equivalent_to(batch_sharding(mesh), out.ndim)
    # sharded execution reassociates the f32 matmul → ~4e-7 differences
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
