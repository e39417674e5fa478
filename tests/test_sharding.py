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


def test_holder_mesh_sharded_run():
    """SDXLHolder(mesh=...) shards the stem batch over 'data' and matches
    the unsharded run."""
    import jax.numpy as jnp

    from latentblending_tpu.runtime.holder import SDXLHolder

    mesh = make_mesh()
    dh0 = SDXLHolder.from_random("tiny-turbo", seed=0, dtype=jnp.float32)
    dh1 = SDXLHolder.from_random("tiny-turbo", seed=0, dtype=jnp.float32, mesh=mesh)
    te = dh0.get_text_embedding("test")
    lat = jnp.concatenate([dh0.get_noise(i) for i in range(8)], axis=0)
    cond0 = dh0._conditioning(te, 8)
    cond1 = dh1._conditioning(te, 8)
    with mesh:
        traj1 = dh1.run_diffusion_batched(cond1, lat)
    traj0 = dh0.run_diffusion_batched(cond0, lat)
    np.testing.assert_allclose(
        np.asarray(traj1[-1], np.float32), np.asarray(traj0[-1], np.float32), rtol=5e-4, atol=5e-4
    )
