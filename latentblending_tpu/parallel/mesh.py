"""Device mesh + sharding helpers.

The reference is strictly single-GPU/sequential (SURVEY.md §2.3). The TPU
build's central parallel strategy is *batched-tree data parallelism*: all
sibling stems of one injection level form the batch axis of a single UNet
forward, sharded over the mesh 'data' axis; the CFG uncond/cond pair is
folded into the same batch. Params are replicated over 'data' and (later)
sharded over 'model' for tensor parallelism.

Collectives are emitted by XLA from these sharding annotations — there is
no hand-written comm layer (the TPU-native answer to NCCL).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Stem batch: leading axis over 'data', rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put_global(x, sharding: NamedSharding):
    """Place one host array onto a (possibly multi-process) sharding.

    Single-process: plain device_put. Multi-process: device_put onto a
    sharding that spans non-addressable devices runs a per-leaf
    `multihost_utils.assert_equal` — a gloo collective per parameter leaf,
    observed to segfault the CPU backend under the hundreds of leaves a
    UNet carries. jax.make_array_from_callback builds the same global array
    from local shards with zero collectives; every process constructs
    identical values by design (seeded init / identical checkpoint reads),
    the same contract TPU pods rely on."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def shard_stem_batch(tree, mesh: Mesh):
    """Place every leaf's leading (stem) axis over the 'data' mesh axis."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: _put_global(x, s), tree)


def replicate_params(params, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _put_global(x, r), params)


def auto_mesh(n_model: int | None = None):
    """('data','model') mesh over all visible devices, or None single-chip.

    The production entry points (bench.py, apps/) call this so multi-device
    runs shard by default; n_model (or LB_MESH_TP) carves a tensor-parallel
    axis out of the device count."""
    import os

    n_dev = len(jax.devices())
    if n_dev < 2:
        return None
    if n_model is None:
        n_model = int(os.environ.get("LB_MESH_TP", "1"))
    return make_mesh(n_data=n_dev // n_model, n_model=n_model)


def pad_to_multiple(n: int, m: int) -> int:
    """Stem batches are padded to a multiple of the data-axis size so the
    shard shapes stay static (recompilation control, SURVEY.md §7 hard part c)."""
    return ((n + m - 1) // m) * m
