"""Child process for test_distributed_multiproc: one of N jax.distributed
processes, each owning 4 virtual CPU devices. Runs a sharded denoise over
the global ('data', 'model') mesh and (on process 0) saves the gathered
trajectory for the parent to compare against a single-process run.

Not a test module — invoked as `python dist_child.py <pid> <nprocs> <port> <out>`.
"""
import os
import re
import sys

# the parent test session forces an 8-device CPU platform; this child needs
# its OWN 4-device view, so REPLACE any inherited force flag
flags = os.environ.get("XLA_FLAGS", "")
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

pid, nprocs, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latentblending_tpu.parallel.distributed import global_mesh, init_distributed

multi = init_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
)
assert multi, "expected a multi-process run"
assert jax.process_count() == nprocs
assert jax.local_device_count() == 4 and jax.device_count() == 4 * nprocs

import jax.numpy as jnp
import numpy as np

from latentblending_tpu.runtime.holder import SDXLHolder

mesh = global_mesh(n_model=1)
assert dict(mesh.shape) == {"data": 4 * nprocs, "model": 1}

# every process builds IDENTICAL params from the same seed (the standard
# multi-host contract; checkpoint loads behave the same way)
dh = SDXLHolder.from_random("tiny-turbo", seed=0, dtype=jnp.float32, mesh=mesh)
B = 8
lat0 = jnp.concatenate([dh.get_noise(seed=s) for s in range(B)], axis=0)
cond = dh._conditioning(dh.get_text_embedding("a distributed probe"), B)
traj = dh.run_diffusion_batched(cond, lat0, idx_start=0)

from jax.experimental import multihost_utils

full = np.asarray(multihost_utils.process_allgather(traj, tiled=True), np.float32)
if pid == 0:
    np.save(out, full)
print(f"dist_child {pid}: OK {full.shape}", flush=True)
