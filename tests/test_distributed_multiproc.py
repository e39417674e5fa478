"""Multi-process distributed bring-up smoke (VERDICT r4 missing #4).

Two jax.distributed processes × 4 virtual CPU devices each = one global
8-device ('data','model') mesh; a sharded denoise over it must produce the
same trajectory as the plain single-process engine. This exercises the
exact production path (parallel/distributed.init_distributed +
global_mesh + SDXLHolder.run_diffusion_batched with a mesh), which no
single-process test can: cross-process collectives ride gloo on CPU, the
same shape as ICI/DCN collectives on a TPU pod.

Found real bugs when first written: from_random pinned computations to
jax.devices()[0] (non-addressable off process 0 — backend crash), and
device_put onto a multi-process sharding segfaulted in its per-leaf
assert_equal collective (now jax.make_array_from_callback,
parallel/mesh._put_global).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

NPROCS = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_denoise_matches_single_process(tmp_path):
    child = os.path.join(os.path.dirname(__file__), "dist_child.py")
    out = str(tmp_path / "dist_traj.npy")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # child selects cpu itself

    procs = [
        subprocess.Popen(
            [sys.executable, "-u", child, str(pid), str(NPROCS), str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(NPROCS)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"child {pid} failed:\n{stdout[-4000:]}"
        assert f"dist_child {pid}: OK" in stdout
    assert os.path.isfile(out)
    traj_dist = np.load(out)

    # single-process reference: same seeds, same model, no mesh
    import jax.numpy as jnp

    from latentblending_tpu.runtime.holder import SDXLHolder

    dh = SDXLHolder.from_random("tiny-turbo", seed=0, dtype=jnp.float32)
    B = 8
    lat0 = jnp.concatenate([dh.get_noise(seed=s) for s in range(B)], axis=0)
    cond = dh._conditioning(dh.get_text_embedding("a distributed probe"), B)
    traj_ref = np.asarray(dh.run_diffusion_batched(cond, lat0, idx_start=0), np.float32)

    assert traj_dist.shape == traj_ref.shape
    # tolerance: sharded-vs-single execution reassociates reductions; f32
    # trajectories reach |x|~30, so a few-ulp drift at 1e-4 is expected
    np.testing.assert_allclose(traj_dist, traj_ref, atol=1e-4, rtol=1e-4)
