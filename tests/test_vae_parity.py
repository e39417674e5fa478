"""Golden VAE decode parity: JAX VAE with weights converted from an
HF-key-named torch mirror (tests/torch_ref_vae.py)."""
import numpy as np
import pytest

from latentblending_tpu.models.configs import TINY_VAE
from latentblending_tpu.models.vae import VAE
from latentblending_tpu.models.weights import convert_vae_state_dict, torch_state_dict_to_numpy


def test_decode_parity():
    torch = pytest.importorskip("torch")
    from tests.torch_ref_vae import TorchRefVAE

    torch.manual_seed(0)
    ref = TorchRefVAE(TINY_VAE).eval()
    params = convert_vae_state_dict(torch_state_dict_to_numpy(ref))

    vae = VAE(TINY_VAE)
    rng = np.random.default_rng(0)
    z = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)  # NCHW torch

    with torch.no_grad():
        want = ref.decode(torch.tensor(z)).numpy()

    import jax.numpy as jnp

    got = vae.apply({"params": {k: v for k, v in params.items()}},
                    jnp.asarray(z.transpose(0, 2, 3, 1)), method=VAE.decode)
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, want, rtol=5e-3, atol=1e-4)
