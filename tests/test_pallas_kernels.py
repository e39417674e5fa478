"""Pallas slerp kernel vs the pure-JAX batched slerp (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.ops.interp import interpolate_spherical_batched
from latentblending_tpu.ops.pallas_kernels import slerp_pallas


@pytest.mark.parametrize("shape", [(2, 8, 8, 4), (3, 16, 16, 4), (1, 7, 5, 3)])
def test_slerp_pallas_matches_jax(shape):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=shape), jnp.float32)
    b = jnp.asarray(rng.normal(size=shape), jnp.float32)
    fract = jnp.asarray(rng.uniform(0, 1, size=shape[0]), jnp.float32)
    want = interpolate_spherical_batched(a, b, fract)
    got = slerp_pallas(a, b, fract, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_slerp_pallas_bf16():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.bfloat16)
    fract = jnp.asarray([0.25, 0.75], jnp.float32)
    got = slerp_pallas(a, b, fract, interpret=True)
    want = interpolate_spherical_batched(a, b, fract)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


def test_flash_dispatch_rules(monkeypatch):
    """_use_flash_attention gate: TPU-only, self-attention-only, unmasked,
    512-aligned, length threshold tunable via LB_FLASH_MIN (measured default
    1024 — the Pallas tile beats XLA at L=1024 too, BENCH.md)."""
    from latentblending_tpu.models import layers

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert layers._use_flash_attention(4096, 4096, None)
    assert layers._use_flash_attention(1024, 1024, None)
    assert not layers._use_flash_attention(512, 512, None)       # below default min
    assert not layers._use_flash_attention(4096, 77, None)       # cross-attention
    assert not layers._use_flash_attention(4096, 4096, object()) # masked
    assert not layers._use_flash_attention(1280, 1280, None)     # not 512-aligned
    monkeypatch.setenv("LB_FLASH_MIN", "512")
    assert layers._use_flash_attention(512, 512, None)
    monkeypatch.setenv("LB_FLASH_MIN", "2048")
    assert not layers._use_flash_attention(1024, 1024, None)
    monkeypatch.setenv("LB_FLASH", "0")
    assert not layers._use_flash_attention(4096, 4096, None)
    monkeypatch.delenv("LB_FLASH")
    monkeypatch.delenv("LB_FLASH_MIN")
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not layers._use_flash_attention(4096, 4096, None)
