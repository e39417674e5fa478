import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.ops import (
    interpolate_linear,
    interpolate_linear_pytree,
    interpolate_spherical,
    interpolate_spherical_batched,
)


def _np_slerp(p0, p1, fract):
    """Float64 reference implementation of the slerp formula
    (mirrors reference utils.py:30-71)."""
    a = p0.astype(np.float64).ravel()
    b = p1.astype(np.float64).ravel()
    norm = np.linalg.norm(a) * np.linalg.norm(b)
    dot = np.clip(np.sum(a * b) / norm, -1 + 1e-7, 1 - 1e-7)
    theta0 = np.arccos(dot)
    s0 = np.sin(theta0 * (1 - fract)) / np.sin(theta0)
    s1 = np.sin(theta0 * fract) / np.sin(theta0)
    return (s0 * a + s1 * b).reshape(p0.shape)


def test_slerp_endpoints():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    p1 = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    np.testing.assert_allclose(interpolate_spherical(jnp.array(p0), jnp.array(p1), 0.0), p0, atol=1e-5)
    np.testing.assert_allclose(interpolate_spherical(jnp.array(p0), jnp.array(p1), 1.0), p1, atol=1e-5)


@pytest.mark.parametrize("fract", [0.1, 0.5, 0.9])
def test_slerp_matches_reference_formula(fract):
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    p1 = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    got = np.asarray(interpolate_spherical(jnp.array(p0), jnp.array(p1), fract))
    want = _np_slerp(p0, p1, fract)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_slerp_norm_preservation():
    """Slerp of two equal-norm gaussians should roughly preserve norm
    (the property that motivates slerp over lerp for latents)."""
    rng = np.random.default_rng(2)
    p0 = rng.normal(size=(4096,)).astype(np.float32)
    p1 = rng.normal(size=(4096,)).astype(np.float32)
    mid = np.asarray(interpolate_spherical(jnp.array(p0), jnp.array(p1), 0.5))
    ratio = np.linalg.norm(mid) / np.linalg.norm(p0)
    assert 0.9 < ratio < 1.1


def test_slerp_batched_matches_per_element():
    rng = np.random.default_rng(3)
    p0 = rng.normal(size=(3, 8, 8, 4)).astype(np.float32)
    p1 = rng.normal(size=(3, 8, 8, 4)).astype(np.float32)
    fract = np.array([0.2, 0.5, 0.8], np.float32)
    got = np.asarray(interpolate_spherical_batched(jnp.array(p0), jnp.array(p1), jnp.array(fract)))
    for i in range(3):
        want = _np_slerp(p0[i], p1[i], fract[i])
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_slerp_bf16_roundtrip():
    rng = np.random.default_rng(4)
    p0 = jnp.array(rng.normal(size=(1, 8, 8, 4)), jnp.bfloat16)
    p1 = jnp.array(rng.normal(size=(1, 8, 8, 4)), jnp.bfloat16)
    out = interpolate_spherical(p0, p1, 0.3)
    assert out.dtype == jnp.bfloat16


def test_lerp_uint8_roundtrip():
    a = np.zeros((4, 4, 3), np.uint8)
    b = np.full((4, 4, 3), 255, np.uint8)
    mid = interpolate_linear(a, b, 0.5)
    assert mid.dtype == np.uint8
    assert np.all(mid == 127)


def test_lerp_pytree():
    t0 = {"x": jnp.zeros((2, 3)), "y": jnp.ones((4,))}
    t1 = {"x": jnp.ones((2, 3)), "y": jnp.full((4,), 3.0)}
    out = interpolate_linear_pytree(t0, t1, 0.5)
    np.testing.assert_allclose(out["x"], 0.5)
    np.testing.assert_allclose(out["y"], 2.0)
