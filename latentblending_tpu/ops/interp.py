"""Interpolation primitives: spherical / linear latent mixing.

TPU-native redesign of the reference's interpolation helpers
(reference: latentblending/utils.py:30-102). Differences, by design:

- The reference upcasts to float64 for the slerp angle math
  (utils.py:52). float64 is emulated (slow) on TPU; we accumulate the
  dot/norm in float32 which is numerically ample for unit-scale latents,
  and keep the same 1e-7 epsilon clamp (utils.py:56-57).
- Everything here is a pure jittable function over arrays; batched
  variants treat the leading axis as independent elements so a whole
  level of sibling branches mixes in one fused XLA/Pallas call.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-7


def _slerp_weights(dot: jax.Array, fract: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Spherical interpolation weights (s0, s1) from a cosine and a fraction.

    Matches the formula of reference utils.py:59-63 with an epsilon-clamped
    dot product.
    """
    dot = jnp.clip(dot, -1.0 + _EPS, 1.0 - _EPS)
    theta_0 = jnp.arccos(dot)
    sin_theta_0 = jnp.sin(theta_0)
    theta_t = theta_0 * fract
    s0 = jnp.sin(theta_0 - theta_t) / sin_theta_0
    s1 = jnp.sin(theta_t) / sin_theta_0
    return s0, s1


def interpolate_spherical(p0: jax.Array, p1: jax.Array, fract_mixing) -> jax.Array:
    """Slerp between two equally-shaped arrays, treating them as one flat vector.

    Drop-in equivalent of reference utils.py:30-71 (whole-tensor norm/dot,
    result recast to the input dtype). fract_mixing may be a python float or
    a traced scalar.
    """
    out_dtype = p0.dtype
    a = p0.astype(jnp.float32)
    b = p1.astype(jnp.float32)
    # zero-norm guard: a zero operand degrades to dot=0 (θ=π/2) instead of NaN
    norm = jnp.maximum(jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-20)
    dot = jnp.sum(a * b) / norm
    s0, s1 = _slerp_weights(dot, jnp.asarray(fract_mixing, jnp.float32))
    return (a * s0 + b * s1).astype(out_dtype)


def interpolate_spherical_batched(p0: jax.Array, p1: jax.Array, fract: jax.Array) -> jax.Array:
    """Per-element slerp over the leading batch axis.

    p0, p1: [B, ...]; fract: [B] (or broadcastable). Each batch element is
    slerped independently with its own fraction — this is the fused form of
    the reference's per-branch python loop (blending_engine.py:443-450).
    """
    out_dtype = p0.dtype
    a = p0.astype(jnp.float32)
    b = p1.astype(jnp.float32)
    red = tuple(range(1, a.ndim))
    norm = jnp.maximum(jnp.sqrt(jnp.sum(a * a, axis=red) * jnp.sum(b * b, axis=red)), 1e-20)
    dot = jnp.sum(a * b, axis=red) / norm
    s0, s1 = _slerp_weights(dot, fract.astype(jnp.float32))
    bshape = (-1,) + (1,) * (a.ndim - 1)
    return (a * s0.reshape(bshape) + b * s1.reshape(bshape)).astype(out_dtype)


def interpolate_linear(p0, p1, fract_mixing):
    """Lerp; mirrors reference utils.py:74-102 incl. the uint8 round-trip."""
    if isinstance(p0, np.ndarray) and p0.dtype == np.uint8:
        a = p0.astype(np.float32)
        b = np.asarray(p1, np.float32)
        out = (1.0 - fract_mixing) * a + fract_mixing * b
        return np.clip(out, 0, 255).astype(np.uint8)
    return (1.0 - fract_mixing) * p0 + fract_mixing * p1


@functools.partial(jax.jit, static_argnames=())
def _lerp_pytree(t0, t1, fract):
    return jax.tree_util.tree_map(
        lambda a, b: ((1.0 - fract) * a.astype(jnp.float32) + fract * b.astype(jnp.float32)).astype(a.dtype),
        t0,
        t1,
    )


def interpolate_linear_pytree(t0, t1, fract_mixing) -> object:
    """Lerp every leaf of two matching pytrees (used for conditioning mixes,
    reference blending_engine.py:643-654)."""
    return _lerp_pytree(t0, t1, jnp.asarray(fract_mixing, jnp.float32))
