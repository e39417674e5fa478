"""Pallas TPU kernels for the hot mixing math.

The crossfeed slerp runs inside the denoise scan once per step for the whole
stem batch (runtime/denoise.py). In stock XLA it lowers to two reduction
kernels (norms/dot) plus an elementwise map — three HBM round-trips over the
latents. The Pallas kernel fuses the whole slerp into ONE pass per batch
element: block = one stem's full latent in VMEM, reductions and the angular
mix computed in-register.

Layout contract: latents are flattened to [B, S] and padded to S % 128 == 0
(zero padding is exact: it adds nothing to the dot/norm sums and padded
outputs are sliced away).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-7
_LANE = 128


def _atan_poly(x):
    """Cephes single-precision atan for x >= 0 (~1e-7 max error).

    Mosaic lowers sin/cos/sqrt but not the inverse trig family, so acos is
    built from this polynomial via acos(d) = atan2(sqrt(1-d²), d).
    """
    big = x > 2.414213562373095  # tan(3π/8)
    mid = x > 0.4142135623730950  # tan(π/8)
    y = jnp.where(big, jnp.pi / 2, jnp.where(mid, jnp.pi / 4, 0.0))
    safe = jnp.maximum(x, 1e-30)
    xr = jnp.where(big, -1.0 / safe, jnp.where(mid, (x - 1.0) / (x + 1.0), x))
    z = xr * xr
    p = (((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z - 3.33329491539e-1) * z * xr + xr
    return y + p


def _acos(d):
    """acos for d in (-1, 1): atan2(s, d) with s = sqrt(1-d²) >= 0."""
    s = jnp.sqrt(jnp.maximum(1.0 - d * d, 0.0))
    pos = _atan_poly(s / jnp.abs(d))
    return jnp.where(d >= 0, pos, jnp.pi - pos)


def _slerp_kernel(fract_ref, a_ref, b_ref, out_ref):
    a = a_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    na = jnp.sum(a * a)
    nb = jnp.sum(b * b)
    dot = jnp.sum(a * b) / jnp.maximum(jnp.sqrt(na * nb), 1e-20)
    dot = jnp.clip(dot, -1.0 + _EPS, 1.0 - _EPS)
    theta0 = _acos(dot)
    sin0 = jnp.sin(theta0)
    fract = fract_ref[pl.program_id(0)]
    theta_t = theta0 * fract
    s0 = jnp.sin(theta0 - theta_t) / sin0
    s1 = jnp.sin(theta_t) / sin0
    out_ref[...] = (a * s0 + b * s1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def slerp_pallas(a: jax.Array, b: jax.Array, fract: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched spherical interpolation: a, b [B, ...]; fract [B].

    Semantically identical to ops.interp.interpolate_spherical_batched.
    """
    orig_shape = a.shape
    B = orig_shape[0]
    S = 1
    for d in orig_shape[1:]:
        S *= d
    pad = (-S) % _LANE
    af = a.reshape(B, S)
    bf = b.reshape(B, S)
    if pad:
        af = jnp.pad(af, ((0, 0), (0, pad)))
        bf = jnp.pad(bf, ((0, 0), (0, pad)))
    rows = (S + pad) // _LANE
    af = af.reshape(B, rows, _LANE)
    bf = bf.reshape(B, rows, _LANE)

    out = pl.pallas_call(
        _slerp_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, _LANE), a.dtype),
        interpret=interpret,
    )(fract.astype(jnp.float32), af, bf)

    out = out.reshape(B, S + pad)
    if pad:
        out = out[:, :S]
    return out.reshape(orig_shape)


def slerp_batched_auto(a: jax.Array, b: jax.Array, fract: jax.Array) -> jax.Array:
    """Dispatch: Pallas on TPU, pure-JAX elsewhere (same math)."""
    from latentblending_tpu.ops.interp import interpolate_spherical_batched

    platform = jax.default_backend()
    if platform == "tpu":
        return slerp_pallas(a, b, fract)
    return interpolate_spherical_batched(a, b, fract)
