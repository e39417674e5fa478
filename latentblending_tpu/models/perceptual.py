"""Weight-free perceptual distance: Normalized Laplacian Pyramid Distance.

Why this exists: the reference's branch-insertion policy is driven by LPIPS
(reference blending_engine.py:744-764), which needs the AlexNet backbone +
learned lin weights. In environments where those weights cannot be
obtained (this build environment has no network and no torchvision/lpips
caches), the only LPIPS option is a random-feature stand-in
(models/lpips.py init_random) — deterministic per seed but not a
principled perceptual metric, and its gap *ranking* can deviate from the
reference's.

NLPD (Laparra, Ballé, Berardino & Simoncelli, "Perceptual image quality
assessment using a normalized Laplacian pyramid", Electronic Imaging 2016)
is a published full-reference perceptual metric with NO learned
parameters: a Laplacian pyramid followed by divisive normalization by
local amplitude, compared level-by-level. It correlates strongly with
human judgments (and with LPIPS) on distortion benchmarks, and is fully
deterministic — the same keyframe gap ranking on every machine.

Usage: this is the engine DEFAULT whenever no LPIPS weights are supplied
(similarity_metric=None resolves to "nlpd" without weights, "lpips" with);
pass similarity_metric="lpips" explicitly to force the reference metric.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 5-tap binomial filter (the classic Burt-Adelson pyramid kernel, a=0.375)
_K5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _blur(x: jax.Array) -> jax.Array:
    """Separable 5-tap gaussian blur, depthwise, reflect padding. x: [B,H,W,C]."""
    c = x.shape[-1]
    kh = jnp.asarray(_K5).reshape(5, 1, 1, 1)
    kw = jnp.asarray(_K5).reshape(1, 5, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, (5, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        xp, jnp.tile(kh, (1, 1, 1, c)), (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        xp, jnp.tile(kw.reshape(1, 5, 1, 1), (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    return x


def _down2(x: jax.Array) -> jax.Array:
    return _blur(x)[:, ::2, ::2, :]


def _up2(x: jax.Array, hw: tuple[int, int]) -> jax.Array:
    b, h, w, c = x.shape
    y = jax.image.resize(x, (b, hw[0], hw[1], c), method="linear")
    return _blur(y)


def laplacian_pyramid(x: jax.Array, levels: int) -> list[jax.Array]:
    """Burt-Adelson Laplacian pyramid; last entry is the low-pass residual."""
    pyr = []
    for _ in range(levels - 1):
        down = _down2(x)
        pyr.append(x - _up2(down, x.shape[1:3]))
        x = down
    pyr.append(x)
    return pyr


@functools.partial(jax.jit, static_argnames=("levels",))
def nlpd_distance(img0: jax.Array, img1: jax.Array, levels: int = 5) -> jax.Array:
    """Normalized Laplacian Pyramid Distance. [B,H,W,3] in [-1,1] → [B].

    Per level: divisively normalize band coefficients by the local (blurred)
    amplitude, then take the RMS of the normalized difference; average the
    per-level RMS values (the 2016 paper's final norm with exponents 2,2).
    Luma-only, matching the metric's definition on luminance images.
    """
    # [-1,1] RGB → luminance in [0,1] (Rec. 601 weights)
    w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    y0 = (jnp.tensordot((img0.astype(jnp.float32) + 1.0) / 2.0, w, axes=[[-1], [0]]))[..., None]
    y1 = (jnp.tensordot((img1.astype(jnp.float32) + 1.0) / 2.0, w, axes=[[-1], [0]]))[..., None]
    p0 = laplacian_pyramid(y0, levels)
    p1 = laplacian_pyramid(y1, levels)
    c = 0.17  # stabilizer ~ mean band amplitude scale of natural images
    total = jnp.zeros((img0.shape[0],), jnp.float32)
    for b0, b1 in zip(p0, p1):
        sigma = 0.5 * (_blur(jnp.abs(b0)) + _blur(jnp.abs(b1)))
        n0 = b0 / (sigma + c)
        n1 = b1 / (sigma + c)
        total = total + jnp.sqrt(jnp.mean((n0 - n1) ** 2, axis=(1, 2, 3)) + 1e-12)
    return total / levels


class NLPDScorer:
    """Drop-in replacement for LPIPSScorer with zero learned weights.

    Same interface: distance(uint8 imgs) → float, distance_batch(device
    [-1,1] imgs) → [B], _prep for device staging.
    """

    def __init__(self, levels: int = 5, image_hw: tuple[int, int] | None = None):
        # image_hw accepted for interface parity; shapes are traced per call
        self.levels = int(levels)
        # jitted: the eager pyramid materializes every per-level temporary
        # on device (OOMs at 1024² gap counts) and pays one relay dispatch
        # per op; compiled it is one fused call with planned memory
        import jax

        self._fn = jax.jit(lambda a, b: nlpd_distance(a, b, levels=self.levels))

    @staticmethod
    def _prep(img) -> jnp.ndarray:
        # same uint8→[-1,1] staging as LPIPSScorer (shared implementation)
        from latentblending_tpu.models.lpips import LPIPSScorer

        return LPIPSScorer._prep(img)

    def distance(self, img_a, img_b) -> float:
        return float(self._fn(self._prep(img_a), self._prep(img_b))[0])

    def distance_batch(self, imgs_a: jax.Array, imgs_b: jax.Array) -> jax.Array:
        from latentblending_tpu.models.lpips import bucketed_pair_call

        return bucketed_pair_call(self._fn, imgs_a, imgs_b)
