"""LPIPS perceptual similarity (AlexNet backbone), pure JAX.

The reference uses the `lpips` torch package as BOTH the branch-insertion
policy metric and the output-fidelity judge (reference
blending_engine.py:74-76, :744-764). This is the same computation:

  input [-1,1] → fixed shift/scale → AlexNet conv taps relu1..relu5 →
  per-tap channel-unit-normalize → squared diff → learned 1x1 conv (lin) →
  spatial mean → sum over taps.

Weight loading: convert_lpips_state_dict maps the torch `lpips` package's
state dict (net.sliceK.i.*, linK.model.1.*) onto this module; for
weightless environments init_random gives a structurally-identical metric
(still a valid perceptual-style distance for *relative* gap ranking, which
is all the insertion policy needs — documented deviation until real
weights are supplied).
"""
from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from flax.traverse_util import unflatten_dict

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (name, out_ch, kernel, stride, pad, maxpool_before)
_ALEX = [
    ("conv1", 64, 11, 4, 2, False),
    ("conv2", 192, 5, 1, 2, True),
    ("conv3", 384, 3, 1, 1, True),
    ("conv4", 256, 3, 1, 1, False),
    ("conv5", 256, 3, 1, 1, False),
]


class LPIPS(nn.Module):
    """__call__(img0, img1): both [B,H,W,3] in [-1,1] → [B] distances."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img0: jax.Array, img1: jax.Array) -> jax.Array:
        convs = [
            nn.Conv(ch, (k, k), strides=(s, s), padding=((p, p), (p, p)), dtype=self.dtype, name=name)
            for name, ch, k, s, p, _ in _ALEX
        ]
        lins = [nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin{i}") for i in range(len(_ALEX))]

        def features(x):
            x = (x - _SHIFT) / _SCALE
            taps = []
            for conv, (_, _, _, _, _, pool) in zip(convs, _ALEX):
                if pool:
                    x = nn.max_pool(x, (3, 3), strides=(2, 2))
                x = nn.relu(conv(x))
                taps.append(x)
            return taps

        t0 = features(img0.astype(self.dtype))
        t1 = features(img1.astype(self.dtype))
        total = jnp.zeros((img0.shape[0],), jnp.float32)
        for lin, f0, f1 in zip(lins, t0, t1):
            n0 = f0 / (jnp.sqrt(jnp.sum(f0**2, axis=-1, keepdims=True)) + 1e-10)
            n1 = f1 / (jnp.sqrt(jnp.sum(f1**2, axis=-1, keepdims=True)) + 1e-10)
            w = lin((n0 - n1) ** 2)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def convert_lpips_state_dict(state: dict[str, np.ndarray]) -> dict:
    """torch `lpips` package state dict → LPIPS flax params."""
    slice_map = {
        "net.slice1.0": "conv1",
        "net.slice2.3": "conv2",
        "net.slice3.6": "conv3",
        "net.slice4.8": "conv4",
        "net.slice5.10": "conv5",
    }
    flat = {}
    for k, v in state.items():
        v = np.asarray(v)
        for prefix, name in slice_map.items():
            if k == f"{prefix}.weight":
                flat[(name, "kernel")] = jnp.asarray(v.transpose(2, 3, 1, 0))
            elif k == f"{prefix}.bias":
                flat[(name, "bias")] = jnp.asarray(v)
        for i in range(5):
            if k == f"lin{i}.model.1.weight":
                flat[(f"lin{i}", "kernel")] = jnp.asarray(v.transpose(2, 3, 1, 0))
    return unflatten_dict(flat)


def load_lpips_torch_file(path: str) -> dict:
    """Load an `lpips` package checkpoint (.pth) — requires torch (CPU ok).

    Note: the official lpips checkpoint ships only the lin layers; the
    AlexNet backbone comes from torchvision. Pass a merged state dict or a
    full dump of lpips.LPIPS(net='alex').state_dict()."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return convert_lpips_state_dict({k: v.numpy() for k, v in state.items()})


def _pair_chunk_limit(imgs: jax.Array) -> int | None:
    """HBM guard for the metric pass: at 1024² a 16-pair bucket plus the
    multi-scale intermediates overflows the ~16 GB chip (7 GB of it
    params + tree residency) — cap the pair batch instead of padding the
    whole gap count up to one bucket. ≤512² stays unchunked (measured
    fine)."""
    h, w = imgs.shape[1], imgs.shape[2]
    return 4 if (h * w) > 512 * 512 else None


def bucketed_pair_call(fn, imgs_a: jax.Array, imgs_b: jax.Array) -> jax.Array:
    """Pad an image-pair batch up to a power-of-two bucket, apply fn, slice
    back. Bounds the compiled-variant count to ≤ log2(B)+1 as the tree's
    gap count grows (shared by LPIPSScorer and NLPDScorer). Large frames
    additionally process in fixed-size chunks (_pair_chunk_limit) so peak
    memory stays bounded as the tree grows."""
    n = imgs_a.shape[0]
    limit = _pair_chunk_limit(imgs_a)
    if limit is not None and n > limit:
        return jnp.concatenate(
            [
                bucketed_pair_call(fn, imgs_a[i : i + limit], imgs_b[i : i + limit])
                for i in range(0, n, limit)
            ]
        )
    bucket = 1
    while bucket < n:
        bucket *= 2
    if bucket != n:
        pad = bucket - n
        imgs_a = jnp.concatenate([imgs_a, jnp.repeat(imgs_a[-1:], pad, axis=0)], axis=0)
        imgs_b = jnp.concatenate([imgs_b, jnp.repeat(imgs_b[-1:], pad, axis=0)], axis=0)
        return fn(imgs_a, imgs_b)[:n]
    return fn(imgs_a, imgs_b)


class LPIPSScorer:
    """Jitted convenience wrapper: uint8 numpy images → float distance.

    The backbone computes in float32: measured on TPU, a bf16 backbone gave
    no end-to-end speedup (the LPIPS phase is transfer-bound, not
    compute-bound), so full precision is kept for deterministic policy."""

    def __init__(self, params=None, image_hw: tuple[int, int] | None = None, seed: int = 0, dtype=jnp.float32):
        self.model = LPIPS(dtype=dtype)
        if params is None:
            h, w = image_hw or (64, 64)
            params = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3))
            )["params"]
            # random lins can be negative; LPIPS lins are non-negative — clamp
            params = jax.tree_util.tree_map(jnp.abs, params)
        self.params = params
        self._fn = jax.jit(lambda p, a, b: self.model.apply({"params": p}, a, b))

    @staticmethod
    def _prep(img: np.ndarray) -> jnp.ndarray:
        x = jnp.asarray(np.asarray(img), jnp.float32) / 255.0 * 2.0 - 1.0
        if x.ndim == 3:
            x = x[None]
        return x

    def distance(self, img_a, img_b) -> float:
        return float(self._fn(self.params, self._prep(img_a), self._prep(img_b))[0])

    def distance_batch(self, imgs_a: jax.Array, imgs_b: jax.Array) -> jax.Array:
        """[B,H,W,3] in [-1,1] pairs → [B] distances (stays on device)."""
        return bucketed_pair_call(lambda a, b: self._fn(self.params, a, b), imgs_a, imgs_b)
