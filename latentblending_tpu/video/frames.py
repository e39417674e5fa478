"""Frame fill-up: expand K keyframes to exactly fps×duration frames by
linear interpolation.

Single implementation replacing the reference's two near-duplicates
(reference utils.py:105-178 and lunar_tools fill_up_frames_linear_interpolation
used at blending_engine.py:698 — SURVEY.md §3.6.10). The per-gap insert
counts come from ops/schedules.frame_insert_counts (deterministic, exact by
construction, vs the reference's rejection sampling utils.py:153-164).
"""
from __future__ import annotations

import numpy as np

from latentblending_tpu.ops.schedules import frame_insert_counts

try:  # optional native kernel (C++ SIMD lerp), built from native/
    from latentblending_tpu.video._native import lerp_frames_u8 as _native_lerp
except Exception:  # pragma: no cover
    _native_lerp = None


def _lerp_u8(img0_f32: np.ndarray, img1_f32: np.ndarray, fract: float) -> np.ndarray:
    out = (1.0 - fract) * img0_f32 + fract * img1_f32
    return np.clip(out, 0, 255).astype(np.uint8)


def add_frames_linear_interp(
    list_imgs: list,
    fps_target: float | None = None,
    duration_target: float | None = None,
    nmb_frames_target: int | None = None,
) -> list[np.ndarray]:
    """Returns a list of exactly nmb_frames_target (or fps×duration) uint8
    frames, keyframes preserved in order."""
    if nmb_frames_target is not None and fps_target is not None:
        raise ValueError("You cannot specify both fps_target and nmb_frames_target")
    if nmb_frames_target is None:
        if fps_target is None or duration_target is None:
            raise ValueError("Specify duration_target and fps_target OR nmb_frames_target")
        nmb_frames_target = int(round(fps_target * duration_target))

    imgs = [np.asarray(im) for im in list_imgs]
    K = len(imgs)
    if nmb_frames_target <= K:
        return [im.astype(np.uint8) for im in imgs]

    counts = frame_insert_counts(K, nmb_frames_target)
    if _native_lerp is not None:
        return _native_lerp(imgs, counts)

    imgs_f = [im.astype(np.float32) for im in imgs]
    out: list[np.ndarray] = []
    for i in range(K - 1):
        out.append(imgs[i].astype(np.uint8))
        fracts = np.linspace(0, 1, counts[i] + 2)[1:-1]
        for f in fracts:
            out.append(_lerp_u8(imgs_f[i], imgs_f[i + 1], float(f)))
    out.append(imgs[-1].astype(np.uint8))
    assert len(out) == nmb_frames_target
    return out
