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
    from latentblending_tpu.video._native import lerp_into as _native_lerp_into
except Exception:  # pragma: no cover
    _native_lerp = None
    _native_lerp_into = None


def _lerp_u8(img0_f32: np.ndarray, img1_f32: np.ndarray, fract: float) -> np.ndarray:
    out = (1.0 - fract) * img0_f32 + fract * img1_f32
    return np.clip(out, 0, 255).astype(np.uint8)


def fillup_plan(nmb_keyframes: int, nmb_frames_target: int) -> tuple[np.ndarray, np.ndarray]:
    """(left_index[T], fract[T]) describing every output frame as a lerp of
    keyframes left_index[t] and left_index[t]+1."""
    counts = frame_insert_counts(nmb_keyframes, nmb_frames_target)
    left, fract = [], []
    for i in range(nmb_keyframes - 1):
        left.append(i)
        fract.append(0.0)
        fr = np.linspace(0, 1, counts[i] + 2)[1:-1]
        left.extend([i] * len(fr))
        fract.extend(fr.tolist())
    left.append(nmb_keyframes - 1)
    fract.append(0.0)
    return np.asarray(left, np.int32), np.asarray(fract, np.float32)


def stream_frames_lazy(handles: list, nmb_frames_target: int, resolve):
    """Streaming fill-up over LAZILY-resolved keyframes.

    `resolve(handle) -> uint8 HWC array` is called the first time a keyframe
    is needed, strictly left-to-right — so when keyframes are still
    materializing (device→host copies in flight), frame lerping and encoding
    of earlier gaps overlap the transfers of later ones. This is the engine
    of BlendingEngine.run_movie_transition's compute/write pipeline.

    One reused output buffer (zero per-frame allocation); the yielded array
    is reused — consumers must copy if they retain it. Frame values are
    identical to the eager path by construction (same plan, same lerp).
    """
    K = len(handles)
    if nmb_frames_target <= K:
        for h in handles:
            yield np.ascontiguousarray(np.asarray(resolve(h)), dtype=np.uint8)
        return
    counts = frame_insert_counts(K, nmb_frames_target)
    cur = np.ascontiguousarray(np.asarray(resolve(handles[0])), dtype=np.uint8)
    buf = np.empty_like(cur)
    cur_f = None if _native_lerp_into is not None else cur.astype(np.float32)
    for i in range(K - 1):
        nxt = np.ascontiguousarray(np.asarray(resolve(handles[i + 1])), dtype=np.uint8)
        yield cur
        fracts = np.linspace(0, 1, counts[i] + 2)[1:-1]
        if _native_lerp_into is not None:
            for f in fracts:
                yield _native_lerp_into(cur, nxt, float(f), buf)
        else:
            nxt_f = nxt.astype(np.float32)
            for f in fracts:
                yield _lerp_u8(cur_f, nxt_f, float(f))
            cur_f = nxt_f
        cur = nxt
    yield cur


def stream_frames_linear_interp(list_imgs: list, nmb_frames_target: int):
    """Generator over interpolated frames using ONE reused output buffer.

    This is the zero-allocation streaming path for movie writing: materially
    faster than building the full frame list on hosts where first-touch
    pages are expensive (the 360-frame list costs ~283MB of fresh pages).
    The yielded array is reused — consumers must copy if they retain it.
    """
    yield from stream_frames_lazy(list_imgs, nmb_frames_target, lambda im: im)


def add_frames_linear_interp_device(
    list_imgs: list, nmb_frames_target: int, chunk: int = 90
) -> list[np.ndarray]:
    """Device-side frame fill-up: the whole interpolation runs as batched
    lerps on the accelerator; the host receives ready uint8 frames in one
    transfer per chunk. This removes the reference's host-side hot loop
    (utils.py:167-176) from the critical path entirely."""
    import jax
    import jax.numpy as jnp

    K = len(list_imgs)
    if nmb_frames_target <= K:
        return [np.asarray(im).astype(np.uint8) for im in list_imgs]
    left, fract = fillup_plan(K, nmb_frames_target)
    keys = jnp.asarray(np.stack([np.asarray(im) for im in list_imgs]), jnp.float32)

    @jax.jit
    def lerp_chunk(keys, li, fr):
        a = keys[li]
        b = keys[jnp.minimum(li + 1, K - 1)]
        out = a * (1.0 - fr)[:, None, None, None] + b * fr[:, None, None, None]
        return jnp.clip(out + 0.5, 0.0, 255.0).astype(jnp.uint8)

    frames: list[np.ndarray] = []
    T = len(left)
    for s in range(0, T, chunk):
        li = jnp.asarray(left[s : s + chunk])
        fr = jnp.asarray(fract[s : s + chunk])
        # pad the tail chunk to keep one compiled shape
        pad = chunk - li.shape[0]
        if pad and T > chunk:
            li = jnp.concatenate([li, jnp.zeros(pad, jnp.int32)])
            fr = jnp.concatenate([fr, jnp.zeros(pad, jnp.float32)])
            arr = np.asarray(lerp_chunk(keys, li, fr))[: -pad or None]
        else:
            arr = np.asarray(lerp_chunk(keys, li, fr))
        frames.extend(arr[i] for i in range(arr.shape[0]))
    return frames


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
