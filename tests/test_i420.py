"""I420 keyframe path (VERDICT r3 task 3): device-side RGB→YCbCr 4:2:0
conversion, raw-mode native JPEG encode, and the movie A/B PSNR bound.

The movie path's keyframes ship device→host as packed I420 planes —
1.5 B/px instead of 3 — and the native encoder (libjpeg raw-data mode)
consumes them without any host color conversion. Reference output-path
anchor: /root/reference/latentblending/blending_engine.py:684-706.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from latentblending_tpu.video.i420 import i420_hw, i420_to_rgb, is_i420, rgb_to_i420, to_rgb


def _psnr(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    return float("inf") if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


def _smooth(h, w, seed=0):
    """Natural-image stand-in: smooth 2-D gradients per channel."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    chans = [
        127.5 + 100 * np.sin(xx / w * (2 + rng.random()) + rng.random() * 6)
        * np.cos(yy / h * (2 + rng.random()))
        for _ in range(3)
    ]
    return np.clip(np.stack(chans, axis=-1), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- pure math


def test_device_conversion_matches_host_reference():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (2, 32, 48, 3), dtype=np.uint8)
    pm1 = jnp.asarray(rgb, jnp.float32) / 255.0 * 2.0 - 1.0
    from latentblending_tpu.runtime.holder import SDXLHolder

    dev = np.asarray(SDXLHolder.to_i420_device(pm1))
    assert dev.shape == (2, 48, 48) and dev.dtype == np.uint8
    for b in range(2):
        host = rgb_to_i420(rgb[b])
        # float32 pm1 round-trip can move a value across a .5 boundary
        diff = np.abs(dev[b].astype(np.int16) - host.astype(np.int16))
        assert diff.max() <= 1, f"batch {b}: max plane diff {diff.max()}"


def test_i420_helpers():
    rgb = _smooth(16, 32)
    arr = rgb_to_i420(rgb)
    assert is_i420(arr) and not is_i420(rgb)
    assert i420_hw(arr) == (16, 32)
    back = to_rgb(arr)
    assert back.shape == rgb.shape
    np.testing.assert_array_equal(to_rgb(rgb), rgb)  # RGB passes through


def test_roundtrip_psnr_bounds():
    """Chroma subsampling is the only loss: luma-exact, high PSNR on
    smooth content, bounded even on pure noise."""
    smooth = _smooth(64, 64)
    back = i420_to_rgb(rgb_to_i420(smooth))
    assert _psnr(smooth, back) > 38.0

    rng = np.random.default_rng(2)
    noise = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    nb = i420_to_rgb(rgb_to_i420(noise))
    assert _psnr(noise, nb) > 12.0  # worst case: uncorrelated chroma
    # grayscale content survives exactly (zero chroma)
    gray = np.repeat(rng.integers(0, 256, (32, 32, 1), dtype=np.uint8), 3, axis=2)
    gb = i420_to_rgb(rgb_to_i420(gray))
    assert np.abs(gb.astype(int) - gray.astype(int)).max() <= 1


# ------------------------------------------------------------ native encode


def _cv2():
    return pytest.importorskip("cv2")


def test_encode_i420_decodes_to_the_same_image():
    cv2 = _cv2()
    from latentblending_tpu.video._jpeg_lerp import encode_i420

    rgb = _smooth(64, 64, seed=3)
    arr = rgb_to_i420(rgb)
    jpg = encode_i420(arr, 64, 64, quality=92)
    dec = cv2.imdecode(np.frombuffer(jpg, np.uint8), cv2.IMREAD_COLOR)
    dec = cv2.cvtColor(dec, cv2.COLOR_BGR2RGB)
    assert dec.shape == (64, 64, 3)
    assert _psnr(dec, i420_to_rgb(arr)) > 33.0  # JPEG q92 quantization only


def test_encode_i420_rejects_bad_width():
    from latentblending_tpu.video._jpeg_lerp import encode_i420

    arr = rgb_to_i420(_smooth(32, 40))  # 40 % 16 != 0
    with pytest.raises(ValueError, match="geometry"):
        encode_i420(arr, 40, 32, quality=90)


def test_jpegpair_accepts_i420_and_pixel_encoded_mix():
    """jl_encode_i420 uses the pixel encoder's exact sampling + quality
    tables, so the coefficient-lerp pair check accepts mixed pairs."""
    from latentblending_tpu.video._jpeg_lerp import JpegPair, encode_i420
    from latentblending_tpu.video.mjpeg_mp4 import MjpegMp4Writer

    rgb_a, rgb_b = _smooth(64, 64, seed=4), _smooth(64, 64, seed=5)
    w = MjpegMp4Writer("/tmp/_lb_i420_probe.mp4", shape_hw=(64, 64), quality=90)
    j_pixel = w.encode_frame(rgb_a)
    j_raw = encode_i420(rgb_to_i420(rgb_b), 64, 64, quality=90)
    pair = JpegPair(j_pixel, j_raw)
    mid = pair.lerp(0.5)
    pair.close()
    cv2 = _cv2()
    dec = cv2.cvtColor(cv2.imdecode(np.frombuffer(mid, np.uint8), cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    ref = 0.5 * rgb_a.astype(np.float32) + 0.5 * rgb_b.astype(np.float32)
    assert _psnr(dec, ref) > 28.0


# ---------------------------------------------------------- writer + engine


def test_write_frames_interp_with_i420_handles(tmp_path, monkeypatch):
    """I420 keyframe handles stream through the MJPEG coef path; the movie
    decodes close to the RGB-handle movie (PSNR-bounded A/B)."""
    monkeypatch.setenv("LB_WRITER", "mjpeg")
    monkeypatch.setenv("LB_COEF_LERP", "1")
    from latentblending_tpu.video.writer import MovieSaver, read_movie_frames, write_frames_interp

    kfs_rgb = [_smooth(64, 64, seed=s) for s in range(4)]
    kfs_i420 = [rgb_to_i420(k) for k in kfs_rgb]

    fp_a, fp_b = str(tmp_path / "rgb.mp4"), str(tmp_path / "i420.mp4")
    ms = MovieSaver(fp_a, fps=10, shape_hw=(64, 64))
    write_frames_interp(ms, kfs_rgb, 20)
    ms.finalize()
    ms = MovieSaver(fp_b, fps=10, shape_hw=(64, 64))
    write_frames_interp(ms, kfs_i420, 20)
    ms.finalize()

    fa, fb = read_movie_frames(fp_a), read_movie_frames(fp_b)
    assert len(fa) == len(fb) == 20
    for a, b in zip(fa, fb):
        assert _psnr(a, b) > 32.0


def test_write_frames_interp_i420_odd_width_falls_back(tmp_path, monkeypatch):
    """W % 16 != 0: I420 handles are converted to RGB up front — still a
    correct movie."""
    monkeypatch.setenv("LB_WRITER", "mjpeg")
    monkeypatch.setenv("LB_COEF_LERP", "1")
    from latentblending_tpu.video.writer import MovieSaver, read_movie_frames, write_frames_interp

    kfs = [rgb_to_i420(_smooth(32, 40, seed=s)) for s in range(3)]
    fp = str(tmp_path / "odd.mp4")
    ms = MovieSaver(fp, fps=10, shape_hw=(32, 40))
    write_frames_interp(ms, kfs, 9)
    ms.finalize()
    assert len(read_movie_frames(fp)) == 9


@pytest.mark.slow
def test_run_movie_transition_i420_ab(tmp_path, monkeypatch):
    """End-to-end A/B on the tiny engine: the default I420 fetch produces a
    movie PSNR-close to the RGB-fetch movie, and tree_final_imgs stays RGB."""
    from latentblending_tpu.engine.blending import BlendingEngine
    from latentblending_tpu.runtime.holder import SDXLHolder
    from latentblending_tpu.video.writer import read_movie_frames

    dh = SDXLHolder.from_random("tiny-turbo", seed=0, dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_prompt1("a forest")
    be.set_prompt2("a city")
    be.set_branching(nmb_max_branches=4)

    fp_rgb = str(tmp_path / "rgb.mp4")
    fp_i420 = str(tmp_path / "i420.mp4")
    monkeypatch.setenv("LB_KEYFRAME_I420", "0")
    imgs_rgb = be.run_movie_transition(fp_rgb, duration_transition=1.0, fixed_seeds=[5, 6])
    imgs_rgb = [np.asarray(im).copy() for im in imgs_rgb]
    monkeypatch.setenv("LB_KEYFRAME_I420", "1")
    imgs_i420 = be.run_movie_transition(fp_i420, duration_transition=1.0, fixed_seeds=[5, 6])

    # public API contract: keyframes are RGB HWC either way. Random-weight
    # model outputs are noise-like — the worst case for chroma subsampling
    # (~23 dB measured; pure noise bounds at ~12 dB, smooth content at
    # >38 dB per test_roundtrip_psnr_bounds) — so the e2e bound is loose;
    # real-weight outputs sit near the smooth-content bound.
    for a, b in zip(imgs_rgb, imgs_i420):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape and a.ndim == 3 and a.shape[2] == 3
        assert _psnr(a, b) > 20.0

    fa, fb = read_movie_frames(fp_rgb), read_movie_frames(fp_i420)
    assert len(fa) == len(fb) == 30
    for a, b in zip(fa, fb):
        assert _psnr(a, b) > 20.0
