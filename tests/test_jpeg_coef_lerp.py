"""JPEG coefficient-space frame interpolation (native/jpeg_coef_lerp.cpp).

The movie fill-up's in-between frames are pixel lerps of two keyframes
(reference utils.py:167-176). Because the DCT is linear and both keyframe
JPEGs share one quant table, the same frame can be encoded by lerping
quantized DCT coefficients and running only the Huffman pass. These tests
pin (a) the fidelity bound vs the pixel path and (b) that the movie writer
fast path produces the same movie structure with visually identical frames.
"""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

try:
    from latentblending_tpu.video._jpeg_lerp import JpegPair
except Exception:  # pragma: no cover - native toolchain missing
    JpegPair = None

pytestmark = pytest.mark.skipif(JpegPair is None, reason="native jpeg coef lerp unavailable")


def _smooth_frame(phase: float, hw: int = 256) -> np.ndarray:
    x, y = np.meshgrid(np.linspace(0, 6, hw), np.linspace(0, 6, hw))
    im = np.stack([np.sin(x + phase + i) + np.cos(y * 1.3 + phase * 0.7 + i) for i in range(3)], -1)
    im = ((im - im.min()) / (im.max() - im.min()) * 255).astype(np.uint8)
    rng = np.random.default_rng(int(phase * 100))
    return cv2.GaussianBlur(im + rng.integers(0, 14, im.shape).astype(np.uint8), (0, 0), 1.1)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float32) - b.astype(np.float32)) ** 2)
    return float(10 * np.log10(255.0**2 / max(mse, 1e-9)))


def _enc(img: np.ndarray, q: int = 90) -> bytes:
    ok, jpg = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR), [cv2.IMWRITE_JPEG_QUALITY, q])
    assert ok
    return jpg.tobytes()


def _dec(jpg: bytes) -> np.ndarray:
    return cv2.cvtColor(cv2.imdecode(np.frombuffer(jpg, np.uint8), cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)


def test_pair_lerp_fidelity_and_endpoints():
    a, b = _smooth_frame(0.0), _smooth_frame(2.0)
    ja, jb = _enc(a), _enc(b)
    da, db = _dec(ja).astype(np.float32), _dec(jb).astype(np.float32)
    with JpegPair(ja, jb) as pair:
        for t in (0.0, 0.25, 0.5, 0.75, 1.0):
            out = _dec(pair.lerp(t))
            # ground truth: pixel lerp of the DECODED keyframes — exactly
            # what the coefficient lerp represents, up to requantization
            ref = (1 - t) * da + t * db
            assert _psnr(out, ref) > 40.0, f"t={t}"
        # endpoints must reproduce the keyframes to within requant noise
        assert _psnr(_dec(pair.lerp(0.0)), da) > 45.0
        assert _psnr(_dec(pair.lerp(1.0)), db) > 45.0


def test_pair_lerp_matches_production_pixel_path():
    a, b = _smooth_frame(1.0), _smooth_frame(3.5)
    ja, jb = _enc(a), _enc(b)
    with JpegPair(ja, jb) as pair:
        out = _dec(pair.lerp(0.37))
    # the production pixel path lerps the RAW keyframes then JPEG-encodes;
    # the difference vs coefficient space is bounded by the keyframes' own
    # quantization noise
    pix = _dec(_enc((0.63 * a.astype(np.float32) + 0.37 * b.astype(np.float32)).astype(np.uint8)))
    assert _psnr(out, pix) > 38.0


def test_pair_open_rejects_mismatched_geometry():
    a = _smooth_frame(0.0, hw=256)
    b = _smooth_frame(1.0, hw=128)
    with pytest.raises(ValueError):
        JpegPair(_enc(a), _enc(b))


@pytest.mark.parametrize("gate", ["1", "0"])
def test_write_frames_interp_paths_agree(tmp_path, monkeypatch, gate):
    """The coef-lerp movie must match the pixel-path movie: same frame
    count, byte-identical keyframe samples, >38 dB on in-between frames."""
    from latentblending_tpu.video.frames import fillup_plan
    from latentblending_tpu.video.writer import MovieSaver, read_movie_frames, write_frames_interp

    monkeypatch.setenv("LB_WRITER", "mjpeg")
    keys = [_smooth_frame(p) for p in (0.0, 1.2, 2.4, 3.6)]
    target = 17

    monkeypatch.setenv("LB_COEF_LERP", gate)
    fp = str(tmp_path / f"m_{gate}.mp4")
    ms = MovieSaver(fp, fps=10, shape_hw=keys[0].shape[:2])
    write_frames_interp(ms, keys, target)
    ms.finalize()
    assert ms.nmb_frames == target
    frames = read_movie_frames(fp)
    assert len(frames) == target

    left, fract = fillup_plan(len(keys), target)
    for t in range(target):
        # read_movie_frames decodes via the video route (ffmpeg mjpeg),
        # whose IDCT/color rounding differs from cv2.imdecode by ~3 dB —
        # bars below are measured-route values minus margin.
        if fract[t] == 0.0:  # keyframe slot: same encoder params both paths
            assert _psnr(frames[t], _dec(_enc(keys[left[t]]))) > 40.0
        else:
            ref = (1 - fract[t]) * keys[left[t]].astype(np.float32) + fract[t] * keys[left[t] + 1].astype(np.float32)
            assert _psnr(frames[t], ref) > 33.0


def test_write_frames_interp_coef_vs_pixel_psnr(tmp_path, monkeypatch):
    from latentblending_tpu.video.writer import MovieSaver, read_movie_frames, write_frames_interp

    monkeypatch.setenv("LB_WRITER", "mjpeg")
    keys = [_smooth_frame(p) for p in (0.5, 1.7, 2.9)]
    movies = {}
    for gate in ("1", "0"):
        monkeypatch.setenv("LB_COEF_LERP", gate)
        fp = str(tmp_path / f"ab_{gate}.mp4")
        ms = MovieSaver(fp, fps=10, shape_hw=keys[0].shape[:2])
        write_frames_interp(ms, keys, 13)
        ms.finalize()
        movies[gate] = read_movie_frames(fp)
    assert len(movies["1"]) == len(movies["0"]) == 13
    for fa, fb in zip(movies["1"], movies["0"]):
        assert _psnr(fa, fb) > 35.0
