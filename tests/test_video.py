import numpy as np
import pytest

from latentblending_tpu.video.frames import add_frames_linear_interp
from latentblending_tpu.video.writer import MovieSaver, concatenate_movies, read_movie_frames


def _imgs(k, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, (h, w, 3)).astype(np.uint8) for _ in range(k)]


def test_fillup_exact_count():
    imgs = _imgs(5)
    out = add_frames_linear_interp(imgs, fps_target=30, duration_target=2.0)
    assert len(out) == 60
    np.testing.assert_array_equal(out[0], imgs[0])
    np.testing.assert_array_equal(out[-1], imgs[-1])
    assert all(f.dtype == np.uint8 for f in out)


def test_fillup_nmb_frames_target():
    imgs = _imgs(3)
    out = add_frames_linear_interp(imgs, nmb_frames_target=17)
    assert len(out) == 17


def test_fillup_rejects_both_args():
    with pytest.raises(ValueError):
        add_frames_linear_interp(_imgs(3), fps_target=30, nmb_frames_target=17)


def test_fillup_noop_when_enough():
    imgs = _imgs(10)
    out = add_frames_linear_interp(imgs, nmb_frames_target=5)
    assert len(out) == 10


def test_movie_roundtrip(tmp_path):
    fp = str(tmp_path / "m.mp4")
    imgs = _imgs(12, 64, 48)
    ms = MovieSaver(fp, fps=6, shape_hw=(64, 48))
    for im in imgs:
        ms.write_frame(im)
    ms.finalize()
    frames = read_movie_frames(fp)
    assert len(frames) == 12
    assert frames[0].shape == (64, 48, 3)


def test_movie_shape_mismatch_raises(tmp_path):
    fp = str(tmp_path / "m.mp4")
    ms = MovieSaver(fp, fps=6, shape_hw=(64, 48))
    ms.write_frame(np.zeros((64, 48, 3), np.uint8))
    with pytest.raises(ValueError):
        ms.write_frame(np.zeros((48, 64, 3), np.uint8))
    ms.finalize()


def test_concatenate(tmp_path):
    fp1, fp2, fpc = (str(tmp_path / n) for n in ("a.mp4", "b.mp4", "c.mp4"))
    for fp, k in ((fp1, 5), (fp2, 7)):
        ms = MovieSaver(fp, fps=5, shape_hw=(32, 32))
        for im in _imgs(k):
            ms.write_frame(im)
        ms.finalize()
    concatenate_movies(fpc, [fp1, fp2])
    assert len(read_movie_frames(fpc)) == 12


def test_native_matches_numpy_lerp():
    pytest.importorskip("latentblending_tpu.video._native")
    from latentblending_tpu.video import _native
    from latentblending_tpu.video import frames as F

    imgs = _imgs(5, 64, 64, seed=7)
    native = F.add_frames_linear_interp(imgs, nmb_frames_target=40)
    saved = F._native_lerp
    try:
        F._native_lerp = None
        ref = F.add_frames_linear_interp(imgs, nmb_frames_target=40)
    finally:
        F._native_lerp = saved
    assert len(native) == len(ref) == 40
    for a, b in zip(native, ref):
        # u16 fixed-point kernel vs f32 lerp: ≤1 LSB
        assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1


def test_device_fillup_matches_host():
    from latentblending_tpu.video import frames as F

    imgs = _imgs(4, 32, 32, seed=9)
    dev = F.add_frames_linear_interp_device(imgs, 30, chunk=8)
    host = F.add_frames_linear_interp(imgs, nmb_frames_target=30)
    assert len(dev) == len(host) == 30
    for a, b in zip(dev, host):
        assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1


def test_package_all_exports_resolve():
    import latentblending_tpu as lb

    for name in lb.__all__:
        assert getattr(lb, name) is not None, name
