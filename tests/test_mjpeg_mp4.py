"""MJPEG-in-MP4 writer: container validity, decode roundtrip, backend selection.

The muxer replaces the reference's ffmpeg/x264 MovieSaver output path
(reference blending_engine.py:703-706) on hosts without an ffmpeg binary.
"""
import os
import struct

import numpy as np
import pytest

from latentblending_tpu.video.mjpeg_mp4 import MjpegMp4Writer, default_workers
from latentblending_tpu.video.writer import MovieSaver, read_movie_frames

cv2 = pytest.importorskip("cv2")


def _frames(n=12, hw=64):
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (hw // 8, hw // 8, 3), dtype=np.uint8)
    f0 = cv2.resize(base, (hw, hw), interpolation=cv2.INTER_CUBIC)
    return [np.clip(f0.astype(np.int16) + 9 * i, 0, 255).astype(np.uint8) for i in range(n)]


def test_roundtrip_cv2_decode(tmp_path):
    fp = str(tmp_path / "m.mp4")
    frames = _frames()
    w = MjpegMp4Writer(fp, fps=30)
    for f in frames:
        w.write_frame(f)
    w.finalize()
    assert w.nmb_frames == len(frames)
    got = read_movie_frames(fp)
    assert len(got) == len(frames)
    assert got[0].shape == frames[0].shape
    for a, b in zip(frames, got):
        assert np.mean(np.abs(a.astype(np.int16) - b.astype(np.int16))) < 8.0  # JPEG-lossy bar
    cap = cv2.VideoCapture(fp)
    assert cap.get(cv2.CAP_PROP_FPS) == pytest.approx(30, abs=0.1)
    assert cap.get(cv2.CAP_PROP_FRAME_COUNT) == len(frames)
    cap.release()


def test_container_boxes(tmp_path):
    fp = str(tmp_path / "m.mp4")
    w = MjpegMp4Writer(fp, fps=24)
    for f in _frames(n=3):
        w.write_frame(f)
    w.finalize()
    blob = open(fp, "rb").read()
    assert blob[4:8] == b"ftyp"
    ftyp_size = struct.unpack(">I", blob[:4])[0]
    # mdat follows ftyp; its patched size must land exactly at moov
    mdat_size = struct.unpack(">I", blob[ftyp_size:ftyp_size + 4])[0]
    assert blob[ftyp_size + 4:ftyp_size + 8] == b"mdat"
    moov_off = ftyp_size + mdat_size
    assert blob[moov_off + 4:moov_off + 8] == b"moov"
    assert moov_off + struct.unpack(">I", blob[moov_off:moov_off + 4])[0] == len(blob)
    assert b"jpeg" in blob[moov_off:]


def test_threaded_encode_matches_inline(tmp_path):
    frames = _frames(n=10)
    fps_a, fps_b = str(tmp_path / "a.mp4"), str(tmp_path / "b.mp4")
    wa = MjpegMp4Writer(fps_a, fps=30, workers=0)
    wb = MjpegMp4Writer(fps_b, fps=30, workers=3)
    buf = np.empty_like(frames[0])
    for f in frames:
        np.copyto(buf, f)  # exercise the caller-reuses-buffer contract
        wa.write_frame(f)
        wb.write_frame(buf)
    wa.finalize()
    wb.finalize()
    assert open(fps_a, "rb").read() == open(fps_b, "rb").read()


def test_moviesaver_auto_backend_and_override(tmp_path, monkeypatch):
    frames = _frames(n=4)
    # no ffmpeg on this host → auto picks mjpeg
    monkeypatch.delenv("LB_WRITER", raising=False)
    fp = str(tmp_path / "auto.mp4")
    ms = MovieSaver(fp, fps=10, shape_hw=(64, 64))
    for f in frames:
        ms.write_frame(f)
    ms.finalize()
    blob = open(fp, "rb").read()
    assert b"jpeg" in blob[-512:]  # moov sample entry at the tail
    assert len(read_movie_frames(fp)) == 4

    monkeypatch.setenv("LB_WRITER", "mp4v")
    fp2 = str(tmp_path / "forced.mp4")
    ms = MovieSaver(fp2, fps=10, shape_hw=(64, 64))
    for f in frames:
        ms.write_frame(f)
    ms.finalize()
    assert b"jpeg" not in open(fp2, "rb").read()[-512:]
    assert len(read_movie_frames(fp2)) == 4


def test_frame_shape_mismatch_raises(tmp_path):
    w = MjpegMp4Writer(str(tmp_path / "m.mp4"), fps=30, shape_hw=(64, 64))
    w.write_frame(_frames(n=1)[0])
    with pytest.raises(ValueError):
        w.write_frame(np.zeros((32, 32, 3), np.uint8))
    w.finalize()


def test_default_workers_env(monkeypatch):
    monkeypatch.setenv("LB_JPEG_WORKERS", "5")
    assert default_workers() == 5
    monkeypatch.delenv("LB_JPEG_WORKERS")
    n = os.cpu_count() or 1
    assert default_workers() == (0 if n <= 2 else min(n - 1, 8))


def test_lossless_concat_parts(tmp_path):
    from latentblending_tpu.video.mjpeg_mp4 import concat_parts, read_samples
    from latentblending_tpu.video.writer import concatenate_movies

    frames = _frames(n=9)
    parts = []
    for i in range(3):
        fp = str(tmp_path / f"p{i}.mp4")
        w = MjpegMp4Writer(fp, fps=30)
        for f in frames[3 * i:3 * i + 3]:
            w.write_frame(f)
        w.finalize()
        parts.append(fp)
    out = str(tmp_path / "cat.mp4")
    assert concat_parts(out, parts)
    samples, (h, w_), fps = read_samples(out)
    assert (len(samples), h, w_, fps) == (9, 64, 64, 30.0)
    # byte-identical to the samples of a single 9-frame write
    ref = str(tmp_path / "ref.mp4")
    w = MjpegMp4Writer(ref, fps=30)
    for f in frames:
        w.write_frame(f)
    w.finalize()
    assert samples == read_samples(ref)[0]
    # the public concat entry point takes the lossless path for our parts
    out2 = str(tmp_path / "cat2.mp4")
    concatenate_movies(out2, parts)
    assert read_samples(out2)[0] == samples
    assert len(read_movie_frames(out2)) == 9


def test_concat_foreign_file_falls_back(tmp_path, monkeypatch):
    from latentblending_tpu.video.mjpeg_mp4 import concat_parts
    from latentblending_tpu.video.writer import concatenate_movies

    frames = _frames(n=4)
    monkeypatch.setenv("LB_WRITER", "mp4v")
    foreign = str(tmp_path / "foreign.mp4")
    ms = MovieSaver(foreign, fps=10, shape_hw=(64, 64))
    for f in frames:
        ms.write_frame(f)
    ms.finalize()
    monkeypatch.delenv("LB_WRITER")
    assert not concat_parts(str(tmp_path / "no.mp4"), [foreign])
    out = str(tmp_path / "cat.mp4")
    concatenate_movies(out, [foreign, foreign])  # re-encode fallback path
    assert len(read_movie_frames(out)) == 8


def test_io_thread_output_matches_inline(tmp_path, monkeypatch):
    """mdat writes ride a bounded IO-thread queue by default (so encode/lerp
    overlaps disk writeback throttling); the bytes on disk must be identical
    to the inline path, and a small queue bound must not deadlock."""
    import numpy as np

    from latentblending_tpu.video.mjpeg_mp4 import MjpegMp4Writer

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (64, 48, 3), dtype=np.uint8) for _ in range(50)]

    paths = {}
    for mode, env in (("inline", "0"), ("threaded", "1")):
        monkeypatch.setenv("LB_MJPEG_IO_THREAD", env)
        fp = str(tmp_path / f"io_{mode}.mp4")
        w = MjpegMp4Writer(fp, fps=30, shape_hw=(64, 48))
        if mode == "threaded":
            w._open(64, 48)
            assert w._io_thread is not None and w._ioq.maxsize == 32
        for f in frames:
            w.write_frame(f)
        # mixed path: pre-encoded samples interleave through the same queue
        w.write_encoded(w.encode_frame(frames[0]))
        w.finalize()
        paths[mode] = fp
    assert open(paths["inline"], "rb").read() == open(paths["threaded"], "rb").read()


def test_io_thread_write_error_propagates(tmp_path, monkeypatch):
    """A failing disk write surfaces on finalize (or an earlier _emit)
    instead of being swallowed by the IO thread, and nothing deadlocks."""
    import numpy as np
    import pytest as _pytest

    from latentblending_tpu.video.mjpeg_mp4 import MjpegMp4Writer

    monkeypatch.setenv("LB_MJPEG_IO_THREAD", "1")
    w = MjpegMp4Writer(str(tmp_path / "err.mp4"), fps=30, shape_hw=(64, 48))
    w._open(64, 48)

    class Boom(OSError):
        pass

    real_f = w._f

    class FailingFile:
        def write(self, b):
            raise Boom("disk full")

        def __getattr__(self, name):
            return getattr(real_f, name)

    w._f = FailingFile()
    frame = np.zeros((64, 48, 3), np.uint8)
    with _pytest.raises(Boom):
        for _ in range(200):  # far beyond the queue bound — must not hang
            w.write_frame(frame)
            if w._io_exc is not None:
                w.write_frame(frame)  # next emit raises
    w._f = real_f
    w._io_exc = None
    w.finalize()


def _sample_sizes(fp):
    from latentblending_tpu.video.mjpeg_mp4 import read_samples

    samples, _, _ = read_samples(fp)
    return [len(s) for s in samples]


def test_rate_control_caps_noise_frames(tmp_path):
    """Noise-like 512² frames blow past any sane bitrate at q90 (~5 bpp);
    the default 2.5 bpp cap settles a lower quality ONCE on the first frame.
    Uniform noise is incompressible enough that even q_min may exceed the
    budget — the contract is: either the sample fits, or quality bottomed
    out at q_min. Real photographic content (~0.8-1.5 bpp at q90) never
    triggers any of this."""
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (512, 512, 3), np.uint8) for _ in range(5)]
    # uncapped baseline for the same first frame
    w0 = MjpegMp4Writer(str(tmp_path / "base.mp4"), fps=30, workers=0, max_bpp=0)
    base = len(w0.encode_frame(frames[0]))
    w0.finalize()
    fp = str(tmp_path / "cap.mp4")
    w = MjpegMp4Writer(fp, fps=30, workers=0)
    for f in frames:
        w.write_frame(f)
    budget = w.byte_budget()
    assert budget == 2.5 * 512 * 512 / 8
    assert w.quality < 90 and w._q_settled  # the cap bound and lowered quality
    cap_ok = w.quality == w._q_min  # noise may not fit even at q_min
    w.finalize()
    sizes = _sample_sizes(fp)
    assert sizes[0] <= budget or cap_ok
    assert sizes[0] < 0.8 * base  # meaningfully smaller than uncapped q90
    # later frames share the settled quality; same-statistics noise frames
    # stay in the first sample's neighborhood
    assert all(s <= sizes[0] * 1.2 for s in sizes)


def test_rate_control_disabled_and_floor(tmp_path, monkeypatch):
    rng = np.random.default_rng(12)
    noise512 = rng.integers(0, 256, (512, 512, 3), np.uint8)
    # LB_MJPEG_MAX_BPP=0 disables the cap entirely
    monkeypatch.setenv("LB_MJPEG_MAX_BPP", "0")
    w = MjpegMp4Writer(str(tmp_path / "off.mp4"), fps=30, workers=0)
    w.write_frame(noise512)
    assert w.quality == 90 and w.byte_budget() is None
    w.finalize()
    monkeypatch.delenv("LB_MJPEG_MAX_BPP")
    # tiny frames ride the 64 KiB floor — quality untouched even for noise
    w = MjpegMp4Writer(str(tmp_path / "tiny.mp4"), fps=30, workers=0)
    w.write_frame(rng.integers(0, 256, (64, 64, 3), np.uint8))
    assert w.byte_budget() == 65536
    assert w.quality == 90
    w.finalize()


def test_rate_control_coef_lerp_path(tmp_path, monkeypatch):
    """The coefficient-lerp writer path calibrates on the FIRST keyframe, so
    all keyframe/in-between samples share quant tables and fit the budget."""
    from latentblending_tpu.video.writer import write_frames_interp

    monkeypatch.setenv("LB_COEF_LERP", "1")
    rng = np.random.default_rng(13)
    kfs = [rng.integers(0, 256, (512, 512, 3), np.uint8) for _ in range(3)]
    fp = str(tmp_path / "coef.mp4")
    ms = MovieSaver(fp, fps=30, shape_hw=(512, 512))
    write_frames_interp(ms, kfs, 12)
    ms.finalize()
    assert ms.used_coef_lerp
    assert ms.jpeg_quality is not None and ms.jpeg_quality < 90
    w0 = MjpegMp4Writer(str(tmp_path / "base.mp4"), fps=30, workers=0, max_bpp=0)
    base = len(w0.encode_frame(kfs[0]))
    w0.finalize()
    sizes = _sample_sizes(fp)
    assert len(sizes) == 12
    # every sample (keyframes AND coef-lerped in-betweens) rides the settled
    # quality — meaningfully smaller than uncapped q90 on this content
    assert all(s < 0.8 * base for s in sizes)
