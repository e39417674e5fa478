"""Movie IO: MovieSaver + concatenate_movies.

Replaces the reference's lunar_tools ffmpeg wrappers (reference
blending_engine.py:703-706, gradio_ui.py:260). Backends, chosen per host
(override with LB_WRITER=ffmpeg|mjpeg|mp4v):

- ffmpeg binary (x264, the reference's own output) when present;
- parallel MJPEG-in-MP4 (video/mjpeg_mp4.py) otherwise — measured 1.4-1.5x
  faster than cv2 mp4v per core and intra-only so it scales across encode
  threads, at the cost of ~10x larger files (BENCH.md);
- OpenCV VideoWriter (avc1 if an encoder exists, else mp4v) as the
  smallest-file fallback.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np


def _ffmpeg_exe() -> str | None:
    """Best available ffmpeg binary: PATH, else the one bundled with the
    imageio-ffmpeg wheel (present in many ML images) — both give the
    reference's x264 output (reference blending_engine.py:703-706)."""
    exe = shutil.which("ffmpeg")
    if exe:
        return exe
    try:
        import imageio_ffmpeg

        return imageio_ffmpeg.get_ffmpeg_exe()
    except Exception:
        return None


def _has_ffmpeg() -> bool:
    return _ffmpeg_exe() is not None


_CV2_FOURCC: str | None = None


def _cv2_fourcc() -> str:
    """Preferred OpenCV codec, probed once: h264/'avc1' (matches the
    reference's x264 output) when an encoder is available, else mp4v."""
    global _CV2_FOURCC
    if _CV2_FOURCC is None:
        import cv2

        probe = os.path.join(tempfile.gettempdir(), "_lb_codec_probe.mp4")
        w = cv2.VideoWriter(probe, cv2.VideoWriter_fourcc(*"avc1"), 30, (64, 64))
        _CV2_FOURCC = "avc1" if w.isOpened() else "mp4v"
        w.release()
        if os.path.exists(probe):
            os.remove(probe)
    return _CV2_FOURCC


class MovieSaver:
    """Streaming MP4 writer: write_frame(uint8 HWC RGB) … finalize()."""

    def __init__(self, fp_movie: str, fps: int = 30, shape_hw: tuple[int, int] | None = None, crf: int = 21):
        self.fp_movie = fp_movie
        self.fps = fps
        self.shape_hw = tuple(shape_hw) if shape_hw is not None else None
        self.crf = crf
        self.nmb_frames = 0
        # which backend actually ran ("ffmpeg"/"mjpeg"/"cv2-avc1"/"cv2-mp4v")
        # and whether the JPEG coefficient-lerp fast path produced the
        # in-between frames — recorded for bench-line diagnosability
        self.backend: str | None = None
        self.used_coef_lerp = False
        # MJPEG backend: the rate-controlled quality the movie settled on
        # (mjpeg_mp4.calibrate_quality) — recorded for bench diagnosability
        self.jpeg_quality: int | None = None
        self._writer = None
        self._proc = None
        self._mjpeg = None
        self._bgr = None  # reused conversion buffer (page-fault avoidance)
        if os.path.isfile(fp_movie):
            os.remove(fp_movie)
        d = os.path.dirname(fp_movie)
        if d:
            os.makedirs(d, exist_ok=True)

    def _open(self, h: int, w: int):
        self.shape_hw = (h, w)
        if h % 2 or w % 2:
            # yuv420p (and most players) require even dimensions
            raise ValueError(f"movie dimensions must be even, got {w}x{h}")
        backend = os.environ.get("LB_WRITER", "auto")
        exe = _ffmpeg_exe() if backend in ("auto", "ffmpeg") else None
        if backend == "ffmpeg" and exe is None:
            raise RuntimeError("LB_WRITER=ffmpeg but no ffmpeg binary found")
        if exe is None and backend in ("auto", "mjpeg"):
            from .mjpeg_mp4 import MjpegMp4Writer

            self._mjpeg = MjpegMp4Writer(self.fp_movie, fps=self.fps, shape_hw=(h, w))
            self.backend = "mjpeg"
            return
        if exe is not None:
            self.backend = "ffmpeg"
            self._proc = subprocess.Popen(
                [
                    exe, "-y", "-loglevel", "error",
                    "-f", "rawvideo", "-pix_fmt", "rgb24", "-s", f"{w}x{h}", "-r", str(self.fps),
                    "-i", "-", "-c:v", "libx264", "-crf", str(self.crf), "-pix_fmt", "yuv420p",
                    self.fp_movie,
                ],
                stdin=subprocess.PIPE,
            )
        else:
            import cv2

            self._writer = cv2.VideoWriter(
                self.fp_movie, cv2.VideoWriter_fourcc(*_cv2_fourcc()), self.fps, (w, h)
            )
            if not self._writer.isOpened():
                raise RuntimeError(f"cv2.VideoWriter failed to open {self.fp_movie}")
            self.backend = f"cv2-{_cv2_fourcc()}"

    def open_mjpeg(self):
        """Open the backend now (shape_hw must already be known) and return
        the MJPEG writer if that's the chosen backend, else None. Lets the
        coefficient-lerp fast path commit to a backend before producing any
        pixels."""
        if self._writer is None and self._proc is None and self._mjpeg is None:
            if self.shape_hw is None:
                return None
            self._open(*self.shape_hw)
        return self._mjpeg

    def write_encoded(self, jpg: bytes):
        """Append an already-encoded JPEG sample (MJPEG backend only)."""
        if self._mjpeg is None:
            raise RuntimeError("write_encoded requires the MJPEG backend (call open_mjpeg first)")
        self._mjpeg.write_encoded(jpg)
        self.nmb_frames += 1

    def write_frame(self, img: np.ndarray):
        img = np.asarray(img)
        assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3, "expects uint8 HWC RGB"
        if self._writer is None and self._proc is None and self._mjpeg is None:
            h, w = (self.shape_hw or img.shape[:2])
            self._open(h, w)
        if self.shape_hw is not None and img.shape[:2] != tuple(self.shape_hw):
            raise ValueError(f"frame shape {img.shape[:2]} != movie shape {self.shape_hw}")
        if self._mjpeg is not None:
            self._mjpeg.write_frame(img)
        elif self._proc is not None:
            try:
                self._proc.stdin.write(img.tobytes())
            except BrokenPipeError as e:
                rc = self._proc.poll()
                raise RuntimeError(f"ffmpeg died (exit {rc}) while writing {self.fp_movie}") from e
        else:
            import cv2

            if self._bgr is None or self._bgr.shape != img.shape:
                self._bgr = np.empty_like(img)
            cv2.cvtColor(img, cv2.COLOR_RGB2BGR, dst=self._bgr)
            self._writer.write(self._bgr)
        self.nmb_frames += 1

    def finalize(self):
        if self._mjpeg is not None:
            self.jpeg_quality = self._mjpeg.quality
            self._mjpeg.finalize()
            self._mjpeg = None
        elif self._proc is not None:
            self._proc.stdin.close()
            rc = self._proc.wait()
            self._proc = None
            if rc != 0:
                raise RuntimeError(f"ffmpeg exited with code {rc} for {self.fp_movie}")
        elif self._writer is not None:
            self._writer.release()
            self._writer = None
        if self.nmb_frames > 0 and not (os.path.isfile(self.fp_movie) and os.path.getsize(self.fp_movie) > 0):
            raise RuntimeError(f"movie file {self.fp_movie} was not written")


def write_frames(ms: MovieSaver, frames, threaded: bool | None = None) -> None:
    """Feed an iterable of (possibly reused) frame buffers to a MovieSaver.

    threaded=None → auto: pipeline frame PRODUCTION (host lerp, device
    fetch waits) with ENCODING on a consumer thread when the host has spare
    cores (cv2/ffmpeg encode releases the GIL, so this is real overlap).
    Single-core hosts run inline — the two stages would just contend.
    LB_WRITER_THREAD=1/0 forces the choice. Frames are copied into a small
    rotating buffer pool before queueing because producers reuse their
    output buffer; the pool (4) exceeds max frames in flight (queue 2 +
    consumer 1), so no queued frame is ever overwritten."""
    if threaded is None:
        env = os.environ.get("LB_WRITER_THREAD")
        if env is not None:
            threaded = env == "1"
        else:
            threaded = (os.cpu_count() or 1) > 2
    if not threaded:
        for img in frames:
            ms.write_frame(img)
        return

    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=2)
    errs: list[BaseException] = []

    def _consume():
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                ms.write_frame(item)
        except BaseException as e:  # propagate to the producer
            errs.append(e)
            while q.get() is not None:  # drain so the producer never blocks
                pass

    th = threading.Thread(target=_consume, daemon=True)
    th.start()
    pool: list[np.ndarray] = []
    i = 0
    for frame in frames:
        if errs:
            break
        frame = np.asarray(frame)
        if len(pool) < 4:
            pool.append(np.empty_like(frame))
        buf = pool[i % 4]
        i += 1
        np.copyto(buf, frame)
        q.put(buf)
    q.put(None)
    th.join()
    if errs:
        raise errs[0]


def write_frames_interp(ms: MovieSaver, handles: list, nmb_frames_target: int,
                        resolve=None, threaded: bool | None = None) -> None:
    """Fill K keyframes up to nmb_frames_target frames and write the movie.

    Fast path — JPEG coefficient-space interpolation: in-between frames are
    lerps of two keyframes and the DCT is linear, so with the MJPEG backend
    their JPEG samples can be produced by lerping the keyframes' quantized
    DCT coefficients and running only the Huffman pass (native/
    jpeg_coef_lerp.cpp) — no per-frame color convert, subsample or DCT.
    Same quality setting, ~1.6x faster per frame on a single encode thread.

    Gate (LB_COEF_LERP): "1" force on, "0" force off, unset/auto = on when
    the backend is MJPEG and the host runs a single encode thread
    (mjpeg_mp4.default_workers() == 0) — with spare cores the pooled pixel
    path overlaps encodes across threads and wins instead (the coefficient
    kernel shares one pair state per gap, so it is inherently serial).

    Every other case (ffmpeg/cv2 backends, pooled hosts, incompatible
    JPEG pairs) streams the pixel path: stream_frames_lazy + write_frames.
    Keyframes are resolved lazily left-to-right in both paths, so encoding
    overlaps in-flight device→host keyframe copies either way.

    Keyframes may arrive as packed I420 plane buffers (2-D uint8
    [H*3/2, W] — the engine's halved-transfer fetch format, video/i420.py)
    instead of RGB: the JPEG path hands them to libjpeg's raw-data encoder
    (no host color conversion at all); pixel-lerp fallbacks convert to RGB
    first.
    """
    from .frames import stream_frames_lazy
    from .i420 import i420_hw, is_i420, to_rgb

    if resolve is None:
        resolve = lambda im: im  # noqa: E731
    use_coef = False
    if nmb_frames_target > len(handles):
        gate = os.environ.get("LB_COEF_LERP", "auto")
        if gate == "1":
            use_coef = True
        elif gate != "0":
            from .mjpeg_mp4 import default_workers

            use_coef = default_workers() == 0
    JpegPair = None
    if use_coef:
        try:
            from ._jpeg_lerp import JpegPair
        except Exception:
            JpegPair = None
    mj = ms.open_mjpeg() if JpegPair is not None else None
    if mj is None:
        write_frames(
            ms,
            stream_frames_lazy(handles, nmb_frames_target, lambda im: to_rgb(resolve(im))),
            threaded=threaded,
        )
        return

    ms.used_coef_lerp = True
    from latentblending_tpu.ops.schedules import frame_insert_counts

    from .frames import _lerp_u8, _native_lerp_into

    # raw-mode I420 encode needs whole chroma DCT blocks (width % 16); when
    # unavailable, I420 keyframes are converted to RGB up front
    i420_ok = ms.shape_hw[1] % 16 == 0
    encode_i420 = None
    if i420_ok:
        try:
            from ._jpeg_lerp import encode_i420
        except Exception:
            encode_i420 = None

    def prep(handle) -> np.ndarray:
        a = np.ascontiguousarray(np.asarray(resolve(handle)), dtype=np.uint8)
        if is_i420(a) and encode_i420 is None:
            a = to_rgb(a)
        return a

    def kf_hw(a) -> tuple[int, int]:
        return i420_hw(a) if is_i420(a) else a.shape[:2]

    def kf_encode_at(a, q: int) -> bytes:
        if is_i420(a):
            h, w = i420_hw(a)
            return encode_i420(a, w, h, q)
        return mj.encode_frame(a, quality=q)

    def kf_encode(a) -> bytes:
        # first keyframe settles the writer's rate-controlled quality for
        # the whole movie (mjpeg_mp4.calibrate_quality) — every later
        # sample shares its quant tables, so coef-lerp pairs stay valid
        if not mj._q_settled:
            return mj.calibrate_quality(lambda q: kf_encode_at(a, q))
        return kf_encode_at(a, mj.quality)

    K = len(handles)
    counts = frame_insert_counts(K, nmb_frames_target)
    cur = prep(handles[0])
    if kf_hw(cur) != tuple(ms.shape_hw):
        # write_encoded bypasses the per-frame shape check of the pixel path
        raise ValueError(f"keyframe shape {kf_hw(cur)} != movie shape {ms.shape_hw}")
    jcur = kf_encode(cur)
    ms.write_encoded(jcur)
    buf = None
    cur_rgb = None  # lazy RGB view of cur for pixel-lerp fallbacks
    for i in range(K - 1):
        nxt = prep(handles[i + 1])
        if kf_hw(nxt) != kf_hw(cur) or nxt.ndim != cur.ndim:
            # guard BOTH the encoded path (write_encoded skips the pixel
            # shape check) and the native lerp fallback (which trusts
            # cur.size and would read out of bounds on a smaller nxt)
            raise ValueError(f"keyframe {i + 1} shape {nxt.shape} != movie keyframe shape {cur.shape}")
        jnxt = kf_encode(nxt)
        fracts = np.linspace(0, 1, counts[i] + 2)[1:-1]
        try:
            pair = JpegPair(jcur, jnxt)
        except ValueError:  # incompatible pair — pixel-lerp this gap only
            pair = None
        if pair is not None:
            try:
                for f in fracts:
                    ms.write_encoded(pair.lerp(float(f)))
            finally:
                pair.close()
            cur_rgb = None
        else:
            a = to_rgb(cur) if cur_rgb is None else cur_rgb
            b = to_rgb(nxt)
            if buf is None:
                buf = np.empty_like(a)
            if _native_lerp_into is not None:
                for f in fracts:
                    ms.write_frame(_native_lerp_into(a, b, float(f), buf))
            else:
                cf, nf = a.astype(np.float32), b.astype(np.float32)
                for f in fracts:
                    ms.write_frame(_lerp_u8(cf, nf, float(f)))
            cur_rgb = b
        ms.write_encoded(jnxt)
        cur, jcur = nxt, jnxt


def read_movie_frames(fp_movie: str) -> list[np.ndarray]:
    """Decode an mp4 back to a list of uint8 RGB frames (cv2)."""
    import cv2

    cap = cv2.VideoCapture(fp_movie)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return frames


def concatenate_movies(fp_final: str, list_fp_movies: list[str], fps: int | None = None):
    """Concatenate MP4 parts into one movie (reference
    example_multi_trans.py:62)."""
    assert list_fp_movies, "nothing to concatenate"
    if _has_ffmpeg():
        with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
            for fp in list_fp_movies:
                f.write(f"file '{os.path.abspath(fp)}'\n")
            list_path = f.name
        try:
            subprocess.run(
                ["ffmpeg", "-y", "-loglevel", "error", "-f", "concat", "-safe", "0",
                 "-i", list_path, "-c", "copy", fp_final],
                check=True,
            )
        finally:
            os.unlink(list_path)
        return
    from .mjpeg_mp4 import concat_parts

    # our own MJPEG parts splice losslessly without a decode/re-encode pass
    if concat_parts(fp_final, list_fp_movies, fps=fps):
        return
    import cv2

    cap = cv2.VideoCapture(list_fp_movies[0])
    fps_in = fps or cap.get(cv2.CAP_PROP_FPS) or 30
    cap.release()
    writer = None
    for fp in list_fp_movies:
        for frame in read_movie_frames(fp):
            if writer is None:
                h, w = frame.shape[:2]
                ms = MovieSaver(fp_final, fps=int(round(fps_in)), shape_hw=(h, w))
                writer = ms
            writer.write_frame(frame)
    if writer is not None:
        writer.finalize()
