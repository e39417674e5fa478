"""run_movie_transition — the fused streaming transition→movie path
(VERDICT r2 task 1) — must produce IDENTICAL frames to the reference-shaped
two-call path (run_transition → write_movie_transition), while starting the
encoder before every keyframe batch has resolved."""
import numpy as np
import pytest

import jax.numpy as jnp

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.runtime.holder import SDXLHolder
from latentblending_tpu.video.frames import stream_frames_lazy, stream_frames_linear_interp
from latentblending_tpu.video.writer import read_movie_frames


def test_stream_frames_lazy_matches_eager():
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(5)]
    eager = [f.copy() for f in stream_frames_linear_interp(imgs, 23)]
    calls = []

    def resolve(h):
        calls.append(h)
        return imgs[h]

    lazy = [f.copy() for f in stream_frames_lazy(list(range(5)), 23, resolve)]
    assert len(eager) == len(lazy) == 23
    for a, b in zip(eager, lazy):
        np.testing.assert_array_equal(a, b)
    # strictly left-to-right, each keyframe resolved exactly once
    assert calls == [0, 1, 2, 3, 4]


def test_stream_frames_lazy_short_target():
    imgs = [np.full((8, 8, 3), i, np.uint8) for i in range(4)]
    out = [f.copy() for f in stream_frames_lazy(list(range(4)), 3, lambda h: imgs[h])]
    assert len(out) == 4  # target <= K yields the keyframes themselves
    for i, f in enumerate(out):
        np.testing.assert_array_equal(f, imgs[i])


@pytest.fixture(scope="module")
def engine():
    # tiny-ancestral exercises the seeded in-scan noise path too — the
    # fused run must reproduce the two-call run exactly through it
    dh = SDXLHolder.from_random("tiny-ancestral", seed=0, dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_prompt1("photo of a cat")
    be.set_prompt2("photo of a dog")
    be.set_branching(nmb_max_branches=4)
    return be


def test_fused_movie_identical_to_two_call_path(engine, tmp_path, monkeypatch):
    # RGB keyframe fetch for strict byte equality with the two-call path;
    # the default I420 fetch is a bounded deviation tested in test_i420.py
    monkeypatch.setenv("LB_KEYFRAME_I420", "0")
    fp_a = str(tmp_path / "two_call.mp4")
    fp_b = str(tmp_path / "fused.mp4")

    imgs_a = engine.run_transition(fixed_seeds=[5, 6])
    engine.write_movie_transition(fp_a, duration_transition=1.0)
    imgs_a = [np.asarray(im).copy() for im in imgs_a]

    imgs_b = engine.run_movie_transition(fp_b, duration_transition=1.0, fixed_seeds=[5, 6])

    # keyframes identical
    assert len(imgs_a) == len(imgs_b)
    for a, b in zip(imgs_a, imgs_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the written movies decode to identical frames
    fa = read_movie_frames(fp_a)
    fb = read_movie_frames(fp_b)
    assert len(fa) == len(fb) == 30
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(a, b)


def test_fused_movie_report_complete(engine, tmp_path):
    engine.run_movie_transition(str(tmp_path / "m.mp4"), duration_transition=1.0, fixed_seeds=[7, 8])
    rep = engine.last_report
    assert rep.num_keyframes == len(engine.tree_final_imgs) >= 3
    # the deferred similarity pass landed: one float per adjacent gap
    assert len(engine.tree_similarities) == rep.num_keyframes - 1
    assert all(isinstance(s, float) for s in engine.tree_similarities)
    assert rep.lpips_gaps == [float(s) for s in engine.tree_similarities]
    assert "movie_write" in rep.phases
    assert rep.wall_s > 0
    # every keyframe fully materialized (no pending handles leak out)
    assert all(isinstance(np.asarray(im), np.ndarray) for im in engine.tree_final_imgs)
    assert all(np.asarray(im).dtype == np.uint8 for im in engine.tree_final_imgs)


def test_threaded_writer_identical(tmp_path, monkeypatch):
    """write_frames' consumer-thread pipeline (multi-core hosts) must write
    the same movie as the inline path, including with producers that reuse
    their output buffer."""
    from latentblending_tpu.video.writer import MovieSaver, write_frames

    rng = np.random.default_rng(1)
    keys = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(4)]

    def frames():
        # reused-buffer producer like stream_frames_lazy
        yield from stream_frames_linear_interp(keys, 40)

    fp_a, fp_b = str(tmp_path / "inline.mp4"), str(tmp_path / "threaded.mp4")
    monkeypatch.setenv("LB_WRITER_THREAD", "0")
    ms = MovieSaver(fp_a, fps=10, shape_hw=(32, 32))
    write_frames(ms, frames())
    ms.finalize()
    monkeypatch.setenv("LB_WRITER_THREAD", "1")
    ms = MovieSaver(fp_b, fps=10, shape_hw=(32, 32))
    write_frames(ms, frames())
    ms.finalize()
    fa, fb = read_movie_frames(fp_a), read_movie_frames(fp_b)
    assert len(fa) == len(fb) == 40
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(a, b)


def test_threaded_writer_propagates_errors(tmp_path, monkeypatch):
    from latentblending_tpu.video.writer import MovieSaver, write_frames

    monkeypatch.setenv("LB_WRITER_THREAD", "1")
    ms = MovieSaver(str(tmp_path / "bad.mp4"), fps=10, shape_hw=(32, 32))
    bad = [np.zeros((32, 32, 3), np.uint8), np.zeros((16, 16, 3), np.uint8)]
    with pytest.raises(ValueError):
        write_frames(ms, iter(bad))


def test_run_transition_still_finalizes(engine):
    """The refactored run_transition (core + resolve + finalize) keeps its
    public contract: resolved uint8 keyframes + complete report."""
    imgs = engine.run_transition(fixed_seeds=[9, 10])
    assert all(np.asarray(im).dtype == np.uint8 for im in imgs)
    assert len(engine.tree_similarities) == len(imgs) - 1
    assert engine.last_report.num_keyframes == len(imgs)
