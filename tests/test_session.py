"""MovieProject JSON (gradio schema compat) + chained multi-transition."""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.engine.session import Keyframe, MovieProject, run_multi_transition
from latentblending_tpu.runtime.holder import SDXLHolder


def test_project_roundtrip(tmp_path):
    p = MovieProject(
        keyframes=[Keyframe("a cat", 1), Keyframe("a dog", 2, "ugly"), Keyframe("a bird", 3)],
        width=512, height=512, num_inference_steps=4,
    )
    fp = str(tmp_path / "proj.json")
    p.save(fp)
    q = MovieProject.load(fp)
    assert [k.prompt for k in q.keyframes] == ["a cat", "a dog", "a bird"]
    assert [k.seed for k in q.keyframes] == [1, 2, 3]
    assert q.keyframes[1].negative_prompt == "ugly"
    assert (q.width, q.height, q.num_inference_steps) == (512, 512, 4)


def test_project_schema_matches_reference_gradio(tmp_path):
    """data[0] is the settings header; entries carry iteration/seed/prompt
    (reference gradio_ui.py:168-189)."""
    fp = str(tmp_path / "proj.json")
    MovieProject([Keyframe("x", 7)], 640, 384, 30).save(fp)
    data = json.load(open(fp))
    assert data[0] == {"settings": "sdxl", "width": 640, "height": 384, "num_inference_steps": 30}
    assert data[1]["iteration"] == 0 and data[1]["seed"] == 7 and data[1]["prompt"] == "x"


def test_load_reference_style_json(tmp_path):
    # a file as the reference UI writes it (with preview_image fields)
    data = [
        {"settings": "sdxl", "width": 512, "height": 512, "num_inference_steps": 4},
        {"iteration": 0, "seed": 420, "prompt": "p1", "negative_prompt": "", "preview_image": "/tmp/a.jpg"},
        {"iteration": 1, "seed": 421, "prompt": "p2", "negative_prompt": "bad", "preview_image": "/tmp/b.jpg"},
    ]
    fp = str(tmp_path / "ref.json")
    json.dump(data, open(fp, "w"))
    p = MovieProject.load(fp)
    assert len(p.keyframes) == 2
    assert p.keyframes[1].negative_prompt == "bad"


@pytest.mark.slow
def test_run_multi_transition_tiny(tmp_path):
    dh = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_branching(nmb_max_branches=2)
    project = MovieProject(
        keyframes=[Keyframe("a", 1), Keyframe("b", 2), Keyframe("c", 3)],
        width=128, height=128, num_inference_steps=4,
    )
    fp = str(tmp_path / "multi.mp4")
    run_multi_transition(be, project, fp, duration_single_trans=1.0, fps=8)
    import cv2

    cap = cv2.VideoCapture(fp)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 16  # 2 transitions × 8 frames
    cap.release()

    # deferred per-part sims (finalize_report(sync_sims=False)) must all
    # land by movie end: merged report carries every part's gaps, nothing
    # pending, and the engine exposes the LAST part's similarities
    rep = be.last_report
    assert rep.sims_pending is None
    n_gaps_per_part = len(be.tree_similarities)
    assert n_gaps_per_part >= 1
    assert len(rep.lpips_gaps) == 2 * n_gaps_per_part
    assert all(isinstance(g, float) for g in rep.lpips_gaps)
    assert rep.lpips_gaps[-n_gaps_per_part:] == be.tree_similarities
    assert "lpips_sync" in rep.phases and rep.phases["lpips_sync"]["count"] == 2


@pytest.mark.slow
def test_run_multi_transition_overlap_matches_serial(tmp_path):
    """The depth-1 overlapped part-write pipeline must produce the exact
    same movie as the serial path (identical decoded frames)."""
    from latentblending_tpu.video.writer import read_movie_frames

    project = MovieProject(
        keyframes=[Keyframe("a", 1), Keyframe("b", 2), Keyframe("c", 3)],
        width=128, height=128, num_inference_steps=4,
    )

    def render(fp, overlap):
        dh = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
        be = BlendingEngine(dh, run_benchmark=False)
        be.set_branching(nmb_max_branches=2)
        run_multi_transition(
            be, project, fp, duration_single_trans=1.0, fps=8, overlap_write=overlap
        )
        # engine state matches the serial contract: keyframes materialized
        assert all(isinstance(np.asarray(im), np.ndarray) for im in be.tree_final_imgs)
        return read_movie_frames(fp)

    fa = render(str(tmp_path / "serial.mp4"), False)
    fb = render(str(tmp_path / "overlap.mp4"), True)
    assert len(fa) == len(fb) == 16
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_run_multi_transition_loop(tmp_path):
    """loop=True adds a K-th transition back to keyframe 1: K·target frames,
    and the final written frame matches a fresh render of keyframe 1 (same
    prompt+seed → same image, up to the fused-path ±1 LSB bar)."""
    import cv2
    import numpy as np

    dh = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_branching(nmb_max_branches=2)
    project = MovieProject(
        keyframes=[Keyframe("a", 1), Keyframe("b", 2)],
        width=128, height=128, num_inference_steps=4,
    )
    fp = str(tmp_path / "looped.mp4")
    run_multi_transition(be, project, fp, duration_single_trans=1.0, fps=8, loop=True)
    cap = cv2.VideoCapture(fp)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    assert n == 16  # 2 transitions (a→b, b→a-loopback) × 8 frames
    cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
    ok_first, first = cap.read()
    cap.set(cv2.CAP_PROP_POS_FRAMES, n - 1)
    ok_last, last = cap.read()
    cap.release()
    assert ok_first and ok_last
    # seam quality: the last frame is the first keyframe re-rendered; mp4v
    # is lossy, so compare loosely but require closeness far below any
    # mid-transition frame difference
    seam = np.abs(first.astype(np.int16) - last.astype(np.int16)).mean()
    assert seam < 8.0, f"loop seam too visible: mean |diff| {seam}"
