"""Non-square output dimensions through the whole stack (the reference UI
exposes free width/height sliders, gradio_ui.py:291-292)."""
import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.runtime.holder import SDXLHolder


@pytest.mark.slow
def test_nonsquare_transition(tmp_path):
    dh = SDXLHolder.from_random("tiny-turbo", seed=0, dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_dimensions((192, 128))  # w×h → latents 24×16
    be.set_prompt1("a wide landscape")
    be.set_prompt2("a wide seascape")
    be.set_branching(nmb_max_branches=2)
    imgs = be.run_transition(fixed_seeds=[1, 2])
    assert imgs[0].shape == (128, 192, 3)
    # time_ids encode the real size (reference bug dh:216-217 fixed)
    tids = np.asarray(dh.default_time_ids(1))
    assert tids[0, 0] == 128 and tids[0, 1] == 192  # (h, w, 0, 0, h, w)
    fp = str(tmp_path / "ns.mp4")
    be.write_movie_transition(fp, duration_transition=1.0, fps=8)
    import cv2

    cap = cv2.VideoCapture(fp)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 8
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 192
    cap.release()


def test_negative_prompt_changes_embeddings():
    dh = SDXLHolder.from_random("tiny-turbo", seed=0, dtype=jnp.float32)
    dh.set_negative_prompt("")
    _, ne_empty, _, _ = dh.get_text_embedding("hello world")
    dh.set_negative_prompt("blurry, ugly")
    _, ne, _, npool = dh.get_text_embedding("hello world")
    assert not np.allclose(np.asarray(ne_empty), np.asarray(ne))
    # list form accepted (reference dh:68-77 keeps only the first entry)
    dh.set_negative_prompt(["blurry, ugly", "second ignored"])
    _, ne2, _, _ = dh.get_text_embedding("hello world")
    np.testing.assert_array_equal(np.asarray(ne), np.asarray(ne2))
