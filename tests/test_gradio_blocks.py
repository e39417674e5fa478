"""Executes the actual Gradio Blocks construction (apps/gradio_ui.py
build_ui — reference gradio_ui.py:286-338) against the recording stub in
tests/gradio_stub.py, then drives the recorded event bindings end-to-end
with the tiny engine: the same code path a real gradio server would wire,
minus only the HTTP/JS layer that the uninstallable gradio wheel provides.
"""
import sys
import types

import jax.numpy as jnp
import pytest

from tests.gradio_stub import StubGradio


@pytest.fixture(scope="module")
def ui():
    sys.path.insert(0, "apps")
    import gradio_ui as G

    from latentblending_tpu.engine.blending import BlendingEngine
    from latentblending_tpu.runtime.holder import SDXLHolder

    dh = SDXLHolder.from_random("tiny-turbo", seed=0, dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_branching(nmb_max_branches=2)
    mur = G.MultiUserRouter({"tiny-turbo": be}, nmb_preview_images=2)
    gr = StubGradio()
    demo = G.build_ui(gr, mur, nmb_preview_images=2)
    return types.SimpleNamespace(gr=gr, mur=mur, demo=demo)


def test_widget_surface_matches_reference(ui):
    """Same widget set/labels as the reference UI (gradio_ui.py:286-338)."""
    gr = ui.gr
    assert {b.label for b in gr.of_type("Button")} == {
        "start session",
        "generate preview images",
        "add selected image to video",
        "delete selected image",
        "move image to earlier time",
        "move image to later time",
        "generate movie",
    }
    assert {s.label for s in gr.of_type("Slider")} == {"width", "height", "time per segment"}
    assert {t.label for t in gr.of_type("Textbox")} == {
        "prompt",
        "negative prompt",
        "user id (filled automatically)",
    }
    assert len(gr.of_type("Gallery")) == 2
    assert len(gr.of_type("Video")) == 1
    (dropdown,) = gr.of_type("Dropdown")
    assert dropdown.args[0] == ["tiny-turbo"]  # model list


def test_bindings_target_router(ui):
    gr, mur = ui.gr, ui.mur
    assert gr.bound_fn("start session").fn == mur.register_new_user
    assert gr.bound_fn("generate preview images").fn == mur.compute_imgs
    assert gr.bound_fn("add selected image to video").fn == mur.add_image_to_video
    assert gr.bound_fn("generate movie").fn == mur.generate_movie
    # preview select feeds idx_img_preview_selected; movie gallery reorder/delete
    previews, movie_gallery = gr.of_type("Gallery")
    assert previews.select_bindings[0].fn == mur.preview_img_selected
    assert movie_gallery.select_bindings[0].fn == mur.movie_img_selected
    # the compute binding takes (user_id, prompt, negative_prompt) and
    # writes back into the preview gallery — exactly the reference wiring
    b = gr.bound_fn("generate preview images")
    assert [c.label for c in b.inputs] == ["user id (filled automatically)", "prompt", "negative prompt"]
    assert b.outputs == [previews]


def test_drive_recorded_bindings_end_to_end(ui, tmp_path, monkeypatch):
    """A user session driven purely through the recorded UI bindings."""
    monkeypatch.chdir(tmp_path)
    gr = ui.gr
    user_id = gr.bound_fn("start session").fn("tiny-turbo", 128, 128)
    assert user_id in ui.mur.sessions
    previews = gr.bound_fn("generate preview images").fn(user_id, "a forest", "ugly")
    assert len(previews) == 2
    preview_gallery = gr.of_type("Gallery")[0]
    preview_gallery.select_bindings[0].fn(user_id, types.SimpleNamespace(index=1), None)
    movie_imgs = gr.bound_fn("add selected image to video").fn(user_id)
    assert movie_imgs == [previews[1]]
    s = ui.mur.sessions[user_id]
    assert s.data[0]["prompt"] == "a forest" and s.data[0]["seed"] == s.list_seeds[1]
