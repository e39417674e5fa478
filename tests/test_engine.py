"""Integration tests: full BlendingEngine on the tiny model (CPU).

Covers the tree policy invariants the reference establishes implicitly
(SURVEY.md §4 'Integration'): sorted fracts, parents strictly shallower,
similarity bookkeeping, determinism under fixed seeds, recycle/swap
semantics, batched-vs-sequential policy equivalence.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.runtime.holder import SDXLHolder


@pytest.fixture(scope="module")
def engine():
    dh = SDXLHolder.from_random("tiny-turbo", seed=0, dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_prompt1("photo of a forest")
    be.set_prompt2("photo of a city at night")
    be.set_branching(nmb_max_branches=4)
    return be

def test_run_transition_tree_invariants(engine):
    imgs = engine.run_transition(fixed_seeds=[420, 421])
    # 2 outer + 4 stems
    assert len(imgs) == 6
    assert all(im.shape == (128, 128, 3) and im.dtype == np.uint8 for im in imgs)
    # fracts sorted, bounded
    fr = engine.tree_fracts
    assert fr[0] == 0.0 and fr[-1] == 1.0
    assert all(fr[i] < fr[i + 1] for i in range(len(fr) - 1))
    # similarity list tracks gaps
    assert len(engine.tree_similarities) == len(fr) - 1
    # injection bookkeeping: outer are 0, stems equal the level
    assert engine.tree_idx_injection[0] == 0 and engine.tree_idx_injection[-1] == 0
    assert all(ii == engine.list_idx_injection[0] for ii in engine.tree_idx_injection[1:-1])


def test_deterministic_under_fixed_seeds(engine):
    imgs1 = engine.run_transition(fixed_seeds=[11, 22])
    fr1 = list(engine.tree_fracts)
    imgs2 = engine.run_transition(fixed_seeds=[11, 22])
    assert fr1 == list(engine.tree_fracts)
    for a, b in zip(imgs1, imgs2):
        np.testing.assert_array_equal(a, b)


def test_recycle_img1(engine):
    engine.run_transition(fixed_seeds=[1, 2])
    lat1_end = np.asarray(engine.tree_latents[0][-1])
    engine.run_transition(recycle_img1=True, fixed_seeds=[1, 99])
    np.testing.assert_array_equal(np.asarray(engine.tree_latents[0][-1]), lat1_end)


def test_swap_forward(engine):
    engine.run_transition(fixed_seeds=[5, 6])
    last = np.asarray(engine.tree_latents[-1][-1])
    p2 = engine.prompt2
    engine.swap_forward()
    assert engine.prompt1 == p2
    np.testing.assert_array_equal(np.asarray(engine.tree_latents[0][-1]), last)
    assert engine.tree_final_imgs == []
    # restore prompts for other tests
    engine.set_prompt1("photo of a forest")
    engine.set_prompt2("photo of a city at night")


def test_batched_policy_equals_sequential_when_batch1(engine):
    engine.stem_batch = 1
    imgs_seq = engine.run_transition(fixed_seeds=[7, 8])
    fr_seq = list(engine.tree_fracts)
    engine.stem_batch = 0
    imgs_bat = engine.run_transition(fixed_seeds=[7, 8])
    engine.stem_batch = 0
    # same keyframe count; edges within the fused-scan equivalence bar:
    # stem_batch=0 computes edges inside the single fused scan (different
    # XLA batch shape than the sequential per-edge path), which is
    # documented ±1 uint8 LSB of the per-level path (tests/test_fused_tree.py)
    assert len(imgs_seq) == len(imgs_bat)
    for a, b in ((imgs_seq[0], imgs_bat[0]), (imgs_seq[-1], imgs_bat[-1])):
        diff = np.abs(np.asarray(a).astype(np.int16) - np.asarray(b).astype(np.int16))
        assert diff.max() <= 1, f"edge keyframes differ by {diff.max()} LSB"


def test_branch1_crossfeed_changes_branch2(engine):
    engine.set_branch1_crossfeed(0.0, 0.0, 0.0)
    engine.run_transition(fixed_seeds=[3, 4])
    lat2_plain = np.asarray(engine.tree_latents[-1][-1])
    engine.set_branch1_crossfeed(0.8, 0.8, 0.5)
    engine.run_transition(fixed_seeds=[3, 4])
    lat2_fed = np.asarray(engine.tree_latents[-1][-1])
    engine.set_branch1_crossfeed(0.0, 0.0, 0.0)
    assert not np.allclose(lat2_plain, lat2_fed)


def test_state_dict_complete(engine):
    sd = engine.get_state_dict()
    for k in (
        "prompt1", "prompt2", "seed1", "seed2", "num_inference_steps", "guidance_scale",
        "branch1_crossfeed_power", "branch1_crossfeed_range", "branch1_crossfeed_decay",
        "parental_crossfeed_power", "parental_crossfeed_range", "parental_crossfeed_decay",
        "width", "height", "negative_prompt",
    ):
        assert k in sd, k


def test_write_movie(engine, tmp_path):
    engine.run_transition(fixed_seeds=[420, 421])
    fp = str(tmp_path / "t.mp4")
    engine.write_movie_transition(fp, duration_transition=2.0, fps=10)
    import cv2

    cap = cv2.VideoCapture(fp)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 20
