"""Incremental tree deepening: BlendingEngine.extend_transition (VERDICT r3
task 6).

Proves the tree-cache resume story end-to-end: an existing tree (from a
live run OR reloaded from disk) can be extended with deeper levels
WITHOUT recomputing any existing trajectory — denoise calls are counted —
and the deepened tree equals a from-scratch run over the combined plan.

Reference counterpart: none (the reference's resume is in-memory
recycle_img1/2 + swap_forward only, blending_engine.py:333-342,:731-742);
this is the build's own SURVEY §5 checkpoint/resume capability.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.engine.tree_cache import load_tree, save_tree
from latentblending_tpu.runtime.holder import SDXLHolder


@pytest.fixture(scope="module")
def dh():
    return SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)


def _counting(monkeypatch, dh):
    """Wrap dh.run_diffusion_batched, recording each call's idx_start."""
    calls = []
    orig = dh.run_diffusion_batched

    def wrapper(*args, **kwargs):
        idx = kwargs.get("idx_start")
        if idx is None and len(args) > 2:
            idx = args[2]
        calls.append(int(idx) if idx is not None else None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(dh, "run_diffusion_batched", wrapper)
    return calls


def _engine(dh, plan=None):
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_prompt1("a forest")
    be.set_prompt2("a city")
    if plan is not None:
        be.list_idx_injection, be.list_nmb_stems = plan
    return be


@pytest.mark.slow
def test_extend_matches_from_scratch_and_skips_recompute(monkeypatch, dh):
    # per-level path for both runs so the denoise call sequences (and hence
    # the deterministic ancestral noise stream indices) line up call-for-call
    monkeypatch.setenv("LB_FUSED", "0")
    calls = _counting(monkeypatch, dh)

    be = _engine(dh, plan=([2], [3]))
    be.run_transition(fixed_seeds=[10, 11])
    n_before = len(calls)
    assert len(be.tree_final_imgs) == 2 + 3

    imgs = be.extend_transition([3], [2])
    # exactly ONE new denoise dispatch, at the new depth — edges and the
    # level-2 stems were NOT recomputed
    assert calls[n_before:] == [3]
    assert len(imgs) == 2 + 3 + 2
    assert be.tree_fracts == sorted(be.tree_fracts)
    assert be.tree_idx_injection.count(3) == 2
    assert len(be.tree_similarities) == len(be.tree_fracts) - 1

    # from-scratch run over the combined plan on a fresh engine
    be2 = _engine(dh, plan=([2, 3], [3, 2]))
    imgs2 = be2.run_transition(fixed_seeds=[10, 11])
    assert be2.tree_fracts == be.tree_fracts
    assert be2.tree_idx_injection == be.tree_idx_injection
    assert len(imgs2) == len(imgs)
    for a, b in zip(imgs, imgs2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_extend_after_load_tree(monkeypatch, tmp_path, dh):
    monkeypatch.setenv("LB_FUSED", "0")
    be = _engine(dh, plan=([2], [2]))
    be.run_transition(fixed_seeds=[5, 6])
    fp = str(tmp_path / "tree.npz")
    save_tree(be, fp)

    be2 = BlendingEngine(dh, run_benchmark=False)
    load_tree(be2, fp)
    calls = _counting(monkeypatch, dh)
    imgs = be2.extend_transition([3], [2])
    # resumed deepening ran only the new level
    assert calls == [3]
    assert len(imgs) == 2 + 2 + 2
    assert be2.tree_fracts == sorted(be2.tree_fracts)
    # the deepened tree renders
    be2.write_movie_transition(str(tmp_path / "m.mp4"), duration_transition=1.0, fps=8)


@pytest.mark.slow
def test_extend_after_fused_run(monkeypatch, dh):
    """extend_transition composes with the fused single-call transition:
    the deferred similarity pass lands before placement, and the new level
    parents onto fused stems."""
    monkeypatch.setenv("LB_FUSED", "1")
    be = _engine(dh, plan=([2], [3]))
    be.run_transition(fixed_seeds=[1, 2])
    assert be.last_report.levels and be.last_report.levels[0].get("fused")
    calls = _counting(monkeypatch, dh)
    imgs = be.extend_transition([3], [2])
    assert calls == [3]
    assert len(imgs) == 2 + 3 + 2
    assert be.tree_fracts == sorted(be.tree_fracts)


def test_extend_requires_tree(dh):
    be = BlendingEngine(dh, run_benchmark=False)
    be.tree_latents = [None, None]
    with pytest.raises(AssertionError, match="existing tree"):
        be.extend_transition([2], [1])
