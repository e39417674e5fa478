"""The fused single-call transition (denoise_scan_tree) must reproduce the
per-level path exactly for deterministic solvers: same placement fracts,
same keyframes, same stored trajectories."""
import numpy as np
import pytest

import jax.numpy as jnp

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.runtime.holder import SDXLHolder


def _build(spec="tiny-turbo"):
    dh = SDXLHolder.from_random(spec, seed=0, dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_prompt1("photo of a cat")
    be.set_prompt2("photo of a dog")
    be.set_branching(nmb_max_branches=5)
    return be


def test_fused_equals_per_level_euler(monkeypatch):
    # tiny-turbo ships the deterministic Euler schedule — bitwise-stable
    # comparison modulo batch-size fp reassociation
    be = _build()
    monkeypatch.setenv("LB_FUSED", "0")
    imgs_ref = [np.asarray(im).copy() for im in be.run_transition(fixed_seeds=[5, 6])]
    fr_ref = list(be.tree_fracts)
    lat_ref = [np.asarray(t[-1], np.float32).copy() for t in be.tree_latents]
    assert not (be.last_report.levels and be.last_report.levels[0].get("fused"))

    monkeypatch.delenv("LB_FUSED", raising=False)
    imgs_f = be.run_transition(fixed_seeds=[5, 6])
    assert be.last_report.levels and be.last_report.levels[0].get("fused") is True
    assert list(be.tree_fracts) == fr_ref
    for a, b in zip(imgs_ref, imgs_f):
        assert np.abs(a.astype(np.int16) - np.asarray(b).astype(np.int16)).max() <= 1
    for a, t in zip(lat_ref, be.tree_latents):
        np.testing.assert_allclose(a, np.asarray(t[-1], np.float32), rtol=2e-4, atol=2e-4)


def test_fused_report_and_similarities(tmp_path):
    be = _build()
    be.run_movie_transition(str(tmp_path / "m.mp4"), duration_transition=1.0, fixed_seeds=[7, 8])
    assert be.last_report.levels[0].get("fused") is True
    K = len(be.tree_final_imgs)
    assert K == 7  # 2 edges + 5 stems
    assert len(be.tree_similarities) == K - 1
    assert all(isinstance(s, float) and s >= 0 for s in be.tree_similarities)
    assert all(np.asarray(im).dtype == np.uint8 for im in be.tree_final_imgs)


def test_fused_ancestral_deterministic_rerun():
    dh = SDXLHolder.from_random("tiny-ancestral", seed=0, dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_prompt1("a")
    be.set_prompt2("b")
    be.set_branching(nmb_max_branches=4)
    a = [np.asarray(im).copy() for im in be.run_transition(fixed_seeds=[1, 2])]
    assert be.last_report.levels[0].get("fused") is True
    b = be.run_transition(fixed_seeds=[1, 2])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, np.asarray(y))


def test_fused_falls_back_when_preconditions_unmet(monkeypatch):
    # recycled edge 1 → STILL fused (windowed variant)
    be = _build()
    be.run_transition(fixed_seeds=[5, 6])
    be.swap_forward()
    be.set_prompt2("photo of a bird")
    be.run_transition(recycle_img1=True, fixed_seeds=[6, 7])
    lvl = be.last_report.levels[0]
    assert lvl.get("fused") is True and lvl.get("recycled") is True
    # recycled edge 2 → per-level path (no window support on that side)
    be.run_transition(recycle_img2=True, fixed_seeds=[6, 7])
    assert not be.last_report.levels[0].get("fused")
    # stem_batch=1 (reference policy) → per-level path
    be2 = _build()
    be2.stem_batch = 1
    be2.run_transition(fixed_seeds=[5, 6])
    assert not be2.last_report.levels[0].get("fused")


def test_fused_recycled_matches_per_level(monkeypatch):
    """Chained transition with recycle_img1: the windowed fused scan must
    reproduce the per-level recycled path."""
    def chain(fused_second):
        be = _build()
        monkeypatch.setenv("LB_FUSED", "0")
        be.run_transition(fixed_seeds=[5, 6])  # identical first tree both runs
        be.swap_forward()
        be.set_prompt2("photo of a bird")
        if fused_second:
            monkeypatch.delenv("LB_FUSED", raising=False)
        imgs = [np.asarray(im).copy() for im in be.run_transition(recycle_img1=True, fixed_seeds=[6, 7])]
        return be, imgs

    be_r, imgs_r = chain(False)
    assert not be_r.last_report.levels[0].get("fused")
    be_f, imgs_f = chain(True)
    lvl = be_f.last_report.levels[0]
    assert lvl.get("fused") is True and lvl.get("recycled") is True
    assert list(be_f.tree_fracts) == list(be_r.tree_fracts)
    assert len(imgs_f) == len(imgs_r)
    for a, b in zip(imgs_r, imgs_f):
        assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1
    for ta, tb in zip(be_r.tree_latents, be_f.tree_latents):
        np.testing.assert_allclose(
            np.asarray(ta[-1], np.float32), np.asarray(tb[-1], np.float32), rtol=2e-4, atol=2e-4
        )


def test_fused_branch1_crossfeed_matches_per_level(monkeypatch):
    """branch1 crossfeed folded into the fused scan (edge 2 mixes toward the
    live edge-1 row) must match the sequential per-level path."""
    def run(fused):
        be = _build()
        be.set_branch1_crossfeed(0.5, 0.7, 0.2)
        if fused:
            monkeypatch.delenv("LB_FUSED", raising=False)
        else:
            monkeypatch.setenv("LB_FUSED", "0")
        imgs = [np.asarray(im).copy() for im in be.run_transition(fixed_seeds=[5, 6])]
        return be, imgs

    be_r, imgs_r = run(False)
    assert not be_r.last_report.levels[0].get("fused")
    be_f, imgs_f = run(True)
    assert be_f.last_report.levels[0].get("fused") is True
    assert list(be_f.tree_fracts) == list(be_r.tree_fracts)
    for a, b in zip(imgs_r, imgs_f):
        assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1
    for ta, tb in zip(be_r.tree_latents, be_f.tree_latents):
        np.testing.assert_allclose(
            np.asarray(ta[-1], np.float32), np.asarray(tb[-1], np.float32), rtol=2e-4, atol=2e-4
        )


def test_fused_dpmpp_matches_per_level(monkeypatch):
    """DPM-Solver++(2M) in the fused scan: per-row pin gating must keep the
    2nd-order history clean — results equal to the per-level path."""
    def run(fused):
        dh = SDXLHolder.from_random("tiny-turbo", seed=0, dtype=jnp.float32)
        dh.set_scheduler_type("dpmpp_2m")
        be = BlendingEngine(dh, run_benchmark=False)
        be.set_prompt1("photo of a cat")
        be.set_prompt2("photo of a dog")
        be.set_branching(nmb_max_branches=5)
        if fused:
            monkeypatch.delenv("LB_FUSED", raising=False)
        else:
            monkeypatch.setenv("LB_FUSED", "0")
        imgs = [np.asarray(im).copy() for im in be.run_transition(fixed_seeds=[5, 6])]
        return be, imgs

    be_r, imgs_r = run(False)
    assert not be_r.last_report.levels[0].get("fused")
    be_f, imgs_f = run(True)
    assert be_f.last_report.levels[0].get("fused") is True
    assert list(be_f.tree_fracts) == list(be_r.tree_fracts)
    for a, b in zip(imgs_r, imgs_f):
        assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1
    for ta, tb in zip(be_r.tree_latents, be_f.tree_latents):
        np.testing.assert_allclose(
            np.asarray(ta[-1], np.float32), np.asarray(tb[-1], np.float32), rtol=2e-4, atol=2e-4
        )
