"""The SEGMENTED multi-level fused transition (denoise_scan_tree_seg) must
reproduce the per-level predictive path exactly for deterministic solvers:
same placement fracts, same keyframes, same stored trajectories — while
executing the whole multi-level plan as ONE device call (VERDICT r4 task 3;
replaces the reference's per-level loop, blending_engine.py:354-362, at
full depth)."""
import numpy as np
import pytest

import jax.numpy as jnp

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.runtime.holder import SDXLHolder

PLAN = ([1, 2, 3], [2, 2, 1])  # three levels on the tiny 4-step schedule


def _build(scheduler=None, plan=PLAN):
    dh = SDXLHolder.from_random("tiny-turbo", seed=0, dtype=jnp.float32)
    if scheduler is not None:
        dh.set_scheduler_type(scheduler)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_prompt1("photo of a cat")
    be.set_prompt2("photo of a dog")
    be.placement_policy = "predictive"
    be.list_idx_injection, be.list_nmb_stems = [list(x) for x in plan]
    return be


def _snapshot(be):
    return (
        list(be.tree_fracts),
        [np.asarray(im).copy() for im in be.tree_final_imgs],
        [np.asarray(t[-1], np.float32).copy() for t in be.tree_latents],
    )


def _assert_trees_match(ref, got):
    fr_r, imgs_r, lat_r = ref
    fr_g, imgs_g, lat_g = got
    assert fr_g == fr_r
    assert len(imgs_g) == len(imgs_r)
    for a, b in zip(imgs_r, imgs_g):
        assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1
    for a, b in zip(lat_r, lat_g):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("scheduler", [None, "dpmpp_2m"])
def test_fused_multi_equals_per_level(monkeypatch, scheduler):
    be = _build(scheduler)
    monkeypatch.setenv("LB_FUSED", "0")
    be.run_transition(fixed_seeds=[5, 6])
    assert not (be.last_report.levels and be.last_report.levels[0].get("fused"))
    ref = _snapshot(be)

    monkeypatch.delenv("LB_FUSED", raising=False)
    be.run_transition(fixed_seeds=[5, 6])
    lv = be.last_report.levels
    assert lv and all(e.get("fused") and e.get("seg") for e in lv)
    assert [e["idx_injection"] for e in lv] == PLAN[0]
    assert [e["stems"] for e in lv] == PLAN[1]
    _assert_trees_match(ref, _snapshot(be))
    # the deepest stems carry their level's injection depth
    assert sorted(set(be.tree_idx_injection)) == [0] + PLAN[0]


def test_fused_multi_recycled_matches_per_level(monkeypatch):
    """Chained transition with recycle_img1: the windowed segmented scan
    must reproduce the per-level recycled predictive path."""

    def chain(fused_second):
        be = _build()
        monkeypatch.setenv("LB_FUSED", "0")
        be.run_transition(fixed_seeds=[5, 6])  # identical first tree both runs
        be.swap_forward()
        be.set_prompt2("photo of a bird")
        if fused_second:
            monkeypatch.delenv("LB_FUSED", raising=False)
        be.run_transition(recycle_img1=True, fixed_seeds=[6, 7])
        return be

    be_r = chain(False)
    assert not be_r.last_report.levels[0].get("fused")
    ref = _snapshot(be_r)
    be_f = chain(True)
    lv = be_f.last_report.levels[0]
    assert lv.get("fused") and lv.get("seg") and lv.get("recycled")
    _assert_trees_match(ref, _snapshot(be_f))


def test_fused_multi_branch1_crossfeed_matches_per_level(monkeypatch):
    def run(fused):
        be = _build()
        be.set_branch1_crossfeed(0.5, 0.7, 0.2)
        if fused:
            monkeypatch.delenv("LB_FUSED", raising=False)
        else:
            monkeypatch.setenv("LB_FUSED", "0")
        be.run_transition(fixed_seeds=[5, 6])
        return be

    be_r = run(False)
    assert not be_r.last_report.levels[0].get("fused")
    ref = _snapshot(be_r)
    be_f = run(True)
    assert be_f.last_report.levels[0].get("seg") is True
    _assert_trees_match(ref, _snapshot(be_f))


def test_fused_multi_requires_predictive_policy(monkeypatch):
    """Measured-policy placements consume device values between levels —
    the multi-level fused path must refuse (structural gate), falling back
    to the per-level path."""
    monkeypatch.delenv("LB_FUSED", raising=False)
    be = _build()
    be.placement_policy = "measured"
    assert not be._multilevel_fusable()
    be.run_transition(fixed_seeds=[5, 6])
    assert not be.last_report.levels[0].get("fused")


def test_fused_multi_ancestral_deterministic_rerun(monkeypatch):
    monkeypatch.delenv("LB_FUSED", raising=False)
    dh = SDXLHolder.from_random("tiny-ancestral", seed=0, dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_prompt1("a")
    be.set_prompt2("b")
    be.placement_policy = "predictive"
    be.list_idx_injection, be.list_nmb_stems = [1, 2], [2, 1]
    a = [np.asarray(im).copy() for im in be.run_transition(fixed_seeds=[1, 2])]
    assert be.last_report.levels[0].get("seg") is True
    b = be.run_transition(fixed_seeds=[1, 2])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, np.asarray(y))


def test_seg_plan_row_steps():
    be = _build()
    segs, row_steps = be._seg_plan(recycled1=False)
    assert segs == [(0, 2), (1, 4), (2, 6), (3, 7)]
    # N=4: 1*2 + 1*4 + 1*6 + 1*7
    assert row_steps == 19
    segs1, row_steps1 = be._seg_plan(recycled1=True)
    assert segs1 == [(0, 1), (1, 3), (2, 5), (3, 6)]
    assert row_steps1 == 15


def test_cost_model_prices_fused_multi():
    be = _build()
    N = be.num_inference_steps
    assert N == 4
    be.dt_unet_step = 0.10
    be.dt_vae = 0.01
    be.dt_sync = 0.05
    be.dt_unet_step_fused_multi = 0.02
    be._dt_fused_output = 0.03
    be._dt_step_by_batch = {1: 0.30, 2: 0.10}
    p = be.predict_transition_time()
    assert p["t_fused_s"] is None  # single-level fused ineligible
    np.testing.assert_allclose(p["t_fused_multi_s"], 19 * 0.02 + 0.03, rtol=1e-9)
    assert p["path"] == "fused-multi"
    assert p["t_predicted_s"] == p["t_fused_multi_s"]
    # priced prohibitively -> per-level wins
    be.dt_unet_step_fused_multi = 10.0
    p2 = be.predict_transition_time()
    assert p2["path"] == "per-level"
    assert p2["t_predicted_s"] == p2["t_per_level_s"]
