"""Budget-planner honesty: the fused-aware cost model (VERDICT r3 task 5).

The round-3 planner priced a stem at (N−idx)·dt regardless of execution
path, but the fused scan (denoise_scan_tree) runs EVERY batch row for all
N steps — so fused transitions were systematically under-predicted
(BENCH_r03 planner_vs_actual 0.71). predict_transition_time now models
both paths with their true cost shapes, and the LB_FUSED=auto gate picks
the path the model says is faster (falling back to fused when the engine
is uncalibrated).

Reference cost-model anchor: blending_engine.py:504-507.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.runtime.holder import SDXLHolder


@pytest.fixture(scope="module")
def dh():
    return SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)


def _engine(dh, plan):
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_prompt1("a")
    be.set_prompt2("b")
    be.list_idx_injection, be.list_nmb_stems = plan
    return be


def test_per_level_prediction_composes_observed_batch_costs(dh):
    """Per-level arithmetic: edges at dt(2), each round at its own observed
    batch price, decode per stem+edges, 2 sync round-trips per measured
    round."""
    be = _engine(dh, ([2, 3], [3, 1]))
    N = be.num_inference_steps
    be.dt_unet_step = 0.10
    be.dt_vae = 0.01
    be.dt_sync = 0.05
    be.dt_unet_step_fused = 0.08
    be._dt_step_by_batch = {1: 0.30, 2: 0.10, 3: 0.12}
    p = be.predict_transition_time()
    t_expected = (
        2 * N * 0.10                    # edges, one B=2 batch
        + (N - 2) * 3 * 0.12            # level 1: one B=3 round
        + (N - 3) * 1 * 0.30            # level 2: one B=1 round
        + (3 + 1 + 2) * 0.01            # decode: stems + edges
        + 2 * 0.05 * 2                  # 2 measured rounds × 2 syncs
    )
    np.testing.assert_allclose(p["t_per_level_s"], t_expected, rtol=1e-9)
    assert p["t_fused_s"] is None       # multi-level plan: fused ineligible
    assert p["path"] == "per-level"
    assert p["t_predicted_s"] == p["t_per_level_s"]


def test_fused_prediction_prices_all_rows_all_steps(dh):
    """Fused arithmetic: N·(k+2)·dt_fused + one sync — decode excluded
    (overlaps the movie writer)."""
    be = _engine(dh, ([2], [5]))
    N = be.num_inference_steps
    be.dt_unet_step = 0.10
    be.dt_vae = 0.01
    be.dt_sync = 0.05
    be.dt_unet_step_fused = 0.02
    be._dt_step_by_batch = {2: 0.10, 5: 0.11}
    p = be.predict_transition_time()
    np.testing.assert_allclose(p["t_fused_s"], N * 7 * 0.02 + 0.05, rtol=1e-9)
    t_pl = 2 * N * 0.10 + (N - 2) * 5 * 0.11 + 7 * 0.01 + 2 * 0.05
    np.testing.assert_allclose(p["t_per_level_s"], t_pl, rtol=1e-9)
    assert p["path"] == "fused"

    # recycled edge 1: one B=1 edge run; fused batch loses a row
    p2 = be.predict_transition_time(recycled1=True)
    be._dt_step_by_batch[1] = 0.3
    p3 = be.predict_transition_time(recycled1=True)
    np.testing.assert_allclose(p2["t_fused_s"], N * 6 * 0.02 + 0.05, rtol=1e-9)
    assert p3["t_per_level_s"] > p2["t_per_level_s"]  # dt(1) observed pricier


def test_predictive_policy_prices_one_sync(dh):
    be = _engine(dh, ([2], [4]))
    be.dt_unet_step = 0.1
    be.dt_vae = 0.0
    be.dt_sync = 0.5
    be.placement_policy = "predictive"
    p_pred = be.predict_transition_time()["t_per_level_s"]
    be.placement_policy = "measured"
    p_meas = be.predict_transition_time()["t_per_level_s"]
    np.testing.assert_allclose(p_meas - p_pred, 0.5, rtol=1e-9)  # 1 round: 2·s vs 1·s


@pytest.mark.slow
def test_auto_gate_follows_model_and_fused_calibration_is_separate(monkeypatch, dh):
    monkeypatch.delenv("LB_FUSED", raising=False)
    be = _engine(dh, ([2], [3]))
    dt0 = be.dt_unet_step

    # uncalibrated → defaults to fused
    be.run_transition(fixed_seeds=[1, 2])
    assert be.last_report.levels[0].get("fused") is True
    # a WARM fused run calibrates dt_unet_step_fused, NOT the per-level dt
    # (the first run is a cold compile and must not calibrate)
    assert be.dt_unet_step_fused is None
    be.run_transition(fixed_seeds=[1, 2])
    assert be.dt_unet_step_fused is not None and be.dt_unet_step_fused > 0
    assert be.dt_unet_step == dt0

    # calibrated, fused priced prohibitively → auto gate flips to per-level
    # (synthesize EVERY model input, incl. the fused output-dispatch tail
    # the warm run above just measured)
    be.dt_sync = 1e-6
    be.dt_unet_step_fused = 10.0
    be._dt_fused_output = 0.0
    be._dt_step_by_batch = {1: 1e-4, 2: 1e-4, 3: 1e-4}
    be.dt_unet_step = 1e-4
    assert be.predict_transition_time()["path"] == "per-level"
    be.run_transition(fixed_seeds=[1, 2])
    assert not be.last_report.levels[0].get("fused")

    # fused priced cheap again → gate picks fused
    be.dt_unet_step_fused = 1e-6
    assert be.predict_transition_time()["path"] == "fused"
    be.run_transition(fixed_seeds=[1, 2])
    assert be.last_report.levels[0].get("fused") is True

    # LB_FUSED=1 forces fused regardless of the model
    be.dt_unet_step_fused = 10.0
    monkeypatch.setenv("LB_FUSED", "1")
    assert be.predict_transition_time()["path"] == "fused"
    be.run_transition(fixed_seeds=[1, 2])
    assert be.last_report.levels[0].get("fused") is True


def test_measure_sync_overhead_takes_min_and_sets_dt_sync(dh, monkeypatch):
    """dt_sync must reflect the steady-state round-trip, not a one-off
    stall: min over reps, and callable standalone to refresh a stale
    setup-time sample (bench refreshes it after warm-ups)."""
    be = _engine(dh, ([2], [3]))
    assert be.dt_sync is None
    got = be.measure_sync_overhead(reps=3)
    assert got == be.dt_sync
    assert 0.0 <= got < 5.0

    # min semantics: a synthetic slow first sample must not win
    import latentblending_tpu.engine.blending as bl

    walls = iter([100.0, 200.0, 200.005, 200.006, 200.0062])  # compile, then 3 timed reps
    monkeypatch.setattr(bl.time, "time", lambda: next(walls, 200.0063))
    be.measure_sync_overhead(reps=3)
    assert be.dt_sync <= 0.01


def test_transition_report_merged_sums_phases_and_gaps():
    from latentblending_tpu.profiling import TransitionReport

    r1 = TransitionReport(num_keyframes=5, num_steps=4, wall_s=1.0)
    r1.phases = {"denoise": {"total_s": 0.5, "count": 2, "mean_s": 0.25}}
    r1.lpips_gaps = [0.1, 0.2]
    r1.levels = [{"idx_injection": 2}]
    r2 = TransitionReport(num_keyframes=5, num_steps=4, wall_s=2.0)
    r2.phases = {
        "denoise": {"total_s": 1.5, "count": 2, "mean_s": 0.75},
        "lpips_sync": {"total_s": 0.3, "count": 1, "mean_s": 0.3},
    }
    r2.lpips_gaps = [0.3]
    r2.levels = [{"idx_injection": 3}]

    m = TransitionReport.merged([r1, r2])
    # the recycled seam keyframe is shared between parts: 5 + (5-1)
    assert m.num_keyframes == 9
    assert m.wall_s == 3.0
    assert m.phases["denoise"] == {"total_s": 2.0, "count": 4, "mean_s": 0.5}
    assert m.phases["lpips_sync"]["count"] == 1
    assert m.lpips_gaps == [0.1, 0.2, 0.3]
    assert len(m.levels) == 2


def test_calibration_updates_take_min_not_last(dh):
    """Run-time calibration samples min-fold: a contended warm-up (relay
    transfers from the previous run's writer draining during the next
    edge run inflated dt 1.8x -> pva 1.63) cannot RAISE the planner's
    prices; the constructor placeholder is replaced by the first real
    sample; a resolution change drops run-time calibrations."""
    be = _engine(dh, ([2], [3]))
    # placeholder is replaced outright, even though it is smaller
    assert be.dt_unet_step == 0.01 and not be._dt_unet_step_measured
    be._observe_unet_step(0.12)
    assert be.dt_unet_step == 0.12 and be._dt_unet_step_measured
    # a contended (larger) sample is ignored; a faster one folds in
    be._observe_unet_step(0.22)
    assert be.dt_unet_step == 0.12
    be._observe_unet_step(0.11)
    assert be.dt_unet_step == 0.11

    assert be._observe(None, 0.5) == 0.5
    assert be._observe(0.2, 0.5) == 0.2
    assert be._observe(0.2, 0.1) == 0.1

    # resolution change invalidates per-shape calibrations
    be._dt_step_by_batch = {2: 0.1}
    be.dt_unet_step_fused = 0.05
    be._dt_fused_output = 0.2
    h, w = dh.height_img, dh.width_img
    be.set_dimensions((w * 2, h * 2))
    try:
        assert be._dt_step_by_batch == {}
        assert be.dt_unet_step_fused is None
        assert be._dt_fused_output is None
        assert not be._dt_unet_step_measured
    finally:
        be.set_dimensions((w, h))


def test_predictive_rounds_do_not_record_step_costs(dh, monkeypatch):
    """Under placement_policy='predictive' rounds chain asynchronously and
    only the FINAL round syncs — a queue-drain barrier whose wall is not
    that round's cost (observed dt[1]=3.70s vs true 0.13). Such rounds
    must not write _dt_step_by_batch; the synced batched edge run may."""
    monkeypatch.setenv("LB_FUSED", "0")  # force the per-level round path
    be = _engine(dh, ([2], [3]))
    be.placement_policy = "predictive"
    be.run_transition(fixed_seeds=[7, 8])   # cold
    be._dt_step_by_batch.clear()
    be.run_transition(fixed_seeds=[7, 8])   # warm
    assert be.last_report.levels and not be.last_report.levels[0].get("fused")
    assert set(be._dt_step_by_batch) <= {2}, be._dt_step_by_batch

    # measured policy DOES record the round's batch size (valid: every
    # round starts from a drained queue)
    be.placement_policy = "measured"
    be.run_transition(fixed_seeds=[7, 8])
    assert 3 in be._dt_step_by_batch
