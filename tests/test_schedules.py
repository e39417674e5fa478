import numpy as np
import pytest

from latentblending_tpu.ops import (
    branch1_crossfeed_coeffs,
    frame_insert_counts,
    get_closest_idx,
    guidance_mid_dampening,
    parental_crossfeed_coeffs,
    time_based_branching_plan,
    turbo_branching_plan,
)


def test_branch1_coeffs_match_reference_formula():
    # reference blending_engine.py:406-408 with power=.6, range=.5, decay=.2, N=10
    N, power, rng_, decay = 10, 0.6, 0.5, 0.2
    idx_stop = int(round(N * rng_))
    want = list(np.linspace(power, power * decay, idx_stop)) + [0.0] * (N - idx_stop)
    got = branch1_crossfeed_coeffs(N, power, rng_, decay)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_branch1_coeffs_zero_power():
    got = branch1_crossfeed_coeffs(8, 0.0, 1.0, 1.0)
    assert got.shape == (8,)
    assert np.all(got == 0)


def test_parental_coeffs_match_reference_formula():
    # reference blending_engine.py:452-457: power .3, range .6, decay .9, N=30, idx_inj 15
    N, idx_inj, power, rng_, decay = 30, 15, 0.3, 0.6, 0.9
    idx_stop = int(round(N * rng_))
    want = idx_inj * [power]
    want += list(np.linspace(power, power * decay, idx_stop - idx_inj))
    want += [0.0] * (N - len(want))
    got = parental_crossfeed_coeffs(N, idx_inj, power, rng_, decay)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_parental_coeffs_injection_past_range():
    # nmb_mixing <= 0 path: constant power then zeros
    got = parental_crossfeed_coeffs(10, 8, 0.5, 0.5, 0.9)
    np.testing.assert_allclose(got[:8], 0.5)
    np.testing.assert_allclose(got[8:], 0.0)


def test_guidance_mid_dampening():
    # reference blending_engine.py:155-164
    g, damper = 4.0, 0.5
    # at the edges mid_factor=0 → guidance == base
    assert guidance_mid_dampening(0.0, g, damper) == pytest.approx(g)
    assert guidance_mid_dampening(1.0, g, damper) == pytest.approx(g)
    # at the middle: g - (g*(1-damper) - 1)
    assert guidance_mid_dampening(0.5, g, damper) == pytest.approx(g - (g * 0.5 - 1.0))


def test_turbo_branching_defaults():
    idx, stems = turbo_branching_plan(4, None, None)
    assert idx == [2] and stems == [10]
    idx, stems = turbo_branching_plan(4, 0.75, 6)
    assert idx == [3] and stems == [6]


def test_time_based_branching_budget_mode():
    # synthetic timings: each unet step 0.1s, vae 0.2s, N=30, depth 0.5
    idx, stems = time_based_branching_plan(30, 0.5, 0.1, 0.2, t_compute_max_allowed=20.0)
    assert idx[0] == 15
    assert np.all(np.diff(idx) == 3)  # ceil(30/10) spacing
    # budget respected by construction of the greedy loop (it overshoots by
    # one increment exactly like the reference)
    steps = (30 - np.array(idx)) * np.array(stems)
    t = steps.sum() * 0.1 + 0.2 * np.sum(stems) + 2 * (30 * 0.1 + 0.2)
    assert t > 20.0  # greedy loop stops on first overshoot
    stems_minus = np.array(stems).copy()
    # removing the last increment must be within budget
    assert t - min(30 - np.array(idx)) * 0.1 - 0.0 <= t


def test_time_based_branching_branch_count_mode():
    idx, stems = time_based_branching_plan(30, 0.5, 0.1, 0.2, nmb_max_branches=10)
    assert np.sum(stems) >= 8  # 10 - 2 outer


def test_time_based_branching_undersample():
    # tiny branch budget triggers the undersample path (reference :521-524)
    idx, stems = time_based_branching_plan(30, 0.5, 0.1, 0.2, nmb_max_branches=5)
    assert len(idx) == 3 and all(s == 1 for s in stems)


def test_time_based_branching_requires_exactly_one_criterion():
    with pytest.raises(ValueError):
        time_based_branching_plan(30, 0.5, 0.1, 0.2)
    with pytest.raises(ValueError):
        time_based_branching_plan(30, 0.5, 0.1, 0.2, t_compute_max_allowed=10, nmb_max_branches=5)


def test_get_closest_idx():
    # reference docstring example (blending_engine.py:770-773)
    assert get_closest_idx(0.4, [0.0, 0.3, 0.6, 1.0]) == (1, 2)
    assert get_closest_idx(0.05, [0.0, 0.3, 0.6, 1.0]) == (0, 1)


def test_frame_insert_counts_exact():
    for K, target in [(5, 360), (12, 360), (7, 100), (3, 4), (11, 359)]:
        counts = frame_insert_counts(K, target)
        assert counts.sum() + K == target
    # no frames missing
    assert frame_insert_counts(5, 5).sum() == 0
    assert frame_insert_counts(5, 3).sum() == 0
