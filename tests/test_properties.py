"""Property-based tests (hypothesis) for the pure-math layer: branching
planner, frame fill-up allocation, closest-gap lookup, crossfeed schedules,
and slerp. These generalize the example-based tests in test_schedules.py /
test_interp.py over the whole legal input domain (SURVEY.md §4 unit tier).
"""
import jax.numpy as jnp
import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from latentblending_tpu.ops.interp import interpolate_spherical
from latentblending_tpu.ops.schedules import (
    branch1_crossfeed_coeffs,
    frame_insert_counts,
    get_closest_idx,
    parental_crossfeed_coeffs,
    time_based_branching_plan,
)

# hypothesis defaults to 100 examples; these functions are microseconds each
FAST = settings(max_examples=200, deadline=None)


@FAST
@given(
    num_steps=st.integers(4, 60),
    depth=st.floats(0.1, 0.9),
    dt_unet=st.floats(0.005, 0.5),
    dt_vae=st.floats(0.005, 1.0),
    branches=st.integers(3, 24),
)
def test_planner_branch_mode_invariants(num_steps, depth, dt_unet, dt_vae, branches):
    idx, stems = time_based_branching_plan(
        num_steps, depth, dt_unet, dt_vae, nmb_max_branches=branches
    )
    assert len(idx) == len(stems) >= 1
    assert all(1 <= i < num_steps for i in idx)
    # non-decreasing, not strictly: the undersample path re-linspaces the
    # depth list and may emit duplicate depths when the span is tiny
    # (reference blending_engine.py:521-524 behaves identically)
    assert all(a <= b for a, b in zip(idx, idx[1:]))
    assert all(s >= 1 for s in stems)
    # the greedy loop tops up shallow levels first: stem counts never
    # increase with depth (reference blending_engine.py:509-515)
    assert all(a >= b for a, b in zip(stems, stems[1:]))


@FAST
@given(
    num_steps=st.integers(4, 60),
    depth=st.floats(0.1, 0.9),
    dt_unet=st.floats(0.005, 0.5),
    dt_vae=st.floats(0.005, 1.0),
    budget=st.floats(1.0, 120.0),
)
def test_planner_budget_mode_invariants(num_steps, depth, dt_unet, dt_vae, budget):
    idx, stems = time_based_branching_plan(
        num_steps, depth, dt_unet, dt_vae, t_compute_max_allowed=budget
    )
    assert len(idx) == len(stems) >= 1
    assert all(1 <= i < num_steps for i in idx)
    assert all(s >= 1 for s in stems)
    # the plan the loop STOPPED at exceeds max(budget, minimal plan) by at
    # most one greedy increment (reference semantics: the budget check runs
    # after the increment, and a budget below the minimal plan — one stem
    # per level + both edges — still returns that minimal plan)
    def cost_of(idx_, stems_):
        return (
            sum((num_steps - i) * s for i, s in zip(idx_, stems_)) * dt_unet
            + dt_vae * sum(stems_)
            + 2 * (num_steps * dt_unet + dt_vae)
        )

    idx0 = max(1, int(np.floor(num_steps * depth)))
    stride = int(np.ceil(num_steps / 10))
    minimal_idx = list(range(idx0, num_steps, stride))
    minimal_cost = cost_of(minimal_idx, [1] * len(minimal_idx))
    # two increments, not one: the loop measures cost BEFORE incrementing,
    # so it stops one increment after the first plan that exceeded budget
    one_increment = num_steps * dt_unet + dt_vae
    assert cost_of(idx, stems) <= max(budget, minimal_cost) + 2 * one_increment


@FAST
@given(keyframes=st.integers(2, 120), target=st.integers(2, 2000))
def test_frame_insert_counts_exact_and_even(keyframes, target):
    counts = frame_insert_counts(keyframes, target)
    assert len(counts) == keyframes - 1
    assert (counts >= 0).all()
    if target > keyframes:
        assert counts.sum() == target - keyframes
        # deterministic even spread: gap loads differ by at most one frame
        assert counts.max() - counts.min() <= 1


@FAST
@given(
    interior=st.lists(
        st.floats(0.001, 0.999), min_size=0, max_size=18, unique=True
    ),
    q=st.floats(0.001, 0.999),
)
@example(interior=[0.001, 0.0010000000000000002], q=0.5)  # 1-ulp-apart fracts
def test_get_closest_idx_brackets(interior, q):
    # engine invariant: the fract tree always spans [0, 1] (the two edge
    # keyframes exist before any stem is placed) and queries are interior
    tree = sorted({0.0, 1.0, *interior})
    lo, hi = get_closest_idx(q, tree)
    assert hi == lo + 1
    assert 0 <= lo < hi <= len(tree) - 1
    assert tree[lo] <= q <= tree[hi]


@FAST
@given(
    num_steps=st.integers(1, 60),
    power=st.floats(0.0, 1.0),  # slerp fraction by contract
    range_=st.floats(0.0, 1.0),
    decay=st.floats(0.0, 1.0),
)
def test_crossfeed_coeffs_bounded(num_steps, power, range_, decay):
    for coeffs in (
        branch1_crossfeed_coeffs(num_steps, power, range_, decay),
        parental_crossfeed_coeffs(num_steps, 0, power, range_, decay),
    ):
        assert len(coeffs) == num_steps
        # linspace(power, power*decay): bounded by power, never negative
        assert np.all(coeffs >= 0.0) and np.all(coeffs <= power + 1e-7)
        # beyond the crossfeed range the coefficient is exactly zero
        cutoff = int(round(num_steps * range_))
        assert np.all(np.asarray(coeffs[cutoff:]) == 0.0)


@FAST
@given(
    data=st.lists(st.floats(-3.0, 3.0), min_size=4, max_size=64),
    fract=st.floats(0.0, 1.0),
)
def test_slerp_properties(data, fract):
    v = np.asarray(data, np.float32)
    a = jnp.asarray(v)
    b = jnp.asarray(v[::-1].copy())
    out = np.asarray(interpolate_spherical(a, b, fract))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(
        np.asarray(interpolate_spherical(a, b, 0.0)), v, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(interpolate_spherical(a, b, 1.0)), v[::-1], rtol=1e-5, atol=1e-5
    )
