"""SDXL-base engine path on the tiny model: CFG, guidance mid-dampening,
time-based branching with measured step times (reference base defaults,
blending_engine.py:285-293)."""
import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.runtime.holder import SDXLHolder


@pytest.fixture(scope="module")
def base_engine():
    dh = SDXLHolder.from_random("tiny-base", seed=0, dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_num_inference_steps(8)
    be.set_prompt1("a painting of a mountain")
    be.set_prompt2("a photo of the ocean")
    return be


def test_base_defaults(base_engine):
    be = base_engine
    assert not be.dh.is_sdxl_turbo
    assert be.guidance_scale_base == 4.0
    assert be.dh.do_classifier_free_guidance
    # parental crossfeed defaults for base
    assert (be.parental_crossfeed_power, be.parental_crossfeed_range, be.parental_crossfeed_decay) == (0.3, 0.6, 0.9)


def test_parental_crossfeed_honors_args_on_base(base_engine):
    be = base_engine
    be.set_parental_crossfeed(0.5, 0.7, 0.2)
    assert (be.parental_crossfeed_power, be.parental_crossfeed_range, be.parental_crossfeed_decay) == (0.5, 0.7, 0.2)
    be.set_parental_crossfeed()  # back to defaults


def test_budget_mode_planning(base_engine):
    be = base_engine
    be.dt_unet_step, be.dt_vae = 0.05, 0.1
    be.set_branching(depth_strength=0.5, t_compute_max_allowed=10)
    assert be.list_idx_injection[0] == 4  # floor(8*0.5)
    assert len(be.list_idx_injection) == len(be.list_nmb_stems)
    # cost model: removing the planner's final increment fits the budget
    steps = (8 - np.array(be.list_idx_injection)) * np.array(be.list_nmb_stems)
    t = steps.sum() * 0.05 + 0.1 * np.sum(be.list_nmb_stems) + 2 * (8 * 0.05 + 0.1)
    assert t > 10  # greedy overshoot, like the reference
    assert t - 10 < (8 * 0.05 + 0.1) * 2  # but only by ~one branch


@pytest.mark.slow
def test_base_transition_with_cfg(base_engine):
    be = base_engine
    be.set_branching(depth_strength=0.5, nmb_max_branches=4)
    imgs = be.run_transition(fixed_seeds=[10, 20])
    assert len(imgs) >= 4
    fr = be.tree_fracts
    assert all(fr[i] < fr[i + 1] for i in range(len(fr) - 1))
    # mid-dampening engaged during the run: effective guidance differs from base
    g_mid = be._guidance_at(0.5)
    assert g_mid < be.guidance_scale_base


def test_predictive_plan_spreads_dyadically(base_engine):
    """Regression: predicted-split bookkeeping must be adopted in the
    planner's argmax order. Replaying the halvings in insert (fract) order
    is order-dependent — it once left tree_similarities as [0.5, 0.25,
    0.125, 0.125] after a 3-stem round and drove every later level into
    the leftmost gap (fracts 1/32, 1/64, ...). The correct predictive
    policy reproduces the dyadic spread of the reference's measured argmax
    under uniform perceptual distance."""
    be = base_engine
    be.tree_fracts = [0.0, 1.0]
    be.tree_idx_injection = [0, 0]
    be.tree_similarities = [1.0]
    for idx, k in zip([15, 18, 21, 24, 27], [3, 2, 1, 1, 1]):
        placements, sims = be._plan_placements(k, idx)
        for f, _, _ in sorted(placements):
            i = next(j for j, g in enumerate(be.tree_fracts) if g > f)
            be.tree_fracts.insert(i, f)
            be.tree_idx_injection.insert(i, idx)
        be.tree_similarities = sims
    assert be.tree_fracts == [0.0, 0.0625, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0]
    assert be.tree_similarities == [0.0625] * 2 + [0.125] * 7


def test_predictive_placement_policy(tmp_path):
    """placement_policy='predictive': multi-level plans place by predicted
    gap splitting with zero inter-level syncs — valid sorted tree, measured
    report sims, deterministic re-run."""
    import jax.numpy as jnp

    from latentblending_tpu.engine.blending import BlendingEngine
    from latentblending_tpu.runtime.holder import SDXLHolder

    def run():
        dh = SDXLHolder.from_random("tiny-base", seed=0, dtype=jnp.float32)
        be = BlendingEngine(dh, run_benchmark=False)
        be.placement_policy = "predictive"
        be.set_num_inference_steps(10)
        be.set_branching(nmb_max_branches=6)
        assert len(be.list_idx_injection) > 1  # multi-level plan
        be.set_prompt1("a")
        be.set_prompt2("b")
        imgs = be.run_transition(fixed_seeds=[3, 4])
        return be, [np.asarray(im).copy() for im in imgs]

    be, imgs = run()
    K = len(imgs)
    assert K == 2 + sum(be.list_nmb_stems)
    assert be.tree_fracts == sorted(be.tree_fracts)
    # the report carries MEASURED similarities (deferred last-round pass)
    assert len(be.last_report.lpips_gaps) == K - 1
    assert all(s >= 0 for s in be.last_report.lpips_gaps)
    # deterministic across runs
    be2, imgs2 = run()
    assert be2.tree_fracts == be.tree_fracts
    for a, b in zip(imgs, imgs2):
        np.testing.assert_array_equal(a, b)
    # config round-trips the policy
    cfg = be.get_config()
    assert cfg.placement_policy == "predictive"
    dh3 = SDXLHolder.from_random("tiny-base", seed=0, dtype=jnp.float32)
    be3 = BlendingEngine(dh3, run_benchmark=False)
    be3.apply_config(cfg)
    assert be3.placement_policy == "predictive"
