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
