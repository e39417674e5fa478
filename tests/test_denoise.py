"""The denoise scan vs a straight-line python re-derivation of the
reference's sequential loop semantics (reference diffusers_holder.py:312-359):
injection at idx_start, per-step crossfeed slerp toward a mixing trajectory,
CFG combine, Euler step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentblending_tpu.ops.interp import interpolate_spherical
from latentblending_tpu.ops.scheduler import SDXL_TURBO_SCHEDULER, make_schedule
from latentblending_tpu.runtime.denoise import (
    Conditioning,
    DenoisePlan,
    DenoiseRunner,
    build_mix_inputs,
)

H = W = 8
N = 4


def fake_unet(params, latents, t, prompt_embeds, pooled, time_ids):
    """Deterministic stand-in for the UNet: eps depends on latents, t and the
    conditioning so CFG and batching bugs are visible."""
    bias = jnp.mean(prompt_embeds, axis=(1, 2))[:, None, None, None]
    return 0.1 * latents + 0.01 * jnp.sin(t) + 0.05 * bias


def reference_loop(latents_start, idx_start, mix_traj, coeffs, sched, embeds, guidance=None, neg_embeds=None, guidance_rescale=0.0):
    """Reference-semantics sequential loop (dh:312-359) for a single branch."""
    latents = None
    out = []
    for i in range(N):
        if i < idx_start:
            out.append(None)
            continue
        elif i == idx_start:
            latents = latents_start
        if i > 0 and coeffs is not None and coeffs[i] > 0:
            latents = interpolate_spherical(latents, mix_traj[i - 1], float(coeffs[i]))
        sigma, sigma_next = float(sched.sigmas[i]), float(sched.sigmas[i + 1])
        t = float(sched.timesteps[i])
        lmi = latents / np.sqrt(sigma**2 + 1)
        if guidance is not None:
            eps_u = fake_unet(None, lmi, jnp.float32(t), neg_embeds, None, None)
            eps_t = fake_unet(None, lmi, jnp.float32(t), embeds, None, None)
            eps = eps_u + guidance * (eps_t - eps_u)
            if guidance_rescale > 0.0:
                # diffusers rescale_noise_cfg (reference dh:351-353)
                std_t = jnp.std(eps_t)
                std_cfg = jnp.std(eps)
                eps = guidance_rescale * (eps * (std_t / std_cfg)) + (1.0 - guidance_rescale) * eps
        else:
            eps = fake_unet(None, lmi, jnp.float32(t), embeds, None, None)
        latents = latents + eps * (sigma_next - sigma)
        out.append(np.asarray(latents))
    return out


def _cond(B, key, dim=16):
    e = jax.random.normal(key, (B, 7, dim))
    return Conditioning(
        prompt_embeds=e,
        pooled_embeds=jnp.zeros((B, 4)),
        time_ids=jnp.zeros((B, 6)),
        neg_prompt_embeds=jnp.zeros((B, 7, dim)),
        neg_pooled_embeds=jnp.zeros((B, 4)),
        neg_time_ids=jnp.zeros((B, 6)),
    )


@pytest.fixture(scope="module")
def sched():
    return make_schedule(SDXL_TURBO_SCHEDULER, N)


def test_full_trajectory_no_mixing(sched):
    runner = DenoiseRunner(fake_unet)
    B = 2
    key = jax.random.PRNGKey(0)
    lat0 = jax.random.normal(key, (B, H, W, 4)) * sched.init_noise_sigma
    cond = _cond(B, jax.random.PRNGKey(1))
    plan = DenoisePlan(num_steps=N, idx_start=0, batch=B, use_cfg=False)
    mw, mc = build_mix_inputs(N, 0, None, None, lat0)
    traj = runner.run(plan, None, lat0, cond, mw, mc, sched, jnp.zeros((B,)))
    assert traj.shape == (N, B, H, W, 4)
    for b in range(B):
        ref = reference_loop(
            lat0[b : b + 1], 0, None, None, sched, cond.prompt_embeds[b : b + 1]
        )
        for i in range(N):
            np.testing.assert_allclose(np.asarray(traj[i, b])[None][0], ref[i][0], rtol=2e-5, atol=2e-5)


def test_injection_and_crossfeed_match_reference_semantics(sched):
    runner = DenoiseRunner(fake_unet)
    B, idx_start = 3, 2
    key = jax.random.PRNGKey(2)
    # a fake parental-mix trajectory over all N steps
    mix_traj = jax.random.normal(key, (N, B, H, W, 4))
    lat0 = mix_traj[idx_start - 1]  # reference: latents_start = parental_mix[idx-1]
    coeffs = np.array([0.5, 0.5, 0.5, 0.25], np.float32)
    cond = _cond(B, jax.random.PRNGKey(3))
    plan = DenoisePlan(num_steps=N, idx_start=idx_start, batch=B, use_cfg=False)
    mw, mc = build_mix_inputs(N, idx_start, mix_traj, coeffs, lat0)
    traj = runner.run(plan, None, lat0, cond, mw, mc, sched, jnp.zeros((B,)))
    assert traj.shape == (N - idx_start, B, H, W, 4)
    for b in range(B):
        ref = reference_loop(
            lat0[b : b + 1],
            idx_start,
            [mix_traj[i, b : b + 1] for i in range(N)],
            coeffs,
            sched,
            cond.prompt_embeds[b : b + 1],
        )
        for j, i in enumerate(range(idx_start, N)):
            np.testing.assert_allclose(np.asarray(traj[j, b]), ref[i][0], rtol=2e-4, atol=2e-4)


def test_cfg_combine(sched):
    runner = DenoiseRunner(fake_unet)
    B = 2
    lat0 = jax.random.normal(jax.random.PRNGKey(4), (B, H, W, 4)) * sched.init_noise_sigma
    cond = _cond(B, jax.random.PRNGKey(5))
    g = 4.0
    plan = DenoisePlan(num_steps=N, idx_start=0, batch=B, use_cfg=True)
    mw, mc = build_mix_inputs(N, 0, None, None, lat0)
    traj = runner.run(plan, None, lat0, cond, mw, mc, sched, jnp.full((B,), g))
    for b in range(B):
        ref = reference_loop(
            lat0[b : b + 1],
            0,
            None,
            None,
            sched,
            cond.prompt_embeds[b : b + 1],
            guidance=g,
            neg_embeds=cond.neg_prompt_embeds[b : b + 1],
        )
        np.testing.assert_allclose(np.asarray(traj[-1, b]), ref[-1][0], rtol=2e-4, atol=2e-4)


def test_guidance_rescale_matches_reference_semantics(sched):
    """CFG rescale (arXiv:2305.08891; reference dh:351-353) changes the
    combined eps exactly like the reference formula — per stem."""
    runner = DenoiseRunner(fake_unet)
    B, g, phi = 1, 7.5, 0.7
    lat0 = jax.random.normal(jax.random.PRNGKey(8), (B, H, W, 4)) * sched.init_noise_sigma
    cond = _cond(B, jax.random.PRNGKey(9))
    plan = DenoisePlan(num_steps=N, idx_start=0, batch=B, use_cfg=True, guidance_rescale=phi)
    mw, mc = build_mix_inputs(N, 0, None, None, lat0)
    traj = runner.run(plan, None, lat0, cond, mw, mc, sched, jnp.full((B,), g))
    ref = reference_loop(
        lat0, 0, None, None, sched, cond.prompt_embeds,
        guidance=g, neg_embeds=cond.neg_prompt_embeds, guidance_rescale=phi,
    )
    np.testing.assert_allclose(np.asarray(traj[-1, 0]), ref[-1][0], rtol=2e-4, atol=2e-4)
    # and it must actually differ from the unrescaled trajectory
    plan0 = DenoisePlan(num_steps=N, idx_start=0, batch=B, use_cfg=True)
    traj0 = runner.run(plan0, None, lat0, cond, mw, mc, sched, jnp.full((B,), g))
    assert float(jnp.abs(traj[-1] - traj0[-1]).max()) > 1e-6


def test_guidance_rescale_plumbing_holder_engine():
    """set_guidance_rescale flows engine → holder → DenoisePlan and alters
    the produced keyframes (VERDICT #7: previously dead capability)."""
    from latentblending_tpu.engine.blending import BlendingEngine
    from latentblending_tpu.runtime.holder import SDXLHolder

    dh = SDXLHolder.from_random("tiny-base", dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_num_inference_steps(4)
    be.set_branching(nmb_max_branches=3)
    be.set_prompt1("a")
    be.set_prompt2("b")
    imgs_plain = [np.asarray(x) for x in be.run_transition(fixed_seeds=[1, 2])]
    be.set_guidance_rescale(0.7)
    assert dh.guidance_rescale == 0.7
    imgs_rescaled = [np.asarray(x) for x in be.run_transition(fixed_seeds=[1, 2])]
    assert any(
        np.abs(a.astype(np.int32) - b.astype(np.int32)).max() > 0
        for a, b in zip(imgs_plain, imgs_rescaled)
    )


def test_batched_equals_sequential(sched):
    """Stems batched together must produce the same result as run alone —
    the correctness contract of batched-tree data parallelism."""
    runner = DenoiseRunner(fake_unet)
    B = 4
    lat0 = jax.random.normal(jax.random.PRNGKey(6), (B, H, W, 4)) * sched.init_noise_sigma
    cond = _cond(B, jax.random.PRNGKey(7))
    plan = DenoisePlan(num_steps=N, idx_start=0, batch=B, use_cfg=False)
    mw, mc = build_mix_inputs(N, 0, None, None, lat0)
    traj = runner.run(plan, None, lat0, cond, mw, mc, sched, jnp.zeros((B,)))
    for b in range(B):
        plan1 = DenoisePlan(num_steps=N, idx_start=0, batch=1, use_cfg=False)
        cond1 = Conditioning(
            prompt_embeds=cond.prompt_embeds[b : b + 1],
            pooled_embeds=cond.pooled_embeds[b : b + 1],
            time_ids=cond.time_ids[b : b + 1],
            neg_prompt_embeds=cond.neg_prompt_embeds[b : b + 1],
            neg_pooled_embeds=cond.neg_pooled_embeds[b : b + 1],
            neg_time_ids=cond.neg_time_ids[b : b + 1],
        )
        mw1, mc1 = build_mix_inputs(N, 0, None, None, lat0[b : b + 1])
        t1 = runner.run(plan1, None, lat0[b : b + 1], cond1, mw1, mc1, sched, jnp.zeros((1,)))
        np.testing.assert_allclose(np.asarray(traj[:, b]), np.asarray(t1[:, 0]), rtol=1e-5, atol=1e-5)
