"""DPM-Solver++(2M) (ops/scheduler.dpmpp_2m_step + the denoise-scan wiring).

References: Lu et al., DPM-Solver++ (arXiv:2211.01095); the σ-space update
as popularized by k-diffusion's sample_dpmpp_2m. Beyond-reference
capability (the reference only drives its checkpoints' shipped Euler
variants).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from latentblending_tpu.ops.scheduler import (
    SDXL_BASE_SCHEDULER,
    dpmpp_2m_step,
    make_schedule,
)
from latentblending_tpu.runtime.denoise import Conditioning, DenoisePlan, denoise_scan


def _numpy_dpmpp_2m(x, sigmas, eps_fn):
    """Independent reference loop (k-diffusion sample_dpmpp_2m, σ-space)."""
    old_denoised = None
    traj = []
    for i in range(len(sigmas) - 1):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        denoised = x - s * eps_fn(x, s)
        t = -np.log(s)
        t_next = -np.log(sn) if sn > 0 else np.inf
        h = t_next - t
        ratio = sn / s
        if old_denoised is None or sn == 0:
            d = denoised
        else:
            h_last = t - (-np.log(float(sigmas[i - 1])))
            r = h_last / h
            d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
        x = ratio * x + (-np.expm1(-h)) * d
        old_denoised = denoised
        traj.append(x.copy())
    return traj


def _scan_with_linear_denoiser(sched_state, x0, A, b):
    """Run the real denoise_scan with a fake linear 'UNet' ε̂ = A·x + b."""
    B = x0.shape[0]
    plan = DenoisePlan(
        num_steps=sched_state.num_steps, idx_start=0, batch=B, use_cfg=False, sched="dpmpp_2m"
    )
    cond = Conditioning(
        prompt_embeds=jnp.zeros((B, 1, 1)), pooled_embeds=jnp.zeros((B, 1)), time_ids=jnp.zeros((B, 1))
    )
    unet = lambda p, lat, t, pe, pool, tids: A * lat + b
    M = plan.exec_steps
    mix_window = jnp.broadcast_to(x0[None], (M,) + x0.shape)
    traj = denoise_scan(
        unet, {}, plan, x0, cond, mix_window, jnp.zeros((M, B), jnp.float32),
        jnp.asarray(sched_state.sigmas), jnp.asarray(sched_state.timesteps),
        jnp.zeros((B,), jnp.float32),
    )
    return traj


def test_dpmpp_scan_matches_independent_numpy_loop():
    st = make_schedule(SDXL_BASE_SCHEDULER, 8)
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(2, 4, 4, 4)).astype(np.float32) * st.init_noise_sigma
    A, b = np.float32(0.3), np.float32(0.1)
    traj = np.asarray(_scan_with_linear_denoiser(st, jnp.asarray(x0), jnp.float32(A), jnp.float32(b)))
    # NOTE: the scan's ε̂ sees the input-scaled latent (scale_model_input);
    # mirror that in the numpy eps_fn
    eps_fn = lambda x, s: A * (x / np.sqrt(s**2 + 1.0)) + b
    ref = _numpy_dpmpp_2m(x0.copy(), st.sigmas, eps_fn)
    for j in range(len(ref)):
        np.testing.assert_allclose(traj[j], ref[j], rtol=2e-4, atol=2e-4)


def test_dpmpp_terminal_step_returns_denoised():
    """At σ_next = 0 the update reduces exactly to the x0 prediction."""
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 2, 2, 4)), jnp.float32)
    den = jnp.asarray(np.random.default_rng(2).normal(size=x.shape), jnp.float32)
    old = jnp.asarray(np.random.default_rng(3).normal(size=x.shape), jnp.float32)
    out = dpmpp_2m_step(x, den, old, jnp.float32(5.0), jnp.float32(2.0), jnp.float32(0.0), jnp.bool_(False))
    np.testing.assert_allclose(np.asarray(out), np.asarray(den), rtol=1e-5)


def test_dpmpp_beats_euler_on_nonlinear_ode():
    """Integrating the σ-space probability-flow ODE dx/dσ = ε̂(x,σ) with a
    nonlinear denoiser: 2nd-order DPM++ at N steps must land closer to the
    fine-grid solution than Euler at the same N (the whole point of the
    solver)."""

    def eps_fn(x, s):
        x0_pred = np.tanh(x / 3.0)
        return (x - x0_pred) / s

    sigmas_full = np.exp(np.linspace(np.log(14.6), np.log(0.03), 4000))
    x_true = np.array([5.0])
    for i in range(len(sigmas_full) - 1):
        x_true = x_true + eps_fn(x_true, sigmas_full[i]) * (sigmas_full[i + 1] - sigmas_full[i])

    N = 10
    sigmas = np.concatenate([np.exp(np.linspace(np.log(14.6), np.log(0.03), N)), [0.03]])
    sigmas = sigmas[:-1]  # keep terminal σ > 0 so both solvers integrate the same ODE
    x_e = np.array([5.0])
    for i in range(len(sigmas) - 1):
        x_e = x_e + eps_fn(x_e, sigmas[i]) * (sigmas[i + 1] - sigmas[i])
    x_d = np.array([5.0])
    x_d = _numpy_dpmpp_2m(x_d, sigmas, eps_fn)[-1]
    err_e = abs(float(x_e[0]) - float(x_true[0]))
    err_d = abs(float(x_d[0]) - float(x_true[0]))
    assert err_d < err_e, (err_d, err_e)


def test_holder_scheduler_switch():
    from latentblending_tpu.runtime.holder import SDXLHolder

    dh = SDXLHolder.from_random("tiny-base", dtype=jnp.float32)
    assert dh.schedule.config.scheduler_type == "euler"
    dh.set_scheduler_type("dpmpp_2m")
    assert dh.schedule.config.scheduler_type == "dpmpp_2m"
    te = dh.get_text_embedding("x")
    out = dh.run_diffusion(te, dh.get_noise(3))
    assert np.isfinite(np.asarray(out[-1])).all()
    # steps re-derivation keeps the switched solver
    dh.set_num_inference_steps(6)
    assert dh.schedule.config.scheduler_type == "dpmpp_2m"
    assert dh.schedule.num_steps == 6


def test_engine_transition_with_dpmpp():
    from latentblending_tpu.engine.blending import BlendingEngine
    from latentblending_tpu.runtime.holder import SDXLHolder

    dh = SDXLHolder.from_random("tiny-turbo", dtype=jnp.float32)
    dh.set_scheduler_type("dpmpp_2m")
    be = BlendingEngine(dh, run_benchmark=False, similarity_metric="nlpd")
    be.set_branching(nmb_max_branches=3)
    be.set_prompt1("a")
    be.set_prompt2("b")
    imgs = be.run_transition(fixed_seeds=[1, 2])
    assert len(imgs) >= 3
    assert dh.schedule.config.scheduler_type == "dpmpp_2m"
    assert all(np.isfinite(np.asarray(im)).all() for im in imgs)
