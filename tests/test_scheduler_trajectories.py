"""Closed-form multi-step solver trajectory goldens (VERDICT r3 task 7).

Second fidelity triangulation that needs NO weights: a fixed, closed-form
epsilon-hat sequence is driven through euler / euler_ancestral / dpmpp_2m for
N=4 (turbo trailing spacing) and N=30 (base leading spacing), and the
production solver steps (ops/scheduler.py) must reproduce trajectories
hand-derived IN THIS FILE from the published formulas:

- EulerDiscreteScheduler.step (diffusers), epsilon prediction:
    x_{i+1} = x_i + eps_i * (sigma_{i+1} - sigma_i)
- EulerAncestralDiscreteScheduler.step (diffusers):
    sigma_up^2 = sigma_next^2 (sigma^2 - sigma_next^2) / sigma^2
    sigma_down = sqrt(sigma_next^2 - sigma_up^2)
    x_{i+1} = x_i + eps_i (sigma_down - sigma_i) + z_i sigma_up
- DPM-Solver++(2M) (Lu et al., arXiv:2211.01095; k-diffusion
  sample_dpmpp_2m), sigma-space with x0_i = x_i - sigma_i eps_i:
    t = -ln sigma, h = t_{i+1} - t_i, r = (t_i - t_{i-1}) / h
    D = (1 + 1/2r) x0_i - (1/2r) x0_{i-1}   (first step / terminal: D = x0_i)
    x_{i+1} = (sigma_{i+1}/sigma_i) x_i - expm1(-h) D

The independent float64 implementations below are themselves pinned by
hard-coded golden literals, so a regression in the production solver math
cannot hide behind "no weights", and a co-evolving edit of this file's
reimplementation trips the literals. Reference behavior anchor:
/root/reference/latentblending/diffusers_holder.py:330 (scale_model_input)
and :356 (scheduler.step).
"""
import numpy as np
import pytest

from latentblending_tpu.ops.scheduler import (
    SDXL_BASE_SCHEDULER,
    SDXL_TURBO_SCHEDULER,
    dpmpp_2m_step,
    euler_ancestral_step,
    euler_step,
    make_schedule,
)

# ---------------------------------------------------------------- fixtures
# Closed-form input sequences — no RNG, no library dependence.


def _eps(i: int) -> float:
    """Fixed pseudo model output for step i."""
    return 0.1 + 0.7 * np.sin(3.0 * i + 1.0)


def _z(i: int) -> float:
    """Fixed ancestral noise draw for step i."""
    return 0.8 * np.cos(2.0 * i + 0.5)


def _sigmas(spacing: str, n: int) -> np.ndarray:
    """Independent float64 re-derivation of the scaled_linear sigma table
    (diffusers EulerDiscreteScheduler.set_timesteps semantics)."""
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64) ** 2
    ab = np.cumprod(1.0 - betas)
    train = np.sqrt((1.0 - ab) / ab)
    if spacing == "trailing":
        ts = np.round(np.arange(1000, 0, -1000.0 / n)) - 1
    elif spacing == "leading":
        ts = (np.arange(n, dtype=np.float64) * (1000 // n)).round()[::-1] + 1
    else:
        raise ValueError(spacing)
    sig = np.interp(ts, np.arange(1000), train)
    return np.concatenate([sig, [0.0]])


def _euler_traj(sig: np.ndarray, x0: float) -> np.ndarray:
    x, out = x0, []
    for i in range(len(sig) - 1):
        x = x + _eps(i) * (sig[i + 1] - sig[i])
        out.append(x)
    return np.asarray(out)


def _ancestral_traj(sig: np.ndarray, x0: float) -> np.ndarray:
    x, out = x0, []
    for i in range(len(sig) - 1):
        s, sn = sig[i], sig[i + 1]
        up2 = sn**2 * (s**2 - sn**2) / s**2
        up = np.sqrt(max(up2, 0.0))
        down = np.sqrt(max(sn**2 - up2, 0.0))
        x = x + _eps(i) * (down - s) + _z(i) * up
        out.append(x)
    return np.asarray(out)


def _dpmpp_traj(sig: np.ndarray, x0: float) -> np.ndarray:
    x, old, out = x0, None, []
    for i in range(len(sig) - 1):
        s, sn = sig[i], sig[i + 1]
        den = x - s * _eps(i)
        if sn == 0.0:
            x = den  # expm1 update degenerates exactly to x0_i
        else:
            h = np.log(s) - np.log(sn)
            if old is None:
                d = den
            else:
                h_last = np.log(sig[i - 1]) - np.log(s)
                r = h_last / h
                d = (1 + 1 / (2 * r)) * den - (1 / (2 * r)) * old
            x = (sn / s) * x - np.expm1(-h) * d
        old = den
        out.append(x)
    return np.asarray(out)


# Golden literals: x0 = 1.25 * sigma_max, derived once in float64 from the
# formulas above. Indices [0,1,2,3] for N=4, [0,1,14,28,29] for N=30.
GOLDEN = {
    ("trailing", 4): {
        "sigma0": 14.6146412293,
        "euler": {0: 11.01081255, 1: 12.07182690, 2: 11.55690597, 3: 11.75156815},
        "euler_ancestral": {0: 11.73547548, 1: 12.26615136, 2: 11.42436968, 3: 11.61903186},
        "dpmpp_2m": {0: 11.01081255, 1: 13.07716221, 2: 12.40903173, 3: 12.60369391},
    },
    ("leading", 30): {
        "sigma0": 11.4768464583,
        "euler": {0: 13.01398185, 1: 13.67550204, 14: 12.72810414, 28: 12.55075948, 29: 12.54560432},
        "euler_ancestral": {0: 15.62792260, 1: 14.05054628, 14: 12.57875127, 28: 12.49142741, 29: 12.48627225},
        "dpmpp_2m": {0: 13.01398185, 1: 14.49654123, 14: 13.28709750, 28: 13.10577895, 29: 13.10062379},
    },
}

CASES = [("trailing", 4, SDXL_TURBO_SCHEDULER), ("leading", 30, SDXL_BASE_SCHEDULER)]


# ------------------------------------------------------------------- tests


@pytest.mark.parametrize("spacing,n,cfg", CASES)
def test_independent_derivation_matches_goldens(spacing, n, cfg):
    """The in-file float64 reimplementation reproduces the hard-coded
    literals — guards the test's own reference against silent edits."""
    g = GOLDEN[(spacing, n)]
    sig = _sigmas(spacing, n)
    np.testing.assert_allclose(sig[0], g["sigma0"], rtol=1e-9)
    x0 = 1.25 * sig[0]
    for name, fn in [("euler", _euler_traj), ("euler_ancestral", _ancestral_traj), ("dpmpp_2m", _dpmpp_traj)]:
        traj = fn(sig, x0)
        for i, v in g[name].items():
            np.testing.assert_allclose(traj[i], v, rtol=1e-8, err_msg=f"{name}[{i}]")


@pytest.mark.parametrize("spacing,n,cfg", CASES)
def test_production_sigma_table_matches_independent(spacing, n, cfg):
    st = make_schedule(cfg, n)
    np.testing.assert_allclose(st.sigmas, _sigmas(spacing, n).astype(np.float32), rtol=1e-6)


@pytest.mark.parametrize("spacing,n,cfg", CASES)
def test_euler_trajectory_golden(spacing, n, cfg):
    g = GOLDEN[(spacing, n)]
    st = make_schedule(cfg, n)
    sig = st.sigmas
    x = np.float32(1.25 * np.float64(g["sigma0"]))
    for i in range(n):
        x = np.asarray(euler_step(x, np.float32(_eps(i)), sig[i], sig[i + 1]))
        if i in g["euler"]:
            np.testing.assert_allclose(x, g["euler"][i], rtol=2e-5, err_msg=f"euler step {i}")


@pytest.mark.parametrize("spacing,n,cfg", CASES)
def test_euler_ancestral_trajectory_golden(spacing, n, cfg):
    g = GOLDEN[(spacing, n)]
    st = make_schedule(cfg, n)
    sig = st.sigmas
    x = np.float32(1.25 * np.float64(g["sigma0"]))
    for i in range(n):
        x = np.asarray(
            euler_ancestral_step(x, np.float32(_eps(i)), sig[i], sig[i + 1], np.float32(_z(i)))
        )
        if i in g["euler_ancestral"]:
            np.testing.assert_allclose(
                x, g["euler_ancestral"][i], rtol=2e-5, err_msg=f"ancestral step {i}"
            )


@pytest.mark.parametrize("spacing,n,cfg", CASES)
def test_dpmpp_2m_trajectory_golden(spacing, n, cfg):
    """Drives dpmpp_2m_step with the SAME gating the denoise scan uses
    (runtime/denoise.py _step_tables): use2 = (i > 0) & (sigma_next > 0),
    sigma_prev index clipped at 0, old_denoised = x0 prediction history."""
    g = GOLDEN[(spacing, n)]
    st = make_schedule(cfg, n)
    sig = st.sigmas
    x = np.float32(1.25 * np.float64(g["sigma0"]))
    old = np.float32(0.0)  # first-step value is never selected (use2 False)
    for i in range(n):
        den = np.float32(x - sig[i] * np.float32(_eps(i)))
        use2 = (i > 0) and (sig[i + 1] > 0.0)
        x = np.asarray(
            dpmpp_2m_step(x, den, old, sig[max(i - 1, 0)], sig[i], sig[i + 1], use2)
        )
        old = den
        if i in g["dpmpp_2m"]:
            np.testing.assert_allclose(x, g["dpmpp_2m"][i], rtol=2e-5, err_msg=f"dpmpp step {i}")
