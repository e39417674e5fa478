"""The denoising engine: one jitted lax.scan over diffusion steps for a
whole *batch* of sibling branches.

This is the TPU-first re-architecture of the reference's per-branch Python
hot loop (reference diffusers_holder.py:312-359):

- start-at-step-k injection (dh:315-319) becomes a static scan window
  [idx_start, N) — skipped steps are never executed, not masked;
- the per-step crossfeed slerp toward the parental-mix trajectory
  (dh:322-324) is fused into the scan body as one batched slerp over all
  stems (Pallas kernel on TPU, ops/pallas_kernels.py);
- CFG's sequential ×2 batch (dh:328, :347-349) is folded into the batch
  axis of the same UNet call;
- the scheduler's scale_model_input/step (dh:330, :356) are inlined —
  XLA fuses them with the surrounding elementwise work;
- the trajectory the reference accumulates via list.append (dh:359) is the
  scan's stacked ys.

The batch axis carries all sibling stems of one injection level and is
sharded over the mesh 'data' axis; with per-stem conditioning, guidance
scale and crossfeed coefficients all batched, one compile serves every stem.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from latentblending_tpu.ops.pallas_kernels import slerp_batched_auto
from latentblending_tpu.ops.scheduler import (
    SchedulerState,
    dpmpp_2m_step,
    euler_ancestral_step,
    euler_step,
    scale_model_input,
)


@dataclasses.dataclass(frozen=True)
class DenoisePlan:
    """Static compilation key: (num_steps, idx_start, batch, cfg, rescale,
    sched, tree)."""

    num_steps: int
    idx_start: int
    batch: int
    use_cfg: bool
    guidance_rescale: float = 0.0
    # solver: "euler" (SDXL-base's shipped scheduler), "euler_ancestral"
    # (sdxl-turbo's — σ_up-scaled noise from per-step keys inside the scan),
    # or "dpmpp_2m" (DPM-Solver++ 2M — 2nd-order multistep; comparable
    # sample quality at roughly half the steps, a beyond-reference option)
    sched: str = "euler"
    # tree=True selects denoise_scan_tree: crossfeed targets are slerps of
    # the CURRENT states of two in-batch parent rows instead of a
    # precomputed trajectory window (the fused whole-transition scan)
    tree: bool = False
    # win=True: the tree scan additionally consumes a recycled-edge
    # per-step window (chained transitions) — distinct compiled signature
    win: bool = False
    # segs=((start_step, batch), ...) selects denoise_scan_tree_seg: one
    # compiled call containing SEQUENTIAL scan segments with a growing
    # batch — rows enter at their injection step, so only useful
    # (row, step) work executes (a whole multi-level tree plan fused)
    segs: tuple = ()

    @property
    def exec_steps(self) -> int:
        return self.num_steps - self.idx_start


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "prompt_embeds",
        "pooled_embeds",
        "time_ids",
        "neg_prompt_embeds",
        "neg_pooled_embeds",
        "neg_time_ids",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class Conditioning:
    """Batched SDXL conditioning for one denoise call (all [B, ...])."""

    prompt_embeds: jax.Array  # [B, 77, 2048]
    pooled_embeds: jax.Array  # [B, 1280]
    time_ids: jax.Array  # [B, 6]
    neg_prompt_embeds: Optional[jax.Array] = None
    neg_pooled_embeds: Optional[jax.Array] = None
    neg_time_ids: Optional[jax.Array] = None


def _rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale):
    """CFG rescale per https://arxiv.org/pdf/2305.08891 §3.4 (reference
    dh:351-353 via diffusers rescale_noise_cfg)."""
    axes = tuple(range(1, noise_cfg.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg


def _fold_cfg(plan: DenoisePlan, cond: Conditioning):
    """Stack (neg, pos) conditioning along batch when CFG is on."""
    if plan.use_cfg:
        pe = jnp.concatenate([cond.neg_prompt_embeds, cond.prompt_embeds], axis=0)
        pool = jnp.concatenate([cond.neg_pooled_embeds, cond.pooled_embeds], axis=0)
        tids = jnp.concatenate(
            [cond.neg_time_ids if cond.neg_time_ids is not None else cond.time_ids, cond.time_ids], axis=0
        )
        return pe, pool, tids
    return cond.prompt_embeds, cond.pooled_embeds, cond.time_ids


def _eps_and_step(plan, unet_apply, params, pe, pool, tids, guidance_scale,
                  latents, old_denoised, sigma, sigma_prev, sigma_next, t, key, use2):
    """One UNet eval (CFG-folded) + one solver update — the shared core of
    denoise_scan and denoise_scan_tree."""
    lmi = scale_model_input(latents, sigma)
    if plan.use_cfg:
        lmi2 = jnp.concatenate([lmi, lmi], axis=0)
        eps2 = unet_apply(params, lmi2, t, pe, pool, tids)
        eps_u, eps_t = jnp.split(eps2, 2, axis=0)
        g = guidance_scale.reshape(-1, 1, 1, 1).astype(jnp.float32)
        eps = eps_u.astype(jnp.float32) + g * (eps_t.astype(jnp.float32) - eps_u.astype(jnp.float32))
        if plan.guidance_rescale > 0.0:
            eps = _rescale_noise_cfg(eps, eps_t.astype(jnp.float32), plan.guidance_rescale)
    else:
        eps = unet_apply(params, lmi, t, pe, pool, tids)
    if plan.sched == "euler_ancestral":
        z = jax.random.normal(key, latents.shape, jnp.float32)
        new_latents = euler_ancestral_step(latents, eps, sigma, sigma_next, z)
        denoised = old_denoised  # unused carry slot
    elif plan.sched == "dpmpp_2m":
        # multistep caveat: crossfeed slerps the state BETWEEN steps, so
        # old_denoised is the pre-perturbation history — the 2nd-order
        # correction is slightly stale on crossfed branches (the solver
        # remains stable; worst case it degrades toward 1st-order)
        denoised = latents.astype(jnp.float32) - sigma.astype(jnp.float32) * eps.astype(jnp.float32)
        new_latents = dpmpp_2m_step(latents, denoised, old_denoised, sigma_prev, sigma, sigma_next, use2)
    else:
        new_latents = euler_step(latents, eps, sigma, sigma_next)
        denoised = old_denoised
    return new_latents, denoised


def _step_tables(plan: DenoisePlan, sigmas: jax.Array, timesteps: jax.Array):
    """Per-executed-step σ/t slices for the scan window."""
    M = plan.exec_steps
    i0 = plan.idx_start
    sig = sigmas.astype(jnp.float32)
    ts = timesteps.astype(jnp.float32)
    sigma_w = jax.lax.dynamic_slice_in_dim(sig, i0, M)
    sigma_next_w = jax.lax.dynamic_slice_in_dim(sig, i0 + 1, M)
    # σ_{i-1} per executed step (first entry unused — use2 is False there)
    sigma_prev_w = jnp.take(sig, jnp.clip(i0 + jnp.arange(M) - 1, 0, None))
    # 2nd-order update applies from the 2nd executed step on, never into σ=0
    use2_w = (jnp.arange(M) > 0) & (sigma_next_w > 0.0)
    t_w = jax.lax.dynamic_slice_in_dim(ts, i0, M)
    return sigma_w, sigma_prev_w, sigma_next_w, t_w, use2_w


def denoise_scan(
    unet_apply: Callable,
    params,
    plan: DenoisePlan,
    latents_start: jax.Array,  # [B, h, w, 4] — state entering step idx_start
    cond: Conditioning,
    mix_window: jax.Array,  # [M, B, h, w, 4] crossfeed targets per executed step
    mix_coeffs: jax.Array,  # [M, B] slerp fractions per executed step & stem
    sigmas: jax.Array,  # [N+1]
    timesteps: jax.Array,  # [N]
    guidance_scale: jax.Array,  # [B]
    step_keys: Optional[jax.Array] = None,  # [M] PRNG keys (ancestral only)
) -> jax.Array:
    """Returns the latent trajectory [M, B, h, w, 4] for steps
    idx_start..N-1 (the reference's list_latents_out minus the leading
    Nones)."""
    M = plan.exec_steps
    pe, pool, tids = _fold_cfg(plan, cond)

    def body(carry, step):
        latents, old_denoised = carry
        m_t, c_t, sigma, sigma_prev, sigma_next, t, key, use2 = step
        # crossfeed slerp — single-pass Pallas kernel on TPU
        latents = slerp_batched_auto(latents, m_t, c_t)
        new_latents, denoised = _eps_and_step(
            plan, unet_apply, params, pe, pool, tids, guidance_scale,
            latents, old_denoised, sigma, sigma_prev, sigma_next, t, key, use2,
        )
        return (new_latents, denoised), new_latents

    if step_keys is None:
        # ancestral plans consume the keys — a fixed default would silently
        # correlate the noise of every call (the exact failure mode the
        # holder's noise-stream design prevents); deterministic solvers
        # ignore them, so a placeholder is fine there
        if plan.sched == "euler_ancestral":
            raise ValueError(
                "plan.sched='euler_ancestral' requires explicit step_keys "
                "(a per-call PRNG stream); see SDXLHolder.reset_noise_stream"
            )
        step_keys = jax.random.split(jax.random.PRNGKey(0), M)
    sigma_w, sigma_prev_w, sigma_next_w, t_w, use2_w = _step_tables(plan, sigmas, timesteps)
    steps = (mix_window, mix_coeffs, sigma_w, sigma_prev_w, sigma_next_w, t_w, step_keys, use2_w)
    carry0 = (latents_start, jnp.zeros(latents_start.shape, jnp.float32))
    (_, _), traj = jax.lax.scan(body, carry0, steps)
    return traj


def denoise_scan_tree(
    unet_apply: Callable,
    params,
    plan: DenoisePlan,
    latents_start: jax.Array,  # [B, h, w, 4] — row 0..: edges then stems
    cond: Conditioning,
    parent_idx: jax.Array,  # [B, 2] int32 — in-batch parent rows (self for edges)
    parent_fract: jax.Array,  # [B] f32 — parental mix fraction per row
    mix_coeffs: jax.Array,  # [M, B] crossfeed slerp fraction per step & row
    sigmas: jax.Array,  # [N+1]
    timesteps: jax.Array,  # [N]
    guidance_scale: jax.Array,  # [B]
    step_keys: Optional[jax.Array] = None,  # [M] PRNG keys (ancestral only)
    win_steps: Optional[jax.Array] = None,  # [M, h, w, 4] recycled-edge entering-states
    win_mask: Optional[jax.Array] = None,  # [B] bool — rows whose parent-1 is the window
    pin_steps: Optional[jax.Array] = None,  # [B] int32 — step each row is pinned at (0 = edge)
) -> jax.Array:
    """The FUSED single-level tree scan: one device call computes the edge
    trajectories AND every stem of the level.

    Where denoise_scan consumes a precomputed crossfeed window (parents
    from earlier calls), here each row's crossfeed target is the parental
    slerp of the CURRENT states of two other rows in the same batch —
    mathematically the same target (a parent's scan carry entering step i
    IS its trajectory entry i-1), with zero extra dispatches. A stem
    injected at step i0 carries junk for steps < i0 (it evolves from a
    finite placeholder) and is PINNED at i0 by mix coefficient 1.0: the
    slerp returns the parental mix exactly, which is precisely the
    reference's latents_start = mix_traj[i0-1] (blending_engine.py:440-450).
    Valid whenever the level's placements don't depend on similarities
    measured within the same call — a single level growing from a single
    gap (the turbo transition), where predicted-bisection order is
    value-independent.

    win_steps/win_mask support a RECYCLED parent edge (chained transitions,
    reference blending_engine.py:333-342): rows with win_mask take their
    parent-1 state from the precomputed per-step window instead of a live
    batch row. The same mechanism carries branch1 crossfeed for the second
    edge (its mix target is the window itself via parent_fract=0).

    pin_steps makes multistep solvers (dpmpp_2m) valid in the fused scan:
    a row's 2nd-order correction only engages AFTER its pin step, so the
    pre-pin junk never enters the solver history — at pin+1 old_denoised
    is the pin step's x0 prediction, exactly the per-level scan's history.
    """
    if step_keys is None:
        if plan.sched == "euler_ancestral":
            raise ValueError(
                "plan.sched='euler_ancestral' requires explicit step_keys "
                "(a per-call PRNG stream); see SDXLHolder.reset_noise_stream"
            )
        step_keys = jax.random.split(jax.random.PRNGKey(0), plan.exec_steps)
    pe, pool, tids = _fold_cfg(plan, cond)
    p1 = parent_idx[:, 0]
    p2 = parent_idx[:, 1]

    from latentblending_tpu.ops.interp import interpolate_spherical_batched

    def body(carry, step):
        latents, old_denoised = carry
        if win_steps is None:
            c_t, sigma, sigma_prev, sigma_next, t, key, use2 = step
            p1_state = jnp.take(latents, p1, axis=0)
        else:
            c_t, sigma, sigma_prev, sigma_next, t, key, use2, w_t = step
            p1_state = jnp.where(
                win_mask[:, None, None, None],
                jnp.broadcast_to(w_t[None], latents.shape).astype(latents.dtype),
                jnp.take(latents, p1, axis=0),
            )
        # live parental mix: parents' carry entering step i == their
        # trajectory state after step i-1
        m_t = interpolate_spherical_batched(
            p1_state, jnp.take(latents, p2, axis=0), parent_fract
        )
        latents = slerp_batched_auto(latents, m_t, c_t)
        new_latents, denoised = _eps_and_step(
            plan, unet_apply, params, pe, pool, tids, guidance_scale,
            latents, old_denoised, sigma, sigma_prev, sigma_next, t, key,
            use2[:, None, None, None],
        )
        return (new_latents, denoised), new_latents

    sigma_w, sigma_prev_w, sigma_next_w, t_w, use2_w = _step_tables(plan, sigmas, timesteps)
    # per-row validity: a row's solver history only exists after its pin
    # step (edges pin at 0 → the usual first-step fallback)
    if pin_steps is None:
        pin_steps = jnp.zeros((latents_start.shape[0],), jnp.int32)
    M = plan.exec_steps
    use2_mat = use2_w[:, None] & (jnp.arange(M)[:, None] > pin_steps[None, :])
    steps = (mix_coeffs, sigma_w, sigma_prev_w, sigma_next_w, t_w, step_keys, use2_mat)
    if win_steps is not None:
        steps = steps + (win_steps,)
    carry0 = (latents_start, jnp.zeros(latents_start.shape, jnp.float32))
    (_, _), traj = jax.lax.scan(body, carry0, steps)
    return traj


def denoise_scan_tree_seg(
    unet_apply: Callable,
    params,
    plan: DenoisePlan,  # plan.segs = ((start_step, batch), ...) — static
    latents_start: jax.Array,  # [B0, h, w, 4] — rows live from step 0 (edges)
    cond: Conditioning,  # [B_total, ...]
    parent_idx: jax.Array,  # [B_total, 2] int32 — in-batch parent rows
    parent_fract: jax.Array,  # [B_total] f32 — parental mix fraction per row
    mix_coeffs: jax.Array,  # [N, B_total] crossfeed fraction per step & row
    sigmas: jax.Array,  # [N+1]
    timesteps: jax.Array,  # [N]
    guidance_scale: jax.Array,  # [B_total]
    step_keys: Optional[jax.Array] = None,  # [N] PRNG keys (ancestral only)
    win_steps: Optional[jax.Array] = None,  # [N, h, w, 4] recycled-edge states
    win_mask: Optional[jax.Array] = None,  # [B_total] bool
    pin_steps: Optional[jax.Array] = None,  # [B_total] int32
) -> tuple:
    """The SEGMENTED multi-level fused tree scan: a whole multi-level
    branching plan as ONE compiled device call.

    denoise_scan_tree fuses a single level by running every row for all N
    steps — priced N·B row-steps, which the cost model rejects for deep
    multi-level plans (rows injected at step 27 of 30 would pay 27 junk
    steps). Here the call is a SEQUENCE of lax.scans over step ranges
    [i0_s, i0_{s+1}) whose batch grows at each boundary: batch rows are
    ordered by injection step, so the live rows of segment s are exactly
    the prefix [0, B_s). Only useful (row, step) work executes — the same
    row-step count as the per-level path — but each stem runs in the
    largest batch alive at its depth (B-sweep MFU gain) and the whole
    transition is one dispatch (replaces the reference's per-level loop,
    blending_engine.py:354-362, at full depth).

    A row entering at segment s is initialised to its parent-1 state (any
    finite value works) and PINNED by its crossfeed coefficient of 1.0 at
    its first step: the in-scan slerp replaces its state with the live
    parental mix — states entering step i are trajectory entries i-1, so
    the pin equals the per-level path's latents_start = mix_traj[i0-1]
    exactly (reference blending_engine.py:440-450). Parents are always in
    earlier segments (strictly shallower, blending_engine.py:549-562), so
    their rows are already live. Validity requires placements across ALL
    levels to be value-independent — the engine gates this path to the
    predictive placement policy (single-level plans are value-independent
    under any policy and keep denoise_scan_tree).

    Returns a tuple of per-segment trajectories ([len_s, B_s, h, w, 4]);
    global step i of a row r alive in segment s is trajs[s][i - i0_s, r].
    """
    assert plan.segs, "plan.segs must be set for the segmented tree scan"
    assert plan.idx_start == 0
    N = plan.num_steps
    if step_keys is None:
        if plan.sched == "euler_ancestral":
            raise ValueError(
                "plan.sched='euler_ancestral' requires explicit step_keys "
                "(a per-call PRNG stream); see SDXLHolder.reset_noise_stream"
            )
        step_keys = jax.random.split(jax.random.PRNGKey(0), N)
    B_total = parent_idx.shape[0]
    if pin_steps is None:
        pin_steps = jnp.zeros((B_total,), jnp.int32)

    from latentblending_tpu.ops.interp import interpolate_spherical_batched

    sigma_w, sigma_prev_w, sigma_next_w, t_w, use2_w = _step_tables(plan, sigmas, timesteps)
    # per-(step, row) 2nd-order validity: a row's dpmpp history only exists
    # after its pin step (same gating as denoise_scan_tree)
    use2_mat = use2_w[:, None] & (jnp.arange(N)[:, None] > pin_steps[None, :])

    def seg_body(p1s, p2s, pf_s, pe, pool, tids, g_s, wm_s):
        def body(carry, step):
            latents, old_denoised = carry
            if win_steps is None:
                c_t, sigma, sigma_prev, sigma_next, t, key, use2 = step
                p1_state = jnp.take(latents, p1s, axis=0)
            else:
                c_t, sigma, sigma_prev, sigma_next, t, key, use2, w_t = step
                p1_state = jnp.where(
                    wm_s[:, None, None, None],
                    jnp.broadcast_to(w_t[None], latents.shape).astype(latents.dtype),
                    jnp.take(latents, p1s, axis=0),
                )
            m_t = interpolate_spherical_batched(p1_state, jnp.take(latents, p2s, axis=0), pf_s)
            latents = slerp_batched_auto(latents, m_t, c_t)
            new_latents, denoised = _eps_and_step(
                plan, unet_apply, params, pe, pool, tids, g_s,
                latents, old_denoised, sigma, sigma_prev, sigma_next, t, key,
                use2[:, None, None, None],
            )
            return (new_latents, denoised), new_latents

        return body

    lat = latents_start
    old_den = jnp.zeros(latents_start.shape, jnp.float32)
    trajs = []
    for s, (i0, Bs) in enumerate(plan.segs):
        i1 = plan.segs[s + 1][0] if s + 1 < len(plan.segs) else N
        Bprev = lat.shape[0]
        assert Bs >= Bprev, "segment batches must be nondecreasing"
        if Bs > Bprev:
            # entering rows: finite placeholder (parent-1's current state);
            # the coeff-1.0 slerp at their first step performs the real pin
            p1e = jnp.clip(parent_idx[Bprev:Bs, 0], 0, Bprev - 1)
            enter = jnp.take(lat, p1e, axis=0)
            lat = jnp.concatenate([lat, enter.astype(lat.dtype)], axis=0)
            old_den = jnp.concatenate(
                [old_den, jnp.zeros(enter.shape, jnp.float32)], axis=0
            )
        cond_s = Conditioning(
            prompt_embeds=cond.prompt_embeds[:Bs],
            pooled_embeds=cond.pooled_embeds[:Bs],
            time_ids=cond.time_ids[:Bs],
            neg_prompt_embeds=None if cond.neg_prompt_embeds is None else cond.neg_prompt_embeds[:Bs],
            neg_pooled_embeds=None if cond.neg_pooled_embeds is None else cond.neg_pooled_embeds[:Bs],
            neg_time_ids=None if cond.neg_time_ids is None else cond.neg_time_ids[:Bs],
        )
        pe, pool, tids = _fold_cfg(plan, cond_s)
        body = seg_body(
            parent_idx[:Bs, 0], parent_idx[:Bs, 1], parent_fract[:Bs],
            pe, pool, tids, guidance_scale[:Bs],
            None if win_mask is None else win_mask[:Bs],
        )
        steps = (
            mix_coeffs[i0:i1, :Bs], sigma_w[i0:i1], sigma_prev_w[i0:i1],
            sigma_next_w[i0:i1], t_w[i0:i1], step_keys[i0:i1], use2_mat[i0:i1, :Bs],
        )
        if win_steps is not None:
            steps = steps + (win_steps[i0:i1],)
        (lat, old_den), ys = jax.lax.scan(body, (lat, old_den), steps)
        trajs.append(ys)
    return tuple(trajs)


class DenoiseRunner:
    """Owns jitted compiled variants of denoise_scan keyed by DenoisePlan.

    idx_start and batch size vary per injection level; each distinct
    (num_steps, idx_start, batch, use_cfg) combination compiles once and is
    cached (SURVEY.md §7 hard part c — bounded variant set: one per level).
    """

    def __init__(self, unet_apply: Callable):
        self._unet_apply = unet_apply
        self._jitted: dict[DenoisePlan, Callable] = {}
        self._compiled: dict[DenoisePlan, Any] = {}
        self._executed: set[DenoisePlan] = set()
        # per-plan compiled FLOPs (XLA cost_analysis) + cumulative executed
        # FLOPs — feeds MFU reporting (bench.py / profiling.py)
        self.plan_flops: dict[DenoisePlan, float] = {}
        self.executed_flops: float = 0.0

    def is_warm(self, plan: DenoisePlan) -> bool:
        """True if this plan has already executed (i.e. is compiled)."""
        return plan in self._executed

    def _get_jitted(self, plan: DenoisePlan) -> Callable:
        fn = self._jitted.get(plan)
        if fn is None:
            if plan.segs:
                scan_fn = denoise_scan_tree_seg
            else:
                scan_fn = denoise_scan_tree if plan.tree else denoise_scan
            fn = jax.jit(functools.partial(scan_fn, self._unet_apply, plan=plan))
            self._jitted[plan] = fn
        return fn

    def get(self, plan: DenoisePlan) -> Callable:
        """Callable for a plan (compat shim; run() is the main entry)."""
        jitted = self._get_jitted(plan)

        def wrapped(params, latents_start, cond, mix_window, mix_coeffs, sigmas, timesteps, guidance_scale, step_keys=None):
            return jitted(
                params, latents_start=latents_start, cond=cond, mix_window=mix_window,
                mix_coeffs=mix_coeffs, sigmas=sigmas, timesteps=timesteps,
                guidance_scale=guidance_scale, step_keys=step_keys,
            )

        return wrapped

    def run(self, plan: DenoisePlan, params, latents_start, cond, mix_window, mix_coeffs, schedule: SchedulerState, guidance_scale, flops: float | None = None, step_keys=None):
        """Execute one denoise scan. Each plan is AOT-compiled once
        (lower→compile); calls then go through the compiled executable.

        flops: analytic FLOPs of this call (ops/flops.py) — preferred for
        executed_flops/MFU accounting because XLA's cost_analysis counts a
        scan body once (not exec_steps×) and reports nothing for Pallas
        custom calls, under-counting ~10-30×. The raw cost_analysis number
        is still recorded per plan in plan_flops for reference."""
        assert not plan.tree, "tree plans go through run_tree"
        if step_keys is None:
            if plan.sched == "euler_ancestral":
                raise ValueError(
                    "plan.sched='euler_ancestral' requires explicit step_keys "
                    "(a per-call PRNG stream); see SDXLHolder.reset_noise_stream"
                )
            step_keys = jax.random.split(jax.random.PRNGKey(0), plan.exec_steps)
        kwargs = dict(
            latents_start=latents_start, cond=cond, mix_window=mix_window,
            mix_coeffs=mix_coeffs, sigmas=jnp.asarray(schedule.sigmas),
            timesteps=jnp.asarray(schedule.timesteps), guidance_scale=guidance_scale,
            step_keys=step_keys,
        )
        return self._run_kwargs(plan, params, kwargs, flops)

    def run_tree(self, plan: DenoisePlan, params, latents_start, cond, parent_idx, parent_fract, mix_coeffs, schedule: SchedulerState, guidance_scale, flops: float | None = None, step_keys=None, win_steps=None, win_mask=None, pin_steps=None):
        """Execute one FUSED tree scan (denoise_scan_tree): edges + stems of
        a whole level in a single compiled call."""
        assert plan.tree
        assert plan.win == (win_steps is not None), "plan.win must match window presence"
        if step_keys is None and plan.sched == "euler_ancestral":
            raise ValueError(
                "plan.sched='euler_ancestral' requires explicit step_keys "
                "(a per-call PRNG stream); see SDXLHolder.reset_noise_stream"
            )
        kwargs = dict(
            latents_start=latents_start, cond=cond,
            parent_idx=jnp.asarray(parent_idx, jnp.int32),
            parent_fract=jnp.asarray(parent_fract, jnp.float32),
            mix_coeffs=mix_coeffs, sigmas=jnp.asarray(schedule.sigmas),
            timesteps=jnp.asarray(schedule.timesteps), guidance_scale=guidance_scale,
            step_keys=step_keys,
        )
        if win_steps is not None:
            kwargs["win_steps"] = win_steps
            kwargs["win_mask"] = jnp.asarray(win_mask, bool)
        if pin_steps is not None:
            kwargs["pin_steps"] = jnp.asarray(pin_steps, jnp.int32)
        return self._run_kwargs(plan, params, kwargs, flops)

    def run_tree_seg(self, plan: DenoisePlan, params, latents_start, cond, parent_idx, parent_fract, mix_coeffs, schedule: SchedulerState, guidance_scale, flops: float | None = None, step_keys=None, win_steps=None, win_mask=None, pin_steps=None):
        """Execute one SEGMENTED multi-level fused tree scan
        (denoise_scan_tree_seg): a whole multi-level plan in a single
        compiled call. Returns the per-segment trajectory tuple."""
        assert plan.tree and plan.segs
        assert plan.win == (win_steps is not None), "plan.win must match window presence"
        if step_keys is None and plan.sched == "euler_ancestral":
            raise ValueError(
                "plan.sched='euler_ancestral' requires explicit step_keys "
                "(a per-call PRNG stream); see SDXLHolder.reset_noise_stream"
            )
        kwargs = dict(
            latents_start=latents_start, cond=cond,
            parent_idx=jnp.asarray(parent_idx, jnp.int32),
            parent_fract=jnp.asarray(parent_fract, jnp.float32),
            mix_coeffs=mix_coeffs, sigmas=jnp.asarray(schedule.sigmas),
            timesteps=jnp.asarray(schedule.timesteps), guidance_scale=guidance_scale,
            step_keys=step_keys,
        )
        if win_steps is not None:
            kwargs["win_steps"] = win_steps
            kwargs["win_mask"] = jnp.asarray(win_mask, bool)
        if pin_steps is not None:
            kwargs["pin_steps"] = jnp.asarray(pin_steps, jnp.int32)
        return self._run_kwargs(plan, params, kwargs, flops)

    def _run_kwargs(self, plan: DenoisePlan, params, kwargs: dict, flops: float | None):
        self._executed.add(plan)
        compiled = self._compiled.get(plan)
        if compiled is None:
            compiled = self._get_jitted(plan).lower(params, **kwargs).compile()
            self._compiled[plan] = compiled
            flops_xla = 0.0
            try:
                ca = compiled.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0] if ca else {}
                flops_xla = float(ca.get("flops", 0.0) or 0.0)
            except Exception:
                flops_xla = 0.0
            self.plan_flops[plan] = flops_xla
        self.executed_flops += flops if flops is not None else self.plan_flops.get(plan, 0.0)
        try:
            return compiled(params, **kwargs)
        except (TypeError, ValueError) as e:
            # aval/sharding drift vs the lowered signature — fall back to the
            # jit cache (re-specializes) rather than failing the run, but
            # LOUDLY: silent re-specialization could mask a layout bug
            import logging

            avals = jax.tree_util.tree_map(
                lambda x: getattr(x, "aval", None) and str(x.aval), kwargs
            )
            logging.getLogger(__name__).warning(
                "AOT executable rejected its arguments for plan %s (%s); "
                "re-specializing via jit. arg avals: %s", plan, e, avals
            )
            return self._get_jitted(plan)(params, **kwargs)


def build_mix_inputs(
    num_steps: int,
    idx_start: int,
    mix_traj: Optional[np.ndarray | jax.Array],  # [N, B, h, w, 4] (or None)
    coeffs: Optional[np.ndarray],  # [N] or [N, B]
    latents_start: jax.Array,  # [B, h, w, 4]
) -> tuple[jax.Array, jax.Array]:
    """Host-side packing of the crossfeed window for the scan.

    Executed step j corresponds to global step i = idx_start + j; the
    reference mixes latents toward mix_traj[i-1] and skips mixing at i==0
    (dh:322-324). Returns (mix_window [M,B,...], mix_coeffs [M,B]).
    """
    M = num_steps - idx_start
    B = latents_start.shape[0]
    if mix_traj is None or coeffs is None:
        mix_window = jnp.broadcast_to(latents_start[None], (M,) + latents_start.shape)
        return mix_window, jnp.zeros((M, B), jnp.float32)
    coeffs = np.asarray(coeffs, np.float32)
    if coeffs.ndim == 1:
        coeffs = np.tile(coeffs[:, None], (1, B))
    idx = np.clip(np.arange(idx_start, num_steps) - 1, 0, num_steps - 1)
    mix_window = jnp.stack([mix_traj[i] for i in idx], axis=0)
    cw = coeffs[idx_start:num_steps].copy()
    if idx_start == 0:
        cw[0] = 0.0  # reference skips crossfeed at step 0
    return mix_window, jnp.asarray(cw)
