"""Benchmark: latent-blending transition → 12 s movie, end-to-end.

Prints ONE JSON line:
  {"metric": ..., "value": frames/sec end-to-end, "unit": "frames/sec",
   "vs_baseline": x-realtime}

Baseline anchor (BASELINE.md): the reference claims transitions render
"faster than they are typically played back" — i.e. real time is the bar.
vs_baseline = (movie seconds) / (wall seconds): 1.0 == real time.

Configs (BASELINE.json):
  default              SDXL-Turbo 512², 4 steps, 10 branches (config "turbo")
  LB_BENCH_SPEC=sdxl-base   SDXL-base 1024², 30 steps, CFG 4.0,
                            nmb_max_branches=10 (BASELINE config 2 — a FIXED
                            workload; budget mode fills its 20 s wall by
                            construction so it can't show speedups).
                            LB_BENCH_BUDGET=20 switches to budget mode.
  LB_BENCH_SPEC=tiny-turbo  fast smoke run

Weights: random-initialized full architecture (2.6B-param UNet, real
VAE/CLIP towers). Throughput is weight-value independent, so the perf
numbers are faithful; set LB_SNAPSHOT=/path/to/snapshot to bench real
weights. Without LPIPS weights the engine defaults to the deterministic
weight-free NLPD metric for branch placement (models/perceptual.py).

MFU: denoise-phase FLOPs come from XLA's cost_analysis on every compiled
denoise executable (runtime/denoise.py DenoiseRunner.plan_flops);
mfu = executed_flops / denoise_wall / peak_flops(device).
"""
import json
import os
import time

import jax
import jax.numpy as jnp

# sitecustomize pre-imports jax, so env-var config is too late — set the
# persistent compilation cache through the config API.
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/lb_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from latentblending_tpu.engine.blending import BlendingEngine
from latentblending_tpu.runtime.holder import SDXLHolder

DURATION_S = 12.0
FPS = 30

# dense bf16 peak FLOP/s per chip, by device_kind substring
PEAK_FLOPS = [
    ("TPU v5 lite", 197e12),   # v5e
    ("TPU v5e", 197e12),
    ("TPU v5p", 459e12),
    ("TPU v4", 275e12),
    ("TPU v6 lite", 918e12),   # trillium
]


def _peak_flops() -> float | None:
    kind = getattr(jax.devices()[0], "device_kind", "")
    for sub, peak in PEAK_FLOPS:
        if sub in kind:
            return peak
    return None


def _make_mesh_if_multichip():
    """Expose mesh construction from the bench entry (VERDICT #3c): shard
    stems over 'data' and optionally the UNet over 'model' (LB_MESH_TP)."""
    from latentblending_tpu.parallel.mesh import auto_mesh

    return auto_mesh()


def main():
    spec = os.environ.get("LB_BENCH_SPEC", "sdxl-turbo")
    snapshot = os.environ.get("LB_SNAPSHOT")
    # fail fast instead of hanging forever if the TPU relay is down. A
    # SIGALRM handler can't preempt a blocked C++ PJRT init (no bytecode
    # runs), so probe backend init in a subprocess with a hard timeout.
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=int(os.environ.get("LB_BENCH_INIT_TIMEOUT", "300")),
            check=True, capture_output=True,
        )
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        print(f"bench: TPU backend init failed/timed out (relay down?): {type(e).__name__}", file=sys.stderr)
        raise SystemExit(3)
    mesh = _make_mesh_if_multichip()
    t_setup = time.time()
    if snapshot:
        dh = SDXLHolder.from_pretrained(snapshot, mesh=mesh)
    else:
        dh = SDXLHolder.from_random(spec, dtype=jnp.bfloat16 if spec.startswith("sdxl") else jnp.float32, mesh=mesh)
    sched = os.environ.get("LB_BENCH_SCHED")
    if sched:
        dh.set_scheduler_type(sched)
    be = BlendingEngine(dh)
    steps = os.environ.get("LB_BENCH_STEPS")
    if steps:
        be.set_num_inference_steps(int(steps))
    if not dh.is_sdxl_turbo:
        budget = os.environ.get("LB_BENCH_BUDGET")
        if budget:
            be.set_branching(t_compute_max_allowed=float(budget))
        else:
            be.set_branching(nmb_max_branches=int(os.environ.get("LB_BENCH_BRANCHES", "10")))
    if os.environ.get("LB_PLACEMENT") in ("measured", "predictive"):
        be.placement_policy = os.environ["LB_PLACEMENT"]
    be.set_prompt1("photo of underwater landscape, fish, und the sea, incredible detail")
    be.set_prompt2("rendering of an alien planet, strange plants, strange creatures")
    be.set_negative_prompt("blurry, ugly, pale")
    setup_s = time.time() - t_setup

    # warm-up: compile every denoise/decode/fill-up variant the run uses
    be.run_movie_transition("/tmp/lb_bench_warmup.mp4", duration_transition=DURATION_S, fps=FPS, fixed_seeds=[420, 421])

    # fused transition+write (run_movie_transition): encoding overlaps the
    # keyframe device→host copies and the final similarity pass
    fp_movie = "/tmp/lb_bench_movie.mp4"
    flops0 = dh.runner.executed_flops
    t0 = time.time()
    be.run_movie_transition(fp_movie, duration_transition=DURATION_S, fps=FPS, fixed_seeds=[420, 421])
    wall = time.time() - t0
    t_transition = wall - (be.last_report.phases or {}).get("movie_write", {}).get("total_s", 0.0)

    denoise_flops = dh.runner.executed_flops - flops0
    denoise_wall = (be.last_report.phases or {}).get("denoise", {}).get("total_s", 0.0)
    peak = _peak_flops()
    mfu = None
    if peak and denoise_wall > 0 and denoise_flops > 0:
        mfu = denoise_flops / denoise_wall / peak

    # budget-planner honesty check (VERDICT #6): what the cost model
    # promised vs what the transition actually took
    from latentblending_tpu.ops.schedules import time_based_branching_plan  # noqa: F401

    steps_exec = sum(
        (be.num_inference_steps - idx) * n
        for idx, n in zip(be.list_idx_injection, be.list_nmb_stems)
    )
    t_predicted = (
        steps_exec * be.dt_unet_step
        + be.dt_vae * sum(be.list_nmb_stems)
        + 2 * (be.num_inference_steps * be.dt_unet_step + be.dt_vae)
    )

    n_frames = DURATION_S * FPS
    fps_e2e = n_frames / wall
    label = {
        "sdxl-turbo": "SDXL-Turbo 512x512",
        "sdxl-base": f"SDXL-base 1024x1024 {be.num_inference_steps}-step",
    }.get(dh.spec.name, dh.spec.name)
    if sched:
        label += f" ({sched})"
    result = {
        "metric": f"{label} transition→12s movie, end-to-end frames/sec/chip",
        "value": round(fps_e2e, 3),
        "unit": "frames/sec",
        "vs_baseline": round(DURATION_S / wall, 3),
        "detail": {
            "spec": dh.spec.name,
            "wall_s": round(wall, 3),
            "transition_s": round(t_transition, 3),
            "keyframes": len(be.tree_final_imgs),
            "dt_unet_step_s": round(be.dt_unet_step, 4),
            "phases": be.last_report.phases,
            "denoise_tflops": round(denoise_flops / 1e12, 2),
            "mfu_denoise": round(mfu, 4) if mfu is not None else None,
            "planner_predicted_s": round(t_predicted, 2),
            "planner_vs_actual": round(t_predicted / t_transition, 2) if t_transition > 0 else None,
            "branching": {"idx_injection": be.list_idx_injection, "nmb_stems": be.list_nmb_stems},
            "setup_s": round(setup_s, 1),
            "device": str(jax.devices()[0]),
            "n_devices": len(jax.devices()),
            "mesh": str(dict(mesh.shape)) if mesh is not None else None,
            "weights": "snapshot" if snapshot else "random-init",
            "similarity_metric": be.similarity_metric,
            "placement_policy": be.placement_policy,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
